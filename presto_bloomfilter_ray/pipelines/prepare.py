"""End-to-end training-corpus preparation — the composition a
Common-Crawl-scale user actually runs, wired from the engine's own
operators in their documented scale configurations:

1. **URL hygiene**: host blocklist via the project's Bloom filter
   (broadcast once, pure map probe — ``functions/urls.py host_filter``).
2. **Quality gates**: quality score ≥ ``quality_min``, byte entropy in
   ``entropy_band``, length in ``length_band`` — ONE vectorized map
   pass, the same gate definitions the ``quality_gate_pipeline`` query
   oracle-checks.
3. **Exact dedup**: 16 B/row hash-pair shuffle, tiered
   broadcast/sharded-anti-join removal (``functions/dedup.py``).
4. **Near dedup**: MinHash-LSH with verification and connected-
   component representative selection.
5. **Per-host cap**: two-phase partial top-k so hot domains can't
   dominate the mix (``cap_per_key``).

Every stage streams; the only materializations are the ones the dedup
stages already require. ``collect_metrics=True`` additionally counts
rows after each stage (one metadata pass per stage on the already-
materialized datasets) and wall-clocks the stages — the per-partition
lineage/metrics surface the north rule asks pipelines to emit.

Returns ``(dataset, metrics)`` where metrics is an ordered list of
``{"stage", "rows", "wall_s"}`` records (rows is None when
``collect_metrics=False``).
"""

from __future__ import annotations

import time
from typing import Iterable, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.dedup import cap_per_key, exact_dedup, minhash_dedup
from ..functions.text import byte_entropy, quality_score
from ..functions.urls import host_filter


def _gate_fn(quality_min: float, entropy_band, length_band, text_col: str):
    lo_e, hi_e = entropy_band
    lo_n, hi_n = length_band

    def gates(b: pa.Table) -> pa.Table:
        b = quality_score(b, text_col)
        b = byte_entropy(b, text_col)
        q = np.asarray(b.column("quality"), dtype=np.float64)
        ent = np.asarray(pc.fill_null(b.column("entropy"), -1.0), dtype=np.float64)
        nc = np.asarray(pc.utf8_length(b.column(text_col)), dtype=np.int64)
        keep = (q >= quality_min) & (ent >= lo_e) & (ent <= hi_e) \
            & (nc >= lo_n) & (nc <= hi_n)
        return b.drop_columns(["quality", "entropy"]).filter(pa.array(keep))

    return gates


def prepare_corpus(
    docs,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: Optional[str] = None,
    blocked_hosts: Iterable[str] = (),
    quality_min: float = 0.35,
    entropy_band: Tuple[float, float] = (3.0, 6.5),
    length_band: Tuple[int, int] = (20, 1_000_000),
    minhash_threshold: float = 0.8,
    host_cap: Optional[int] = None,
    work_dir: Optional[str] = None,
    cc_backend: str = "driver",
    collect_metrics: bool = True,
):
    """Run the five-stage preparation chain over ``docs``.

    ``url_col=None`` skips the URL stages (blocklist + host cap);
    ``host_cap=None`` skips only the cap. Stage parameters default to
    permissive bands suitable for the synthetic corpora; production
    callers tune them like any C4/Gopher-style recipe.
    """
    metrics: List[dict] = []

    def _record(stage: str, ds, t0: float):
        rows = ds.count() if collect_metrics else None
        metrics.append({"stage": stage, "rows": rows,
                        "wall_s": round(time.time() - t0, 2)})
        return ds

    t0 = time.time()
    if url_col is not None and blocked_hosts:
        docs = host_filter(docs, blocked_hosts, url_col=url_col)
        docs = _record("host_blocklist", docs, t0)

    t0 = time.time()
    docs = docs.map_batches(
        _gate_fn(quality_min, entropy_band, length_band, text_col),
        batch_format="pyarrow", batch_size=None)
    docs = _record("quality_gates", docs, t0)

    t0 = time.time()
    docs = exact_dedup(docs, col=text_col, id_col=id_col, work_dir=work_dir)
    docs = _record("exact_dedup", docs, t0)

    t0 = time.time()
    docs, _dup_map = minhash_dedup(
        docs, threshold=minhash_threshold, text_col=text_col, id_col=id_col,
        work_dir=work_dir, cc_backend=cc_backend)
    docs = _record("minhash_dedup", docs, t0)

    if url_col is not None and host_cap is not None:
        t0 = time.time()

        def add_host(b: pa.Table) -> pa.Table:
            x = b.column(url_col)
            if isinstance(x, pa.ChunkedArray):
                x = x.combine_chunks()
            st = pc.extract_regex(
                x, r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<host>[^/?#:]*)")
            return b.append_column("_host", pc.struct_field(st, "host"))

        docs = cap_per_key(
            docs.map_batches(add_host, batch_format="pyarrow", batch_size=None),
            "_host", id_col, host_cap).drop_columns(["_host"])
        docs = _record("host_cap", docs, t0)

    return docs, metrics
