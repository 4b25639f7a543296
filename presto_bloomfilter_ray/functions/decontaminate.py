"""Benchmark decontamination — the canonical LLM-training use of the
project's own Bloom sketch.

Training corpora must not contain evaluation-set content (GPT-3 §B /
The Pile §6 style n-gram decontamination). The scale shape: the
benchmark side is SMALL (10^5–10^7 lines — it's an eval set), the
corpus side is the 10^12-doc table. So:

* build ONE mergeable Bloom filter over the benchmark's lines with
  :func:`~..engine.agg.build_sketch` (the reference's ``bloom_filter``
  aggregation, `BloomFilterAggregation.java:31-39`),
* broadcast its envelope once (``ray.put``) and probe every corpus
  doc's lines inside ``map_batches`` — a per-doc ``ANY(line ∈ bloom)``
  with **no false negatives** (contaminated docs are always flagged;
  the configured FPP only over-flags, which is the safe direction for
  decontamination).

The corpus side never shuffles: flagging is a pure map stage.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def explode_lines(batch: pa.Table, text_col: str = "text",
                  out_col: str = "line", min_len: int = 1) -> pa.Table:
    """One row per (non-trivial) line of ``text_col`` — the unit of
    membership for line-level decontamination. Lines shorter than
    ``min_len`` chars are dropped (empty/whitespace rows would poison
    the filter: every doc contains them)."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(pc.split_pattern(col, "\n"))
    keep = pc.greater_equal(pc.utf8_length(pc.utf8_trim_whitespace(flat)),
                            min_len)
    return pa.table({out_col: flat.filter(keep)})


def benchmark_bloom(bench_ds, text_col: str = "text",
                    expected_insertions: int = 1_000_000,
                    fpp: float = 1e-4, min_len: int = 1):
    """Bloom filter over a benchmark Dataset's lines (distributed
    build through the standard partial → merge-tree path)."""
    from ..engine.agg import build_sketch
    from ..sketches.bloom import BloomFilter

    lines = bench_ds.map_batches(
        lambda b: explode_lines(b, text_col, min_len=min_len),
        batch_format="pyarrow")
    return build_sketch(lines, "line",
                        factory=lambda: BloomFilter(expected_insertions, fpp))


def flag_contaminated(ds, sketch, text_col: str = "text",
                      flag_col: str = "contaminated",
                      min_len: int = 1,
                      concurrency: Optional[int] = None):
    """Append a boolean ``flag_col``: True iff ANY line of the doc is
    (probably) in the benchmark filter. Pure map stage — the envelope
    ships via ``ray.put`` once and deserializes once per worker through
    the engine's hash-keyed sketch cache; per batch it's split →
    flatten → one vectorized ``contains_many`` → per-doc ANY via
    ``np.bincount``. No corpus shuffle."""
    import ray

    from ..engine.ops import get_or_load

    env = sketch if isinstance(sketch, bytes) else sketch.serialize()
    ref = ray.put(env)

    def probe(b: pa.Table) -> pa.Table:
        from .text import set_column

        bf = get_or_load(ray.get(ref))
        col = b.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern(col, "\n")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parents = np.asarray(pc.list_parent_indices(lists))
        ok = np.asarray(
            pc.greater_equal(
                pc.utf8_length(pc.utf8_trim_whitespace(flat)), min_len))
        hit = bf.contains_many(flat) & ok
        n_docs = b.num_rows
        any_hit = np.bincount(parents[hit], minlength=n_docs) > 0
        return set_column(b, flag_col, pa.array(any_hit))

    kwargs = {"batch_format": "pyarrow"}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(probe, **kwargs)


def decontaminate(ds, bench_ds, text_col: str = "text",
                  expected_insertions: int = 1_000_000,
                  fpp: float = 1e-4, min_len: int = 1):
    """Drop corpus docs sharing any line with the benchmark. Returns
    the filtered Dataset. No false negatives: every truly contaminated
    doc is removed; at most an ``fpp``-bounded sliver of clean docs is
    over-removed (the safe direction)."""
    bloom = benchmark_bloom(bench_ds, text_col, expected_insertions, fpp,
                            min_len)
    flagged = flag_contaminated(ds, bloom, text_col, "__contaminated",
                                min_len=min_len)

    def drop_flagged(b: pa.Table) -> pa.Table:
        mask = b.column("__contaminated")
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        return b.filter(pc.invert(mask)).drop_columns(["__contaminated"])

    return flagged.map_batches(drop_flagged, batch_format="pyarrow")
