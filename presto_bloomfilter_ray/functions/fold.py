"""Bucket-keyed exact aggregation — the scale-safe replacement for
high-cardinality ``groupby(key).aggregate(...)``.

Ray 2.49's sort-based aggregate pays per-GROUP overhead on the reduce
side: summing 17M partial rows into 1M distinct keys costs ~100 s,
while the identical reduction grouped by ``hash(key) % num_buckets``
(small fixed cardinality) and folded per bucket with one vectorized
polars ``group_by`` costs ~2 s (measured; PERF.md §23). Exchange
volume and key co-location are identical — every row of a key lands in
that key's bucket — so the result table is bit-identical for the
order-independent ops supported here (sum / min / max / count).

This module generalizes the fold used by ``functions/graph.py``:

* map-side pre-fold (one vectorized ``group_by`` per input block)
  shrinks the exchange to per-block-distinct keys before any shuffle —
  the classic combiner, with ``count`` correctly rewritten to ``sum``
  on the combine side;
* the bucket column is a mixed 64-bit hash of the key columns, so
  correlated or clustered key values (sequential doc ids, sorted
  hashes) still spread evenly across buckets;
* skew: a bucket holds ~``n_keys / num_buckets`` DISTINCT keys no
  matter how hot any single key is, because the map-side pre-fold
  collapses each block's duplicates first — a Zipf-hot key contributes
  at most one row per input block to the exchange.

Used by: exact_dedup, dedup_lines_keep_first, connected components,
boilerplate/substring scrubs, pair-verification folds, PageRank.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

__all__ = ["append_bucket", "bucket_fold"]

#: ops supported: (polars map-side expr, polars combine-side expr)
_OPS = {"sum", "min", "max", "count"}


def _exprs(aggs: Sequence[Tuple[Optional[str], str, str]], combine: bool):
    """polars agg expressions for the map (raw rows) or combine
    (partial rows) side. ``count`` maps to ``len`` on raw rows and to
    ``sum`` of partial counts on the combine side."""
    import polars as pl

    out = []
    for col, op, alias in aggs:
        if op == "count":
            e = (pl.col(alias).sum() if combine
                 else pl.len().cast(pl.Int64))
        else:
            src = alias if combine else col
            e = getattr(pl.col(src), op)()
        out.append(e.alias(alias))
    return out


def append_bucket(b: pa.Table, key_cols, num_buckets: int,
                  alias: str = "_b") -> pa.Table:
    """Append ``alias = mixed_hash(struct(key_cols)) % num_buckets``.

    THE canonical co-location bucket for every bucket-keyed exchange
    in this package (fold, windows, snapshot delta): polars struct
    hash (seed 41) then a Fibonacci avalanche so sequential/clustered
    keys spread evenly. All rows of equal keys land in one bucket."""
    import polars as pl

    h = (pl.from_arrow(b.select(list(key_cols)))
         .select(pl.struct(list(key_cols)).hash(seed=41)
                 .alias("h"))["h"].to_numpy())
    mixed = (h.astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    return b.append_column(alias, pa.array(
        (mixed % np.uint64(num_buckets)).astype(np.int64)))


def bucket_fold(ds, keys: Sequence[str],
                aggs: Sequence[Tuple[Optional[str], str, str]],
                num_buckets: int = 64):
    """Exact ``groupby(keys).aggregate(...)`` via a bucket-keyed fold.

    ``aggs``: tuples ``(col, op, alias)`` with ``op`` in
    ``{"sum", "min", "max", "count"}`` (``col`` is ignored for
    ``count``). Returns a Dataset with columns ``keys + aliases``;
    values are bit-identical to the Ray aggregate for these
    order-independent ops. Key columns must be non-null (all callers
    group on computed hashes / ids). ``num_buckets`` bounds reduce
    parallelism and per-task group size — size it like a shuffle
    partition count (a bucket holds ~n_distinct_keys/num_buckets keys).
    """
    import polars as pl

    keys = list(keys)
    for _, op, _ in aggs:
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r}")
    map_exprs = _exprs(aggs, combine=False)
    combine_exprs = _exprs(aggs, combine=True)
    out_cols = keys + [a for _, _, a in aggs]

    def prefold(b: pa.Table) -> pa.Table:
        t = pl.from_arrow(b).group_by(keys).agg(map_exprs)
        return append_bucket(t.to_arrow(), keys, num_buckets)

    def fold(g: pa.Table) -> pa.Table:
        t = (pl.from_arrow(g.drop_columns(["_b"]))
             .group_by(keys).agg(combine_exprs))
        return t.select(out_cols).to_arrow()

    return (ds.map_batches(prefold, batch_format="pyarrow",
                           batch_size=None)
            .groupby("_b").map_groups(fold, batch_format="pyarrow"))
