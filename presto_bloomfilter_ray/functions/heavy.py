"""Exact top-k heavy hitters — certified, in two map-only passes.

Misra–Gries (`sketches/topk.py`) gives approximate heavy hitters with
a proven error bound but estimated counts. The standard exact plan —
``GROUP BY item ORDER BY count DESC LIMIT k`` — shuffles every
distinct item. This operator gets EXACT counts for the true top-k
with rows never shuffling:

1. **candidates**: one distributed Misra–Gries pass with capacity
   ``C ≫ k`` (map-side partials through the merge tree — the existing
   :func:`engine.build_sketch` path). Any item with true frequency
   > N/(C+1) is guaranteed in the summary, so with the k-th true
   frequency above that bound the true top-k is a subset of the C
   candidates.
2. **recount**: broadcast the ≤ C candidate strings, one vectorized
   ``map_batches`` pass counts EXACT occurrences per candidate (an
   Arrow dictionary lookup + bincount per batch; each batch emits one
   length-C int64 row), driver sums blocks × C.
3. **certify**: the result is provably exact iff the k-th exact count
   > N/(C+1) (no unseen item can beat it). Below that the operator
   either raises (default) or returns with ``certified=False``.

Driver state: C counters. The corpus crosses the wire ZERO times.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["exact_heavy_hitters"]


def exact_heavy_hitters(ds, col: str, k: int = 10, *,
                        capacity: Optional[int] = None,
                        strict: bool = True):
    """Exact, certified top-k items of ``col`` by frequency.

    Returns a pandas DataFrame ``(item, n, certified)`` of exactly
    ``min(k, n_distinct)`` rows sorted by ``(-n, item)``. ``capacity``
    defaults to ``64·k`` (certification headroom); raise it for very
    flat distributions. With ``strict=True`` an uncertifiable result
    raises instead of silently returning a maybe-wrong tail.
    """
    import pandas as pd

    from ..engine import build_sketch
    from ..sketches.topk import TopK

    if k < 1:
        raise ValueError("k must be >= 1")
    sch = ds.schema()
    t = dict(zip(sch.names, sch.types)).get(col)
    if t is not None and (pa.types.is_binary(t)
                          or pa.types.is_large_binary(t)):
        # the MG summary keys are canonical strings (str() of the
        # normalized element) — raw bytes would round-trip through
        # repr and silently zero the recount
        raise ValueError("exact_heavy_hitters: binary columns are not "
                         "supported; decode or hash to string first")
    C = int(capacity) if capacity is not None else 64 * k
    if C < k:
        raise ValueError(f"capacity {C} < k {k}")

    sk = build_sketch(ds, col, lambda: TopK(C))
    cand = [w for w, _ in sk.top(C)]
    n_total = int(sk.total)
    if not cand:
        if n_total > 0:
            # non-empty stream but MG decrements emptied the summary
            # (all-equal pathological streams): nothing is provable
            if strict:
                raise RuntimeError(
                    f"exact_heavy_hitters: summary empty after "
                    f"evictions over N={n_total} — raise capacity")
        return pd.DataFrame({"item": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "certified": pd.Series([], dtype=bool)})
    cand_arr = pa.array(sorted(cand), type=pa.large_string())
    C_eff = len(cand_arr)

    def recount(b: pa.Table) -> pa.Table:
        from ..sketches.hashing import normalize_elements

        # run the recount column through the SAME canonical-string
        # path the sketch used to produce the candidates — a raw
        # index_in would rely on Arrow's cast agreeing with the
        # sketch's element model (booleans: 'true' vs 'True'), and a
        # disagreement silently zeroes the recount
        colv = normalize_elements(b.column(col)).combine_chunks()
        idx = pc.index_in(colv, value_set=cand_arr)
        ii = np.asarray(idx.cast(pa.int64()).fill_null(-1))
        ii = ii[ii >= 0]
        out = np.bincount(ii, minlength=C_eff).astype(np.int64)
        return pa.table({"c": pa.array([out.tolist()],
                                       type=pa.list_(pa.int64()))})

    parts = ds.map_batches(recount, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    total = np.zeros(C_eff, dtype=np.int64)
    for row in parts["c"]:
        total += np.asarray(row, dtype=np.int64)

    items = np.asarray(cand_arr.to_pylist(), dtype=object)
    order = np.lexsort((items, -total))
    take = min(k, C_eff)
    top_items = items[order[:take]]
    top_n = total[order[:take]]
    # certification: an item absent from the summary has true
    # frequency ≤ the sketch's own Misra–Gries bound (N/C, preserved
    # under the merge tree). With take == k the k-th exact count must
    # clear that bound. With take < k (MG evictions depleted the
    # summary below k) the result is only provably COMPLETE when no
    # eviction can have happened at all — N < C implies fewer than C
    # distinct items were ever seen, so the summary is exact; a
    # depleted summary over a large stream proves nothing about the
    # missing slots (any unseen item would qualify for them).
    bound = sk.error_bound()
    if take == k:
        certified = bool(float(top_n[-1]) > bound)
        why = (f"k-th count {int(top_n[-1])} ≤ unseen-item bound "
               f"{bound} (N={n_total}, capacity={C})")
    else:
        certified = bool(n_total < C)
        why = (f"summary holds only {take} < k={k} items after "
               f"evictions over N={n_total} ≥ capacity={C} — the "
               f"remaining top-k slots are unprovable")
    if strict and not certified:
        raise RuntimeError(
            f"exact_heavy_hitters: {why} — raise capacity to certify")
    return pd.DataFrame({"item": top_items,
                         "n": top_n.astype(np.int64),
                         "certified": np.full(take, certified)})
