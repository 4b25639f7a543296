"""Exact distributed order statistics — no global sort, no value shuffle.

The sketch family answers quantile queries approximately (t-digest /
KLL, rank error ≤ published bounds). Sometimes the pipeline needs the
EXACT order statistic — billing cutoffs, SLA percentiles, reproducing
a SQL ``quantile_disc`` — and the naive exact plans are the two worst
operators at 100 TB: a global ``sort`` (all-to-all of every value) or
a driver ``take_all``. :func:`exact_quantile` instead runs the classic
iterative histogram-narrowing selection (distributed quickselect with
a 4096-ary pivot fan-out):

1. one fold pass for ``(count, min, max)`` — three scalars per block;
2. per round, every block histograms its values into ``n_bins`` bins
   over the current interval (pure map side), partials are summed on
   the driver (one ``n_bins``-long int row per BLOCK, bounded by block
   count, never by rows); the bin containing the target rank becomes
   the next interval;
3. when the candidate interval holds ≤ ``pull_limit`` rows, pull just
   those rows and finish with an exact ``np.partition``.

Each round shrinks the candidate set ~``n_bins``×, so 10^12 rows
resolve in 3 rounds of map-only passes + one tiny pull. Values never
shuffle; the only driver state is ``blocks × n_bins`` int64 partials
per round.

Float discipline: bins are assigned with ``np.searchsorted`` against
ONE shared edge array per round — the same floats that become the next
interval's bounds — so a value can never straddle rounds (floor-divide
binning can disagree with ``lo + i*width`` by one ulp and silently
drop boundary rows from the rank arithmetic).

Rank semantics match DuckDB/Postgres ``quantile_disc`` /
``percentile_disc``: the returned value is the element at 1-based rank
``ceil(q · n)`` of the sorted non-null column (``q = 0`` → rank 1).
The driver query's oracle IS that SQL function, compared value-exact.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Union

import numpy as np
import pyarrow as pa

__all__ = ["exact_quantile"]


def _minmax_count(ds, col: str):
    def part(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column(col), dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pa.table({"n": pa.array([0], type=pa.int64()),
                             "lo": pa.array([np.inf]),
                             "hi": pa.array([-np.inf])})
        return pa.table({"n": pa.array([v.size], type=pa.int64()),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    parts = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    return (int(parts["n"].sum()), float(parts["lo"].min()),
            float(parts["hi"].max()))


def _in_interval(v: np.ndarray, lo: float, hi: float,
                 hi_inc: bool) -> np.ndarray:
    return v[(v >= lo) & ((v <= hi) if hi_inc else (v < hi))]


def exact_quantile(ds, col: str, q: Union[float, Sequence[float]], *,
                   n_bins: int = 4096, pull_limit: int = 1_000_000,
                   max_rounds: int = 16) -> Union[float, List[float]]:
    """Exact ``quantile_disc`` of a numeric Dataset column (nulls/NaNs
    ignored, like SQL). ``q`` may be a scalar or a sequence; each
    quantile narrows independently (rounds are cheap map-only passes
    and len(q) is small).

    Raises on an empty column. ``max_rounds`` is a loud-failure guard:
    hitting it means the interval stopped shrinking below
    ``pull_limit`` candidates — raise rather than silently pulling an
    unbounded row set to the driver. If the interval collapses below
    float64 resolution first, the remaining candidates are
    indistinguishable and the shared value is returned directly.
    """
    qs = [float(q)] if np.isscalar(q) else [float(x) for x in q]
    if any(not (0.0 <= x <= 1.0) for x in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {qs}")
    n, lo0, hi0 = _minmax_count(ds, col)
    if n == 0:
        raise ValueError(f"exact_quantile: column {col!r} has no "
                         "non-null values")

    out: List[float] = []
    for qq in qs:
        k = max(1, math.ceil(qq * n))  # 1-based target rank (disc)
        lo, hi = lo0, hi0
        hi_inc = True  # the global top edge is inclusive (== max)
        below = 0  # rows strictly below lo, globally
        inside = n
        rounds = 0
        while inside > pull_limit and hi > lo:
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(
                    f"exact_quantile: interval [{lo}, {hi}] still holds "
                    f"{inside} candidates after {max_rounds} rounds "
                    f"(pull_limit={pull_limit}); raise pull_limit or "
                    "inspect the column for adversarial float spread")
            edges = np.linspace(lo, hi, n_bins + 1)
            inner = edges[1:-1]
            if inner.size == 0 or edges[1] <= lo or edges[-2] >= hi:
                break  # interval below float resolution: values equal

            def hist(b: pa.Table, lo=lo, hi=hi, hi_inc=hi_inc,
                     inner=inner) -> pa.Table:
                v = np.asarray(b.column(col), dtype=np.float64)
                v = _in_interval(v[~np.isnan(v)], lo, hi, hi_inc)
                if v.size == 0:
                    h = np.zeros(n_bins, dtype=np.int64)
                else:
                    idx = np.searchsorted(inner, v, side="right")
                    h = np.bincount(idx, minlength=n_bins).astype(np.int64)
                return pa.table({"h": pa.array([h.tolist()],
                                               type=pa.list_(pa.int64()))})

            parts = ds.map_batches(hist, batch_format="pyarrow",
                                   batch_size=None).to_pandas()
            total = np.zeros(n_bins, dtype=np.int64)
            for row in parts["h"]:
                total += np.asarray(row, dtype=np.int64)
            cum = below + np.cumsum(total)
            b_i = int(np.searchsorted(cum, k, side="left"))
            if b_i > 0:
                below = int(cum[b_i - 1])
                lo = float(edges[b_i])
            if b_i < n_bins - 1:
                hi = float(edges[b_i + 1])
                hi_inc = False
            inside = int(total[b_i])

        if hi <= lo:
            out.append(lo)  # all remaining candidates share one value
            continue
        if inside > pull_limit:
            out.append(lo)  # below-resolution break above: values equal
            continue

        def pull(b: pa.Table, lo=lo, hi=hi, hi_inc=hi_inc) -> pa.Table:
            v = np.asarray(b.column(col), dtype=np.float64)
            return pa.table(
                {"v": pa.array(_in_interval(v[~np.isnan(v)], lo, hi,
                                            hi_inc))})

        vals = ds.map_batches(pull, batch_format="pyarrow",
                              batch_size=None).to_pandas()["v"].to_numpy()
        r = k - below  # rank within the pulled interval, 1-based
        if not (1 <= r <= vals.size):
            raise RuntimeError(
                f"exact_quantile internal rank error: r={r}, "
                f"pulled={vals.size} (q={qq}, k={k}, below={below})")
        out.append(float(np.partition(vals, r - 1)[r - 1]))
    return out[0] if np.isscalar(q) else out
