"""Distributed fixed-bin histogram with map-side combine.

The reference has no histogram operator (Presto's ``numeric_histogram``
served its SQL users); a corpus-analysis pass wants cheap distribution
shapes — document lengths, token counts, scores — without a sort.
Ray-Data-first shape: each batch collapses to a ``np.bincount`` vector
(one row per NON-EMPTY bin, so the exchange is at most
``n_bins + 2`` rows per batch regardless of batch size), then a tiny
``groupby(bin).sum`` finalizes. No row shuffle, no driver loop.

Bin semantics (shared verbatim with the SQL mirror):
``bin = floor((x - lo) / ((hi - lo) / n_bins))`` clamped to
``[-1, n_bins]`` — bin ``-1`` is underflow, bin ``n_bins`` overflow.
Both engines evaluate the same IEEE-double expression, so edge values
land in the same bin. NULLs are dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["histogram"]


def histogram(ds, col: str, lo: float, hi: float, n_bins: int):
    """Histogram of ``ds[col]`` over ``n_bins`` equal-width bins in
    ``[lo, hi)``. Returns a pandas DataFrame ``(bin, n)`` sorted by
    bin, including underflow (-1) / overflow (n_bins) rows when
    non-empty."""
    from ray.data.aggregate import Sum

    if not (n_bins > 0 and hi > lo):
        raise ValueError("need n_bins > 0 and hi > lo")
    width = (hi - lo) / n_bins

    def batch_hist(b: pa.Table) -> pa.Table:
        x = np.asarray(b.column(col), dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return pa.table({"bin": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        idx = np.clip(np.floor((x - lo) / width), -1, n_bins).astype(np.int64)
        counts = np.bincount(idx + 1, minlength=n_bins + 2)
        nz = np.nonzero(counts)[0]
        return pa.table({"bin": (nz - 1).astype(np.int64),
                         "n": counts[nz].astype(np.int64)})

    agg = (ds.map_batches(batch_hist, batch_format="pyarrow")
           .groupby("bin").aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas().sort_values("bin").reset_index(drop=True)
    df["n"] = df["n"].astype("int64")
    return df
