"""Column profiling — the data-quality pass run before training jobs:
per-column row / null / exact-distinct counts over any Dataset.

One tokenizing-free pass: each batch emits, per column, one meta row
(rows, nulls) and its batch-distinct 64-bit value hashes (the
word_count combiner shape — the exchange carries per-batch distinct
hashes, never values). Distinct counts are exact up to 64-bit hash
collisions (≈ n²/2⁶⁴ — the same contract `exact_dedup` ships with).
NULLs are excluded from distinct, matching SQL ``count(DISTINCT c)``.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

__all__ = ["profile_table"]


def profile_table(ds, columns: Optional[List[str]] = None):
    """→ pandas ``(column, n_rows, n_null, n_distinct)`` sorted by
    column name."""
    import pandas as pd
    import polars as pl
    from ray.data.aggregate import Count, Sum

    cols = columns or ds.schema().names

    def partials(b: pa.Table) -> pa.Table:
        out_col, out_h, out_rows, out_null = [], [], [], []
        for c in cols:
            col = b.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out_col.append(c)
            out_h.append(None)  # meta row
            out_rows.append(len(col))
            out_null.append(col.null_count)
            nn = col.drop_null()
            if len(nn):
                s = pl.from_arrow(nn)
                if isinstance(s, pl.DataFrame):  # pragma: no cover
                    s = s.to_series()
                hs = np.unique(
                    s.hash(seed=0xC01).to_numpy().astype(np.int64))
                out_col.extend([c] * len(hs))
                out_h.extend(hs.tolist())
                out_rows.extend([0] * len(hs))
                out_null.extend([0] * len(hs))
        return pa.table({
            "col": pa.array(out_col, type=pa.string()),
            "h": pa.array(out_h, type=pa.int64()),
            "n_rows": pa.array(out_rows, type=pa.int64()),
            "n_null": pa.array(out_null, type=pa.int64()),
        })

    import pyarrow.compute as pc

    tagged = ds.map_batches(partials, batch_format="pyarrow").materialize()
    meta = (tagged.map_batches(
                lambda b: b.filter(pc.is_null(b.column("h"))),
                batch_format="pyarrow")
            .groupby("col")
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("n_null", alias_name="n_null"))
            .to_pandas())
    distinct = (tagged.map_batches(
                    lambda b: b.filter(pc.is_valid(b.column("h"))),
                    batch_format="pyarrow")
                .groupby(["col", "h"]).aggregate(Count(alias_name="_"))
                .groupby("col").count().to_pandas()
                .rename(columns={"count()": "n_distinct"}))
    if distinct.empty:  # every column all-NULL: no hash rows at all
        distinct = pd.DataFrame({"col": pd.array([], dtype="object"),
                                 "n_distinct": pd.array([], dtype="int64")})
    out = meta.merge(distinct, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out = out.rename(columns={"col": "column"})
    return (out[["column", "n_rows", "n_null", "n_distinct"]]
            .sort_values("column").reset_index(drop=True))
