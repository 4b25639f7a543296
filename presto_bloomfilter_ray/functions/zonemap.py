"""Zone maps: min/max statistics from parquet FOOTERS, used to prune
which files a range query reads at all.

At 100 TB "prune at the read" is the single biggest lever a range
query has: a corpus laid out by date/host/bucket answers a range
predicate from a fraction of its files, but only if something besides
the scan knows the per-file ranges. ``build_zonemap`` reads ONLY the
footers — distributed, one Ray task per batch of files, no data pages
touched — and returns a stats table orders of magnitude smaller than
the data (one row per row group). ``prune`` consults that small table
on the driver; ``pruned_read`` streams only the surviving files, with
the predicate re-applied per fragment so EXACTNESS NEVER DEPENDS ON
THE STATS: a file with absent/disabled statistics is always kept
(sound fallback), and a kept file's non-matching rows are filtered by
the residual predicate.

The zonemap table is itself a persistable artifact (plain Arrow —
write it with ``pq.write_table``): build once after ingest, reuse for
every query, the same role min/max zone maps play in warehouse
catalogs (Snowflake/Redshift) and parquet readers' row-group pruning
— lifted from "per scan, per footer" to "once, for the whole corpus".

Unlike the Bloom-filter semijoin (`engine/ops.py`, point-membership
pruning per the reference's bloom_filter_contains), a zone map prunes
RANGE predicates and costs bytes-per-file, not bits-per-key.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["build_zonemap", "prune", "pruned_read"]


def _expand(paths: Union[str, Sequence[str]]) -> List[str]:
    """A directory becomes its parquet files (recursive, sorted)."""
    if isinstance(paths, str):
        paths = [paths]
    out: List[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(_glob.glob(
                os.path.join(p, "**", "*.parquet"), recursive=True)))
        else:
            out.append(p)
    return out


def build_zonemap(paths: Union[str, Sequence[str]], column: str,
                  concurrency: Optional[int] = None) -> pa.Table:
    """Per-row-group (path, row_group, vmin, vmax, has_stats,
    num_rows) for one flat ``column``, from footers only.

    Footer reads run through Ray Data (``from_items → map_batches``)
    so a 100k-file corpus's metadata pass is cluster-wide, not a
    driver loop; the RESULT is tiny (a few dozen bytes per row group)
    and is collected to the driver by design — it is the catalog.
    ``vmin``/``vmax`` keep the column's own Arrow type. Files where
    the writer disabled statistics get ``has_stats=False`` (pruning
    must keep them)."""
    import ray.data as rd

    files = _expand(paths)
    if not files:
        raise ValueError("no parquet files found")

    def footer_stats(b: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        rows = {"path": [], "row_group": [], "vmin": [], "vmax": [],
                "has_stats": [], "num_rows": []}
        col_type = None
        for path in b.column("path").to_pylist():
            f = pq.ParquetFile(path)
            idx = f.schema_arrow.get_field_index(column)
            if idx < 0:
                raise KeyError(f"column {column!r} not in {path}")
            col_type = f.schema_arrow.field(idx).type
            md = f.metadata
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                ok = bool(st is not None and st.has_min_max)
                rows["path"].append(path)
                rows["row_group"].append(g)
                rows["vmin"].append(st.min if ok else None)
                rows["vmax"].append(st.max if ok else None)
                rows["has_stats"].append(ok)
                rows["num_rows"].append(md.row_group(g).num_rows)
        return pa.table({
            "path": pa.array(rows["path"], type=pa.string()),
            "row_group": pa.array(rows["row_group"], type=pa.int32()),
            "vmin": pa.array(rows["vmin"], type=col_type),
            "vmax": pa.array(rows["vmax"], type=col_type),
            "has_stats": pa.array(rows["has_stats"], type=pa.bool_()),
            "num_rows": pa.array(rows["num_rows"], type=pa.int64()),
        })

    ds = rd.from_items([{"path": p} for p in files])
    if concurrency:
        ds = ds.repartition(concurrency)
    parts = ds.map_batches(footer_stats, batch_format="pyarrow",
                           batch_size=64).to_arrow_refs()
    import ray as _ray

    tables = [t for t in _ray.get(parts) if t.num_rows]
    return pa.concat_tables(tables).sort_by(
        [("path", "ascending"), ("row_group", "ascending")])


def prune(zonemap: pa.Table, lo=None, hi=None) -> List[str]:
    """Files whose stats could contain a value in ``[lo, hi]`` (either
    bound may be None = unbounded). A file survives if ANY of its row
    groups intersects the range OR lacks stats — never a false
    exclusion, so downstream residual filtering stays exact."""
    keep = pc.invert(zonemap.column("has_stats"))
    if lo is not None:
        t = zonemap.column("vmax").type
        hit = pc.fill_null(pc.greater_equal(
            zonemap.column("vmax"), pa.scalar(lo, type=t)), False)
    else:
        hit = zonemap.column("has_stats")
    if hi is not None:
        t = zonemap.column("vmin").type
        hit = pc.and_(hit, pc.fill_null(pc.less_equal(
            zonemap.column("vmin"), pa.scalar(hi, type=t)), False))
    keep = pc.or_(keep, hit)
    kept = zonemap.column("path").filter(keep)
    return sorted(set(kept.to_pylist()))


def pruned_read(paths: Union[str, Sequence[str]], column: str,
                lo=None, hi=None, zonemap: Optional[pa.Table] = None,
                **read_kwargs):
    """Dataset of rows with ``column`` in ``[lo, hi]``, reading ONLY
    files the zone map cannot rule out. The same predicate is pushed
    into the read as a pyarrow filter (row-group pruning + residual
    per-fragment filtering inside each kept file), so results equal a
    full-scan filter regardless of stats quality. Extra
    ``read_kwargs`` (``columns=[...]`` etc.) pass through to
    ``read_parquet``."""
    import ray.data as rd

    files = _expand(paths)
    if zonemap is None:
        zonemap = build_zonemap(files, column)
    kept = prune(zonemap, lo, hi)

    expr = None
    if lo is not None:
        expr = pc.field(column) >= lo
    if hi is not None:
        e2 = pc.field(column) <= hi
        expr = e2 if expr is None else (expr & e2)

    if not kept:
        # empty result with the true schema — footer-only, no data read
        import pyarrow.parquet as pq

        schema = pq.read_schema(files[0])
        if "columns" in read_kwargs and read_kwargs["columns"]:
            schema = pa.schema([schema.field(c)
                                for c in read_kwargs["columns"]])
        return rd.from_arrow(schema.empty_table())
    return rd.read_parquet(kept, filter=expr, **read_kwargs)
