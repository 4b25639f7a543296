"""Vectorized JSON field extraction over Arrow string columns.

The reference plugin has no JSON surface (Presto's own ``json_extract``
served that role in its SQL queries); a web-scale ingestion pipeline
needs one because crawl metadata — WARC headers, page properties,
event payloads — ships as JSON strings. Ray-Data-first shape: polars'
Rust JSONPath kernel runs inside ``map_batches`` over zero-copy Arrow
columns, so there is no per-row ``json.loads`` in the hot path and no
Python-object materialization.

Semantics (shared with the DuckDB oracle `json_extract_string` +
``TRY_CAST``): a missing path, a SQL NULL input, malformed JSON, or a
value that does not cast to the requested type all yield NULL — the
extraction never throws on data.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import pyarrow as pa

__all__ = ["json_extract", "json_extract_fields"]

_PL_DTYPES: Dict[str, str] = {
    "int64": "Int64",
    "int32": "Int32",
    "double": "Float64",
    "float": "Float32",
    "string": "String",
    "large_string": "String",
    "bool": "Boolean",
}


def _pl_dtype(dtype: Optional[Union[str, pa.DataType]]):
    """Map a pyarrow dtype (or its name) to the polars cast target."""
    import polars as pl

    if dtype is None:
        return pl.String
    name = dtype if isinstance(dtype, str) else str(dtype)
    try:
        return getattr(pl, _PL_DTYPES[name])
    except KeyError:
        raise ValueError(
            f"unsupported json_extract dtype {name!r}; "
            f"one of {sorted(_PL_DTYPES)}") from None


def json_extract_fields(
    batch: pa.Table,
    col: str,
    fields: Dict[str, Tuple[str, Optional[Union[str, pa.DataType]]]],
) -> pa.Table:
    """Extract several JSONPath fields from ``batch[col]`` in ONE
    vectorized pass.

    ``fields`` maps output column name -> (JSONPath, pyarrow dtype or
    None for string). Casts are lenient (non-castable -> NULL), matching
    the oracle's ``TRY_CAST(json_extract_string(col, path) AS T)``.
    """
    import polars as pl

    expr = [
        pl.col(col).str.json_path_match(path)
        .cast(_pl_dtype(dtype), strict=False).alias(out)
        for out, (path, dtype) in fields.items()
    ]
    extracted = pl.from_arrow(batch.select([col])).select(expr).to_arrow()
    for out in fields:
        arr = extracted[out]
        # polars emits large_string; normalize to string for schema
        # stability across engines.
        if pa.types.is_large_string(arr.type):
            arr = arr.cast(pa.string())
        batch = batch.append_column(out, arr)
    return batch


def json_extract(
    batch: pa.Table,
    col: str,
    path: str,
    out_col: str,
    dtype: Optional[Union[str, pa.DataType]] = None,
) -> pa.Table:
    """Extract one JSONPath field: ``json_extract(b, "props", "$.k",
    "k", pa.int64())``. See `json_extract_fields` for semantics."""
    return json_extract_fields(batch, col, {out_col: (path, dtype)})
