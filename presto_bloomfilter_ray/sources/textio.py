"""Format-adapting ingestion for the canonical ``documents`` schema.

The reference has no file readers (Presto connectors supplied tables,
SURVEY §2.3); a standalone corpus engine must ingest what crawls and
dumps actually ship as — Parquet, JSONL, CSV — and normalize them to
ONE schema so every downstream operator is format-agnostic.

Ray-Data-first: each reader is the native ``ray.data.read_*`` (so
reads stay distributed, streamed, and column-pruned where the format
allows) followed by a single vectorized ``map_batches`` normalization
pass (:func:`normalize_documents`): column presence, Arrow dtype
casts, NULL text → "" policy, derived ``n_chars`` when absent.
"""

from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

DOCUMENTS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int32()),
])

__all__ = ["DOCUMENTS_SCHEMA", "normalize_documents",
           "read_documents", "write_documents_jsonl",
           "write_documents_csv"]


def _normalize_batch(batch: pa.Table) -> pa.Table:
    cols = {}
    names = set(batch.column_names)
    for field in DOCUMENTS_SCHEMA:
        if field.name in names:
            col = batch.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols[field.name] = col
        elif field.name != "n_chars":
            raise ValueError(
                f"ingested batch is missing required column {field.name!r} "
                f"(has {sorted(names)})")
    cols["text"] = pc.fill_null(cols["text"], "")
    if "n_chars" not in cols:
        # derive from the (null-filled) text when the format lacks it
        cols["n_chars"] = pc.utf8_length(cols["text"]).cast(pa.int32())
    return pa.table({f.name: cols[f.name] for f in DOCUMENTS_SCHEMA})


def normalize_documents(ds):
    """One vectorized pass casting any ingested table to
    `DOCUMENTS_SCHEMA` (missing ``n_chars`` derived, NULL text → "")."""
    return ds.map_batches(_normalize_batch, batch_format="pyarrow")


def read_documents(path: str, fmt: Optional[str] = None):
    """Read a documents table from ``path`` in ``fmt``
    (``parquet`` | ``jsonl`` | ``csv``; inferred from the extension
    when omitted) and normalize it to the canonical schema. Reads are
    the native distributed Ray Data readers; parquet prunes columns at
    the read."""
    import ray.data as rd

    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = {"jsonl": "jsonl", "json": "jsonl", "csv": "csv",
               "parquet": "parquet"}.get(ext)
        if fmt is None:  # a directory of files: sniff its contents
            names = os.listdir(path) if os.path.isdir(path) else []
            for ext2, f2 in (("parquet", "parquet"), ("json", "jsonl"),
                             ("csv", "csv")):
                if any(n.endswith("." + ext2) for n in names):
                    fmt = f2
                    break
    if fmt == "parquet":
        import pyarrow.dataset as pads

        # prune to the canonical columns, but only those the file
        # actually has — a missing n_chars is derived by normalize
        have = set(pads.dataset(path).schema.names)
        ds = rd.read_parquet(path, columns=[
            f.name for f in DOCUMENTS_SCHEMA if f.name in have])
    elif fmt == "jsonl":
        ds = rd.read_json(path)
    elif fmt == "csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(f"cannot infer format for {path!r}; pass fmt=")
    return normalize_documents(ds)


def write_documents_jsonl(ds, path: str) -> str:
    """Partitioned JSONL sink (one file per block — resumable layout)."""
    normalize_documents(ds).write_json(path)
    return path


def write_documents_csv(ds, path: str) -> str:
    """Partitioned CSV sink."""
    normalize_documents(ds).write_csv(path)
    return path
