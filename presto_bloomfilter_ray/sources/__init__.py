from .textio import (
    DOCUMENTS_SCHEMA,
    normalize_documents,
    read_documents,
    write_documents_csv,
    write_documents_jsonl,
)
from .webpages import ensure_webpages, extract_text, generate_dataset, make_batch, url_host

__all__ = [
    "DOCUMENTS_SCHEMA", "normalize_documents", "read_documents",
    "write_documents_csv", "write_documents_jsonl",
    "ensure_webpages", "extract_text", "generate_dataset", "make_batch",
    "url_host",
]
