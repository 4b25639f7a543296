from .webpages import ensure_webpages, extract_text, generate_dataset, make_batch, url_host

__all__ = ["ensure_webpages", "extract_text", "generate_dataset", "make_batch", "url_host"]
