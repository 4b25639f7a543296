"""Deterministic Common-Crawl-style web-pages table (BASELINE.json input_hint).

Schema exactly: ``url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string``. Everything is a pure seeded function of the
row index, so any process regenerates byte-identical rows:

* hosts are Zipf-distributed (s≈1.1) over a deterministic host list;
* ``html`` is templated from a seeded token stream per url;
* ``text`` is ``extract_text(html)`` — a deterministic pure function of
  the html bytes, giving the required per-row invariant
  ("byte-identical extracted text per url").

Generation itself runs through Ray Data (``range → map_batches``) so it
scales with the cluster; writing is partitioned parquet.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np
import pyarrow as pa

SEED = 42
N_HOSTS = 10_000
N_LANGS = 20
ZIPF_S = 1.1
_LANGS = [
    "en", "zh", "es", "de", "fr", "ja", "ru", "pt", "it", "nl",
    "pl", "tr", "ar", "ko", "sv", "cs", "fi", "hu", "el", "da",
]
_WORDS = None
_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in µs


def _wordlist() -> np.ndarray:
    global _WORDS
    if _WORDS is None:
        rng = np.random.default_rng(SEED)
        alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        lens = rng.integers(3, 10, size=2000)
        _WORDS = np.array(
            ["".join(rng.choice(alphabet, size=l)) for l in lens], dtype=object
        )
    return _WORDS


_WORDS_ARROW = None


def _wordlist_arrow():
    global _WORDS_ARROW
    if _WORDS_ARROW is None:
        import pyarrow as _pa

        _WORDS_ARROW = _pa.array(list(_wordlist()), type=_pa.large_string())
    return _WORDS_ARROW


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = ranks ** (-s)
    return np.cumsum(w) / w.sum()


_HOST_CDF = None
_LANG_CDF = None


def _cdfs():
    global _HOST_CDF, _LANG_CDF
    if _HOST_CDF is None:
        _HOST_CDF = _zipf_cdf(N_HOSTS, ZIPF_S)
        _LANG_CDF = _zipf_cdf(N_LANGS, 1.3)
    return _HOST_CDF, _LANG_CDF


_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(rb"[ \t\r\n]+")


def extract_text(html: bytes) -> str:
    """Deterministic text extraction — strip tags, collapse whitespace.

    Pure function of the html bytes: the per-row invariant the north
    rule checks ("byte-identical extracted text per url").
    """
    no_tags = _TAG_RE.sub(b" ", html)
    collapsed = _WS_RE.sub(b" ", no_tags).strip()
    return collapsed.decode("utf-8", errors="replace")


_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based PRNG: one vectorized pass, no per-row state."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return z ^ (z >> np.uint64(31))


def _uniform(idx: np.ndarray, stream: int) -> np.ndarray:
    h = _splitmix64(idx.astype(np.uint64) * np.uint64(1_000_003) + np.uint64(SEED * 2654435761 + stream))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def make_batch(indices: np.ndarray) -> pa.Table:
    """Rows for absolute indices — pure function of the index + SEED.

    Batch-boundary independent: row i's content depends only on i, so
    regeneration at any block size yields byte-identical rows.
    """
    host_cdf, lang_cdf = _cdfs()
    words = _wordlist()
    n = len(indices)
    idx = indices.astype(np.uint64)
    host_ids = np.searchsorted(host_cdf, _uniform(idx, 1))
    lang_ids = np.searchsorted(lang_cdf, _uniform(idx, 2))
    n_words = (20 + (_uniform(idx, 3) * 200)).astype(np.int64)

    # one flat vectorized word-pick stream for the whole batch
    total = int(n_words.sum())
    row_of = np.repeat(np.arange(n, dtype=np.int64), n_words)
    j_of = np.arange(total, dtype=np.uint64) - np.repeat(
        np.concatenate(([0], np.cumsum(n_words)[:-1])).astype(np.uint64), n_words
    )
    picks = _splitmix64(idx[row_of] * np.uint64(69_069) + j_of * np.uint64(2_654_435_761) + np.uint64(SEED)) % np.uint64(len(words))
    # arrow take on the (tiny, cached) word table instead of a numpy
    # object fancy-index: no per-pick Python string materialization
    words_arr = _wordlist_arrow()
    flat_words = words_arr.take(pa.array(picks.astype(np.int64)))
    bounds = np.concatenate(([0], np.cumsum(n_words)))

    # assemble every string column with Arrow kernels — no Python row
    # loop (byte-identical to the old per-row f-string path, pinned by
    # a golden test; ~20× faster per core). The extracted text of this
    # html template is exactly "title title body", so `text` is built
    # directly and stays a pure function of `html`.
    import pyarrow.compute as pc

    word_lists = pa.LargeListArray.from_arrays(
        pa.array(bounds, type=pa.int64()), flat_words)
    body = pc.binary_join(word_lists, pa.scalar(" ", pa.large_string())).cast(pa.string())
    title = pc.binary_join(pc.list_slice(word_lists, 0, 4),
                           pa.scalar(" ", pa.large_string())).cast(pa.string())
    host_s = pc.utf8_lpad(pc.cast(pa.array(host_ids.astype(np.int64)), pa.string()), 5, "0")
    id_s = pc.utf8_lpad(pc.cast(pa.array(indices.astype(np.int64)), pa.string()), 12, "0")
    url = pc.binary_join_element_wise(
        pa.scalar("https://host"), host_s, pa.scalar(".example.com/p/"), id_s, "")
    html = pc.binary_join_element_wise(
        pa.scalar("<html><head><title>"), title,
        pa.scalar("</title></head><body><h1>"), title,
        pa.scalar("</h1><p>"), body, pa.scalar("</p></body></html>"), "")
    text = pc.binary_join_element_wise(title, title, body, " ")
    langs = pa.array(np.asarray(_LANGS, dtype=object)[lang_ids], type=pa.string())
    ts = pa.array(_EPOCH_US + indices.astype(np.int64) * 1_000_000,
                  type=pa.timestamp("us"))
    return pa.table({
        "url": url,
        "warc_ts": ts,
        "html": html.cast(pa.binary()),
        "text": text,
        "lang": langs,
    })


def generate_dataset(n_rows: int, override_num_blocks: Optional[int] = None):
    """Distributed generation: ``range(n) → map_batches(make_batch)``."""
    import ray.data as rd

    ds = rd.range(n_rows, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return make_batch(np.asarray(batch.column("id")))

    # one batch per block → block count (and output file count) is
    # exactly override_num_blocks
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)


def ensure_webpages(n_rows: int, root: str = "/tmp/webpages",
                    num_files: int = 96) -> str:
    """Materialize (once) a deterministic webpages parquet dir for a size.

    ``num_files`` fixes the shard count (96 = a clean multiple of both
    bench parallelism levels, so scaling runs aren't quantization-bound).
    """
    out = os.path.join(root, f"n{n_rows}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    ds = generate_dataset(n_rows, override_num_blocks=min(num_files, max(1, n_rows // 250)))
    ds.write_parquet(out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def url_host(url_col) -> pa.Array:
    """Vectorized host extraction from the url column."""
    import pyarrow.compute as pc

    # https://{host}/... → split on '/', take element 2
    parts = pc.split_pattern(url_col, "/")
    return pc.list_element(parts, 2)
