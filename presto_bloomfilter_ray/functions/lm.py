"""Character n-gram language-model perplexity filtering (CCNet-style).

Wenzek et al. 2020 (CCNet) rank Common-Crawl documents by the
perplexity of a language model trained on a clean corpus — low
perplexity ≈ fluent prose, high ≈ gibberish/boilerplate soup. This is
that quality signal with a character-TRIGRAM model (the classic
KenLM-lite), Ray-Data-first:

* **Training is three bounded count exchanges** — trigram, bigram and
  unigram window-hash counts, each pre-combined per batch (the
  ``word_count`` combiner pattern over the rolling-hash machinery
  shared with :mod:`.substrings`). The model size is bounded by the
  corpus's distinct n-grams (≈ alphabet³), NOT its length — it
  broadcasts even at 100 TB.
* **Scoring is a pure map stage**: the sorted (hash → count) tables
  ship once via ``ray.put``; each batch recomputes window hashes, does
  two ``searchsorted`` lookups, and folds per-document sums with
  ``bincount`` — no Python loop over rows, windows, or characters.
* **The probability is conditional**: ``p(c₃|c₁c₂) = (c(tri)+α) /
  (c(bi)+α·A)`` with add-``alpha`` smoothing over the corpus alphabet
  ``A``; a document's score is the mean negative log-likelihood over
  its trigram positions, rounded before any comparison. Documents
  shorter than 3 characters have no positions and score NULL.

Windows are codepoints, so the SQL oracle recomputes the identical
model and scores from REAL ``substr`` n-grams (same hash-vs-character
collision contract as :mod:`.substrings`, P ≈ n²/2⁶⁵).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray

from .substrings import _codepoints, _window_hashes, _window_starts

__all__ = ["CharNgramLM", "train_char_lm", "score_perplexity"]


@dataclass
class CharNgramLM:
    tri_hash: np.ndarray    # sorted int64
    tri_count: np.ndarray   # int64, aligned
    bi_hash: np.ndarray     # sorted int64
    bi_count: np.ndarray    # int64, aligned
    alphabet: int           # distinct corpus characters
    alpha: float
    round_digits: int = 6


def _hash_counts(ds, text_col: str, L: int):
    """Distributed (window_hash → count) for length-``L`` windows:
    per-batch np.unique combine, then groupby-sum. Returns sorted
    parallel arrays."""
    from ray.data.aggregate import Sum

    def counts(b: pa.Table) -> pa.Table:
        codes, offsets, _ = _codepoints(b.column(text_col))
        starts, _docs = _window_starts(offsets, L)
        h = _window_hashes(codes, starts, L)
        if len(h) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uh, n = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uh), "n": pa.array(n.astype(np.int64))})

    df = (ds.map_batches(counts, batch_format="pyarrow")
          .groupby("h").aggregate(Sum("n", alias_name="n"))).to_pandas()
    if len(df) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    h = df["h"].to_numpy(dtype=np.int64)
    n = df["n"].to_numpy(dtype=np.int64)
    order = np.argsort(h)
    return h[order], n[order]


def train_char_lm(ds, text_col: str = "text", *, alpha: float = 0.5,
                  round_digits: int = 6) -> CharNgramLM:
    """Fit the conditional character-trigram model over a corpus."""
    tri_h, tri_n = _hash_counts(ds, text_col, 3)
    bi_h, bi_n = _hash_counts(ds, text_col, 2)
    uni_h, _ = _hash_counts(ds, text_col, 1)
    if len(uni_h) == 0:
        raise ValueError("train_char_lm: empty corpus")
    return CharNgramLM(tri_hash=tri_h, tri_count=tri_n,
                       bi_hash=bi_h, bi_count=bi_n,
                       alphabet=int(len(uni_h)), alpha=float(alpha),
                       round_digits=round_digits)


def _lookup(sorted_h: np.ndarray, counts: np.ndarray, h: np.ndarray):
    if len(sorted_h) == 0 or len(h) == 0:
        return np.zeros(len(h), dtype=np.float64)
    idx = np.clip(np.searchsorted(sorted_h, h), 0, len(sorted_h) - 1)
    out = np.where(sorted_h[idx] == h, counts[idx], 0)
    return out.astype(np.float64)


def score_perplexity(ds, lm: CharNgramLM, text_col: str = "text",
                     out_col: str = "nll"):
    """Append the per-document mean negative log-likelihood
    (``round(-mean ln p(c₃|c₁c₂), round_digits)``; NULL for docs with
    fewer than 3 characters)."""
    ref = ray.put((lm.tri_hash, lm.tri_count, lm.bi_hash, lm.bi_count,
                   float(lm.alphabet), lm.alpha, lm.round_digits))

    def score(b: pa.Table) -> pa.Table:
        tri_h, tri_n, bi_h, bi_n, A, alpha, rd = ray.get(ref)
        n_docs = b.num_rows
        codes, offsets, _ = _codepoints(b.column(text_col))
        starts, docs = _window_starts(offsets, 3)
        if len(starts) == 0:
            return b.append_column(out_col, pa.nulls(n_docs, pa.float64()))
        h3 = _window_hashes(codes, starts, 3)
        h2 = _window_hashes(codes, starts, 2)  # the conditioning bigram
        c3 = _lookup(tri_h, tri_n, h3)
        c2 = _lookup(bi_h, bi_n, h2)
        lp = np.log((c3 + alpha) / (c2 + alpha * A))
        sums = np.bincount(docs, weights=lp, minlength=n_docs)
        npos = np.bincount(docs, minlength=n_docs)
        with np.errstate(invalid="ignore", divide="ignore"):
            nll = np.round(-sums / npos, rd)
        return b.append_column(
            out_col, pa.array(nll, pa.float64(), mask=npos == 0))

    return ds.map_batches(score, batch_format="pyarrow")
