"""DSIR-style data selection via importance resampling.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling") select pretraining documents whose bag-of-ngram
distribution looks like a small high-quality TARGET corpus: score each
raw document with the log importance ratio ``Σ_tokens ln(p_target(w) /
p_raw(w))`` under smoothed unigram models, then sample ∝ exp(weight)
with the Gumbel top-k trick. This module is that recipe
Ray-Data-first:

* **Both language models are one vocabulary-sized exchange each**
  (the :func:`~.text.word_count` combiner: per-batch ``value_counts``,
  then ``groupby(term).sum``). The driver holds only the fitted
  ``(term → log-ratio)`` table; ``max_vocab`` caps it for web-scale
  corpora (terms ranked by raw count desc, term asc — rarer terms
  score 0, like hashed-feature DSIR's collision floor but
  deterministic).
* **Scoring + selection is one map stage**: the log-ratio table
  broadcasts via ``ray.put``; each batch scores documents with a vocab
  ``searchsorted`` + ``bincount`` weighted sum, adds the deterministic
  Gumbel perturbation, and keeps a LOCAL top-k — the final sort sees
  ≤ k × n_blocks candidate rows, never the corpus.
* **Selection is reproducible**: the Gumbel noise is a pure function
  of the id column (``u = ((id·2654435761) mod 2³² + 0.5) / 2³²``,
  ``g = −ln(−ln u)`` — the same multiplicative-hash uniform as
  :func:`~.sampling.hash_sample`), keys are rounded to
  ``round_digits`` before ranking, ties break on id ascending — so a
  SQL oracle recomputes the identical selected set.

Smoothing contract (what the SQL mirror recomputes): the vocabulary V
is the raw corpus's distinct terms (after the optional cap); both
models are add-``alpha`` over that shared V, with target counts
restricted to it; tokens outside V contribute nothing.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray

__all__ = ["dsir_logratios", "dsir_select"]


def _collect_counts(ds, text_col: str):
    """word_count → driver dict-free arrays (terms, counts)."""
    from .text import word_count

    df = word_count(ds, text_col=text_col).to_pandas()
    if len(df) == 0:  # empty Datasets drop their schema through to_pandas
        return (np.zeros(0, dtype=object), np.zeros(0, dtype=np.int64))
    return df["word"].to_numpy(dtype=object), df["n"].to_numpy(dtype=np.int64)


def dsir_logratios(raw_ds, target_ds, text_col: str = "text", *,
                   alpha: float = 1.0, max_vocab: Optional[int] = None):
    """Fit the unigram importance model. Returns ``(vocab sorted str
    array, log-ratio float64 array)`` aligned by position."""
    r_terms, r_counts = _collect_counts(raw_ds, text_col)
    if len(r_terms) == 0:
        raise ValueError("dsir: no tokens in the raw corpus")
    if max_vocab is not None and len(r_terms) > max_vocab:
        order = np.lexsort((r_terms.astype(str), -r_counts))[:int(max_vocab)]
        r_terms, r_counts = r_terms[order], r_counts[order]
    t_terms, t_counts = _collect_counts(target_ds, text_col)

    vocab = np.sort(r_terms.astype(str))
    V = len(vocab)
    c_raw = np.zeros(V, dtype=np.float64)
    c_raw[np.searchsorted(vocab, r_terms.astype(str))] = r_counts
    c_tgt = np.zeros(V, dtype=np.float64)
    if len(t_terms):
        tt = t_terms.astype(str)
        idx = np.searchsorted(vocab, tt)
        idx_c = np.minimum(idx, V - 1)
        m = vocab[idx_c] == tt  # target terms outside V drop out
        c_tgt[idx_c[m]] = t_counts[m]
    t_tot, r_tot = c_tgt.sum(), c_raw.sum()
    logratio = (np.log((c_tgt + alpha) / (t_tot + alpha * V))
                - np.log((c_raw + alpha) / (r_tot + alpha * V)))
    return vocab, logratio


def dsir_select(raw_ds, target_ds, k: int, text_col: str = "text",
                id_col: str = "doc_id", *, alpha: float = 1.0,
                max_vocab: Optional[int] = None, round_digits: int = 6,
                key_col: str = "dsir_key"):
    """Select ``k`` raw documents by Gumbel-top-k importance resampling
    toward ``target_ds``'s unigram distribution. Returns a Dataset of
    the selected rows (all original columns + ``key_col``), sorted by
    key descending / id ascending."""
    from .classify import _explode_tokens

    vocab, logratio = dsir_logratios(raw_ds, target_ds, text_col,
                                     alpha=alpha, max_vocab=max_vocab)
    ref = ray.put((vocab, logratio))
    k = int(k)

    def score_topk(batch: pa.Table) -> pa.Table:
        vocab_, lr = ray.get(ref)
        n = batch.num_rows
        w = np.zeros(n, dtype=np.float64)
        flat, parents = _explode_tokens(batch, text_col)
        if len(flat):
            toks = np.asarray(flat, dtype=object).astype(str)
            par = np.asarray(parents, dtype=np.int64)
            idx = np.searchsorted(vocab_, toks)
            idx_c = np.minimum(idx, len(vocab_) - 1)
            m = vocab_[idx_c] == toks
            if m.any():
                w += np.bincount(par[m], weights=lr[idx_c[m]], minlength=n)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        u = (((ids.astype(np.uint64) * np.uint64(2654435761))
              % np.uint64(1 << 32)).astype(np.float64) + 0.5) / float(1 << 32)
        key = np.round(w - np.log(-np.log(u)), round_digits)
        out = batch.append_column(key_col, pa.array(key, pa.float64()))
        if n <= k:
            return out
        # local top-k: the global sort sees ≤ k rows per block
        order = np.lexsort((ids, -key))[:k]
        return out.take(pa.array(np.sort(order)))

    cand = raw_ds.map_batches(score_topk, batch_format="pyarrow")
    return cand.sort([key_col, id_col], descending=[True, False]).limit(k)
