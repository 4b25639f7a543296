"""Distributed multinomial Naive Bayes text classification.

The quality/domain classifier stage of a training-data pipeline
(fastText-style linear bag-of-words scoring, e.g. GPT-3's WebText-vs-
Common-Crawl filter or CCNet's language buckets), expressed
Ray-Data-first:

* **Training is two vocabulary-sized exchanges, never a row shuffle.**
  Each batch tokenizes vectorized (Arrow ``split_pattern_regex``) and
  pre-combines ``(label, term) → count`` with polars, so the
  ``groupby([label, term]).sum`` moves per-batch distinct terms —
  Zipf-hot terms are absorbed map-side (the ``word_count`` combiner
  pattern). Label priors are a tiny ``groupby(label).count``.
* **The model is a broadcast, prediction is a pure map stage.** The
  fitted ``(V × L)`` log-probability matrix ships once via ``ray.put``;
  each scoring batch is one ``searchsorted`` vocab lookup plus one
  ``np.add.at`` scatter-accumulate — no Python loop over rows or
  tokens.
* **Web-scale vocabulary is bounded by ``max_vocab``** (keep the
  top-V terms by global training count; rarer terms fall out of the
  model exactly like feature hashing's collision floor, but
  deterministically). The driver only ever holds the capped model.

Reproducibility contract (mirrors ``tfidf_top_terms`` /
``bm25_search``): token pattern is ``\\S+`` (SQL
``regexp_extract_all``), smoothing is add-``alpha`` over the training
vocabulary, scores are ``round(prior + Σ log‑prob, round_digits)``
BEFORE the argmax, and argmax ties break on label ascending — so a SQL
oracle recomputes the identical prediction.

Reference anchor: the reference engine's aggregation surface is
"build a compact summary distributed, broadcast it, probe in a map
stage" (`BloomFilterAggregation.java` + `bloom_filter_contains`); this
module is the same shape with a log-probability table as the summary.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

__all__ = ["NBModel", "nb_train", "nb_predict"]


@dataclass
class NBModel:
    """Fitted multinomial NB: sorted label + vocab arrays and the dense
    smoothed log-probability matrix (V rows × L label columns)."""

    labels: np.ndarray      # (L,) unicode, sorted ascending
    log_prior: np.ndarray   # (L,) float64: ln(n_docs_label / n_docs)
    vocab: np.ndarray       # (V,) unicode, sorted ascending
    log_prob: np.ndarray    # (V, L) float64: ln((c+α)/(tot_label+α·V))
    alpha: float
    round_digits: int = 6

    @property
    def n_labels(self) -> int:
        return len(self.labels)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)


def _explode_tokens(batch: pa.Table, text_col: str):
    """Vectorized ``\\S+`` tokenization → (flat tokens, parent row idx)."""
    toks = pc.split_pattern_regex(batch.column(text_col), r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    return pc.filter(flat, keep), pc.filter(parents, keep)


def nb_train(ds, text_col: str = "text", label_col: str = "lang", *,
             alpha: float = 1.0, max_vocab: Optional[int] = None,
             round_digits: int = 6) -> NBModel:
    """Fit a multinomial NB classifier over a labelled Dataset.

    The exchange carries pre-combined ``(label, term, n)`` rows
    (vocabulary-sized); the driver holds only the final model
    (``max_vocab`` caps it for web-scale corpora — terms are ranked by
    total count descending, term ascending, so the cap is
    deterministic).
    """
    import polars as pl
    from ray.data.aggregate import Sum

    def batch_counts(batch: pa.Table) -> pa.Table:
        flat, parents = _explode_tokens(batch, text_col)
        if len(flat) == 0:
            return pa.table({"label": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        label = pc.take(batch.column(label_col), parents)
        t = pl.DataFrame({"label": pl.from_arrow(label),
                          "term": pl.from_arrow(flat)})
        agg = t.group_by(["label", "term"]).agg(n=pl.len().cast(pl.Int64))
        return agg.to_arrow()

    counts = (ds.map_batches(batch_counts, batch_format="pyarrow")
              .groupby(["label", "term"])
              .aggregate(Sum("n", alias_name="n"))).to_pandas()
    if len(counts) == 0:
        raise ValueError("nb_train: no tokens in training data")

    # label priors from document counts (tiny groupby)
    doc_counts = {r[label_col]: r["count()"]
                  for r in ds.groupby(label_col).count().take_all()}
    labels = np.array(sorted(doc_counts), dtype=object)
    n_docs = float(sum(doc_counts.values()))
    log_prior = np.log(np.array([doc_counts[l] for l in labels],
                                dtype=np.float64) / n_docs)

    if max_vocab is not None:
        totals = (counts.groupby("term", as_index=False)["n"].sum()
                  .sort_values(["n", "term"], ascending=[False, True],
                               kind="stable"))
        kept = set(totals["term"].head(int(max_vocab)))
        counts = counts[counts["term"].isin(kept)]

    vocab = np.sort(counts["term"].unique())
    V = len(vocab)
    L = len(labels)
    c = np.zeros((V, L), dtype=np.float64)
    li = {l: i for i, l in enumerate(labels)}
    vi = np.searchsorted(vocab, counts["term"].to_numpy())
    rows_l = np.array([li[l] for l in counts["label"]], dtype=np.int64)
    c[vi, rows_l] = counts["n"].to_numpy(dtype=np.float64)
    tot = c.sum(axis=0)  # tokens per label (within the kept vocab)
    log_prob = np.log((c + alpha) / (tot + alpha * V))
    return NBModel(labels=labels, log_prior=log_prior,
                   vocab=vocab.astype(object), log_prob=log_prob,
                   alpha=float(alpha), round_digits=round_digits)


def nb_predict(ds, model: NBModel, text_col: str = "text",
               out_col: str = "pred_label"):
    """Score + argmax every document against a broadcast NB model.

    Pure map stage: the model ships once (``ray.put``), each batch does
    one vocab ``searchsorted`` and one ``np.add.at`` scatter — tokens
    outside the training vocabulary are ignored (they carry no signal
    the model has seen; the SQL mirror's inner join drops them the same
    way). Documents with no in-vocabulary tokens fall back to the
    prior argmax.
    """
    # unicode arrays compare by codepoint in both numpy and python sort,
    # so searchsorted against the np.sort-ed vocab is exact
    vocab_u = model.vocab.astype(str)
    ref = ray.put((vocab_u, model.log_prob, model.log_prior,
                   model.labels.astype(str), model.round_digits))

    def score(batch: pa.Table) -> pa.Table:
        vocab, log_prob, log_prior, labels, rd = ray.get(ref)
        n = batch.num_rows
        if n == 0:
            return batch.append_column(out_col, pa.array([], pa.string()))
        flat, parents = _explode_tokens(batch, text_col)
        scores = np.tile(log_prior, (n, 1))
        if len(flat) > 0:
            toks = np.asarray(flat, dtype=object).astype(str)
            par = np.asarray(parents, dtype=np.int64)
            idx = np.searchsorted(vocab, toks)
            idx_c = np.minimum(idx, len(vocab) - 1)
            matched = vocab[idx_c] == toks
            if matched.any():
                np.add.at(scores, par[matched], log_prob[idx_c[matched]])
        scores = np.round(scores, rd)
        # argmax returns the FIRST max → label-ascending tie-break,
        # matching the SQL mirror's ORDER BY score DESC, label ASC
        pred = labels[np.argmax(scores, axis=1)]
        return batch.append_column(out_col, pa.array(pred, pa.string()))

    return ds.map_batches(score, batch_format="pyarrow")
