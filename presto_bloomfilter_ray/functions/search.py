"""Distributed full-text retrieval: BM25 top-k over a document corpus.

The retrieval analog of the repo's term-weighting stage
(:func:`~.text.tfidf_top_terms`): given a small bag of query terms,
rank every document by Okapi BM25 and return the global top-k.

Scale shape (the part that matters at 100 TB):

* **text is read once.** One vectorized pass turns each batch into a
  narrow ``(doc_id, dl, tf[Q])`` table — ``Q`` Arrow regex kernels for
  per-term whole-word counts plus one for document length. The narrow
  dataset is ``(Q+2)×8`` bytes/doc (spillable), so re-consuming it for
  stats and scoring never re-reads or re-tokenizes the corpus.
* **corpus stats are an O(Q) fold, not a vocabulary exchange.** BM25
  needs df only for the ≤Q query terms, so each batch emits ONE row of
  partial counts and ``Dataset.sum`` tree-reduces them — no
  (term → df) groupby over the vocabulary, unlike TF-IDF's analysis
  use-case.
* **scoring broadcasts scalars.** (idf[Q], avgdl, N) ship to every
  scoring task by closure; each batch computes scores vectorized and
  keeps a local top-k, so the driver's final sort sees
  ≤ top_k × n_blocks candidate rows, never the corpus.

Reproducibility contract (mirrors ``tfidf_top_terms``): the score
expression is written with the exact operation order the SQL oracle
uses, rounded to ``round_digits`` BEFORE ranking; ties break on
``doc_id`` ascending.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import TOKEN_RE

__all__ = ["bm25_search", "bm25_sql_mirror"]


def _terms_of(query: Union[str, Sequence[str]]) -> List[str]:
    if isinstance(query, str):
        terms = re.findall(r"[A-Za-z0-9]+", query.lower())
    else:
        terms = [t.lower() for t in query]
    seen, out = set(), []
    for t in terms:
        if t and t not in seen:
            seen.add(t)
            out.append(t)
    if not out:
        raise ValueError("empty query")
    return out


def _term_pattern(term: str) -> str:
    """Whole-word, case-insensitive occurrence pattern — valid RE2, so
    the Arrow kernel and DuckDB ``regexp_extract_all`` agree exactly."""
    return r"(?i)\b" + re.escape(term) + r"\b"


def bm25_search(ds, query: Union[str, Sequence[str]], *,
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75, top_k: int = 10,
                round_digits: int = 6):
    """→ pandas ``(doc_id, score)``: the ``top_k`` documents of ``ds``
    by Okapi BM25 for ``query``, ties broken on ``doc_id`` ascending.

    ``tf`` counts case-insensitive whole-word occurrences; ``dl`` is
    the whitespace token count (:data:`~.text.TOKEN_RE`); idf is the
    Lucene-style non-negative ``ln((N - df + 0.5)/(df + 0.5) + 1)``.
    Documents matching no term are dropped before the top-k.
    """
    terms = _terms_of(query)
    Q = len(terms)
    pats = [_term_pattern(t) for t in terms]
    tf_cols = [f"tf_{i}" for i in range(Q)]

    def tf_dl(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        # null text ≡ zero counts: same rows the SQL mirror drops (its
        # NULL tf fails `tf > 0`) and a no-op in every stat fold
        cols = {id_col: batch.column(id_col).cast(pa.int64()),
                "dl": pc.fill_null(
                    pc.count_substring_regex(txt, TOKEN_RE), 0).cast(pa.int64())}
        for name, p in zip(tf_cols, pats):
            cols[name] = pc.fill_null(
                pc.count_substring_regex(txt, p), 0).cast(pa.int64())
        return pa.table(cols)

    # text read + tokenized exactly once; the narrow table is what gets
    # consumed twice (stats fold, then scoring)
    narrow = ds.map_batches(tf_dl, batch_format="pyarrow").materialize()

    def stat_partial(batch: pa.Table) -> pa.Table:
        row = {"n": pa.array([batch.num_rows], pa.int64()),
               "sdl": pa.array([pc.sum(batch.column("dl")).as_py() or 0],
                               pa.int64())}
        for name in tf_cols:
            nz = pc.sum(pc.cast(pc.greater(batch.column(name), 0),
                                pa.int64())).as_py() or 0
            row[f"df_{name}"] = pa.array([nz], pa.int64())
        return pa.table(row)

    agg = (narrow.map_batches(stat_partial, batch_format="pyarrow")
           .sum(["n", "sdl"] + [f"df_{c}" for c in tf_cols]))
    N = int(agg["sum(n)"])
    if N == 0:
        import pandas as pd
        return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    avgdl = agg["sum(sdl)"] / N  # double, same expression as the SQL
    df = np.array([agg[f"sum(df_{c})"] for c in tf_cols], dtype=np.float64)
    idf = np.log((N - df + 0.5) / (df + 0.5) + 1.0)

    def score_topk(batch: pa.Table) -> pa.Table:
        dl = np.asarray(batch.column("dl"), dtype=np.float64)
        # written in the oracle's operation order:
        #   k1 * ((1 - b) + (b * dl) / avgdl)
        denom_base = k1 * ((1.0 - b) + (b * dl) / avgdl)
        acc = np.zeros(len(dl), dtype=np.float64)
        hit = np.zeros(len(dl), dtype=bool)
        for q, name in enumerate(tf_cols):
            tf = np.asarray(batch.column(name), dtype=np.float64)
            acc = acc + idf[q] * (tf * (k1 + 1.0)) / (tf + denom_base)
            hit |= tf > 0
        score = np.round(acc, round_digits)
        ids = np.asarray(batch.column(id_col))
        sel = np.flatnonzero(hit)
        order = np.lexsort((ids[sel], -score[sel]))[:top_k]
        keep = sel[order]
        return pa.table({id_col: pa.array(ids[keep]),
                         "score": pa.array(score[keep], pa.float64())})

    cands = (narrow.map_batches(score_topk, batch_format="pyarrow")
             .take_all())  # ≤ top_k × n_blocks rows
    import pandas as pd
    out = pd.DataFrame(cands) if cands else pd.DataFrame(
        {id_col: [], "score": []})
    out = (out.sort_values(["score", id_col], ascending=[False, True])
           .head(top_k).reset_index(drop=True))
    return out.astype({id_col: "int64", "score": "float64"})


def bm25_sql_mirror(terms: Sequence[str], *, table: str = "documents",
                    text_col: str = "text", id_col: str = "doc_id",
                    k1: float = 1.2, b: float = 0.75, top_k: int = 10,
                    round_digits: int = 6) -> str:
    """The DuckDB query computing exactly :func:`bm25_search` — same
    RE2 patterns, same operation order, same rounding and tie-break.
    Used by the driver's ``oracle_sql()`` so the two stay in lockstep.
    """
    terms = _terms_of(terms)
    tf_exprs = ",\n           ".join(
        f"len(regexp_extract_all({text_col}, '{_term_pattern(t)}')) AS tf_{i}"
        for i, t in enumerate(terms))
    df_exprs = ",\n           ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms)))
    score_terms = "\n         + ".join(
        f"ln((n - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * ({k1} + 1.0))"
        f" / (tf_{i} + {k1} * ((1.0 - {b}) + ({b} * dl) / avgdl))"
        for i in range(len(terms)))
    any_hit = " OR ".join(f"tf_{i} > 0" for i in range(len(terms)))
    return f"""
        WITH tfdl AS (
          SELECT {id_col},
           len(regexp_extract_all({text_col}, '{TOKEN_RE}')) AS dl,
           {tf_exprs}
          FROM {table}
        ), stats AS (
          SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
           {df_exprs}
          FROM tfdl
        )
        SELECT {id_col},
          round({score_terms}, {round_digits}) AS score
        FROM tfdl, stats
        WHERE {any_hit}
        ORDER BY score DESC, {id_col}
        LIMIT {top_k}
    """
