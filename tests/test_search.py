"""BM25 retrieval contracts: SQL-mirror exactness, ranking semantics,
partitioning invariance, null/edge handling."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import bm25_search, bm25_sql_mirror

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast brown fox and a slow red fox",          # fox twice, short
    "dogs and cats live together in harmony",
    "fox",                                          # tiny doc, high tf density
    "the dog chased the other dog around the yard", # dog twice
    "nothing relevant here at all",
    "FOX Dog fox dOg",                              # case-insensitivity
]


def _table(texts, start=0):
    return pa.table({
        "doc_id": pa.array(range(start, start + len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _oracle(table, terms, **kw):
    con = duckdb.connect()
    con.register("documents", table)
    return con.execute(bm25_sql_mirror(terms, **kw)).df()


def test_bm25_matches_sql_mirror_exactly(ray_session):
    import ray.data as rd

    t = _table(DOCS)
    for parts in (1, 3):
        got = bm25_search(rd.from_arrow(t).repartition(parts),
                          ["fox", "dog"], top_k=5)
        ora = _oracle(t, ["fox", "dog"], top_k=5)
        assert got["doc_id"].tolist() == ora["doc_id"].tolist()
        assert got["score"].tolist() == ora["score"].tolist()  # bit-exact


def test_bm25_ranking_semantics(ray_session):
    import ray.data as rd

    got = bm25_search(rd.from_arrow(_table(DOCS)), "fox", top_k=10)
    ids = got["doc_id"].tolist()
    # only docs containing 'fox' (case-insensitive) appear
    assert set(ids) <= {0, 1, 3, 6}
    # doc 3 ("fox") has max tf density (dl=1): must outrank doc 0 (dl=9, tf=1)
    assert ids.index(3) < ids.index(0)
    # scores strictly positive and sorted desc with doc_id tiebreak
    assert (got["score"] > 0).all()
    assert got.sort_values(["score", "doc_id"], ascending=[False, True])[
        "doc_id"].tolist() == ids


def test_bm25_whole_word_and_query_forms(ray_session):
    import ray.data as rd

    t = _table(["catalog of items", "my cat sleeps", "cat"])
    # 'cat' must not match inside 'catalog'
    got = bm25_search(rd.from_arrow(t), "cat", top_k=10)
    assert set(got["doc_id"]) == {1, 2}
    # string query tokenizes + lowercases + dedupes like the list form
    a = bm25_search(rd.from_arrow(t), "Cat cat!", top_k=10)
    b = bm25_search(rd.from_arrow(t), ["cat"], top_k=10)
    assert a.equals(b)
    with pytest.raises(ValueError):
        bm25_search(rd.from_arrow(t), "   ")


def test_bm25_null_text_and_no_hits(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["fox here", None, "no match"], pa.string())})
    got = bm25_search(rd.from_arrow(t), ["fox"], top_k=5)
    assert got["doc_id"].tolist() == [0]
    ora = _oracle(t, ["fox"], top_k=5)
    assert got["score"].tolist() == ora["score"].tolist()
    # query matching nothing -> empty frame with stable schema
    none = bm25_search(rd.from_arrow(t), ["zebra"], top_k=5)
    assert len(none) == 0 and list(none.columns) == ["doc_id", "score"]


def test_bm25_topk_cut_is_global(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    texts = [" ".join(rng.choice(["fox", "dog", "bird", "pad"], size=20))
             for _ in range(200)]
    t = _table(texts)
    got = bm25_search(rd.from_arrow(t).repartition(8), ["fox", "bird"], top_k=7)
    ora = _oracle(t, ["fox", "bird"], top_k=7)
    assert len(got) == 7
    assert got["doc_id"].tolist() == ora["doc_id"].tolist()
    assert got["score"].tolist() == ora["score"].tolist()
