"""Product quantization: train → encode → ADC search → refined rerank.

Pins the exactness contract (`rerank ≥ n` reproduces exact top-k by
construction), code layout (m uint8 per vector), determinism, and ADC
recall on clustered data.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import (
    pq_encode,
    pq_search,
    pq_search_refined,
    pq_train,
    topk_cosine,
)


def _emb_ds(n=600, d=32, seed=5, clusters=6):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (clusters, d))
    assign = rng.integers(0, clusters, n)
    mat = centers[assign] + rng.normal(0, 0.15, (n, d))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.astype(np.float32).ravel()), d),
    })).repartition(4), mat


def test_train_deterministic_and_shapes(ray_session):
    ds, _ = _emb_ds()
    b1 = pq_train(ds, m=8, nbits=4, seed=3)
    b2 = pq_train(ds, m=8, nbits=4, seed=3)
    assert b1.shape == (8, 16, 4) and b1.dtype == np.float32
    assert np.array_equal(b1, b2)


def test_encode_layout(ray_session):
    ds, _ = _emb_ds(n=200)
    books = pq_train(ds, m=4, nbits=8)
    codes = pq_encode(ds, books, id_col="vec_id")
    sch = codes.schema().base_schema
    f = sch.field("code")
    assert pa.types.is_fixed_size_list(f.type) and f.type.list_size == 4
    assert f.type.value_type == pa.uint8()
    t = codes.take_all()
    assert len(t) == 200 and len(t[0]["code"]) == 4


def test_refined_with_full_rerank_is_exact(ray_session):
    ds, mat = _emb_ds(n=400)
    books = pq_train(ds, m=8, nbits=6)
    codes = pq_encode(ds, books)
    q = mat[7]
    exact = topk_cosine(ds, q, k=10)
    got = pq_search_refined(ds, codes, books, q, k=10, rerank=400)
    assert got["vec_id"].tolist() == exact["vec_id"].tolist()
    assert np.allclose(got["score"].to_numpy(), exact["score"].to_numpy())


def test_adc_recall_on_clustered_data(ray_session):
    ds, mat = _emb_ds(n=800, clusters=5)
    books = pq_train(ds, m=8, nbits=8)
    codes = pq_encode(ds, books)
    q = mat[3]
    exact_ids = set(topk_cosine(ds, q, k=10)["vec_id"].astype(int))
    adc = pq_search(codes, books, q, k=100)
    assert len(adc) == 100
    got_ids = set(adc["vec_id"].astype(int))
    # Plain PQ can't rank near-identical intra-cluster rows, but a
    # shortlist of 100 must capture the true top-10 (all of which sit
    # in the query's cluster, far from every other cluster in code
    # space) — the property the refined reranker relies on.
    assert len(got_ids & exact_ids) >= 8


def test_default_rerank_beats_raw_adc(ray_session):
    ds, mat = _emb_ds(n=800, clusters=5)
    books = pq_train(ds, m=4, nbits=4)  # deliberately coarse codes
    codes = pq_encode(ds, books)
    q = mat[11]
    exact_ids = set(topk_cosine(ds, q, k=10)["vec_id"].astype(int))
    refined = pq_search_refined(ds, codes, books, q, k=10)  # rerank=8k
    ref_ids = set(refined["vec_id"].astype(int))
    adc_ids = set(pq_search(codes, books, q, k=10)["vec_id"].astype(int))
    assert len(ref_ids & exact_ids) >= len(adc_ids & exact_ids)
    # refined scores are TRUE cosines of real rows: descending, ≤ 1
    s = refined["score"].to_numpy()
    assert (np.diff(s) <= 1e-12).all() and (s <= 1.0 + 1e-6).all()


def test_validation_errors(ray_session):
    ds, _ = _emb_ds(n=64, d=30)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(ds, m=8)
    with pytest.raises(ValueError, match="nbits"):
        pq_train(ds, m=5, nbits=9)
    books = pq_train(ds, m=5, nbits=4)
    with pytest.raises(ValueError, match="query dim"):
        pq_search(pq_encode(ds, books), books, np.zeros(31), k=3)


def test_ivfpq_build_search_refine(ray_session, tmp_path):
    from presto_bloomfilter_ray.functions import IVFPQIndex

    ds, mat = _emb_ds(n=900, clusters=6)
    root = str(tmp_path / "ivfpq")
    idx = IVFPQIndex(root, ncentroids=6, m=8, nbits=8).build(ds)
    q = mat[42]
    exact = topk_cosine(ds, q, k=10)
    exact_ids = set(exact["vec_id"].astype(int))
    # ADC-only: shortlist of 60 probing half the buckets captures the
    # true neighborhood (residual codes resolve intra-cluster structure
    # far better than flat PQ)
    adc = idx.search(q, k=60, nprobe=3)
    assert len(adc) == 60
    assert len(set(adc["vec_id"].astype(int)) & exact_ids) >= 8
    # refined with a full-corpus rerank budget: exact top-k
    got = idx.search(q, k=10, nprobe=6, refine_ds=ds, rerank=900)
    assert got["vec_id"].tolist() == exact["vec_id"].tolist()


def test_ivfpq_persisted_reload(ray_session, tmp_path):
    from presto_bloomfilter_ray.functions import IVFPQIndex

    ds, mat = _emb_ds(n=300, clusters=3)
    root = str(tmp_path / "ivfpq2")
    IVFPQIndex(root, ncentroids=3, m=4, nbits=6).build(ds)
    # fresh object: loads centroids + codebooks from disk
    idx2 = IVFPQIndex(root, ncentroids=3, m=4, nbits=6)
    r = idx2.search(mat[5], k=5, nprobe=3)
    assert len(r) == 5 and "adc_score" in r.columns
    with pytest.raises(ValueError, match="query dim"):
        idx2.search(np.zeros(31), k=5)


def test_search_many_matches_per_query(ray_session):
    ds, mat = _emb_ds(n=700, clusters=5)
    books = pq_train(ds, m=8, nbits=6)
    codes = pq_encode(ds, books).materialize()
    from presto_bloomfilter_ray.functions import pq_search_many

    qs = mat[[3, 50, 200]]
    many = pq_search_many(codes, books, qs, k=12)
    assert len(many) == 3 * 12
    for qi in range(3):
        solo = pq_search(codes, books, qs[qi], k=12)
        sub = many[many["query_idx"] == qi]
        assert sub["vec_id"].tolist() == solo["vec_id"].tolist(), qi
        assert np.allclose(sub["adc_score"].to_numpy(),
                           solo["adc_score"].to_numpy(), atol=1e-5)
    with pytest.raises(ValueError, match="query dim"):
        pq_search_many(codes, books, np.zeros((2, 31)), k=3)
    with pytest.raises(ValueError, match="\\(Q, d\\)"):
        pq_search_many(codes, books, np.zeros(32), k=3)
