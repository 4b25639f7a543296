"""Persisted BM25 index (functions/search_index.py): bit-exact parity
with direct bm25_search, shard pruning, underscore boundary semantics,
empty-hit queries."""

import os
import shutil
import uuid

import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import (
    bm25_index_build,
    bm25_index_search,
    bm25_search,
)


@pytest.fixture()
def index_root():
    root = f"/tmp/bm25-test-{uuid.uuid4().hex[:8]}"
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_parity_with_direct_search(ray_session, sf_dir, index_root):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    bm25_index_build(docs, index_root, n_shards=8)
    for q in ["table filter", "spark window merge sort", "zzz-notaword"]:
        if q == "zzz-notaword":
            via_idx = bm25_index_search(index_root, ["zzznotaword"], top_k=5)
            direct = bm25_search(docs, ["zzznotaword"], top_k=5)
        else:
            via_idx = bm25_index_search(index_root, q, top_k=5)
            direct = bm25_search(docs, q, top_k=5)
        pd.testing.assert_frame_equal(direct, via_idx)


def test_search_reads_only_query_shards(ray_session, index_root):
    import ray.data as rd

    t = pa.table({"doc_id": list(range(8)),
                  "text": ["alpha beta", "alpha", "beta gamma", "delta",
                           "alpha delta", "gamma", "beta", "alpha beta"]})
    bm25_index_build(rd.from_arrow(t), index_root, n_shards=4)
    # remove every shard EXCEPT the ones 'alpha' hashes to: a pruned
    # search must not touch them
    from presto_bloomfilter_ray.functions.search_index import _term_shard

    keep = {int(_term_shard(["alpha"], 4)[0])}
    for d in os.listdir(os.path.join(index_root, "postings")):
        if int(d.split("=")[1]) not in keep:
            shutil.rmtree(os.path.join(index_root, "postings", d))
    out = bm25_index_search(index_root, ["alpha"], top_k=8)
    assert len(out) == 4  # docs 0, 1, 4, 7


def test_underscore_is_a_word_char(ray_session, index_root):
    import ray.data as rd

    # \b semantics: 'foo' must NOT match inside 'foo_bar'
    t = pa.table({"doc_id": [0, 1], "text": ["foo_bar baz", "foo baz"]})
    docs = rd.from_arrow(t)
    bm25_index_build(docs, index_root, n_shards=2)
    via_idx = bm25_index_search(index_root, ["foo"], top_k=5)
    direct = bm25_search(docs, ["foo"], top_k=5)
    pd.testing.assert_frame_equal(direct, via_idx)
    assert via_idx["doc_id"].tolist() == [1]


def test_unwritten_shard_means_zero_postings(ray_session, index_root):
    import ray.data as rd

    # tiny vocabulary: most of the 16 shards are never written; query
    # terms hashing to them must score as absent (df=0), not crash
    t = pa.table({"doc_id": [0, 1], "text": ["hash join", "hash"]})
    docs = rd.from_arrow(t)
    bm25_index_build(docs, index_root, n_shards=16)
    for q in ["filter merge sort window", "hash zzz"]:
        via_idx = bm25_index_search(index_root, q, top_k=5)
        direct = bm25_search(docs, q, top_k=5)
        pd.testing.assert_frame_equal(direct, via_idx)


def test_non_alnum_sequence_term_rejected(ray_session, sf_dir, index_root):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    bm25_index_build(docs, index_root, n_shards=4)
    with pytest.raises(ValueError, match="a-z0-9_"):
        bm25_index_search(index_root, ["foo-bar"])


def test_join_scale_path_matches_broadcast(ray_session, sf_dir, index_root):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    bm25_index_build(docs, index_root, n_shards=4)
    fast = bm25_index_search(index_root, "table filter", top_k=5)
    joined = bm25_index_search(index_root, "table filter", top_k=5,
                               dl_broadcast_limit=0, num_partitions=2)
    pd.testing.assert_frame_equal(fast, joined)


def test_meta_written_atomically(ray_session, sf_dir, index_root):
    import json

    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    bm25_index_build(docs, index_root, n_shards=4)
    meta = json.load(open(os.path.join(index_root, "meta.json")))
    assert meta["n_docs"] == docs.count()
    assert meta["n_shards"] == 4 and meta["sum_dl"] > 0
