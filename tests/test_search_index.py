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


def test_append_matches_full_rebuild(ray_session, sf_dir, index_root):
    """build(half A) + append(half B) scores BIT-IDENTICALLY to
    build(A ∪ B): postings chunks from different generations never
    share a doc, and N/Σdl accumulate exactly."""
    import ray.data as rd

    from presto_bloomfilter_ray.functions import bm25_index_append

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    import pyarrow.compute as pc

    def half(rem):
        return lambda b: b.filter(
            pc.equal(pc.bit_wise_and(b.column("doc_id"), 1), rem))

    first = docs.map_batches(half(0), batch_format="pyarrow")
    second = docs.map_batches(half(1), batch_format="pyarrow")
    bm25_index_build(first, index_root, n_shards=8)
    meta = bm25_index_append(second, index_root)
    assert meta["gen"] == 2 and meta["n_docs"] == docs.count()

    full_root = f"{index_root}-full"
    bm25_index_build(docs, full_root, n_shards=8)
    try:
        for q in ["table filter", "spark window merge"]:
            inc = bm25_index_search(index_root, q, top_k=5)
            full = bm25_index_search(full_root, q, top_k=5)
            pd.testing.assert_frame_equal(inc, full)
    finally:
        shutil.rmtree(full_root, ignore_errors=True)


def test_crashed_append_invisible_and_repairable(ray_session, index_root):
    """Chunks from a generation NEWER than the meta (a crashed append)
    must not affect search; repair removes them; a retried append then
    lands cleanly."""
    import ray.data as rd

    from presto_bloomfilter_ray.functions import (
        bm25_index_append,
        bm25_index_repair,
    )

    t1 = pa.table({"doc_id": [0, 1], "text": ["alpha beta", "alpha"]})
    t2 = pa.table({"doc_id": [2, 3], "text": ["alpha gamma", "beta"]})
    bm25_index_build(rd.from_arrow(t1), index_root, n_shards=4)
    before = bm25_index_search(index_root, ["alpha"], top_k=8)

    # simulate a crashed append: ingest gen-2 chunks WITHOUT the meta bump
    from presto_bloomfilter_ray.functions.search_index import _ingest

    _ingest(rd.from_arrow(t2), index_root, 4, 2, "text", "doc_id")
    mid = bm25_index_search(index_root, ["alpha"], top_k=8)
    pd.testing.assert_frame_equal(before, mid)  # debris invisible

    removed = bm25_index_repair(index_root)
    assert removed and all("chunk-g0002" in p for p in removed)
    meta = bm25_index_append(rd.from_arrow(t2), index_root)
    assert meta["n_docs"] == 4
    after = bm25_index_search(index_root, ["alpha"], top_k=8)
    assert after["doc_id"].tolist() != before["doc_id"].tolist()
    assert set(after["doc_id"]) == {0, 1, 2}


def test_build_refuses_existing_index(ray_session, index_root):
    import ray.data as rd

    t = pa.table({"doc_id": [0], "text": ["alpha"]})
    bm25_index_build(rd.from_arrow(t), index_root, n_shards=2)
    with pytest.raises(FileExistsError, match="append"):
        bm25_index_build(rd.from_arrow(t), index_root, n_shards=2)


def test_meta_written_atomically(ray_session, sf_dir, index_root):
    import json

    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    bm25_index_build(docs, index_root, n_shards=4)
    meta = json.load(open(os.path.join(index_root, "meta.json")))
    assert meta["n_docs"] == docs.count()
    assert meta["n_shards"] == 4 and meta["sum_dl"] > 0
