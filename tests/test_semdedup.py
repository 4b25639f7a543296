"""SemDeDup contracts: planted duplicates detected keep-first,
precision subset, partitioning invariance, sharded tag path."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import semdedup

RNG = np.random.default_rng(11)


def _embeddings(n_base=40, dims=16, dup_of=(3, 7, 7)):
    """n_base random unit vectors + exact duplicates appended (ids
    n_base, n_base+1, ...) of the given base ids."""
    base = RNG.normal(size=(n_base, dims)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = np.concatenate([base, base[list(dup_of)]])
    ids = np.arange(len(vecs), dtype=np.int64)
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })


def _run(ray, table, parts=1, **kw):
    import ray.data as rd

    ds = rd.from_arrow(table).repartition(parts)
    kw.setdefault("threshold", 0.999)
    kw.setdefault("ncentroids", 4)
    kw.setdefault("sample_fraction", 1.0)
    out = semdedup(ds, **kw).to_pandas().sort_values("vec_id")
    return out


def test_planted_duplicates_dropped_keep_first(ray_session):
    t = _embeddings(dup_of=(3, 7, 7))
    out = _run(ray_session, t)
    dropped = set(out.loc[out["is_semdup"], "vec_id"].astype(int))
    # copies of 3 and 7 (ids 40, 41, 42) are dropped; originals kept.
    # ids 41/42 duplicate each other AND 7 — smallest id (7) survives.
    assert dropped == {40, 41, 42}
    assert not out.loc[out["vec_id"].isin([3, 7]), "is_semdup"].any()


def test_no_duplicates_all_kept(ray_session):
    t = _embeddings(dup_of=())
    out = _run(ray_session, t)
    assert not out["is_semdup"].any()
    assert len(out) == 40


def test_partitioning_invariance(ray_session):
    t = _embeddings()
    a = _run(ray_session, t, parts=1)
    b = _run(ray_session, t, parts=3)
    assert list(a["is_semdup"]) == list(b["is_semdup"])


def test_sharded_tag_path_matches_broadcast(ray_session, tmp_path):
    t = _embeddings()
    a = _run(ray_session, t)
    b = _run(ray_session, t, broadcast_limit=0, work_dir=str(tmp_path))
    assert list(a["is_semdup"]) == list(b["is_semdup"])


def test_output_preserves_rows_and_columns(ray_session):
    t = _embeddings()
    out = _run(ray_session, t)
    assert len(out) == t.num_rows
    assert {"vec_id", "embedding", "is_semdup"} <= set(out.columns)
