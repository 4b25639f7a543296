"""Sequence-packing invariants: budget, conservation, splitting,
determinism across input partitioning, NFD utilization bound."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import pack_sequences, pack_stats

WORDS = ["tok"]


def _corpus(rng, n_docs, max_len):
    lens = rng.integers(0, max_len, size=n_docs)
    return pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array([" ".join(["tok"] * int(k)) for k in lens]),
    }), lens


def test_pack_invariants_and_determinism(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    budget = 64
    t, lens = _corpus(rng, 300, 50)  # all docs fit the budget
    n_parts = 8

    def run(parts):
        ds = rd.from_arrow(t).repartition(parts)
        a = pack_sequences(ds, budget=budget, n_parts=n_parts).to_pandas()
        return a.sort_values(["pack_id", "doc_id", "chunk_idx"]).reset_index(
            drop=True)

    a = run(2)
    # conservation: every non-empty doc appears exactly once with its count
    nz = {i: int(k) for i, k in enumerate(lens) if k > 0}
    assert dict(zip(a["doc_id"], a["n_tok"])) == nz
    assert (a["chunk_idx"] == 0).all()
    # budget invariant per pack
    per_pack = a.groupby("pack_id")["n_tok"].sum()
    assert (per_pack <= budget).all()
    # NFD bound: n_packs <= 2*total/budget + n_parts
    total = sum(nz.values())
    assert len(per_pack) <= 2 * total / budget + n_parts
    assert len(per_pack) >= -(-total // budget)
    # identical plan regardless of input partitioning
    b = run(7)
    assert a.equals(b)


def test_pack_splits_long_docs(ray_session):
    import ray.data as rd

    budget = 10
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([" ".join(["w"] * 25),   # 3 pieces: 10,10,5
                          " ".join(["w"] * 10),   # exactly budget: 1 piece
                          ""]),                   # empty: dropped
    })
    a = pack_sequences(rd.from_arrow(t), budget=budget, n_parts=4).to_pandas()
    d1 = a[a["doc_id"] == 1].sort_values("chunk_idx")
    assert d1["chunk_idx"].tolist() == [0, 1, 2]
    assert d1["n_tok"].tolist() == [10, 10, 5]
    d2 = a[a["doc_id"] == 2]
    assert d2["chunk_idx"].tolist() == [0] and d2["n_tok"].tolist() == [10]
    assert 3 not in set(a["doc_id"])
    assert (a.groupby("pack_id")["n_tok"].sum() <= budget).all()


def test_pack_stats_matches_direct(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    budget = 32
    t, _ = _corpus(rng, 120, 90)  # some docs exceed the budget -> split
    plan = pack_sequences(rd.from_arrow(t), budget=budget, n_parts=4)
    df = plan.to_pandas()
    s = pack_stats(plan, budget=budget)
    per_pack = df.groupby("pack_id")["n_tok"].sum()
    assert s["n_packs"] == len(per_pack)
    assert s["total_tokens"] == int(df["n_tok"].sum())
    assert s["max_pack_tokens"] == int(per_pack.max()) <= budget
    assert s["n_pieces"] == len(df)


def test_pack_rejects_bad_budget(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["a b c"])})
    with pytest.raises(ValueError):
        pack_sequences(rd.from_arrow(t), budget=0)
