"""Containment detection: quote-in-document semantics, MOD-sampling
tier, hot-gram cap loudness, join-tier equality, guards."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import containment_pairs
from presto_bloomfilter_ray.functions.containment import _expand_pairs


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows))


def _quote_corpus():
    art = " ".join(f"art{i}" for i in range(30))
    return _ds([
        {"doc_id": 0, "text": art},
        {"doc_id": 1, "text": " ".join(f"pad{i}" for i in range(60))
                              + " " + art + " "
                              + " ".join(f"tl{i}" for i in range(30))},
        {"doc_id": 2, "text": " ".join(f"zz{i}" for i in range(40))},
        {"doc_id": 3, "text": art.upper()},
    ])


def test_quote_found_where_jaccard_fails(ray_session):
    pairs, stats = containment_pairs(_quote_corpus(), k=5, tau=0.8)
    df = pairs.to_pandas().set_index(["a", "b"])
    assert stats["capped_grams"] == 0
    # the quoted article: containment 1.0, Jaccard would be ~0.22
    assert df.loc[(0, 1), "cont_ppm"] == 1_000_000
    jacc = df.loc[(0, 1), "inter"] / (df.loc[(0, 1), "size_a"]
                                      + df.loc[(0, 1), "size_b"]
                                      - df.loc[(0, 1), "inter"])
    assert jacc < 0.3
    # exact dup (case/normalization)
    assert df.loc[(0, 3), "cont_ppm"] == 1_000_000
    # unrelated doc appears in no pair
    assert 2 not in set(df.index.get_level_values(0)) | \
        set(df.index.get_level_values(1))


def test_tau_filters(ray_session):
    art15 = " ".join(f"art{i}" for i in range(15))
    ds = _ds([
        {"doc_id": 0, "text": " ".join(f"art{i}" for i in range(30))},
        {"doc_id": 4, "text": art15 + " "
                              + " ".join(f"qq{i}" for i in range(15))},
    ])
    hi, _ = containment_pairs(ds, k=5, tau=0.8)
    assert hi.count() == 0  # half overlap < 0.8
    lo, _ = containment_pairs(ds, k=5, tau=0.3)
    df = lo.to_pandas()
    assert len(df) == 1 and df["cont_ppm"].iloc[0] < 800_000


def test_expand_pairs_vectorization():
    # 3 grams: sizes 3, 1, 2 -> 3 + 0 + 1 pairs
    gh = np.array([1, 1, 1, 2, 3, 3], dtype=np.uint64)
    doc = np.array([10, 20, 30, 5, 7, 9], dtype=np.int64)
    a, b, nc, cr = _expand_pairs(gh, doc, cap=10)
    got = sorted(zip(a.tolist(), b.tolist()))
    assert got == [(7, 9), (10, 20), (10, 30), (20, 30)]
    assert nc == 0 and cr == 0
    # cap drops the hot gram loudly
    a, b, nc, cr = _expand_pairs(gh, doc, cap=2)
    assert sorted(zip(a.tolist(), b.tolist())) == [(7, 9)]
    assert nc == 1 and cr == 3


def test_hot_gram_cap_reported(ray_session):
    # 30 docs all sharing one boilerplate shingle
    boiler = "one two three four five"
    rows = [{"doc_id": i,
             "text": boiler + " " + " ".join(f"u{i}x{j}" for j in range(10))}
            for i in range(30)]
    pairs, stats = containment_pairs(_ds(rows), k=5, tau=0.05,
                                     hot_gram_cap=8)
    assert stats["capped_grams"] >= 1
    assert stats["capped_rows"] >= 30


def test_mod_sampling_consistent_and_close(ray_session):
    rng = np.random.default_rng(11)
    # 60 docs; doc 2i+1 contains doc 2i plus padding
    rows = []
    for i in range(30):
        core = " ".join(f"c{i}w{rng.integers(0, 10_000)}"
                        for _ in range(120))
        rows.append({"doc_id": 2 * i, "text": core})
        pad = " ".join(f"p{i}w{j}" for j in range(240))
        rows.append({"doc_id": 2 * i + 1, "text": pad + " " + core})
    ds = _ds(rows)
    exact, _ = containment_pairs(ds, k=5, tau=0.7)
    est, stats = containment_pairs(ds, k=5, tau=0.7, sample_mod=4)
    assert stats["sample_mod"] == 4
    e = exact.to_pandas().set_index(["a", "b"])
    s = est.to_pandas().set_index(["a", "b"])
    # every true containment pair must survive sampling at these sizes
    true_pairs = {(2 * i, 2 * i + 1) for i in range(30)}
    assert true_pairs <= set(e.index)
    assert true_pairs <= set(s.index)
    # sampled containment stays close to exact (consistent sampling)
    for p in true_pairs:
        assert abs(s.loc[p, "cont_ppm"] - e.loc[p, "cont_ppm"]) < 250_000
    # and the sampled gram volume really shrank
    assert s["size_a"].sum() < 0.6 * e["size_a"].sum()


def test_join_tier_matches_broadcast_tier(ray_session):
    ds = _quote_corpus()
    bc, _ = containment_pairs(ds, k=5, tau=0.8)
    jn, _ = containment_pairs(ds, k=5, tau=0.8, broadcast_limit=0,
                              num_partitions=2)
    b = bc.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    j = jn.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert b[["a", "b", "inter", "cont_ppm"]].equals(
        j[["a", "b", "inter", "cont_ppm"]])


def test_id_and_param_guards(ray_session):
    ds = _ds([{"doc_id": 1 << 40, "text": "a b c d e f g"},
              {"doc_id": (1 << 40) + 1, "text": "a b c d e f g"}])
    with pytest.raises(Exception, match="2\\^31"):
        pairs, _ = containment_pairs(ds, k=3, tau=0.5)
        pairs.count()
    with pytest.raises(ValueError, match="tau"):
        containment_pairs(_quote_corpus(), tau=0.0)
    with pytest.raises(ValueError, match="sample_mod"):
        containment_pairs(_quote_corpus(), sample_mod=0)
