"""PrioritySample: merge associativity, estimator, determinism, envelope."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.sketches import deserialize
from presto_bloomfilter_ray.sketches.priority import PrioritySample


def _items(n=2_000, seed=3):
    rng = np.random.default_rng(seed)
    keys = [f"item{i}" for i in range(n)]
    # heavy-tailed weights — the regime priority sampling exists for
    w = np.round(rng.pareto(1.5, size=n) + 0.01, 6)
    return keys, w


def test_merge_tree_byte_identical():
    keys, w = _items()
    parts = []
    for i in range(4):
        sk = PrioritySample(k=64)
        sk.update_pairs(pa.array(keys[i::4]), pa.array(w[i::4]))
        parts.append(sk)

    def clone(s):
        return deserialize(s.serialize())

    whole = PrioritySample(k=64).update_pairs(pa.array(keys), pa.array(w))
    left = clone(parts[0]).merge(clone(parts[1])).merge(clone(parts[2])).merge(clone(parts[3]))
    right = clone(parts[3]).merge(clone(parts[2]).merge(clone(parts[1]).merge(clone(parts[0]))))
    # same leaves → byte-identical regardless of tree shape
    assert left.serialize() == right.serialize()
    # vs the single-pass build: identical sample/threshold state; wsum
    # only up to float-addition order (documented)
    assert left.sample() == whole.sample()
    assert np.array_equal(left.hashes, whole.hashes)
    assert np.array_equal(left.weights, whole.weights)
    assert left.total_weight() == pytest.approx(w.sum(), rel=1e-12)


def test_subset_estimator_unbiased_ballpark():
    keys, w = _items(n=5_000)
    sk = PrioritySample(k=1024).update_pairs(pa.array(keys), pa.array(w))
    # subset: items whose index is even (≈ half the weight)
    truth = sum(float(wi) for ki, wi in zip(keys, w) if int(ki[4:]) % 2 == 0)
    est = sk.estimate_subset(lambda v: int(v[4:]) % 2 == 0)
    assert abs(est - truth) / truth < 0.15  # deterministic given seeds


def test_full_set_estimator_exact_when_under_k():
    keys, w = _items(n=50)
    sk = PrioritySample(k=100).update_pairs(pa.array(keys), pa.array(w))
    assert sk.threshold() == 0.0
    # fewer items than k: every item kept with its TRUE weight
    assert sk.estimate_subset(lambda v: True) == pytest.approx(w.sum(), rel=1e-12)


def test_weight_biased_inclusion():
    # one item carries ~all the weight: it must always be in the sample
    keys = [f"x{i}" for i in range(1_000)] + ["whale"]
    w = np.concatenate([np.full(1_000, 0.001), [1_000.0]])
    sk = PrioritySample(k=16).update_pairs(pa.array(keys), pa.array(w))
    assert "whale" in sk.sample()


def test_nulls_and_nonpositive_skipped():
    sk = PrioritySample(k=8)
    sk.update_pairs(pa.array(["a", None, "b", "c", "d"]),
                    pa.array([1.0, 5.0, None, 0.0, -3.0]))
    assert sk.n_rows == 1  # only ("a", 1.0) is valid
    assert sk.sample() == ["a"]


def test_duplicate_same_weight_collapses():
    sk = PrioritySample(k=8)
    sk.update_pairs(pa.array(["a", "a", "b"]), pa.array([2.0, 2.0, 1.0]))
    assert sorted(sk.sample()) == ["a", "b"]
    assert sk.weight_conflicts == 0
    sk.update_pairs(pa.array(["a"]), pa.array([9.0]))  # conflicting weight
    assert sk.weight_conflicts == 1


def test_struct_column_surface():
    struct = pa.StructArray.from_arrays(
        [pa.array(["a", "b"]), pa.array([1.0, 2.0])], names=["item", "weight"])
    sk = PrioritySample(k=4).update_arrow(struct)
    assert sorted(sk.sample()) == ["a", "b"]
    with pytest.raises(TypeError, match="struct"):
        PrioritySample(k=4).update_arrow(pa.array(["plain"]))


def test_envelope_roundtrip():
    keys, w = _items(n=300)
    sk = PrioritySample(k=32).update_pairs(pa.array(keys), pa.array(w))
    rt = deserialize(sk.serialize())
    assert isinstance(rt, PrioritySample)
    assert rt.serialize() == sk.serialize()
    assert rt.sample() == sk.sample()
    assert rt.total_weight() == sk.total_weight()
    assert rt.threshold() == sk.threshold()
