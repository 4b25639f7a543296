"""ScalableBloomFilter: growth, compound FPP bound, merge algebra."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.sketches import ScalableBloomFilter, deserialize
from presto_bloomfilter_ray.sketches.scalable import KIND_SCALABLE


def keys(prefix, n, start=0):
    return pa.array([f"{prefix}-{i}" for i in range(start, start + n)])


def test_growth_no_false_negatives_and_fpp_bound():
    sbf = ScalableBloomFilter(256, 0.02)
    n = 256 * 20  # 20x the initial capacity
    sbf.update_arrow(keys("k", n))
    assert sbf.n_stages >= 4  # geometric growth actually happened
    assert sbf.contains_many(keys("k", n)).all()  # no false negatives
    probes = 50_000
    fp = sbf.contains_many(keys("zz", probes)).sum() / probes
    # sequential ingestion: compound bound sum(p0 r^i) <= P, plus
    # binomial measurement slack
    assert fp <= 0.02 + 4 * (0.02 * 0.98 / probes) ** 0.5
    # achieved estimate from bit densities agrees with the measurement
    est = sbf.get_false_positive_percentage()
    assert fp <= est + 4 * (max(est, 1e-4) / probes) ** 0.5 + 0.005


def test_fill_respects_stage_capacity_sequentially():
    sbf = ScalableBloomFilter(100, 0.05)
    sbf.update_arrow(keys("a", 350))
    assert sbf.fills == [100, 200, 50]
    assert [s.n for s in sbf.stages] == [100, 200, 400]
    # stage errors tighten geometrically
    assert sbf.stages[1].p == pytest.approx(sbf.stages[0].p * 0.5)


def test_merge_associative_commutative_bit_identical():
    def build(lo, n):
        s = ScalableBloomFilter(128, 0.01)
        s.update_arrow(keys("m", n, start=lo))
        return s

    a, b, c = build(0, 300), build(300, 500), build(800, 150)
    ab_c = build(0, 300).merge(build(300, 500)).merge(build(800, 150))
    a_bc = build(300, 500).merge(build(800, 150))
    a_bc = build(0, 300).merge(a_bc)
    assert ab_c.serialize() == a_bc.serialize()
    ba = build(300, 500).merge(build(0, 300)).merge(build(800, 150))
    assert ab_c.serialize() == ba.serialize()
    # merged filter sees every input of every operand
    assert ab_c.contains_many(keys("m", 950)).all()
    assert ab_c.fills[0] == 128 * 3  # same-index fills added


def test_merge_overfull_stage_then_insert_grows_past_it():
    a = ScalableBloomFilter(64, 0.01)
    a.update_arrow(keys("x", 64))
    b = ScalableBloomFilter(64, 0.01)
    b.update_arrow(keys("y", 64))
    a.merge(b)
    assert a.fills == [128]  # stage 0 overfull after the merge
    a.update_arrow(keys("z", 10))  # must NOT land in the full stage
    assert a.n_stages == 2 and a.fills == [128, 10]
    assert a.contains_many(keys("x", 64)).all()
    assert a.contains_many(keys("y", 64)).all()
    assert a.contains_many(keys("z", 10)).all()


def test_envelope_roundtrip_via_registry():
    sbf = ScalableBloomFilter(100, 0.03, growth=4, tightening=0.7)
    sbf.update_arrow(keys("r", 777))
    blob = sbf.serialize()
    back = deserialize(blob)
    assert isinstance(back, ScalableBloomFilter)
    assert back.KIND == KIND_SCALABLE
    assert (back.n0, back.p, back.s, back.r) == (100, 0.03, 4, 0.7)
    assert back.fills == sbf.fills
    assert back.serialize() == blob
    assert back.contains_many(keys("r", 777)).all()


def test_null_empty_skip_and_null_probe_false():
    sbf = ScalableBloomFilter(64, 0.01)
    sbf.update_arrow(pa.array(["a", None, "", "b"]))
    assert sbf.fills == [2]  # null and empty skipped, reference parity
    got = sbf.contains_many(pa.array(["a", None, "b"]))
    assert got.tolist() == [True, False, True]
    assert not sbf.might_contain(None)


def test_incompatible_params_raise():
    a = ScalableBloomFilter(64, 0.01)
    b = ScalableBloomFilter(65, 0.01)
    with pytest.raises(ValueError):
        a.merge(b)
    with pytest.raises(ValueError):
        ScalableBloomFilter(64, 0.01, growth=1)
    with pytest.raises(ValueError):
        ScalableBloomFilter(64, 0.01, tightening=1.0)


def test_empty_filter_probe_and_estimate():
    sbf = ScalableBloomFilter()
    assert not sbf.contains_many(keys("q", 5)).any()
    assert sbf.get_false_positive_percentage() == 0.0
    assert sbf.estimated_size_bytes() == 0
