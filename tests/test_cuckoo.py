"""Cuckoo filter: membership, deletion, walk termination, merge invariance."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray import deserialize
from presto_bloomfilter_ray.sketches import CuckooFilter


def _col(prefix, n, start=0):
    return pa.array([f"{prefix}{i}" for i in range(start, start + n)])


def test_no_false_negatives_and_fpp_bound():
    cf = CuckooFilter(60_000, fp_bits=16)
    keys = _col("k", 50_000)
    cf.update_arrow(keys)
    assert cf.contains_many(keys).all()
    # empirical FPP within 3x of the published 2b/2^f bound
    fpp = cf.contains_many(_col("z", 200_000)).mean()
    assert fpp <= 3 * cf.get_false_positive_percentage()


def test_fills_to_published_load():
    # n keys into an n-sized filter must succeed (sizing already pads
    # to the 0.95 safe load for bucket_size=4, Fan et al. §5.1)
    cf = CuckooFilter(60_000, fp_bits=16)
    cf.update_arrow(_col("a", 60_000))
    assert cf.contains_many(_col("a", 60_000)).all()
    assert cf.load_factor() <= 0.96


def test_delete_exact_and_counted():
    cf = CuckooFilter(30_000, fp_bits=32)  # fp32: collisions ~0 at this n
    cf.update_arrow(_col("k", 20_000))
    cf.remove_arrow(_col("k", 10_000))
    assert cf.underflows == 0
    assert cf.approx_element_count() == 10_000
    # survivors keep the no-false-negative guarantee
    assert cf.contains_many(_col("k", 10_000, start=10_000)).all()
    # deleted keys are really gone (fp32 → no colliding fingerprints)
    assert not cf.contains_many(_col("k", 10_000)).any()
    # deleting absent keys is a counted contract violation, not corruption
    cf.remove_arrow(_col("absent", 100))
    assert cf.underflows == 100
    assert cf.contains_many(_col("k", 10_000, start=10_000)).all()


def test_duplicate_fingerprints_insert_and_delete():
    cf = CuckooFilter(1_000, fp_bits=16)
    cf.update_arrow(pa.array(["dup"] * 8))  # 2*bucket_size copies is legal
    assert cf.might_contain("dup")
    cf.remove_arrow(pa.array(["dup"] * 8))
    assert cf.underflows == 0
    assert not cf.might_contain("dup")
    assert cf.approx_element_count() == 0


def test_merge_tree_membership_invariant():
    parts = [_col("m", 10_000, start=j * 10_000) for j in range(4)]

    def build():
        out = []
        for p in parts:
            s = CuckooFilter(60_000, 16)
            s.update_arrow(p)
            out.append(s)
        return out

    s = build()
    left_deep = s[0].merge(s[1]).merge(s[2]).merge(s[3])
    s = build()
    balanced = s[0].merge(s[1]).merge(s[2].merge(s[3]))
    members = _col("m", 40_000)
    probe = _col("q", 100_000)
    assert left_deep.contains_many(members).all()
    assert balanced.contains_many(members).all()
    # membership (true + false positives alike) is merge-order-invariant
    assert (
        left_deep.contains_many(probe) == balanced.contains_many(probe)
    ).all()


def test_merge_shape_mismatch_and_type():
    a = CuckooFilter(1_000, 16)
    with pytest.raises(ValueError, match="identical shape"):
        a.merge(CuckooFilter(1_000_000, 16))
    with pytest.raises(TypeError):
        a.merge(object())


def test_over_capacity_is_loud():
    tiny = CuckooFilter(100, fp_bits=16)
    with pytest.raises(RuntimeError, match="over capacity"):
        tiny.update_arrow(_col("x", 100_000))


def test_envelope_roundtrip():
    cf = CuckooFilter(10_000, fp_bits=32)
    cf.update_arrow(_col("k", 8_000))
    cf.remove_arrow(_col("k", 1_000))
    back = deserialize(cf.serialize())
    assert isinstance(back, CuckooFilter)
    assert (back.nb, back.bucket_size, back.fp_bits) == (
        cf.nb, cf.bucket_size, cf.fp_bits
    )
    assert back.approx_element_count() == 7_000
    probe = _col("k", 10_000)
    assert (back.contains_many(probe) == cf.contains_many(probe)).all()


def test_null_and_empty_semantics():
    cf = CuckooFilter(1_000, 16)
    cf.update_arrow(pa.array(["a", None, "", "b"]))
    assert cf.approx_element_count() == 2  # null + empty skipped
    got = cf.contains_many(pa.array(["a", None, "b", "c"]))
    assert list(got) == [True, False, True, False]
    assert not cf.might_contain(None)


def test_int_columns_cast_like_reference():
    # non-string columns cast to canonical string form (build and probe
    # agree), same as every other sketch in the family
    cf = CuckooFilter(10_000, 32)
    cf.update_arrow(pa.array(np.arange(5_000)))
    assert cf.contains_many(pa.array(np.arange(5_000))).all()
    assert not cf.contains_many(pa.array(np.arange(5_000, 10_000))).any()


def test_space_advantage_over_counting_bloom():
    # the point of the sketch: deletion support at a fraction of CBF's
    # 16-bit-counter-per-position cost for the same element budget
    from presto_bloomfilter_ray.sketches import CountingBloomFilter

    n = 100_000
    cf = CuckooFilter(n, fp_bits=16)  # fpp ~1.2e-4
    cbf = CountingBloomFilter(n, 1.2e-4)
    assert cf.memory_bytes() < 0.2 * cbf.memory_bytes()
