"""Counting Bloom filter: deletion algebra, merge associativity, bounds."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray import deserialize
from presto_bloomfilter_ray.sketches import BloomFilter, CountingBloomFilter


def _col(prefix, n, start=0):
    return pa.array([f"{prefix}{i}" for i in range(start, start + n)])


def test_same_positions_as_plain_bloom():
    # Same (n, p) → same (m, k) and the same KM positions, so a CBF sees
    # exactly the plain filter's FPP behavior.
    cbf = CountingBloomFilter(10_000, 0.01)
    bf = BloomFilter(10_000, 0.01, use_pre_filter=False)
    assert (cbf.m, cbf.k) == (bf.m, bf.k)
    cbf.update_arrow(_col("e", 5_000))
    bf.update_arrow(_col("e", 5_000))
    # every position with a nonzero counter is a set bit and vice versa
    nz = np.flatnonzero(cbf.counts > 0)
    words = (nz >> 6).astype(np.int64)
    bits_set = (bf.bits[words] >> np.uint64(nz & 63)) & np.uint64(1)
    assert bits_set.all()
    assert int(np.count_nonzero(cbf.counts)) == sum(
        int(bin(int(w)).count("1")) for w in bf.bits
    )


def test_insert_delete_roundtrip_counter_exact():
    # CBF(A∪B) − CBF(B) == CBF(A), counter-for-counter.
    a, b = _col("a", 2_000), _col("b", 1_500)
    base = CountingBloomFilter(10_000, 1e-6)
    base.update_arrow(a).update_arrow(b)
    only_a = CountingBloomFilter(10_000, 1e-6).update_arrow(a)
    dels = CountingBloomFilter(10_000, 1e-6).update_arrow(b)
    base.subtract(dels)
    assert np.array_equal(base.counts, only_a.counts)
    assert base.underflows == 0 and base.stuck == 0
    # remove_arrow is the single-filter form of the same deletion
    again = CountingBloomFilter(10_000, 1e-6)
    again.update_arrow(a).update_arrow(b).remove_arrow(b)
    assert np.array_equal(again.counts, only_a.counts)


def test_membership_after_delete():
    keep, drop = _col("k", 1_000), _col("d", 1_000)
    f = CountingBloomFilter(10_000, 1e-9)
    f.update_arrow(keep).update_arrow(drop).remove_arrow(drop)
    assert f.contains_many(keep).all()  # no false negatives, ever
    assert not f.contains_many(drop).any()  # exact at p=1e-9 test scale


def test_merge_associative_byte_identical():
    parts = [
        CountingBloomFilter(5_000, 0.01).update_arrow(_col("p", 700, i * 700))
        for i in range(4)
    ]

    def clone(s):
        return deserialize(s.serialize())

    left = clone(parts[0]).merge(clone(parts[1])).merge(clone(parts[2])).merge(clone(parts[3]))
    right = clone(parts[0]).merge(clone(parts[1]).merge(clone(parts[2]).merge(clone(parts[3]))))
    assert np.array_equal(left.counts, right.counts)
    assert left.serialize() == right.serialize()


def test_duplicate_inserts_are_multiset():
    f = CountingBloomFilter(1_000, 0.01)
    x = pa.array(["dup"] * 3)
    f.update_arrow(x)
    f.remove(None)  # null delete is a no-op
    f.remove("dup")
    f.remove("dup")
    assert f.might_contain("dup")  # one insertion left
    f.remove("dup")
    assert not f.might_contain("dup")
    assert f.underflows == 0


def test_underflow_clips_and_counts():
    f = CountingBloomFilter(1_000, 0.01)
    f.update_arrow(_col("x", 10))
    f.remove_arrow(pa.array(["never-inserted"]))
    assert f.underflows > 0
    assert (f.counts <= np.iinfo(np.uint16).max).all()
    assert f.contains_many(_col("x", 10)).all()  # members unaffected here


def test_saturation_sticky():
    f = CountingBloomFilter(100, 0.5)  # tiny m to force collisions fast
    one = pa.array(["hot"])
    for _ in range(70000 // 1000):
        f.update_arrow(pa.array(["hot"] * 1000))
    # counters for "hot" saturated at 65535 and stay there on delete
    assert f.might_contain("hot")
    f.remove_arrow(pa.array(["hot"] * 100))
    assert f.might_contain("hot")
    assert f.stuck > 0
    f.update_arrow(one)  # saturating add never wraps
    assert (f.counts <= np.iinfo(np.uint16).max).all()


def test_envelope_roundtrip_and_introspection():
    f = CountingBloomFilter(2_000, 0.001)
    f.update_arrow(_col("e", 500))
    g = deserialize(f.serialize())
    assert isinstance(g, CountingBloomFilter)
    assert np.array_equal(g.counts, f.counts)
    assert g.get_expected_insertions() == 2_000
    assert g.get_false_positive_percentage() == pytest.approx(0.001)
    assert 400 < g.approx_element_count() < 600


def test_fpp_within_bound():
    n = 20_000
    f = CountingBloomFilter(n, 0.01)
    f.update_arrow(_col("in", n))
    probes = _col("out", 50_000)
    fpp = f.contains_many(probes).mean()
    assert fpp <= 0.03  # ≤ 3× configured p, same tolerance as bloom tests


def test_nulls_and_empties_skipped():
    f = CountingBloomFilter(1_000, 0.01)
    f.update_arrow(pa.array(["a", None, "", "b"]))
    only_ab = CountingBloomFilter(1_000, 0.01).update_arrow(pa.array(["a", "b"]))
    assert np.array_equal(f.counts, only_ab.counts)
    mask = f.contains_many(pa.array(["a", None, "b"]))
    assert mask.tolist() == [True, False, True]
