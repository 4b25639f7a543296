"""Reference behavioral parity tests (FIXTURES.md §2; Java sources in
/root/reference/src/test/java/com/facebook/presto/bloomfilter/)."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray import (
    BloomFilter,
    deserialize,
    from_base64,
    read_hash,
    read_params,
)
from presto_bloomfilter_ray.engine import (
    get_expected_insertions,
    get_false_positive_percentage,
    to_base64,
)


def test_basic_membership():
    # TestBloomFilter.java:37-44
    bf = BloomFilter(100)
    bf.put("robin")
    assert bf.might_contain("robin")
    assert not bf.might_contain("verlangen")


def test_merge_propagates_membership():
    # TestBloomFilter.java:46-60
    a = BloomFilter(100)
    a.put("robin")
    b = BloomFilter(100)
    b.put("verlangen")
    a.merge(b)
    assert a.might_contain("robin") and a.might_contain("verlangen")


def test_merge_with_empty_preserves_semantics():
    # TestBloomFilterAggregation.java:50-88 — both argument orders,
    # custom n=100; empty side stays a definite negative for absent keys
    for first_empty in (True, False):
        full = BloomFilter(100)
        full.put("robin")
        empty = BloomFilter(100)
        merged = empty.merge(full) if first_empty else full.merge(empty)
        assert merged.might_contain("robin")
        assert not merged.might_contain("verlangen")


def test_null_and_empty_elements_skipped():
    # BloomFilter.java:159-167; TestBloomFilterQueries.java:53-56
    bf = BloomFilter(100)
    bf.put(None)
    bf.put("")
    bf.update_arrow(pa.array([None, "", None]))
    assert bf.bits.sum() == 0  # nothing inserted
    assert not bf.might_contain("anything")
    # NULL probe → False (BloomFilterContainsScalarFunction.java:38-40)
    assert not bf.might_contain(None)


def test_two_independent_filters_dont_cross_contaminate():
    # TestBloomFilterQueries.java:76-77
    a = BloomFilter(100)
    a.put("a")
    b = BloomFilter(100)
    b.put("b")
    assert a.might_contain("a") and not a.might_contain("b")
    assert b.might_contain("b") and not b.might_contain("a")


def test_multi_row_build():
    # TestBloomFilterQueries.java:79-83
    for n in (10, 10_000):
        bf = BloomFilter(n)
        bf.update_arrow(pa.array(["a", "b", "c", "d"]))
        assert all(bf.might_contain(x) for x in "abcd")
        assert not bf.might_contain("not-in-the-list")


def test_param_introspection():
    # TestBloomFilterQueries.java:64-74
    assert get_expected_insertions(BloomFilter(10).serialize()) == 10
    assert get_false_positive_percentage(BloomFilter(10, 0.1234).serialize()) == 0.1234


def test_serialize_roundtrip():
    # TestBloomFilterSerialization.java:28-50
    bf = BloomFilter(100)
    bf.put("robin")
    r = deserialize(bf.serialize())
    assert r.might_contain("robin")
    assert not r.might_contain("not-in-here")


def test_base64_roundtrip():
    # TestBloomFilterQueries.java:93-94 (to_string → from_string)
    bf = BloomFilter(10)
    bf.put("x")
    rt = from_base64(to_base64(bf))
    assert rt.might_contain("x") and not rt.might_contain("y")


#: pinned golden content hash of serialize(bloom_filter('', 10)) — OUR
#: envelope's analog of the reference's golden base64 string
#: (TestBloomFilterQueries.java:91). Any change to the envelope layout,
#: params encoding, bitset dtype or hash seeds breaks this on purpose.
GOLDEN_EMPTY_N10_SHA256 = (
    "e9b1a77feb0a1fa973cae4394be7e596a14bc95670dc005fdb33d35150a2a2fa"
)


def test_deterministic_envelope_and_golden():
    # TestBloomFilter.java:62-78: two empty same-param filters serialize
    # to the same content hash; pin OUR golden hash for bloom('', 10)
    h1 = read_hash(BloomFilter(10).serialize())
    h2 = read_hash(BloomFilter(10).serialize())
    assert h1 == h2
    golden = BloomFilter(10)
    golden.put("")  # no-op insert, parity with to_string(bloom_filter('', 10))
    assert read_hash(golden.serialize()) == h1  # empty insert didn't change it
    assert h1.hex() == GOLDEN_EMPTY_N10_SHA256


def test_size_formula_goldens():
    # TestBloomFilter.java:80-94 — exact reference goldens
    assert BloomFilter(10_000_000, 0.01).estimated_size_bytes() == 11_981_323
    assert BloomFilter(100, 0.01).estimated_size_bytes() == 120
    assert BloomFilter(100, 0.001).estimated_size_bytes() == 180


def test_statistical_fpp_within_bound_across_p():
    # TestBloomFilterPerformanceContains.java:36-43 — disjoint probes;
    # hold FPP ≤ p (+sampling slack) across configured p values
    keys = pa.array([f"k{i}" for i in range(50_000)])
    probes = pa.array([f"p{i}" for i in range(50_000)])
    for p, slack in ((0.001, 3.0), (0.01, 1.5), (0.05, 1.2)):
        bf = BloomFilter(50_000, p).update_arrow(keys)
        res = bf.contains_many(probes)
        assert res.mean() <= p * slack, (p, res.mean())
        assert bf.contains_many(keys).all()  # never a false negative


def test_statistical_fpp_within_bound():
    # TestBloomFilterPerformanceContains.java:36-43 — disjoint probes
    keys = pa.array([f"k{i}" for i in range(100_000)])
    probes = pa.array([f"p{i}" for i in range(100_000)])
    bf = BloomFilter(100_000, 0.01).update_arrow(keys)
    res = bf.contains_many(probes)
    assert res.mean() <= 0.012  # p + slack
    # no false negatives, ever
    assert bf.contains_many(keys).all()
    # pre-filter observability: rejections counted, not serialized
    assert bf.pre_miss > 0
    assert "pre_miss" not in read_params(bf.serialize())


def test_mixed_put_then_contains():
    # TestBloomFilterPerformancePutThenContains.java:40-70
    members = [f"uuid-{i}" for i in range(50_000)]
    outsiders = [f"out-{i}" for i in range(50_000)]
    bf = BloomFilter(100_000).update_arrow(pa.array(members))
    mixed = pa.array(members[:25_000] + outsiders[:25_000])
    res = bf.contains_many(mixed)
    assert res[:25_000].all()  # all members match
    assert bf.pre_miss >= 0.1 * len(mixed)  # pre-filter did real work


def test_merge_incompatible_shapes_raises():
    with pytest.raises(ValueError):
        BloomFilter(100).merge(BloomFilter(200))


def test_non_string_elements_cast():
    bf = BloomFilter(1000)
    bf.update_arrow(pa.array([1, 2, 3], type=pa.int64()))
    assert bf.might_contain("1") and bf.might_contain("2")
    assert not bf.might_contain("4")


def test_merge_associativity_bitwise_identical():
    # FIXTURES §3: random partitions → identical bitsets
    rng = np.random.default_rng(7)
    data = [f"item-{i}" for i in range(10_000)]
    serial = BloomFilter(10_000).update_arrow(pa.array(data))
    for trial in range(3):
        cuts = sorted(rng.choice(range(1, len(data)), size=5, replace=False))
        parts = np.split(np.array(data, dtype=object), cuts)
        order = rng.permutation(len(parts))
        acc = None
        for idx in order:
            sk = BloomFilter(10_000).update_arrow(pa.array(list(parts[idx])))
            acc = sk if acc is None else acc.merge(sk)
        assert np.array_equal(acc.bits, serial.bits)
        assert np.array_equal(acc.pre_bits, serial.pre_bits)
