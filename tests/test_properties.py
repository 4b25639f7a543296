"""Hypothesis property tests — merge algebra + codec invariants hold for
arbitrary inputs/partitions, not just the fixture vectors (FIXTURES §3)."""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from presto_bloomfilter_ray import (
    KLL,
    BloomFilter,
    CountMin,
    HyperLogLog,
    TDigest,
    deserialize,
)

_SETTINGS = dict(max_examples=25, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

elements = st.lists(st.text(min_size=0, max_size=30), min_size=0, max_size=200)


@given(data=elements, cut=st.integers(0, 200))
@settings(**_SETTINGS)
def test_bloom_split_merge_equals_serial(data, cut):
    cut = min(cut, len(data))
    serial = BloomFilter(1000).update_arrow(pa.array(data, type=pa.string()))
    a = BloomFilter(1000).update_arrow(pa.array(data[:cut], type=pa.string()))
    b = BloomFilter(1000).update_arrow(pa.array(data[cut:], type=pa.string()))
    assert np.array_equal(a.merge(b).bits, serial.bits)


@given(data=elements)
@settings(**_SETTINGS)
def test_bloom_no_false_negatives(data):
    bf = BloomFilter(1000).update_arrow(pa.array(data, type=pa.string()))
    for el in data:
        if el:  # empty elements are skipped by design
            assert bf.might_contain(el)


@given(data=elements, cut=st.integers(0, 200))
@settings(**_SETTINGS)
def test_hll_merge_commutes(data, cut):
    cut = min(cut, len(data))
    a1 = HyperLogLog(10).update_arrow(pa.array(data[:cut], type=pa.string()))
    b1 = HyperLogLog(10).update_arrow(pa.array(data[cut:], type=pa.string()))
    a2 = HyperLogLog(10).update_arrow(pa.array(data[:cut], type=pa.string()))
    b2 = HyperLogLog(10).update_arrow(pa.array(data[cut:], type=pa.string()))
    ab = a1.merge(b1)
    ba = b2.merge(a2)
    assert np.array_equal(ab.regs, ba.regs)


@given(data=elements)
@settings(**_SETTINGS)
def test_envelope_roundtrip_arbitrary_content(data):
    for factory in (lambda: BloomFilter(500), lambda: HyperLogLog(8),
                    lambda: CountMin(1e-2, 1e-2)):
        sk = factory().update_arrow(pa.array(data, type=pa.string()))
        buf = sk.serialize()
        assert deserialize(buf).serialize() == buf


@given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                               allow_nan=False), min_size=1, max_size=500),
       cut=st.integers(0, 500))
@settings(**_SETTINGS)
def test_quantile_sketches_bounded_by_minmax(vals, cut):
    cut = min(cut, len(vals))
    arr = np.array(vals)
    for factory in (lambda: TDigest(100), lambda: KLL(128)):
        a = factory().update_arrow(arr[:cut])
        b = factory().update_arrow(arr[cut:])
        m = a.merge(b)
        for q in (0.0, 0.25, 0.5, 0.75, 1.0):
            est = m.quantile(q)
            assert arr.min() <= est <= arr.max()


@given(texts=st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=20),
       pick=st.integers(0, 19))
@settings(**_SETTINGS)
def test_minhash_signature_batch_independent(texts, pick):
    """A doc's MinHash signature must not depend on which other docs
    share its batch (regression: sentinel windows crossing doc
    boundaries once leaked neighbor bytes into signatures)."""
    from presto_bloomfilter_ray.functions.dedup import MinHasher

    mh = MinHasher(num_perm=16, bands=4)
    pick = min(pick, len(texts) - 1)
    together = mh.signatures(texts)
    alone = mh.signatures([texts[pick]])
    assert np.array_equal(together[pick], alone[0])
    # position independence holds at every slot (first/middle/last)
    as_last = mh.signatures([*texts[:pick], texts[pick]])
    sandwiched = mh.signatures([texts[pick], "zz padding doc zz", texts[pick]])
    assert np.array_equal(as_last[-1], alone[0])
    assert np.array_equal(sandwiched[0], alone[0])
    assert np.array_equal(sandwiched[2], alone[0])


@given(vals=st.lists(st.floats(min_value=0, max_value=1e3, allow_nan=False),
                     min_size=50, max_size=400))
@settings(**_SETTINGS)
def test_kll_n_conserved_across_merge(vals):
    arr = np.array(vals)
    thirds = np.array_split(arr, 3)
    parts = [KLL(64).update_arrow(c) for c in thirds]
    m = parts[0].merge(parts[1]).merge(parts[2])
    assert m.n == len(arr)


def test_pandas_hash_fallback_consistent(monkeypatch):
    """The no-polars fallback (pandas hash_array) must be self-consistent:
    same input → same hashes, different seeds → different hashes, and
    sketches built on it still honor their contracts."""
    import pyarrow as pa

    from presto_bloomfilter_ray.sketches import hashing

    monkeypatch.setattr(hashing, "_HAS_POLARS", False)
    a1 = hashing.hash64(pa.array(["x", "y", "z"]), seed=1)
    a2 = hashing.hash64(pa.array(["x", "y", "z"]), seed=1)
    b = hashing.hash64(pa.array(["x", "y", "z"]), seed=2)
    assert np.array_equal(a1, a2)
    assert not np.array_equal(a1, b)
    bf = BloomFilter(1000)
    bf.update_arrow(pa.array(["alpha", "beta"]))
    assert bf.might_contain("alpha") and not bf.might_contain("gamma")


@given(n_a=st.integers(100, 2000), n_b=st.integers(100, 2000),
       overlap=st.integers(0, 100))
@settings(**_SETTINGS)
def test_theta_exact_below_saturation_any_sets(n_a, n_b, overlap):
    """KMV with k above saturation is EXACT set algebra for any inputs."""
    from presto_bloomfilter_ray import ThetaSketch

    overlap = min(overlap, n_a, n_b)
    a_items = [f"a{i}" for i in range(n_a)]
    b_items = [f"a{i}" for i in range(overlap)] + [f"b{i}" for i in range(n_b - overlap)]
    a = ThetaSketch(4096).update_arrow(pa.array(a_items))
    b = ThetaSketch(4096).update_arrow(pa.array(b_items))
    assert round(a.estimate()) == n_a
    assert round(b.estimate()) == n_b
    assert round(a.intersection_estimate(b)) == overlap
    assert round(a.union_estimate(b)) == n_a + n_b - overlap
    assert round(a.difference_estimate(b)) == n_a - overlap


_doc_texts = st.lists(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
            min_size=0, max_size=80),
    min_size=1, max_size=12)


@given(texts=_doc_texts)
@settings(**_SETTINGS)
def test_repetition_signals_match_bruteforce(texts):
    from collections import Counter

    from presto_bloomfilter_ray.functions.text import repetition_signals

    out = repetition_signals(pa.table({"text": texts}))
    for i, t in enumerate(texts):
        lines = t.split("\n")
        c = Counter(lines)
        assert out.column("n_lines")[i].as_py() == len(lines)
        assert out.column("n_dup_lines")[i].as_py() == sum(
            v - 1 for v in c.values())
        assert out.column("dup_line_chars")[i].as_py() == sum(
            (v - 1) * len(k) for k, v in c.items())
        assert out.column("line_chars")[i].as_py() == sum(
            len(x) for x in lines)


@given(texts=_doc_texts, n=st.integers(1, 6), cut=st.integers(0, 12))
@settings(**_SETTINGS)
def test_token_ngrams_count_and_batch_independence(texts, n, cut):
    import re

    from presto_bloomfilter_ray.functions.decontaminate import (
        explode_token_ngrams,
    )

    whole = explode_token_ngrams(pa.table({"text": texts}), n=n)
    # per-doc gram count: max(tokens - n + 1, 1 if any tokens)
    expect = 0
    for t in texts:
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        expect += max(len(toks) - n + 1, 1) if toks else 0
    assert whole.num_rows == expect
    # splitting the batch anywhere yields the same gram multiset
    cut = min(cut, len(texts))
    a = explode_token_ngrams(pa.table({"text": texts[:cut]}), n=n)
    b = explode_token_ngrams(pa.table({"text": texts[cut:]}), n=n)
    assert sorted(a.column("gram").to_pylist()
                  + b.column("gram").to_pylist()) == \
        sorted(whole.column("gram").to_pylist())


@given(texts=_doc_texts)
@settings(**_SETTINGS)
def test_redact_pii_idempotent(texts):
    from presto_bloomfilter_ray.functions.text import redact_pii

    once = redact_pii(pa.table({"text": texts}))
    twice = redact_pii(pa.table({"text": once.column("text")}))
    assert once.column("text").to_pylist() == twice.column("text").to_pylist()
    # second pass finds nothing: the tags contain no matchable spans
    for c in ("n_email", "n_phone", "n_ipv4"):
        assert sum(twice.column(c).to_pylist()) == 0
