"""BottomKSample — mergeable deterministic uniform sample contracts."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray import BottomKSample, deserialize


def _items(lo, hi):
    return pa.array([f"doc-{i:06d}" for i in range(lo, hi)])


def test_merge_equals_serial_any_tree():
    """Partition the stream arbitrarily: every merge tree must produce
    the IDENTICAL sample (associativity + determinism)."""
    rng = np.random.default_rng(3)
    serial = BottomKSample(20).update_arrow(_items(0, 5000))
    parts = [BottomKSample(20).update_arrow(_items(lo, lo + 500))
             for lo in range(0, 5000, 500)]
    rng.shuffle(parts)
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.merge(p)
    assert acc.sample() == serial.sample()
    assert len(acc.sample()) == 20


def test_sample_is_subset_and_duplicates_collapse():
    s = BottomKSample(10)
    s.update_arrow(pa.array(["a", "b", "a", "b", "a"]))
    assert sorted(s.sample()) == ["a", "b"]  # distinct items only
    s.update_arrow(_items(0, 100))
    assert set(s.sample()) <= {f"doc-{i:06d}" for i in range(100)} | {"a", "b"}
    assert len(s.sample()) == 10


def test_duplicate_heavy_batch_keeps_all_distinct():
    """Regression (round-2 advice): a batch of few distinct values
    repeated many times must keep every distinct item, not just the
    lowest-hash ones — the old pre-trim-then-dedupe dropped them."""
    vals = pa.array([f"v{i}" for i in range(8)] * 512)  # 4096 rows, 8 distinct
    s = BottomKSample(100).update_arrow(vals)
    assert sorted(s.sample()) == sorted(f"v{i}" for i in range(8))
    # and the result is identical to feeding the distinct set directly
    d = BottomKSample(100).update_arrow(pa.array([f"v{i}" for i in range(8)]))
    assert s.sample() == d.sample()


def test_duplicate_heavy_partitioning_invariance():
    """Sample must be a pure function of the distinct item SET,
    regardless of duplicate multiplicity or batch composition."""
    base = [f"doc-{i:04d}" for i in range(300)]
    serial = BottomKSample(50).update_arrow(pa.array(base))
    # same distinct set, but delivered as skewed duplicate-heavy batches
    heavy = BottomKSample(50)
    heavy.update_arrow(pa.array(base[:4] * 2000))        # > 2k rows, 4 distinct
    heavy.update_arrow(pa.array(base * 7))               # everything, x7
    heavy.update_arrow(pa.array(base[250:] * 100))
    assert heavy.sample() == serial.sample()


def test_envelope_roundtrip_and_unicode():
    s = BottomKSample(5)
    s.update_arrow(pa.array(["汉字", "café", "plain", "", None, "x"]))
    rt = deserialize(s.serialize())
    assert rt.sample() == s.sample()
    assert "汉字" in set(rt.sample()) or len(rt.sample()) <= 5


def test_incompatible_k_raises():
    with pytest.raises(ValueError):
        BottomKSample(5).merge(BottomKSample(6))
    with pytest.raises(ValueError):
        BottomKSample(0)


def test_distributed_equals_local(ray_session):
    """build_sketch over a Dataset must equal the single-process sample."""
    import ray.data as rd

    from presto_bloomfilter_ray.engine import build_sketch

    ds = rd.from_arrow(pa.table({"v": [f"doc-{i:06d}" for i in range(3000)]})).repartition(9)
    dist = build_sketch(ds, "v", lambda: BottomKSample(25))
    local = BottomKSample(25).update_arrow(_items(0, 3000))
    assert dist.sample() == local.sample()
