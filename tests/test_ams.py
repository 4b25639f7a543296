"""AMS/count-sketch F₂: exactness of merge, estimate bound, envelope."""

import numpy as np
import pyarrow as pa

from presto_bloomfilter_ray.sketches.ams import AMSSketch
from presto_bloomfilter_ray.sketches import deserialize


def _multiset():
    # key i appears i times, i = 1..60 → F2 = Σ i² known exactly
    vals = [f"k{i}" for i in range(1, 61) for _ in range(i)]
    f2 = sum(i * i for i in range(1, 61))
    return pa.array(vals), f2


def test_estimate_within_bound():
    col, f2 = _multiset()
    sk = AMSSketch(width=512, depth=5).update_arrow(col)
    rel = abs(sk.estimate_f2() - f2) / f2
    assert rel <= 3 * sk.relative_error_bound()


def test_merge_exact_and_tree_invariant():
    col, f2 = _multiset()
    vals = col.to_pylist()
    parts = [AMSSketch(256, 5).update_arrow(pa.array(vals[i::4])) for i in range(4)]

    def clone(s):
        return deserialize(s.serialize())

    whole = AMSSketch(256, 5).update_arrow(col)
    left = clone(parts[0]).merge(clone(parts[1])).merge(clone(parts[2])).merge(clone(parts[3]))
    right = clone(parts[3]).merge(clone(parts[2]).merge(clone(parts[1]).merge(clone(parts[0]))))
    # counter addition is exact: any tree equals the single-pass sketch
    assert np.array_equal(left.counters, whole.counters)
    assert np.array_equal(right.counters, whole.counters)
    assert left.serialize() == right.serialize() == whole.serialize()


def test_nulls_skipped_and_empty():
    a = AMSSketch(64, 3)
    a.update_arrow(pa.array([None, None], type=pa.string()))
    assert (a.counters == 0).all()
    assert a.estimate_f2() == 0.0
    a.put(None)
    assert (a.counters == 0).all()


def test_envelope_roundtrip():
    col, _ = _multiset()
    sk = AMSSketch(128, 7).update_arrow(col)
    rt = deserialize(sk.serialize())
    assert isinstance(rt, AMSSketch)
    assert (rt.width, rt.depth) == (128, 7)
    assert np.array_equal(rt.counters, sk.counters)
    assert rt.serialize() == sk.serialize()


def test_incompatible_shapes_raise():
    import pytest

    with pytest.raises(ValueError):
        AMSSketch(64, 3).merge(AMSSketch(64, 4))
    with pytest.raises(TypeError):
        AMSSketch(64, 3).merge(object())


def test_f2_scaling_sanity():
    # doubling every frequency quadruples F2
    col, f2 = _multiset()
    once = AMSSketch(512, 5).update_arrow(col)
    twice = AMSSketch(512, 5).update_arrow(col).update_arrow(col)
    assert abs(twice.estimate_f2() / max(once.estimate_f2(), 1e-9) - 4.0) < 0.8
