"""AgePartitionedBloom: window semantics, expiry, merge algebra."""

import pyarrow as pa
import pytest

from presto_bloomfilter_ray.sketches import AgePartitionedBloom, deserialize
from presto_bloomfilter_ray.sketches.apbf import KIND_APBF


def keys(prefix, ids):
    return pa.array([f"{prefix}-{i}" for i in ids])


def test_window_membership_and_structural_expiry():
    f = AgePartitionedBloom(generations=3, per_gen_insertions=1000,
                            fpp=1e-6)
    f.update_at(0, keys("a", range(100)))
    f.update_at(1, keys("b", range(100)))
    f.update_at(2, keys("c", range(100)))
    # window (current=2, g=3) covers epochs 0..2: everything present
    for p in ("a", "b", "c"):
        assert f.contains_many(keys(p, range(100))).all()
    # advance to 3: epoch 0 falls out AND its bits are dropped
    f.advance()
    assert 0 not in f.stages
    assert not f.contains_many(keys("a", range(100))).any()  # expired
    assert f.contains_many(keys("b", range(100))).all()      # still in
    # advance far: everything expires, memory returns to zero
    f.advance(to_epoch=10)
    assert f.stages == {} and f.estimated_size_bytes() == 0


def test_single_pass_epoch_routing_equals_streaming():
    routed = AgePartitionedBloom(4, 500, 1e-4)
    for e in (2, 0, 1):  # out-of-order arrival, as batches would be
        routed.update_at(e, keys(f"e{e}", range(50)))
    stream = AgePartitionedBloom(4, 500, 1e-4)
    for e in (0, 1, 2):
        stream.advance(to_epoch=e)
        stream.update_arrow(keys(f"e{e}", range(50)))
    assert routed.serialize() == stream.serialize()


def test_merge_associative_commutative_no_trim():
    def part(epoch, pref):
        f = AgePartitionedBloom(3, 500, 1e-4)
        f.update_at(epoch, keys(pref, range(40)))
        return f

    ab_c = part(0, "x").merge(part(5, "y")).merge(part(4, "z"))
    bc = part(5, "y").merge(part(4, "z"))
    a_bc = part(0, "x").merge(bc)
    assert ab_c.serialize() == a_bc.serialize()
    ba = part(5, "y").merge(part(0, "x")).merge(part(4, "z"))
    assert ab_c.serialize() == ba.serialize()
    # merge kept the out-of-window epoch 0 (no trim), probe ignores it
    assert 0 in ab_c.stages
    assert not ab_c.contains_many(keys("x", range(40))).any()
    # finalize-style advance trims it away
    ab_c.advance(to_epoch=5)
    assert 0 not in ab_c.stages


def test_envelope_roundtrip_via_registry():
    f = AgePartitionedBloom(2, 300, 1e-3, _current=7)
    f.update_at(6, keys("r", range(30)))
    f.update_at(7, keys("s", range(30)))
    blob = f.serialize()
    back = deserialize(blob)
    assert isinstance(back, AgePartitionedBloom)
    assert back.KIND == KIND_APBF
    assert back.current == 7 and sorted(back.stages) == [6, 7]
    assert back.serialize() == blob
    assert back.contains_many(keys("s", range(30))).all()


def test_incompatible_and_bad_params_raise():
    with pytest.raises(ValueError):
        AgePartitionedBloom(0)
    a = AgePartitionedBloom(3, 100, 1e-3)
    with pytest.raises(ValueError):
        a.merge(AgePartitionedBloom(4, 100, 1e-3))


def test_null_probe_false_and_fpp_bound():
    f = AgePartitionedBloom(4, 1000, 1e-3)
    f.update_at(0, keys("w", range(1000)))
    assert not f.might_contain(None)
    got = f.contains_many(keys("zz", range(50_000)))
    assert got.sum() / 50_000 <= f.window_fpp_bound() + 4 * (
        1e-3 / 50_000) ** 0.5
