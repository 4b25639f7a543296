"""IBLT: insert/delete algebra, subtract+decode reconciliation, merge."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.sketches import IBLT, deserialize
from presto_bloomfilter_ray.sketches.iblt import KIND_IBLT


def keys(prefix, ids):
    return pa.array([f"{prefix}-{i}" for i in ids])


def fp_set(prefix, ids):
    return set(IBLT.fingerprints(keys(prefix, ids)).tolist())


def test_subtract_decode_recovers_symmetric_difference():
    shared = range(0, 5000)
    a = IBLT(2048).update_arrow(keys("k", list(shared) + [9001, 9002, 9003]))
    b = IBLT(2048).update_arrow(keys("k", list(shared) + [8001, 8002]))
    a.subtract(b)
    a_only, b_only, ok = a.decode()
    assert ok
    assert set(a_only.tolist()) == fp_set("k", [9001, 9002, 9003])
    assert set(b_only.tolist()) == fp_set("k", [8001, 8002])


def test_equal_sets_cancel_to_empty():
    a = IBLT(1024).update_arrow(keys("x", range(10_000)))
    b = IBLT(1024).update_arrow(keys("x", range(10_000)))
    a.subtract(b)
    assert (a.counts == 0).all() and (a.keysum == 0).all()
    a_only, b_only, ok = a.decode()
    assert ok and a_only.size == 0 and b_only.size == 0


def test_decode_failure_is_reported_not_silent():
    # diff of 3000 keys cannot decode from ~1024 cells (2-core threshold)
    a = IBLT(1024, k=3).update_arrow(keys("d", range(3000)))
    _, _, ok = a.decode()
    assert not ok


def test_merge_associative_commutative_and_distributed_shape():
    def part(lo, hi):
        return IBLT(512).update_arrow(keys("m", range(lo, hi)))

    ab_c = part(0, 100).merge(part(100, 250)).merge(part(250, 300))
    bc = part(100, 250).merge(part(250, 300))
    a_bc = part(0, 100).merge(bc)
    assert ab_c.serialize() == a_bc.serialize()
    ba = part(100, 250).merge(part(0, 100)).merge(part(250, 300))
    assert ab_c.serialize() == ba.serialize()
    # merged partials behave exactly like a single-pass build
    single = IBLT(512).update_arrow(keys("m", range(300)))
    assert ab_c.serialize() == single.serialize()


def test_insert_delete_inverse():
    t = IBLT(256)
    t.update_arrow(keys("q", range(50)))
    t.delete_arrow(keys("q", range(50)))
    assert (t.counts == 0).all() and (t.keysum == 0).all() \
        and (t.checksum == 0).all()


def test_envelope_roundtrip_via_registry():
    t = IBLT(300, k=4)
    t.update_arrow(keys("r", range(77)))
    blob = t.serialize()
    back = deserialize(blob)
    assert isinstance(back, IBLT) and back.KIND == KIND_IBLT
    assert (back.m, back.k) == (t.m, t.k)
    assert back.serialize() == blob
    a_only, _, ok = back.subtract(IBLT(300, k=4)).decode()
    assert ok and set(a_only.tolist()) == fp_set("r", range(77))


def test_null_empty_skipped_and_incompatible_raise():
    t = IBLT(256)
    t.update_arrow(pa.array(["a", None, "", "b"]))
    a_only, _, ok = t.decode()
    assert ok and a_only.size == 2
    with pytest.raises(ValueError):
        IBLT(256, k=3).merge(IBLT(512, k=3))
    with pytest.raises(ValueError):
        IBLT(256, k=1)


def test_fingerprint_probe_maps_back_to_keys():
    ids = [3, 14, 159]
    t = IBLT(512).update_arrow(keys("p", ids))
    rec, _, ok = t.decode()
    assert ok
    col = keys("p", range(200))
    hit = np.isin(IBLT.fingerprints(col), rec)
    assert set(np.asarray(col)[hit].tolist()) == {f"p-{i}" for i in ids}


def test_dataset_diff_end_to_end(ray_session):
    import ray

    from presto_bloomfilter_ray.functions import DecodeError, dataset_diff

    a = ray.data.from_arrow(pa.table({
        "k": [f"u-{i}" for i in range(2000)],
        "v": list(range(2000))}))
    b = ray.data.from_arrow(pa.table({
        "k": [f"u-{i}" for i in range(100, 2100)],
        "v": list(range(100, 2100))}))
    only_a, only_b = dataset_diff(a, b, "k", cells=1024)
    ga = sorted(r["v"] for r in only_a.take_all())
    gb = sorted(r["v"] for r in only_b.take_all())
    assert ga == list(range(100))          # u-0..u-99 absent from b
    assert gb == list(range(2000, 2100))   # u-2000..u-2099 absent from a

    # loud failure when the diff exceeds the cell budget
    big = ray.data.from_arrow(pa.table({"k": [f"w-{i}" for i in range(5000)]}))
    empty = ray.data.from_arrow(pa.table({"k": pa.array([], type=pa.string())}))
    with pytest.raises(DecodeError):
        dataset_diff(big, empty, "k", cells=512)
