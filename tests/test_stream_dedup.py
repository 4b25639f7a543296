"""stream_dedup_window: windowed at-least-once dedup vs brute force."""

import numpy as np
import pyarrow as pa
import pytest


def brute_force(rows, g):
    """Exact reference semantics (suppression): keep an event iff NO
    earlier event (by (ts, id)) — kept or suppressed — shares its key
    within the last g day-epochs."""
    kept = []
    seen = []  # (epoch, key) of EVERY event
    for ts, eid, key in sorted(rows):
        e = ts // 86_400_000_000
        if not any(k == key and e - g < pe <= e for pe, k in seen):
            kept.append(eid)
        seen.append((e, key))
    return sorted(kept)


def _mk_rows():
    rng = np.random.default_rng(42)
    day = 86_400_000_000
    rows = []
    eid = 0
    for d in range(20):
        for _ in range(rng.integers(20, 60)):
            key = f"u{rng.integers(0, 25)}"
            ts = d * day + int(rng.integers(0, day))
            rows.append((ts, eid, key))
            eid += 1
    return rows


def test_matches_brute_force(ray_session):
    import ray

    from presto_bloomfilter_ray.pipelines import stream_dedup_window

    rows = _mk_rows()
    tbl = pa.table({
        "ts": pa.array([r[0] for r in rows], type=pa.timestamp("us")),
        "event_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "key": pa.array([r[2] for r in rows]),
    })
    ds = ray.data.from_arrow(tbl)
    for g in (3, 7):
        kept, stats = stream_dedup_window(
            ds, "key", "ts", "event_id", generations=g, n_buckets=4,
            batch_size=97)  # odd batch size: slices straddle epochs
        assert kept.tolist() == brute_force(rows, g)
        # bounded state: no actor retains more than g epochs
        assert all(len(s["epochs"]) <= g for s in stats)


def test_window_expiry_rekeeps_key(ray_session):
    import ray

    from presto_bloomfilter_ray.pipelines import stream_dedup_window

    day = 86_400_000_000
    # same key on days 0, 1, 9: day-1 is a dup (window 3), day-9 re-kept
    tbl = pa.table({
        "ts": pa.array([0, day, 9 * day], type=pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3], type=pa.int64()),
        "key": pa.array(["k", "k", "k"]),
    })
    kept, _ = stream_dedup_window(ray.data.from_arrow(tbl), "key", "ts",
                                  "event_id", generations=3, n_buckets=2)
    assert kept.tolist() == [1, 3]


def test_composite_key(ray_session):
    import ray

    from presto_bloomfilter_ray.pipelines import stream_dedup_window

    tbl = pa.table({
        "ts": pa.array([0, 1, 2, 3], type=pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "a": pa.array(["x", "x", "x", "y"]),
        "b": pa.array(["1", "2", "1", "1"]),
    })
    kept, _ = stream_dedup_window(ray.data.from_arrow(tbl), ["a", "b"],
                                  "ts", "event_id", generations=2,
                                  n_buckets=2)
    assert kept.tolist() == [1, 2, 4]  # (x,1) repeat dropped
