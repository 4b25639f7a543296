"""DSIR importance-resampling contracts: serial-reference exactness,
target affinity, partitioning invariance, vocab cap, edge cases."""

import math

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import dsir_logratios, dsir_select

TARGET = ["physics quantum energy field", "quantum field theory energy"]
RAW = [
    (0, "quantum energy field physics notes"),   # target-like
    (1, "buy cheap pills online now deal"),      # spam
    (2, "energy quantum discussion field"),      # target-like
    (3, "random words about cooking pasta"),
    (4, "click here free offer deal deal"),
    (5, ""),                                     # empty → weight 0
]


def _tables():
    raw = pa.table({"doc_id": pa.array([i for i, _ in RAW], pa.int64()),
                    "text": pa.array([t for _, t in RAW], pa.string())})
    tgt = pa.table({"text": pa.array(TARGET, pa.string())})
    return raw, tgt


def _serial_keys(alpha=1.0):
    """Independent reference: dict math, same smoothing contract."""
    from collections import Counter

    rc = Counter()
    for _, t in RAW:
        rc.update(t.split())
    tc = Counter()
    for t in TARGET:
        tc.update(t.split())
    vocab = sorted(rc)
    V = len(vocab)
    t_tot = sum(tc[w] for w in vocab)
    r_tot = sum(rc.values())
    lr = {w: math.log((tc[w] + alpha) / (t_tot + alpha * V))
          - math.log((rc[w] + alpha) / (r_tot + alpha * V)) for w in vocab}
    keys = {}
    for i, t in RAW:
        w = sum(lr[x] for x in t.split() if x in lr)
        u = (((i * 2654435761) % (1 << 32)) + 0.5) / (1 << 32)
        keys[i] = round(w - math.log(-math.log(u)), 6)
    return keys


def _select(ray, k, parts=1, **kw):
    import ray.data as rd

    raw_t, tgt_t = _tables()
    raw = rd.from_arrow(raw_t).repartition(parts)
    tgt = rd.from_arrow(tgt_t)
    return dsir_select(raw, tgt, k, "text", "doc_id", **kw).to_pandas()


def test_matches_serial_reference(ray_session):
    keys = _serial_keys()
    got = _select(ray_session, k=3)
    want = sorted(keys, key=lambda i: (-keys[i], i))[:3]
    assert list(got["doc_id"]) == want
    np.testing.assert_allclose(got["dsir_key"].to_numpy(),
                               [keys[i] for i in want])


def test_target_affinity(ray_session):
    # with the Gumbel noise stripped (compare raw log-ratios), the
    # target-like docs must outscore spam
    raw_t, tgt_t = _tables()
    import ray.data as rd

    vocab, lr = dsir_logratios(rd.from_arrow(raw_t), rd.from_arrow(tgt_t))
    lut = dict(zip(vocab, lr))
    w = [sum(lut.get(x, 0.0) for x in t.split()) for _, t in RAW]
    assert min(w[0], w[2]) > max(w[1], w[3], w[4])


def test_partitioning_invariance(ray_session):
    a = _select(ray_session, k=4, parts=1)
    b = _select(ray_session, k=4, parts=3)
    assert list(a["doc_id"]) == list(b["doc_id"])
    np.testing.assert_array_equal(a["dsir_key"], b["dsir_key"])


def test_k_covers_all(ray_session):
    got = _select(ray_session, k=100)
    assert len(got) == len(RAW)
    keys = _serial_keys()
    assert list(got["doc_id"]) == sorted(keys, key=lambda i: (-keys[i], i))


def test_max_vocab_cap(ray_session):
    # cap to the 2 most frequent raw terms (deal×3, energy/field/quantum×3?)
    got_full = _select(ray_session, k=6)
    got_cap = _select(ray_session, k=6, max_vocab=2)
    # still returns a full valid ranking, generally different from full
    assert len(got_cap) == len(RAW)
    assert set(got_cap["doc_id"]) == set(got_full["doc_id"])


def test_empty_raw_raises(ray_session):
    import ray.data as rd

    raw = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                  "text": pa.array([" "], pa.string())}))
    _, tgt = _tables()
    with pytest.raises(ValueError):
        dsir_select(raw, rd.from_arrow(tgt), 1)
