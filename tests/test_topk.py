"""Misra–Gries TopK — published bound, mergeability, envelope."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray import TopK, deserialize


def _zipf_stream(n=20_000, vocab=500, seed=4):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n)
    return [f"w{min(int(r), vocab):04d}" for r in ranks]


def _exact(items):
    from collections import Counter

    return Counter(items)


def test_misra_gries_bound_holds():
    items = _zipf_stream()
    sk = TopK(50).update_arrow(pa.array(items))
    exact = _exact(items)
    n = len(items)
    assert sk.total == n
    bound = sk.error_bound()
    assert bound == n / 50
    for item, c in sk.top():
        f = exact[item]
        assert c <= f  # counters are lower bounds
        assert f - c <= bound
    # every item with true frequency > N/k is present
    for item, f in exact.items():
        if f > bound:
            assert item in dict(sk.top())


def test_merge_tree_keeps_bound():
    """Any merge tree over partitioned streams keeps the summed-N/k
    guarantee (Agarwal et al. 2012)."""
    items = _zipf_stream(n=30_000)
    rng = np.random.default_rng(9)
    parts = [items[i::7] for i in range(7)]
    sketches = [TopK(40).update_arrow(pa.array(p)) for p in parts]
    rng.shuffle(sketches)
    acc = sketches[0]
    for s in sketches[1:]:
        acc = acc.merge(s)
    exact = _exact(items)
    n = len(items)
    assert acc.total == n
    bound = n / 40
    for item, c in acc.top():
        assert c <= exact[item]
        assert exact[item] - c <= bound
    for item, f in exact.items():
        if f > bound:
            assert item in dict(acc.top())


def test_guaranteed_hitters_and_envelope():
    items = ["hot"] * 600 + [f"cold{i}" for i in range(400)]
    sk = TopK(20).update_arrow(pa.array(items))
    # 'hot' is 60% of the stream; counter alone must certify phi=0.3
    assert "hot" in sk.guaranteed_hitters(0.3)
    rt = deserialize(sk.serialize())
    assert rt.top() == sk.top()
    assert rt.total == sk.total and rt.k == sk.k
    assert rt.estimate("hot") == sk.estimate("hot") > 0


def test_duplicate_and_null_handling():
    sk = TopK(3)
    sk.update_arrow(pa.array(["x", None, "x", "", "y"]))
    # nulls skipped; empty string is a countable item (counting-sketch
    # convention here — only Bloom drops empties, per the reference)
    assert sk.total == 4
    assert dict(sk.top())["x"] == 2
    assert "" in dict(sk.top())


def test_incompatible_k_and_bad_k():
    with pytest.raises(ValueError):
        TopK(3).merge(TopK(4))
    with pytest.raises(ValueError):
        TopK(0)


def test_distributed_build_matches_bound(ray_session):
    import ray.data as rd

    from presto_bloomfilter_ray.engine import build_sketch

    items = _zipf_stream(n=15_000)
    ds = rd.from_arrow(pa.table({"w": items})).repartition(11)
    sk = build_sketch(ds, "w", lambda: TopK(60))
    exact = _exact(items)
    assert sk.total == len(items)
    bound = len(items) / 60
    for item, c in sk.top():
        assert c <= exact[item] and exact[item] - c <= bound
    for item, f in exact.items():
        if f > bound:
            assert item in dict(sk.top())


def test_topk_through_grouped_sketchagg(ray_session):
    """TopK composes with the native grouped-aggregation path: per-key
    heavy hitters via ds.groupby(k).aggregate(SketchAgg(TopK))."""
    import ray.data as rd

    from presto_bloomfilter_ray import deserialize
    from presto_bloomfilter_ray.engine import SketchAgg

    rows = []
    for lang, hot in [("en", "the"), ("de", "der")]:
        rows += [{"lang": lang, "word": hot}] * 50
        rows += [{"lang": lang, "word": f"{lang}-w{i}"} for i in range(30)]
    ds = rd.from_items(rows).repartition(6)
    out = ds.groupby("lang").aggregate(
        SketchAgg(lambda: TopK(10), on="word", alias_name="sk")).take_all()
    by_lang = {r["lang"]: deserialize(r["sk"]) for r in out}
    assert by_lang["en"].top(1)[0][0] == "the"
    assert by_lang["de"].top(1)[0][0] == "der"
    for lang, sk in by_lang.items():
        assert sk.total == 80
        assert sk.top(1)[0][1] >= 50 - sk.error_bound()
