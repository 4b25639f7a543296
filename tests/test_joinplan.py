"""Sketch-driven join planning: strategy selection from Theta
statistics, cross-strategy result equality, estimate sanity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import planned_join, sketch_join_plan


def _ds(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl)


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


def test_broadcast_chosen_for_small_side(ray_session):
    small = _ds(pa.table({"k": np.arange(50, dtype=np.int64),
                          "tag": np.arange(50, dtype=np.int64) % 3}))
    big = _ds(pa.table({"k2": (np.arange(4_000, dtype=np.int64) * 3) % 80,
                        "v": np.arange(4_000, dtype=np.int64)}))
    out, plan = planned_join(big, "k2", small, "k")
    assert plan["strategy"] == "broadcast"
    got = out.to_pandas()
    exp = pd.merge(big.to_pandas(), small.to_pandas(),
                   left_on="k2", right_on="k")[["k2", "v", "tag"]]
    assert _sorted(got[["k2", "v", "tag"]], ["v"]).equals(
        _sorted(exp, ["v"]))


def test_prefilter_chosen_for_low_overlap(ray_session):
    l = _ds(pa.table({"k": np.arange(0, 200_000, dtype=np.int64)}))
    r = _ds(pa.table({"k2": np.arange(196_000, 400_000, dtype=np.int64),
                      "v": np.arange(204_000, dtype=np.int64)}))
    plan = sketch_join_plan(l, "k", r, "k2", broadcast_limit=10_000)
    assert plan["strategy"] == "bloom_prefilter"
    assert plan["survival_left_est"] < 0.1
    out, _ = planned_join(l, "k", r, "k2", broadcast_limit=10_000,
                          num_partitions=8, plan=plan)
    assert out.count() == 4_000


def test_shuffle_chosen_for_high_overlap(ray_session):
    l = _ds(pa.table({"k": np.arange(150_000, dtype=np.int64)}))
    r = _ds(pa.table({"k2": np.arange(150_000, dtype=np.int64),
                      "v": np.arange(150_000, dtype=np.int64)}))
    plan = sketch_join_plan(l, "k", r, "k2", broadcast_limit=10_000)
    assert plan["strategy"] == "shuffle"
    assert plan["survival_left_est"] > 0.9
    out, _ = planned_join(l, "k", r, "k2", broadcast_limit=10_000,
                          num_partitions=8, plan=plan)
    assert out.count() == 150_000


def test_all_strategies_agree(ray_session):
    # force each strategy on the same inputs via the plan override;
    # rows must be identical
    l = _ds(pa.table({"k": (np.arange(3_000, dtype=np.int64) * 11) % 5_000,
                      "lv": np.arange(3_000, dtype=np.int64)}))
    r = _ds(pa.table({"k2": (np.arange(2_000, dtype=np.int64) * 7) % 5_000,
                      "rv": np.arange(2_000, dtype=np.int64)}))
    results = {}
    base = sketch_join_plan(l, "k", r, "k2")
    for strat in ["broadcast", "bloom_prefilter", "shuffle"]:
        plan = dict(base, strategy=strat)
        out, _ = planned_join(l, "k", r, "k2", num_partitions=4,
                              plan=plan)
        df = out.to_pandas()
        results[strat] = _sorted(df[["lv", "rv"]], ["lv", "rv"])
    assert results["broadcast"].equals(results["bloom_prefilter"])
    assert results["broadcast"].equals(results["shuffle"])
    # sanity: the join is non-trivial
    assert len(results["broadcast"]) > 0


def test_theta_estimates_close_to_truth(ray_session):
    l = _ds(pa.table({"k": np.arange(100_000, dtype=np.int64)}))
    r = _ds(pa.table({"k2": np.arange(50_000, 150_000, dtype=np.int64)}))
    plan = sketch_join_plan(l, "k", r, "k2", broadcast_limit=1)
    # true: d_l = d_r = 100k, inter = 50k
    assert abs(plan["distinct_left_est"] - 100_000) < 10_000
    assert abs(plan["intersection_est"] - 50_000) < 10_000
    assert 0.35 < plan["survival_left_est"] < 0.65


def test_colliding_columns_suffixed_all_strategies(ray_session):
    # both sides carry a "payload" column; every strategy must
    # disambiguate with the same _r suffix instead of crashing
    l = _ds(pa.table({"k": np.arange(500, dtype=np.int64),
                      "payload": np.arange(500, dtype=np.int64)}))
    r = _ds(pa.table({"k2": np.arange(250, 750, dtype=np.int64),
                      "payload": np.arange(500, dtype=np.int64)}))
    base = sketch_join_plan(l, "k", r, "k2")
    for strat in ["broadcast", "bloom_prefilter", "shuffle"]:
        out, _ = planned_join(l, "k", r, "k2", num_partitions=2,
                              plan=dict(base, strategy=strat))
        df = out.to_pandas()
        assert len(df) == 250, strat
        assert {"payload", "payload_r"} <= set(df.columns), strat
