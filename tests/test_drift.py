"""Categorical drift: exact TV arithmetic, alignment, edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import categorical_drift


def _ds(keys, cats):
    import ray.data as rd

    return rd.from_arrow(pa.table({"k": pa.array(keys),
                                   "c": pa.array(cats)}))


def test_identical_distributions_zero_drift(ray_session):
    keys = ["x"] * 100 + ["y"] * 50
    cats = (["a", "b"] * 50) + (["a"] * 25 + ["b"] * 25)
    out = categorical_drift(_ds(keys, cats), _ds(keys, cats), "k", "c")
    assert out["tv_ppm"].tolist() == [0, 0]
    assert out["n_a"].tolist() == out["n_b"].tolist() == [100, 50]


def test_exact_tv_value(ray_session):
    # key x: A = 75% a / 25% b, B = 25% a / 75% b -> TV = 0.5 exactly
    a = _ds(["x"] * 100, ["a"] * 75 + ["b"] * 25)
    b = _ds(["x"] * 100, ["a"] * 25 + ["b"] * 75)
    out = categorical_drift(a, b, "k", "c")
    assert out["tv_ppm"].tolist() == [500_000]


def test_disjoint_categories_full_drift(ray_session):
    a = _ds(["x"] * 10, ["a"] * 10)
    b = _ds(["x"] * 7, ["b"] * 7)
    out = categorical_drift(a, b, "k", "c")
    assert out["tv_ppm"].tolist() == [1_000_000]


def test_single_sided_key_is_total_drift(ray_session):
    a = _ds(["x"] * 5 + ["only_a"] * 3, ["a"] * 8)
    b = _ds(["x"] * 5, ["a"] * 5)
    out = categorical_drift(a, b, "k", "c").set_index("k")
    assert out.loc["only_a", "tv_ppm"] == 1_000_000
    assert out.loc["only_a", "n_b"] == 0
    assert out.loc["x", "tv_ppm"] == 0


def test_matches_brute_force_random(ray_session):
    rng = np.random.default_rng(31)
    ka = rng.choice(["p", "q", "r"], 5_000)
    ca = rng.choice(list("abcde"), 5_000,
                    p=[0.4, 0.3, 0.15, 0.1, 0.05])
    kb = rng.choice(["p", "q", "r"], 4_000)
    cb = rng.choice(list("abcde"), 4_000,
                    p=[0.2, 0.2, 0.2, 0.2, 0.2])
    out = categorical_drift(_ds(ka, ca), _ds(kb, cb), "k", "c") \
        .set_index("k")
    for key in ["p", "q", "r"]:
        pa_ = pd.Series(ca[ka == key]).value_counts()
        pb_ = pd.Series(cb[kb == key]).value_counts()
        na, nb = int(pa_.sum()), int(pb_.sum())
        cats = sorted(set(pa_.index) | set(pb_.index))
        num = sum(abs(int(pa_.get(c, 0)) * nb - int(pb_.get(c, 0)) * na)
                  for c in cats)
        assert out.loc[key, "tv_ppm"] == (num * 1_000_000) // (2 * na * nb)


def test_max_cells_guard(ray_session):
    ka = [f"k{i}" for i in range(50)]
    with pytest.raises(ValueError, match="max_cells"):
        categorical_drift(_ds(ka, ka), _ds(ka, ka), "k", "c",
                          max_cells=10)
