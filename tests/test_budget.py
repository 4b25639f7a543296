"""Token-budget selection: exact prefix rule vs the SQL window-cumsum
oracle, narrowing forced through multiple rounds, edge budgets."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import (
    token_budget_cutoffs,
    token_budget_select,
)


def _corpus(n=40_000, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr", "zh"], n,
                           p=[0.7, 0.15, 0.1, 0.05]),
        "tl": rng.integers(1, 2_000, n).astype(np.int64),
    })


def _oracle(df, budget):
    return duckdb.sql(f"""
        WITH c AS (
            SELECT lang, doc_id, tl,
                   SUM(tl) OVER (
                       PARTITION BY lang
                       ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
                   ) AS cum
            FROM df)
        SELECT lang, doc_id FROM c WHERE cum <= {budget}
    """).df()


def _ray_ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)


def test_matches_sql_window_rule(ray_session):
    df = _corpus()
    budget = 500_000
    got, cutoffs = token_budget_select(
        _ray_ds(df), "doc_id", "lang", "tl", budget, pull_limit=200)
    got = got.to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
    exp = _oracle(df, budget).sort_values(["lang", "doc_id"]).reset_index(drop=True)
    assert got[["lang", "doc_id"]].values.tolist() == exp.values.tolist()
    # budgets respected exactly: per-lang kept sum <= budget, and adding
    # the first excluded doc would cross
    kept = got.groupby("lang")["tl"].sum()
    assert (kept <= budget).all()


def test_per_key_budgets_and_keep_all(ray_session):
    df = _corpus(n=8_000)
    budgets = {"en": 100_000, "de": 10**12}     # de: whole domain fits
    got, cutoffs = token_budget_select(
        _ray_ds(df), "doc_id", "lang", "tl", budgets, pull_limit=100)
    got = got.to_pandas()
    n_de = int((df["lang"] == "de").sum())
    assert int((got["lang"] == "de").sum()) == n_de
    # missing keys (fr, zh) keep everything too
    assert int((got["lang"] == "fr").sum()) == int((df["lang"] == "fr").sum())
    en = got[got["lang"] == "en"]
    assert en["tl"].sum() <= 100_000
    exp = _oracle(df, 100_000)
    exp_en = exp[exp["lang"] == "en"]
    assert sorted(en["doc_id"]) == sorted(exp_en["doc_id"])


def test_zero_and_tiny_budget(ray_session):
    df = _corpus(n=2_000)
    got, cutoffs = token_budget_select(
        _ray_ds(df), "doc_id", "lang", "tl", 0)
    assert got.count() == 0
    # budget 3000 > max single weight: at least the first doc of every
    # lang survives, and the boundary doc decision is exercised
    got1, _ = token_budget_select(_ray_ds(df), "doc_id", "lang", "tl", 3000)
    g = got1.to_pandas()
    exp = _oracle(df, 3000)
    assert sorted(g["doc_id"]) == sorted(exp["doc_id"])


def test_id_guard(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([1 << 23], type=pa.int64()),
                  "lang": pa.array(["en"]),
                  "tl": pa.array([5], type=pa.int64())})
    with pytest.raises(Exception, match="2\\^22|collide"):
        token_budget_cutoffs(rd.from_arrow(t), "doc_id", "lang", "tl", 1)


def test_property_random_weights_budgets(ray_session):
    """Hypothesis: arbitrary weights/budgets/partitionings — the
    narrowing cutoff rule must equal the SQL window-cumsum prefix
    exactly, including budgets landing exactly on a prefix sum."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        n=st.integers(10, 400),
        seed=st.integers(0, 10_000),
        budget=st.integers(0, 50_000),
        nparts=st.integers(1, 6),
    )
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def run(n, seed, budget, nparts):
        rng = np.random.default_rng(seed)
        df = pd.DataFrame({
            "doc_id": rng.choice(5000, n, replace=False).astype(np.int64),
            "lang": rng.choice(["a", "b"], n),
            "tl": rng.integers(0, 500, n).astype(np.int64),
        })
        got, _ = token_budget_select(
            _ray_ds(df).repartition(nparts), "doc_id", "lang", "tl",
            budget, pull_limit=7, n_bins=16)
        g = got.to_pandas()
        g_ids = sorted(g["doc_id"]) if len(g) else []
        exp = _oracle(df, budget)
        assert g_ids == sorted(exp["doc_id"])

    run()


def test_negative_budget_rejected(ray_session):
    df = _corpus(n=500)
    with pytest.raises(ValueError, match="negative budget"):
        token_budget_select(_ray_ds(df), "doc_id", "lang", "tl", -5)
    with pytest.raises(ValueError, match="negative budget"):
        token_budget_select(_ray_ds(df), "doc_id", "lang", "tl",
                            {"en": -1})
