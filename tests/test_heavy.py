"""Exact certified heavy hitters: matches GROUP BY oracle, certifies
honestly, raises on uncertifiable flat distributions."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import exact_heavy_hitters


def _zipf_ds(n=60_000, n_items=2_000, seed=4, s=1.3):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, n_items + 1) ** s
    p /= p.sum()
    items = np.array([f"item{i:05d}" for i in range(n_items)])
    vals = items[rng.choice(n_items, n, p=p)]
    df = pd.DataFrame({"w": vals})
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(8), df


def test_matches_exact_groupby(ray_session):
    ds, df = _zipf_ds()
    got = exact_heavy_hitters(ds, "w", k=15)
    exp = duckdb.sql("""
        SELECT w AS item, count(*) AS n FROM df
        GROUP BY w ORDER BY n DESC, w ASC LIMIT 15""").df()
    assert got["item"].tolist() == exp["item"].tolist()
    assert got["n"].tolist() == exp["n"].astype(int).tolist()
    assert got["certified"].all()


def test_flat_distribution_raises_or_flags(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    vals = np.array([f"u{i}" for i in range(5_000)])[
        rng.integers(0, 5_000, 20_000)]
    ds = rd.from_arrow(pa.table({"w": pa.array(vals)})).repartition(4)
    with pytest.raises(RuntimeError, match="certify"):
        exact_heavy_hitters(ds, "w", k=10, capacity=20)
    soft = exact_heavy_hitters(ds, "w", k=10, capacity=20, strict=False)
    assert not soft["certified"].any()


def test_fewer_distinct_than_k(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"w": pa.array(["a", "b", "a", "a", "b",
                                                "c"])}))
    got = exact_heavy_hitters(ds, "w", k=10)
    assert got["item"].tolist() == ["a", "b", "c"]
    assert got["n"].tolist() == [3, 2, 1]
    assert got["certified"].all()


def test_depleted_summary_not_certified(ray_session):
    """MG evictions can shrink the summary below k; that must NOT be
    read as 'fewer than k distinct items exist'."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    # near-uniform over many items with tiny capacity: summary depletes
    vals = np.array([f"x{i}" for i in range(3_000)])[
        rng.integers(0, 3_000, 30_000)]
    ds = rd.from_arrow(pa.table({"w": pa.array(vals)})).repartition(4)
    soft = exact_heavy_hitters(ds, "w", k=50, capacity=60, strict=False)
    # whether or not the summary kept 50 items, nothing here can be
    # certified (N >> capacity and counts hug the bound)
    assert not soft["certified"].any()
    with pytest.raises(RuntimeError):
        exact_heavy_hitters(ds, "w", k=50, capacity=60)


def test_non_string_recount_normalized(ray_session):
    """Non-string columns recount through the sketch's own canonical
    element form — a raw index_in would zero the recount for booleans
    (Arrow 'true' vs Python 'True')."""
    import ray.data as rd

    df = pd.DataFrame({"flag": np.r_[np.ones(700, bool),
                                     np.zeros(300, bool)]})
    out = exact_heavy_hitters(rd.from_pandas(df).repartition(3),
                              "flag", k=2)
    assert out["item"].tolist() == ["true", "false"]
    assert out["n"].tolist() == [700, 300]
    assert out["certified"].all()


def test_binary_column_rejected(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"b": b"\x00\x01"}] * 10)
    with pytest.raises(ValueError, match="binary columns"):
        exact_heavy_hitters(ds, "b", k=1)
