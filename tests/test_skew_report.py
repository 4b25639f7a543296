"""skew_report: exact group-size percentiles + deterministic top keys
vs DuckDB."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import skew_report


def test_matches_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(8)
    keys = rng.zipf(1.5, 20_000).astype(np.int64) % 500
    df = pd.DataFrame({"k": keys, "x": rng.integers(0, 9, keys.size)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    report, tops = skew_report(ds, "k", top_k=5)
    exp = duckdb.sql("""
        WITH c AS (SELECT k, count(*) AS cnt FROM df GROUP BY k)
        SELECT count(*) AS n_keys, sum(cnt) AS n_rows,
               max(cnt) AS max_cnt,
               quantile_disc(cnt, 0.5) AS p50,
               quantile_disc(cnt, 0.9) AS p90,
               quantile_disc(cnt, 0.99) AS p99
        FROM c
    """).df()
    for col in ["n_keys", "n_rows", "max_cnt", "p50", "p90", "p99"]:
        assert int(report[col][0]) == int(exp[col][0]), col
    exp_top = duckdb.sql("""
        SELECT k, count(*) AS cnt FROM df GROUP BY k
        ORDER BY cnt DESC, k ASC LIMIT 5
    """).df()
    assert tops["k"].astype(int).tolist() == exp_top["k"].astype(int).tolist()
    assert tops["cnt"].astype(int).tolist() == exp_top["cnt"].astype(int).tolist()


def test_empty_raises(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    with pytest.raises(ValueError, match="no rows"):
        skew_report(ds, "k")
