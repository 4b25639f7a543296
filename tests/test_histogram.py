"""Fixed-bin histogram: SQL parity, under/overflow clamping, null drop,
partitioning invariance (functions/histogram.py)."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import histogram


def test_matches_sql(ray_session, sf_dir, duck):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    mine = histogram(docs, "n_chars", lo=50.0, hi=450.0, n_bins=8)
    theirs = duck.sql("""
        SELECT CAST(least(greatest(
                   floor((n_chars - 50.0) / ((450.0 - 50.0) / 8)), -1), 8)
               AS BIGINT) AS bin, count(*) AS n
        FROM documents WHERE n_chars IS NOT NULL GROUP BY bin ORDER BY bin
    """).df()
    assert mine["bin"].tolist() == theirs["bin"].astype(int).tolist()
    assert mine["n"].tolist() == theirs["n"].astype(int).tolist()


def test_clamp_null_and_partition_invariance(ray_session):
    import ray.data as rd

    vals = [None, -5.0, 0.0, 9.999, 10.0, 55.0, 99.9, 100.0, 123.0, None]
    for parallelism in (1, 5):
        ds = rd.from_arrow(pa.table({"x": pa.array(vals, type=pa.float64())}))
        ds = ds.repartition(parallelism)
        df = histogram(ds, "x", lo=0.0, hi=100.0, n_bins=10)
        got = dict(zip(df["bin"], df["n"]))
        # -5 underflows; 0 and 9.999 bin 0; 10.0 bin 1; 55 bin 5;
        # 99.9 bin 9; 100 and 123 overflow; nulls dropped
        assert got == {-1: 1, 0: 2, 1: 1, 5: 1, 9: 1, 10: 2}
        assert df["n"].sum() == 8  # 10 values minus 2 nulls


def test_total_count_conserved(ray_session, sf_dir):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    df = histogram(docs, "n_chars", lo=0.0, hi=1.0, n_bins=1)
    assert df["n"].sum() == docs.count()


def test_bad_params_raise(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"x": [1.0]}))
    with pytest.raises(ValueError):
        histogram(ds, "x", lo=0.0, hi=0.0, n_bins=4)
    with pytest.raises(ValueError):
        histogram(ds, "x", lo=0.0, hi=1.0, n_bins=0)
