"""Feature-engineering ops (functions/features.py) and lag_deltas
(functions/windows.py): SQL parity, zero-variance nulls, pivot
category handling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import (
    lag_deltas,
    pivot_counts,
    standardize_by_key,
)


def test_standardize_matches_sql(ray_session, sf_dir, duck):
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus",
                                      "o_totalprice"])
    zd = standardize_by_key(orders, "o_orderstatus", "o_totalprice")
    mine = (zd.to_pandas().sort_values("o_orderkey")
            .reset_index(drop=True))
    theirs = duck.sql("""
        WITH m AS (
            SELECT o_orderstatus, count(*) AS n,
                   sum(CAST(round(o_totalprice*100) AS BIGINT)) AS s1,
                   sum(CAST(round(o_totalprice*100) AS BIGINT)
                       * CAST(round(o_totalprice*100) AS BIGINT)) AS s2
            FROM orders GROUP BY 1)
        SELECT o_orderkey,
               round((o_totalprice - (s1/100.0)/n)
                     / sqrt((s2/10000.0)/n - ((s1/100.0)/n)*((s1/100.0)/n)),
                     6) AS z
        FROM orders JOIN m USING (o_orderstatus) ORDER BY o_orderkey
    """).df()
    assert mine["z"].tolist() == theirs["z"].tolist()


def test_standardize_zero_variance_is_null(ray_session):
    import ray.data as rd

    t = pa.table({"k": ["a", "a", "b", "b"],
                  "v": [5.0, 5.0, 1.0, 3.0]})
    out = (standardize_by_key(rd.from_arrow(t), "k", "v")
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    assert out.loc[out["k"] == "a", "z"].isna().all()   # σ = 0
    assert out.loc[out["k"] == "b", "z"].tolist() == [-1.0, 1.0]


def test_standardize_null_keys_skipped(ray_session):
    import ray.data as rd

    t = pa.table({"k": pa.array(["a", None, "a", "a"], type=pa.string()),
                  "v": [1.0, 99.0, 2.0, 3.0]})
    out = (standardize_by_key(rd.from_arrow(t), "k", "v")
           .to_pandas().sort_values("v").reset_index(drop=True))
    # NULL-key row gets NULL z and does not perturb the 'a' moments
    assert out.loc[out["k"].isna(), "z"].isna().all()
    a = out.loc[out["k"] == "a", "z"]
    assert a.notna().all() and abs(a.sum()) < 1e-9


def test_pivot_counts(ray_session):
    import ray.data as rd

    t = pa.table({"row": [1, 1, 2, 2, 2],
                  "cat": ["x", "y", "x", "x", "zzz"]})
    out = (pivot_counts(rd.from_arrow(t), "row", "cat", ["x", "y"])
           .to_pandas().sort_values("row").reset_index(drop=True))
    assert out["n_x"].tolist() == [1, 2]
    assert out["n_y"].tolist() == [1, 0]
    assert "n_zzz" not in out.columns  # unlisted categories ignored


def test_ntile_matches_sql_per_row(ray_session, sf_dir, duck):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import ntile_by_key

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus",
                                      "o_totalprice"])
    mine = (ntile_by_key(orders, "o_orderstatus", "o_totalprice", 4,
                         order_cols=["o_orderkey"])
            .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    theirs = duck.sql("""
        SELECT o_orderkey, ntile(4) OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey) AS tile
        FROM orders ORDER BY o_orderkey
    """).df()
    assert mine["tile"].tolist() == theirs["tile"].astype(int).tolist()


def test_ntile_fewer_rows_than_buckets(ray_session):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import ntile_by_key

    t = pa.table({"k": ["a", "a", "a"], "v": [3.0, 1.0, 2.0],
                  "id": [0, 1, 2]})
    out = (ntile_by_key(rd.from_arrow(t), "k", "v", 5, order_cols=["id"])
           .to_pandas().sort_values("v"))
    # NTILE(5) over 3 rows: each row its own bucket 1..3 in value order
    assert out["tile"].tolist() == [1, 2, 3]


def test_set_op_counts(ray_session):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import set_op_counts

    l = rd.from_arrow(pa.table({"a": [1, 2, 2, 3, None]})).repartition(2)
    r = rd.from_arrow(pa.table({"b": [3, 3, 4, None]})).repartition(2)
    out = set_op_counts(l, "a", r, "b").iloc[0]
    assert out["n_left"] == 3 and out["n_right"] == 2
    assert out["n_union"] == 4 and out["n_intersect"] == 1
    assert out["n_left_only"] == 2 and out["n_right_only"] == 1


def test_explode_list_ordinals(ray_session):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import explode_list

    t = pa.table({
        "id": [0, 1, 2, 3],
        "l": pa.array([[10, 20], [], None, [30]],
                      type=pa.list_(pa.int64())),
    })
    out = (explode_list(rd.from_arrow(t), "l")
           .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True))
    assert out["id"].tolist() == [0, 0, 3]
    assert out["pos"].tolist() == [1, 2, 1]
    assert out["value"].tolist() == [10, 20, 30]


def test_explode_list_matches_sql(ray_session, sf_dir, duck):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import explode_list

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    mine = (explode_list(emb, "embedding")
            .to_pandas().sort_values(["vec_id", "pos"])
            .reset_index(drop=True))
    theirs = duck.sql("""
        SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
               unnest(embedding) AS value
        FROM embeddings ORDER BY vec_id, pos
    """).df()
    assert mine["pos"].tolist() == theirs["pos"].astype(int).tolist()
    assert np.allclose(mine["value"], theirs["value"])


def test_mad_outliers(ray_session):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import mad_outliers_by_key

    # values 1..9 plus a wild outlier: med=5.5, MAD=2.5, |1000-5.5|>7.5
    t = pa.table({"k": ["a"] * 10,
                  "v": [1.0, 2, 3, 4, 5, 6, 7, 8, 9, 1000.0]})
    out = mad_outliers_by_key(rd.from_arrow(t), "k", "v", k=3.0).to_pandas()
    assert out["n"].tolist() == [10]
    assert out["median"].tolist() == [5.5]
    assert out["mad"].tolist() == [2.5]
    assert out["n_outliers"].tolist() == [1]


def test_rollup_matches_sql(ray_session, sf_dir, duck):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import rollup_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source", "n_chars"])
    mine = rollup_counts(docs, ["lang", "source"], sum_cols=["n_chars"])
    theirs = duck.sql("""
        SELECT lang, source, count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY ROLLUP(lang, source)
    """).df()

    def norm(df):
        df = df.copy()
        for c in ["lang", "source"]:
            df[c] = df[c].fillna("␀")
        return (df.sort_values(["lang", "source"])
                .reset_index(drop=True))

    a, b = norm(mine), norm(theirs)
    assert a["n"].astype(int).tolist() == b["n"].astype(int).tolist()
    assert a["n_chars"].astype(int).tolist() == b["n_chars"].astype(int).tolist()
    assert a["lang"].tolist() == b["lang"].tolist()
    # grand total present exactly once and equals the row count
    gt = mine[mine["lang"].isna() & mine["source"].isna()]
    assert len(gt) == 1 and int(gt["n"].iloc[0]) == docs.count()


def test_lag_deltas_matches_sql(ray_session, sf_dir, duck):
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    d = lag_deltas(ev, "ts", "user_id", order_cols=["event_id"])
    mine = (d.to_pandas().sort_values("event_id").reset_index(drop=True))
    theirs = duck.sql("""
        SELECT event_id,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)) / 1e6
                   AS delta_s
        FROM events ORDER BY event_id
    """).df()
    a, b = mine["delta_s"], theirs["delta_s"]
    assert (a.isna() == b.isna()).all()
    assert np.allclose(a.dropna(), b.dropna())
