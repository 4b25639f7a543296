"""Property tests: the per-key window family (cumulative, lag,
transitions, funnel, ntile) against DuckDB on RANDOM small event logs —
the strongest guard against ordering/tie/boundary drift."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow,
                                        HealthCheck.function_scoped_fixture])


@st.composite
def _event_log(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    users = draw(st.lists(st.integers(0, 5), min_size=n, max_size=n))
    # coarse timestamps force plenty of exact ties
    ts = draw(st.lists(st.integers(0, 20), min_size=n, max_size=n))
    types = draw(st.lists(st.sampled_from(["s", "c", "p"]),
                          min_size=n, max_size=n))
    vals = draw(st.lists(st.integers(-100, 100), min_size=n, max_size=n))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.asarray(users, dtype=np.int64),
        "ts": pd.to_datetime(np.asarray(ts, dtype=np.int64) * 3_600_000_000,
                             unit="us"),
        "event_type": types,
        "value": np.asarray(vals, dtype=np.int64),
    })


def _con(df):
    con = duckdb.connect()
    con.register("events", df)
    return con


@settings(**_SETTINGS)
@given(_event_log())
def test_cumulative_fuzz(ray_session, df):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import cumulative_aggregate

    cum = cumulative_aggregate(rd.from_pandas(df).repartition(3),
                               "ts", "user_id", "value",
                               order_cols=["event_id"])
    mine = cum.to_pandas().sort_values("event_id").reset_index(drop=True)
    con = _con(df)
    theirs = con.sql("""
        SELECT event_id, CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(sum(value) OVER w AS BIGINT) AS rs
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
        ORDER BY event_id
    """).df()
    assert mine["running_n"].tolist() == theirs["rn"].tolist()
    assert mine["running_sum"].astype(int).tolist() == theirs["rs"].tolist()


@settings(**_SETTINGS)
@given(_event_log())
def test_lag_and_transitions_fuzz(ray_session, df):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import (
        lag_deltas,
        transition_counts,
    )

    ds = rd.from_pandas(df).repartition(2)
    lag = (lag_deltas(ds, "ts", "user_id", order_cols=["event_id"])
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    con = _con(df)
    ref = con.sql("""
        SELECT event_id, (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id)) / 1e6 AS d
        FROM events ORDER BY event_id
    """).df()
    assert (lag["delta_s"].isna() == ref["d"].isna()).all()
    assert np.allclose(lag["delta_s"].dropna(), ref["d"].dropna())

    tr = transition_counts(ds, "ts", "user_id", "event_type",
                           order_cols=["event_id"]).to_pandas()
    if tr.empty:  # no transitions at all: Ray drops the empty schema
        tr = pd.DataFrame({"from_state": [], "to_state": [], "n": []})
    tr = tr.sort_values(["from_state", "to_state"]).reset_index(drop=True)
    tref = con.sql("""
        WITH s AS (SELECT event_type AS f, lead(event_type) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS t FROM events)
        SELECT f, t, count(*) AS n FROM s WHERE t IS NOT NULL
        GROUP BY f, t ORDER BY f, t
    """).df()
    assert tr["from_state"].tolist() == tref["f"].tolist()
    assert tr["n"].astype(int).tolist() == tref["n"].tolist()


@settings(**_SETTINGS)
@given(_event_log())
def test_funnel_fuzz(ray_session, df):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import funnel_counts

    out = funnel_counts(rd.from_pandas(df).repartition(2), "ts",
                        "user_id", "event_type", ["s", "c", "p"],
                        num_partitions=2)
    con = _con(df)
    ref = con.sql("""
        WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 's' GROUP BY user_id),
             s2 AS (SELECT e.user_id, min(e.ts) AS t
                    FROM events e JOIN s1 USING (user_id)
                    WHERE e.event_type = 'c' AND e.ts >= s1.t
                    GROUP BY e.user_id),
             s3 AS (SELECT e.user_id, min(e.ts) AS t
                    FROM events e JOIN s2 USING (user_id)
                    WHERE e.event_type = 'p' AND e.ts >= s2.t
                    GROUP BY e.user_id)
        SELECT (SELECT count(*) FROM s1),
               (SELECT count(*) FROM s2),
               (SELECT count(*) FROM s3)
    """).fetchone()
    assert out["n_keys"].tolist() == list(ref)


@settings(**_SETTINGS)
@given(_event_log(), st.integers(min_value=1, max_value=6))
def test_ntile_fuzz(ray_session, df, n):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import ntile_by_key

    mine = (ntile_by_key(rd.from_pandas(df).repartition(2), "user_id",
                         "value", n, order_cols=["event_id"])
            .to_pandas().sort_values("event_id").reset_index(drop=True))
    con = _con(df)
    theirs = con.sql(f"""
        SELECT event_id, ntile({n}) OVER (PARTITION BY user_id
               ORDER BY value, event_id) AS tile
        FROM events ORDER BY event_id
    """).df()
    assert mine["tile"].tolist() == theirs["tile"].astype(int).tolist()
