"""Stream-shaped ingestion with per-bucket stateful actors."""

import numpy as np


def test_stream_aggregate_matches_sql(ray_session, sf_dir, duck):
    import ray.data as rd

    from presto_bloomfilter_ray.pipelines import stream_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value", "event_type"])
    res = stream_aggregate(ev, "user_id", "value", "event_type",
                           n_buckets=4, batch_size=1000)
    exact = duck.sql("""
        select user_id, count(*) n, sum(value) s,
               count(distinct event_type) d
        from events group by user_id
    """).df().set_index("user_id")
    assert len(res) == len(exact)
    for u in res:
        assert res[u]["n"] == exact.loc[u, "n"]
        assert abs(res[u]["sum"] - exact.loc[u, "s"]) < 1e-6
        # HLL p=12 is effectively exact at ≤5 distinct event types
        assert round(res[u]["distinct_est"]) == exact.loc[u, "d"]


def test_stream_windowed_matches_exact_batch(ray_session, sf_dir, duck):
    """Sorted stream + watermarks: no late events, finalized + residual
    windows equal the exact batch tumbling aggregate."""
    import ray.data as rd

    from presto_bloomfilter_ray.pipelines import stream_windowed_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"]).sort("ts")
    got, n_late = stream_windowed_aggregate(
        ev, ts_col="ts", key_col="event_type", value_col="value",
        size_s=3600, allowed_lateness_s=0, n_buckets=4, batch_size=512,
        advance_every=2)
    assert n_late == 0
    exact = duck.sql("""
        select event_type k,
               CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) window_start,
               count(*) n, round(sum(value), 6) s
        from events group by 1, 2 order by 1, 2
    """).df()
    assert len(got) == len(exact)
    assert got["key"].tolist() == exact["k"].tolist()
    assert got["window_start"].tolist() == exact["window_start"].tolist()
    assert got["n_events"].tolist() == exact["n"].tolist()
    assert np.allclose(got["sum_value"].round(6), exact["s"])


def test_stream_windowed_bounded_state_and_late_events(ray_session):
    """Out-of-order events older than a finalized window are counted
    LATE and excluded; in-window disorder within allowed lateness is
    absorbed; actor state stays bounded (windows finalize mid-stream)."""
    import pandas as pd
    import ray.data as rd

    from presto_bloomfilter_ray.pipelines import stream_windowed_aggregate

    base = 1_699_999_200  # seconds, hour-aligned (divisible by 3600)
    rows = []
    # 10 ordered hours of data, one event per minute
    for h in range(10):
        for m in range(60):
            rows.append({"ts": pd.Timestamp((base + h * 3600 + m * 60) * 10**9),
                         "k": "a", "v": 1.0})
    # inject stragglers for hour 0 at the very end of the stream —
    # far older than the final watermark, so they MUST be late
    for _ in range(5):
        rows.append({"ts": pd.Timestamp((base + 30) * 10**9), "k": "a", "v": 1.0})
    ds = rd.from_pandas(pd.DataFrame(rows))
    got, n_late = stream_windowed_aggregate(
        ds, ts_col="ts", key_col="k", value_col="v", size_s=3600,
        allowed_lateness_s=0, n_buckets=2, batch_size=64, advance_every=1)
    assert n_late == 5
    assert len(got) == 10  # one window per hour, none double-emitted
    assert (got["n_events"] == 60).all()
    # with generous lateness the stragglers are absorbed instead
    got2, n_late2 = stream_windowed_aggregate(
        ds, ts_col="ts", key_col="k", value_col="v", size_s=3600,
        allowed_lateness_s=12 * 3600, n_buckets=2, batch_size=64,
        advance_every=1)
    assert n_late2 == 0
    assert got2.loc[got2["window_start"] == base * 10**6,
                    "n_events"].iloc[0] == 65
