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
