"""snapshot_delta: exact added/removed/changed vs a DuckDB full outer
join; unchanged suppression; loud duplicate-key failure."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import snapshot_delta


def _snapshots(n=500):
    rng = np.random.default_rng(2)
    text = ["doc %d %s" % (i, "".join(rng.choice(list("abcdef"), 8)))
            for i in range(n)]
    old = pd.DataFrame({"k": np.arange(n, dtype=np.int64), "v": text})
    old = old[old.k % 7 != 0]
    new = pd.DataFrame({"k": np.arange(n, dtype=np.int64), "v": text})
    new = new[new.k % 5 != 0].copy()
    new.loc[new.k % 11 == 0, "v"] = new.loc[new.k % 11 == 0, "v"] + " v2"
    return old.reset_index(drop=True), new.reset_index(drop=True)


def test_matches_full_outer_join(ray_session):
    import ray.data as rd

    old, new = _snapshots()
    d_old = rd.from_arrow(pa.Table.from_pandas(old)).repartition(4)
    d_new = rd.from_arrow(pa.Table.from_pandas(new)).repartition(3)
    got = snapshot_delta(d_old, d_new, "k", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = duckdb.sql("""
        SELECT COALESCE(o.k, n.k) AS k,
               CASE WHEN o.k IS NULL THEN 'added'
                    WHEN n.k IS NULL THEN 'removed'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n ON o.k = n.k
        WHERE o.k IS NULL OR n.k IS NULL OR o.v <> n.v
        ORDER BY k
    """).df()
    assert got["k"].tolist() == exp["k"].astype(int).tolist()
    assert got["status"].tolist() == exp["status"].tolist()
    # sanity: all three statuses actually occur in this fixture
    assert set(got["status"]) == {"added", "removed", "changed"}


def test_include_unchanged(ray_session):
    import ray.data as rd

    old, new = _snapshots(100)
    d_old = rd.from_arrow(pa.Table.from_pandas(old))
    d_new = rd.from_arrow(pa.Table.from_pandas(new))
    got = snapshot_delta(d_old, d_new, "k", "v",
                         include_unchanged=True).to_pandas()
    both = set(old.k) & set(new.k)
    assert len(got) == len(set(old.k) | set(new.k))
    unchanged = got[got.status == "unchanged"]["k"]
    assert all(k in both and k % 11 != 0 for k in unchanged)


def test_duplicate_keys_fail_loudly(ray_session):
    import ray.data as rd

    old = pd.DataFrame({"k": np.array([1, 1, 2], dtype=np.int64),
                        "v": ["a", "b", "c"]})
    new = pd.DataFrame({"k": np.array([2], dtype=np.int64), "v": ["c"]})
    d_old = rd.from_arrow(pa.Table.from_pandas(old))
    d_new = rd.from_arrow(pa.Table.from_pandas(new))
    with pytest.raises(Exception, match="duplicate keys"):
        snapshot_delta(d_old, d_new, "k", "v").to_pandas()


def test_string_keys(ray_session):
    import ray.data as rd

    old = pd.DataFrame({"u": ["a.com/1", "a.com/2", "b.com/1"],
                        "v": ["x", "y", "z"]})
    new = pd.DataFrame({"u": ["a.com/2", "b.com/1", "c.com/9"],
                        "v": ["y2", "z", "w"]})
    got = snapshot_delta(rd.from_arrow(pa.Table.from_pandas(old)),
                         rd.from_arrow(pa.Table.from_pandas(new)),
                         "u", "v").to_pandas().sort_values("u")
    assert list(zip(got["u"], got["status"])) == [
        ("a.com/1", "removed"), ("a.com/2", "changed"),
        ("c.com/9", "added")]


def test_fuzz_vs_duckdb(ray_session):
    """Property-style sweep: random snapshots (random drops, changes,
    duplicate value collisions) always match the full outer join."""
    import ray.data as rd

    rng = np.random.default_rng(13)
    for trial in range(5):
        n = int(rng.integers(20, 400))
        keys = rng.choice(np.arange(n * 2, dtype=np.int64), size=n,
                          replace=False)
        vals = rng.integers(0, 5, n)  # heavy value collisions
        old = pd.DataFrame({"k": keys, "v": vals}) \
            .sample(frac=0.8, random_state=trial).reset_index(drop=True)
        new = pd.DataFrame({"k": keys, "v": vals}) \
            .sample(frac=0.8, random_state=trial + 99).reset_index(drop=True)
        flip = rng.random(len(new)) < 0.15
        new.loc[flip, "v"] = new.loc[flip, "v"] + 100
        got = snapshot_delta(
            rd.from_arrow(pa.Table.from_pandas(old)).repartition(3),
            rd.from_arrow(pa.Table.from_pandas(new)).repartition(2),
            "k", "v").to_pandas().sort_values("k").reset_index(drop=True)
        exp = duckdb.sql("""
            SELECT COALESCE(o.k, n.k) AS k,
                   CASE WHEN o.k IS NULL THEN 'added'
                        WHEN n.k IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM old o FULL OUTER JOIN new n ON o.k = n.k
            WHERE o.k IS NULL OR n.k IS NULL OR o.v <> n.v
            ORDER BY k
        """).df()
        assert got["k"].tolist() == exp["k"].astype(int).tolist(), trial
        assert got["status"].tolist() == exp["status"].tolist(), trial
