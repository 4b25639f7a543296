"""Driver-style comparator for ONE `__ray_entry__.queries()` entry:
run it and its `oracle_sql()` mirror, sort columns by name + rows,
compare values AND dtypes (the driver's hash is dtype-sensitive).

Usage (from anywhere):

    python tools/check_q.py <query_name> [sf_dir]

Exits 0 on match. For the full sweep use `tools/sweep.py`.
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)  # worker imports of presto_bloomfilter_ray need repo cwd

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import ray  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    import __ray_entry__ as E

    res = E.queries()[name](sf)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    elif not isinstance(res, pd.DataFrame):
        res = pd.DataFrame(res)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    sql = E.oracle_sql().get(name)
    if sql is None:
        print(f"(no oracle) rows: {len(res)}")
        ray.shutdown()
        return 0
    ref = con.execute(sql).df()

    def norm(df):
        df = df[sorted(df.columns)]
        return (df.sort_values(list(df.columns), kind="stable")
                .reset_index(drop=True))

    a, b = norm(res), norm(ref)
    print("ray rows:", len(a), "oracle rows:", len(b))
    print("ray dtypes:", dict(a.dtypes.astype(str)))
    print("sql dtypes:", dict(b.dtypes.astype(str)))
    ok = a.shape == b.shape and list(a.columns) == list(b.columns)
    if ok:
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=True)
        except AssertionError as e:
            ok = False
            print(e)
    print("MATCH" if ok else "MISMATCH", name)
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
