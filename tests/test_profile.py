"""profile_table (functions/profile.py): SQL parity incl. nulls,
mixed dtypes, column subset, partitioning invariance."""

import pyarrow as pa

from presto_bloomfilter_ray.functions import profile_table


def test_matches_sql(ray_session, sf_dir, duck):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    mine = profile_table(docs)
    theirs = duck.sql("""
        SELECT 'doc_id' AS c, count(*) AS r, count(*)-count(doc_id) AS z,
               count(DISTINCT doc_id) AS d FROM documents
        UNION ALL SELECT 'lang', count(*), count(*)-count(lang),
               count(DISTINCT lang) FROM documents
        UNION ALL SELECT 'n_chars', count(*), count(*)-count(n_chars),
               count(DISTINCT n_chars) FROM documents
        UNION ALL SELECT 'source', count(*), count(*)-count(source),
               count(DISTINCT source) FROM documents
        UNION ALL SELECT 'text', count(*), count(*)-count(text),
               count(DISTINCT text) FROM documents
        ORDER BY c
    """).df()
    assert mine["column"].tolist() == theirs["c"].tolist()
    assert mine["n_rows"].tolist() == theirs["r"].astype(int).tolist()
    assert mine["n_null"].tolist() == theirs["z"].astype(int).tolist()
    assert mine["n_distinct"].tolist() == theirs["d"].astype(int).tolist()


def test_nulls_and_mixed_dtypes(ray_session):
    import ray.data as rd

    t = pa.table({
        "i": pa.array([1, 1, None, 3], type=pa.int64()),
        "s": pa.array(["a", None, None, "a"], type=pa.string()),
        "f": pa.array([1.5, 1.5, 1.5, None], type=pa.float64()),
    })
    for par in (1, 4):
        out = profile_table(rd.from_arrow(t).repartition(par))
        got = {r["column"]: (r["n_rows"], r["n_null"], r["n_distinct"])
               for _, r in out.iterrows()}
        assert got == {"i": (4, 1, 2), "s": (4, 2, 1), "f": (4, 1, 1)}


def test_column_subset(ray_session):
    import ray.data as rd

    t = pa.table({"a": [1, 2], "b": ["x", "x"]})
    out = profile_table(rd.from_arrow(t), columns=["b"])
    assert out["column"].tolist() == ["b"]
    assert out["n_distinct"].tolist() == [1]


def test_all_null_column(ray_session):
    import ray.data as rd

    t = pa.table({"a": pa.array([None, None], type=pa.string())})
    out = profile_table(rd.from_arrow(t))
    assert out.iloc[0][["n_rows", "n_null", "n_distinct"]].tolist() == [2, 2, 0]
