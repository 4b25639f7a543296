"""URL canonicalization / parsing / host filtering
(functions/urls.py): SQL-mirror parity on adversarial cases, parse
nulls, Bloom blocklist exactness."""

import duckdb
import pyarrow as pa

from presto_bloomfilter_ray.functions import (
    canonicalize_sql,
    canonicalize_url,
    host_filter,
    url_parts,
)

CASES = [
    "https://SRC0.Example.com:443/doc/1?utm_source=feed&id=1#top",
    "https://src1.example.com/doc/2?id=2&utm_campaign=x",
    "HTTP://src2.EXAMPLE.com:80/doc/3?id=3",
    "https://a.com/p?utm_a=1&utm_b=2",            # all params tracking
    "https://a.com/p?utm_a=1&utm_b=2&id=9",       # consecutive utm
    "http://b.com:8080/x#frag",                   # non-default port kept
    "https://c.com:443",                          # port, no path
    "http://d.com:80?utm_x=1",                    # port + only-utm query
    "ftp://E.com/File",                           # other scheme: host lowered
    "https://x.com/CaseSensitive/Path",           # path case preserved
    "https://a.com/p?xutm_a=1&id=2",              # param NAME contains utm_
    "https://a.com/p?a=utm_x&id=2",               # VALUE contains utm_
    "https://a.com/p?id=1&utm_a=2&utm_b=3",       # trailing utm run
    "not a url",
    "",
    None,
]


class TestCanonicalize:
    def test_matches_generated_sql_mirror(self):
        b = pa.table({"url": pa.array(CASES, type=pa.string())})
        mine = canonicalize_url(b)["canonical_url"].to_pylist()
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ",".join("(?)" for _ in CASES) + ") v(url)", CASES)
        theirs = con.execute(
            f"SELECT {canonicalize_sql('url')} FROM t").df().iloc[:, 0]
        theirs = [None if v != v or v is None else v for v in theirs]
        assert mine == list(theirs)

    def test_semantics(self):
        b = pa.table({"url": pa.array(CASES, type=pa.string())})
        got = canonicalize_url(b)["canonical_url"].to_pylist()
        assert got[0] == "https://src0.example.com/doc/1?id=1"
        assert got[3] == "https://a.com/p"
        assert got[5] == "http://b.com:8080/x"   # 8080 preserved
        assert got[6] == "https://c.com"
        assert got[7] == "http://d.com"
        assert got[8] == "ftp://e.com/File"
        assert got[9] == "https://x.com/CaseSensitive/Path"
        # utm_ anchored to a param boundary: names/values containing
        # 'utm_' are untouched; real runs are removed
        assert got[10] == "https://a.com/p?xutm_a=1&id=2"
        assert got[11] == "https://a.com/p?a=utm_x&id=2"
        assert got[12] == "https://a.com/p?id=1"
        assert got[13] == "not a url"            # passthrough
        assert got[15] is None

    def test_idempotent(self):
        b = pa.table({"url": pa.array(CASES, type=pa.string())})
        once = canonicalize_url(b)["canonical_url"]
        twice = canonicalize_url(
            pa.table({"url": once}))["canonical_url"]
        assert once.to_pylist() == twice.to_pylist()


class TestUrlParts:
    def test_parse(self):
        b = pa.table({"url": ["https://h.com:8443/a/b?q=1#f", "nope", None]})
        p = url_parts(b)
        assert p["url_scheme"].to_pylist() == ["https", None, None]
        assert p["url_host"].to_pylist() == ["h.com:8443", None, None]
        assert p["url_path"].to_pylist() == ["/a/b", None, None]
        assert p["url_query"].to_pylist() == ["q=1", None, None]


class TestHostFilter:
    def test_blocklist_drops_exactly(self, ray_session):
        import ray.data as rd

        urls = [f"https://host{i}.com/p/{i}" for i in range(200)]
        blocked = [f"host{i}.com" for i in range(0, 200, 10)]
        ds = rd.from_arrow(pa.table({"url": urls, "i": list(range(200))}))
        kept = host_filter(ds, blocked).to_pandas()
        # Bloom false is definite: all kept rows are truly not blocked;
        # fpp=1e-9 means no allowed row is dropped here
        assert len(kept) == 180
        assert all(int(i) % 10 != 0 for i in kept["i"])
        # helper column removed
        assert set(kept.columns) == {"url", "i"}
