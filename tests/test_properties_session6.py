"""Property tests for the session-6 operators: URL canonicalization
(idempotence + generated-SQL parity on arbitrary inputs), histogram
(numpy reference + conservation), byte entropy (bounds + chunking),
JSON extraction (lenient nulls)."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from presto_bloomfilter_ray.functions import (
    byte_entropy,
    canonicalize_sql,
    canonicalize_url,
    json_extract,
)

_SETTINGS = dict(max_examples=25, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

# URL-ish strings: schemes, hosts, ports, paths, queries, fragments,
# plus arbitrary junk
_url_st = st.one_of(
    st.builds(
        lambda sch, host, port, path, q, frag:
        f"{sch}://{host}{port}{path}{q}{frag}",
        st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
        st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,3}", fullmatch=True),
        st.sampled_from(["", "?id=1", "?utm_a=1", "?utm_a=1&id=2",
                         "?id=2&utm_b=3", "?utm_a=1&utm_b=2"]),
        st.sampled_from(["", "#frag", "#a#b"]),
    ),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=40),
)


@settings(**_SETTINGS)
@given(st.lists(_url_st, min_size=1, max_size=20))
def test_canonicalize_idempotent_and_sql_exact(urls):
    b = pa.table({"url": pa.array(urls, type=pa.string())})
    once = canonicalize_url(b)["canonical_url"]
    twice = canonicalize_url(pa.table({"url": once}))["canonical_url"]
    assert once.to_pylist() == twice.to_pylist()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    ref = con.execute(
        f"SELECT {canonicalize_sql('url')} FROM t").df().iloc[:, 0].tolist()
    assert once.to_pylist() == ref


@settings(**_SETTINGS)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=200),
       st.integers(min_value=1, max_value=16))
def test_histogram_matches_numpy_reference(ray_session, vals, n_bins):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import histogram

    lo, hi = -100.0, 100.0
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, type=pa.float64())}))
    df = histogram(ds, "x", lo=lo, hi=hi, n_bins=n_bins)
    width = (hi - lo) / n_bins
    ref_idx = np.clip(np.floor((np.array(vals) - lo) / width),
                      -1, n_bins).astype(int)
    ref = {int(b): int(n) for b, n in
           zip(*np.unique(ref_idx, return_counts=True))}
    got = dict(zip(df["bin"].astype(int), df["n"].astype(int)))
    assert got == ref
    assert df["n"].sum() == len(vals)  # conservation


@settings(**_SETTINGS)
@given(st.lists(st.text(max_size=300), min_size=1, max_size=50),
       st.integers(min_value=1, max_value=64))
def test_entropy_bounds_and_chunking(texts, chunk):
    b = pa.table({"text": pa.array(texts, type=pa.string())})
    out = byte_entropy(b, _chunk=chunk)["entropy"]
    ref = byte_entropy(b, _chunk=10_000)["entropy"]
    assert out.to_pylist() == ref.to_pylist()
    for t, h in zip(texts, out.to_pylist()):
        nbytes = len(t.encode())
        if nbytes == 0:
            assert h is None
        else:
            assert 0.0 <= h <= 8.0
            if len(set(t.encode())) == 1:
                assert h == 0.0


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.none(),
                          st.text(max_size=30),
                          st.integers(-2**40, 2**40).map(
                              lambda i: f'{{"k": {i}}}')),
                min_size=1, max_size=30))
def test_json_extract_never_throws(vals):
    b = pa.table({"p": pa.array(vals, type=pa.string())})
    out = json_extract(b, "p", "$.k", "k", pa.int64())
    assert out.num_rows == len(vals)
    for v, k in zip(vals, out["k"].to_pylist()):
        if v is not None and v.startswith('{"k": '):
            assert k == int(v[6:-1])
