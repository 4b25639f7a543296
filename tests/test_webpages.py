"""Webpages source contracts (input_hint schema + determinism invariant)."""

import numpy as np
import pyarrow as pa

from presto_bloomfilter_ray.sources import extract_text, make_batch


def test_schema_matches_input_hint():
    b = make_batch(np.arange(10))
    assert b.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert b.schema.field("url").type == pa.string()
    assert b.schema.field("warc_ts").type == pa.timestamp("us")
    assert b.schema.field("html").type == pa.binary()
    assert b.schema.field("text").type == pa.string()
    assert b.schema.field("lang").type == pa.string()


def test_text_is_pure_function_of_html():
    # the per-row invariant: byte-identical extracted text per url
    b = make_batch(np.arange(50))
    for html, text in zip(b.column("html").to_pylist(), b.column("text").to_pylist()):
        assert extract_text(html) == text


def test_batch_boundary_independence():
    whole = make_batch(np.arange(0, 40))
    part = make_batch(np.arange(17, 29))
    for col in ("url", "html", "text", "lang"):
        assert part.column(col).to_pylist() == whole.column(col).to_pylist()[17:29]


def test_zipf_skew_present():
    import collections

    b = make_batch(np.arange(5000))
    langs = collections.Counter(b.column("lang").to_pylist())
    top = langs.most_common()
    assert top[0][1] > 3 * top[-1][1]  # skewed, not uniform
    hosts = collections.Counter(
        u.split("/")[2] for u in b.column("url").to_pylist()
    )
    assert hosts.most_common(1)[0][1] > 20  # hot host exists


def test_distributed_generation_matches_local(ray_session):
    from presto_bloomfilter_ray.sources import generate_dataset

    ds = generate_dataset(200, override_num_blocks=4)
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    want = make_batch(np.arange(200)).to_pandas().sort_values("url").reset_index(drop=True)
    assert got["html"].tolist() == want["html"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
