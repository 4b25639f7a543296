"""Format-adapting ingestion (sources/textio.py): JSONL/CSV round-trip
equals the parquet source, schema normalization, error on missing
required columns."""

import shutil
import uuid

import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.sources import (
    DOCUMENTS_SCHEMA,
    normalize_documents,
    read_documents,
    write_documents_csv,
    write_documents_jsonl,
)


@pytest.fixture()
def tmpbase():
    base = f"/tmp/textio-test-{uuid.uuid4().hex[:8]}"
    yield base
    shutil.rmtree(base, ignore_errors=True)


def _sorted_df(ds):
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df[[f.name for f in DOCUMENTS_SCHEMA]]


def test_jsonl_and_csv_roundtrip(ray_session, sf_dir, tmpbase):
    src = read_documents(f"{sf_dir}/documents.parquet")
    orig = _sorted_df(src)
    write_documents_jsonl(src, f"{tmpbase}/jsonl")
    write_documents_csv(src, f"{tmpbase}/csv")
    via_jsonl = _sorted_df(read_documents(f"{tmpbase}/jsonl", fmt="jsonl"))
    via_csv = _sorted_df(read_documents(f"{tmpbase}/csv", fmt="csv"))
    pd.testing.assert_frame_equal(orig, via_jsonl)
    pd.testing.assert_frame_equal(orig, via_csv)


def test_format_inference_from_dir(ray_session, sf_dir, tmpbase):
    src = read_documents(f"{sf_dir}/documents.parquet")
    write_documents_jsonl(src, f"{tmpbase}/j")
    assert read_documents(f"{tmpbase}/j").count() == src.count()


def test_normalize_derives_n_chars_and_fills_null_text(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int32()),     # needs cast
        "text": pa.array(["hello", None]),               # null → ""
        "lang": ["en", "de"],
        "source": ["s", "s"],
    })
    out = normalize_documents(rd.from_arrow(t))
    df = _sorted_df(out)
    assert df["n_chars"].tolist() == [5, 0]
    assert df["text"].tolist() == ["hello", ""]
    assert df["doc_id"].dtype == "int64"


def test_missing_required_column_raises(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": [1], "text": ["x"], "lang": ["en"]})
    with pytest.raises(Exception, match="source"):
        normalize_documents(rd.from_arrow(t)).materialize()


def test_parquet_without_n_chars_derives_it(ray_session, tmpbase):
    import os

    import pyarrow.parquet as pq

    os.makedirs(tmpbase)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": ["abc", "de"], "lang": ["en", "de"],
        "source": ["s", "s"],
    }), f"{tmpbase}/d.parquet")
    df = _sorted_df(read_documents(f"{tmpbase}/d.parquet"))
    assert df["n_chars"].tolist() == [3, 2]


def test_unknown_format_raises(ray_session):
    with pytest.raises(ValueError, match="cannot infer"):
        read_documents("/tmp/definitely-not-there.xyz")
