"""JSON field extraction: typed casts, lenient null semantics, and the
one-pass multi-field path (functions/jsonops.py)."""

import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import json_extract, json_extract_fields


def _batch():
    return pa.table({
        "id": [0, 1, 2, 3, 4, 5],
        "props": [
            '{"k": 69, "tag": "a", "f": 1.5}',
            '{"k": -2, "tag": "b"}',
            None,                      # SQL NULL input
            'not json at all',         # malformed
            '{"k": "not-an-int"}',     # uncastable value
            '{"other": 9}',            # missing path
        ],
    })


class TestJsonExtract:
    def test_typed_int_extraction(self):
        out = json_extract(_batch(), "props", "$.k", "k", pa.int64())
        assert out["k"].to_pylist() == [69, -2, None, None, None, None]
        assert out["k"].type == pa.int64()

    def test_string_default_dtype(self):
        out = json_extract(_batch(), "props", "$.tag", "tag")
        assert out["tag"].to_pylist() == ["a", "b", None, None, None, None]
        assert out["tag"].type == pa.string()

    def test_float_extraction(self):
        out = json_extract(_batch(), "props", "$.f", "f", pa.float64())
        vals = out["f"].to_pylist()
        assert vals[0] == 1.5 and vals[1:] == [None] * 5

    def test_multi_field_single_pass(self):
        out = json_extract_fields(_batch(), "props", {
            "k": ("$.k", pa.int64()),
            "tag": ("$.tag", None),
            "nope": ("$.does_not_exist", pa.int64()),
        })
        assert out["k"].to_pylist()[0] == 69
        assert out["tag"].to_pylist()[1] == "b"
        assert out["nope"].null_count == 6
        # original columns preserved
        assert out["id"].to_pylist() == list(range(6))

    def test_dtype_by_name(self):
        out = json_extract(_batch(), "props", "$.k", "k", "int64")
        assert out["k"].type == pa.int64()

    def test_unsupported_dtype_raises(self):
        with pytest.raises(ValueError, match="unsupported"):
            json_extract(_batch(), "props", "$.k", "k", pa.date32())

    def test_empty_batch(self):
        empty = _batch().slice(0, 0)
        out = json_extract(empty, "props", "$.k", "k", pa.int64())
        assert out.num_rows == 0 and out["k"].type == pa.int64()
