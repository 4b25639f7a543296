"""byte_entropy: analytic values, null/empty semantics, chunking
equivalence, SQL parity (functions/text.py)."""

import math

import numpy as np
import pyarrow as pa

from presto_bloomfilter_ray.functions import byte_entropy


class TestByteEntropy:
    def test_analytic_values(self):
        b = pa.table({"text": ["aaaa", "ab", "abcd", "aab"]})
        got = byte_entropy(b)["entropy"].to_pylist()
        expect = [0.0, 1.0, 2.0,
                  round(-(2 / 3) * math.log2(2 / 3)
                        - (1 / 3) * math.log2(1 / 3), 6)]
        assert got == expect

    def test_null_and_empty_are_null(self):
        b = pa.table({"text": pa.array(["", None, "x"], type=pa.string())})
        got = byte_entropy(b)["entropy"]
        assert got.to_pylist() == [None, None, 0.0]
        assert got.null_count == 2

    def test_chunking_invariance(self):
        rng = np.random.default_rng(7)
        texts = ["".join(rng.choice(list("abcdef \n"), size=int(k)))
                 for k in rng.integers(1, 400, size=300)]
        b = pa.table({"text": texts})
        small = byte_entropy(b, _chunk=17)["entropy"].to_pylist()
        big = byte_entropy(b, _chunk=100_000)["entropy"].to_pylist()
        assert small == big

    def test_empty_batch(self):
        b = pa.table({"text": pa.array([], type=pa.string())})
        out = byte_entropy(b)
        assert out.num_rows == 0 and out["entropy"].type == pa.float64()

    def test_max_entropy_bound(self):
        # entropy of L distinct bytes is exactly log2(L); never exceeds 8
        b = pa.table({"text": ["abcdefgh", bytes(range(97, 123)).decode()]})
        got = byte_entropy(b)["entropy"].to_pylist()
        assert got[0] == 3.0
        assert abs(got[1] - math.log2(26)) < 1e-6
        assert all(v <= 8.0 for v in got)

    def test_sliced_column_offset_handling(self):
        b = pa.table({"text": ["zzzz", "aaaa", "ab", "abcd"]}).slice(1, 3)
        got = byte_entropy(b)["entropy"].to_pylist()
        assert got == [0.0, 1.0, 2.0]
