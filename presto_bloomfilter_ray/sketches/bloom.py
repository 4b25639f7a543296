"""Mergeable Bloom filter — the core reference capability rebuilt.

Reproduces the published construction the reference uses
(`/root/reference/src/main/java/com/facebook/presto/bloomfilter/BloomFilter.java`):

* optimal parameters ``m = ceil(-n·ln p / (ln 2)^2)``,
  ``k = round((m/n)·ln 2)`` (``BloomFilter.java:298-304, 400-407``),
* Kirsch–Mitzenmacher double hashing ``g_i = h1 + i·h2 mod m``,
* a deliberately tiny 1-hash **pre-filter** with ``n_pre = max(n/10, 10)``,
  ``p_pre = min(10·p, 0.5)`` probed before the main filter
  (``BloomFilter.java:54-60, 306-313, 184-199``), with a ``pre_miss``
  counter that is intentionally NOT serialized (``BloomFilter.java:58``),
* inserts go to both filters; merge ORs both bitsets
  (``BloomFilter.java:168-182``),
* null elements skipped on insert; empty elements skipped on insert;
  null probe → False (``BloomFilter.java:159-167``,
  ``BloomFilterContainsScalarFunction.java:38-40``),
* defaults n=10_000_000, p=0.01 (``BloomFilter.java:64-65``).

Bitsets are numpy ``uint64`` words; insert/probe are fully vectorized
over Arrow columns (no per-row Python).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np

from .base import KIND_BLOOM, Sketch, register
from .hashing import SEED_H1, SEED_H2, hash64, km_positions, normalize_elements

DEFAULT_EXPECTED_INSERTIONS = 10_000_000
DEFAULT_FPP = 0.01

_LN2 = math.log(2.0)
_LN2_SQ = _LN2 * _LN2
# distinct seeds for the pre-filter's single FNV-style hash analog
_SEED_PRE = 0x9E3779B97F4A7C15


def optimal_m(n: int, p: float) -> int:
    """Bits for the main filter — reference formula ``BloomFilter.java:400-407``."""
    return max(64, math.ceil(-n * math.log(p) / _LN2_SQ))


def optimal_k(n: int, m: int) -> int:
    return max(1, round((m / max(1, n)) * _LN2))


def _scatter_or(bits: np.ndarray, positions: np.ndarray) -> None:
    """Set bit ``positions`` (uint64, any shape) in the word array ``bits``.

    Vectorized scatter-OR: dedupe positions (so per-word contributions
    are distinct powers of two), group by word with ``reduceat``, then
    one gather/scatter. Avoids the slow unbuffered ``np.bitwise_or.at``.
    """
    pos = np.unique(positions.ravel())
    if pos.size == 0:
        return
    words = (pos >> np.uint64(6)).astype(np.int64)
    contrib = np.uint64(1) << (pos & np.uint64(63))
    starts = np.flatnonzero(np.diff(words)) + 1
    starts = np.concatenate(([0], starts))
    merged = np.bitwise_or.reduceat(contrib, starts)
    idx = words[starts]
    bits[idx] |= merged


def _gather_test(bits: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """True where ALL bit positions along the last axis are set."""
    w = bits[(positions >> np.uint64(6)).astype(np.int64)]
    hit = (w >> (positions & np.uint64(63))) & np.uint64(1)
    if positions.ndim == 1:
        return hit.astype(bool)
    return hit.all(axis=-1)


@register(KIND_BLOOM)
class BloomFilter(Sketch):
    __slots__ = ("n", "p", "m", "k", "m_pre", "bits", "pre_bits", "pre_miss", "use_pre")

    def __init__(
        self,
        expected_insertions: int = DEFAULT_EXPECTED_INSERTIONS,
        fpp: float = DEFAULT_FPP,
        use_pre_filter: bool = True,
        _bits: Optional[np.ndarray] = None,
        _pre_bits: Optional[np.ndarray] = None,
    ):
        if not (0.0 < fpp < 1.0):
            raise ValueError(f"fpp must be in (0,1), got {fpp}")
        self.n = int(expected_insertions)
        self.p = float(fpp)
        self.m = optimal_m(self.n, self.p)
        self.k = optimal_k(self.n, self.m)
        self.use_pre = bool(use_pre_filter)
        if self.use_pre:
            n_pre = max(self.n // 10, 10)
            p_pre = min(self.p * 10.0, 0.5)
            self.m_pre = optimal_m(n_pre, p_pre)
        else:
            self.m_pre = 0
        nw = (self.m + 63) // 64
        nw_pre = (self.m_pre + 63) // 64
        self.bits = _bits if _bits is not None else np.zeros(nw, dtype=np.uint64)
        self.pre_bits = (
            _pre_bits if _pre_bits is not None else np.zeros(nw_pre, dtype=np.uint64)
        )
        self.pre_miss = 0  # observability only; never serialized (parity)

    #: cap on the (rows × k) position-matrix size per vectorized pass —
    #: bounds peak memory to ~32 MB regardless of batch size
    _CHUNK_POSITIONS = 4_000_000

    # ------------------------------------------------------------------ api
    def update_arrow(self, array) -> "BloomFilter":
        """Insert every non-null, non-empty element of an Arrow column."""
        ca = normalize_elements(array, drop_empty=True)
        n = len(ca)
        if n == 0:
            return self
        h1 = hash64(ca, SEED_H1)
        h2 = hash64(ca, SEED_H2)
        step = max(1, self._CHUNK_POSITIONS // self.k)
        for lo in range(0, n, step):
            hi = min(n, lo + step)
            _scatter_or(self.bits, km_positions(h1[lo:hi], h2[lo:hi], self.k, self.m))
        if self.use_pre:
            hp = hash64(ca, _SEED_PRE)
            _scatter_or(self.pre_bits, (hp % np.uint64(self.m_pre))[:, None])
        return self

    def put(self, element) -> None:
        """Single-element insert (test/compat surface)."""
        if element is None:
            return
        import pyarrow as pa

        self.update_arrow(pa.array([element]))

    def contains_many(self, array) -> np.ndarray:
        """Vectorized membership; result aligned with the input column.

        Null probes → False (``BloomFilterContainsScalarFunction.java:38-40``).
        Pre-filter is consulted first; the main filter only on pre-hits
        (``BloomFilter.java:184-199``), and ``pre_miss`` counts rejections.
        """
        import pyarrow as pa

        if isinstance(array, pa.ChunkedArray):
            ca = array
        elif isinstance(array, pa.Array):
            ca = pa.chunked_array([array])
        else:
            ca = pa.chunked_array([pa.array(array)])
        t = ca.type
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)
                or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
            ca = ca.cast(pa.large_string())
        n_rows = len(ca)
        out = np.zeros(n_rows, dtype=bool)
        if n_rows == 0:
            return out
        valid = ~np.asarray(ca.is_null())
        if not valid.any():
            return out
        # hash the full column once (null slots masked after)
        h1 = hash64(ca.fill_null(""), SEED_H1)
        h2 = hash64(ca.fill_null(""), SEED_H2)
        cand = valid.copy()
        if self.use_pre:
            hp = hash64(ca.fill_null(""), _SEED_PRE)
            pre_hit = _gather_test(self.pre_bits, hp % np.uint64(self.m_pre))
            self.pre_miss += int((valid & ~pre_hit).sum())
            cand &= pre_hit
        idx = np.flatnonzero(cand)
        step = max(1, self._CHUNK_POSITIONS // self.k)
        for lo in range(0, idx.size, step):
            sub = idx[lo : lo + step]
            pos = km_positions(h1[sub], h2[sub], self.k, self.m)
            out[sub] = _gather_test(self.bits, pos)
        return out

    def might_contain(self, element) -> bool:
        if element is None:
            return False
        import pyarrow as pa

        return bool(self.contains_many(pa.array([element]))[0])

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """Bitwise-OR union of both filters (``BloomFilter.java:175-182``).

        Associative + commutative; requires identical shape (same n, p).
        """
        if not isinstance(other, BloomFilter):
            raise TypeError("can only merge BloomFilter with BloomFilter")
        if (self.m, self.k, self.m_pre) != (other.m, other.k, other.m_pre):
            raise ValueError(
                f"incompatible bloom shapes: (n={self.n},p={self.p}) vs (n={other.n},p={other.p})"
            )
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        if self.use_pre:
            np.bitwise_or(self.pre_bits, other.pre_bits, out=self.pre_bits)
        return self

    def estimated_size_bytes(self) -> int:
        """Main-bitset bytes — matches the reference's memory goldens
        exactly: 11_981_323 (n=10M, p=0.01), 120 (n=100), 180
        (n=100, p=0.001) (``TestBloomFilter.java:80-94``)."""
        return (self.m + 7) // 8

    # ---------------------------------------------------------- envelope
    def _params(self) -> Dict[str, Any]:
        return {"n": self.n, "p": self.p, "pre": int(self.use_pre)}

    def _payload(self) -> bytes:
        return self.bits.tobytes() + self.pre_bits.tobytes()

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "BloomFilter":
        bf = cls(params["n"], params["p"], bool(params.get("pre", 1)))
        nw = (bf.m + 63) // 64
        buf = np.frombuffer(payload, dtype=np.uint64)
        return cls(
            params["n"],
            params["p"],
            bool(params.get("pre", 1)),
            _bits=buf[:nw].copy(),
            _pre_bits=buf[nw:].copy(),
        )

    def __repr__(self) -> str:
        return f"BloomFilter(n={self.n}, p={self.p}, m={self.m}, k={self.k})"
