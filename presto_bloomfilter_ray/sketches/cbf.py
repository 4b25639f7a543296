"""Counting Bloom filter — the reference's Bloom core plus deletion.

The reference's filter (``/root/reference/src/main/java/com/facebook/
presto/bloomfilter/BloomFilter.java``) is insert-only: removing a key
from a persisted filter means rebuilding it from scratch (the pattern
its HTTP persist-service round-trips exist for,
``run_tests.sh:123-125``). A counting Bloom filter (Fan et al.,
"Summary Cache", 1998 — public literature) replaces each bit with a
small counter so the SAME membership semantics gain ``remove``:

* identical parameter formulas ``m = ceil(-n·ln p / (ln 2)^2)``,
  ``k = round((m/n)·ln 2)`` and the same Kirsch–Mitzenmacher double
  hashing as :class:`~presto_bloomfilter_ray.sketches.bloom.BloomFilter`
  (``BloomFilter.java:298-304, 400-407``) — a CBF and a Bloom filter
  with the same ``(n, p)`` touch the same positions for every element;
* insert increments the k counters, delete decrements them, contains
  is "all k counters > 0" — so FPP matches the plain filter's bound
  and a present element can never read absent (no false negatives);
* **merge is element-wise saturating counter addition** — associative
  and commutative (``min(a+b+c, SAT)`` regardless of grouping), so the
  combine tree in :mod:`~presto_bloomfilter_ray.engine.agg` applies
  unchanged;
* **subtract is element-wise saturating counter subtraction** — the
  distributed form of deletion: build a CBF over the rows to delete
  (same ``(n, p)``) with the normal map/combine pipeline, then subtract
  it from the base filter once on the driver. Exact whenever no counter
  ever saturated and the deleted multiset is contained in the inserted
  multiset (both conditions documented below).

Counters are ``uint16`` (saturation at 65535). A saturated counter is
sticky: it can no longer be decremented safely, so ``remove``/
``subtract`` leave it at SAT and count the event in ``stuck`` —
membership stays conservative (no false negatives are ever introduced).
Deleting an element that was never inserted is a caller-contract
violation (classic CBF caveat); the filter clips at zero instead of
wrapping and counts the event in ``underflows``.

No pre-filter: the reference's 1-hash pre-filter is an insert-only
optimization; a counting pre-filter would double the deletion surface
for no probe-side gain at CBF's counter widths.

Everything is vectorized over Arrow columns (hash once per column,
``np.unique``-grouped scatter updates touching only affected counters —
no O(m) temporaries per batch, no per-row Python).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .base import Sketch, register
from .bloom import optimal_k, optimal_m
from .hashing import SEED_H1, SEED_H2, hash64, km_positions, normalize_elements

KIND_CBF = 10  # 9 is MisraGriesTopK

SAT = np.uint16(0xFFFF)
_SAT_I = 0xFFFF


@register(KIND_CBF)
class CountingBloomFilter(Sketch):
    __slots__ = ("n", "p", "m", "k", "counts", "underflows", "stuck")

    #: cap on the (rows × k) position-matrix size per vectorized pass —
    #: bounds peak memory regardless of batch size (same policy as Bloom)
    _CHUNK_POSITIONS = 4_000_000

    def __init__(
        self,
        expected_insertions: int = 10_000_000,
        fpp: float = 0.01,
        _counts: Optional[np.ndarray] = None,
    ):
        if not (0.0 < fpp < 1.0):
            raise ValueError(f"fpp must be in (0,1), got {fpp}")
        self.n = int(expected_insertions)
        self.p = float(fpp)
        self.m = optimal_m(self.n, self.p)
        self.k = optimal_k(self.n, self.m)
        self.counts = (
            _counts if _counts is not None else np.zeros(self.m, dtype=np.uint16)
        )
        self.underflows = 0  # observability only; never serialized
        self.stuck = 0  # saturated counters hit by a decrement

    # ------------------------------------------------------------- updates
    def _positions(self, ca, lo: int, hi: int, h1, h2) -> np.ndarray:
        return km_positions(h1[lo:hi], h2[lo:hi], self.k, self.m)

    def _apply(self, positions: np.ndarray, sign: int) -> None:
        """Saturating counter update at ``positions`` (any shape).

        Grouped by counter index via ``np.unique`` so each affected
        counter is read/written once; untouched counters cost nothing.
        """
        pos, cnt = np.unique(positions.ravel(), return_counts=True)
        if pos.size == 0:
            return
        idx = pos.astype(np.int64)
        cur = self.counts[idx].astype(np.int64)
        if sign > 0:
            new = cur + cnt
            over = new > _SAT_I
            if over.any():
                new[over] = _SAT_I
        else:
            sat = cur == _SAT_I
            if sat.any():  # sticky: saturated counters never decrement
                self.stuck += int(sat.sum())
                cnt = np.where(sat, 0, cnt)
            new = cur - cnt
            under = new < 0
            if under.any():
                self.underflows += int((-new[under]).sum())
                new[under] = 0
        self.counts[idx] = new.astype(np.uint16)

    def _update(self, array, sign: int) -> "CountingBloomFilter":
        ca = normalize_elements(array, drop_empty=True)
        n = len(ca)
        if n == 0:
            return self
        h1 = hash64(ca, SEED_H1)
        h2 = hash64(ca, SEED_H2)
        step = max(1, self._CHUNK_POSITIONS // self.k)
        for lo in range(0, n, step):
            hi = min(n, lo + step)
            self._apply(self._positions(ca, lo, hi, h1, h2), sign)
        return self

    def update_arrow(self, array) -> "CountingBloomFilter":
        """Insert every non-null, non-empty element of an Arrow column
        (same null/empty skip semantics as the reference,
        ``BloomFilter.java:159-167``)."""
        return self._update(array, +1)

    def remove_arrow(self, array) -> "CountingBloomFilter":
        """Delete elements (caller contract: each was inserted at least
        as many times as it is removed; violations clip at zero and are
        counted in ``underflows``)."""
        return self._update(array, -1)

    def put(self, element) -> None:
        if element is None:
            return
        import pyarrow as pa

        self.update_arrow(pa.array([element]))

    def remove(self, element) -> None:
        if element is None:
            return
        import pyarrow as pa

        self.remove_arrow(pa.array([element]))

    # -------------------------------------------------------------- probes
    def contains_many(self, array) -> np.ndarray:
        """Vectorized membership aligned with the input column; null
        probes → False (``BloomFilterContainsScalarFunction.java:38-40``)."""
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
        h1 = hash64(ca.fill_null(""), SEED_H1)
        h2 = hash64(ca.fill_null(""), SEED_H2)
        idx = np.flatnonzero(valid)
        step = max(1, self._CHUNK_POSITIONS // self.k)
        for lo in range(0, idx.size, step):
            sub = idx[lo : lo + step]
            pos = km_positions(h1[sub], h2[sub], self.k, self.m)
            hit = self.counts[pos.astype(np.int64)] > 0
            out[sub] = hit.all(axis=-1)
        return out

    def might_contain(self, element) -> bool:
        if element is None:
            return False
        import pyarrow as pa

        return bool(self.contains_many(pa.array([element]))[0])

    # -------------------------------------------------------------- algebra
    def _check_shape(self, other: "CountingBloomFilter", op: str):
        if not isinstance(other, CountingBloomFilter):
            raise TypeError(f"can only {op} CountingBloomFilter with CountingBloomFilter")
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError(
                f"{op} requires identical shape: (m,k)=({self.m},{self.k}) "
                f"vs ({other.m},{other.k})"
            )

    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        """Element-wise saturating add — associative + commutative, so
        any combine-tree grouping yields byte-identical counters."""
        self._check_shape(other, "merge")
        s = self.counts.astype(np.int64) + other.counts.astype(np.int64)
        np.minimum(s, _SAT_I, out=s)
        self.counts = s.astype(np.uint16)
        return self

    def subtract(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        """Distributed deletion: remove ``other``'s whole multiset.

        Exact (equals having never inserted the deleted rows) whenever
        (a) no counter of ``self`` ever saturated and (b) the deleted
        multiset is contained in the inserted one. Saturated counters
        stay at SAT (sticky, counted in ``stuck``); deficits clip at
        zero (counted in ``underflows``) — both keep membership
        conservative.
        """
        self._check_shape(other, "subtract")
        sat = self.counts == SAT
        d = self.counts.astype(np.int64) - other.counts.astype(np.int64)
        if sat.any():
            self.stuck += int((sat & (other.counts > 0)).sum())
            d[sat] = _SAT_I
        under = d < 0
        if under.any():
            self.underflows += int((-d[under]).sum())
            d[under] = 0
        self.counts = d.astype(np.uint16)
        return self

    # ----------------------------------------------------------- accessors
    def approx_element_count(self) -> float:
        """Cardinality estimate from counter occupancy — the standard
        ``-(m/k)·ln(1 - X/m)`` fill estimator with X = nonzero counters."""
        x = int(np.count_nonzero(self.counts))
        if x >= self.m:
            return float(self.n)
        import math

        return -(self.m / self.k) * math.log(1.0 - x / self.m)

    def get_expected_insertions(self) -> int:
        return self.n

    def get_false_positive_percentage(self) -> float:
        return self.p

    # ------------------------------------------------------------ envelope
    def _params(self) -> Dict[str, Any]:
        return {"n": self.n, "p": self.p}

    def _payload(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "CountingBloomFilter":
        counts = np.frombuffer(payload, dtype=np.uint16).copy()
        return cls(params["n"], params["p"], _counts=counts)

    def memory_bytes(self) -> int:
        return int(self.counts.nbytes)
