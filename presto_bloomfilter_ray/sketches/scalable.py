"""Scalable Bloom filter — the reference's Bloom core minus the
"know n up front" requirement.

The reference's filter must be sized at creation: ``bloom_filter(el,
n, p)`` fixes ``m``/``k`` from ``n`` and overfilling silently blows the
false-positive bound (``/root/reference/src/main/java/com/facebook/
presto/bloomfilter/BloomFilter.java:298-304`` — the formulas assume the
insert count stays ≤ n). A Scalable Bloom filter (Almeida, Baquero,
Preguiça, Hutchison, "Scalable Bloom Filters", Information Processing
Letters 2007 — public literature) removes that requirement: it is a
series of plain Bloom *stages* with geometrically growing capacity and
geometrically tightening per-stage error,

* stage ``i`` has capacity ``n0·s^i`` and FPP ``p0·r^i`` with
  ``p0 = P·(1-r)``, so the compound error of ANY number of stages stays
  ``Σ p0·r^i ≤ p0/(1-r) = P`` — the configured bound survives unbounded
  ingestion;
* each stage is this library's own :class:`~presto_bloomfilter_ray.
  sketches.bloom.BloomFilter` (same reference parameter formulas, same
  Kirsch–Mitzenmacher double hashing; pre-filter disabled — the stage
  series already short-circuits probes), so per-element bit positions
  are identical to a plain filter of the stage's geometry;
* inserts fill the newest stage up to its nominal capacity, then open
  the next stage; ``contains`` is "any stage contains" — an inserted
  element can never read absent (no false negatives), exactly like the
  single-stage filter;
* **merge ORs same-index stages and adds their fill counts** — stage
  geometry is a pure function of the index, so two filters built with
  the same ``(n0, P, s, r)`` always agree on every stage's ``(m, k)``.
  Bitset OR and count addition are both associative and commutative,
  so the engine's combine tree applies unchanged and the merged bits
  are identical under any merge order.

Distributed-build caveat (documented, by design): when W partial
filters are merged, each partial filled its OWN stage 0 first, so a
merged stage can hold up to W× its nominal capacity and the *a-priori*
compound bound no longer applies to the merged filter — this is
inherent to any growth-by-fill sketch under parallel ingestion, not an
implementation artifact. Sequential/incremental ingestion (the
unknown-``n`` use case the sketch exists for — the reference's
persist → load → append loop, ``run_tests.sh:123-125``) keeps every
stage within capacity and the ``≤ P`` guarantee holds. For the merged
case :meth:`ScalableBloomFilter.get_false_positive_percentage` reports
the *achieved* compound estimate from actual bit densities
(``1 - Π(1 - ρ_i^k_i)``), which upper-bounds the true FPP in
expectation whatever the fill history was.

Everything is vectorized over Arrow columns: one murmur3 hash pass per
capacity slice, numpy scatter/gather inside the stages — no per-row
Python.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from .base import Sketch, register
from .bloom import BloomFilter
from .hashing import normalize_elements

KIND_SCALABLE = 14  # 13 is PrioritySample


@register(KIND_SCALABLE)
class ScalableBloomFilter(Sketch):
    __slots__ = ("n0", "p", "s", "r", "stages", "fills")

    def __init__(
        self,
        initial_insertions: int = 1024,
        fpp: float = 0.01,
        growth: int = 2,
        tightening: float = 0.5,
        _stages: Optional[List[BloomFilter]] = None,
        _fills: Optional[List[int]] = None,
    ):
        if not (0.0 < fpp < 1.0):
            raise ValueError(f"fpp must be in (0,1), got {fpp}")
        if growth < 2:
            raise ValueError(f"growth factor must be >= 2, got {growth}")
        if not (0.0 < tightening < 1.0):
            raise ValueError(f"tightening must be in (0,1), got {tightening}")
        self.n0 = int(initial_insertions)
        self.p = float(fpp)
        self.s = int(growth)
        self.r = float(tightening)
        self.stages = _stages if _stages is not None else []
        self.fills = _fills if _fills is not None else []

    # ------------------------------------------------------------ geometry
    def _stage_capacity(self, i: int) -> int:
        return self.n0 * self.s**i

    def _stage_fpp(self, i: int) -> float:
        # p0 = P(1-r) so the geometric series of stage errors sums to P
        return self.p * (1.0 - self.r) * self.r**i

    def _new_stage(self, i: int) -> BloomFilter:
        return BloomFilter(
            self._stage_capacity(i), self._stage_fpp(i), use_pre_filter=False)

    @property
    def n_stages(self) -> int:
        return len(self.stages)

    def capacity(self) -> int:
        """Nominal insert capacity of the currently open stages."""
        return sum(self._stage_capacity(i) for i in range(len(self.stages)))

    # ------------------------------------------------------------------ api
    def update_arrow(self, array) -> "ScalableBloomFilter":
        """Insert every non-null, non-empty element, growing as needed.

        Fill accounting counts inserted ROWS (duplicates included) — an
        upper bound on distinct load, so growth triggers conservatively
        and the per-stage error budget is never exceeded by accounting.
        """
        ca = normalize_elements(array, drop_empty=True)
        n = len(ca)
        off = 0
        while off < n:
            if not self.stages:
                self.stages.append(self._new_stage(0))
                self.fills.append(0)
            i = len(self.stages) - 1
            room = self._stage_capacity(i) - self.fills[i]
            if room <= 0:
                self.stages.append(self._new_stage(i + 1))
                self.fills.append(0)
                continue
            take = min(room, n - off)
            self.stages[i].update_arrow(ca.slice(off, take))
            self.fills[i] += take
            off += take
        return self

    def put(self, element) -> None:
        if element is None:
            return
        import pyarrow as pa

        self.update_arrow(pa.array([element]))

    def contains_many(self, array) -> np.ndarray:
        """Vectorized membership: any stage contains. Null probes → False."""
        import pyarrow as pa

        ca = array if isinstance(array, (pa.Array, pa.ChunkedArray)) \
            else pa.array(array)
        out = np.zeros(len(ca), dtype=bool)
        for st in self.stages:
            miss = ~out
            if not miss.any():
                break
            out |= st.contains_many(ca)
        return out

    def might_contain(self, element) -> bool:
        if element is None:
            return False
        import pyarrow as pa

        return bool(self.contains_many(pa.array([element]))[0])

    def merge(self, other: "ScalableBloomFilter") -> "ScalableBloomFilter":
        """Same-index stage OR + fill addition (associative, commutative)."""
        if not isinstance(other, ScalableBloomFilter):
            raise TypeError("can only merge ScalableBloomFilter with same")
        if (self.n0, self.p, self.s, self.r) != (other.n0, other.p,
                                                 other.s, other.r):
            raise ValueError(
                f"incompatible scalable-bloom params: "
                f"(n0={self.n0},p={self.p},s={self.s},r={self.r}) vs "
                f"(n0={other.n0},p={other.p},s={other.s},r={other.r})")
        for i, st in enumerate(other.stages):
            if i < len(self.stages):
                np.bitwise_or(self.stages[i].bits, st.bits,
                              out=self.stages[i].bits)
                self.fills[i] += other.fills[i]
            else:
                cp = self._new_stage(i)
                cp.bits = st.bits.copy()
                self.stages.append(cp)
                self.fills.append(other.fills[i])
        return self

    def get_false_positive_percentage(self) -> float:
        """ACHIEVED compound FPP estimate ``1 - Π(1 - ρ_i^k_i)`` from the
        stages' actual bit densities (valid whatever the fill history —
        see the distributed-build caveat in the module docstring)."""
        miss = 1.0
        for st in self.stages:
            ones = int(np.bitwise_count(st.bits).sum()) if hasattr(
                np, "bitwise_count") else int(
                np.unpackbits(st.bits.view(np.uint8)).sum())
            rho = ones / st.m
            miss *= 1.0 - rho**st.k
        return 1.0 - miss

    def estimated_size_bytes(self) -> int:
        return sum((st.m + 7) // 8 for st in self.stages)

    # ---------------------------------------------------------- envelope
    def _params(self) -> Dict[str, Any]:
        return {"n0": self.n0, "p": self.p, "s": self.s, "r": self.r,
                "fills": list(map(int, self.fills))}

    def _payload(self) -> bytes:
        return b"".join(st.bits.tobytes() for st in self.stages)

    @classmethod
    def _from_parts(cls, params: Dict[str, Any],
                    payload: bytes) -> "ScalableBloomFilter":
        sbf = cls(params["n0"], params["p"], params["s"], params["r"])
        buf = np.frombuffer(payload, dtype=np.uint64)
        off = 0
        for i, fill in enumerate(params["fills"]):
            st = sbf._new_stage(i)
            nw = (st.m + 63) // 64
            st.bits = buf[off:off + nw].copy()
            off += nw
            sbf.stages.append(st)
            sbf.fills.append(int(fill))
        return sbf

    def __repr__(self) -> str:
        return (f"ScalableBloomFilter(n0={self.n0}, p={self.p}, s={self.s}, "
                f"r={self.r}, stages={len(self.stages)}, "
                f"fill={sum(self.fills)})")
