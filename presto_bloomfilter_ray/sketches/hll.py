"""HyperLogLog — approximate distinct count (north_rule companion sketch).

No reference analog (the reference leaves ``count(distinct …)`` to
Presto, SURVEY §2.5); built to the published HLL algorithm
(Flajolet et al. 2007) with the standard small-range linear-counting
correction. Relative standard error ≈ 1.04/√m for m = 2^p registers.

Register update and estimation are fully vectorized (numpy); merge is
an elementwise ``max`` — associative and commutative.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import numpy as np

from .base import KIND_HLL, Sketch, register
from .hashing import hash64, normalize_elements

_SEED_HLL = 0xC2B2AE3D27D4EB4F


def _clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (binary-search shifts)."""
    n = np.zeros(w.shape, dtype=np.uint64)
    x = w.copy()
    for shift, mask in ((32, 0xFFFFFFFF00000000), (16, 0xFFFF000000000000),
                        (8, 0xFF00000000000000), (4, 0xF000000000000000),
                        (2, 0xC000000000000000), (1, 0x8000000000000000)):
        hi = (x & np.uint64(mask)) == 0
        n += np.where(hi, np.uint64(shift), np.uint64(0))
        x = np.where(hi, x << np.uint64(shift), x)
    n[w == 0] = 64
    return n


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@register(KIND_HLL)
class HyperLogLog(Sketch):
    __slots__ = ("p", "m", "regs")

    def __init__(self, precision: int = 14, _regs: np.ndarray | None = None):
        if not (4 <= precision <= 18):
            raise ValueError("precision must be in [4, 18]")
        self.p = int(precision)
        self.m = 1 << self.p
        self.regs = _regs if _regs is not None else np.zeros(self.m, dtype=np.uint8)

    def update_arrow(self, array) -> "HyperLogLog":
        ca = normalize_elements(array)
        if len(ca) == 0:
            return self
        h = hash64(ca, _SEED_HLL)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        rank = np.minimum(_clz64(w), np.uint64(64 - self.p)) + np.uint64(1)
        np.maximum.at(self.regs, idx, rank.astype(np.uint8))
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.p != other.p:
            raise ValueError(f"incompatible HLL precisions {self.p} vs {other.p}")
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        m = self.m
        raw = _alpha(m) * m * m / np.sum(np.exp2(-self.regs.astype(np.float64)))
        if raw <= 2.5 * m:
            zeros = int(np.count_nonzero(self.regs == 0))
            if zeros:
                return m * math.log(m / zeros)
        return float(raw)

    def relative_error_bound(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def _params(self) -> Dict[str, Any]:
        return {"precision": self.p}

    def _payload(self) -> bytes:
        return self.regs.tobytes()

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "HyperLogLog":
        regs = np.frombuffer(payload, dtype=np.uint8).copy()
        return cls(params["precision"], _regs=regs)

    def __repr__(self) -> str:
        return f"HyperLogLog(p={self.p}, est={self.estimate():.1f})"
