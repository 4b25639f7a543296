"""Theta sketch (KMV — k minimum values) for distinct counts AND set
operations (union / intersection / difference / Jaccard estimates).

North-rule companion (no reference analog): published KMV estimator
(Bar-Yossef et al. 2002; Dasu et al.) — keep the k smallest distinct
64-bit hashes; with the k-th smallest mapped to θ ∈ (0,1],
``estimate = (k-1)/θ``, relative standard error ≈ 1/√(k-2). Set ops
follow the theta-sketch framework (Sketches library semantics): work
below ``θ = min(θ_a, θ_b)``, intersect/diff the retained hash sets, and
scale by 1/θ.

Merge keeps the union's k smallest — a deterministic function of the
input SET, so merge is exactly associative/commutative (bit-identical
across arbitrary merge trees, like Bloom/HLL here).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .base import Sketch, register
from .hashing import hash64, normalize_elements

KIND_THETA = 7
_SEED_THETA = 0x7E7A_5EED_0000_0001
_MAX64 = float(1 << 64)


@register(KIND_THETA)
class ThetaSketch(Sketch):
    __slots__ = ("k", "values")

    def __init__(self, k: int = 2048, _values: Optional[np.ndarray] = None):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        self.values = (
            _values if _values is not None else np.zeros(0, dtype=np.uint64)
        )  # sorted, distinct, len <= k

    def _absorb(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        if self.values.size >= self.k:
            # saturated: only hashes below the current θ cutoff can
            # enter the bottom-k — pre-filter so the O(k log k) union
            # re-sort runs over the few candidates, not the whole
            # batch (round-2 verdict #7)
            h = h[h < self.values[-1]]
            if h.size == 0:
                return
        merged = np.union1d(self.values, h)  # sorted distinct
        self.values = merged[: self.k]

    def update_arrow(self, array) -> "ThetaSketch":
        ca = normalize_elements(array)
        if len(ca) == 0:
            return self
        self._absorb(hash64(ca, _SEED_THETA))
        return self

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if self.k != other.k:
            raise ValueError("incompatible theta k")
        self._absorb(other.values)
        return self

    # ----------------------------------------------------------- estimates
    @property
    def theta(self) -> float:
        if self.values.size < self.k:
            return 1.0
        return float(self.values[-1]) / _MAX64

    def estimate(self) -> float:
        if self.values.size < self.k:
            return float(self.values.size)  # exact below saturation
        return (self.k - 1) / self.theta

    def relative_error_bound(self) -> float:
        return 1.0 / np.sqrt(max(2, self.k - 2))

    @staticmethod
    def _below(sk: "ThetaSketch", theta: float) -> np.ndarray:
        if theta >= 1.0:
            return sk.values
        cut = np.uint64(int(theta * _MAX64))
        return sk.values[sk.values < cut]

    def intersection_estimate(self, other: "ThetaSketch") -> float:
        th = min(self.theta, other.theta)
        a = self._below(self, th)
        b = self._below(other, th)
        common = np.intersect1d(a, b, assume_unique=True)
        return common.size / th

    def union_estimate(self, other: "ThetaSketch") -> float:
        """Union = merge (k smallest of the union set) — estimate that."""
        u = ThetaSketch(self.k, _values=self.values.copy())
        u.merge(other)
        return u.estimate()

    def difference_estimate(self, other: "ThetaSketch") -> float:
        """Estimate |A \\ B|."""
        th = min(self.theta, other.theta)
        a = self._below(self, th)
        b = self._below(other, th)
        only = np.setdiff1d(a, b, assume_unique=True)
        return only.size / th

    def jaccard_estimate(self, other: "ThetaSketch") -> float:
        th = min(self.theta, other.theta)
        a = self._below(self, th)
        b = self._below(other, th)
        u = np.union1d(a, b)
        if u.size == 0:
            return 1.0
        return np.intersect1d(a, b, assume_unique=True).size / u.size

    # ------------------------------------------------------------ envelope
    def _params(self) -> Dict[str, Any]:
        return {"k": self.k}

    def _payload(self) -> bytes:
        return self.values.tobytes()

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "ThetaSketch":
        vals = np.frombuffer(payload, dtype=np.uint64).copy()
        return cls(params["k"], _values=vals)

    def __repr__(self) -> str:
        return f"ThetaSketch(k={self.k}, est={self.estimate():.1f})"
