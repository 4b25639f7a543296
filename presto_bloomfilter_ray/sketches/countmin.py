"""Count-Min sketch — approximate frequencies / heavy hitters.

North_rule companion sketch (no reference analog). Published bounds
(Cormode & Muthukrishnan 2005): with width w = ceil(e/ε) and depth
d = ceil(ln(1/δ)), the estimate f̂ satisfies f ≤ f̂ ≤ f + εN with
probability ≥ 1-δ. Merge = elementwise counter add (associative,
commutative). Fully vectorized update via per-row 64-bit hashes.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np

from .base import KIND_COUNTMIN, Sketch, register
from .hashing import hash64, normalize_elements

_SEED_CM = 0x27D4EB2F165667C5


@register(KIND_COUNTMIN)
class CountMin(Sketch):
    __slots__ = ("eps", "delta", "w", "d", "counts", "total")

    def __init__(
        self,
        epsilon: float = 1e-4,
        delta: float = 1e-3,
        _counts: Optional[np.ndarray] = None,
        _total: int = 0,
    ):
        self.eps = float(epsilon)
        self.delta = float(delta)
        self.w = max(2, math.ceil(math.e / self.eps))
        self.d = max(1, math.ceil(math.log(1.0 / self.delta)))
        self.counts = (
            _counts if _counts is not None else np.zeros((self.d, self.w), dtype=np.int64)
        )
        self.total = int(_total)

    def _rows_idx(self, ca) -> np.ndarray:
        """(d, n) column indexes — one seeded hash per depth row."""
        return np.stack(
            [hash64(ca, _SEED_CM + 0x9E3779B9 * j) % np.uint64(self.w) for j in range(self.d)]
        ).astype(np.int64)

    def update_arrow(self, array, weights: Optional[np.ndarray] = None) -> "CountMin":
        ca = normalize_elements(array)
        n = len(ca)
        if n == 0:
            return self
        idx = self._rows_idx(ca)
        if weights is None:
            for j in range(self.d):
                self.counts[j] += np.bincount(idx[j], minlength=self.w)
            self.total += n
        else:
            wts = np.asarray(weights, dtype=np.int64)
            for j in range(self.d):
                self.counts[j] += np.bincount(idx[j], weights=wts, minlength=self.w).astype(np.int64)
            self.total += int(wts.sum())
        return self

    def estimate_many(self, array) -> np.ndarray:
        """Point-query estimates for a column of items (vectorized)."""
        ca = normalize_elements(array)
        if len(ca) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._rows_idx(ca)
        ests = np.stack([self.counts[j][idx[j]] for j in range(self.d)])
        return ests.min(axis=0)

    def estimate(self, item) -> int:
        import pyarrow as pa

        return int(self.estimate_many(pa.array([item]))[0])

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.w, self.d) != (other.w, other.d):
            raise ValueError("incompatible CountMin shapes")
        self.counts += other.counts
        self.total += other.total
        return self

    def error_bound(self) -> float:
        """Additive error εN valid with probability ≥ 1-δ."""
        return self.eps * self.total

    def inner_product(self, other: "CountMin") -> int:
        """Join-size / inner-product estimate (Cormode & Muthukrishnan
        2005 §4.2): ``min_j Σ_w a_jw·b_jw`` over the depth rows.

        When both sketches count equi-join keys, the true join
        cardinality ``a⊙b = Σ_x f_a(x)·f_b(x)`` satisfies
        ``a⊙b ≤ est ≤ a⊙b + ε·N_a·N_b`` with probability ≥ 1-δ —
        a query-planner cardinality estimate without executing the
        join. Requires identical (w, d); both sketches share the class
        seeds, so same-parameter sketches always qualify."""
        if (self.w, self.d) != (other.w, other.d):
            raise ValueError("incompatible CountMin shapes")
        return int(np.einsum("ij,ij->i", self.counts, other.counts).min())

    def inner_product_bound(self, other: "CountMin") -> int:
        """The ε·N_a·N_b additive slack for :meth:`inner_product`."""
        return math.ceil(self.eps * self.total * other.total)

    def _params(self) -> Dict[str, Any]:
        return {"epsilon": self.eps, "delta": self.delta, "total": self.total}

    def _payload(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "CountMin":
        obj = cls(params["epsilon"], params["delta"], _total=params.get("total", 0))
        obj.counts = np.frombuffer(payload, dtype=np.int64).reshape(obj.d, obj.w).copy()
        return obj

    def __repr__(self) -> str:
        return f"CountMin(eps={self.eps}, delta={self.delta}, w={self.w}, d={self.d}, N={self.total})"
