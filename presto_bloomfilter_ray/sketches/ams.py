"""AMS-style F₂ sketch — second frequency moment F₂ = Σ f(x)².

Completes the frequency-moment family the engine already spans
(F₀ → HLL/Theta, F₁ → plain counts, heavy hitters → count-min /
Misra–Gries). Published construction: the fast variant of the
Alon–Matias–Szegedy (1996) tug-of-war estimator via the count sketch
of Charikar–Chen–Farach-Colton (2002) / Thorup–Zhang (2004): each row
of the sketch hashes an element to ONE signed bucket (O(depth) work
per element instead of AMS's O(width·depth)); a row's Σ buckets² is an
unbiased F₂ estimate with relative standard error ≈ ``sqrt(2/width)``,
and the estimate is the median over ``depth`` independent rows.
No reference analog (the reference is membership-only, SURVEY §2.5);
same mergeable-UDAF shape as every other sketch here.

* **merge is element-wise counter addition** — exact, associative,
  commutative: merge trees are byte-identical regardless of shape.
* update hashes each element ONCE with the shared vectorized hash64,
  then derives each row's (bucket, sign) stream with a splitmix64
  remix — pure numpy per row, no re-hash of the strings.
* counters are int64; F₁ up to 2⁶² per stream is safe.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np

from .base import Sketch, register
from .hashing import hash64, normalize_elements

KIND_AMS = 11  # 10 is CountingBloomFilter

_SEED_AMS = 0xA5A5F00DD15EA5E5
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return z ^ (z >> np.uint64(31))


@register(KIND_AMS)
class AMSSketch(Sketch):
    __slots__ = ("width", "depth", "counters")

    def __init__(
        self,
        width: int = 512,
        depth: int = 5,
        _counters: Optional[np.ndarray] = None,
    ):
        if width < 1 or depth < 1:
            raise ValueError("width and depth must be >= 1")
        self.width = int(width)
        self.depth = int(depth)
        self.counters = (
            _counters
            if _counters is not None
            else np.zeros((self.depth, self.width), dtype=np.int64)
        )

    # ----------------------------------------------------------------- update
    def update_arrow(self, array) -> "AMSSketch":
        ca = normalize_elements(array)
        if len(ca) == 0:
            return self
        h = hash64(ca, _SEED_AMS)  # one string hash per batch
        w = np.uint64(self.width)
        for g in range(self.depth):
            z = _splitmix64(h ^ np.uint64(0x9E3779B97F4A7C15 * (g + 1) & 0xFFFFFFFFFFFFFFFF))
            bucket = ((z >> np.uint64(1)) % w).astype(np.int64)
            sign = (z & np.uint64(1)).astype(bool)  # True → +1, False → −1
            plus = np.bincount(bucket[sign], minlength=self.width)
            minus = np.bincount(bucket[~sign], minlength=self.width)
            self.counters[g] += plus - minus
        return self

    def put(self, element) -> None:
        if element is None:
            return
        import pyarrow as pa

        self.update_arrow(pa.array([element]))

    # ------------------------------------------------------------------ merge
    def merge(self, other: "AMSSketch") -> "AMSSketch":
        if not isinstance(other, AMSSketch):
            raise TypeError("can only merge AMSSketch with AMSSketch")
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError(
                f"incompatible AMS shape ({self.width},{self.depth}) "
                f"vs ({other.width},{other.depth})"
            )
        self.counters += other.counters
        return self

    # --------------------------------------------------------------- estimate
    def estimate_f2(self) -> float:
        sq = self.counters.astype(np.float64) ** 2
        return float(np.median(sq.sum(axis=1)))

    def relative_error_bound(self) -> float:
        """Per-row standard error of the Σ buckets² estimator."""
        return math.sqrt(2.0 / self.width)

    # --------------------------------------------------------------- envelope
    def _params(self) -> Dict[str, Any]:
        return {"width": self.width, "depth": self.depth}

    def _payload(self) -> bytes:
        return self.counters.tobytes()

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "AMSSketch":
        c = np.frombuffer(payload, dtype=np.int64).reshape(
            params["depth"], params["width"]
        ).copy()
        return cls(params["width"], params["depth"], _counters=c)

    def memory_bytes(self) -> int:
        return int(self.counters.nbytes)

    def __repr__(self) -> str:
        return f"AMSSketch(w={self.width}, d={self.depth}, F2≈{self.estimate_f2():.1f})"
