"""KLL — mergeable quantile sketch with published rank-error bounds.

North_rule companion (no reference analog). Built to the published KLL
algorithm (Karnin, Lang, Liberty 2016): a ladder of compactors where
level h holds items of weight 2^h and capacity k*c^(depth-1-h)
(c = 2/3); a full level sorts and keeps every other item, promoting
them one level up. Compaction offsets alternate deterministically (a
per-sketch flip bit) so results are reproducible across processes —
the randomized offset of the paper is only needed for adversarial
inputs.

Merge = concatenate level-wise + recompress; estimates are within the
published epsilon across arbitrary merge trees (property-tested).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np

from .base import KIND_KLL, Sketch, register

_C = 2.0 / 3.0


@register(KIND_KLL)
class KLL(Sketch):
    __slots__ = ("k", "levels", "n", "_flip")

    def __init__(self, k: int = 200, _levels: Optional[List[np.ndarray]] = None,
                 _n: int = 0, _flip: int = 0):
        self.k = int(k)
        self.levels: List[np.ndarray] = _levels if _levels is not None else [
            np.zeros(0, dtype=np.float64)
        ]
        self.n = int(_n)
        self._flip = int(_flip)

    def _cap(self, h: int) -> int:
        depth = len(self.levels)
        return max(2, int(math.ceil(self.k * (_C ** (depth - 1 - h)))))

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if self.levels[h].size > self._cap(h):
                buf = np.sort(self.levels[h], kind="stable")
                off = self._flip
                self._flip ^= 1
                keep_odd = buf[off::2]  # every other item → weight doubles
                if buf.size % 2 == 1:
                    # odd size: one item has no pair partner; it stays at
                    # this level at weight 2^h so total retained weight
                    # equals n in BOTH offset branches (off==0 leaves the
                    # last item unpaired, off==1 the first)
                    if off == 0:
                        promoted, leftover = keep_odd[:-1], buf[-1:]
                    else:
                        promoted, leftover = keep_odd, buf[:1]
                else:
                    promoted, leftover = keep_odd, np.zeros(0)
                self.levels[h] = leftover
                if h + 1 == len(self.levels):
                    self.levels.append(np.zeros(0, dtype=np.float64))
                self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            h += 1

    def update_arrow(self, array) -> "KLL":
        import pyarrow as pa

        if isinstance(array, (pa.Array, pa.ChunkedArray)):
            arr = array
            if arr.null_count:
                arr = arr.drop_null()
            vals = np.asarray(arr.cast(pa.float64()))
        else:
            vals = np.asarray(array, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return self
        self.n += vals.size
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compress()
        return self

    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("incompatible KLL k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
        for h, lv in enumerate(other.levels):
            if lv.size:
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self._compress()
        return self

    def _weighted(self):
        vals = np.concatenate([lv for lv in self.levels if lv.size] or [np.zeros(0)])
        wts = np.concatenate(
            [np.full(lv.size, 1 << h, dtype=np.float64)
             for h, lv in enumerate(self.levels) if lv.size] or [np.zeros(0)]
        )
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, q) -> np.ndarray | float:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        vals, wts = self._weighted()
        if vals.size == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if scalar else out
        cum = np.cumsum(wts)
        ranks = np.clip(qs, 0, 1) * cum[-1]
        idx = np.clip(np.searchsorted(cum, ranks, side="left"), 0, vals.size - 1)
        out = vals[idx]
        return float(out[0]) if scalar else out

    def rank_error_bound(self) -> float:
        """Published epsilon ~ 2.296/k for the c=2/3 ladder (single-pass
        constant from the KLL paper's analysis; tests add slack)."""
        return 2.296 / self.k

    def _params(self) -> Dict[str, Any]:
        return {"k": self.k, "n": self.n, "sizes": [int(lv.size) for lv in self.levels],
                "flip": self._flip}

    def _payload(self) -> bytes:
        return b"".join(lv.tobytes() for lv in self.levels)

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "KLL":
        buf = np.frombuffer(payload, dtype=np.float64)
        levels, off = [], 0
        for size in params["sizes"]:
            levels.append(buf[off : off + size].copy())
            off += size
        return cls(params["k"], _levels=levels, _n=params["n"], _flip=params.get("flip", 0))

    def __repr__(self) -> str:
        return f"KLL(k={self.k}, n={self.n}, levels={len(self.levels)})"
