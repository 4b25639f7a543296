"""Misra–Gries heavy-hitters summary — mergeable top-k WITH items.

North-rule companion sketch (no reference analog). The library's
CountMin estimates a GIVEN item's frequency but cannot enumerate the
heavy hitters; Misra–Gries keeps the candidate item set itself.
Published guarantees (Misra & Gries 1982; mergeability per Agarwal,
Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012):

* state is ≤ k (item, counter) pairs over a stream of N items;
* every counter UNDERestimates: ``f(x) - N/k ≤ c(x) ≤ f(x)``
  (``error_bound() = N/k`` with N tracked exactly);
* every item with true frequency > N/k is guaranteed present;
* MERGE = sum counters item-wise, then subtract the (k+1)-th largest
  combined counter from all and drop the non-positive ones — the
  summed error bounds carry over, so any merge tree keeps the
  ``N_total/k`` guarantee (ibid., Thm. 2.1). Counter VALUES are not
  bit-identical across merge orders (unlike Bloom/HLL here); the
  bound is the contract, mirroring t-digest/KLL.

Batch updates are vectorized: ``value_counts`` per Arrow batch, one
dict combine + one partition per absorb — no per-row Python in the
hot path.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .base import Sketch, register
from .hashing import normalize_elements

KIND_TOPK = 9  # 8 is BottomKSample


@register(KIND_TOPK)
class TopK(Sketch):
    __slots__ = ("k", "counts", "total")

    def __init__(self, k: int = 100,
                 _counts: Optional[Dict[str, int]] = None, _total: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.counts: Dict[str, int] = _counts if _counts is not None else {}
        self.total = int(_total)  # stream length N (exact, mergeable)

    def _absorb(self, items: List[str], cnts: np.ndarray) -> None:
        for it, c in zip(items, cnts.tolist()):
            self.counts[it] = self.counts.get(it, 0) + c
        if len(self.counts) > self.k:
            # Misra-Gries decrement, batched: subtract the (k+1)-th
            # largest counter from everyone, drop the non-positive
            vals = np.fromiter(self.counts.values(), dtype=np.int64,
                               count=len(self.counts))
            thresh = int(np.partition(vals, -(self.k + 1))[-(self.k + 1)])
            # counters only come from value_counts (>= 1) or survive the
            # > 0 filter below, so thresh >= 1 always — dropping without
            # the matching decrement would break the N/k lower-bound
            self.counts = {x: c - thresh for x, c in self.counts.items()
                           if c - thresh > 0}

    def update_arrow(self, array) -> "TopK":
        ca = normalize_elements(array)
        if len(ca) == 0:
            return self
        vc = ca.combine_chunks().value_counts()
        items = vc.field("values").to_pylist()
        cnts = np.asarray(vc.field("counts")).astype(np.int64)
        self.total += int(cnts.sum())
        self._absorb([str(x) for x in items], cnts)
        return self

    def merge(self, other: "TopK") -> "TopK":
        if self.k != other.k:
            raise ValueError("incompatible TopK k")
        self.total += other.total
        self._absorb(list(other.counts.keys()),
                     np.fromiter(other.counts.values(), dtype=np.int64,
                                 count=len(other.counts)))
        return self

    # ----------------------------------------------------------- queries
    def error_bound(self) -> float:
        """Max undercount of any counter: N/k (Misra-Gries bound)."""
        return self.total / self.k

    def top(self, n: Optional[int] = None) -> List[Tuple[str, int]]:
        """(item, lower-bound count) sorted by count desc, item asc —
        deterministic presentation order."""
        out = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return out[: n] if n is not None else out

    def estimate(self, item=None) -> float:
        if item is None:  # sketch-protocol convenience: tracked items
            return float(len(self.counts))
        return float(self.counts.get(str(item), 0))

    def guaranteed_hitters(self, phi: float) -> List[str]:
        """Items CERTAIN to have true frequency > phi*N: counter alone
        already exceeds phi*N (counters are lower bounds)."""
        cut = phi * self.total
        return [x for x, c in self.top() if c > cut]

    # ---------------------------------------------------------- envelope
    def _params(self) -> Dict[str, Any]:
        return {"k": self.k, "total": self.total, "n_kept": len(self.counts)}

    def _payload(self) -> bytes:
        import json

        items = self.top()  # canonical order
        cnt_arr = np.array([c for _, c in items], dtype="<i8").tobytes()
        names = json.dumps([x for x, _ in items], ensure_ascii=False).encode()
        return cnt_arr + names

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "TopK":
        import json

        n = int(params["n_kept"])
        cnts = np.frombuffer(payload[: n * 8], dtype="<i8")
        names = json.loads(payload[n * 8:].decode()) if len(payload) > n * 8 else []
        return cls(params["k"], _counts=dict(zip(names, cnts.tolist())),
                   _total=params["total"])

    def __repr__(self) -> str:
        return f"TopK(k={self.k}, tracked={len(self.counts)}, n={self.total})"
