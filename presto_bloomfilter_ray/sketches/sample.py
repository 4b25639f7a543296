"""BottomKSample — mergeable deterministic uniform sample.

Training-data pipelines need "show me a uniform sample of the corpus"
as a mergeable aggregate (inspect k docs out of 10^12 without a global
shuffle). This is the KMV/bottom-k construction the Theta sketch uses
(`theta.py`), but carrying the VALUES alongside the hashes: keep the k
items whose 64-bit content hashes are smallest. Properties:

* **Mergeable + associative**: union of bottom-k sets → bottom-k of the
  union; any merge tree yields the same result.
* **Deterministic**: the sample is a pure function of the item SET
  (hash order), independent of partitioning, batch order, or cluster
  size — re-runs reproduce it exactly.
* **Uniform**: items are ranked by a uniform hash, so the k kept items
  are a uniform-without-replacement sample of the distinct items.

Duplicates collapse (same item → same hash): it samples the DISTINCT
item set, like ``ORDER BY hash(x) LIMIT k``.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from .base import Sketch, register
from .hashing import hash64, normalize_elements

KIND_SAMPLE = 8  # 7 is taken by ThetaSketch


@register(KIND_SAMPLE)
class BottomKSample(Sketch):
    __slots__ = ("k", "hashes", "values")

    def __init__(self, k: int = 100,
                 _hashes: np.ndarray | None = None,
                 _values: List[str] | None = None):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        # parallel arrays sorted by hash ascending; values are the
        # canonical string forms of the sampled items
        self.hashes = (_hashes if _hashes is not None
                       else np.zeros(0, dtype=np.uint64))
        self.values: List[str] = _values if _values is not None else []

    def _absorb(self, h: np.ndarray, vals: List[str]) -> None:
        if len(h) == 0:
            return
        all_h = np.concatenate([self.hashes, h.astype(np.uint64)])
        all_v = self.values + list(vals)
        order = np.argsort(all_h, kind="stable")
        all_h = all_h[order]
        all_v = [all_v[i] for i in order]
        keep = np.ones(len(all_h), dtype=bool)
        if len(all_h) > 1:
            keep[1:] = np.diff(all_h) != 0  # dedupe identical items
        idx = np.flatnonzero(keep)[: self.k]
        self.hashes = all_h[idx]
        self.values = [all_v[i] for i in idx]

    def update_arrow(self, array) -> "BottomKSample":
        import pyarrow as pa

        ca = normalize_elements(array)
        if len(ca) == 0:
            return self
        h = hash64(ca, 0x5A3B1E)
        arr = ca.combine_chunks()
        # dedupe hashes FIRST (duplicates collapse), then keep the k
        # smallest UNIQUE hashes — trimming before deduping would let
        # duplicate-heavy batches crowd out distinct items, breaking
        # the partitioning-invariance contract. np.unique returns the
        # sorted unique hashes plus the first row index of each, so at
        # most k rows pay the python value materialization.
        uh, first_idx = np.unique(h, return_index=True)
        if len(uh) > self.k:
            uh = uh[: self.k]
            first_idx = first_idx[: self.k]
        arr = arr.take(pa.array(first_idx.astype(np.int64)))
        self._absorb(uh, arr.to_pylist())
        return self

    def merge(self, other: "BottomKSample") -> "BottomKSample":
        if self.k != other.k:
            raise ValueError("incompatible sample k")
        self._absorb(other.hashes, other.values)
        return self

    def sample(self) -> List[str]:
        return list(self.values)

    def estimate(self) -> float:  # sketch-protocol convenience
        return float(len(self.values))

    def _params(self) -> Dict[str, Any]:
        return {"k": self.k, "n_kept": len(self.values)}

    def _payload(self) -> bytes:
        import json

        return (self.hashes.astype("<u8").tobytes()
                + json.dumps(self.values, ensure_ascii=False).encode())

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "BottomKSample":
        import json

        n = int(params["n_kept"])
        hashes = np.frombuffer(payload[: n * 8], dtype="<u8").copy()
        values = json.loads(payload[n * 8:].decode()) if len(payload) > n * 8 else []
        return cls(params["k"], _hashes=hashes, _values=values)

    def __repr__(self) -> str:
        return f"BottomKSample(k={self.k}, kept={len(self.values)})"
