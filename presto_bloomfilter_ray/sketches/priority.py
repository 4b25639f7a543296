"""PrioritySample — mergeable deterministic WEIGHTED sample.

Weighted companion to :class:`~presto_bloomfilter_ray.sketches.sample.
BottomKSample`: priority sampling (Duffield–Lund–Thorup 2007, public
literature). Each distinct item ``x`` with weight ``w(x) > 0`` gets a
priority ``q(x) = w(x) / u(x)`` where ``u(x) ∈ (0,1]`` is a uniform
hash of the item — so the k kept items are weight-biased, yet the
construction stays a pure function of the item set:

* **Mergeable + associative**: top-(k+1)-by-priority of a union equals
  top-(k+1) of the two sides' top-(k+1) sets, so any merge tree yields
  byte-identical state (same canonical sort).
* **Deterministic**: randomness comes from the item hash, independent
  of partitioning, batch order, or cluster size.
* **Unbiased subset estimator**: with threshold ``τ`` = the (k+1)-th
  priority, ``Ŵ(S) = Σ_{x ∈ sample ∩ S} max(w(x), τ)`` is unbiased for
  the true subset weight, with variance vanishing as k grows.

Contract: the weight must be a deterministic function of the item
(e.g. an order's price, a document's token count). Duplicates then
carry identical weights and collapse exactly like bottom-k; a
conflicting duplicate weight keeps the maximum (associative), which is
flagged via ``weight_conflicts`` for observability.

``wsum``/``n_rows`` accumulate over all INPUT ROWS (additive; exact up
to float-addition order, so two merge trees with the same LEAVES are
byte-identical while differently-batched builds agree to ~1e-15 rel) —
callers with distinct keys get the total weight essentially for free.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from .base import Sketch, register
from .hashing import hash64, normalize_elements

KIND_PRIORITY = 13  # 12 is FrequentDirections

_SEED_PRIO = 0xD1FF1C1E5EEDF00D


def _uniform(h: np.ndarray) -> np.ndarray:
    """uint64 hash → uniform in (0, 1] (never 0: +1 over 2^53)."""
    return ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)


@register(KIND_PRIORITY)
class PrioritySample(Sketch):
    __slots__ = ("k", "hashes", "weights", "values", "wsum", "n_rows",
                 "weight_conflicts")

    def __init__(self, k: int = 1024,
                 _hashes: Optional[np.ndarray] = None,
                 _weights: Optional[np.ndarray] = None,
                 _values: Optional[List[str]] = None,
                 _wsum: float = 0.0, _n_rows: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        # parallel arrays, canonically sorted by priority DESCENDING
        # (ties broken by hash ascending), length ≤ k+1
        self.hashes = (_hashes if _hashes is not None
                       else np.zeros(0, dtype=np.uint64))
        self.weights = (_weights if _weights is not None
                        else np.zeros(0, dtype=np.float64))
        self.values: List[str] = _values if _values is not None else []
        self.wsum = float(_wsum)
        self.n_rows = int(_n_rows)
        self.weight_conflicts = 0  # observability only; not serialized

    # ----------------------------------------------------------------- absorb
    def _absorb(self, h: np.ndarray, w: np.ndarray, vals: List[str]) -> None:
        if len(h) == 0:
            return
        all_h = np.concatenate([self.hashes, h.astype(np.uint64)])
        all_w = np.concatenate([self.weights, w.astype(np.float64)])
        all_v = self.values + list(vals)
        # dedupe by hash keeping MAX weight (associative; conflicts counted)
        order = np.lexsort((-all_w, all_h))  # hash asc, weight desc within
        all_h, all_w = all_h[order], all_w[order]
        all_v = [all_v[i] for i in order]
        keep = np.ones(len(all_h), dtype=bool)
        if len(all_h) > 1:
            dup = all_h[1:] == all_h[:-1]
            keep[1:] = ~dup
            if dup.any():
                # a dropped duplicate with a DIFFERENT weight = conflict
                conflicts = dup & (all_w[1:] != all_w[:-1])
                self.weight_conflicts += int(conflicts.sum())
        all_h, all_w = all_h[keep], all_w[keep]
        all_v = [v for v, m in zip(all_v, keep) if m]
        # rank by priority desc, tie-break hash asc → canonical order
        q = all_w / _uniform(all_h)
        order = np.lexsort((all_h, -q))[: self.k + 1]
        self.hashes = all_h[order]
        self.weights = all_w[order]
        self.values = [all_v[i] for i in order]

    def update_pairs(self, keys, weights) -> "PrioritySample":
        """Insert (item, weight) pairs from Arrow columns. Null items,
        null weights and non-positive weights are skipped."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if isinstance(weights, pa.ChunkedArray):
            weights = weights.combine_chunks()
        wts = weights.cast(pa.float64())
        valid = pc.and_(pc.is_valid(keys), pc.is_valid(wts))
        valid = pc.and_(valid, pc.greater(pc.if_else(pc.is_valid(wts), wts, 0.0), 0.0))
        mask = np.asarray(valid.fill_null(False))
        if not mask.any():
            return self
        idx = np.flatnonzero(mask)
        keys = keys.take(pa.array(idx))
        wts = wts.take(pa.array(idx))
        ca = normalize_elements(keys)
        w = np.asarray(wts.combine_chunks() if isinstance(wts, pa.ChunkedArray) else wts,
                       dtype=np.float64)
        self.wsum += float(w.sum())
        self.n_rows += len(w)
        h = hash64(ca, _SEED_PRIO)
        vals = ca.cast(pa.large_string()).to_pylist()
        self._absorb(h, w, vals)
        return self

    def update_arrow(self, array) -> "PrioritySample":
        """Struct column {item: string-like, weight: numeric} — the
        single-column surface so the sketch composes with build_sketch /
        grouped_sketch unchanged."""
        import pyarrow as pa

        if isinstance(array, pa.ChunkedArray):
            array = array.combine_chunks()
        if not pa.types.is_struct(array.type):
            raise TypeError(
                "PrioritySample.update_arrow expects a struct<item, weight> "
                "column; use update_pairs(keys, weights) for separate columns"
            )
        names = [f.name for f in array.type]
        return self.update_pairs(array.field(names[0]), array.field(names[1]))

    # ------------------------------------------------------------------ merge
    def merge(self, other: "PrioritySample") -> "PrioritySample":
        if not isinstance(other, PrioritySample):
            raise TypeError("can only merge PrioritySample with PrioritySample")
        if self.k != other.k:
            raise ValueError(f"incompatible k {self.k} vs {other.k}")
        self.wsum += other.wsum
        self.n_rows += other.n_rows
        self._absorb(other.hashes, other.weights, other.values)
        return self

    # -------------------------------------------------------------- estimates
    def threshold(self) -> float:
        """τ = the (k+1)-th priority (0 if fewer than k+1 items seen)."""
        if len(self.hashes) <= self.k:
            return 0.0
        q = self.weights / _uniform(self.hashes)
        return float(q[-1])  # canonical order: last row is the (k+1)-th

    def sample(self) -> List[str]:
        return self.values[: self.k]

    def sample_weights(self) -> np.ndarray:
        """Horvitz–Thompson adjusted weights max(w, τ) for the k sample
        items — Σ over any subset estimates that subset's true weight."""
        w = self.weights[: self.k]
        return np.maximum(w, self.threshold())

    def estimate_subset(self, predicate) -> float:
        """Ŵ({x : predicate(x)}) from the sample (predicate over the
        canonical string form)."""
        adj = self.sample_weights()
        return float(sum(a for v, a in zip(self.values[: self.k], adj)
                         if predicate(v)))

    def total_weight(self) -> float:
        """EXACT Σ of input-row weights (additive across merges)."""
        return self.wsum

    # --------------------------------------------------------------- envelope
    def _params(self) -> Dict[str, Any]:
        return {"k": self.k, "wsum": self.wsum, "n": self.n_rows}

    def _payload(self) -> bytes:
        import json

        head = self.hashes.tobytes() + self.weights.tobytes()
        vals = json.dumps(self.values, ensure_ascii=False).encode()
        n = np.uint32(len(self.hashes)).tobytes()
        return n + head + vals

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "PrioritySample":
        import json

        n = int(np.frombuffer(payload[:4], dtype=np.uint32)[0])
        off = 4
        hashes = np.frombuffer(payload[off: off + 8 * n], dtype=np.uint64).copy()
        off += 8 * n
        weights = np.frombuffer(payload[off: off + 8 * n], dtype=np.float64).copy()
        off += 8 * n
        values = json.loads(payload[off:].decode())
        return cls(params["k"], _hashes=hashes, _weights=weights,
                   _values=values, _wsum=params["wsum"], _n_rows=params["n"])

    def memory_bytes(self) -> int:
        return int(self.hashes.nbytes + self.weights.nbytes
                   + sum(len(v) for v in self.values))

    def __repr__(self) -> str:
        return (f"PrioritySample(k={self.k}, kept={len(self.hashes)}, "
                f"wsum={self.wsum:.1f})")
