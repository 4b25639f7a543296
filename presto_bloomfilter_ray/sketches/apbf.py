"""Age-partitioned Bloom filter — sliding-window membership.

The reference's filter remembers forever: there is no way to ask "was
this key seen in the last W hours?" without rebuilding from scratch
(the persist-service round-trip exists partly to rotate filters by
hand, ``/root/reference/persist-service/server.go``). Age-partitioned /
generational Bloom filters (Shtul, Almeida, Baquero, "Age-Partitioned
Bloom Filters", 2021; the generational simplification is standard
streaming practice) make expiry structural:

* the filter is a map ``epoch → plain Bloom stage`` (this library's
  :class:`~presto_bloomfilter_ray.sketches.bloom.BloomFilter`, same
  reference formulas and KM double hashing, pre-filter off). An epoch
  is any monotone time bucket — hour, day, watermark tick;
* ``update_at(epoch, col)`` inserts into that epoch's stage — so a
  SINGLE ``map_batches`` pass over an event table builds the whole
  windowed structure, each row routed to its time-derived epoch (no
  per-epoch passes, no driver loop);
* ``contains_many`` consults only epochs inside the window
  ``(current - generations, current]`` — older epochs are dead weight
  until trimmed, never probe targets;
* ``advance(to_epoch)`` moves the window and DROPS stages that fell
  out — expiry frees memory and, unlike a TTL on top of a plain
  filter, removes the expired keys' bits entirely;
* **merge unions the epoch maps** (same-epoch stages OR together,
  ``current = max``) and deliberately does NOT trim — trimming inside
  merge would make the result depend on merge order. OR-per-epoch +
  dict-union + max are all associative and commutative, so the
  standard combine tree yields bit-identical results under any
  grouping; callers trim once via ``advance`` at finalize.

Per-window guarantee: a key inserted at epoch e reads present while
``e`` is in the window (no false negatives — structural), reads absent
after it expires up to the compound FPP of the ≤ g retained stages
(≤ g·p), and its bits are physically gone once trimmed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .base import Sketch, register
from .bloom import BloomFilter

KIND_APBF = 16  # 15 is IBLT


@register(KIND_APBF)
class AgePartitionedBloom(Sketch):
    __slots__ = ("g", "n", "p", "current", "stages")

    def __init__(
        self,
        generations: int = 4,
        per_gen_insertions: int = 1_000_000,
        fpp: float = 0.001,
        _current: int = 0,
        _stages: Optional[Dict[int, BloomFilter]] = None,
    ):
        if generations < 1:
            raise ValueError(f"generations must be >= 1, got {generations}")
        self.g = int(generations)
        self.n = int(per_gen_insertions)
        self.p = float(fpp)
        self.current = int(_current)
        self.stages: Dict[int, BloomFilter] = _stages if _stages is not None \
            else {}

    def _stage(self, epoch: int) -> BloomFilter:
        st = self.stages.get(epoch)
        if st is None:
            st = BloomFilter(self.n, self.p, use_pre_filter=False)
            self.stages[epoch] = st
        return st

    # ------------------------------------------------------------------ api
    def update_at(self, epoch: int, array) -> "AgePartitionedBloom":
        """Insert a column into a specific epoch's stage (the batch-
        routing surface: derive epoch from the rows' own timestamps)."""
        epoch = int(epoch)
        self._stage(epoch).update_arrow(array)
        if epoch > self.current:
            self.current = epoch
        return self

    def update_arrow(self, array) -> "AgePartitionedBloom":
        """Insert into the CURRENT epoch (streaming-ingest surface)."""
        return self.update_at(self.current, array)

    def _window(self):
        lo = self.current - self.g
        return [st for e, st in self.stages.items() if lo < e <= self.current]

    def contains_many(self, array) -> np.ndarray:
        """Membership within the window (last ``generations`` epochs)."""
        import pyarrow as pa

        ca = array if isinstance(array, (pa.Array, pa.ChunkedArray)) \
            else pa.array(array)
        out = np.zeros(len(ca), dtype=bool)
        for st in self._window():
            out |= st.contains_many(ca)
            if out.all():
                break
        return out

    def might_contain(self, element) -> bool:
        if element is None:
            return False
        import pyarrow as pa

        return bool(self.contains_many(pa.array([element]))[0])

    def advance(self, to_epoch: Optional[int] = None) -> "AgePartitionedBloom":
        """Move the window forward (default: one epoch) and DROP stages
        that fell out — expired keys' bits are physically removed."""
        self.current = int(to_epoch) if to_epoch is not None \
            else self.current + 1
        lo = self.current - self.g
        for e in [e for e in self.stages if e <= lo]:
            del self.stages[e]
        return self

    def merge(self, other: "AgePartitionedBloom") -> "AgePartitionedBloom":
        """Epoch-map union: same-epoch OR, ``current = max``. No trim —
        see the module docstring for why (merge-order independence)."""
        if not isinstance(other, AgePartitionedBloom):
            raise TypeError("can only merge AgePartitionedBloom with same")
        if (self.g, self.n, self.p) != (other.g, other.n, other.p):
            raise ValueError(
                f"incompatible APBF params: (g={self.g},n={self.n},"
                f"p={self.p}) vs (g={other.g},n={other.n},p={other.p})")
        for e, st in other.stages.items():
            mine = self.stages.get(e)
            if mine is None:
                cp = BloomFilter(self.n, self.p, use_pre_filter=False)
                cp.bits = st.bits.copy()
                self.stages[e] = cp
            else:
                np.bitwise_or(mine.bits, st.bits, out=mine.bits)
        self.current = max(self.current, other.current)
        return self

    def window_fpp_bound(self) -> float:
        """Compound FPP over the retained window stages: ≤ g·p."""
        return min(1.0, len(self._window()) * self.p)

    def estimated_size_bytes(self) -> int:
        return sum((st.m + 7) // 8 for st in self.stages.values())

    # ---------------------------------------------------------- envelope
    def _params(self) -> Dict[str, Any]:
        return {"g": self.g, "n": self.n, "p": self.p,
                "cur": self.current,
                "epochs": sorted(int(e) for e in self.stages)}

    def _payload(self) -> bytes:
        return b"".join(self.stages[e].bits.tobytes()
                        for e in sorted(self.stages))

    @classmethod
    def _from_parts(cls, params: Dict[str, Any],
                    payload: bytes) -> "AgePartitionedBloom":
        obj = cls(params["g"], params["n"], params["p"],
                  _current=int(params["cur"]))
        buf = np.frombuffer(payload, dtype=np.uint64)
        off = 0
        for e in params["epochs"]:
            st = BloomFilter(obj.n, obj.p, use_pre_filter=False)
            nw = (st.m + 63) // 64
            st.bits = buf[off:off + nw].copy()
            off += nw
            obj.stages[int(e)] = st
        return obj

    def __repr__(self) -> str:
        return (f"AgePartitionedBloom(g={self.g}, n={self.n}, p={self.p}, "
                f"current={self.current}, epochs={sorted(self.stages)})")
