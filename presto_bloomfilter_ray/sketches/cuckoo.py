"""Cuckoo filter — set membership with deletion at ~½ the space of Bloom.

The reference's filter (``/root/reference/src/main/java/com/facebook/
presto/bloomfilter/BloomFilter.java``) answers the same question this
sketch does — "might this element be in the set?" with no false
negatives — but is insert-only and pays ``-n·ln p/(ln 2)²`` bits.
The cuckoo filter (Fan, Andersen, Kaminsky, Mitzenmacher,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014 — public
literature) stores short fingerprints in a 2-choice bucketed hash
table instead of bits in a Bloom array:

* each element ``x`` gets a nonzero ``fp_bits``-bit fingerprint and two
  candidate buckets ``i1 = h(x) & mask`` and
  ``i2 = i1 XOR spread(fp) & mask`` (partial-key cuckoo hashing: the
  alternate bucket is computable from *(bucket, fingerprint)* alone,
  so relocation and merge never need the original element);
* insert places ``fp`` in any free slot of ``i1``/``i2``, evicting and
  relocating a resident fingerprint when both are full (cuckoo kicks);
* ``contains`` scans the ≤ ``2·bucket_size`` slots of the two buckets —
  no false negatives, FPP ≤ ``2·bucket_size / 2^fp_bits``;
* **delete removes one stored copy of the fingerprint** — the CBF
  contract (:mod:`~presto_bloomfilter_ray.sketches.cbf`) without 16-bit
  counters per position: deleting a never-inserted element is a caller
  violation, clipped and counted in ``underflows``;
* **merge re-inserts the other table's occupied slots**. Because the
  alternate-bucket map is an involution, every stored ``(bucket, fp)``
  pair identifies its legal bucket pair, so the merged filter holds the
  exact multiset union of fingerprint/pair entries: ``contains`` is
  MERGE-ORDER-INVARIANT across any combine-tree shape. (Physical slot
  layout — and therefore envelope bytes — may differ between trees;
  unlike Bloom/CBF we document membership invariance, not byte
  invariance.) Merge raises loudly if the union exceeds capacity.

Sizing: ``nb = next_pow2(n / (bucket_size · 0.95))`` buckets (0.95 is
the published safe load for ``bucket_size=4``). ``fp_bits`` ∈ {8, 16,
32}; the default 16 gives FPP ≈ 1.2e-4 at 4 slots/bucket. Use 32 when
an exactness-grade bound is needed (FPP ≈ 1.9e-9, still half a Bloom
filter at p=1e-9 per held element).

Everything is vectorized over Arrow columns: hashing once per column
(:func:`~presto_bloomfilter_ray.sketches.hashing.hash64`), then
*rounds* of grouped scatter placement — per round, every pending
fingerprint whose current bucket has room is placed in one shot
(argsort + run-rank), leftovers flip to their alternate bucket, and at
most one eviction per distinct bucket resolves the stragglers. No
per-row Python anywhere; rounds are bounded and failure is loud.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .base import Sketch, register
from .hashing import SEED_H1, hash64, normalize_elements

KIND_CUCKOO = 17  # 16 is AgePartitionedBloom

#: published safe load factor for bucket_size=4 (Fan et al. §5.1)
_TARGET_LOAD = 0.95
#: spread multiplier for the partial-key alternate index (odd 64-bit
#: constant — golden-ratio mix, same family as splitmix64's increment)
_FP_SPREAD = np.uint64(0x9E3779B97F4A7C15)
#: independent seed for the fingerprint hash (decorrelated from the
#: bucket-index hash; sharing SEED_H1 would correlate fp with i1)
SEED_FP = 0xC2B2AE3D27D4EB4F


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


@register(KIND_CUCKOO)
class CuckooFilter(Sketch):
    __slots__ = ("n", "fp_bits", "bucket_size", "nb", "_mask", "table",
                 "occupancy", "underflows", "kicks")

    #: eviction rounds before declaring the table over-full. The random
    #: walk at load ≤ 0.95 resolves in a handful of kicks; hundreds of
    #: rounds means the caller overfilled the filter (or inserted one
    #: fingerprint-pair > 2·bucket_size times) — fail loudly, never spin.
    MAX_ROUNDS = 500

    def __init__(
        self,
        expected_insertions: int = 10_000_000,
        fp_bits: int = 16,
        bucket_size: int = 4,
        _table: Optional[np.ndarray] = None,
    ):
        if fp_bits not in (8, 16, 32):
            raise ValueError(f"fp_bits must be 8, 16 or 32, got {fp_bits}")
        if bucket_size < 1:
            raise ValueError("bucket_size must be >= 1")
        self.n = int(expected_insertions)
        self.fp_bits = int(fp_bits)
        self.bucket_size = int(bucket_size)
        self.nb = _next_pow2(
            max(2, int(np.ceil(self.n / (self.bucket_size * _TARGET_LOAD))))
        )
        self._mask = np.uint64(self.nb - 1)
        dtype = {8: np.uint8, 16: np.uint16, 32: np.uint32}[self.fp_bits]
        if _table is not None:
            self.table = _table
        else:
            self.table = np.zeros((self.nb, self.bucket_size), dtype=dtype)
        # compactness invariant: occupied slots sit at the front of each
        # bucket row — placement appends, deletion back-fills the hole,
        # eviction replaces in place. Lets every placement pass compute
        # its target slot as occupancy + within-bucket rank.
        self.occupancy = np.count_nonzero(self.table, axis=1).astype(np.int64)
        self.underflows = 0  # deletes of absent fingerprints (observability)
        self.kicks = 0  # total evictions (observability)

    # ----------------------------------------------------------- hashing
    def _fingerprints(self, ca) -> np.ndarray:
        """Nonzero fp_bits-bit fingerprints for a normalized column."""
        h = hash64(ca, SEED_FP)
        space = np.uint64((1 << self.fp_bits) - 1)  # fp ∈ [1, 2^b - 1]
        return (h % space + np.uint64(1)).astype(self.table.dtype)

    def _index1(self, ca) -> np.ndarray:
        return (hash64(ca, SEED_H1) & self._mask).astype(np.int64)

    def _alt(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Partial-key alternate bucket: involutive in ``idx`` for fixed
        ``fp`` (XOR with a value derived from the fingerprint alone)."""
        spread = (fp.astype(np.uint64) * _FP_SPREAD) & self._mask
        return (idx.astype(np.uint64) ^ spread).astype(np.int64)

    # --------------------------------------------------------- placement
    def _place_pass(self, fp: np.ndarray, idx: np.ndarray):
        """One vectorized placement round: every pending fingerprint
        whose bucket has room is stored (grouped append at
        occupancy+rank); returns the leftover (fp, idx)."""
        order = np.argsort(idx, kind="stable")
        b = idx[order]
        first = np.empty(b.size, dtype=bool)
        first[0] = True
        np.not_equal(b[1:], b[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        run_len = np.diff(np.append(starts, b.size))
        rank = np.arange(b.size, dtype=np.int64) - np.repeat(starts, run_len)
        can = rank < (self.bucket_size - self.occupancy[b])
        sel = order[can]
        if sel.size:
            slot = self.occupancy[idx[sel]] + rank[can]
            self.table[idx[sel], slot] = fp[sel]
            np.add.at(self.occupancy, idx[sel], 1)
        rest = order[~can]
        return fp[rest], idx[rest]

    def _insert_pairs(self, fp: np.ndarray, idx: np.ndarray) -> None:
        """Insert fingerprints whose CURRENT legal bucket is ``idx``
        (the other candidate is always recoverable via ``_alt``).
        Shared by column insert and merge.

        The eviction loop is a batched cuckoo random walk. Two rules
        make it terminate at legal loads: (1) a walk item that fails to
        place STAYS at its current bucket so next round it evicts
        *there* — flipping it back would oscillate inside the initial
        full cluster forever instead of advancing the walk; (2) the
        victim slot is drawn from a deterministic seeded generator
        (standard cuckoo practice): varied choices break ping-pong
        cycles while keeping a fixed build order byte-reproducible.
        """
        if fp.size == 0:
            return
        fp, idx = self._place_pass(fp, idx)
        if fp.size:  # second candidate bucket
            fp, idx = self._place_pass(fp, self._alt(idx, fp))
        rounds = 0
        rng = np.random.default_rng(0xCC_F17 ^ fp.size)
        while fp.size:
            rounds += 1
            if rounds > self.MAX_ROUNDS:
                raise RuntimeError(
                    f"CuckooFilter over capacity: {fp.size} fingerprints "
                    f"unplaced after {self.MAX_ROUNDS} eviction rounds "
                    f"(load {self.load_factor():.3f}, nb={self.nb}, "
                    f"bucket_size={self.bucket_size}); size the filter for "
                    f"the real insertion count or merge smaller fills"
                )
            # one eviction per distinct full bucket: swap a resident out,
            # the pending fp takes its slot, the victim re-enters the
            # pending set at ITS alternate bucket (the walk advances).
            uniq_b, first_pos = np.unique(idx, return_index=True)
            vslot = rng.integers(0, self.bucket_size, size=uniq_b.size)
            victims = self.table[uniq_b, vslot].copy()
            self.table[uniq_b, vslot] = fp[first_pos]
            self.kicks += int(uniq_b.size)
            keep = np.ones(fp.size, dtype=bool)
            keep[first_pos] = False
            # victims were resident → occupied → nonzero fingerprints
            new_fp = np.concatenate([fp[keep], victims])
            new_idx = np.concatenate([idx[keep], self._alt(uniq_b, victims)])
            fp, idx = self._place_pass(new_fp, new_idx)

    # ------------------------------------------------------------ updates
    def update_arrow(self, array) -> "CuckooFilter":
        """Insert every non-null, non-empty element (reference null/empty
        skip semantics, ``BloomFilter.java:159-167``)."""
        ca = normalize_elements(array, drop_empty=True)
        if len(ca) == 0:
            return self
        self._insert_pairs(self._fingerprints(ca), self._index1(ca))
        return self

    def remove_arrow(self, array) -> "CuckooFilter":
        """Delete one stored copy per element (caller contract: each was
        inserted at least as many times as removed; violations are
        dropped and counted in ``underflows``)."""
        ca = normalize_elements(array, drop_empty=True)
        if len(ca) == 0:
            return self
        fp = self._fingerprints(ca)
        idx = self._index1(ca)
        tried_alt = np.zeros(fp.size, dtype=bool)
        while fp.size:
            # match = first slot holding fp in the current bucket
            rows = self.table[idx]  # (pending, bucket_size) gather
            hitmat = rows == fp[:, None]
            has = hitmat.any(axis=1)
            slot = hitmat.argmax(axis=1)
            # at most one deletion per distinct bucket per round —
            # concurrent holes in one bucket would race the back-fill
            hit_i = np.flatnonzero(has)
            if hit_i.size:
                _, first_pos = np.unique(idx[hit_i], return_index=True)
                act = hit_i[first_pos]
                b, s = idx[act], slot[act]
                last = self.occupancy[b] - 1
                self.table[b, s] = self.table[b, last]
                self.table[b, last] = 0
                self.occupancy[b] = last
                done = np.zeros(fp.size, dtype=bool)
                done[act] = True
            else:
                done = np.zeros(fp.size, dtype=bool)
            # misses flip to the alternate bucket once; a second miss is
            # an absent fingerprint → underflow, drop
            miss = ~has & ~done
            give_up = miss & tried_alt
            if give_up.any():
                self.underflows += int(give_up.sum())
            flip = miss & ~tried_alt
            idx = np.where(flip, self._alt(idx, fp), idx)
            tried_alt = tried_alt | flip
            keep = ~done & ~give_up
            fp, idx, tried_alt = fp[keep], idx[keep], tried_alt[keep]
        return self

    def put(self, element) -> None:
        if element is None:
            return
        import pyarrow as pa

        self.update_arrow(pa.array([element]))

    def remove(self, element) -> None:
        if element is None:
            return
        import pyarrow as pa

        self.remove_arrow(pa.array([element]))

    # ------------------------------------------------------------- probes
    def contains_many(self, array) -> np.ndarray:
        """Vectorized membership aligned with the input column; null
        probes → False (``BloomFilterContainsScalarFunction.java:38-40``)."""
        import pyarrow as pa

        if isinstance(array, pa.ChunkedArray):
            ca = array
        elif isinstance(array, pa.Array):
            ca = pa.chunked_array([array])
        else:
            ca = pa.chunked_array([pa.array(array)])
        t = ca.type
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)
                or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
            ca = ca.cast(pa.large_string())
        n_rows = len(ca)
        out = np.zeros(n_rows, dtype=bool)
        if n_rows == 0:
            return out
        valid = ~np.asarray(ca.is_null())
        if not valid.any():
            return out
        filled = ca.fill_null("")
        fp = self._fingerprints(filled)
        i1 = self._index1(filled)
        i2 = self._alt(i1, fp)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        return hit & valid

    def might_contain(self, element) -> bool:
        if element is None:
            return False
        import pyarrow as pa

        return bool(self.contains_many(pa.array([element]))[0])

    # ------------------------------------------------------------ algebra
    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Union by re-inserting the other's occupied (bucket, fp) slots
        — membership merge-order-invariant (see module docstring); raises
        loudly when the union would overfill the table."""
        if not isinstance(other, CuckooFilter):
            raise TypeError("can only merge CuckooFilter with CuckooFilter")
        if (self.nb, self.bucket_size, self.fp_bits) != (
            other.nb, other.bucket_size, other.fp_bits
        ):
            raise ValueError(
                f"merge requires identical shape: (nb,b,f)="
                f"({self.nb},{self.bucket_size},{self.fp_bits}) vs "
                f"({other.nb},{other.bucket_size},{other.fp_bits})"
            )
        occ_b, occ_s = np.nonzero(other.table)
        if occ_b.size:
            self._insert_pairs(other.table[occ_b, occ_s], occ_b.astype(np.int64))
        self.underflows += other.underflows
        return self

    # ---------------------------------------------------------- accessors
    def approx_element_count(self) -> int:
        """Exact count of stored fingerprints (cuckoo stores items, not
        bits — insert/delete keep this exact absent underflows)."""
        return int(self.occupancy.sum())

    def load_factor(self) -> float:
        return float(self.occupancy.sum()) / float(self.nb * self.bucket_size)

    def get_expected_insertions(self) -> int:
        return self.n

    def get_false_positive_percentage(self) -> float:
        """Published bound: a non-member collides with ≤ 2·bucket_size
        stored fingerprints drawn from 2^fp_bits - 1 values."""
        return (2.0 * self.bucket_size) / float((1 << self.fp_bits) - 1)

    def memory_bytes(self) -> int:
        return int(self.table.nbytes)

    # ------------------------------------------------------------ envelope
    def _params(self) -> Dict[str, Any]:
        return {"n": self.n, "f": self.fp_bits, "b": self.bucket_size}

    def _payload(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "CuckooFilter":
        dtype = {8: np.uint8, 16: np.uint16, 32: np.uint32}[params["f"]]
        table = np.frombuffer(payload, dtype=dtype).copy()
        table = table.reshape(-1, params["b"])
        return cls(params["n"], params["f"], params["b"], _table=table)
