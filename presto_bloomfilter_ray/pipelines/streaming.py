"""Stream-shaped ingestion: incremental state in per-bucket actors.

Ray Data is a batch engine; for stream-shaped semantics the documented
pattern is an ordered, partitioned log consumed incrementally with
state held in actors — one actor per key-hash bucket, fed batches as
the stream arrives. This module implements that shape honestly:

* the Dataset is consumed with ``iter_batches`` (streaming pull with
  backpressure, never materialized);
* each batch is split by key-hash bucket (vectorized) and shipped to
  its bucket's actor, which updates running aggregates (count, sum)
  and a per-key HLL distinct sketch IN PLACE — state survives across
  batches, exactly what ``map_batches`` tasks cannot do;
* ``ingest`` futures are pipelined (not awaited per batch) so actors
  work concurrently with the read; a final barrier drains them.

Ordering note: per-actor mailbox order preserves the arrival order of
batches from the single consumer, which is the Dataset's block order —
sort the Dataset by ts upstream when event-time order matters.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

import ray

from ..sketches.hashing import hash64


@ray.remote
class BucketState:
    """Running per-key aggregates + distinct sketch for one bucket."""

    def __init__(self, hll_precision: int = 12):
        from ..sketches import HyperLogLog

        self._hll_cls = HyperLogLog
        self._p = hll_precision
        self.count: Dict = {}
        self.total: Dict = {}
        self.distinct: Dict = {}

    def ingest(self, keys: np.ndarray, values: np.ndarray,
               distinct_items: List) -> int:
        uniq, inv = np.unique(keys, return_inverse=True)
        cnts = np.bincount(inv)
        sums = np.bincount(inv, weights=values)
        for i, k in enumerate(uniq.tolist()):
            self.count[k] = self.count.get(k, 0) + int(cnts[i])
            self.total[k] = self.total.get(k, 0.0) + float(sums[i])
        # per-key distinct sketch update (vectorized within key runs)
        order = np.argsort(inv, kind="stable")
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(inv[order])) + 1,
                                 [len(order)]))
        items = np.asarray(distinct_items, dtype=object)
        for j in range(len(bounds) - 1):
            rows = order[bounds[j] : bounds[j + 1]]
            k = keys[rows[0]]
            sk = self.distinct.get(k)
            if sk is None:
                sk = self.distinct[k] = self._hll_cls(self._p)
            sk.update_arrow(pa.array(list(items[rows]), type=pa.large_string()))
        return len(keys)

    def snapshot(self) -> Dict:
        return {
            k: {"n": self.count[k], "sum": self.total[k],
                "distinct_est": float(self.distinct[k].estimate())}
            for k in self.count
        }


def stream_aggregate(ds, key_col: str, value_col: str, distinct_col: str,
                     n_buckets: int = 8, batch_size: int = 8192,
                     max_in_flight: int = 32) -> Dict:
    """Consume ``ds`` as a stream into ``n_buckets`` stateful actors;
    returns the merged final per-key snapshot. Ray must be initialized.
    """
    actors = [BucketState.remote() for _ in range(n_buckets)]
    pending: List = []
    for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        keys = np.asarray(batch.column(key_col))
        vals = np.asarray(batch.column(value_col), dtype=np.float64)
        # canonical string form for the distinct column (vectorized cast
        # — the reference element model: every element is a byte string,
        # non-string inputs CAST first), so int keys hash like varchar
        items = np.asarray(
            batch.column(distinct_col).cast(pa.large_string()))
        buckets = hash64(batch.column(key_col).cast(pa.large_string()),
                         0x57AB1E) % np.uint64(n_buckets)
        for b in range(n_buckets):
            sel = np.flatnonzero(buckets == b)
            if sel.size == 0:
                continue
            pending.append(actors[b].ingest.remote(
                keys[sel], vals[sel], [items[i] for i in sel]))
        # bounded pipeline: don't let unacked ingests pile up unboundedly
        if len(pending) > max_in_flight:
            done, pending = pending[:-max_in_flight], pending[-max_in_flight:]
            ray.get(done)
    ray.get(pending)  # drain
    merged: Dict = {}
    for snap in ray.get([a.snapshot.remote() for a in actors]):
        merged.update(snap)  # buckets partition the key space — no overlap
    for a in actors:
        ray.kill(a)
    return merged
