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


@ray.remote
class WindowBucketState:
    """Per-bucket tumbling-window state with WATERMARK finalization.

    The streaming-window property this adds over ``BucketState``:
    state is BOUNDED — windows whose end falls at or before the
    watermark are finalized (emitted and dropped from memory), and
    events arriving for an already-finalized window are counted as
    late instead of corrupting emitted results. State is COLUMNAR (a
    polars frame keyed by (key, window)): each ingest is one
    vectorized group_by over the slice, and partials fold into the
    state with one amortized concat+group_by — no per-(key, window)
    Python, even at ~10⁶ distinct pairs per batch."""

    #: compact the pending per-ingest partials into ``state`` once
    #: they outgrow this many rows — keeps each ingest O(batch) and
    #: the (amortized) merge one vectorized group_by, never per-pair
    _COMPACT_ROWS = 262_144

    def __init__(self, size_us: int):
        import polars as pl

        self.size = int(size_us)
        self._schema = {"k": pl.Utf8, "s": pl.Int64,
                        "n": pl.Int64, "v": pl.Float64}
        self.state = pl.DataFrame(schema=self._schema)  # one row per (k, s)
        self._pending: List = []        # pre-aggregated ingest partials
        self._pending_rows = 0
        self.finalized_before = -(1 << 62)  # highest finalized watermark
        self.late = 0

    def _compact(self):
        import polars as pl

        if self._pending:
            self.state = (pl.concat([self.state, *self._pending])
                          .group_by(["k", "s"])
                          .agg(pl.col("n").sum(), pl.col("v").sum()))
            self._pending = []
            self._pending_rows = 0

    def ingest(self, keys, ts_us: np.ndarray,
               vals: np.ndarray) -> int:
        """``keys`` may be an Arrow string array (preferred — crosses
        the actor boundary and enters polars without per-string Python
        objects) or a numpy object array."""
        import polars as pl

        starts = (ts_us // self.size) * self.size
        # events for windows already finalized are LATE: the window's
        # result has been emitted — count, don't corrupt
        late = starts + self.size <= self.finalized_before
        self.late += int(late.sum())
        ok = ~late
        if not ok.any():
            return 0
        if isinstance(keys, (pa.Array, pa.ChunkedArray)):
            k_ser = (pl.from_arrow(keys.filter(pa.array(ok)))
                     .cast(pl.Utf8).rename("k"))
        else:
            k_ser = pl.Series("k", keys[ok], dtype=pl.Utf8)
        # columnar, fully vectorized: ONE group_by over the slice, the
        # partial appended as a frame; merging into the running state
        # is a single vectorized concat+group_by amortized across
        # ingests (never a Python loop per distinct (key, window))
        part = (pl.DataFrame({
                    "k": k_ser,
                    "s": pl.Series("s", starts[ok], dtype=pl.Int64),
                    "v": pl.Series("v", vals[ok], dtype=pl.Float64)})
                .group_by(["k", "s"])
                .agg(pl.len().cast(pl.Int64).alias("n"),
                     pl.col("v").sum().alias("v"))
                .select(["k", "s", "n", "v"]))
        self._pending.append(part)
        self._pending_rows += part.height
        if self._pending_rows > self._COMPACT_ROWS:
            self._compact()
        return int(ok.sum())

    def advance(self, watermark_us: int) -> Optional[pa.Table]:
        """Finalize every window ending at or before the watermark:
        emit them (as one Arrow table — columnar end to end, never a
        list of Python tuples) and DROP the state (the bounded-memory
        half of the contract)."""
        import polars as pl

        watermark_us = int(watermark_us)
        if watermark_us <= self.finalized_before:
            return None
        self.finalized_before = watermark_us
        self._compact()
        done_mask = pl.col("s") + self.size <= watermark_us
        done = self.state.filter(done_mask)
        self.state = self.state.filter(~done_mask)
        return done.to_arrow() if done.height else None

    def drain(self) -> Dict:
        """End of stream: emit everything still open (Arrow table) +
        the late count. ``open_windows`` is the count that was still
        open at drain — the bounded-memory metric this class exists to
        provide."""
        import polars as pl

        self._compact()
        rows = self.state.to_arrow()
        self.state = pl.DataFrame(schema=self._schema)
        return {"rows": rows, "late": self.late,
                "open_windows": rows.num_rows}


def stream_windowed_aggregate(ds, ts_col: str, key_col: str, value_col: str,
                              size_s: int = 3600,
                              allowed_lateness_s: int = 0,
                              n_buckets: int = 8, batch_size: int = 8192,
                              advance_every: int = 8):
    """Tumbling event-time windows over a stream with WATERMARKS.

    The single consumer pulls ``iter_batches`` (streaming, never
    materialized), splits each batch by key-hash bucket into stateful
    actors, and advances the watermark ``max(event ts seen) -
    allowed_lateness`` every ``advance_every`` batches — finalized
    windows flow back incrementally and are dropped from actor state,
    so actor memory is bounded by OPEN windows, not stream length.
    Events older than an already-finalized window are counted late,
    never silently merged into emitted results.

    Returns ``(windows_df, n_late)``: a pandas DataFrame
    ``(key, window_start, n_events, sum_value)`` (timestamps µs) and
    the late-event count. With an input sorted by ``ts_col`` and any
    ``allowed_lateness_s >= 0``, no event is ever late and the result
    equals the exact batch tumbling aggregate (oracle-checked).
    """
    import pandas as pd

    size_us = int(size_s) * 1_000_000
    late_us = int(allowed_lateness_s) * 1_000_000
    actors = [WindowBucketState.remote(size_us) for _ in range(n_buckets)]
    try:
        return _stream_windowed_run(ds, actors, ts_col, key_col, value_col,
                                    size_us, late_us, n_buckets, batch_size,
                                    advance_every)
    finally:
        # a mid-stream failure (bad batch, dead actor) must not leak
        # n_buckets stateful actors for the life of the Ray session
        for a in actors:
            ray.kill(a)


def _stream_windowed_run(ds, actors, ts_col, key_col, value_col, size_us,
                         late_us, n_buckets, batch_size, advance_every):
    import pandas as pd

    finalized: List = []
    pending: List = []
    max_ts = None
    n_batches = 0
    for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        ts = np.asarray(batch.column(ts_col).cast(pa.timestamp("us"))
                        .cast(pa.int64()))
        if ts.size == 0:
            continue
        key_arr = batch.column(key_col).cast(pa.large_string()).combine_chunks()
        vals = np.asarray(batch.column(value_col), dtype=np.float64)
        buckets = hash64(key_arr, 0x57AB1E) % np.uint64(n_buckets)
        for b in range(n_buckets):
            sel = np.flatnonzero(buckets == b)
            if sel.size:
                # keys cross the actor boundary as an Arrow slice —
                # no per-string Python objects in transit
                pending.append(actors[b].ingest.remote(
                    key_arr.take(pa.array(sel)), ts[sel], vals[sel]))
        batch_max = int(ts.max())
        max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
        n_batches += 1
        if n_batches % advance_every == 0:
            ray.get(pending)  # ingest-before-advance ordering barrier
            pending = []
            wm = max_ts - late_us
            for t in ray.get([a.advance.remote(wm) for a in actors]):
                if t is not None:
                    finalized.append(t)
    ray.get(pending)
    n_late = 0
    for snap in ray.get([a.drain.remote() for a in actors]):
        if snap["rows"].num_rows:
            finalized.append(snap["rows"])
        n_late += snap["late"]
    if not finalized:
        return (pd.DataFrame({"key": pd.Series([], dtype=object),
                              "window_start": pd.Series([], dtype="int64"),
                              "n_events": pd.Series([], dtype="int64"),
                              "sum_value": pd.Series([], dtype="float64")}),
                n_late)
    df = (pa.concat_tables(finalized)
          .rename_columns(["key", "window_start", "n_events", "sum_value"])
          .to_pandas())
    df = df.sort_values(["key", "window_start"]).reset_index(drop=True)
    df["window_start"] = df["window_start"].astype("int64")
    df["n_events"] = df["n_events"].astype("int64")
    return df, n_late


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


@ray.remote
class DedupBucketState:
    """Windowed stream-dedup state for one key-hash bucket.

    Holds an :class:`~presto_bloomfilter_ray.sketches.apbf.
    AgePartitionedBloom`: an event is KEPT iff its key was not seen in
    the last ``generations`` epochs (including the current one), and
    EVERY occurrence — kept or suppressed — is inserted into the
    current epoch (suppression semantics: a key firing every epoch
    stays suppressed after its first keep). Expired epochs are trimmed
    as the stream's epoch advances, so state is bounded by the window —
    the at-least-once-delivery dedup / alert-throttle shape at sketch
    memory cost instead of a per-key set.
    """

    def __init__(self, generations: int, per_gen_insertions: int, fpp: float):
        from ..sketches import AgePartitionedBloom

        self.f = AgePartitionedBloom(generations, per_gen_insertions, fpp)
        self.started = False

    def ingest(self, epochs: np.ndarray, keys: np.ndarray,
               ids: np.ndarray) -> np.ndarray:
        """Process one batch slice (epochs non-decreasing = stream
        order). Returns the kept ids."""
        kept = []
        for e in np.unique(epochs):  # ascending
            e = int(e)
            if not self.started or e > self.f.current:
                self.f.advance(to_epoch=e)  # trims expired epochs
                self.started = True
            m = epochs == e
            ks = keys[m]
            eids = ids[m]
            arr = pa.array(ks)
            hit = self.f.contains_many(arr)
            nh = np.flatnonzero(~hit)
            # first occurrence per key within the slice wins; later
            # repeats are duplicates even though they probed before
            # the insert below
            _, first = np.unique(ks[nh], return_index=True)
            keep_rows = nh[np.sort(first)]
            # EVERY occurrence (kept or suppressed) refreshes the
            # window — suppression semantics: "seen in the last g
            # epochs" means any sighting, so a key firing every epoch
            # stays suppressed after its first keep. This is the shape
            # an exact SQL anti-window-join expresses.
            self.f.update_at(e, arr)
            if keep_rows.size:
                kept.append(eids[keep_rows])
        return (np.concatenate(kept) if kept
                else np.empty(0, dtype=ids.dtype))

    def stats(self) -> Dict:
        return {"epochs": sorted(self.f.stages),
                "bytes": self.f.estimated_size_bytes()}


def stream_dedup_window(ds, key_cols, ts_col: str, id_col: str,
                        generations: int = 7,
                        epoch: str = "day",
                        per_gen_insertions: int = 100_000,
                        fpp: float = 1e-9,
                        n_buckets: int = 8, batch_size: int = 8192):
    """Windowed streaming dedup: keep an event iff its key was NOT
    seen in the previous ``generations`` epochs (day/hour buckets of
    ``ts_col``), in event-time order.

    The input is consumed as an ordered stream (sort by
    ``(ts, id)`` upstream — this function does it); each batch splits
    by key-hash bucket into stateful actors holding one
    age-partitioned Bloom filter each, so all occurrences of a key
    meet the same state in stream order and per-actor memory is
    bounded by the window. At ``fpp=1e-9`` a false drop is ~never
    (and deterministic for a fixed input — the hashes are seeded),
    which is what lets the driver query oracle-match an exact SQL
    anti-window-join.

    Returns ``(kept_ids, stats)``: a sorted numpy array of kept
    ``id_col`` values and the per-bucket state stats.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    div = 86_400_000_000 if epoch == "day" else 3_600_000_000
    ds = ds.sort([ts_col, id_col])
    actors = [DedupBucketState.remote(generations, per_gen_insertions, fpp)
              for _ in range(n_buckets)]
    try:
        pending: List = []
        for batch in ds.iter_batches(batch_size=batch_size,
                                     batch_format="pyarrow"):
            if batch.num_rows == 0:
                continue
            ts = np.asarray(batch.column(ts_col).cast(pa.timestamp("us"))
                            .cast(pa.int64()))
            epochs = ts // div
            import pyarrow.compute as pc

            parts = [batch.column(c).cast(pa.large_string()).combine_chunks()
                     for c in key_cols]
            key_arr = parts[0] if len(parts) == 1 else \
                pc.binary_join_element_wise(
                    *parts, pa.scalar("\x1f", type=pa.large_string()))
            keys = np.asarray(key_arr)
            ids = np.asarray(batch.column(id_col))
            buckets = hash64(key_arr, 0xDEDB) % np.uint64(n_buckets)
            for b in range(n_buckets):
                sel = np.flatnonzero(buckets == b)
                if sel.size:
                    pending.append(actors[b].ingest.remote(
                        epochs[sel], keys[sel], ids[sel]))
        kept = [k for k in ray.get(pending) if k.size]
        stats = ray.get([a.stats.remote() for a in actors])
        out = np.sort(np.concatenate(kept)) if kept \
            else np.empty(0, dtype=np.int64)
        return out, stats
    finally:
        for a in actors:
            ray.kill(a)
