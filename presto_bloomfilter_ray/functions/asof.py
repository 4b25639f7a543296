"""As-of join — attach the latest prior (or next) right-side row per key.

The guide's documented pattern: broadcast the (smaller) right side
keyed + ts-sorted, then probe each left batch with vectorized
``searchsorted`` per key run — no shuffle of the left side at all.
For a large right side, bucket BOTH sides by key hash and run
``pd.merge_asof`` per bucket inside ``map_groups`` (same semantics;
stated partitioning assumption: one key's rows co-located per bucket).

Semantics match SQL ``ASOF JOIN`` (DuckDB): for ``direction=
"backward"``, each left row gets the right row with the greatest
``ts_right <= ts_left`` for its key; left rows with no match keep
nulls.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa

import ray


def _index_right(right_df, key: str, ts: str, value_cols: List[str]):
    """→ dict key → (sorted ts int64 array, {col: values array})."""
    import pandas as pd

    out: Dict = {}
    right_df = right_df.copy()
    # normalize to µs epoch ints regardless of pandas' ns default, so
    # comparisons line up with Arrow timestamp[us] on the left side
    right_df[ts] = pd.to_datetime(right_df[ts]).astype("datetime64[us]")
    for k, g in right_df.groupby(key, sort=False):
        g = g.sort_values(ts, kind="stable")
        out[k] = (
            g[ts].astype("int64").to_numpy(),
            {c: g[c].to_numpy() for c in value_cols},
        )
    return out


def range_join(left_ds, intervals_df, on: str, lo: str = "lo", hi: str = "hi",
               value_cols: List[str] = ("label",), suffix: str = ""):
    """Non-equi broadcast range join: each left row gains the columns of
    the interval with ``lo <= left[on] < hi``.

    Intervals must be non-overlapping (validated); they're broadcast
    sorted by ``lo`` and probed with one ``searchsorted`` per batch —
    the standard banding/bucketing join (price bands, latency buckets,
    IP ranges). Rows outside every interval get nulls.
    """
    import pandas as pd

    iv = intervals_df.sort_values(lo).reset_index(drop=True)
    los = iv[lo].to_numpy()
    his = iv[hi].to_numpy()
    if (his[:-1] > los[1:]).any():
        raise ValueError("intervals overlap; range_join requires disjoint intervals")
    vals = {c: iv[c].to_numpy() for c in value_cols}
    ref = ray.put((los, his, vals))

    def probe(batch: pa.Table) -> pa.Table:
        L, H, V = ray.get(ref)
        x = np.asarray(batch.column(on).cast(pa.float64()))
        idx = np.searchsorted(L, x, side="right") - 1
        idx_c = np.clip(idx, 0, len(L) - 1)
        ok = (idx >= 0) & (x < H[idx_c])
        out = batch
        for c in value_cols:
            col = np.full(batch.num_rows, None, dtype=object)
            col[ok] = V[c][idx_c[ok]]
            out = out.append_column(f"{c}{suffix}", pa.array(list(col)))
        return out

    return left_ds.map_batches(probe, batch_format="pyarrow")


def asof_join(left_ds, right_df, key: str, ts: str, value_cols: List[str],
              direction: str = "backward", suffix: str = "_r"):
    """Broadcast as-of join: every left row gains ``<col><suffix>`` for
    each right ``value_cols`` plus ``<ts><suffix>`` (null when no match).

    ``right_df`` is a pandas DataFrame (the broadcastable side).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    idx = _index_right(right_df, key, ts, value_cols)
    ref = ray.put(idx)

    def probe(batch: pa.Table) -> pa.Table:
        index = ray.get(ref)
        n = batch.num_rows
        keys = batch.column(key).to_pylist()
        # unify units: whatever timestamp resolution the source block
        # carries, compare in µs (arrow rescales on timestamp casts)
        ts_vals = np.asarray(batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64()))
        matched_ts = np.full(n, np.nan)
        matched_vals = {c: np.full(n, None, dtype=object) for c in value_cols}
        # group probe rows by key (runs over the sorted order)
        order = np.argsort(np.asarray(keys, dtype=object), kind="stable")
        i = 0
        while i < n:
            j = i
            k = keys[order[i]]
            while j < n and keys[order[j]] == k:
                j += 1
            rows = order[i:j]
            entry = index.get(k)
            if entry is not None:
                rts, rvals = entry
                if direction == "backward":
                    pos = np.searchsorted(rts, ts_vals[rows], side="right") - 1
                    ok = pos >= 0
                else:
                    pos = np.searchsorted(rts, ts_vals[rows], side="left")
                    ok = pos < len(rts)
                sel = rows[ok]
                p = pos[ok]
                matched_ts[sel] = rts[p].astype(np.float64)
                for c in value_cols:
                    matched_vals[c][sel] = rvals[c][p]
            i = j
        out = batch.append_column(
            f"{ts}{suffix}",
            pa.array([None if np.isnan(v) else int(v) for v in matched_ts],
                     type=pa.timestamp("us")),
        )
        for c in value_cols:
            out = out.append_column(f"{c}{suffix}", pa.array(list(matched_vals[c])))
        return out

    return left_ds.map_batches(probe, batch_format="pyarrow")
