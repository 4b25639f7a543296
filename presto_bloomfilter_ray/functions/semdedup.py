"""SemDeDup — semantic deduplication over an embedding column.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): cluster document embeddings with
k-means and drop all but one of every group of semantically
near-identical items (pairwise cosine above a threshold) — unlike
MinHash (lexical overlap) this catches paraphrases and re-renderings
of the same content.

Ray-Data shape — composed from machinery this repo already tunes:

* **Candidate pairs come from the IVF multi-probe path**
  (:func:`~.similarity.cosine_neardup_pairs_ivf`): bounded-sample
  k-means centroids, each vector assigned to its ``assign_m`` nearest
  clusters (multi-probe recovers the boundary-straddling pairs the
  paper's single-assignment misses — measured 0.29 → ≥0.8 recall on
  the near-isotropic synthetic embeddings), per-cluster chunked
  matmuls, flops O(Σ g_c²) not N². Precision is exact (true cosine),
  so the pair set is a subset of brute force.
* **The keep rule is deterministic and order-free**: pairs are
  emitted as (a < b); the drop set is exactly the distinct larger-id
  members — "keep the smallest id of every detected duplicate
  relation", the same rule as ``exact_dedup``.
* **Tagging takes the broadcast/sharded split** shared with dedup
  removal: the drop-id set is proportional to TRUE semantic
  duplication, broadcast as a sorted array below ``broadcast_limit``,
  else hash-sharded to parquet and probed with the per-worker LRU.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray

from .similarity import cosine_neardup_pairs_ivf

__all__ = ["semdedup"]


def semdedup(ds, threshold: float = 0.9, vec_col: str = "embedding",
             id_col: str = "vec_id", *, ncentroids: int = 16,
             assign_m: int = 3, sample_fraction: float = 0.2, seed: int = 7,
             chunk: int = 1024, drop_col: str = "is_semdup",
             broadcast_limit: int = 2_000_000,
             work_dir: Optional[str] = None):
    """Tag semantic duplicates: returns the input Dataset (original
    columns) + a boolean ``drop_col`` — True for every item with a
    smaller-id cosine-duplicate in some shared IVF cluster. Filter on
    it to dedup; keep it for observability."""
    from .dedup import _fresh_shard_dir, _n_shards_for, _write_key_shards

    pairs = cosine_neardup_pairs_ivf(
        ds, threshold=threshold, vec_col=vec_col, id_col=id_col,
        ncentroids=ncentroids, assign_m=assign_m,
        sample_fraction=sample_fraction, seed=seed, chunk=chunk)
    drop = (pairs.select_columns(["b"]).groupby("b").count()
            .select_columns(["b"])).materialize()
    n_drop = drop.count()
    if n_drop == 0:
        hot = {"kind": "array", "ids": np.zeros(0, dtype=np.int64)}
    elif n_drop <= broadcast_limit:
        hot = {"kind": "array", "ids": np.sort(np.asarray(
            drop.to_pandas()["b"].to_numpy(), dtype=np.int64))}
    else:
        shard_dir = _fresh_shard_dir(work_dir, "semdedup-shards-")
        n_shards = _n_shards_for(n_drop)
        _write_key_shards(drop.map_batches(
            lambda b: pa.table({"key": b.column("b").cast(pa.int64())}),
            batch_format="pyarrow"), shard_dir, n_shards, has_keep=False)
        hot = {"kind": "shards", "dir": shard_dir, "n_shards": n_shards}

    ref = ray.put(hot["ids"]) if hot["kind"] == "array" else None

    def tag(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        if ref is not None:
            arr = ray.get(ref)
            if len(arr):
                idx = np.clip(np.searchsorted(arr, ids), 0, len(arr) - 1)
                hit = arr[idx] == ids
            else:
                hit = np.zeros(len(ids), dtype=bool)
        else:
            from .dedup import _shard_lookup

            hit, _ = _shard_lookup(ids, hot["dir"], hot["n_shards"],
                                   has_keep=False)
        return b.append_column(drop_col, pa.array(hit))

    return ds.map_batches(tag, batch_format="pyarrow")
