"""Persistent incremental MinHash-LSH dedup index.

The batch :func:`~.dedup.minhash_dedup` answers "which docs in THIS
corpus duplicate each other". Continuous web-scale ingestion needs the
other question: "which of these NEW docs near-duplicate anything we
already kept" — without re-signing the whole corpus per increment.
This module persists the LSH state once and probes increments against
it, the near-dup analog of the reference's Bloom build → persist →
probe-later loop (reference: BloomFilterPersist + bloom_filter_load,
persist-service/server.go PUT/GET semantics, re-expressed for
signatures instead of bitsets).

On-disk layout (all writes atomic tmp+rename, manifest written LAST):

    index_dir/
      MANIFEST.json                      params + n_docs + generation
      bands/part-00042/chunk-g0001-<uuid>.parquet   (band_hash, doc_id)
      sigs/part-00007/chunk-g0001-<uuid>.parquet    (doc_id, sig u16[P])

Both tables are hash-partitioned (``key & (shards-1)``) so a probe
partition touches exactly one shard directory; chunks-per-shard makes
:func:`minhash_index_append` a pure chunk write — no shard rewrite.
Crash contract: every chunk carries its generation in the filename and
readers only load ``gen <= manifest.gen``, so a crashed append is
invisible; rerun :func:`repair_index` then retry it.

Scale shape of :func:`minhash_index_probe` (the hot path):

* signatures of the increment: one vectorized actor pass
  (:class:`~.dedup.MinHasher`), materialized as a spillable Dataset;
* band join: increment band rows ``(new_id, band_hash)`` — ~16 B each —
  are co-partitioned with the index's band shards; each partition does
  one sorted ``searchsorted`` probe against its (worker-LRU-cached)
  shard, emitting id-pair candidates capped at ``max_per_band`` per
  (row, band) so a template-spam bucket cannot go quadratic;
* verification: phase A attaches the increment signature to each
  deduped candidate via the co-partitioned union trick of
  :func:`~.dedup._verify_pairs` (one signature crosses the wire per
  edge); phase B co-partitions candidates with the index's SIG shards
  and estimates Jaccard from the stored truncated signatures. Neither
  signatures nor candidates ever touch the driver.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import (
    MinHasher,
    _fresh_shard_dir,
    _min_bands_screen,
    _n_shards_for,
    _pow2,
    _sharded_anti_join,
    _sig_type,
    _write_key_shards,
)

_MANIFEST = "MANIFEST.json"
_CHUNK_RE = re.compile(r"^chunk-g(\d+)-[0-9a-f]+\.parquet$")
_IDX_CACHE: Dict = {}  # (dir, kind, part, gen) -> sorted arrays
_IDX_CACHE_CAP = 256


# --------------------------------------------------------------- manifest

def _read_manifest(index_dir: str) -> Dict:
    path = os.path.join(index_dir, _MANIFEST)
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no index manifest at {path}: build did not complete, or "
            "index_dir is not on storage shared with this worker") from None


def _write_manifest(index_dir: str, m: Dict) -> None:
    tmp = os.path.join(index_dir, f".{_MANIFEST}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, os.path.join(index_dir, _MANIFEST))


def repair_index(index_dir: str) -> List[str]:
    """Delete chunks from generations NEWER than the manifest's (the
    debris of a crashed :func:`minhash_index_append`). Returns the
    removed paths. Safe to run any time; a no-op on a healthy index."""
    gen = _read_manifest(index_dir)["gen"]
    removed = []
    for kind in ("bands", "sigs"):
        root = os.path.join(index_dir, kind)
        if not os.path.isdir(root):
            continue
        for part in os.listdir(root):
            pdir = os.path.join(root, part)
            for fn in os.listdir(pdir):
                mm = _CHUNK_RE.match(fn)
                if mm and int(mm.group(1)) > gen:
                    os.remove(os.path.join(pdir, fn))
                    removed.append(os.path.join(pdir, fn))
    return removed


# --------------------------------------------------------------- chunk IO

def _write_chunks(rows_ds, root: str, kind: str, n_shards: int, gen: int,
                  sort_col: str, id_col: str) -> int:
    """Hash-partition ``rows_ds`` (already carrying a ``part`` column)
    and write one sorted chunk per non-empty part. Returns row count."""
    import pyarrow.parquet as pq

    def write_part(g: pa.Table) -> pa.Table:
        p = int(g.column("part")[0].as_py())
        g = g.sort_by([(sort_col, "ascending"), (id_col, "ascending")])
        pdir = os.path.join(root, kind, f"part-{p:05d}")
        os.makedirs(pdir, exist_ok=True)
        final = os.path.join(pdir, f"chunk-g{gen:04d}-{uuid.uuid4().hex[:8]}.parquet")
        tmp = f"{final}.tmp"
        pq.write_table(g.drop_columns(["part"]), tmp)
        os.replace(tmp, final)
        return pa.table({"n": pa.array([g.num_rows], pa.int64())})

    out = (rows_ds.repartition(n_shards)  # coalesce fragments (PERF.md §12)
           .groupby("part").map_groups(write_part, batch_format="pyarrow"))
    return int(sum(r["n"] for r in out.take_all()))


def _load_part(index_dir: str, kind: str, part: int, gen: int,
               num_perm: int) -> Tuple[np.ndarray, np.ndarray]:
    """Worker-LRU-memoized shard read: all chunks of ``part`` with
    generation ≤ ``gen``, concatenated and re-sorted once.

    bands → (band_hash sorted, doc_id aligned);
    sigs  → (doc_id sorted, (n, num_perm) uint16 matrix aligned)."""
    import pyarrow.parquet as pq

    ck = (index_dir, kind, part, gen)
    hit = _IDX_CACHE.get(ck)
    if hit is not None:
        _IDX_CACHE.pop(ck)
        _IDX_CACHE[ck] = hit  # LRU refresh
        return hit
    pdir = os.path.join(index_dir, kind, f"part-{part:05d}")
    tables = []
    if os.path.isdir(pdir):
        for fn in sorted(os.listdir(pdir)):
            m = _CHUNK_RE.match(fn)
            if m and int(m.group(1)) <= gen:
                tables.append(pq.read_table(os.path.join(pdir, fn)))
    if not tables:
        empty = np.zeros(0, dtype=np.int64)
        hit = (empty, empty if kind == "bands"
               else np.zeros((0, num_perm), dtype=np.uint16))
    else:
        t = pa.concat_tables(tables)
        if kind == "bands":
            keys = np.asarray(t.column("band_hash"))
            vals = np.asarray(t.column("doc_id"))
            order = np.argsort(keys, kind="stable")
            hit = (keys[order], vals[order])
        else:
            keys = np.asarray(t.column("doc_id"))
            sigs = np.asarray(
                t.column("sig").combine_chunks().flatten()
            ).reshape(t.num_rows, num_perm)
            order = np.argsort(keys, kind="stable")
            hit = (keys[order], sigs[order])
    if len(_IDX_CACHE) >= _IDX_CACHE_CAP:
        _IDX_CACHE.pop(next(iter(_IDX_CACHE)))
    _IDX_CACHE[ck] = hit
    return hit


# --------------------------------------------------------------- build

def _sig_dataset(ds, num_perm, bands, shingle_k, text_col, id_col,
                 concurrency):
    kwargs = {"batch_format": "pyarrow"}
    if concurrency:
        kwargs["concurrency"] = concurrency
        sig_ds = ds.map_batches(MinHasher, fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            text_col=text_col, id_col=id_col), **kwargs)
    else:
        sig_ds = ds.map_batches(
            MinHasher(num_perm, bands, shingle_k, text_col, id_col), **kwargs)
    return sig_ds.materialize()


def _ingest(sig_ds, index_dir: str, m: Dict, gen: int) -> int:
    """Write one generation of band + sig chunks from a signature
    Dataset. Shared by build and append."""
    bands, id_col = m["bands"], m["id_col"]
    bmask, smask = m["band_shards"] - 1, m["sig_shards"] - 1

    def band_rows(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col)).astype(np.int64)
        bh = np.asarray(b.column("band_hash").combine_chunks().flatten()
                        ).reshape(len(ids), bands).reshape(-1)
        return pa.table({
            "band_hash": pa.array(bh),
            "doc_id": pa.array(np.repeat(ids, bands)),
            "part": pa.array(bh & np.int64(bmask)),
        })

    def sig_rows(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).cast(pa.int64())
        return pa.table({
            "doc_id": ids,
            "sig": b.column("sig"),
            "part": pc.bit_wise_and(ids, smask),
        })

    _write_chunks(sig_ds.select_columns([id_col, "band_hash"])
                  .map_batches(band_rows, batch_format="pyarrow"),
                  index_dir, "bands", m["band_shards"], gen,
                  "band_hash", "doc_id")
    n = _write_chunks(sig_ds.select_columns([id_col, "sig"])
                      .map_batches(sig_rows, batch_format="pyarrow"),
                      index_dir, "sigs", m["sig_shards"], gen,
                      "doc_id", "doc_id")
    return n


def minhash_index_build(ds, index_dir: str, *, num_perm: int = 128,
                        bands: int = 32, shingle_k: int = 5,
                        text_col: str = "text", id_col: str = "doc_id",
                        band_shards: Optional[int] = None,
                        sig_shards: Optional[int] = None,
                        concurrency: Optional[int] = None,
                        expected_docs: int = 1_000_000) -> Dict:
    """Build a fresh index over ``ds`` (ids must be unique int64 across
    the index's lifetime). Shard counts default from ``expected_docs``
    — size them for the corpus the index will GROW to, they are fixed
    at build time. Returns the manifest."""
    if os.path.exists(os.path.join(index_dir, _MANIFEST)):
        raise FileExistsError(
            f"index already exists at {index_dir}; use "
            "minhash_index_append to grow it")
    os.makedirs(index_dir, exist_ok=True)
    m = {
        "version": 1, "num_perm": num_perm, "bands": bands,
        "shingle_k": shingle_k, "id_col": id_col, "text_col": text_col,
        "band_shards": _pow2(band_shards or
                             _n_shards_for(expected_docs * bands)),
        "sig_shards": _pow2(sig_shards or _n_shards_for(expected_docs)),
        "n_docs": 0, "gen": 0,
    }
    sig_ds = _sig_dataset(ds, num_perm, bands, shingle_k, text_col,
                          id_col, concurrency)
    m["n_docs"] = _ingest(sig_ds, index_dir, m, gen=1)
    m["gen"] = 1
    _write_manifest(index_dir, m)
    return m


def minhash_index_append(ds, index_dir: str, *,
                         concurrency: Optional[int] = None) -> Dict:
    """Add ``ds``'s docs to an existing index (params come from the
    manifest). One chunk write per touched shard; the manifest's
    generation bump is the commit point. Single writer at a time."""
    m = _read_manifest(index_dir)
    gen = m["gen"] + 1
    sig_ds = _sig_dataset(ds, m["num_perm"], m["bands"], m["shingle_k"],
                          m["text_col"], m["id_col"], concurrency)
    n = _ingest(sig_ds, index_dir, m, gen=gen)
    m["n_docs"] += n
    m["gen"] = gen
    _write_manifest(index_dir, m)
    return m


# --------------------------------------------------------------- probe

def minhash_index_probe(new_ds, index_dir: str, *, threshold: float = 0.8,
                        max_per_band: int = 64,
                        n_parts: int = 64,
                        concurrency: Optional[int] = None):
    """→ Dataset ``(doc_id, match_id, est_jaccard)``: for each doc of
    ``new_ds``, the indexed docs whose estimated Jaccard ≥ threshold.
    Probing docs already in the index yields their self-match (filter
    ``doc_id != match_id`` if unwanted).

    ``max_per_band`` caps candidates per (new row, band): a true
    near-dup pair collides in ~``bands × j^rows_per_band`` bands, so it
    survives a hot-bucket cap with overwhelming probability, while an
    uncapped template bucket of size B would emit B pairs per band.
    The band-collision screen (:func:`~.dedup._min_bands_screen`) is
    relaxed one notch here because capping can hide collisions."""
    m = _read_manifest(index_dir)
    num_perm, bands, gen = m["num_perm"], m["bands"], m["gen"]
    id_col = m["id_col"]
    bshards, sshards = m["band_shards"], m["sig_shards"]
    n_parts = _pow2(n_parts)
    fsl = _sig_type(num_perm)

    new_sig = _sig_dataset(new_ds, num_perm, bands, m["shingle_k"],
                           m["text_col"], id_col, concurrency)
    n_new = new_sig.count()
    # adapt exchange width to the increment (see lsh_candidate_pairs)
    n_parts = _pow2(min(n_parts, max(4, (n_new * bands) // 250_000 + 1)))

    def explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col)).astype(np.int64)
        bh = np.asarray(b.column("band_hash").combine_chunks().flatten()
                        ).reshape(len(ids), bands).reshape(-1)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "band_hash": pa.array(bh),
            "part": pa.array(bh & np.int64(bshards - 1)),
        })

    def band_join(g: pa.Table) -> pa.Table:
        p = int(g.column("part")[0].as_py())
        bh_sorted, idx_ids = _load_part(index_dir, "bands", p, gen, num_perm)
        h = np.asarray(g.column("band_hash"))
        nid = np.asarray(g.column(id_col))
        lo = np.searchsorted(bh_sorted, h, side="left")
        hi = np.searchsorted(bh_sorted, h, side="right")
        caps = np.minimum(hi - lo, max_per_band)
        total = int(caps.sum())
        if total == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        row_of = np.repeat(np.arange(len(h)), caps)
        within = np.arange(total) - np.repeat(np.cumsum(caps) - caps, caps)
        return pa.table({
            "a": pa.array(nid[row_of]),                       # new doc
            "b": pa.array(idx_ids[lo[row_of] + within]),      # index doc
        })

    edges = (
        new_sig.select_columns([id_col, "band_hash"])
        .map_batches(explode, batch_format="pyarrow")
        .repartition(min(bshards, max(n_parts, 4)))
        .groupby("part").map_groups(band_join, batch_format="pyarrow")
    )

    # verification phase A — identical union/co-partition shape to
    # _verify_pairs.attach_a: dedupe (a,b), band-collision screen,
    # attach the NEW side's signature, re-key by the INDEX id
    min_bands = max(1, _min_bands_screen(bands, num_perm, threshold) - 1)

    def sig_rows(b: pa.Table) -> pa.Table:
        key = b.column(id_col).cast(pa.int64())
        return pa.table({
            "key": key,
            "other": pa.nulls(b.num_rows, pa.int64()),
            "sig": b.column("sig"),
            "part": pc.bit_wise_and(key, n_parts - 1),
        })

    def edge_rows(b: pa.Table) -> pa.Table:
        key = b.column("a").cast(pa.int64())
        return pa.table({
            "key": key,
            "other": b.column("b").cast(pa.int64()),
            "sig": pa.nulls(b.num_rows, fsl),
            "part": pc.bit_wise_and(key, n_parts - 1),
        })

    def attach_new(g: pa.Table) -> pa.Table:
        is_edge = pc.is_valid(g.column("other"))
        sig_t = g.filter(pc.invert(is_edge))
        edge_t = g.filter(is_edge)
        if edge_t.num_rows == 0:
            return pa.table({"new_id": pa.array([], pa.int64()),
                             "idx_id": pa.array([], pa.int64()),
                             "sig": pa.array([], fsl),
                             "part": pa.array([], pa.int64())})
        skeys = np.asarray(sig_t.column("key"))
        order = np.argsort(skeys)
        skeys = skeys[order]
        S = np.asarray(sig_t.column("sig").combine_chunks().flatten()
                       ).reshape(sig_t.num_rows, num_perm)[order]
        a = np.asarray(edge_t.column("key"))
        b = np.asarray(edge_t.column("other"))
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            first[1:] = (np.diff(a) != 0) | (b[1:] != b[:-1])
        starts = np.flatnonzero(first)
        nb = np.diff(np.append(starts, len(a)))
        keep = starts[nb >= min_bands]
        a_u, b_u = a[keep], b[keep]
        sig_a = S[np.searchsorted(skeys, a_u)]
        return pa.table({
            "new_id": pa.array(a_u),
            "idx_id": pa.array(b_u),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig_a.reshape(-1)), num_perm),
            "part": pa.array(b_u & np.int64(sshards - 1)),
        })

    cands = (
        new_sig.map_batches(sig_rows, batch_format="pyarrow")
        .union(edges.map_batches(edge_rows, batch_format="pyarrow"))
        .repartition(n_parts)
        .groupby("part").map_groups(attach_new, batch_format="pyarrow")
    )

    # phase B: co-partitioned with the index SIG shards — one shard
    # read per partition, vectorized searchsorted + mean-equal estimate
    def verify(g: pa.Table) -> pa.Table:
        p = int(g.column("part")[0].as_py())
        skeys, S = _load_part(index_dir, "sigs", p, gen, num_perm)
        idx = np.asarray(g.column("idx_id"))
        pos = np.clip(np.searchsorted(skeys, idx), 0, max(0, len(skeys) - 1))
        found = skeys[pos] == idx if len(skeys) else np.zeros(len(idx), bool)
        sig_new = np.asarray(g.column("sig").combine_chunks().flatten()
                             ).reshape(g.num_rows, num_perm)
        est = np.zeros(len(idx), dtype=np.float64)
        if found.any():
            est[found] = (sig_new[found] == S[pos[found]]).mean(axis=1)
        ok = found & (est >= threshold)
        sel = pa.array(np.flatnonzero(ok))
        return pa.table({
            "doc_id": pc.take(g.column("new_id"), sel),
            "match_id": pc.take(g.column("idx_id"), sel),
            "est_jaccard": pa.array(est[ok]),
        })

    return (cands
            .repartition(min(sshards, max(n_parts, 4)))
            .groupby("part").map_groups(verify, batch_format="pyarrow"))


def minhash_index_dedup(new_ds, index_dir: str, *, threshold: float = 0.8,
                        broadcast_limit: int = 2_000_000,
                        work_dir: Optional[str] = None,
                        **probe_kwargs):
    """Incremental-ingest filter: → ``(novel_ds, matches_ds)`` where
    ``novel_ds`` is ``new_ds`` minus every doc with an index match.
    Matched-id removal follows :func:`~.dedup.minhash_dedup`'s tiered
    plan — sorted broadcast probe below ``broadcast_limit`` matched
    ids, sharded anti-join above it (the round-2 scale fix)."""
    m = _read_manifest(index_dir)
    id_col = m["id_col"]
    matches = minhash_index_probe(new_ds, index_dir, threshold=threshold,
                                  **probe_kwargs).materialize()
    matched_kv = matches.map_batches(
        lambda b: pa.table({"key": b.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    n_matched = matched_kv.count()
    if n_matched == 0:
        return new_ds, matches
    if n_matched <= broadcast_limit:
        import ray

        ids = np.unique(np.concatenate(
            [np.asarray(b.column("key"))
             for b in matched_kv.iter_batches(batch_format="pyarrow")]))
        ref = ray.put(ids)

        def drop(batch: pa.Table) -> pa.Table:
            import ray as _ray

            rem = _ray.get(ref)
            keys = np.asarray(batch.column(id_col)).astype(np.int64)
            pos = np.clip(np.searchsorted(rem, keys), 0, len(rem) - 1)
            return batch.filter(pa.array(rem[pos] != keys))

        return new_ds.map_batches(drop, batch_format="pyarrow"), matches
    shard_dir = _fresh_shard_dir(work_dir, "minhash-index-dedup-")
    n_shards = _n_shards_for(n_matched)
    _write_key_shards(matched_kv, shard_dir, n_shards, has_keep=False)
    novel = _sharded_anti_join(
        new_ds, shard_dir, n_shards, False,
        lambda b: np.asarray(b.column(id_col)).astype(np.int64),
        lambda b, keys, found, kv: ~found, None)
    return novel, matches
