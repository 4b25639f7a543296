"""Deduplication operators for web-scale corpora.

Exact, MinHash+LSH, SimHash and n-gram-Jaccard dedup over a documents
table. Partitioning contracts (100 TB design notes):

* **exact**: one all-to-all shuffle keyed by a 64-bit content hash —
  per-key groups are tiny (true duplicates), so skew is bounded by the
  actual duplicate multiplicity.
* **minhash/simhash**: signatures are computed map-side (vectorized,
  flat-hash + ``reduceat``); only (band, band_hash, doc_id) candidate
  rows shuffle — a few dozen bytes per doc instead of the text. The
  final connected-components step runs on the candidate-pair set, which
  is orders of magnitude smaller than the corpus; at extreme scale swap
  the driver union-find for iterative min-label propagation over the
  edge Dataset (same candidate generation).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hashing import hash64

_MERSENNE = (1 << 61) - 1


def normalize_text(text_col) -> pa.ChunkedArray:
    """Lowercase + collapse whitespace — shared by all dedup variants."""
    out = pc.utf8_lower(pc.replace_substring_regex(text_col, r"\s+", " "))
    return out if isinstance(out, pa.ChunkedArray) else pa.chunked_array([out])


def add_content_hash(batch: pa.Table, col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    """64-bit hash of the normalized text (vectorized)."""
    h = hash64(normalize_text(batch.column(col)), 0xDED0)
    return batch.append_column(out_col, pa.array(h.astype(np.int64)))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the min-``id_col`` row per distinct normalized text.

    Deterministic (min id), matching a SQL ``row_number() over
    (partition by text order by id) = 1`` oracle.

    Scale design: the shuffle carries only (content_hash, id) PAIRS
    (16 bytes/row), aggregated with a vectorized Count+Min — never the
    text, and never per-group Python. Only hashes with count > 1 (the
    actual duplicate groups) come back to the driver as a keep-map;
    the row dataset is then map-filtered against the broadcast map.
    Duplicate-group count is what bounds driver memory — proportional
    to real duplication, not corpus size.
    """
    from ray.data.aggregate import Count, Min

    import ray

    def hash_pairs(b: pa.Table) -> pa.Table:
        h = hash64(normalize_text(b.column(col)), 0xDED0)
        return pa.table({"content_hash": pa.array(h.astype(np.int64)),
                         id_col: b.column(id_col)})

    agg = (
        ds.map_batches(hash_pairs, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Count(alias_name="n"), Min(id_col, alias_name="keep_id"))
    )
    dups = agg.filter(expr="n > 1").select_columns(
        ["content_hash", "keep_id"]).to_pandas()
    if dups.empty:
        return ds
    order = np.argsort(dups["content_hash"].to_numpy())
    dup_hashes = dups["content_hash"].to_numpy()[order]
    keep_ids = dups["keep_id"].to_numpy()[order]
    ref = ray.put((dup_hashes, keep_ids))

    def drop_losers(b: pa.Table) -> pa.Table:
        dh, ki = ray.get(ref)
        h = hash64(normalize_text(b.column(col)), 0xDED0).astype(np.int64)
        idx = np.searchsorted(dh, h)
        idx_c = np.clip(idx, 0, len(dh) - 1)
        in_dup = dh[idx_c] == h
        ids = np.asarray(b.column(id_col))
        keep = ~in_dup | (ids == ki[idx_c])
        return b.filter(pa.array(keep))

    return ds.map_batches(drop_losers, batch_format="pyarrow")


# ----------------------------------------------------------------- MinHash
class MinHasher:
    """Actor-pool stage: MinHash signatures + LSH band keys per doc.

    Fully vectorized, no per-shingle Python: the batch's texts are
    normalized and viewed as ONE flat byte array; char-``shingle_k``-gram
    hashes come from a rolling polynomial over the padded bytes
    (``k-1`` sentinel bytes between docs so windows never cross a doc
    boundary) finished with splitmix64; ``num_perm`` permutations are
    odd-multiplier affine maps over Z/2^64 (bijections), min-reduced per
    doc with ``np.minimum.reduceat``.

    Emits ONE row per doc: (id, sig fixed-list, band_hash fixed-list) —
    band rows are exploded WITHOUT the signature downstream, so the
    LSH shuffle carries ~16 bytes per (doc, band), not the signature.
    """

    _POLY = np.uint64(1099511628211)
    _SENTINEL = np.uint64(0x1F)

    def __init__(self, num_perm: int = 128, bands: int = 32, shingle_k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id"):
        if num_perm % bands:
            raise ValueError("bands must divide num_perm")
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col
        rng = np.random.default_rng(1337)  # fixed: identical in every actor
        self.a = (rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)

    @staticmethod
    def _splitmix(z: np.ndarray) -> np.ndarray:
        z = (z + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    def _shingle_stream(self, texts):
        """→ (flat shingle hashes, per-doc reduce starts, empty-doc mask).

        Windows whose span would cross into the next doc's bytes are
        masked to uint64-max so they never win a min — doc signatures
        are therefore independent of batch composition and order.
        """
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array(list(texts), type=pa.large_string())
        arr = normalize_text(texts)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.cast(pa.large_string())
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        lens = np.diff(offs)
        n = len(lens)
        k = self.k
        pad = k - 1
        nbytes = int(offs[-1] - offs[0])
        total = nbytes + pad * n
        padded = np.full(total, self._SENTINEL, dtype=np.uint64)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        src = np.arange(nbytes, dtype=np.int64)
        padded[src + pad * row_of] = data[offs[0] + src]
        # rolling degree-(k-1) polynomial over the padded stream
        m = max(0, total - k + 1)
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc = acc * self._POLY + padded[j : m + j]
        sh = self._splitmix(acc)
        padded_starts = (offs[:-1] - offs[0]) + pad * np.arange(n, dtype=np.int64)
        # contamination mask: the last k-1 windows of every non-final
        # segment peek into the next doc's bytes — they must never win a
        # min, under ANY permutation (the mask is re-applied per perm in
        # ``signatures`` because an affine map scrambles sentinels)
        contam = np.zeros(m, dtype=bool)
        if n > 1 and m > 0:
            seg_ends = padded_starts[1:]
            for j in range(1, k):
                idx = seg_ends - j
                ok = (idx >= padded_starts[:-1]) & (idx >= 0) & (idx < m)
                contam[idx[ok]] = True
        starts = np.minimum(padded_starts, max(0, m - 1))
        return sh, starts, (lens == 0), contam

    def signatures(self, texts) -> np.ndarray:
        sh, starts, empty_mask, contam = self._shingle_stream(texts)
        n = len(starts)
        sig = np.empty((n, self.num_perm), dtype=np.uint64)
        if sh.size == 0:
            sig[:] = self._splitmix(self.b)[None, :]
            return sig
        UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)
        any_contam = bool(contam.any())
        for p in range(self.num_perm):
            v = self.a[p] * sh + self.b[p]
            if any_contam:
                v[contam] = UMAX
            sig[:, p] = np.minimum.reduceat(v, starts)
        if empty_mask.any():
            sig[empty_mask] = self._splitmix(self.b)[None, :]
        return sig

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """(n_docs, bands) uint64 — hash of each band's signature rows.

        The band index is folded into the seed, so hashes are globally
        unique per (band, chunk-value) and grouping on the hash alone
        suffices (cross-band collisions only create extra candidates,
        which verification discards)."""
        n = sig.shape[0]
        out = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            chunk = sig[:, b * self.rows_per_band : (b + 1) * self.rows_per_band]
            acc = np.full(n, 0xCBF29CE484222325, dtype=np.uint64) ^ self._splitmix(
                np.array([b + 1], dtype=np.uint64)
            )[0]
            for r in range(self.rows_per_band):
                acc = (acc ^ chunk[:, r]) * np.uint64(0x100000001B3)
            out[:, b] = acc
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col))
        sig = self.signatures(batch.column(self.text_col))
        bh = self.band_hashes(sig)
        return pa.table({
            self.id_col: pa.array(ids),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig.reshape(-1).astype(np.int64)), self.num_perm),
            "band_hash": pa.FixedSizeListArray.from_arrays(
                pa.array(bh.reshape(-1).astype(np.int64)), self.bands),
        })


def lsh_candidate_pairs(ds, num_perm: int = 128, bands: int = 32,
                        shingle_k: int = 5, text_col: str = "text",
                        id_col: str = "doc_id", concurrency: Optional[int] = None) -> pd.DataFrame:
    """documents → signatures (one materialized pass) → (band, band_hash)
    explode (ids only) → groupby → candidate pairs → signature-verified
    Jaccard estimates. Returns a pandas DataFrame (a, b, est_jaccard).

    Scale notes: the LSH shuffle moves only (id, band, band_hash) rows;
    signatures are fetched solely for candidate ids. The signature
    dataset is materialized here (fine up to ~10^8 docs); beyond that,
    write it to parquet and re-read per phase — same topology.
    """
    kwargs = {"batch_format": "pyarrow"}
    if concurrency:
        kwargs["concurrency"] = concurrency
        sig_ds = ds.map_batches(
            MinHasher, fn_constructor_kwargs=dict(
                num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                text_col=text_col, id_col=id_col), **kwargs)
    else:
        mh = MinHasher(num_perm, bands, shingle_k, text_col, id_col)
        sig_ds = ds.map_batches(mh, **kwargs)
    sig_ds = sig_ds.materialize()

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col))
        bh = np.asarray(batch.column("band_hash").combine_chunks().flatten()).reshape(len(ids), bands)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "band_hash": pa.array(bh.reshape(-1)),
        })

    from ray.data.aggregate import Count

    exploded = sig_ds.select_columns([id_col, "band_hash"]).map_batches(
        explode, batch_format="pyarrow"
    )
    # vectorized hash-agg (NOT per-group Python): find duplicated buckets
    counts = exploded.groupby("band_hash").aggregate(Count(alias_name="n"))
    dup_hashes = counts.filter(expr="n > 1").select_columns(["band_hash"]).to_pandas()
    if dup_hashes.empty:
        return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
    import ray

    dup_ref = ray.put(np.sort(dup_hashes["band_hash"].to_numpy()))

    def in_dup_bucket(batch: pa.Table) -> pa.Table:
        d = ray.get(dup_ref)
        keep = np.isin(np.asarray(batch.column("band_hash")), d, assume_unique=False)
        return batch.filter(pa.array(keep))

    # only rows in duplicated buckets reach the driver (true candidates).
    # Candidate edges are STARS (member → bucket min), not all pairs: a
    # bucket of g docs contributes g-1 edges instead of g(g-1)/2, which
    # bounds the edge set by n_docs × bands even under bucket explosion
    # (template-heavy corpora). Union-find connectivity through the hub
    # reaches every member; verification keeps it conservative.
    cand_rows = (
        exploded.map_batches(in_dup_bucket, batch_format="pyarrow")
        .to_pandas()
        .sort_values("band_hash", kind="stable")
    )
    out_a, out_b = [], []
    hashes = cand_rows["band_hash"].to_numpy()
    ids_arr = cand_rows[id_col].to_numpy()
    bounds = np.concatenate(
        ([0], np.flatnonzero(np.diff(hashes)) + 1, [len(hashes)])
    )
    for i in range(len(bounds) - 1):
        ids = np.unique(ids_arr[bounds[i] : bounds[i + 1]])
        if len(ids) < 2:
            continue
        out_a.append(np.full(len(ids) - 1, ids[0]))
        out_b.append(ids[1:])
    if not out_a:
        return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
    pairs = pd.DataFrame({
        "a": np.concatenate(out_a), "b": np.concatenate(out_b)
    }).drop_duplicates(subset=["a", "b"]).reset_index(drop=True)

    # fetch signatures only for candidate ids, estimate Jaccard
    cand = np.unique(np.concatenate([pairs["a"].to_numpy(), pairs["b"].to_numpy()]))
    import ray

    cand_ref = ray.put(cand)

    def filter_cand(batch: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        keep = np.isin(np.asarray(batch.column(id_col)), c)
        return batch.select([id_col, "sig"]).filter(pa.array(keep))

    sub = sig_ds.map_batches(filter_cand, batch_format="pyarrow").to_pandas()
    sig_of = {int(i): np.asarray(s) for i, s in zip(sub[id_col], sub["sig"])}
    est = np.array([
        float((sig_of[int(a)] == sig_of[int(b)]).mean())
        for a, b in zip(pairs["a"], pairs["b"])
    ])
    pairs["est_jaccard"] = est
    return pairs


def minhash_dedup(ds, threshold: float = 0.8, num_perm: int = 128,
                  bands: int = 32, shingle_k: int = 5,
                  text_col: str = "text", id_col: str = "doc_id",
                  distributed_cc: bool = False):
    """Near-dup removal: keep one representative (min id) per connected
    component of the ≥threshold candidate graph. Returns (deduped_ds,
    dup_map) where dup_map maps removed id → kept id.

    ``distributed_cc=True`` runs the clustering through
    :func:`~presto_bloomfilter_ray.functions.components.connected_components`
    (iterative min-label propagation over the edge Dataset) instead of
    the driver union-find — same result, for candidate sets too large
    for one process.
    """
    edges = lsh_candidate_pairs(ds, num_perm, bands, shingle_k, text_col, id_col)
    if edges.empty:
        return ds, {}
    edges = edges[edges["est_jaccard"] >= threshold]
    if edges.empty:
        return ds, {}

    if distributed_cc:
        from .components import connected_components

        cc = connected_components(edges[["a", "b"]])
        dup_map = dict(zip(cc["node"].astype(int), cc["component"].astype(int)))
    else:
        # union-find over the (small) candidate edge set
        parent: Dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(edges["a"].astype(np.int64), edges["b"].astype(np.int64)):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        dup_map = {x: find(x) for x in list(parent)}
    removed = {x for x, r in dup_map.items() if r != x}
    if not removed:
        return ds, {}
    import ray

    removed_ref = ray.put(np.array(sorted(removed), dtype=np.int64))

    def drop_dups(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rem = _ray.get(removed_ref)
        ids = np.asarray(batch.column(id_col))
        keep = ~np.isin(ids, rem)
        return batch.filter(pa.array(keep))

    return ds.map_batches(drop_dups, batch_format="pyarrow"), dup_map


# ----------------------------------------------------------------- SimHash
def simhash64(texts: List[Optional[str]]) -> np.ndarray:
    """64-bit Charikar SimHash per doc, vectorized: flat token hashes →
    per-bit ±1 votes → ``reduceat`` by doc → sign."""
    flat_tokens: List[str] = []
    starts = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split() or [""]
        flat_tokens.extend(toks)
        starts[i + 1] = starts[i] + len(toks)
    h = hash64(pa.array(flat_tokens, type=pa.large_string()), 0x51AA)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int8)
    votes = bits * 2 - 1  # ±1
    sums = np.add.reduceat(votes, starts[:-1], axis=0)
    sig_bits = (sums > 0).astype(np.uint64)
    return (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(x.shape, dtype=np.uint64)
    for _ in range(64):
        cnt += x & np.uint64(1)
        x >>= np.uint64(1)
    return cnt


def simhash_candidates(ds, max_hamming: int = 3, text_col: str = "text",
                       id_col: str = "doc_id") -> pd.DataFrame:
    """SimHash near-dup candidate pairs: 4×16-bit chunk LSH (two equal
    chunks guaranteed when hamming ≤ 3 — pigeonhole over 4 chunks),
    verified by full 64-bit hamming distance.

    Same scale topology as MinHash LSH: the shuffle is a vectorized
    Count over (chunk-keyed) bucket hashes; only rows landing in
    duplicated buckets reach the driver for pairing + verification.
    Returns a pandas DataFrame (a, b, hamming).
    """
    from ray.data.aggregate import Count

    import ray

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        sh = simhash64(texts)
        ids = np.asarray(batch.column(id_col))
        # bucket key = chunk index folded with chunk value (distinct per chunk)
        chunk_vals = np.stack(
            [((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF))
             | np.uint64((c + 1) << 48) for c in range(4)], axis=1
        )
        return pa.table({
            id_col: pa.array(np.repeat(ids, 4)),
            "bucket": pa.array(chunk_vals.reshape(-1).astype(np.int64)),
            "simhash": pa.array(np.repeat(sh.astype(np.int64), 4)),
        })

    exploded = ds.map_batches(sigs, batch_format="pyarrow")
    counts = exploded.groupby("bucket").aggregate(Count(alias_name="n"))
    dup = counts.filter(expr="n > 1").select_columns(["bucket"]).to_pandas()
    if dup.empty:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    dup_ref = ray.put(np.sort(dup["bucket"].to_numpy()))

    def in_dup(batch: pa.Table) -> pa.Table:
        d = ray.get(dup_ref)
        keep = np.isin(np.asarray(batch.column("bucket")), d)
        return batch.filter(pa.array(keep))

    cand = (
        exploded.map_batches(in_dup, batch_format="pyarrow")
        .to_pandas()
        .sort_values("bucket", kind="stable")
    )
    buckets = cand["bucket"].to_numpy()
    ids_arr = cand[id_col].to_numpy()
    sh_arr = cand["simhash"].to_numpy().astype(np.uint64)
    bounds = np.concatenate(([0], np.flatnonzero(np.diff(buckets)) + 1, [len(buckets)]))
    out_a, out_b, out_h = [], [], []
    seen = set()
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        order = np.argsort(ids_arr[lo:hi])
        ids = ids_arr[lo:hi][order]
        sh = sh_arr[lo:hi][order]
        for j in range(len(ids)):
            d = hamming64(sh[j], sh[j + 1 :])
            for k in np.flatnonzero(d <= max_hamming):
                key = (int(ids[j]), int(ids[j + 1 + k]))
                if key[0] != key[1] and key not in seen:
                    seen.add(key)
                    out_a.append(key[0]); out_b.append(key[1]); out_h.append(int(d[k]))
    return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h}).sort_values(
        ["a", "b"]).reset_index(drop=True)


# ------------------------------------------------------------ exact verify
def ngram_jaccard(a: str, b: str, n: int = 5) -> float:
    """Exact char-n-gram Jaccard — the verify step behind MinHash."""
    sa = {a[i : i + n] for i in range(max(1, len(a) - n + 1))}
    sb = {b[i : i + n] for i in range(max(1, len(b) - n + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
