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

from typing import Dict, List, Optional, Tuple

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

    map_batches(add hash) → groupby(hash) → first-by-id. The kept row
    set is deterministic (min id), matching a SQL
    ``row_number() over (partition by text order by id) = 1`` oracle.
    """

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    with_hash = ds.map_batches(
        lambda b: add_content_hash(b, col), batch_format="pyarrow"
    )
    return (
        with_hash.groupby("content_hash")
        .map_groups(keep_first, batch_format="pandas")
        .drop_columns(["content_hash"])
    )


# ----------------------------------------------------------------- MinHash
def _doc_shingle_hashes(texts: List[Optional[str]], k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Flat char-k-gram hash array + doc start offsets.

    Shingle strings for the whole batch are assembled into ONE flat
    Arrow array and hashed in a single vectorized call; only the
    slicing loop is Python (cheap string slicing, no hashing per row).
    """
    flat: List[str] = []
    starts = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        t = (t or "").lower()
        n_sh = max(1, len(t) - k + 1)
        flat.extend(t[j : j + k] for j in range(0, max(1, len(t) - k + 1)))
        starts[i + 1] = starts[i] + n_sh
    h = hash64(pa.array(flat, type=pa.large_string()), 0x51A17)
    return h, starts


class MinHasher:
    """Actor-pool stage: MinHash signatures + LSH band keys per doc.

    ``num_perm`` permutations via affine transforms ``(a*h + b) mod p``
    of one base hash (standard one-hash MinHash); ``bands`` LSH bands of
    ``num_perm/bands`` rows each. Emits per input row: doc id, the
    signature (fixed-size list), and ``bands`` band-hash columns rolled
    into (band, band_hash) rows by :func:`lsh_candidates`.
    """

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
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signatures(self, texts: List[Optional[str]]) -> np.ndarray:
        h, starts = _doc_shingle_hashes(texts, self.k)
        h61 = (h % np.uint64(_MERSENNE)).astype(np.uint64)
        sig = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        red_starts = starts[:-1]
        for p in range(self.num_perm):
            v = (self.a[p] * h61 + self.b[p]) % np.uint64(_MERSENNE)
            sig[:, p] = np.minimum.reduceat(v, red_starts)
        return sig

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """(n_docs, bands) uint64 — hash of each band's signature rows."""
        n = sig.shape[0]
        out = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            chunk = sig[:, b * self.rows_per_band : (b + 1) * self.rows_per_band]
            acc = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
            for r in range(self.rows_per_band):
                acc = (acc ^ chunk[:, r]) * np.uint64(0x100000001B3)
            out[:, b] = acc
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = np.asarray(batch.column(self.id_col))
        sig = self.signatures(texts)
        bh = self.band_hashes(sig)
        n = len(texts)
        # explode: one row per (doc, band)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.bands)),
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
            "sig": pa.array(
                list(np.repeat(sig, self.bands, axis=0).astype(np.int64)),
                type=pa.list_(pa.int64(), self.num_perm),
            ),
        })


def lsh_candidate_pairs(ds, num_perm: int = 128, bands: int = 32,
                        shingle_k: int = 5, text_col: str = "text",
                        id_col: str = "doc_id", concurrency: Optional[int] = None):
    """documents → (band,band_hash) groups → candidate doc-id pairs with
    their signature-estimated Jaccard."""
    kwargs = {"batch_format": "pyarrow"}
    if concurrency:
        kwargs["concurrency"] = concurrency
        exploded = ds.map_batches(
            MinHasher, fn_constructor_kwargs=dict(
                num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                text_col=text_col, id_col=id_col), **kwargs)
    else:
        mh = MinHasher(num_perm, bands, shingle_k, text_col, id_col)
        exploded = ds.map_batches(mh, **kwargs)

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sigs = np.stack(g["sig"].to_numpy())
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i]); out_b.append(ids[j])
                out_j.append(float((sigs[i] == sigs[j]).mean()))
        return pd.DataFrame({"a": out_a, "b": out_b, "est_jaccard": out_j})

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        pairs_in_group, batch_format="pandas"
    )
    return pairs


def minhash_dedup(ds, threshold: float = 0.8, num_perm: int = 128,
                  bands: int = 32, shingle_k: int = 5,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Near-dup removal: keep one representative (min id) per connected
    component of the ≥threshold candidate graph. Returns (deduped_ds,
    dup_map) where dup_map maps removed id → kept id."""
    pairs = lsh_candidate_pairs(ds, num_perm, bands, shingle_k, text_col, id_col)
    edges = pairs.to_pandas()
    if edges.empty or "est_jaccard" not in edges.columns:
        return ds, {}
    edges = edges.drop_duplicates(subset=["a", "b"])
    edges = edges[edges["est_jaccard"] >= threshold]
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
                       id_col: str = "doc_id"):
    """SimHash near-dup candidate pairs: 4×16-bit chunk LSH (two equal
    chunks guaranteed when hamming ≤ 3 — pigeonhole over 4 chunks),
    verified by full 64-bit hamming distance."""

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        sh = simhash64(texts)
        ids = np.asarray(batch.column(id_col))
        chunk = np.stack([(sh >> np.uint64(16 * c)) & np.uint64(0xFFFF) for c in range(4)], axis=1)
        return pa.table({
            id_col: pa.array(np.repeat(ids, 4)),
            "chunk": pa.array(np.tile(np.arange(4, dtype=np.int32), len(ids))),
            "chunk_val": pa.array(chunk.reshape(-1).astype(np.int64)),
            "simhash": pa.array(np.repeat(sh.astype(np.int64), 4)),
        })

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            d = hamming64(sh[i], sh[i + 1 :])
            ok = np.flatnonzero(d <= max_hamming)
            for j in ok:
                out_a.append(ids[i]); out_b.append(ids[i + 1 + j]); out_h.append(int(d[j]))
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    exploded = ds.map_batches(sigs, batch_format="pyarrow")
    return exploded.groupby(["chunk", "chunk_val"]).map_groups(
        pairs_in_group, batch_format="pandas"
    )


# ------------------------------------------------------------ exact verify
def ngram_jaccard(a: str, b: str, n: int = 5) -> float:
    """Exact char-n-gram Jaccard — the verify step behind MinHash."""
    sa = {a[i : i + n] for i in range(max(1, len(a) - n + 1))}
    sb = {b[i : i + n] for i in range(max(1, len(b) - n + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
