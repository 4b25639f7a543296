"""Edit-distance similarity self-join — all pairs within byte-level
Levenshtein distance ``d`` (near-identical titles, urls, product
names; typo-class duplicates MinHash resemblance cannot see).

Classic q-gram filtering (Gravano et al., VLDB'01; Ed-Join family):
an edit operation touches at most ``q`` byte q-gram windows, so two
strings within distance ``d`` share at least ``max(|Da|, |Db|) - q*d``
DISTINCT q-grams (each destroyed window occurrence removes at most
one distinct gram) and differ in byte length by at most ``d``.
Candidates are exactly the pairs sharing >= 1 gram that survive the
count + length filters — plus the SHORT POOL: strings with <= q*d
distinct grams can reach distance d sharing zero grams, so they are
all-paired among themselves (bounded: only gram-poor strings qualify;
the pool is collected with a LOUD cap, never silently).

Distance is BYTE-level Levenshtein (equal to character-level on
ASCII; on multibyte UTF-8 an edited character costs up to 4 byte
edits — size ``d`` accordingly).

Scale shape (everything a Dataset, nothing corpus-sized on the
driver):

1. one map pass emits distinct ``(gram, doc)`` rows (vectorized
   rolling byte windows over the Arrow buffer, per-doc dedup via one
   ``np.unique``);
2. gram-hash-bucketed ``map_groups`` expands within-gram pairs (the
   containment module's run-rank expansion), hot grams above
   ``hot_gram_cap`` dropped LOUDLY via the returned stats;
3. a ``bucket_fold`` sums shared-distinct-gram counts per packed
   ``(a, b)`` key;
4. two co-partitioned shuffles (the `_verify_pairs` shape from
   :mod:`~.dedup`) attach each side's ``(text, n_grams)`` to its
   edges — each doc's text crosses the wire once per phase — apply
   the count/length filters, and verify survivors with a
   BATCH-VECTORIZED banded Levenshtein: the DP iterates byte rows in
   Python but each row is one numpy op over ``[pairs, 2d+1]``, so
   per-pair cost is C-speed regardless of candidate volume.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .containment import _expand_pairs
from .fold import bucket_fold

__all__ = ["edit_distance_pairs", "banded_levenshtein"]

_PACK = np.int64(1) << np.int64(31)
_INF = np.int32(1 << 20)


def _padded_bytes(texts) -> Tuple[np.ndarray, np.ndarray]:
    """(matrix [n, Lmax] uint8 zero-padded, byte lengths [n]) — built
    from the Arrow buffers with one fancy-index gather, no per-row
    Python."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    arr = texts.cast(pa.large_binary())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset: arr.offset + len(arr) + 1]
    lens = np.diff(offs)
    lmax = int(lens.max()) if len(lens) else 0
    if lmax == 0:
        return np.zeros((len(arr), 0), dtype=np.uint8), lens
    idx = offs[:-1, None] + np.arange(lmax)[None, :]
    mask = np.arange(lmax)[None, :] < lens[:, None]
    out = np.zeros((len(arr), lmax), dtype=np.uint8)
    np.copyto(out, buf[np.minimum(idx, buf.size - 1)], where=mask)
    return out, lens


def banded_levenshtein(A: np.ndarray, la: np.ndarray,
                       B: np.ndarray, lb: np.ndarray,
                       d: int) -> np.ndarray:
    """Byte-level Levenshtein per pair, capped at ``d``: returns int32
    distances with values > ``d`` clamped to ``d + 1``.

    Banded DP over columns ``k = j - i + d`` in ``[0, 2d]``; rows
    iterate in Python (max byte-length iterations) but every row is a
    vectorized op over ALL pairs, so cost is O(Lmax * pairs * d) in
    C. The only inner Python loop is over the 2d+1 band columns."""
    la = la.astype(np.int64)
    lb = lb.astype(np.int64)
    P = A.shape[0]
    res = np.full(P, d + 1, dtype=np.int32)
    if P == 0:
        return res
    w = 2 * d + 1
    ks = np.arange(w)
    # i = 0 row: D[0][j] = j for valid j in [0, lb]
    j0 = ks[None, :] - d
    prev = np.where((j0 >= 0) & (j0 <= lb[:, None]),
                    np.maximum(j0, 0), _INF).astype(np.int32)
    at = la == 0
    if at.any():
        kf = lb[at] + d
        ok = kf < w
        r = np.full(int(at.sum()), d + 1, dtype=np.int32)
        rows = np.flatnonzero(at)
        r[ok] = np.minimum(prev[rows[ok], kf[ok]], d + 1)
        res[at] = r
    lmax = int(la.max()) if P else 0
    rowsel = np.arange(P)[:, None]
    for i in range(1, lmax + 1):
        j = i + ks[None, :] - d  # j per band column at row i
        # substitution / match: prev[k] + cost(a[i-1], b[j-1])
        if B.shape[1]:
            bj = np.clip(j - 1, 0, B.shape[1] - 1)
            bchar = B[rowsel, bj]
        else:
            bchar = np.zeros((P, w), dtype=np.uint8)
        achar = (A[:, i - 1][:, None] if A.shape[1] >= i
                 else np.zeros((P, 1), dtype=np.uint8))
        diag = prev + (achar != bchar).astype(np.int32)
        # deletion from a: D[i-1][j] = prev[k+1]
        up = np.full((P, w), _INF, dtype=np.int32)
        up[:, :-1] = prev[:, 1:]
        cand = np.minimum(diag, up + 1)
        valid = (j >= 1) & (j <= lb[:, None])
        cand = np.where(valid, cand, _INF)
        cand = np.where(j == 0, i, cand)  # boundary D[i][0] = i
        # insertion into a: D[i][j-1] = cur[k-1] — left-to-right over
        # the BAND (<= 2d+1 columns), not the data
        cur = cand.copy()
        for k in range(1, w):
            np.minimum(cur[:, k], cur[:, k - 1] + 1, out=cur[:, k])
        cur = np.where(valid | (j == 0), cur, _INF)
        at = la == i
        if at.any():
            kf = lb[at] - i + d
            ok = (kf >= 0) & (kf < w)
            r = np.full(int(at.sum()), d + 1, dtype=np.int32)
            rows = np.flatnonzero(at)
            r[ok] = np.minimum(cur[rows[ok], kf[ok]], d + 1)
            res[at] = r
        live = la > i
        if not live.any():
            break
        prev = np.where(live[:, None], cur, prev)
    res[np.abs(la - lb) > d] = d + 1
    return res


def _doc_qgrams(b: pa.Table, id_col: str, text_col: str, q: int):
    """Distinct ``(gh, doc)`` gram rows + per-doc ``(doc, ng)``
    distinct-gram counts for one batch. Gram codes pack q bytes
    big-endian (q <= 7 → (doc << 56 | gram) fits int64 for the
    per-doc dedup)."""
    ids = np.asarray(b.column(id_col), dtype=np.int64)
    if len(ids) and ((ids < 0).any() or (ids >= int(_PACK)).any()):
        raise ValueError("edit_distance_pairs requires ids in [0, 2^31)")
    col = b.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_binary())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset: arr.offset + len(arr) + 1]
    ng = np.zeros(len(ids), dtype=np.int64)
    empty = pa.table({"gh": pa.array([], type=pa.int64()),
                      "doc": pa.array([], type=pa.int64())})
    if buf.size < q or len(ids) == 0:
        return empty, pa.table({"doc": pa.array(ids),
                                "ng": pa.array(ng)})
    code = np.zeros(buf.size - q + 1, dtype=np.int64)
    for j in range(q):
        code |= buf[j: buf.size - q + 1 + j].astype(np.int64) \
            << (8 * (q - 1 - j))
    idx = np.arange(code.size)
    doc_of = np.searchsorted(offs, idx, side="right") - 1
    safe = np.clip(doc_of, 0, len(arr) - 1)
    ok = (doc_of >= 0) & (doc_of < len(arr))
    ok &= (idx + q) <= offs[safe + 1]
    row = safe[ok]
    # per-doc distinct grams via one unique on packed (row << 56 | gram)
    packed = np.unique((row.astype(np.int64) << np.int64(56)) | code[ok])
    prow = (packed >> np.int64(56)).astype(np.int64)
    gh = packed & ((np.int64(1) << np.int64(56)) - np.int64(1))
    u, c = np.unique(prow, return_counts=True)
    ng[u] = c
    grams = pa.table({"gh": pa.array(gh), "doc": pa.array(ids[prow])})
    return grams, pa.table({"doc": pa.array(ids), "ng": pa.array(ng)})


class _CapCounter:
    def __init__(self):
        self.n = 0
        self.rows = 0

    def add(self, n, rows):
        self.n += int(n)
        self.rows += int(rows)

    def get(self):
        return self.n, self.rows


def edit_distance_pairs(ds, max_dist: int = 1, q: int = 3,
                        id_col: str = "doc_id", text_col: str = "text",
                        *, hot_gram_cap: int = 100_000,
                        num_buckets: int = 64, n_parts: int = 32,
                        short_pool_cap: int = 200_000):
    """All pairs ``(a, b, dist)`` with ``a < b`` and byte-level
    Levenshtein ``dist <= max_dist``. Returns ``(pairs_ds, stats)``;
    ``stats['capped_grams']`` counts hot grams dropped — 0 means the
    result is EXACT; a non-zero count means pairs whose every shared
    gram was hot may be missing (loud, never silent).

    Ids must be unique, non-negative and < 2^31. ``q`` in [2, 7]."""
    import polars as pl
    import ray

    if not (2 <= q <= 7):
        raise ValueError("q must be in [2, 7]")
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    d = int(max_dist)
    qd = q * d
    if n_parts & (n_parts - 1):  # bit_wise_and partitioner needs 2^k
        n_parts = 1 << n_parts.bit_length()

    grams = ds.map_batches(
        lambda b: _doc_qgrams(b, id_col, text_col, q)[0],
        batch_format="pyarrow", batch_size=None)

    def doc_rows(b: pa.Table) -> pa.Table:
        _, st = _doc_qgrams(b, id_col, text_col, q)
        ids = st.column("doc").cast(pa.int64())
        return pa.table({
            "key": ids,
            "other": pa.nulls(b.num_rows, pa.int64()),
            "inter": pa.nulls(b.num_rows, pa.int64()),
            "ng": st.column("ng"),
            "ng_o": pa.nulls(b.num_rows, pa.int64()),
            "txt": b.column(text_col).cast(pa.large_string()),
            "txt_o": pa.nulls(b.num_rows, pa.large_string()),
            "part": pc.bit_wise_and(ids, n_parts - 1),
        })

    # docs_tag is corpus-sized: deliberately NOT materialized — each
    # consumer re-streams the (cheap) map from the source rather than
    # pinning the whole corpus's text in the object store
    docs_tag = ds.map_batches(doc_rows, batch_format="pyarrow")

    # ---- short pool: <= q*d distinct grams can match sharing none
    def pool_rows(b: pa.Table) -> pa.Table:
        m = pc.less_equal(b.column("ng"), pa.scalar(qd, pa.int64()))
        kept = b.filter(m)
        return pa.table({"key": kept.column("key"),
                         "txt": kept.column("txt")})

    _pool_schema = pa.schema([("key", pa.int64()),
                              ("txt", pa.large_string())])
    # empty upstream blocks surface as zero-column tables — drop them
    _pool_parts = [t for t in ray.get(
        docs_tag.map_batches(pool_rows, batch_format="pyarrow",
                             batch_size=None).to_arrow_refs())
        if t.num_columns]
    pool_t = (pa.concat_tables(_pool_parts) if _pool_parts
              else _pool_schema.empty_table())
    if pool_t.num_rows > short_pool_cap:
        raise ValueError(
            f"short-string pool {pool_t.num_rows} exceeds cap "
            f"{short_pool_cap}; gram-poor strings dominate — raise "
            "short_pool_cap or pre-filter")
    pool_ids = np.sort(np.asarray(pool_t.column("key"), dtype=np.int64))
    pool_ref = ray.put(pool_ids)

    cap_counter = ray.remote(_CapCounter).remote()

    def bucket_of(b: pa.Table) -> pa.Table:
        gh = np.asarray(b.column("gh")).astype(np.uint64)
        mixed = (gh * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return b.append_column(
            "_b", pa.array((mixed % np.uint64(num_buckets)).astype(np.int64)))

    def pairs_of(g: pa.Table) -> pa.Table:
        t = pl.from_arrow(g.drop_columns(["_b"])).sort(["gh", "doc"])
        gh_v = t["gh"].to_numpy()
        doc = t["doc"].to_numpy()
        a, bb, n_cap, cap_rows = _expand_pairs(gh_v, doc, hot_gram_cap)
        if n_cap:
            ray.get(cap_counter.add.remote(n_cap, cap_rows))
        key = a * _PACK + bb
        kt = pl.DataFrame({"key": key}).group_by("key").agg(
            pl.len().cast(pl.Int64).alias("inter"))
        return kt.to_arrow()

    inter = (grams.map_batches(bucket_of, batch_format="pyarrow",
                               batch_size=None)
             .groupby("_b").map_groups(pairs_of, batch_format="pyarrow"))
    inter = bucket_fold(inter, ["key"], [("inter", "sum", "inter")],
                        num_buckets=num_buckets)

    def edge_rows(b: pa.Table) -> pa.Table:
        key = np.asarray(b.column("key"), dtype=np.int64)
        a = pa.array(key // int(_PACK))
        return pa.table({
            "key": a,
            "other": pa.array(key % int(_PACK)),
            "inter": b.column("inter").cast(pa.int64()),
            "ng": pa.nulls(b.num_rows, pa.int64()),
            "ng_o": pa.nulls(b.num_rows, pa.int64()),
            "txt": pa.nulls(b.num_rows, pa.large_string()),
            "txt_o": pa.nulls(b.num_rows, pa.large_string()),
            "part": pc.bit_wise_and(a, n_parts - 1),
        })

    # materialize edges so the hot-gram cap counts are final before
    # stats are read (pairs_of runs during THIS execution, not later)
    edges = inter.map_batches(edge_rows, batch_format="pyarrow",
                              batch_size=None).materialize()

    def _split(g: pa.Table):
        is_edge = pc.is_valid(g.column("other"))
        doc_t = g.filter(pc.invert(is_edge))
        edge_t = g.filter(is_edge)
        dkeys = np.asarray(doc_t.column("key"))
        order = np.argsort(dkeys)
        take = pa.array(order)
        return (dkeys[order], doc_t.column("txt").take(take),
                np.asarray(doc_t.column("ng"))[order], edge_t)

    def attach_a(g: pa.Table) -> pa.Table:
        dkeys, dtxt, dng, edge_t = _split(g)
        n = edge_t.num_rows
        if n == 0:
            return edge_t.select(["key", "other", "inter", "ng",
                                  "ng_o", "txt", "txt_o", "part"])
        a = np.asarray(edge_t.column("key"))
        bb = np.asarray(edge_t.column("other"))
        # pool-pool pairs are handled exhaustively by the short pool —
        # drop them here so a gram-sharing pool pair isn't emitted twice
        pids = ray.get(pool_ref)
        if pids.size:
            both = np.isin(a, pids) & np.isin(bb, pids)
            if both.any():
                edge_t = edge_t.filter(pa.array(~both))
                if edge_t.num_rows == 0:
                    return edge_t.select(["key", "other", "inter", "ng",
                                          "ng_o", "txt", "txt_o", "part"])
                a = np.asarray(edge_t.column("key"))
        n = edge_t.num_rows
        pos = np.searchsorted(dkeys, a)
        bkey = edge_t.column("other")
        return pa.table({
            "key": bkey,  # re-key by b for phase B
            "other": edge_t.column("key"),
            "inter": edge_t.column("inter"),
            "ng": pa.nulls(n, pa.int64()),
            "ng_o": pa.array(dng[pos]),
            "txt": pa.nulls(n, pa.large_string()),
            "txt_o": dtxt.take(pa.array(pos)),
            "part": pc.bit_wise_and(bkey.cast(pa.int64()), n_parts - 1),
        })

    def verify_b(g: pa.Table) -> pa.Table:
        dkeys, dtxt, dng, edge_t = _split(g)
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int32())})
        if edge_t.num_rows == 0:
            return empty
        bkey = np.asarray(edge_t.column("key"))
        pos = np.searchsorted(dkeys, bkey)
        it = np.asarray(edge_t.column("inter"), dtype=np.int64)
        nga = np.asarray(edge_t.column("ng_o"), dtype=np.int64)
        ngb = dng[pos]
        A, la = _padded_bytes(edge_t.column("txt_o"))
        B, lb = _padded_bytes(dtxt.take(pa.array(pos)))
        # count filter on DISTINCT grams (the sound bound) + length
        keep = (np.abs(la - lb) <= d) & \
               (it >= np.maximum(np.maximum(nga, ngb) - qd, 1))
        if not keep.any():
            return empty
        av = np.asarray(edge_t.column("other"))[keep]
        bv = bkey[keep]
        dist = banded_levenshtein(A[keep], la[keep], B[keep], lb[keep], d)
        ok = dist <= d
        return pa.table({"a": pa.array(av[ok]), "b": pa.array(bv[ok]),
                         "dist": pa.array(dist[ok])})

    phase_a = (
        docs_tag.union(edges)
        .repartition(n_parts)
        .groupby("part").map_groups(attach_a, batch_format="pyarrow")
    )
    verified = (
        docs_tag.union(phase_a)
        .repartition(n_parts)
        .groupby("part").map_groups(verify_b, batch_format="pyarrow")
    )

    # ---- short pool: all-pairs among the (tiny, capped) pool
    if pool_t.num_rows >= 2:
        ids = np.asarray(pool_t.column("key"), dtype=np.int64)
        M, ln = _padded_bytes(pool_t.column("txt"))
        ii, jj = np.triu_indices(len(ids), k=1)
        if ii.size:
            dist = banded_levenshtein(M[ii], ln[ii], M[jj], ln[jj], d)
            ok = dist <= d
            aa = np.minimum(ids[ii][ok], ids[jj][ok])
            bb2 = np.maximum(ids[ii][ok], ids[jj][ok])
            import ray.data as rd

            pool_ds = rd.from_arrow(pa.table({
                "a": pa.array(aa), "b": pa.array(bb2),
                "dist": pa.array(dist[ok].astype(np.int32))}))
            verified = verified.union(pool_ds)

    n_cap, cap_rows = ray.get(cap_counter.get.remote())
    return verified, {"capped_grams": n_cap, "capped_rows": cap_rows,
                      "short_pool": pool_t.num_rows}
