"""Product quantization (PQ) — compressed embeddings + asymmetric-distance ANN.

At 10^10+ vectors the exact path (:func:`.similarity.topk_cosine`) and
the IVF path both still ship / store full float32 vectors: 64-dim
float32 = 256 B/vector → 2.5 TB per 10^10 rows just for the column. PQ
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) cuts that 32×: split each vector into ``m``
subspaces, k-means each subspace to ``2**nbits`` centroids, and store
only the per-subspace centroid ids (``m`` bytes at nbits=8). Search
never decodes: a query builds one ``(m, 2**nbits)`` inner-product
lookup table (LUT) and scores a code by summing ``m`` table lookups —
the *asymmetric distance computation* (ADC) from the paper, exact on
the query side, quantized only on the database side.

Ray-Data mapping — every stage is a vectorized ``map_batches``:

- :func:`pq_train`: codebooks fit on the driver from a BOUNDED corpus
  sample (same absolute-row-budget discipline as IVF centroid
  sampling, `similarity.py:_bounded_sample_matrix`); driver state is
  ``m × 2**nbits × d/m`` floats (64 KB at d=64/m=8/nbits=8) no matter
  the corpus size.
- :func:`pq_encode`: one streaming pass; per batch the subspace
  assignment is ``m`` small matmuls + argmax, codes leave as a
  ``FixedSizeList<uint8>[m]`` column — 8 B/row on the wire instead of
  256 B. The float column never needs to exist downstream.
- :func:`pq_search`: broadcast the (tiny) LUT via closure; per batch
  score = ``lut[j, code_j]`` summed across subspaces (one fancy-index
  gather, no matmul, no decode), local top-k per batch, driver merges
  ``blocks × k`` rows.
- :func:`pq_search_refined`: standard shortlist-then-rerank — ADC
  shortlist of ``rerank`` ids, then exact cosine on just those rows
  (broadcast id set, one filtered pass). With ``rerank ≥ n`` the
  result is exactly the exact top-k by construction (test-pinned).

Vectors are L2-normalized first (``normalize=True``) so maximizing the
summed inner-product LUT ranks identically to cosine — the metric the
rest of the similarity family uses.

Reference scope note: the reference repo (RobinUS2/presto-bloomfilter)
has no vector ops; this module is part of the training-data-pipeline
surface the brief requires beyond reference parity.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import ray

from .similarity import _batch_matrix, _bounded_sample_matrix, _l2norm

__all__ = ["IVFPQIndex", "pq_train", "pq_encode", "pq_search",
           "pq_search_many", "pq_search_refined"]


def _check_dims(d: int, m: int) -> int:
    if d % m != 0:
        raise ValueError(f"vector dim {d} not divisible by m={m} subspaces")
    return d // m


def pq_train(ds, vec_col: str = "embedding", m: int = 8, nbits: int = 8, *,
             sample_fraction: float = 0.5, max_sample_rows: int = 65_536,
             iters: int = 10, seed: int = 7) -> np.ndarray:
    """Fit PQ codebooks on a bounded corpus sample.

    Returns ``codebooks`` with shape ``(m, ksub, d/m)`` float32 where
    ``ksub = min(2**nbits, sample_rows)``. Plain k-means (Lloyd) per
    subspace on the driver — the sample is capped at an absolute row
    budget, so training is constant driver memory at any corpus size.
    Deterministic for a given (input, seed).
    """
    if nbits < 1 or nbits > 8:
        raise ValueError(f"nbits must be in [1, 8] (uint8 codes), got {nbits}")
    sample = _bounded_sample_matrix(ds, vec_col, sample_fraction,
                                    max_sample_rows, seed)
    return _fit_codebooks(sample, m, nbits, iters, seed)


def _fit_codebooks(sample: np.ndarray, m: int, nbits: int, iters: int,
                   seed: int) -> np.ndarray:
    """Per-subspace Lloyd over a sample matrix (raw vectors for flat
    PQ, residuals for IVFPQ). Returns (m, ksub, d/m) float32."""
    n, d = sample.shape
    dsub = _check_dims(d, m)
    ksub = min(1 << nbits, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float32)
    for j in range(m):
        sub = np.ascontiguousarray(sample[:, j * dsub:(j + 1) * dsub])
        c = sub[rng.choice(n, size=ksub, replace=False)].copy()
        for _ in range(iters):
            # L2 assignment: argmin ||x - c||² = argmax (x·c - ||c||²/2)
            scores = sub @ c.T - 0.5 * np.einsum("ij,ij->i", c, c)[None, :]
            assign = np.argmax(scores, axis=1)
            for ci in range(ksub):
                sel = sub[assign == ci]
                if len(sel):
                    c[ci] = sel.mean(axis=0)
                # empty cells keep their centroid (bounded sample; rare)
        books[j] = c
    return books


def _encode_matrix(mat: np.ndarray, books: np.ndarray,
                   chunk: int = 8192) -> np.ndarray:
    """(n, d) float32 → (n, m) uint8 codes.

    Row-chunked so each subspace's (chunk, ksub) score matrix stays
    cache-resident: the matmul here has inner dim dsub (tiny), so the
    cost is score-matrix memory traffic, not FLOPs — full-block scores
    spill to RAM and run ~4-5× slower (measured at 125k-row blocks)."""
    m, ksub, dsub = books.shape
    n = mat.shape[0]
    mat = np.ascontiguousarray(mat)
    bias = 0.5 * np.einsum("mkd,mkd->mk", books, books)
    codes = np.empty((n, m), dtype=np.uint8)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        part = mat[lo:hi]
        for j in range(m):
            s = part[:, j * dsub:(j + 1) * dsub] @ books[j].T
            s -= bias[j][None, :]
            codes[lo:hi, j] = np.argmax(s, axis=1)
    return codes


def pq_encode(ds, codebooks: np.ndarray, vec_col: str = "embedding",
              id_col: str = "vec_id", *,
              keep_cols: Sequence[str] = ()) -> "ray.data.Dataset":
    """Encode every vector to its ``m``-byte PQ code.

    One streaming ``map_batches`` pass; output schema is
    ``(id_col, code: FixedSizeList<uint8>[m], *keep_cols)``. The
    codebooks ride to workers once via ``ray.put`` (64 KB), not per
    batch.
    """
    m = codebooks.shape[0]
    bref = ray.put(np.ascontiguousarray(codebooks))

    def enc(batch: pa.Table) -> pa.Table:
        books = ray.get(bref)
        mat = _l2norm(_batch_matrix(batch, vec_col))
        if mat.shape[0] == 0:
            empty = pa.FixedSizeListArray.from_arrays(
                pa.array([], type=pa.uint8()), m)
            cols = {id_col: batch.column(id_col), "code": empty}
            for c in keep_cols:  # schema must match non-empty batches
                cols[c] = batch.column(c)
            return pa.table(cols)
        codes = _encode_matrix(mat, books)
        code_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel()), m)
        cols = {id_col: batch.column(id_col), "code": code_arr}
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=None)


def _query_lut(query: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(m, ksub) inner-product lookup table for one normalized query."""
    m, ksub, dsub = books.shape
    q = _l2norm(np.asarray(query, dtype=np.float32).reshape(1, -1)).ravel()
    if q.size != m * dsub:
        raise ValueError(f"query dim {q.size} != codebook dim {m * dsub}")
    lut = np.empty((m, ksub), dtype=np.float32)
    for j in range(m):
        lut[j] = books[j] @ q[j * dsub:(j + 1) * dsub]
    return lut


def pq_search(codes_ds, codebooks: np.ndarray, query: np.ndarray,
              k: int = 10, id_col: str = "vec_id"):
    """ADC top-k over an encoded dataset.

    Per batch: gather ``lut[j, code_j]`` and sum across subspaces —
    no decode, no matmul; local top-k per batch; the driver merges
    ``blocks × k`` candidate rows. Returns a pandas DataFrame
    ``(id_col, adc_score)`` sorted by (-score, id) — deterministic
    ties.
    """
    lut = _query_lut(query, codebooks)
    m = codebooks.shape[0]
    lref = ray.put(lut)
    jidx = np.arange(m)

    def local_topk(batch: pa.Table) -> pa.Table:
        table = ray.get(lref)
        col = batch.column("code")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "adc_score": pa.array([], type=pa.float64())})
        codes = np.asarray(col.flatten()).reshape(n, m)
        scores = table[jidx[None, :], codes].sum(axis=1).astype(np.float64)
        ids = np.asarray(batch.column(id_col))
        top = min(k, n)
        part = np.argpartition(-scores, top - 1)[:top]
        return pa.table({id_col: pa.array(ids[part]),
                         "adc_score": pa.array(scores[part])})

    partials = codes_ds.map_batches(local_topk, batch_format="pyarrow",
                                    batch_size=None).to_pandas()
    partials = partials.sort_values(["adc_score", id_col],
                                    ascending=[False, True])
    return partials.head(k).reset_index(drop=True)


def pq_search_refined(ds, codes_ds, codebooks: np.ndarray,
                      query: np.ndarray, k: int = 10, *,
                      rerank: Optional[int] = None,
                      vec_col: str = "embedding", id_col: str = "vec_id"):
    """Shortlist-then-rerank: ADC shortlist of ``rerank`` ids from the
    compressed codes, then EXACT cosine on just those rows of the
    original dataset (broadcast id set → one filtered pass). With
    ``rerank ≥ n`` this returns exactly the exact top-k.

    ``ds`` is the float-vector dataset, ``codes_ds`` its
    :func:`pq_encode` output. Returns ``(id_col, score)`` like
    :func:`.similarity.topk_cosine`.

    Scale contract: the rerank filter is one streaming pass over
    ``ds`` — at 100 TB store the float column as id-sorted partitioned
    parquet and pass a pre-pruned ``ds`` (read only the id ranges the
    shortlist touches) so the rerank reads row groups, not the corpus;
    the shortlist itself never needs the floats.
    """
    from .similarity import topk_cosine

    rerank = max(k, rerank if rerank is not None else 8 * k)
    shortlist = pq_search(codes_ds, codebooks, query, k=rerank,
                          id_col=id_col)
    ids = set(shortlist[id_col].tolist())
    idref = ray.put(np.array(sorted(ids), dtype=np.int64))

    def keep(batch: pa.Table) -> pa.Table:
        wanted = ray.get(idref)
        got = np.asarray(batch.column(id_col))
        if wanted.size == 0 or got.size == 0:
            return batch.slice(0, 0)
        pos = np.searchsorted(wanted, got)
        pos[pos >= wanted.size] = 0
        mask = wanted[pos] == got
        return batch.filter(pa.array(mask))

    survivors = ds.map_batches(keep, batch_format="pyarrow",
                               batch_size=None)
    return topk_cosine(survivors, query, k=k, vec_col=vec_col,
                       id_col=id_col)


class IVFPQIndex:
    """IVF + residual product quantization (Jégou et al. 2011 §IV) —
    the canonical 10^10-vector ANN layout.

    ``build``: coarse centroids from a bounded sample (driver Lloyd,
    like :class:`.similarity.IVFIndex`), then PQ codebooks trained on
    the sample's RESIDUALS ``x − c(x)`` (residuals are far more
    quantizable than raw vectors: the coarse term removes the
    between-cluster variance, so the same m bytes spend their
    resolution on the within-cluster structure a flat PQ wastes on
    cluster identity). One streaming pass assigns buckets, encodes
    residual codes, and writes ``(id, code)`` partitioned parquet per
    bucket — the float column never leaves the build pass.

    ``search``: rank centroids by ``q·c``, read only the ``nprobe``
    closest code partitions (8 B/row), and ADC-score
    ``q·x ≈ q·c_b + Σ_j lut[j, code_j]`` — the per-bucket bias plus a
    residual-LUT gather; no floats are read at query time. Optional
    ``refine_ds`` reranks the shortlist with true cosine over the
    original vectors (one broadcast-id filtered pass), matching
    :func:`pq_search_refined` semantics.
    """

    def __init__(self, root: str, ncentroids: int = 16, m: int = 8,
                 nbits: int = 8):
        self.root = root
        self.ncentroids = ncentroids
        self.m = m
        self.nbits = nbits
        self.centroids: Optional[np.ndarray] = None
        self.codebooks: Optional[np.ndarray] = None

    # ---------------------------------------------------------- build
    def build(self, ds, vec_col: str = "embedding", id_col: str = "vec_id",
              sample_fraction: float = 0.5, iters: int = 8, seed: int = 7,
              max_sample_rows: int = 65_536):
        import os

        from .similarity import _lloyd

        if self.nbits < 1 or self.nbits > 8:
            raise ValueError(f"nbits must be in [1, 8], got {self.nbits}")
        sample = _bounded_sample_matrix(ds, vec_col, sample_fraction,
                                        max_sample_rows, seed)
        _check_dims(sample.shape[1], self.m)
        cents = _lloyd(sample, self.ncentroids, iters, seed)
        assign = np.argmax(sample @ cents.T, axis=1)
        resid = sample - cents[assign]
        books = _fit_codebooks(resid, self.m, self.nbits, iters, seed)
        self.centroids, self.codebooks = cents, books
        cref = ray.put(np.ascontiguousarray(cents))
        bref = ray.put(np.ascontiguousarray(books))
        m_ = self.m

        def encode(batch: pa.Table) -> pa.Table:
            cc, bb = ray.get(cref), ray.get(bref)
            mat = _l2norm(_batch_matrix(batch, vec_col))
            if mat.shape[0] == 0:
                empty = pa.FixedSizeListArray.from_arrays(
                    pa.array([], type=pa.uint8()), m_)
                return pa.table({id_col: batch.column(id_col),
                                 "code": empty,
                                 "bucket": pa.array([], type=pa.int32())})
            bkt = np.argmax(mat @ cc.T, axis=1)
            codes = _encode_matrix(mat - cc[bkt], bb)
            return pa.table({
                id_col: batch.column(id_col),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel()), m_),
                "bucket": pa.array(bkt.astype(np.int32)),
            })

        ds.map_batches(encode, batch_format="pyarrow",
                       batch_size=None).write_parquet(
            self.root, partition_cols=["bucket"])
        np.save(os.path.join(self.root, "centroids.npy"), cents)
        np.save(os.path.join(self.root, "codebooks.npy"), books)
        return self

    def _load(self):
        import os

        if self.centroids is None:
            self.centroids = np.load(
                os.path.join(self.root, "centroids.npy"))
        if self.codebooks is None:
            self.codebooks = np.load(
                os.path.join(self.root, "codebooks.npy"))
        return self.centroids, self.codebooks

    # --------------------------------------------------------- search
    def search(self, query: np.ndarray, k: int = 10, nprobe: int = 4,
               id_col: str = "vec_id", refine_ds=None,
               vec_col: str = "embedding", rerank: Optional[int] = None):
        import glob as _glob
        import os

        import pandas as pd
        import ray.data as rd

        cents, books = self._load()
        q = _l2norm(np.asarray(query, dtype=np.float32).reshape(1, -1)).ravel()
        if q.size != cents.shape[1]:
            raise ValueError(
                f"query dim {q.size} != index dim {cents.shape[1]}")
        qc = (cents @ q).astype(np.float32)          # per-bucket bias q·c_b
        order = np.argsort(-qc)[: min(nprobe, len(cents))]
        paths = []
        for b in order:
            paths.extend(sorted(_glob.glob(
                os.path.join(self.root, f"bucket={int(b)}", "*.parquet"))))
        if not paths:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        lut = _query_lut(q, books)                    # residual LUT
        m_ = books.shape[0]
        lref = ray.put(lut)
        qcref = ray.put(qc)
        # with a rerank stage, shortlist 8·k by default (matching
        # pq_search_refined) so exact rerank can RECOVER ADC misses,
        # not just reorder the k ADC winners
        if refine_ds is not None and rerank is None:
            rerank = 8 * k
        kk = max(k, rerank or 0)
        jidx = np.arange(m_)

        def local_topk(batch: pa.Table) -> pa.Table:
            table, bias = ray.get(lref), ray.get(qcref)
            col = batch.column("code")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n = len(col)
            if n == 0:
                return pa.table({id_col: pa.array([], type=pa.int64()),
                                 "adc_score": pa.array(
                                     [], type=pa.float64())})
            codes = np.asarray(col.flatten()).reshape(n, m_)
            bkt = np.asarray(batch.column("bucket"), dtype=np.int64)
            scores = (bias[bkt]
                      + table[jidx[None, :], codes].sum(axis=1)
                      ).astype(np.float64)
            ids = np.asarray(batch.column(id_col))
            top = min(kk, n)
            part = np.argpartition(-scores, top - 1)[:top]
            return pa.table({id_col: pa.array(ids[part]),
                             "adc_score": pa.array(scores[part])})

        partials = rd.read_parquet(paths).map_batches(
            local_topk, batch_format="pyarrow",
            batch_size=None).to_pandas()
        partials = partials.sort_values(
            ["adc_score", id_col], ascending=[False, True]).head(kk)
        if refine_ds is None:
            return partials.head(k).reset_index(drop=True)
        from .similarity import topk_cosine

        ids = np.array(sorted(set(partials[id_col].tolist())),
                       dtype=np.int64)
        idref = ray.put(ids)

        def keep(batch: pa.Table) -> pa.Table:
            wanted = ray.get(idref)
            got = np.asarray(batch.column(id_col))
            if wanted.size == 0 or got.size == 0:
                return batch.slice(0, 0)
            pos = np.searchsorted(wanted, got)
            pos[pos >= wanted.size] = 0
            return batch.filter(pa.array(wanted[pos] == got))

        survivors = refine_ds.map_batches(keep, batch_format="pyarrow",
                                          batch_size=None)
        return topk_cosine(survivors, q, k=k, vec_col=vec_col,
                           id_col=id_col)


def pq_search_many(codes_ds, codebooks: np.ndarray, queries: np.ndarray,
                   k: int = 10, id_col: str = "vec_id",
                   row_chunk: int = 65_536):
    """Batched ADC top-k: score ALL queries against each code batch in
    one pass — the building block of k-NN joins and batch retrieval
    (per-query passes would rescan the code table Q times).

    ``queries`` is ``(Q, d)``. Per batch, per subspace j, one fancy
    gather ``lut[:, j, code_j]`` accumulates a ``(Q, chunk)`` score
    block (row-chunked so it stays cache-resident, same discipline as
    :func:`_encode_matrix`); per-batch top-k per query ships
    ``blocks × Q × k`` candidate rows to the driver. Returns a pandas
    DataFrame ``(query_idx, vec_id, adc_score)`` with k rows per
    query, sorted by (query_idx, -score, id) — deterministic ties.

    Sizing: worker memory per batch is ``Q × row_chunk × 4`` bytes of
    scores plus the ``Q × m × ksub`` LUT stack (8 MB per 1k queries at
    m=8/ksub=256). For ~10^5+ queries, chunk the QUERY axis on the
    caller side and union the results — the code table is cheap to
    rescan once per few-thousand-query chunk.
    """
    import pandas as pd

    qs = np.asarray(queries, dtype=np.float32)
    if qs.ndim != 2:
        raise ValueError(f"queries must be (Q, d), got shape {qs.shape}")
    m, ksub, dsub = codebooks.shape
    if qs.shape[1] != m * dsub:
        raise ValueError(
            f"query dim {qs.shape[1]} != codebook dim {m * dsub}")
    Q = qs.shape[0]
    qn = _l2norm(qs)
    # (Q, m, ksub) LUT stack: lut[q, j] = books[j] @ q_sub
    luts = np.einsum("mkd,qmd->qmk", codebooks,
                     qn.reshape(Q, m, dsub)).astype(np.float32)
    lref = ray.put(np.ascontiguousarray(luts))

    def local_topk(batch: pa.Table) -> pa.Table:
        lut = ray.get(lref)
        col = batch.column("code")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({
                "query_idx": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "adc_score": pa.array([], type=pa.float64())})
        codes = np.asarray(col.flatten()).reshape(n, m)
        ids = np.asarray(batch.column(id_col))
        qi_out, id_out, sc_out = [], [], []
        for lo in range(0, n, row_chunk):
            hi = min(lo + row_chunk, n)
            part = codes[lo:hi]
            scores = np.zeros((Q, hi - lo), dtype=np.float32)
            for j in range(m):
                scores += lut[:, j, part[:, j]]
            top = min(k, hi - lo)
            sel = np.argpartition(-scores, top - 1, axis=1)[:, :top]
            qi_out.append(np.repeat(np.arange(Q, dtype=np.int64), top))
            id_out.append(ids[lo:hi][sel].ravel())
            sc_out.append(np.take_along_axis(scores, sel, axis=1)
                          .astype(np.float64).ravel())
        return pa.table({
            "query_idx": pa.array(np.concatenate(qi_out)),
            id_col: pa.array(np.concatenate(id_out)),
            "adc_score": pa.array(np.concatenate(sc_out))})

    partials = codes_ds.map_batches(local_topk, batch_format="pyarrow",
                                    batch_size=None).to_pandas()
    partials = partials.sort_values(
        ["query_idx", "adc_score", id_col],
        ascending=[True, False, True])
    return partials.groupby("query_idx", sort=True).head(k) \
                   .reset_index(drop=True)
