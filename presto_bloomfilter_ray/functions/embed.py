"""Embedding generation as an actor-pool ``map_batches`` stage.

Every similarity / semantic-dedup operator in this engine consumes an
``embedding`` column; this stage PRODUCES one, closing the last
assumed-precomputed input of the LLM-data pipeline. The contract is
the `multimodal.py` one:

* the stage is a callable CLASS for ``map_batches(Cls, concurrency=N,
  batch_size=B)`` — the model loads ONCE per actor in ``__init__``
  (never per batch), work happens vectorized in ``__call__``;
* a REAL model (sentence-transformers) loads behind a try-import —
  this container has no ML libs, so requesting one raises
  ``NotImplementedError`` loudly (``model=...``), exactly like
  multimodal's strict mode;
* the default is a DETERMINISTIC hashed projection (feature hashing,
  Weinberger et al. 2009): every byte trigram of the text scatters
  ``sign`` into ``tri % dim``, sign taken from the next hash bit.
  Same bytes → same vector, no model weights, exact integer
  arithmetic — so the driver query has an EXACT DuckDB oracle, and
  the Ray-side plumbing (schema, actor pool, batch sizing, output
  layout) is tested end to end.

Scale shape: pure map stage — no shuffle; batches stay Arrow
(``list_(float32())`` output column); trigram extraction is the same
zero-copy buffer walk as `trigram.py`. Size ``concurrency × num_cpus``
to the node; with a real model set ``num_gpus`` per actor instead.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

__all__ = ["DocumentEmbedder", "embed_documents"]


class DocumentEmbedder:
    """Stateful embedding stage (one instance per actor).

    ``model=None`` → the deterministic hashed-trigram projection.
    ``model="<name>"`` → load that sentence-transformers model once in
    ``__init__`` (raises ``NotImplementedError`` when the library is
    not installed — no silent fake for a requested real model).
    ``tag_actor=True`` adds an ``_actor_id`` column (the instance's
    id) so tests can prove actor reuse: #distinct ids ≤ concurrency
    no matter how many batches ran.
    """

    def __init__(self, dim: int = 64, text_col: str = "text",
                 out_col: str = "embedding",
                 model: Optional[str] = None,
                 normalize: bool = False,
                 tag_actor: bool = False):
        if dim < 1 or dim > (1 << 20):
            raise ValueError("dim out of range")
        self.dim = int(dim)
        self.text_col = text_col
        self.out_col = out_col
        self.normalize = normalize
        self.tag_actor = tag_actor
        self._model = None
        if model is not None:
            try:
                from sentence_transformers import SentenceTransformer
            except ImportError as e:  # no ML stack in this container
                raise NotImplementedError(
                    f"model={model!r} requires sentence-transformers, "
                    "which is not installed; omit `model` for the "
                    "deterministic hashed projection") from e
            self._model = SentenceTransformer(model)  # once per ACTOR
        import os
        import uuid

        self._actor_tag = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"

    # ------------------------------------------------ hashed projection
    def _hashed(self, texts) -> tuple:
        """(values float32 flat, per-row dim) — feature-hashed byte
        trigrams, exact integer accumulation before the float cast."""
        arr = texts.cast(pa.large_binary())
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        out = np.zeros((n, self.dim), dtype=np.int64)
        buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset: arr.offset + n + 1]
        if buf.size >= 3:
            tri = (buf[:-2].astype(np.int64) << 16) | \
                  (buf[1:-1].astype(np.int64) << 8) | \
                  buf[2:].astype(np.int64)
            idx = np.arange(tri.size)
            doc_of = np.searchsorted(offs, idx, side="right") - 1
            safe = np.clip(doc_of, 0, n - 1)
            ok = (doc_of >= 0) & (doc_of < n)
            ok &= (idx + 3) <= offs[safe + 1]
            t = tri[ok]
            d = safe[ok]
            bucket = t % self.dim
            sign = 1 - 2 * ((t // self.dim) & 1)   # +1 / -1
            # bincount beats np.add.at's unbuffered scatter ~10-30x;
            # integer-exact equivalent
            out = np.bincount(d * self.dim + bucket,
                              weights=sign.astype(np.float64),
                              minlength=n * self.dim) \
                .astype(np.int64).reshape(n, self.dim)
        vals = out.astype(np.float32)
        if self.normalize:
            nrm = np.linalg.norm(vals, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            vals = vals / nrm
        return vals

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if self._model is not None:
            vals = np.asarray(
                self._model.encode(texts.to_pylist(), batch_size=len(texts),
                                   normalize_embeddings=self.normalize),
                dtype=np.float32)
        else:
            vals = self._hashed(texts)
        n, dim = vals.shape
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(vals.reshape(-1)), dim).cast(pa.list_(pa.float32()))
        batch = batch.append_column(self.out_col, emb)
        if self.tag_actor:
            batch = batch.append_column(
                "_actor_id", pa.array([self._actor_tag] * n))
        return batch


def embed_documents(ds, text_col: str = "text", dim: int = 64,
                    out_col: str = "embedding",
                    model: Optional[str] = None,
                    normalize: bool = False,
                    concurrency: int = 4,
                    batch_size: Optional[int] = 4096,
                    tag_actor: bool = False):
    """Append an ``embedding`` (``list<float32>`` length ``dim``)
    column via an actor pool — model construction happens once per
    actor, not per batch. Returns the Dataset (pure map stage, no
    shuffle, streams)."""
    return ds.map_batches(
        DocumentEmbedder,
        fn_constructor_kwargs=dict(dim=dim, text_col=text_col,
                                   out_col=out_col, model=model,
                                   normalize=normalize,
                                   tag_actor=tag_actor),
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow")
