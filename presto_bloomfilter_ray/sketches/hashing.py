"""Vectorized element hashing for sketches.

The reference hashes elements with murmur3-128 + Kirsch–Mitzenmacher
double hashing (``BloomFilter.java:298-304``; ``g_i(x) = h1 + i*h2 mod m``).
We keep the published KM construction but source ``(h1, h2)`` from
polars' C-speed 64-bit column hash (xxhash-family, seedable,
deterministic across processes for a fixed polars version) — hashing a
whole Arrow column per call instead of a Python loop per row. The
sketch envelope carries no hash-function bytes, so cross-language byte
parity with the Java bitsets is explicitly a non-goal (SURVEY §1.4);
the behavioral contracts (no false negatives, FPP ≤ p, OR-merge
associativity) are what we preserve.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

# Ray runs one worker process per CPU; polars would otherwise start a
# full-width thread pool in EVERY worker (N^2 threads, catastrophic
# oversubscription under map_batches). One thread per worker is the
# right parallelism model here — Ray owns the cores.
os.environ.setdefault("POLARS_MAX_THREADS", "1")

try:  # polars is the fast path; baked into this environment
    import polars as pl

    _HAS_POLARS = True
except Exception:  # pragma: no cover
    _HAS_POLARS = False

# fixed seeds: (h1, h2) for KM double hashing, plus per-use-case seeds
SEED_H1 = 0x51_7CC1B7_2722_0A95
SEED_H2 = 0x2545F491_4F6C_DD1D


def _as_chunked(array) -> pa.ChunkedArray:
    if isinstance(array, pa.ChunkedArray):
        return array
    if isinstance(array, pa.Array):
        return pa.chunked_array([array])
    # python sequence fallback (tests / tiny control paths)
    return pa.chunked_array([pa.array(array)])


def normalize_elements(array, drop_empty: bool = False) -> pa.ChunkedArray:
    """Cast to a hashable element column and drop nulls.

    Mirrors the reference element model (SURVEY §1.1): every element is
    a byte string; null elements are skipped
    (``BloomFilter.java:161-163``); when ``drop_empty``, zero-length
    elements are skipped too (``BloomFilter.java:164-167``).
    Non-string inputs are cast to their canonical string form (the
    reference requires the caller to CAST to VARCHAR; we do it here so
    build and probe agree).
    """
    ca = _as_chunked(array)
    t = ca.type
    if not (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        ca = ca.cast(pa.large_string())
    if ca.null_count:
        ca = ca.drop_null()
    if drop_empty:
        import pyarrow.compute as pc

        lens = pc.binary_length(ca) if pa.types.is_binary(ca.type) or pa.types.is_large_binary(ca.type) else pc.utf8_length(ca)
        ca = ca.filter(pc.not_equal(lens, 0))
    return ca


def hash64(array, seed: int) -> np.ndarray:
    """Hash an Arrow string/binary column to uint64, vectorized.

    polars ``Series.hash`` is the hot path (C speed); the fallback is
    pandas' ``hash_array`` (also C). Both are deterministic per process
    AND across processes for fixed library versions — required because
    partial sketches built in different Ray workers must agree.
    """
    ca = _as_chunked(array)
    if _HAS_POLARS:
        s = pl.from_arrow(ca)
        if isinstance(s, pl.DataFrame):  # pragma: no cover
            s = s.to_series()
        return s.hash(seed=seed % (1 << 64)).to_numpy().astype(np.uint64, copy=False)
    from pandas.util import hash_array

    vals = ca.to_pandas().to_numpy(dtype=object)
    # pandas requires a key that utf8-encodes to exactly 16 bytes
    key = (seed % (1 << 64)).to_bytes(8, "little").hex()
    return hash_array(vals, hash_key=key).astype(np.uint64, copy=False)


def km_positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """Kirsch–Mitzenmacher ``g_i = h1 + i*h2 (mod m)`` for i in [0, k).

    Returns an (n, k) uint64 array of bit positions. h2 is forced odd so
    the stride never degenerates to 0 mod m.
    """
    h2 = h2 | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    # uint64 arithmetic wraps mod 2^64 by design; final mod m restores range
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)
