"""Frequent Directions — mergeable low-rank matrix sketch over embeddings.

Published construction (Liberty 2013; Ghashami–Liberty–Phillips–Woodruff
2016): maintain ``ℓ`` orthogonal directions ``B`` such that
``‖AᵀA − BᵀB‖₂ ≤ 2·‖A‖_F² / ℓ`` for the streamed row-matrix ``A``
(here: an embedding column). The sketch is mergeable — concatenate two
sketches' rows and shrink — with the SAME bound, so it fits the
engine's map-partials → combine-tree shape unchanged and answers
"what is the corpus's embedding spectrum / how much energy do the top
directions carry?" without ever materializing the (n × d) matrix.

Like t-digest and KLL (and unlike Bloom/HLL/CM), the result is
order-dependent: merge trees agree within the published bound, not
byte-identically — ``tests/test_fd.py`` asserts the bound, and
``‖A‖_F²`` itself is tracked EXACTLY (an additive scalar) so callers
get one deterministic invariant regardless of tree shape.

Rows arrive as an Arrow ``list<float>`` / ``fixed_size_list`` column;
the update path is one ``np.vstack`` + an amortized O(ℓ·d) SVD shrink
per ℓ buffered rows — no per-row Python.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from .base import Sketch, register

KIND_FD = 12  # 11 is AMSSketch


def rows_from_arrow(array, dim: Optional[int] = None) -> np.ndarray:
    """(n, d) float64 matrix from a list<float>/fixed_size_list column.

    Null rows are dropped; ragged rows raise (an embedding column has
    one fixed dimensionality).
    """
    import pyarrow as pa

    if isinstance(array, pa.ChunkedArray):
        array = array.combine_chunks()
    if array.null_count:
        array = array.drop_null()
    if len(array) == 0:
        return np.empty((0, dim or 0), dtype=np.float64)
    if pa.types.is_fixed_size_list(array.type):
        d = array.type.list_size
        vals = np.asarray(array.values, dtype=np.float64)
        return vals.reshape(-1, d)
    offs = np.asarray(array.offsets, dtype=np.int64)
    widths = np.diff(offs)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged embedding column (rows differ in length)")
    vals = np.asarray(array.values, dtype=np.float64)
    return vals[offs[0]: offs[-1]].reshape(-1, d)


@register(KIND_FD)
class FrequentDirections(Sketch):
    __slots__ = ("ell", "dim", "B", "fsq", "_buf", "_buf_n")

    def __init__(
        self,
        ell: int = 64,
        dim: int = 64,
        _B: Optional[np.ndarray] = None,
        _fsq: float = 0.0,
    ):
        if ell < 2:
            raise ValueError("ell must be >= 2")
        self.ell = int(ell)
        self.dim = int(dim)
        self.B = _B if _B is not None else np.empty((0, self.dim), dtype=np.float64)
        self.fsq = float(_fsq)  # exact Σ‖row‖² — additive, merge-order-free
        self._buf: List[np.ndarray] = []
        self._buf_n = 0

    # ----------------------------------------------------------------- shrink
    def _shrink(self) -> None:
        parts = ([self.B] if self.B.shape[0] else []) + self._buf
        self._buf, self._buf_n = [], 0
        if not parts:
            return
        M = np.vstack(parts)
        if M.shape[0] <= self.ell:
            self.B = M
            return
        # SVD shrink: subtract σ_ℓ² from every direction's energy
        _, s, vt = np.linalg.svd(M, full_matrices=False)
        k = min(self.ell, s.size)
        delta = s[k - 1] ** 2
        s2 = np.sqrt(np.maximum(s[:k] ** 2 - delta, 0.0))
        self.B = s2[:, None] * vt[:k]

    # ----------------------------------------------------------------- update
    def update_rows(self, rows: np.ndarray) -> "FrequentDirections":
        if rows.size == 0:
            return self
        if rows.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: sketch {self.dim}, rows {rows.shape[1]}")
        self.fsq += float(np.einsum("ij,ij->", rows, rows))
        # feed in ℓ-row slices so the working matrix stays ≤ 2ℓ rows
        for lo in range(0, rows.shape[0], self.ell):
            chunk = rows[lo: lo + self.ell]
            self._buf.append(chunk)
            self._buf_n += chunk.shape[0]
            if self.B.shape[0] + self._buf_n > 2 * self.ell:
                self._shrink()
        return self

    def update_arrow(self, array) -> "FrequentDirections":
        return self.update_rows(rows_from_arrow(array, self.dim))

    # ------------------------------------------------------------------ merge
    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if not isinstance(other, FrequentDirections):
            raise TypeError("can only merge FrequentDirections with FrequentDirections")
        if (self.ell, self.dim) != (other.ell, other.dim):
            raise ValueError(
                f"incompatible FD shape (ℓ={self.ell},d={self.dim}) "
                f"vs (ℓ={other.ell},d={other.dim})"
            )
        other._shrink()
        if other.B.shape[0]:
            self._buf.append(other.B)
            self._buf_n += other.B.shape[0]
        self.fsq += other.fsq
        if self.B.shape[0] + self._buf_n > 2 * self.ell:
            self._shrink()
        return self

    # --------------------------------------------------------------- accessors
    def sketch_matrix(self) -> np.ndarray:
        """The current (≤ ℓ × d) direction matrix B (compacted)."""
        self._shrink()
        return self.B

    def singular_values(self) -> np.ndarray:
        self._shrink()
        return np.linalg.svd(self.B, compute_uv=False)

    def cov_eigvals(self) -> np.ndarray:
        """Descending eigenvalues of BᵀB — the approximate spectrum of AᵀA."""
        s = self.singular_values()
        return s ** 2

    def error_bound(self) -> float:
        """Published guarantee: ‖AᵀA − BᵀB‖₂ ≤ 2·‖A‖_F²/ℓ."""
        return 2.0 * self.fsq / self.ell

    def frobenius_sq(self) -> float:
        return self.fsq

    # --------------------------------------------------------------- envelope
    def _params(self) -> Dict[str, Any]:
        return {"ell": self.ell, "dim": self.dim, "fsq": self.fsq}

    def _payload(self) -> bytes:
        self._shrink()
        return self.B.astype(np.float64).tobytes()

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "FrequentDirections":
        B = np.frombuffer(payload, dtype=np.float64).reshape(-1, params["dim"]).copy()
        return cls(params["ell"], params["dim"], _B=B, _fsq=params["fsq"])

    def memory_bytes(self) -> int:
        return int(self.B.nbytes + sum(b.nbytes for b in self._buf))

    def __repr__(self) -> str:
        return f"FrequentDirections(ℓ={self.ell}, d={self.dim}, ‖A‖_F²={self.fsq:.1f})"
