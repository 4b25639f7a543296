"""t-digest — mergeable quantile sketch (north_rule companion).

Built to Dunning & Ertl's published t-digest design using the k1
(arcsine) scale function with *fixed* cluster boundaries
``q_i = (1 + sin(pi*(i/C - 1/2)))/2`` — the "clustering by quantile
bins" variant: boundaries depend only on the compression C, so
compression is a single vectorized sort + ``reduceat`` pass with no
per-centroid Python loop. Bins are arcsine-spaced (tiny at the tails,
~pi/(2C) at the median), giving rank error O(1/C) at mid-quantiles and
much better at the tails.

Merge = concatenate centroid lists + recompress. Estimates (not bytes)
are merge-order-stable within the published bound; tests assert rank
error, not bit-identity (FIXTURES §3).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np

from .base import KIND_TDIGEST, Sketch, register


@register(KIND_TDIGEST)
class TDigest(Sketch):
    __slots__ = ("compression", "means", "weights", "vmin", "vmax", "_bounds")

    def __init__(self, compression: int = 200,
                 _means: Optional[np.ndarray] = None,
                 _weights: Optional[np.ndarray] = None,
                 _vmin: float = math.inf, _vmax: float = -math.inf):
        self.compression = int(compression)
        self.means = _means if _means is not None else np.zeros(0, dtype=np.float64)
        self.weights = _weights if _weights is not None else np.zeros(0, dtype=np.float64)
        self.vmin = float(_vmin)
        self.vmax = float(_vmax)
        i = np.arange(self.compression + 1, dtype=np.float64)
        self._bounds = 0.5 * (1.0 + np.sin(math.pi * (i / self.compression - 0.5)))

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        if total <= 0:
            self.means = np.zeros(0); self.weights = np.zeros(0)
            return
        cum = np.cumsum(weights)
        q_mid = (cum - 0.5 * weights) / total
        bins = np.searchsorted(self._bounds[1:-1], q_mid, side="right")
        starts = np.flatnonzero(np.diff(bins)) + 1
        starts = np.concatenate(([0], starts))
        w_out = np.add.reduceat(weights, starts)
        mw_out = np.add.reduceat(means * weights, starts)
        self.means = mw_out / w_out
        self.weights = w_out

    def update_arrow(self, array) -> "TDigest":
        """Accumulate a numeric Arrow column (nulls/NaN skipped)."""
        import pyarrow as pa

        if isinstance(array, (pa.Array, pa.ChunkedArray)):
            arr = array
            if arr.null_count:
                arr = arr.drop_null()
            vals = np.asarray(arr.cast(pa.float64()))
        else:
            vals = np.asarray(array, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return self
        self.vmin = min(self.vmin, float(vals.min()))
        self.vmax = max(self.vmax, float(vals.max()))
        self._compress(np.concatenate([self.means, vals]),
                       np.concatenate([self.weights, np.ones(vals.size)]))
        return self

    def update_weighted(self, values, weights) -> "TDigest":
        """Weighted accumulate (e.g. byte-weighted latency quantiles):
        each value carries a positive weight instead of 1."""
        vals = np.asarray(values, dtype=np.float64)
        wts = np.asarray(weights, dtype=np.float64)
        keep = ~np.isnan(vals) & (wts > 0)
        vals, wts = vals[keep], wts[keep]
        if vals.size == 0:
            return self
        self.vmin = min(self.vmin, float(vals.min()))
        self.vmax = max(self.vmax, float(vals.max()))
        self._compress(np.concatenate([self.means, vals]),
                       np.concatenate([self.weights, wts]))
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if self.compression != other.compression:
            raise ValueError("incompatible t-digest compressions")
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._compress(np.concatenate([self.means, other.means]),
                       np.concatenate([self.weights, other.weights]))
        return self

    def quantile(self, q) -> np.ndarray | float:
        """Interpolated quantile estimate(s) for q in [0,1]."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.weights.size == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if scalar else out
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        xs = np.concatenate(([0.0], cum / total, [1.0]))
        ys = np.concatenate(([self.vmin], self.means, [self.vmax]))
        out = np.interp(qs, xs, ys)
        return float(out[0]) if scalar else out

    def rank_error_bound(self) -> float:
        """Half the widest (mid-quantile) bin: ~pi/(4C)."""
        return math.pi / (4.0 * self.compression)

    def _params(self) -> Dict[str, Any]:
        return {"compression": self.compression, "vmin": self.vmin, "vmax": self.vmax}

    def _payload(self) -> bytes:
        return self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def _from_parts(cls, params: Dict[str, Any], payload: bytes) -> "TDigest":
        buf = np.frombuffer(payload, dtype=np.float64)
        half = buf.size // 2
        return cls(params["compression"], _means=buf[:half].copy(),
                   _weights=buf[half:].copy(),
                   _vmin=params.get("vmin", math.inf),
                   _vmax=params.get("vmax", -math.inf))

    def __repr__(self) -> str:
        return f"TDigest(C={self.compression}, n={self.total_weight:.0f}, centroids={self.means.size})"
