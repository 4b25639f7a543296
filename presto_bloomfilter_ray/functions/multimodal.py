"""Multimodal column plumbing: image/audio/video as opaque binary.

The decode libraries (PIL, torchaudio, ffmpeg) are NOT in this
container, so the decode kernels are stubbed two ways:

* ``strict=True`` → ``NotImplementedError`` (clearly-marked stub);
* default → a deterministic fake decode (shape + checksum derived from
  the bytes), so the Ray-side plumbing — schema handling, actor-pool
  signature, small-batch sizing for large binary payloads, output
  layout — is real and testable end-to-end.

Stage contract: callable classes for ``map_batches(Cls, concurrency=N,
batch_size=SMALL)``; binary columns stay in ``batch_format="pyarrow"``
(Arrow handles large_binary zero-copy; pandas would objectify them).
"""

from __future__ import annotations

import hashlib
import numpy as np
import pyarrow as pa

#: large binary payloads → small batches so batch × concurrency fits the
#: worker heap (guide: memory-aware batch sizing)
DEFAULT_BINARY_BATCH = 64


def _fake_pixels(data: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic fake decode: seeded by content digest."""
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class ImageDecode:
    """binary → fixed-size RGB tensor column (stub decode).

    Real deployments replace ``_decode`` with PIL/turbojpeg; everything
    else (schema: fixed_size_list<uint8>, batch sizing, actor pool) is
    production plumbing.
    """

    def __init__(self, height: int = 32, width: int = 32,
                 data_col: str = "data", out_col: str = "pixels",
                 strict: bool = False):
        self.h, self.w = height, width
        self.data_col, self.out_col = data_col, out_col
        self.strict = strict

    def _decode(self, data: bytes) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "image decode requires PIL/libjpeg — not available in this container"
            )
        return _fake_pixels(data, self.h, self.w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.data_col).to_pylist()
        pix = np.stack([self._decode(b or b"") for b in blobs]).reshape(len(blobs), -1)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(pix.ravel(), type=pa.uint8()), self.h * self.w * 3
        )
        return batch.append_column(self.out_col, col)


class ImageFeatures:
    """pixels → small float feature vector (channel means/stds) — the
    shape of a batched model-inference stage (model load in __init__)."""

    def __init__(self, pixels_col: str = "pixels", out_col: str = "features",
                 height: int = 32, width: int = 32):
        self.pixels_col, self.out_col = pixels_col, out_col
        self.h, self.w = height, width

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch.column(self.pixels_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = np.asarray(arr.flatten(), dtype=np.float32)
        imgs = flat.reshape(len(arr), self.h * self.w, 3)
        feats = np.concatenate([imgs.mean(axis=1), imgs.std(axis=1)], axis=1)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), type=pa.float32()), feats.shape[1]
        )
        return batch.append_column(self.out_col, col)


class AudioFrameSample:
    """binary audio → fixed number of frame offsets + fake energies.

    Stub for frame-sampling stages (ffmpeg absent); emits a
    deterministic ``list<float>`` energy row per input.
    """

    def __init__(self, n_frames: int = 16, data_col: str = "data",
                 out_col: str = "frame_energy", strict: bool = False):
        self.n_frames = n_frames
        self.data_col, self.out_col = data_col, out_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires ffmpeg — not available in this container"
            )
        blobs = batch.column(self.data_col).to_pylist()
        out = np.stack([
            _fake_pixels(b or b"", 1, self.n_frames).ravel()[: self.n_frames] / 255.0
            for b in blobs
        ]).astype(np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(out.ravel(), type=pa.float32()), self.n_frames
        )
        return batch.append_column(self.out_col, col)


class VideoFrameSample:
    """binary video → n uniformly-sampled fake frames (stub decode;
    ffmpeg absent). Emits ``frames`` as fixed_size_list<uint8> of
    n_frames × h × w × 3 — the schema/batch contract of a real frame
    sampler, exercised end-to-end by tests."""

    def __init__(self, n_frames: int = 4, height: int = 16, width: int = 16,
                 data_col: str = "data", out_col: str = "frames",
                 strict: bool = False):
        self.n_frames, self.h, self.w = n_frames, height, width
        self.data_col, self.out_col = data_col, out_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "video decode requires ffmpeg — not available in this container"
            )
        blobs = batch.column(self.data_col).to_pylist()
        per = self.n_frames * self.h * self.w * 3
        out = np.stack([
            _fake_pixels(b or b"", self.n_frames * self.h, self.w).reshape(-1)[:per]
            for b in blobs
        ])
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(out.ravel(), type=pa.uint8()), per
        )
        return batch.append_column(self.out_col, col)


def decode_images(ds, height: int = 32, width: int = 32, data_col: str = "data",
                  concurrency: int = 2, batch_size: int = DEFAULT_BINARY_BATCH):
    """Canonical multimodal pipeline stage wiring: actor pool + small
    batches + pyarrow format for binary columns."""
    return ds.map_batches(
        ImageDecode,
        fn_constructor_kwargs=dict(height=height, width=width, data_col=data_col),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
