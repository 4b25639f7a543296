"""Multimodal column plumbing: image/audio/video as opaque binary.

Decode is REAL wherever the container allows and a documented
deterministic fake only as last resort. Resolution order per payload:

* **image** — (1) pure-numpy P6 PPM parser (no deps, always on);
  (2) PIL when importable (``pip install pillow`` in deployments);
  (3) ``strict=True`` → ``NotImplementedError``; (4) deterministic
  fake derived from the content digest.
* **audio** — (1) stdlib ``wave`` for RIFF/PCM WAV payloads (real
  per-window RMS energies, no deps); (2) strict raise / fake.
* **video** — (1) concatenated-P6-PPM frame streams (a documented raw
  format, decodable with no deps); (2) PyAV when importable;
  (3) strict raise / fake.

The fake paths keep the Ray-side plumbing — schema handling,
actor-pool signature, small-batch sizing for large binary payloads,
output layout — real and testable end-to-end even with no codecs in
the image.

Stage contract: callable classes for ``map_batches(Cls, concurrency=N,
batch_size=SMALL)``; binary columns stay in ``batch_format="pyarrow"``
(Arrow handles large_binary zero-copy; pandas would objectify them).
"""

from __future__ import annotations

import hashlib
import io
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

try:  # optional: real image codecs (jpeg/png/...)
    from PIL import Image as _PILImage
except ImportError:  # container has no PIL — PPM/strict/fake paths only
    _PILImage = None

try:  # optional: real video/audio containers (mp4/mkv/...)
    import av as _av
except ImportError:
    _av = None

#: large binary payloads → small batches so batch × concurrency fits the
#: worker heap (guide: memory-aware batch sizing)
DEFAULT_BINARY_BATCH = 64


def _fake_pixels(data: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic fake decode: seeded by content digest."""
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------- real decoders

def _parse_ppm(data: bytes, offset: int = 0
               ) -> Optional[Tuple[np.ndarray, int]]:
    """Parse one binary P6 PPM image at ``offset`` → ((h, w, 3) uint8,
    end offset), or None if the bytes there are not a maxval-255 P6."""
    if data[offset:offset + 2] != b"P6":
        return None
    i, vals = offset + 2, []
    n = len(data)
    while len(vals) < 3:
        while i < n and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":  # comment runs to end of line
            j = data.find(b"\n", i)
            if j < 0:
                return None
            i = j + 1
            continue
        j = i
        while j < n and not data[j:j + 1].isspace():
            j += 1
        tok = data[i:j]
        if not tok.isdigit():
            return None
        vals.append(int(tok))
        i = j
    i += 1  # exactly one whitespace byte separates maxval from raster
    w, h, maxv = vals
    if maxv != 255 or w <= 0 or h <= 0:
        return None
    need = w * h * 3
    if n - i < need:
        return None
    img = np.frombuffer(data, np.uint8, need, i).reshape(h, w, 3)
    return img, i + need


def _resize_nn(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize — dependency-free, deterministic."""
    ys = (np.arange(h) * img.shape[0]) // h
    xs = (np.arange(w) * img.shape[1]) // w
    return np.ascontiguousarray(img[ys][:, xs])


def _decode_wav(data: bytes) -> Optional[np.ndarray]:
    """RIFF/PCM WAV → mono float64 samples in [-1, 1] via stdlib
    ``wave`` (a REAL decode, no ffmpeg needed), or None."""
    import wave

    if not data.startswith(b"RIFF"):
        return None
    try:
        with wave.open(io.BytesIO(data)) as wf:
            sw, ch = wf.getsampwidth(), wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
    except Exception:
        return None
    if sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, "u1").astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    if ch > 1 and len(x):
        x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1)
    return x


def _uniform_sample(n_avail: int, n_want: int) -> np.ndarray:
    """Indices of ``n_want`` uniformly-spaced picks from ``n_avail``
    items (repeats when n_avail < n_want)."""
    return (np.arange(n_want) * n_avail) // max(1, n_want)


# ------------------------------------------------------------------- stages

class ImageDecode:
    """binary → fixed-size RGB tensor column.

    Real decode for P6 PPM payloads (pure numpy) and — when PIL is
    importable — any format PIL reads; ``strict=True`` raises on
    undecodable payloads instead of faking.
    """

    def __init__(self, height: int = 32, width: int = 32,
                 data_col: str = "data", out_col: str = "pixels",
                 strict: bool = False):
        self.h, self.w = height, width
        self.data_col, self.out_col = data_col, out_col
        self.strict = strict

    def _decode(self, data: bytes) -> np.ndarray:
        parsed = _parse_ppm(data)
        if parsed is not None:
            return _resize_nn(parsed[0], self.h, self.w)
        if _PILImage is not None:
            try:
                img = _PILImage.open(io.BytesIO(data)).convert("RGB")
                return np.asarray(img.resize((self.w, self.h)),
                                  dtype=np.uint8)
            except Exception:
                pass  # not a PIL-readable payload → strict/fake below
        if self.strict:
            raise NotImplementedError(
                "image payload is not P6 PPM and PIL is not available "
                "in this container — cannot decode in strict mode")
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
    """binary audio → per-window energies (``fixed_size_list<float>``).

    REAL decode for RIFF/PCM WAV via stdlib ``wave``: the signal is
    split into ``n_frames`` contiguous windows and each emits its RMS
    energy. Non-WAV payloads: strict raise or deterministic fake.
    """

    def __init__(self, n_frames: int = 16, data_col: str = "data",
                 out_col: str = "frame_energy", strict: bool = False):
        self.n_frames = n_frames
        self.data_col, self.out_col = data_col, out_col
        self.strict = strict

    def _energies(self, data: bytes) -> np.ndarray:
        x = _decode_wav(data)
        if x is not None:
            if not len(x):
                return np.zeros(self.n_frames, dtype=np.float32)
            return np.array(
                [np.sqrt(np.mean(win * win)) if len(win) else 0.0
                 for win in np.array_split(x, self.n_frames)],
                dtype=np.float32)
        if self.strict:
            raise NotImplementedError(
                "audio payload is not PCM WAV and no codec library is "
                "available in this container — cannot decode in strict mode")
        return (_fake_pixels(data, 1, self.n_frames)
                .ravel()[: self.n_frames] / 255.0).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.data_col).to_pylist()
        out = np.stack([self._energies(b or b"") for b in blobs])
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(out.ravel(), type=pa.float32()), self.n_frames
        )
        return batch.append_column(self.out_col, col)


class VideoFrameSample:
    """binary video → ``n_frames`` uniformly-sampled RGB frames as one
    fixed_size_list<uint8> of n_frames × h × w × 3 per row.

    REAL decode for (a) concatenated-P6-PPM frame streams (a
    documented dependency-free raw format) and (b) — when PyAV is
    importable — any container ffmpeg reads. Otherwise strict raise or
    deterministic fake.
    """

    def __init__(self, n_frames: int = 4, height: int = 16, width: int = 16,
                 data_col: str = "data", out_col: str = "frames",
                 strict: bool = False):
        self.n_frames, self.h, self.w = n_frames, height, width
        self.data_col, self.out_col = data_col, out_col
        self.strict = strict

    def _frames(self, data: bytes) -> np.ndarray:
        per_frame = self.h * self.w * 3
        frames = []
        if data[:2] == b"P6":  # concatenated PPM stream
            off = 0
            while True:
                parsed = _parse_ppm(data, off)
                if parsed is None:
                    break
                frames.append(parsed[0])
                off = parsed[1]
        elif _av is not None:
            try:
                with _av.open(io.BytesIO(data)) as container:
                    frames = [f.to_ndarray(format="rgb24")
                              for f in container.decode(video=0)]
            except Exception:
                frames = []
        if frames:
            pick = _uniform_sample(len(frames), self.n_frames)
            return np.concatenate(
                [_resize_nn(frames[i], self.h, self.w).reshape(-1)
                 for i in pick])
        if self.strict:
            raise NotImplementedError(
                "video payload is not a PPM frame stream and PyAV is not "
                "available in this container — cannot decode in strict mode")
        return _fake_pixels(
            data, self.n_frames * self.h, self.w).reshape(-1)[
            : self.n_frames * per_frame]

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.data_col).to_pylist()
        per = self.n_frames * self.h * self.w * 3
        out = np.stack([self._frames(b or b"") for b in blobs])
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
