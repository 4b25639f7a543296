"""REAL multimodal decode paths (functions/multimodal.py): pure-numpy
P6 PPM images, stdlib-wave PCM audio, concatenated-PPM video streams —
plus skip-marked PIL/PyAV tests for containers that have the codecs."""

import io
import wave

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions.multimodal import (
    AudioFrameSample,
    ImageDecode,
    VideoFrameSample,
    _parse_ppm,
)

_HAS_PIL = True
try:
    from PIL import Image
except ImportError:
    _HAS_PIL = False

_HAS_AV = True
try:
    import av  # noqa: F401
except ImportError:
    _HAS_AV = False


def _ppm(img: np.ndarray, comment: bool = False) -> bytes:
    h, w, _ = img.shape
    head = b"P6\n" + (b"# synthetic\n" if comment else b"")
    return head + f"{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def _wav(samples: np.ndarray, channels: int = 1, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        ints = np.clip(samples * 32767, -32768, 32767).astype("<i2")
        wf.writeframes(ints.tobytes())
    return buf.getvalue()


def test_ppm_roundtrip_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    for comment in (False, True):
        parsed = _parse_ppm(_ppm(img, comment=comment))
        assert parsed is not None
        got, end = parsed
        assert np.array_equal(got, img)
        assert end == len(_ppm(img, comment=comment))
    # native-size decode through the stage is bit-exact, even strict
    out = ImageDecode(height=8, width=6, strict=True)(
        pa.table({"data": [_ppm(img)]}))
    pix = np.asarray(out.column("pixels").combine_chunks().flatten()
                     ).reshape(8, 6, 3)
    assert np.array_equal(pix, img)


def test_ppm_resize_nearest_neighbor():
    # 2x2 quadrant image upscaled 2x: each quadrant becomes a 2x2 block
    img = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [255, 255, 0]]], dtype=np.uint8)
    out = ImageDecode(height=4, width=4, strict=True)(
        pa.table({"data": [_ppm(img)]}))
    pix = np.asarray(out.column("pixels").combine_chunks().flatten()
                     ).reshape(4, 4, 3)
    assert np.array_equal(pix[:2, :2], np.broadcast_to([255, 0, 0], (2, 2, 3)))
    assert np.array_equal(pix[2:, 2:], np.broadcast_to([255, 255, 0], (2, 2, 3)))


def test_truncated_or_bogus_ppm_rejected():
    img = np.zeros((4, 4, 3), np.uint8)
    good = _ppm(img)
    assert _parse_ppm(good[:-5]) is None          # raster cut short
    assert _parse_ppm(b"P6\n4 4\n65535\n" + bytes(96)) is None  # 16-bit
    with pytest.raises(NotImplementedError, match="strict"):
        ImageDecode(strict=True)(pa.table({"data": [good[:-5]]}))


def test_wav_window_rms():
    # 4 windows of constant amplitude 0.0 / 0.5 / 1.0 / 0.25
    amps = [0.0, 0.5, 1.0, 0.25]
    x = np.concatenate([np.full(200, a) for a in amps])
    out = AudioFrameSample(n_frames=4, strict=True)(
        pa.table({"data": [_wav(x)]}))
    got = np.asarray(out.column("frame_energy").combine_chunks().flatten())
    assert np.allclose(got, amps, atol=2e-3)


def test_wav_stereo_downmix():
    # L = +0.8, R = -0.8 → mono mean 0 → zero RMS everywhere
    n = 400
    inter = np.empty(2 * n)
    inter[0::2], inter[1::2] = 0.8, -0.8
    out = AudioFrameSample(n_frames=4, strict=True)(
        pa.table({"data": [_wav(inter, channels=2)]}))
    got = np.asarray(out.column("frame_energy").combine_chunks().flatten())
    assert np.allclose(got, 0.0, atol=2e-3)
    with pytest.raises(NotImplementedError, match="strict"):
        AudioFrameSample(strict=True)(pa.table({"data": [b"not-audio"]}))


def test_video_ppm_stream_uniform_sampling():
    # 4 solid-color frames; sampling 2 of 4 picks frames 0 and 2
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    frames = [np.broadcast_to(np.array(c, np.uint8), (4, 4, 3)).copy()
              for c in colors]
    stream = b"".join(_ppm(f) for f in frames)
    out = VideoFrameSample(n_frames=2, height=4, width=4, strict=True)(
        pa.table({"data": [stream]}))
    got = np.asarray(out.column("frames").combine_chunks().flatten()
                     ).reshape(2, 4, 4, 3)
    assert np.array_equal(got[0], frames[0])
    assert np.array_equal(got[1], frames[2])
    with pytest.raises(NotImplementedError, match="strict"):
        VideoFrameSample(strict=True)(pa.table({"data": [b"mp4?"]}))


def test_real_decode_through_actor_pool(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (5, 7, 3), dtype=np.uint8) for _ in range(6)]
    ds = rd.from_items([{"img_id": i, "data": _ppm(im)}
                        for i, im in enumerate(imgs)])
    out = (ds.map_batches(ImageDecode, batch_format="pyarrow", batch_size=2,
                          concurrency=2,
                          fn_constructor_kwargs=dict(height=5, width=7,
                                                     strict=True))
           .to_pandas().sort_values("img_id"))
    for i, im in enumerate(imgs):
        assert np.array_equal(
            np.asarray(out["pixels"].iloc[i]).reshape(5, 7, 3), im)


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed in this container")
def test_pil_decode_png(ray_session):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    out = ImageDecode(height=10, width=10, strict=True)(
        pa.table({"data": [buf.getvalue()]}))
    pix = np.asarray(out.column("pixels").combine_chunks().flatten()
                     ).reshape(10, 10, 3)
    assert np.array_equal(pix, img)


@pytest.mark.skipif(not _HAS_AV, reason="PyAV not installed in this container")
def test_av_decode_video(ray_session):
    import av as _real_av

    buf = io.BytesIO()
    with _real_av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width = stream.height = 16
        stream.pix_fmt = "yuv420p"
        for _ in range(8):
            frame = _real_av.VideoFrame.from_ndarray(
                np.zeros((16, 16, 3), np.uint8), format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    out = VideoFrameSample(n_frames=2, height=16, width=16, strict=True)(
        pa.table({"data": [buf.getvalue()]}))
    assert out.column("frames").combine_chunks().flatten().length() \
        == 2 * 16 * 16 * 3
