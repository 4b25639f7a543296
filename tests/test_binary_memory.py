"""Bounded-memory evidence for the binary-heavy actor stages: with
small-batch sizing (the multimodal DEFAULT_BINARY_BATCH contract),
per-actor Python-heap peaks stay proportional to batch_size × payload
— NOT to the dataset — while the whole oversized-payload dataset
streams through with zero object-store spilling."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions.multimodal import ImageDecode


def _ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n" + f"{w} {h}\n255\n".encode() + \
        img.astype(np.uint8).tobytes()


def test_binary_stage_heap_bounded_by_batch_size(ray_session):
    import ray
    import ray.data as rd

    # defined INSIDE the test so cloudpickle ships the class by VALUE:
    # a test-module top-level class would pickle by reference, the Ray
    # worker can't import the test module, and the actor restart loop
    # looks like a hang
    class _MeasuredDecode(ImageDecode):
        """ImageDecode + per-batch Python-heap peak (tracemalloc
        tracks the decode/resize allocations — the actor's real
        working set; the input Arrow buffers are zero-copy
        object-store views)."""

        def __init__(self, **kw):
            import tracemalloc

            tracemalloc.start()
            super().__init__(**kw)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import tracemalloc

            tracemalloc.reset_peak()
            out = super().__call__(batch)
            _, peak = tracemalloc.get_traced_memory()
            return out.append_column(
                "_heap_peak", pa.array([int(peak)] * out.num_rows))

    # 96 × ~1.6 MB payloads (~150 MB corpus) through batch_size=4:
    # at most ~6.4 MB of payload is in one actor's working set at once
    rng = np.random.default_rng(0)
    side = 720                                  # 720*720*3 ≈ 1.56 MB
    payload = _ppm(rng.integers(0, 256, (side, side, 3), dtype=np.uint8))
    n, batch = 96, 4
    t = pa.table({"img_id": pa.array(np.arange(n, dtype=np.int64)),
                  "data": pa.array([payload] * n, type=pa.large_binary())})
    ds = rd.from_arrow(t).repartition(12)

    out = ds.map_batches(
        _MeasuredDecode,
        fn_constructor_kwargs=dict(height=64, width=64),
        concurrency=2, batch_size=batch,
        batch_format="pyarrow").select_columns(["img_id", "_heap_peak"]
                                               ).to_pandas()
    assert len(out) == n
    peak = int(out["_heap_peak"].max())
    total_bytes = n * len(payload)
    # heap peak ∝ batch (payload copies + decode intermediates), with
    # generous slack — and decisively below the materialized corpus
    assert peak < 8 * batch * len(payload), peak
    assert peak < total_bytes / 2, (peak, total_bytes)

    # the streamed pass must not have pushed the object store into
    # spilling at this fixed heap: the spill directory stays empty
    import glob
    import os

    session_dir = ray._private.worker._global_node.get_session_dir_path()
    spilled = [p for p in glob.glob(
        os.path.join(session_dir, "ray_spilled_objects*", "*")) if p]
    assert spilled == [], spilled
