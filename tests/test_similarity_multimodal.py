"""ANN similarity + multimodal plumbing contracts."""

import numpy as np
import pyarrow as pa
import pytest


def test_topk_cosine_matches_oracle(ray_session, sf_dir, duck):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import topk_cosine

    q = np.array(duck.sql("select embedding from embeddings where vec_id=0").fetchone()[0])
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mine = topk_cosine(emb, q, k=8)["vec_id"].tolist()
    theirs = [r[0] for r in duck.sql("""
        select vec_id from (
          select vec_id, list_cosine_similarity(embedding,
            (select embedding from embeddings where vec_id=0)) s
          from embeddings order by s desc, vec_id limit 8)
    """).fetchall()]
    assert mine == theirs
    assert mine[0] == 0  # query vector is its own nearest neighbor


def test_ivf_index_build_and_search(ray_session, sf_dir, duck, tmp_path):
    import ray.data as rd

    from presto_bloomfilter_ray.functions import IVFIndex

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    idx = IVFIndex(str(tmp_path / "ivf"), ncentroids=4).build(
        emb, sample_fraction=0.5
    )
    q = np.array(duck.sql("select embedding from embeddings where vec_id=7").fetchone()[0])
    res = idx.search(q, k=5, nprobe=2)
    assert len(res) == 5
    assert res["vec_id"].iloc[0] == 7  # finds the query row itself
    assert res["score"].iloc[0] == pytest.approx(1.0, abs=1e-5)


def test_centroid_sample_bounded_by_row_budget(ray_session):
    """Round-2 verdict #2: centroid sampling must materialize at most
    ``max_sample_rows`` rows on the driver regardless of corpus size
    or fraction — a bare fraction pulls terabytes at 10^10 vectors."""
    import ray.data as rd

    from presto_bloomfilter_ray.functions.similarity import (
        _bounded_sample_matrix,
        _sample_centroids,
    )

    rng = np.random.default_rng(3)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(5000, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(rng.normal(size=5000 * 8).astype(np.float32)), 8),
    })
    ds = rd.from_arrow(tbl)
    m = _bounded_sample_matrix(ds, "embedding", sample_fraction=1.0,
                               max_sample_rows=200, seed=7)
    assert m.shape[0] <= 200
    c = _sample_centroids(ds, "embedding", ncentroids=4,
                          sample_fraction=1.0, max_sample_rows=200)
    assert c.shape == (4, 8)
    assert np.allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-5)


def test_image_decode_stage_plumbing(ray_session):
    import ray.data as rd

    from presto_bloomfilter_ray.functions.multimodal import (
        ImageDecode,
        ImageFeatures,
        decode_images,
    )

    ds = rd.from_items([{"id": i, "data": bytes([i] * 50)} for i in range(20)])
    feat = decode_images(ds, concurrency=1, batch_size=8).map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=8, concurrency=1
    )
    rows = feat.take_all()
    assert len(rows) == 20
    assert len(rows[0]["pixels"]) == 32 * 32 * 3
    assert len(rows[0]["features"]) == 6
    # deterministic fake decode: same bytes → same pixels
    d1 = ImageDecode()(pa.table({"data": [b"abc"]})).column("pixels").to_pylist()
    d2 = ImageDecode()(pa.table({"data": [b"abc"]})).column("pixels").to_pylist()
    assert d1 == d2


def test_strict_stub_raises():
    from presto_bloomfilter_ray.functions.multimodal import AudioFrameSample, ImageDecode

    with pytest.raises(NotImplementedError):
        ImageDecode(strict=True)(pa.table({"data": [b"x"]}))
    with pytest.raises(NotImplementedError):
        AudioFrameSample(strict=True)(pa.table({"data": [b"x"]}))


def test_video_frame_sample_stub(ray_session):
    import ray.data as rd

    from presto_bloomfilter_ray.functions.multimodal import VideoFrameSample

    ds = rd.from_items([{"id": i, "data": bytes([i] * 64)} for i in range(10)])
    out = ds.map_batches(VideoFrameSample, batch_format="pyarrow",
                         batch_size=4, concurrency=1).take_all()
    assert len(out) == 10
    assert len(out[0]["frames"]) == 4 * 16 * 16 * 3
    with pytest.raises(NotImplementedError):
        VideoFrameSample(strict=True)(pa.table({"data": [b"x"]}))
