"""Distributed Lloyd k-means: cluster recovery on separated data,
monotone inertia, assignment parity with serial numpy, partitioning
invariance of the counts (functions/similarity.py kmeans_fit)."""

import numpy as np
import pyarrow as pa
import pytest


def _clustered(n_per: int = 120, k: int = 4, d: int = 16, seed: int = 3):
    """Well-separated spherical clusters (orthogonal-ish means)."""
    rng = np.random.default_rng(seed)
    means = np.zeros((k, d), dtype=np.float64)
    for j in range(k):
        means[j, j * (d // k):(j + 1) * (d // k)] = 3.0
    vecs, labels = [], []
    for j in range(k):
        pts = means[j] + 0.15 * rng.standard_normal((n_per, d))
        vecs.append(pts)
        labels += [j] * n_per
    m = np.concatenate(vecs)
    order = rng.permutation(len(m))
    return m[order], np.asarray(labels)[order]


def _ds(m, parallelism=4):
    import ray.data as rd

    t = pa.table({
        "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
        "embedding": pa.array(list(m.astype(np.float32)),
                              type=pa.list_(pa.float32())),
    })
    return rd.from_arrow(t).repartition(parallelism)


def test_recovers_separated_clusters(ray_session):
    from presto_bloomfilter_ray.functions import kmeans_assign, kmeans_fit

    m, truth = _clustered()
    ds = _ds(m)
    cents, info = kmeans_fit(ds, k=4, iters=5, batch_size=64)
    assert cents.shape == (4, 16)
    assert info["counts"].sum() == len(m)
    # inertia never increases
    inert = info["inertia"]
    assert all(b <= a + 1e-9 for a, b in zip(inert, inert[1:]))
    # each found cluster is pure wrt ground truth
    asn = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    got = asn["cluster"].to_numpy()
    for j in range(4):
        members = truth[got == j]
        assert len(members) > 0
        assert (members == members[0]).all()


def test_assignment_matches_serial(ray_session):
    from presto_bloomfilter_ray.functions import kmeans_assign, kmeans_fit

    m, _ = _clustered(n_per=60, k=3, d=12, seed=11)
    ds = _ds(m, parallelism=3)
    cents, _ = kmeans_fit(ds, k=3, iters=3, batch_size=50)
    asn = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    mm = m / np.linalg.norm(m, axis=1, keepdims=True)
    serial = np.argmax(mm @ cents.T.astype(np.float64), axis=1)
    assert (serial == asn["cluster"].to_numpy()).all()


def test_counts_partition_invariant(ray_session):
    from presto_bloomfilter_ray.functions import kmeans_fit

    m, _ = _clustered(n_per=50, k=4, d=16, seed=5)
    counts = []
    for par in (1, 7):
        _, info = kmeans_fit(_ds(m, parallelism=par), k=4, iters=4,
                             batch_size=32)
        counts.append(np.sort(info["counts"]))
    # same data, separated clusters: cluster SIZES agree across
    # partitionings (labels may permute with float sum order)
    assert (counts[0] == counts[1]).all()


def test_reseed_empty_clusters_unit():
    from presto_bloomfilter_ray.functions.similarity import (
        _l2norm,
        _reseed_empty_clusters,
    )

    # two live centroids along e0/e1; centroid 2 is empty and stale
    cents = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    counts = np.array([10, 2, 0], dtype=np.int64)
    # sample: points near e0, one outlier far from e0 inside cluster 0
    sample = np.array([[1.0, 0.0, 0.0], [0.9, 0.1, 0.0],
                       [0.5, 0.5, 0.0],  # farthest-from-e0 cluster-0 point
                       [0.0, 1.0, 0.0]])
    _reseed_empty_clusters(cents, counts, sample)
    expected = _l2norm(np.array([[0.5, 0.5, 0.0]]))[0]
    assert np.allclose(cents[2], expected)
    # live centroids untouched
    assert np.allclose(cents[0], [1, 0, 0]) and np.allclose(cents[1], [0, 1, 0])


def test_skewed_init_recovers_dead_centroid(ray_session):
    """Warm-start with a centroid ORTHOGONAL to every data point: it
    gets zero assignments in iteration 1 (guaranteed empty cluster);
    reseeding must put it back to work instead of leaving it dead."""
    from presto_bloomfilter_ray.functions import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(2)
    blob_a = np.array([3.0, 0, 0, 0.0]) + 0.05 * rng.standard_normal((300, 4))
    blob_b = np.array([0, 3.0, 0, 0.0]) + 0.05 * rng.standard_normal((300, 4))
    m = np.concatenate([blob_a, blob_b])
    m[:, 2] = np.abs(m[:, 2]) * 0  # data lives in the e0/e1 plane
    dead = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]])
    cents, info = kmeans_fit(_ds(m, parallelism=2), k=3, iters=5,
                             batch_size=64, init_sample_rows=128,
                             init_centroids=dead)
    asn = (kmeans_assign(_ds(m, parallelism=2), cents)
           .to_pandas().sort_values("vec_id")["cluster"].to_numpy())
    # without reseeding label 2 stays unused forever; with it all three
    # centroids end up owning points (the bigger blob splits)
    assert len(set(asn.tolist())) == 3
    assert (info["counts"] > 0).all()


def test_k_larger_than_sample(ray_session):
    from presto_bloomfilter_ray.functions import kmeans_fit

    m = np.eye(3, 8, dtype=np.float64)  # only 3 points
    cents, info = kmeans_fit(_ds(m, parallelism=1), k=5, iters=2,
                             batch_size=8)
    assert len(cents) == 3  # capped at n distinct sample rows
    assert info["counts"].sum() == 3
