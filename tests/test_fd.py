"""Frequent Directions: published spectral bound, mergeability, Arrow I/O."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.sketches import deserialize
from presto_bloomfilter_ray.sketches.fd import FrequentDirections, rows_from_arrow


def _matrix(n=600, d=32, seed=7):
    rng = np.random.default_rng(seed)
    # strong low-rank structure + noise: the regime FD is built for
    u = rng.normal(size=(n, 3))
    v = rng.normal(size=(3, d)) * np.array([[10.0], [5.0], [2.0]])
    return u @ v + rng.normal(scale=0.5, size=(n, d))


def _spec_err(A, fd):
    G = A.T @ A
    B = fd.sketch_matrix()
    return np.linalg.norm(G - B.T @ B, ord=2)


def test_published_bound_single_pass():
    A = _matrix()
    fd = FrequentDirections(ell=16, dim=32).update_rows(A)
    assert fd.frobenius_sq() == pytest.approx((A * A).sum(), rel=1e-9)
    assert _spec_err(A, fd) <= fd.error_bound()


def test_bound_holds_across_merge_trees():
    A = _matrix(n=800)
    parts = np.array_split(A, 4)
    sks = [FrequentDirections(16, 32).update_rows(p) for p in parts]

    def clone(s):
        return deserialize(s.serialize())

    left = clone(sks[0]).merge(clone(sks[1])).merge(clone(sks[2])).merge(clone(sks[3]))
    right = clone(sks[3]).merge(clone(sks[2]).merge(clone(sks[1]).merge(clone(sks[0]))))
    for fd in (left, right):
        assert _spec_err(A, fd) <= fd.error_bound()
        assert fd.frobenius_sq() == pytest.approx((A * A).sum(), rel=1e-9)
    # fsq is additive → identical regardless of tree; B may differ (documented)
    assert left.frobenius_sq() == pytest.approx(right.frobenius_sq(), rel=1e-12)


def test_top_direction_energy_captured():
    A = _matrix(n=1000)
    fd = FrequentDirections(ell=16, dim=32).update_rows(A)
    exact = np.linalg.eigvalsh(A.T @ A)[::-1]
    approx = fd.cov_eigvals()
    # top eigenvalue within the additive spectral bound
    assert abs(approx[0] - exact[0]) <= fd.error_bound()


def test_arrow_list_and_fixed_size_list():
    A = np.arange(12, dtype=np.float64).reshape(4, 3)
    lst = pa.array(A.tolist())
    fsl = pa.array(A.tolist(), type=pa.list_(pa.float64(), 3))
    assert np.array_equal(rows_from_arrow(lst), A)
    assert np.array_equal(rows_from_arrow(fsl), A)
    with_null = pa.array([[1.0, 2.0, 3.0], None, [4.0, 5.0, 6.0]])
    assert rows_from_arrow(with_null).shape == (2, 3)
    chunked = pa.chunked_array([lst, lst])
    assert rows_from_arrow(chunked).shape == (8, 3)


def test_ragged_rows_raise():
    ragged = pa.array([[1.0, 2.0], [3.0]])
    with pytest.raises(ValueError, match="ragged"):
        rows_from_arrow(ragged)


def test_update_arrow_matches_update_rows():
    A = _matrix(n=200)
    via_rows = FrequentDirections(16, 32).update_rows(A)
    via_arrow = FrequentDirections(16, 32).update_arrow(pa.array(A.tolist()))
    assert np.allclose(via_rows.sketch_matrix(), via_arrow.sketch_matrix())


def test_envelope_roundtrip():
    fd = FrequentDirections(16, 32).update_rows(_matrix(n=300))
    rt = deserialize(fd.serialize())
    assert isinstance(rt, FrequentDirections)
    assert np.allclose(rt.sketch_matrix(), fd.sketch_matrix())
    assert rt.frobenius_sq() == fd.frobenius_sq()
    assert rt.serialize() == fd.serialize()


def test_dim_mismatch_raises():
    with pytest.raises(ValueError, match="dim mismatch"):
        FrequentDirections(8, 16).update_rows(np.ones((4, 8)))
    with pytest.raises(ValueError, match="incompatible"):
        FrequentDirections(8, 16).merge(FrequentDirections(8, 8))
