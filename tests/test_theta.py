"""Theta/KMV sketch: distinct + set-operation estimates within bounds,
exact below saturation, deterministic merge."""

import numpy as np
import pyarrow as pa

from presto_bloomfilter_ray import ThetaSketch, deserialize


def test_exact_below_saturation():
    sk = ThetaSketch(1024).update_arrow(pa.array([f"v{i}" for i in range(500)] * 3))
    assert sk.estimate() == 500.0
    assert sk.theta == 1.0


def test_distinct_estimate_bound():
    sk = ThetaSketch(4096).update_arrow(pa.array([f"v{i}" for i in range(200_000)]))
    err = abs(sk.estimate() - 200_000) / 200_000
    assert err < 3 * sk.relative_error_bound()


def test_set_operations():
    a = ThetaSketch(4096).update_arrow(pa.array([f"x{i}" for i in range(100_000)]))
    b = ThetaSketch(4096).update_arrow(
        pa.array([f"x{i}" for i in range(50_000, 150_000)])
    )
    tol = 4 * a.relative_error_bound()
    assert abs(a.union_estimate(b) - 150_000) / 150_000 < tol
    assert abs(a.intersection_estimate(b) - 50_000) / 50_000 < tol
    assert abs(a.difference_estimate(b) - 50_000) / 50_000 < tol
    assert abs(a.jaccard_estimate(b) - 1 / 3) < 0.05


def test_merge_deterministic_any_tree():
    parts = [pa.array([f"v{i}" for i in range(lo, lo + 20_000)])
             for lo in range(0, 80_000, 20_000)]
    rng = np.random.default_rng(3)
    ref = None
    for _ in range(4):
        order = rng.permutation(4)
        acc = None
        for i in order:
            sk = ThetaSketch(2048).update_arrow(parts[i])
            acc = sk if acc is None else acc.merge(sk)
        if ref is None:
            ref = acc.values
        assert np.array_equal(acc.values, ref)


def test_envelope_roundtrip():
    sk = ThetaSketch(512).update_arrow(pa.array(["a", "b", "c"]))
    rt = deserialize(sk.serialize())
    assert np.array_equal(rt.values, sk.values)
    assert rt.k == 512


def test_distributed_theta_overlap(ray_session, sf_dir, duck):
    import ray.data as rd

    from presto_bloomfilter_ray.engine import build_sketch

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    # k above saturation → exact set algebra through the whole pipeline
    tc = build_sketch(cust, "c_custkey", lambda: ThetaSketch(65536))
    to = build_sketch(orders, "o_custkey", lambda: ThetaSketch(65536))
    n_c = duck.sql("select count(distinct c_custkey) from customer").fetchone()[0]
    n_o = duck.sql("select count(distinct o_custkey) from orders").fetchone()[0]
    n_common = duck.sql("""
        select count(distinct o_custkey) from orders
        where o_custkey in (select c_custkey from customer)""").fetchone()[0]
    assert round(tc.estimate()) == n_c
    assert round(to.estimate()) == n_o
    assert round(tc.intersection_estimate(to)) == n_common
    assert round(tc.difference_estimate(to)) == n_c - n_common
