"""Published-bound + merge-associativity contracts for the companion
sketches (BASELINE.md rebuild targets; FIXTURES.md §3)."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray import KLL, CountMin, HyperLogLog, TDigest, deserialize


def _random_merge(cls_factory, chunks, rng):
    sketches = [cls_factory().update_arrow(c) for c in chunks]
    order = rng.permutation(len(sketches))
    acc = None
    for i in order:
        sk = deserialize(sketches[i].serialize())  # exercise the envelope too
        acc = sk if acc is None else acc.merge(sk)
    return acc


class TestHLL:
    def test_error_within_published_bound(self):
        # 1.04/sqrt(m) relative standard error; 3-sigma slack
        for n in (1_000, 50_000, 200_000):
            h = HyperLogLog(14).update_arrow(pa.array([f"v{i}" for i in range(n)]))
            err = abs(h.estimate() - n) / n
            assert err < 3 * h.relative_error_bound(), (n, err)

    def test_duplicates_dont_inflate(self):
        h = HyperLogLog(14).update_arrow(pa.array(["a", "b", "c"] * 10_000))
        assert abs(h.estimate() - 3) < 1

    def test_merge_equals_serial(self):
        rng = np.random.default_rng(11)
        data = np.array([f"u{i}" for i in range(30_000)], dtype=object)
        serial = HyperLogLog(12).update_arrow(pa.array(list(data)))
        chunks = [pa.array(list(c)) for c in np.array_split(data, 7)]
        merged = _random_merge(lambda: HyperLogLog(12), chunks, rng)
        # register-max merge is exact: identical registers
        assert np.array_equal(merged.regs, serial.regs)

    def test_incompatible_precision_raises(self):
        with pytest.raises(ValueError):
            HyperLogLog(12).merge(HyperLogLog(14))


class TestCountMin:
    def test_overestimate_only_and_bounded(self):
        rng = np.random.default_rng(5)
        items = np.repeat([f"k{i}" for i in range(200)],
                          rng.integers(1, 500, size=200))
        cm = CountMin(1e-3, 1e-3).update_arrow(pa.array(list(items)))
        import collections

        true = collections.Counter(items)
        keys = list(true)
        est = cm.estimate_many(pa.array(keys))
        t = np.array([true[k] for k in keys])
        assert (est >= t).all()  # never underestimates
        assert (est <= t + cm.error_bound()).all()

    def test_merge_equals_serial_counts(self):
        rng = np.random.default_rng(6)
        data = np.array([f"k{i % 50}" for i in range(20_000)], dtype=object)
        serial = CountMin(1e-3, 1e-3).update_arrow(pa.array(list(data)))
        chunks = [pa.array(list(c)) for c in np.array_split(data, 5)]
        merged = _random_merge(lambda: CountMin(1e-3, 1e-3), chunks, rng)
        assert np.array_equal(merged.counts, serial.counts)
        assert merged.total == serial.total

    def test_weighted_update(self):
        cm = CountMin(1e-3, 1e-3)
        cm.update_arrow(pa.array(["x", "y"]), weights=np.array([10, 3]))
        assert cm.estimate("x") >= 10
        assert cm.total == 13

    def test_inner_product_join_size_bound(self):
        rng = np.random.default_rng(7)
        # many-to-many join: key i appears fa[i] times in A, fb[i] in B
        fa = rng.integers(0, 20, size=300)
        fb = rng.integers(0, 20, size=300)
        a_items = np.repeat([f"j{i}" for i in range(300)], fa)
        b_items = np.repeat([f"j{i}" for i in range(300)], fb)
        a = CountMin(1e-3, 1e-3).update_arrow(pa.array(list(a_items)))
        b = CountMin(1e-3, 1e-3).update_arrow(pa.array(list(b_items)))
        exact = int((fa * fb).sum())
        est = a.inner_product(b)
        assert exact <= est <= exact + a.inner_product_bound(b)
        assert b.inner_product(a) == est  # symmetric
        with pytest.raises(ValueError):
            a.inner_product(CountMin(1e-2, 1e-3))

    def test_inner_product_distributed_equals_serial(self):
        rng = np.random.default_rng(8)
        data = np.array([f"k{i % 40}" for i in range(8000)], dtype=object)
        other = CountMin(1e-3, 1e-3).update_arrow(
            pa.array([f"k{i % 60}" for i in range(500)]))
        serial = CountMin(1e-3, 1e-3).update_arrow(pa.array(list(data)))
        chunks = [pa.array(list(c)) for c in np.array_split(data, 7)]
        merged = _random_merge(lambda: CountMin(1e-3, 1e-3), chunks, rng)
        assert merged.inner_product(other) == serial.inner_product(other)


class TestTDigest:
    @pytest.mark.parametrize("dist", ["normal", "uniform", "lognormal"])
    def test_rank_error_bound(self, dist):
        rng = np.random.default_rng(3)
        vals = getattr(rng, dist)(size=100_000)
        td = TDigest(200)
        for c in np.array_split(vals, 8):
            td.update_arrow(c)
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            est = td.quantile(q)
            rank_err = abs((vals <= est).mean() - q)
            assert rank_err < 2 * td.rank_error_bound(), (dist, q, rank_err)

    def test_merge_tree_within_bound(self):
        rng = np.random.default_rng(4)
        vals = rng.normal(size=60_000)
        chunks = np.array_split(vals, 13)
        merged = _random_merge(lambda: TDigest(200), chunks, rng)
        for q in (0.05, 0.5, 0.95):
            rank_err = abs((vals <= merged.quantile(q)).mean() - q)
            assert rank_err < 3 * merged.rank_error_bound()

    def test_extremes(self):
        td = TDigest(100).update_arrow(np.arange(1000, dtype=float))
        assert td.quantile(0.0) == 0.0
        assert td.quantile(1.0) == 999.0


class TestKLL:
    def test_rank_error_bound(self):
        rng = np.random.default_rng(9)
        vals = rng.exponential(size=80_000)
        k = KLL(200)
        for c in np.array_split(vals, 9):
            k.update_arrow(c)
        assert k.n == len(vals)
        for q in (0.1, 0.5, 0.9):
            rank_err = abs((vals <= k.quantile(q)).mean() - q)
            assert rank_err < 2 * k.rank_error_bound(), (q, rank_err)

    def test_merge_tree_within_bound(self):
        rng = np.random.default_rng(10)
        vals = rng.normal(size=50_000)
        merged = _random_merge(lambda: KLL(200), np.array_split(vals, 11), rng)
        assert merged.n == len(vals)
        for q in (0.25, 0.5, 0.75):
            rank_err = abs((vals <= merged.quantile(q)).mean() - q)
            assert rank_err < 3 * merged.rank_error_bound()


class TestTDigestWeighted:
    def test_weighted_quantiles_bound(self):
        rng = np.random.default_rng(17)
        vals = rng.normal(50, 10, 30_000)
        wts = rng.integers(1, 20, size=30_000).astype(float)
        td = TDigest(200)
        for sl in np.array_split(np.arange(30_000), 6):
            td.update_weighted(vals[sl], wts[sl])
        # exact weighted quantile via expansion-free cumulative method
        order = np.argsort(vals)
        sv, sw = vals[order], wts[order]
        cum = np.cumsum(sw)
        for q in (0.1, 0.5, 0.9):
            est = td.quantile(q)
            true_rank = (sv <= est) @ sw / cum[-1]
            assert abs(true_rank - q) < 2 * td.rank_error_bound(), (q, true_rank)

    def test_weighted_matches_repeated_expansion(self):
        """update_weighted(v, w) must estimate the same distribution as
        literally repeating each value w times (within the rank bound)."""
        rng = np.random.default_rng(23)
        vals = rng.uniform(0, 100, 2000)
        wts = rng.integers(1, 6, size=2000)
        expanded = np.repeat(vals, wts)
        td_w = TDigest(200).update_weighted(vals, wts.astype(float))
        td_r = TDigest(200).update_arrow(expanded)
        assert td_w.total_weight == td_r.total_weight == len(expanded)
        for q in (0.1, 0.5, 0.9):
            rank_w = (expanded <= td_w.quantile(q)).mean()
            rank_r = (expanded <= td_r.quantile(q)).mean()
            assert abs(rank_w - q) < 2 * td_w.rank_error_bound()
            assert abs(rank_r - q) < 2 * td_r.rank_error_bound()


class TestKLLWeightConservation:
    def test_total_retained_weight_equals_n(self):
        """Compaction must conserve weight in BOTH flip-offset branches:
        odd-size levels keep the unpaired element (last for offset 0,
        first for offset 1) at the current level instead of dropping it,
        so sum(level_size * 2^level) == n always."""
        rng = np.random.default_rng(41)
        k = KLL(50)  # small k → many compactions, both offsets exercised
        total = 0
        for _ in range(40):
            chunk = rng.normal(size=int(rng.integers(1, 997)))
            k.update_arrow(chunk)
            total += len(chunk)
            retained = sum(lv.size * (1 << h) for h, lv in enumerate(k.levels))
            assert retained == total == k.n

    def test_merge_conserves_weight(self):
        rng = np.random.default_rng(43)
        a = KLL(60).update_arrow(rng.normal(size=7001))
        b = KLL(60).update_arrow(rng.normal(size=5003))
        a.merge(b)
        retained = sum(lv.size * (1 << h) for h, lv in enumerate(a.levels))
        assert retained == a.n == 12004
