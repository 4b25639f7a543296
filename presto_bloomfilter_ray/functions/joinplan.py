"""Sketch-driven join planning — the project's sketches as a query
optimizer, not just a filter.

The reference exists to prune joins: build a Bloom filter over one
side, probe the other (`README.md:6-38` of
RobinUS2/presto-bloomfilter). This module closes the loop by letting
the sketches CHOOSE the physical join strategy the way a distributed
optimizer would, from one cheap mergeable-statistics pass per side
(exact row count + Theta distinct sketch of the key — both through the
standard partial → merge-tree path, one scan each):

* **broadcast** — the smaller side fits the driver/worker budget:
  ship it once (``ray.put``) and hash-join every batch of the big side
  map-side. No shuffle at all.
* **bloom_prefilter** — both sides are big but the Theta
  INTERSECTION estimate says most of each side's keys have no partner
  (low join selectivity): build a Bloom filter over each side's keys,
  cross-semi-join both sides down to (approximately) the matching
  subset, then shuffle-join the survivors. The exchange shrinks by the
  estimated selectivity; Bloom false positives only let a bounded
  sliver of non-matching rows into the shuffle (the join itself stays
  exact — extra rows simply find no partner).
* **shuffle** — both sides big and mostly-overlapping: prefiltering
  would scan twice to remove nothing; go straight to the
  hash-partitioned ``Dataset.join``.

``sketch_join_plan`` returns the decision WITH its evidence (counts,
distinct estimates, intersection estimate, predicted survival
fractions) so pipelines can log why a plan was chosen;
``planned_join`` executes it. Results are identical across plans
(inner-join semantics; tests pin all three paths against each other
and the driver query hash-matches a plain SQL join).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

__all__ = ["sketch_join_plan", "planned_join"]


def _side_stats(ds, key: str, theta_k: int) -> Tuple[int, object]:
    from ..engine.agg import build_sketch
    from ..sketches.theta import ThetaSketch

    n = ds.count()
    sk = build_sketch(ds, key, lambda: ThetaSketch(theta_k),
                      batch_size=None)
    return n, sk


def sketch_join_plan(left, lkey: str, right, rkey: str, *,
                     broadcast_limit: int = 1_000_000,
                     prefilter_below: float = 0.5,
                     theta_k: int = 4096) -> Dict:
    """Pick a physical inner-join strategy from sketch statistics.

    Decision rule (in order):

    1. ``min(rows) <= broadcast_limit`` → ``"broadcast"``;
    2. predicted survivor fraction
       ``max(inter/d_left, inter/d_right) <= prefilter_below`` →
       ``"bloom_prefilter"`` (most keys on BOTH sides are partnerless;
       Theta's intersection RSE is a few percent at k=4096, and the
       cost of a wrong call is only a wasted map pass, never a wrong
       result);
    3. else ``"shuffle"``.
    """
    n_l, sk_l = _side_stats(left, lkey, theta_k)
    n_r, sk_r = _side_stats(right, rkey, theta_k)
    d_l = max(sk_l.estimate(), 1.0)
    d_r = max(sk_r.estimate(), 1.0)
    inter = sk_l.intersection_estimate(sk_r)
    surv_l = min(1.0, inter / d_l)
    surv_r = min(1.0, inter / d_r)
    if min(n_l, n_r) <= broadcast_limit:
        strategy = "broadcast"
    elif max(surv_l, surv_r) <= prefilter_below:
        strategy = "bloom_prefilter"
    else:
        strategy = "shuffle"
    return {
        "strategy": strategy,
        "n_left": int(n_l), "n_right": int(n_r),
        "distinct_left_est": float(d_l), "distinct_right_est": float(d_r),
        "intersection_est": float(inter),
        "survival_left_est": float(surv_l),
        "survival_right_est": float(surv_r),
        "theta_rse": float(sk_l.relative_error_bound()),
    }


def _broadcast_join(big, big_key: str, small, small_key: str,
                    small_rows: int):
    """Map-side hash join: the small side ships once via ``ray.put``
    and every big-side batch joins against it with one vectorized
    polars inner join. Column collisions keep the big side's values
    (callers project before joining, like any join)."""
    import polars as pl
    import ray

    sdf = small.to_pandas()
    ref = ray.put(pa.Table.from_pandas(sdf, preserve_index=False))

    def join_batch(b: pa.Table) -> pa.Table:
        st = ray.get(ref)
        lb = pl.from_arrow(b)
        rb = pl.from_arrow(st)
        out = lb.join(rb, left_on=big_key, right_on=small_key,
                      how="inner")
        return out.to_arrow()

    return big.map_batches(join_batch, batch_format="pyarrow",
                           batch_size=None)


def planned_join(left, lkey: str, right, rkey: str, *,
                 broadcast_limit: int = 1_000_000,
                 prefilter_below: float = 0.5,
                 theta_k: int = 4096,
                 bloom_fpp: float = 1e-6,
                 num_partitions: int = 32,
                 plan: Optional[Dict] = None):
    """Execute the sketch-chosen inner join. Returns ``(ds, plan)``.
    ``plan`` may be passed in (e.g. reused across runs of the same
    snapshot); otherwise :func:`sketch_join_plan` computes it. All
    strategies return identical rows — the plan only changes HOW data
    moves. Joined columns: left columns + right columns (right key
    column deduplicated away by the join)."""
    import ray.data  # noqa: F401  (Dataset.join availability)

    from ..engine.agg import build_sketch
    from ..engine.ops import semi_join
    from ..sketches.bloom import BloomFilter

    if plan is None:
        plan = sketch_join_plan(left, lkey, right, rkey,
                                broadcast_limit=broadcast_limit,
                                prefilter_below=prefilter_below,
                                theta_k=theta_k)
    strategy = plan["strategy"]
    if strategy == "broadcast":
        if plan["n_right"] <= plan["n_left"]:
            out = _broadcast_join(left, lkey, right, rkey, plan["n_right"])
        else:
            out = _broadcast_join(right, rkey, left, lkey, plan["n_left"])
        return out, plan

    if strategy == "bloom_prefilter":
        # size each filter by the other side's distinct estimate (the
        # probe-side estimate is what bounds insertions)
        n_bl = max(1024, int(plan["distinct_left_est"] * 1.2))
        n_br = max(1024, int(plan["distinct_right_est"] * 1.2))
        bf_l = build_sketch(left, lkey,
                            lambda: BloomFilter(n_bl, bloom_fpp),
                            batch_size=None)
        bf_r = build_sketch(right, rkey,
                            lambda: BloomFilter(n_br, bloom_fpp),
                            batch_size=None)
        left_kept = semi_join(left, lkey, bf_r)
        right_kept = semi_join(right, rkey, bf_l)
        out = left_kept.join(right_kept, "inner", num_partitions,
                             on=(lkey,), right_on=(rkey,))
        return out, plan

    out = left.join(right, "inner", num_partitions,
                    on=(lkey,), right_on=(rkey,))
    return out, plan
