"""Link-graph analytics over edge tables: PageRank as a fixed-iteration
integer power method.

Web-scale corpora need graph-derived quality signals — Common Crawl
ranks hosts by centrality over the host-link graph, and browse/click
graphs rank pages the same way. The reference plugin has no graph
surface (its Bloom semi-joins were the tool its users reached for when
intersecting id sets); this module adds the canonical iterative-graph
operator in Ray-Data-first shape: every iteration is one pass over the
EDGE dataset plus a node-keyed aggregate, the rank vector never
materializes anywhere bigger than one node-sized table, and the whole
recurrence is defined in int64 arithmetic so a SQL oracle reproduces it
bit-for-bit (the repo's scaled-int exactness pattern).

Integer PageRank recurrence (shared verbatim by both backends and by
:func:`pagerank_sql_mirror`, all ``//`` floor divisions on int64):

* ``N`` = number of distinct nodes (sources ∪ destinations);
* ``r0(v) = scale // N``;
* per-unit payout of a source ``s`` with out-weight ``wout(s) > 0``:
  ``q(s) = r(s) // wout(s)``; an edge ``(s, d, w)`` delivers
  ``q(s) * w`` to ``d``;
* dangling mass ``D`` = sum of ``r`` over nodes with no out-edges;
* ``r'(v) = (15 * scale) // (100 * N)
  + (85 * inflow(v)) // 100 + (85 * D) // (100 * N)``.

The floors leak a few units of mass per iteration (bounded by
``N + |E|`` units out of ``scale = 1e12``) — the price of an
order-independent, engine-independent fixpoint. Ranks are reported in
``scale``-ths ("rank_micro").

Backends (the repo's tiered pattern, e.g. functions/dedup.py removal):

* **broadcast** (node table ≤ ``broadcast_limit``): out-degrees and the
  rank vector live in driver numpy arrays (like ``kmeans_fit``'s
  centroid matrix); each iteration broadcasts the payout vector via
  ``ray.put`` and streams the edges once through ``map_batches``,
  emitting per-batch (dst, partial-sum) rows — the exchange is
  node-sized, never edge-sized.
* **dataset** (beyond the limit): ranks stay a hash-partitioned
  Dataset; each iteration is ``ranks ⋈ outdeg`` (node-keyed), an
  edge-stream join on src, and a ``groupby(dst)`` fold — 100-TB-shaped,
  at the cost of two node-keyed shuffles per iteration. Skewed in-link
  hubs (every web graph has them) stay safe because the map side
  pre-aggregates each batch's contributions per destination before the
  shuffle.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

__all__ = ["pagerank", "pagerank_sql_mirror"]

#: rank unit: ranks are integers in 1/SCALE-ths, so every sum any engine
#: computes is an exact int64 (no float accumulation order anywhere)
DEFAULT_SCALE = 10 ** 12

#: damping 0.85 as the exact rational 85/100 (both engines floor-divide)
_D_NUM, _D_DEN = 85, 100


def _edge_partials(nodes_sorted: np.ndarray, q_ref, src_col: str,
                   dst_col: str, w_col: str):
    """map_batches fn: per-batch (node, s) partial inflow rows —
    pre-aggregated per destination, so the downstream exchange carries
    at most (distinct dst per batch) rows, never edge rows."""

    def fn(b: pa.Table) -> pa.Table:
        src = np.asarray(b.column(src_col), dtype=np.int64)
        dst = np.asarray(b.column(dst_col), dtype=np.int64)
        w = np.asarray(b.column(w_col), dtype=np.int64)
        q = ray.get(q_ref)  # zero-copy shared-memory numpy
        contrib = q[np.searchsorted(nodes_sorted, src)] * w
        uniq, inv = np.unique(dst, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(acc, inv, contrib)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "s": pa.array(acc, pa.int64())})

    return fn


def _normalize_edges(edges, src_col: str, dst_col: str,
                     weight_col: Optional[str]):
    """Project to (src, dst, w) int64. Parallel edges are fine — the
    recurrence treats an edge's weight as a multiplicity, so callers
    may pass raw pairs (weight_col=None ⇒ w=1) without aggregating."""

    def proj(b: pa.Table) -> pa.Table:
        w = (pc.cast(b.column(weight_col), pa.int64()) if weight_col
             else pa.array(np.ones(b.num_rows, dtype=np.int64)))
        return pa.table({
            "src": pc.cast(b.column(src_col), pa.int64()),
            "dst": pc.cast(b.column(dst_col), pa.int64()),
            "w": w,
        })

    return edges.map_batches(proj, batch_format="pyarrow")


def pagerank(edges, *, iters: int = 3, scale: int = DEFAULT_SCALE,
             src_col: str = "src", dst_col: str = "dst",
             weight_col: Optional[str] = None,
             backend: str = "auto", broadcast_limit: int = 2_000_000,
             num_partitions: int = 16):
    """PageRank over an edge Dataset → Dataset of (node, rank_micro).

    ``edges``: Ray Dataset with integer ``src_col`` / ``dst_col`` and an
    optional int ``weight_col`` (parallel-edge multiplicity). ``iters``
    power iterations of the integer recurrence in the module docstring.
    ``backend``: "broadcast" (driver-resident rank vector), "dataset"
    (rank vector stays distributed), or "auto" (node count decides).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    if iters < 0:
        raise ValueError("iters must be >= 0")
    ed = _normalize_edges(edges, src_col, dst_col, weight_col).materialize()

    # node-sized tables: out-degrees and the destination node set
    out_rows = ed.groupby("src").aggregate(Sum("w", alias_name="wout"))
    if backend == "dataset" or (backend == "auto"
                                and _count_nodes_over(ed, broadcast_limit)):
        return _pagerank_dataset(ed, out_rows, iters, scale, num_partitions)

    out_df = out_rows.to_pandas()
    dst_nodes = np.asarray(  # unique() yields None / [None] when empty
        sorted(v for v in (ed.unique("dst") or []) if v is not None),
        dtype=np.int64)
    src_nodes = (out_df["src"].to_numpy(dtype=np.int64) if len(out_df)
                 else np.empty(0, np.int64))  # empty agg → no columns
    nodes = np.union1d(src_nodes, dst_nodes)
    n = len(nodes)
    if n == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank_micro": pa.array([], pa.int64())}))
    wout = np.zeros(n, dtype=np.int64)
    if len(out_df):
        wout[np.searchsorted(nodes, src_nodes)] = \
            out_df["wout"].to_numpy(dtype=np.int64)

    r = np.full(n, scale // n, dtype=np.int64)
    base = (scale * (_D_DEN - _D_NUM)) // (_D_DEN * n)
    for _ in range(iters):
        q = np.where(wout > 0, r // np.maximum(wout, 1), 0)
        q_ref = ray.put(q)
        inflow_rows = (ed.map_batches(
            _edge_partials(nodes, q_ref, "src", "dst", "w"),
            batch_format="pyarrow")
            .groupby("node").aggregate(Sum("s", alias_name="s"))
            .to_pandas())
        inflow = np.zeros(n, dtype=np.int64)
        if len(inflow_rows):
            idx = np.searchsorted(
                nodes, inflow_rows["node"].to_numpy(dtype=np.int64))
            inflow[idx] = inflow_rows["s"].to_numpy(dtype=np.int64)
        dangling = int(r[wout == 0].sum())
        r = (base + (_D_NUM * inflow) // _D_DEN
             + (_D_NUM * dangling) // (_D_DEN * n))
    return rd.from_arrow(pa.table({"node": pa.array(nodes, pa.int64()),
                                   "rank_micro": pa.array(r, pa.int64())}))


def _count_nodes_over(ed, limit: int) -> bool:
    """True if the node set exceeds ``limit`` — counted distributed
    (per-batch distinct partials → one global distinct count), so the
    decision itself never collects the node set to the driver."""
    from ray.data.aggregate import Count

    def partial(b: pa.Table) -> pa.Table:
        uniq = np.union1d(np.asarray(b.column("src"), dtype=np.int64),
                          np.asarray(b.column("dst"), dtype=np.int64))
        return pa.table({"node": pa.array(uniq, pa.int64())})

    n = (ed.map_batches(partial, batch_format="pyarrow")
         .groupby("node").aggregate(Count(alias_name="c")).count())
    return n > limit


def _pagerank_dataset(ed, out_rows, iters: int, scale: int,
                      num_partitions: int):
    """Scale path: the rank vector is a hash-partitioned Dataset end to
    end; the driver only ever holds per-iteration scalars (N, dangling
    mass)."""
    from ray.data.aggregate import Count, Sum

    def node_partial(b: pa.Table) -> pa.Table:
        uniq = np.union1d(np.asarray(b.column("src"), dtype=np.int64),
                          np.asarray(b.column("dst"), dtype=np.int64))
        return pa.table({"node": pa.array(uniq, pa.int64())})

    nodes = (ed.map_batches(node_partial, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    n = nodes.count()
    outdeg = out_rows.map_batches(
        lambda b: b.rename_columns(["node", "wout"]),
        batch_format="pyarrow").materialize()

    def seed(b: pa.Table) -> pa.Table:
        return b.append_column(
            "r", pa.array(np.full(b.num_rows, scale // n, np.int64)))

    ranks = nodes.map_batches(seed, batch_format="pyarrow").materialize()
    base = (scale * (_D_DEN - _D_NUM)) // (_D_DEN * n)

    for _ in range(iters):
        j = ranks.join(outdeg, "left_outer", num_partitions,
                       on=("node",)).materialize()

        def dang_partial(b: pa.Table) -> pa.Table:
            r = np.asarray(b.column("r"), dtype=np.int64)
            dead = np.asarray(pc.is_null(b.column("wout")))
            return pa.table({"d": pa.array([int(r[dead].sum())], pa.int64())})

        dangling = int(j.map_batches(dang_partial,
                                     batch_format="pyarrow").sum("d") or 0)

        def payout(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b.column("wout")))
            r = np.asarray(b.column("r"), dtype=np.int64)
            w = np.asarray(b.column("wout"), dtype=np.int64)
            return pa.table({"src": b.column("node"),
                             "q": pa.array(r // w, pa.int64())})

        q_ds = j.map_batches(payout, batch_format="pyarrow")
        contrib = ed.join(q_ds, "inner", num_partitions, on=("src",))

        def per_edge(b: pa.Table) -> pa.Table:
            # pre-aggregate per destination BEFORE the shuffle: hub
            # pages with millions of in-links must not explode the
            # exchange
            dst = np.asarray(b.column("dst"), dtype=np.int64)
            c = (np.asarray(b.column("q"), dtype=np.int64)
                 * np.asarray(b.column("w"), dtype=np.int64))
            uniq, inv = np.unique(dst, return_inverse=True)
            acc = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(acc, inv, c)
            return pa.table({"node": pa.array(uniq, pa.int64()),
                             "s": pa.array(acc, pa.int64())})

        inflow = (contrib.map_batches(per_edge, batch_format="pyarrow")
                  .groupby("node").aggregate(Sum("s", alias_name="s")))
        nxt = nodes.join(inflow, "left_outer", num_partitions, on=("node",))

        def fold(b: pa.Table) -> pa.Table:
            s = np.asarray(pc.fill_null(b.column("s"), 0), dtype=np.int64)
            r = (base + (_D_NUM * s) // _D_DEN
                 + (_D_NUM * dangling) // (_D_DEN * n))
            return pa.table({"node": b.column("node"),
                             "r": pa.array(r, pa.int64())})

        ranks = nxt.map_batches(fold, batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda b: b.rename_columns(["node", "rank_micro"]),
        batch_format="pyarrow")


def pagerank_sql_mirror(edges_sql: str, *, iters: int = 3,
                        scale: int = DEFAULT_SCALE) -> str:
    """ANSI-SQL mirror of :func:`pagerank`, GENERATED from the same
    constants (the repo's oracle-can't-drift pattern: bm25_sql_mirror,
    canonicalize_sql). ``edges_sql`` must select columns
    ``src, dst, w`` (int). Produces (node, rank_micro) — bit-identical
    to the operator because the recurrence is pure int64 floor
    arithmetic on both engines."""
    num, den = _D_NUM, _D_DEN
    parts = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst AS node FROM edges)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "outdeg AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS wout"
        " FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, {scale} // (SELECT n FROM nn) AS r FROM nodes)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"q{k} AS (SELECT o.node, r.r // o.wout AS q"
            f" FROM outdeg o JOIN r{p} r USING (node))")
        parts.append(
            f"inflow{k} AS (SELECT e.dst AS node,"
            f" CAST(sum(q.q * e.w) AS BIGINT) AS s"
            f" FROM edges e JOIN q{k} q ON e.src = q.node GROUP BY e.dst)")
        parts.append(
            f"dang{k} AS (SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS d"
            f" FROM r{p} r LEFT JOIN outdeg o USING (node)"
            f" WHERE o.node IS NULL)")
        parts.append(
            f"r{k} AS (SELECT n.node,"
            f" ({scale} * {den - num}) // ({den} * (SELECT n FROM nn))"
            f" + ({num} * coalesce(i.s, 0)) // {den}"
            f" + ({num} * (SELECT d FROM dang{k}))"
            f" // ({den} * (SELECT n FROM nn)) AS r"
            f" FROM nodes n LEFT JOIN inflow{k} i USING (node))")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, r AS rank_micro FROM r{iters} ORDER BY node")
