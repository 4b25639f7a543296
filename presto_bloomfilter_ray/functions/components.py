"""Distributed connected components via iterative min-label propagation.

The scale path for near-dup clustering (MinHash/SimHash candidate
graphs): edges stay a distributed Dataset; the label table (one row per
CANDIDATE node — small by construction, since only docs sharing an LSH
bucket appear) is broadcast via ``ray.put`` each round. Every round,
each edge emits the smaller endpoint label to the larger endpoint
(vectorized searchsorted lookup per batch), the per-batch proposals are
min-folded map-side, and the driver folds the (node-bounded) partial
min tables into the labels. Rounds = graph diameter (LSH hub edges keep
near-dup clusters shallow). Convergence is exact: labels are monotone
non-increasing, so an unchanged label table is a fixpoint.

Why no shuffle per round: the label table already lives on the driver
(that's the stated memory contract, ~16 B per candidate node, fine to
~10^8 nodes), so folding per-batch min-proposals there costs the same
memory class as the broadcast — and replaces one all-to-all ``groupby``
PER ROUND with a plain map stage. For edge sets too large even for
per-batch folding, ``shuffle_rounds=True`` restores the
``groupby(node).min`` exchange per round.

Note on ``Dataset.join``: Ray 2.49's hash-join chokes on the empty
schema-less blocks its own hash aggregate emits for empty partitions
(map operators pass empty blocks through without calling the UDF), so
the label lookup is deliberately broadcast + searchsorted instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _fold_batches(batches):
    """Min-fold (node, label) pyarrow batches into two sorted arrays."""
    nodes_parts, label_parts = [], []
    for b in batches:
        nodes_parts.append(np.asarray(b.column("node")))
        label_parts.append(np.asarray(b.column("label")))
    if not nodes_parts:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    n = np.concatenate(nodes_parts).astype(np.int64)
    l = np.concatenate(label_parts).astype(np.int64)
    order = np.argsort(n, kind="stable")
    n, l = n[order], l[order]
    first = np.ones(len(n), dtype=bool)
    if len(n) > 1:
        first[1:] = np.diff(n) != 0
    out_n = n[first]
    out_l = np.minimum.reduceat(l, np.flatnonzero(first)) if len(n) else l
    return out_n, out_l


def connected_components(edges, max_iters: int = 50,
                         shuffle_rounds: bool = False):
    """``edges``: Dataset or pandas DataFrame with int64 columns
    ``a``/``b`` → pandas DataFrame (node, component), component = min
    node id of the component."""
    import pandas as pd

    import ray.data as rd
    from ray.data.aggregate import Min

    if isinstance(edges, pd.DataFrame):
        edges = rd.from_pandas(edges[["a", "b"]].astype("int64"))
    edges = edges.select_columns(["a", "b"]).materialize()

    # round 0 fused with node discovery: with labels initialized to node
    # ids, the first propagation's proposal for each endpoint is simply
    # min(a, b) — map-side fold per batch, driver fold across batches.
    def propose0(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a")).astype(np.int64)
        b = np.asarray(batch.column("b")).astype(np.int64)
        m = np.minimum(a, b)
        n = np.concatenate([a, b])
        l = np.concatenate([m, m])
        order = np.argsort(n, kind="stable")
        n, l = n[order], l[order]
        first = np.ones(len(n), dtype=bool)
        if len(n) > 1:
            first[1:] = np.diff(n) != 0
        lab = np.minimum.reduceat(l, np.flatnonzero(first)) if len(n) else l
        return pa.table({"node": pa.array(n[first]), "label": pa.array(lab)})

    p0 = edges.map_batches(propose0, batch_format="pyarrow")
    if shuffle_rounds:
        df0 = p0.groupby("node").aggregate(Min("label", alias_name="label")).to_pandas()
        order = np.argsort(df0["node"].to_numpy())
        nodes = df0["node"].to_numpy().astype(np.int64)[order]
        labels = df0["label"].to_numpy().astype(np.int64)[order]
    else:
        nodes, labels = _fold_batches(p0.iter_batches(batch_format="pyarrow"))

    for _ in range(max_iters):
        ref = ray.put((nodes, labels))

        def propose(batch: pa.Table) -> pa.Table:
            nd, lb = ray.get(ref)
            a = np.asarray(batch.column("a"))
            b = np.asarray(batch.column("b"))
            la = lb[np.searchsorted(nd, a)]
            lbb = lb[np.searchsorted(nd, b)]
            m = np.minimum(la, lbb)
            n = np.concatenate([a, b]).astype(np.int64)
            l = np.concatenate([m, m])
            order = np.argsort(n, kind="stable")
            n, l = n[order], l[order]
            first = np.ones(len(n), dtype=bool)
            if len(n) > 1:
                first[1:] = np.diff(n) != 0
            lab = np.minimum.reduceat(l, np.flatnonzero(first)) if len(n) else l
            return pa.table({"node": pa.array(n[first]), "label": pa.array(lab)})

        prop = edges.map_batches(propose, batch_format="pyarrow")
        if shuffle_rounds:
            pdf = prop.groupby("node").aggregate(Min("label", alias_name="label")).to_pandas()
            pn = pdf["node"].to_numpy().astype(np.int64)
            pl = pdf["label"].to_numpy().astype(np.int64)
        else:
            pn, pl = _fold_batches(prop.iter_batches(batch_format="pyarrow"))
        new_labels = labels.copy()
        idx = np.searchsorted(nodes, pn)
        np.minimum.at(new_labels, idx, pl)
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    return pd.DataFrame({"node": nodes, "component": labels})
