"""Distributed connected components via iterative min-label propagation.

The scale path for near-dup clustering (MinHash/SimHash candidate
graphs): edges stay a distributed Dataset; the label table (one row per
CANDIDATE node — small by construction, since only docs sharing an LSH
bucket appear) is broadcast via ``ray.put`` each round. Every round,
each edge emits the smaller endpoint label to the larger endpoint
(vectorized searchsorted lookup per batch), a ``groupby(node).min``
folds the proposals, and labels update. Rounds = graph diameter (LSH
hub edges keep near-dup clusters shallow). Convergence is exact:
labels are monotone non-increasing, so an unchanged label sum is a
fixpoint.

Note on ``Dataset.join``: Ray 2.49's hash-join chokes on the empty
schema-less blocks its own hash aggregate emits for empty partitions
(map operators pass empty blocks through without calling the UDF), so
the label lookup is deliberately broadcast + searchsorted instead —
also cheaper for label tables up to ~10^8 nodes (16 B/node).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def connected_components(edges, max_iters: int = 50):
    """``edges``: Dataset or pandas DataFrame with int64 columns
    ``a``/``b`` → pandas DataFrame (node, component), component = min
    node id of the component."""
    import pandas as pd

    import ray.data as rd
    from ray.data.aggregate import Min

    if isinstance(edges, pd.DataFrame):
        edges = rd.from_pandas(edges[["a", "b"]].astype("int64"))
    edges = edges.select_columns(["a", "b"]).materialize()

    def nodes_of(batch: pa.Table) -> pa.Table:
        vals = np.unique(np.concatenate([
            np.asarray(batch.column("a")), np.asarray(batch.column("b"))
        ]))
        return pa.table({"node": pa.array(vals)})

    nodes_df = (
        edges.map_batches(nodes_of, batch_format="pyarrow")
        .groupby("node").aggregate(Min("node", alias_name="m"))
        .to_pandas()
    )
    nodes = np.sort(nodes_df["node"].to_numpy().astype(np.int64))
    labels = nodes.copy()

    for _ in range(max_iters):
        ref = ray.put((nodes, labels))

        def propose(batch: pa.Table) -> pa.Table:
            nd, lb = ray.get(ref)
            a = np.asarray(batch.column("a"))
            b = np.asarray(batch.column("b"))
            la = lb[np.searchsorted(nd, a)]
            lbb = lb[np.searchsorted(nd, b)]
            m = np.minimum(la, lbb)
            return pa.table({
                "node": pa.array(np.concatenate([a, b])),
                "label": pa.array(np.concatenate([m, m])),
            })

        prop = (
            edges.map_batches(propose, batch_format="pyarrow")
            .groupby("node").aggregate(Min("label", alias_name="label"))
            .to_pandas()
        )
        new_labels = labels.copy()
        idx = np.searchsorted(nodes, prop["node"].to_numpy().astype(np.int64))
        new_labels[idx] = np.minimum(new_labels[idx],
                                     prop["label"].to_numpy().astype(np.int64))
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    return pd.DataFrame({"node": nodes, "component": labels})
