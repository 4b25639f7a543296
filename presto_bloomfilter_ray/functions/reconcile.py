"""Dataset snapshot reconciliation — exact diffs at O(diff) memory.

The scale story: comparing two 10^12-key snapshots with a join is an
all-to-all shuffle of BOTH sides. With an IBLT
(:mod:`~presto_bloomfilter_ray.sketches.iblt`) each side is one
streaming ``map_batches`` pass producing a fixed-size table (24 B per
cell), the driver subtracts and peels, and a final broadcast map pass
binds recovered fingerprints back to rows. Nothing but the sketch and
the diff rows ever leave the workers.

Sizing contract: ``cells`` must exceed ~``(k+1)/k × |A Δ B|`` (the
peeling 2-core threshold — Goodrich & Mitzenmacher 2011); a too-small
table FAILS LOUDLY (``DecodeError``), never silently truncates. When
the diff size is unknown, start from an HLL estimate of each side or
just retry with ``cells × 4`` — each attempt costs one pass per side.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa

from ..engine.agg import build_sketch
from ..sketches.iblt import IBLT


class DecodeError(RuntimeError):
    """The symmetric difference exceeded the IBLT's peeling capacity."""


def _probe(fps: np.ndarray, col: str):
    def fn(b: pa.Table) -> pa.Table:
        hit = np.isin(IBLT.fingerprints(b.column(col)), fps)
        return b.filter(pa.array(hit))

    return fn


def dataset_diff(
    ds_a,
    ds_b,
    col: str,
    *,
    cells: int = 1 << 16,
    k: int = 3,
    batch_size=65_536,
) -> Tuple[object, object]:
    """Rows of ``ds_a`` whose ``col`` key is absent from ``ds_b`` and
    vice versa, as two (lazy) Datasets.

    Each side's keys must be unique (snapshot/PK semantics — duplicate
    keys on one side leave residue that fails the decode, loudly).
    """
    snap_a = build_sketch(ds_a, col, lambda: IBLT(cells, k),
                          batch_size=batch_size)
    snap_b = build_sketch(ds_b, col, lambda: IBLT(cells, k),
                          batch_size=batch_size)
    a_fp, b_fp, ok = snap_a.subtract(snap_b).decode()
    if not ok:
        raise DecodeError(
            f"symmetric difference exceeds the peeling capacity of "
            f"{cells} cells (recovered {a_fp.size + b_fp.size} before "
            f"stalling) — retry with more cells")
    only_a = ds_a.map_batches(_probe(np.sort(a_fp), col),
                              batch_format="pyarrow", batch_size=None)
    only_b = ds_b.map_batches(_probe(np.sort(b_fp), col),
                              batch_format="pyarrow", batch_size=None)
    return only_a, only_b
