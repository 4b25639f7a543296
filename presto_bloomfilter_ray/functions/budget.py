"""Token-budget corpus selection — deterministic per-domain prefixes.

Training mixes are usually specified as TOKEN budgets per domain
("300B tokens of web, 30B of code"), not sampling fractions: the mix
builder must select documents per domain until the budget is hit, the
same documents on every rerun, resumable, auditable by SQL. The
selection rule here is the deterministic-prefix rule:

    order each domain's docs by ``pos = ((id·MULT) mod 2^32)·2^22 + id``
    (the same Knuth multiplicative hash as :mod:`.sampling`, id as the
    tiebreak) and keep the LARGEST PREFIX whose total weight ≤ budget.

SQL mirror (exactly the same rows)::

    SUM(w) OVER (PARTITION BY key ORDER BY (id*2654435761)%4294967296, id)
        <= budget

The naive distributed plan is a per-domain sort + window cumsum — an
all-to-all of the corpus. Instead the cutoff position per domain is a
WEIGHTED QUANTILE over the hash-position axis, and hash positions are
uniform, so the iterative histogram-narrowing selection from
:mod:`.quantiles` applies verbatim — in INTEGER arithmetic, hence
exactly: per round one map-only pass bins every row's ``pos`` into
1024 bins per active domain and sums weights; the bin where the
cumulative weight crosses the budget becomes the next range. When a
domain's candidate bin holds ≤ ``pull_limit`` docs, those rows are
pulled and finished exactly on the driver. Rows never shuffle, driver
state is ``domains × n_bins`` int64 per round, and the final
selection is a pure map-side filter ``pos < cutoff_k`` — 10^12 rows
resolve in ~4 passes.

Domain cardinality must be bounded (``max_keys``) — budgets are a mix
spec, one entry per domain, like every per-stratum knob in
:mod:`.sampling`.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sampling import SAMPLE_MULT, _MOD

#: id tiebreak width: pos = hash·2^22 + id requires id < 2^22 so that
#: pos order == (hash, id) lexicographic order and pos stays < 2^54
#: (int64-safe in numpy AND in the BIGINT SQL mirror). Web-scale ids
#: need a 64-bit hash variant; the formula is the contract, not 2^22.
_ID_BITS = 22


def _positions(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.int64)
    if (ids < 0).any():
        raise ValueError("token_budget_select requires non-negative ids")
    if (ids >= (1 << _ID_BITS)).any():
        raise ValueError(
            f"id >= 2^{_ID_BITS}: the (hash, id) packing would collide; "
            "use a 64-bit hash variant for web-scale id spaces")
    return ((ids * SAMPLE_MULT) % _MOD) * (1 << _ID_BITS) + ids


def token_budget_cutoffs(ds, id_col: str, key_col: str, weight_col: str,
                         budgets: Union[int, Dict], *,
                         n_bins: int = 1024, pull_limit: int = 100_000,
                         max_rounds: int = 8,
                         max_keys: int = 65_536) -> Dict:
    """Exact per-domain cutoff positions for the prefix rule.

    Returns ``{key: cutoff_pos}`` — keep a row iff its ``pos`` <
    cutoff. A domain whose total weight ≤ its budget gets cutoff
    2^54 (keep everything). ``budgets`` is one int for all domains or
    a per-key dict (missing keys → keep everything).
    """
    from .fold import bucket_fold

    stats = bucket_fold(
        ds, [key_col],
        [(weight_col, "sum", "w"), (None, "count", "n")]).to_pandas()
    K = len(stats)
    if K > max_keys:
        raise ValueError(f"{K} domains exceeds max_keys={max_keys}")
    stats = stats.sort_values(key_col).reset_index(drop=True)
    keys = stats[key_col].tolist()
    kidx = {k: i for i, k in enumerate(keys)}
    top = np.int64(1) << np.int64(_MOD.bit_length() - 1 + _ID_BITS)

    def budget_of(k):
        if isinstance(budgets, dict):
            b = budgets.get(k)
            b = None if b is None else int(b)
        else:
            b = int(budgets)
        if b is not None and b < 0:
            raise ValueError(
                f"negative budget {b} for domain {k!r} — a depleted "
                "budget must be 0 (keep nothing), not negative")
        return b

    lo = np.zeros(K, dtype=np.int64)
    hi = np.full(K, top, dtype=np.int64)
    base = np.zeros(K, dtype=np.int64)          # weight strictly below lo
    ndocs = stats["n"].to_numpy(dtype=np.int64)  # docs inside [lo, hi)
    cutoff = np.full(K, top, dtype=np.int64)
    bud = np.array([b if (b := budget_of(k)) is not None else -1
                    for k in keys], dtype=np.int64)
    tw = stats["w"].to_numpy(dtype=np.int64)
    # solved already: no budget, or whole domain fits
    active = (bud >= 0) & (tw > bud)

    def gidx(b: pa.Table) -> np.ndarray:
        enc = pc.dictionary_encode(
            b.column(key_col).combine_chunks()
            if isinstance(b.column(key_col), pa.ChunkedArray)
            else b.column(key_col))
        lut = np.array([kidx.get(k, -1)
                        for k in enc.dictionary.to_pylist()], dtype=np.int64)
        return lut[np.asarray(enc.indices)]

    # Resolve keys and hash positions ONCE into a numeric table (the
    # same discipline as grouped_exact_quantile's add_g pass): every
    # narrowing/pull round then reads (g, pos, w) int columns instead
    # of re-hashing strings per round.
    def numify(b: pa.Table) -> pa.Table:
        g = gidx(b)
        m = g >= 0
        return pa.table({
            "g": pa.array(g[m].astype(np.int32)),
            "pos": pa.array(_positions(np.asarray(b.column(id_col))[m])),
            "w": pa.array(np.asarray(b.column(weight_col),
                                     dtype=np.int64)[m]),
        })

    if active.any():
        kvg = ds.map_batches(numify, batch_format="pyarrow",
                             batch_size=None).materialize()

    rounds = 0
    while active.any():
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"token_budget_cutoffs: {int(active.sum())} domains "
                f"unresolved after {max_rounds} rounds")
        pull_keys = np.flatnonzero(active & (ndocs <= pull_limit))
        narrow_keys = np.flatnonzero(active & (ndocs > pull_limit))

        if narrow_keys.size:
            def hist(b: pa.Table, lo=lo.copy(), hi=hi.copy(),
                     act=(active & (ndocs > pull_limit)).copy()) -> pa.Table:
                g = np.asarray(b.column("g"), dtype=np.int64)
                w = np.asarray(b.column("w"), dtype=np.int64)
                pos = np.asarray(b.column("pos"), dtype=np.int64)
                m = act[g] & (pos >= lo[g]) & (pos < hi[g])
                gm, pm, wm = g[m], pos[m], w[m]
                width = hi[gm] - lo[gm]
                # integer bin via ceil-step divide: exact, and never
                # overflows ((pm-lo)*n_bins would at pos ~ 2^54)
                step = (width + n_bins - 1) // n_bins
                bins = ((pm - lo[gm]) // step).astype(np.int64)
                flat = gm * (2 * n_bins) + bins
                # float64 bincount of integer weights is EXACT while
                # every per-bin partial sum < 2^53 — i.e. total corpus
                # weight below ~9·10^15 (100T tokens ≈ 10^14: fine).
                # Beyond that, split the weight column into hi/lo
                # int32 halves and run two bincounts.
                ws = np.bincount(flat, weights=wm.astype(np.float64),
                                 minlength=K * 2 * n_bins)
                cs = np.bincount(flat + n_bins, minlength=K * 2 * n_bins)
                return pa.table({"h": pa.array(
                    [np.concatenate([ws, cs]).astype(np.int64).tolist()],
                    type=pa.list_(pa.int64()))})

            parts = kvg.map_batches(hist, batch_format="pyarrow",
                                    batch_size=None).to_pandas()
            tot = np.zeros(2 * K * 2 * n_bins, dtype=np.int64)
            for row in parts["h"]:
                tot += np.asarray(row, dtype=np.int64)
            wmat = tot[:K * 2 * n_bins].reshape(K, 2 * n_bins)[:, :n_bins]
            cmat = tot[K * 2 * n_bins:].reshape(K, 2 * n_bins)[:, n_bins:]
            for t in narrow_keys:
                cum = base[t] + np.cumsum(wmat[t])
                over = np.flatnonzero(cum > bud[t])
                if over.size == 0:     # rounding safety: all bins fit
                    cutoff[t] = hi[t]
                    active[t] = False
                    continue
                b_i = int(over[0])
                if b_i > 0:
                    base[t] = int(cum[b_i - 1])
                width = hi[t] - lo[t]
                step = (width + n_bins - 1) // n_bins
                new_lo = lo[t] + b_i * step
                new_hi = min(lo[t] + (b_i + 1) * step, hi[t])
                lo[t], hi[t] = new_lo, new_hi
                ndocs[t] = int(cmat[t, b_i])
                if ndocs[t] == 0:      # budget lands between bins
                    cutoff[t] = new_lo
                    active[t] = False

        if pull_keys.size:
            pk = set(int(x) for x in pull_keys)

            def pull(b: pa.Table, lo=lo.copy(), hi=hi.copy()) -> pa.Table:
                g = np.asarray(b.column("g"), dtype=np.int64)
                w = np.asarray(b.column("w"), dtype=np.int64)
                pos = np.asarray(b.column("pos"), dtype=np.int64)
                m = np.isin(g, np.array(sorted(pk), dtype=np.int64))
                m &= (pos >= lo[g]) & (pos < hi[g])
                return pa.table({"g": pa.array(g[m]),
                                 "pos": pa.array(pos[m]),
                                 "w": pa.array(w[m])})

            rows = kvg.map_batches(pull, batch_format="pyarrow",
                                   batch_size=None).to_pandas()
            for t in pull_keys:
                sub = rows[rows["g"] == t].sort_values("pos")
                cum = base[t] + sub["w"].to_numpy(dtype=np.int64).cumsum()
                over = np.flatnonzero(cum > bud[t])
                if over.size == 0:
                    cutoff[t] = hi[t]
                else:
                    # first excluded doc's pos IS the cutoff (strict <)
                    cutoff[t] = int(sub["pos"].to_numpy()[over[0]])
                active[t] = False

    return {k: int(cutoff[i]) for i, k in enumerate(keys)}


def token_budget_select(ds, id_col: str, key_col: str, weight_col: str,
                        budgets: Union[int, Dict], *,
                        n_bins: int = 1024, pull_limit: int = 100_000,
                        max_rounds: int = 8, max_keys: int = 65_536):
    """Filter ``ds`` to each domain's budget prefix (largest prefix in
    deterministic hash order whose summed ``weight_col`` ≤ budget).
    Returns ``(filtered_ds, cutoffs)``; the filter is one map-side
    pass — rows never shuffle at any stage.
    """
    cutoffs = token_budget_cutoffs(
        ds, id_col, key_col, weight_col, budgets, n_bins=n_bins,
        pull_limit=pull_limit, max_rounds=max_rounds, max_keys=max_keys)

    keys = sorted(cutoffs)
    kidx = {k: i for i, k in enumerate(keys)}
    cut = np.array([cutoffs[k] for k in keys], dtype=np.int64)

    def keep(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            b.column(key_col).combine_chunks()
            if isinstance(b.column(key_col), pa.ChunkedArray)
            else b.column(key_col))
        lut = np.array([kidx.get(k, -1)
                        for k in enc.dictionary.to_pylist()], dtype=np.int64)
        g = lut[np.asarray(enc.indices)]
        pos = _positions(np.asarray(b.column(id_col)))
        m = np.where(g >= 0, pos < cut[np.clip(g, 0, None)], False)
        return b.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow",
                          batch_size=None), cutoffs
