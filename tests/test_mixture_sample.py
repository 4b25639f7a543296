"""Temperature-mixture sampling: fraction math, caps, determinism,
and exact SQL recomputability of the selected set."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import (
    hash_sample,
    mixture_sample,
    sample_mask,
    temperature_fractions,
)


def test_temperature_fraction_math():
    counts = {"en": 8000, "de": 1500, "sw": 500}
    # alpha=1 -> proportional mix == keep everything (fractions 1.0)
    assert temperature_fractions(counts, 1.0) == {
        "en": 1.0, "de": 1.0, "sw": 1.0}
    # alpha=0 -> uniform shares (3333 each): only the stratum above its
    # target gets cut; the others cap at keep-everything
    f0 = temperature_fractions(counts, 0.0)
    assert f0["sw"] == f0["de"] == 1.0 and f0["en"] < 1.0
    # alpha=0.5 sits between; expected total <= corpus size
    f5 = temperature_fractions(counts, 0.5)
    assert f0["en"] < f5["en"] < 1.0
    total = sum(counts.values())
    assert sum(f5[k] * counts[k] for k in counts) <= total + 1
    # explicit target scales down
    fh = temperature_fractions(counts, 0.5, target_total=total // 2)
    assert all(fh[k] <= f5[k] for k in counts)
    assert temperature_fractions({}, 0.5) == {}
    with pytest.raises(ValueError):
        temperature_fractions(counts, -1.0)


def _docs(n=4000, seed=9):
    rng = np.random.default_rng(seed)
    langs = rng.choice(["en", "de", "sw"], size=n, p=[0.8, 0.15, 0.05])
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "lang": pa.array(langs)})


def test_mixture_sample_deterministic_and_rebalanced(ray_session):
    import ray.data as rd

    t = _docs()
    a, fr_a = mixture_sample(rd.from_arrow(t).repartition(3),
                             "doc_id", "lang", alpha=0.5)
    b, fr_b = mixture_sample(rd.from_arrow(t).repartition(7),
                             "doc_id", "lang", alpha=0.5)
    ids_a = sorted(r["doc_id"] for r in a.take_all())
    assert fr_a == fr_b
    assert ids_a == sorted(r["doc_id"] for r in b.take_all())
    # smallest stratum upweighted to keep-everything
    assert fr_a["sw"] == 1.0 and fr_a["en"] < fr_a["de"]
    # identical to a direct hash_sample with the same fractions
    direct = hash_sample(rd.from_arrow(t), "doc_id", key_col="lang",
                         fractions=fr_a)
    assert ids_a == sorted(r["doc_id"] for r in direct.take_all())


def test_mixture_sample_sql_exact(ray_session):
    import ray.data as rd

    t = _docs(n=3000, seed=4)
    sampled, _ = mixture_sample(rd.from_arrow(t), "doc_id", "lang", alpha=0.5)
    got = sorted(r["doc_id"] for r in sampled.take_all())
    con = duckdb.connect()
    con.register("documents", t)
    ora = [r[0] for r in con.execute("""
        WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
             s AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c),
             w AS (SELECT lang, cnt,
                          pow(cnt / (SELECT total FROM s), 0.5) AS wt FROM c),
             f AS (SELECT lang, cnt,
                          round(least(1.0, wt / (SELECT sum(wt) FROM w)
                                           * (SELECT total FROM s) / cnt),
                                6) AS frac
                   FROM w)
        SELECT d.doc_id FROM documents d JOIN f ON d.lang = f.lang
        WHERE (d.doc_id * 2654435761) % 4294967296 <
              CAST(floor(f.frac * 4294967296) AS BIGINT)
        ORDER BY 1
    """).fetchall()]
    assert got == ora


def test_sample_mask_floor_semantics():
    # the SQL mirror floors frac*2^32; numpy truncation must agree on
    # positive fractions including exact-integer products
    ids = np.arange(100, dtype=np.int64)
    for frac in (0.0, 0.25, 0.5, 1.0, 0.123457):
        thresh = int(np.floor(frac * (1 << 32)))
        expect = (ids * 2654435761) % (1 << 32) < thresh
        assert (sample_mask(ids, frac) == expect).all()
