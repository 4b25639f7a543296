"""Cross-corpus near-duplicate join: exact cross duplicates always
found, pairs only cross the corpus boundary, ids untag correctly."""
import numpy as np
import pandas as pd
import pyarrow as pa

from presto_bloomfilter_ray.functions import minhash_join


def _mk(texts, ids):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "text": pa.array(texts),
    })).repartition(3)


def test_exact_cross_dups_always_found(ray_session):
    rng = np.random.default_rng(9)
    words = [f"w{i}" for i in range(500)]
    base = [" ".join(rng.choice(words, 40)) for _ in range(200)]
    # corpus A: 200 docs; corpus B: 50 copies of A docs + 50 fresh
    a = _mk(base, range(200))
    b_texts = base[:50] + [" ".join(rng.choice(words, 40))
                           for _ in range(50)]
    b = _mk(b_texts, range(1000, 1100))
    pairs = minhash_join(a, b, threshold=0.9).to_pandas()
    got = set(zip(pairs["a_id"].astype(int), pairs["b_id"].astype(int)))
    # every planted exact copy must pair (identical text → est 1.0)
    for i in range(50):
        assert (i, 1000 + i) in got, i
    # orientation: a_id from A's id space, b_id from B's
    assert (pairs["a_id"] < 200).all()
    assert (pairs["b_id"] >= 1000).all()
    assert (pairs["est_jaccard"] >= 0.9).all()


def test_no_same_side_pairs_or_low_estimates(ray_session):
    rng = np.random.default_rng(10)
    words = [f"t{i}" for i in range(400)]
    # A contains an exact dup WITHIN itself — must NOT appear in output
    t0 = " ".join(rng.choice(words, 40))
    a = _mk([t0, t0] + [" ".join(rng.choice(words, 40))
                        for _ in range(30)], range(32))
    b = _mk([" ".join(rng.choice(words, 40)) for _ in range(30)],
            range(500, 530))
    pairs = minhash_join(a, b, threshold=0.8).to_pandas()
    if len(pairs) == 0:
        return  # no cross pairs at all — the within-A dup was filtered
    # the within-A dup pair (0,1) is cross-filtered out
    assert not ((pairs["a_id"].isin([0, 1])) &
                (pairs["b_id"].isin([0, 1]))).any()
    assert (pairs["b_id"] >= 500).all()
