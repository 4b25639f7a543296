"""n-gram novelty scoring: exact-index tier vs Bloom tier, window
counting, short docs, edge cases."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import (
    benchmark_bloom,
    novelty_scores,
    reference_gram_index,
)


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_exact_tier_counts_windows(ray_session):
    ref = _ds([{"text": "alpha beta gamma delta"}])
    # corpus doc: 5 tokens -> 3 tri-gram windows; the middle window
    # "beta gamma delta" matches the reference, the others do not
    corpus = _ds([{"doc_id": 1, "text": "zero beta gamma delta omega"}])
    idx = reference_gram_index(ref, ngram=3)
    # ref has 4 tokens -> 2 windows
    assert idx.size == 2
    out = novelty_scores(corpus, idx, ngram=3).to_pandas()
    assert out["n_grams"].tolist() == [3]
    assert out["n_seen"].tolist() == [1]
    assert out["novelty"].tolist() == [pytest.approx(2 / 3)]


def test_short_doc_whole_gram_and_tokenfree(ray_session):
    ref = _ds([{"text": "tiny doc"}])
    corpus = _ds([
        {"doc_id": 1, "text": "TINY   doc"},   # normalizes to the ref
        {"doc_id": 2, "text": "other words"},  # short, not in ref
        {"doc_id": 3, "text": "!!! ---"},      # token-free
    ])
    idx = reference_gram_index(ref, ngram=5)
    out = novelty_scores(corpus, idx, ngram=5).to_pandas()
    assert out["n_grams"].tolist() == [1, 1, 0]
    assert out["n_seen"].tolist() == [1, 0, 0]
    assert out["novelty"][0] == 0.0
    assert out["novelty"][1] == 1.0
    assert np.isnan(out["novelty"][2])


def test_bloom_tier_matches_exact_tier(ray_session):
    rng = np.random.default_rng(9)
    ref_rows = [{"text": " ".join(f"w{rng.integers(0, 50)}"
                                  for _ in range(30))}
                for _ in range(200)]
    corpus_rows = [{"doc_id": i,
                    "text": " ".join(f"w{rng.integers(0, 80)}"
                                     for _ in range(25))}
                   for i in range(300)]
    ref, corpus = _ds(ref_rows), _ds(corpus_rows)
    idx = reference_gram_index(ref, ngram=4)
    bloom = benchmark_bloom(ref, unit="ngram", ngram=4,
                            expected_insertions=50_000, fpp=1e-9)
    a = novelty_scores(corpus, idx, ngram=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = novelty_scores(corpus, bloom, ngram=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # at fpp 1e-9 the Bloom tier is exact on this gram universe
    assert a["n_seen"].tolist() == b["n_seen"].tolist()
    assert a["n_grams"].tolist() == b["n_grams"].tolist()
    # sanity: overlap exists but is not total
    assert 0 < a["n_seen"].sum() < a["n_grams"].sum()


def test_full_novelty_guarantee(ray_session):
    # novelty == 1 is a GUARANTEE with either tier (no false negatives)
    ref = _ds([{"text": "completely disjoint reference vocabulary"}])
    corpus = _ds([{"doc_id": 1, "text": "zz yy xx ww vv uu tt ss"}])
    bloom = benchmark_bloom(ref, unit="ngram", ngram=3,
                            expected_insertions=1_000, fpp=1e-9)
    out = novelty_scores(corpus, bloom, ngram=3).to_pandas()
    assert out["novelty"].tolist() == [1.0]


def test_empty_reference(ray_session):
    idx = reference_gram_index(_ds([{"text": ""}]), ngram=3)
    assert idx.size == 0
    corpus = _ds([{"doc_id": 1, "text": "some words here again"}])
    out = novelty_scores(corpus, idx, ngram=3).to_pandas()
    assert out["novelty"].tolist() == [1.0]
