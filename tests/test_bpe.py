"""BPE trainer/encoder contracts: textbook merge sequence, encode
round-trip, histogram equivalence, partitioning invariance."""

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import (
    bpe_encode_counts,
    bpe_encode_word,
    bpe_merges_from_histogram,
    bpe_train,
)

# the classic BPE walkthrough corpus (Sennrich et al. 2016 §3.2 style)
HIST = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_textbook_merge_sequence():
    merges = bpe_merges_from_histogram(list(HIST), list(HIST.values()), 4)
    # est</w> dominates: e+s (9), then es+t (9), then est+</w> (9)...
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    # 'l o w' next: lo (7) vs ne/ew/we/wi/id/d+est</w>... l+o = 7 wins
    assert merges[3] == ("l", "o")


def test_encode_word_applies_ranks():
    merges = bpe_merges_from_histogram(list(HIST), list(HIST.values()), 10)
    ranks = {m: i for i, m in enumerate(merges)}
    toks = bpe_encode_word("newest", ranks)
    assert "".join(toks) == "newest</w>"  # lossless
    assert len(toks) < len("newest") + 1  # actually compressed
    # unseen characters pass through as singletons
    toks2 = bpe_encode_word("zq", ranks)
    assert toks2 == ["z", "q", "</w>"] or "".join(toks2) == "zq</w>"


def test_determinism_tie_break():
    # symmetric histogram: every pair count equal → lexicographic pick
    merges = bpe_merges_from_histogram(["ab", "cd"], [1, 1], 1)
    assert merges[0] == ("a", "b")


def _corpus_table():
    texts = []
    for w, c in HIST.items():
        texts.extend([w] * c)
    # multi-word docs too
    texts.append("low newest widest")
    return pa.table({"rid": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_train_matches_histogram_path(ray_session):
    import ray.data as rd

    t = _corpus_table()
    model = bpe_train(rd.from_arrow(t), "text", n_merges=6)
    # independent: histogram from plain python over the same corpus
    from collections import Counter

    hist = Counter()
    for s in t.column("text").to_pylist():
        hist.update(s.split())
    items = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))
    want = bpe_merges_from_histogram([w for w, _ in items],
                                     [c for _, c in items], 6)
    assert model.merges == want


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    t = _corpus_table()
    m1 = bpe_train(rd.from_arrow(t).repartition(1), "text", n_merges=5)
    m3 = bpe_train(rd.from_arrow(t).repartition(3), "text", n_merges=5)
    assert m1.merges == m3.merges


def test_encode_counts_matches_serial(ray_session):
    import ray.data as rd

    t = _corpus_table()
    ds = rd.from_arrow(t)
    model = bpe_train(ds, "text", n_merges=6)
    out = (bpe_encode_counts(ds, model, "text").to_pandas()
           .sort_values("rid"))
    ranks = model.ranks
    want = [sum(len(bpe_encode_word(w, ranks)) for w in s.split())
            for s in t.column("text").to_pylist()]
    assert list(out["n_bpe_tokens"]) == want
    # every word is at least one token, at most chars+1
    for s, n in zip(t.column("text").to_pylist(), want):
        assert len(s.split()) <= n <= len(s) + len(s.split())


def test_max_word_types_cap(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_corpus_table())
    full = bpe_train(ds, "text", n_merges=3)
    capped = bpe_train(ds, "text", n_merges=3, max_word_types=2)
    assert len(capped.merges) == 3
    # cap keeps the two hottest types (newest:7, low:6) — merges learned
    # only from them, so 'est' merges still lead
    assert capped.merges[0] == ("e", "s")
    assert full.merges[0] == ("e", "s")


def test_empty_corpus_raises(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        bpe_train(rd.from_arrow(pa.table({
            "text": pa.array([" ", ""], pa.string())})), "text")
