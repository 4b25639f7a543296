"""Char-trigram LM perplexity contracts: serial-reference exactness,
fluency ordering, short-doc NULLs, partitioning invariance."""

import math

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import score_perplexity, train_char_lm

DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "xq zv jk wp qx vz kj",      # unseen-ish trigram soup
    "the the the the the",       # hyper-repetitive → very fluent
    "ab",                        # < 3 chars → NULL score
    "",
]


def _serial_nll(texts, alpha=0.5):
    from collections import Counter

    tri, bi, uni = Counter(), Counter(), Counter()
    for t in texts:
        for i in range(len(t) - 2):
            tri[t[i:i + 3]] += 1
        for i in range(len(t) - 1):
            bi[t[i:i + 2]] += 1
        uni.update(t)
    A = len(uni)
    out = []
    for t in texts:
        lps = [math.log((tri[t[i:i + 3]] + alpha) / (bi[t[i:i + 2]] + alpha * A))
               for i in range(len(t) - 2)]
        out.append(round(-sum(lps) / len(lps), 6) if lps else None)
    return out


def _ray_nll(ray, texts, parts=1, alpha=0.5):
    import ray.data as rd

    t = pa.table({"rid": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(parts)
    lm = train_char_lm(ds, "text", alpha=alpha)
    out = (score_perplexity(ds, lm, "text", out_col="nll")
           .to_pandas().sort_values("rid"))
    return lm, [None if np.isnan(v) else v for v in out["nll"]]


def test_matches_serial_reference(ray_session):
    want = _serial_nll(DOCS)
    _, got = _ray_nll(ray_session, DOCS)
    assert got == want


def test_fluency_ordering(ray_session):
    _, got = _ray_nll(ray_session, DOCS)
    # repetitive text scores most fluent; random soup least
    assert got[3] < got[0] and got[3] < got[1]
    assert got[2] > got[0] and got[2] > got[1]


def test_short_docs_null(ray_session):
    _, got = _ray_nll(ray_session, DOCS)
    assert got[4] is None and got[5] is None


def test_partitioning_invariance(ray_session):
    lm1, n1 = _ray_nll(ray_session, DOCS, parts=1)
    lm3, n3 = _ray_nll(ray_session, DOCS, parts=3)
    assert n1 == n3
    np.testing.assert_array_equal(lm1.tri_hash, lm3.tri_hash)
    np.testing.assert_array_equal(lm1.tri_count, lm3.tri_count)
    assert lm1.alphabet == lm3.alphabet


def test_model_shapes(ray_session):
    lm, _ = _ray_nll(ray_session, DOCS)
    assert len(lm.tri_hash) == len(lm.tri_count)
    assert len(lm.bi_hash) == len(lm.bi_count)
    # alphabet equals the distinct characters across all docs
    assert lm.alphabet == len(set("".join(DOCS)))
    # counts conserve mass: Σ tri counts == Σ per-doc trigram positions
    assert lm.tri_count.sum() == sum(max(len(t) - 2, 0) for t in DOCS)


def test_empty_corpus_raises(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        train_char_lm(rd.from_arrow(pa.table({
            "text": pa.array(["", ""], pa.string())})), "text")
