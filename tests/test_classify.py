"""Naive Bayes classifier contracts: serial-reference exactness,
partitioning invariance, vocabulary cap, prior fallback, tie-break."""

import math

import numpy as np
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import nb_predict, nb_train

TRAIN = [
    ("cat cat dog purr", "pets"),
    ("dog dog bark cat", "pets"),
    ("stock bond yield market", "finance"),
    ("market stock crash bond bond", "finance"),
    ("yield curve market stock", "finance"),
]
TEST = [
    "cat dog",            # clearly pets
    "bond market yield",  # clearly finance
    "purr bark",          # pets-only vocab
    "zzz qqq www",        # fully OOV → prior argmax (finance: 3/5 docs)
    "",                   # empty text → prior argmax
]


def _train_table(rows):
    return pa.table({
        "text": pa.array([t for t, _ in rows], pa.string()),
        "lang": pa.array([l for _, l in rows], pa.string()),
    })


def _serial_nb(train_rows, test_texts, alpha=1.0):
    """Independent serial reference (plain dict math, no numpy)."""
    from collections import Counter, defaultdict

    counts = defaultdict(Counter)
    doc_counts = Counter()
    for text, label in train_rows:
        doc_counts[label] += 1
        counts[label].update(text.split())
    labels = sorted(doc_counts)
    vocab = sorted({w for c in counts.values() for w in c})
    V = len(vocab)
    n_docs = sum(doc_counts.values())
    preds = []
    for text in test_texts:
        best = None
        for label in labels:  # asc order → first max wins ties
            tot = sum(counts[label].values())
            s = math.log(doc_counts[label] / n_docs)
            for w in text.split():
                if w in set(vocab):
                    s += math.log((counts[label][w] + alpha) / (tot + alpha * V))
            s = round(s, 6)
            if best is None or s > best[0]:
                best = (s, label)
        preds.append(best[1])
    return preds


def _predict(ray, train_rows, test_texts, parts=1, **kw):
    import ray.data as rd

    model = nb_train(rd.from_arrow(_train_table(train_rows)).repartition(parts),
                     "text", "lang", **kw)
    test = rd.from_arrow(pa.table({
        "rid": pa.array(range(len(test_texts)), pa.int64()),
        "text": pa.array(test_texts, pa.string())}))
    out = (nb_predict(test.repartition(parts), model, "text").to_pandas()
           .sort_values("rid"))  # block completion order is not row order
    return model, list(out["pred_label"])


def test_matches_serial_reference(ray_session):
    want = _serial_nb(TRAIN, TEST)
    _, got = _predict(ray_session, TRAIN, TEST)
    assert got == want
    assert got[:3] == ["pets", "finance", "pets"]
    # OOV / empty docs fall back to the prior argmax (finance has more docs)
    assert got[3] == "finance" and got[4] == "finance"


def test_partitioning_invariance(ray_session):
    _, p1 = _predict(ray_session, TRAIN, TEST, parts=1)
    m3, p3 = _predict(ray_session, TRAIN, TEST, parts=3)
    assert p1 == p3
    # model itself is a pure function of the training SET
    m1, _ = _predict(ray_session, TRAIN, TEST, parts=1)
    assert list(m1.vocab) == list(m3.vocab)
    np.testing.assert_array_equal(m1.log_prob, m3.log_prob)
    np.testing.assert_array_equal(m1.log_prior, m3.log_prior)


def test_max_vocab_cap(ray_session):
    model, _ = _predict(ray_session, TRAIN, TEST, max_vocab=3)
    assert model.vocab_size == 3
    # top-3 by global count desc, term asc: bond(3) cat(3) dog(3) vs
    # market(3)... counts: cat 3, dog 3, bond 3, market 3, stock 3 →
    # tie broken by term ascending
    assert list(model.vocab) == ["bond", "cat", "dog"]


def test_model_shape_and_smoothing(ray_session):
    model, _ = _predict(ray_session, TRAIN, TEST)
    V, L = model.vocab_size, model.n_labels
    assert model.log_prob.shape == (V, L)
    assert list(model.labels) == ["finance", "pets"]
    # each label column's probabilities sum to <= 1 (smoothed multinomial
    # over the vocab exactly sums to 1)
    col_sums = np.exp(model.log_prob).sum(axis=0)
    np.testing.assert_allclose(col_sums, 1.0, rtol=1e-9)


def test_label_tiebreak_ascending(ray_session):
    # symmetric training data → identical scores → label asc wins
    rows = [("x y", "bbb"), ("x y", "aaa")]
    _, got = _predict(ray_session, rows, ["x y", "zz"])
    assert got == ["aaa", "aaa"]


def test_empty_training_raises(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        nb_train(rd.from_arrow(pa.table({
            "text": pa.array(["", "  "], pa.string()),
            "lang": pa.array(["a", "b"], pa.string())})), "text", "lang")
