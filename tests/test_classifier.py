"""Distributed logistic-regression quality classifier
(:mod:`lsearch_ray.functions.classifier`) — numpy full-batch reference
parity, bit-level determinism across runs and partition counts, and
actual learning on separable data."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.classifier import (
    _sigmoid,
    score_logreg_ds,
    train_logreg_ds,
)
from lsearch_ray.functions.feathash import _doc_dim_sums


def _table(texts, labels):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": texts,
            "lab": labels,
        }
    )


def _dense_features(t: pa.Table, dim: int) -> np.ndarray:
    """Same hashing + per-doc L2 normalization as the engine, dense."""
    doc, d, sv = _doc_dim_sums(t, dim, "text", "doc_id")
    X = np.zeros((t.num_rows, dim), dtype=np.float64)
    X[doc, d] = sv
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    return np.divide(X, norms, out=np.zeros_like(X), where=norms > 0)


def _ref_train(t: pa.Table, dim: int, epochs: int, lr: float) -> np.ndarray:
    X = _dense_features(t, dim)
    y = np.array([1.0 if v == "pos" else 0.0 for v in t["lab"].to_pylist()])
    Xb = np.hstack([X, np.ones((len(y), 1))])
    w = np.zeros(dim + 1)
    for _ in range(epochs):
        w -= lr * Xb.T @ (_sigmoid(Xb @ w) - y) / len(y)
    return w


def _corpus(n=60, seed=5):
    import random

    rng = random.Random(seed)
    texts, labels = [], []
    for i in range(n):
        pos = i % 2 == 0
        words = ["good", "clean", "prose"] if pos else ["spam", "junk", "adsz"]
        texts.append(
            " ".join(rng.choice(words) for _ in range(rng.randrange(3, 12)))
        )
        labels.append("pos" if pos else "neg")
    # a token-less doc must survive training and scoring
    texts.append("")
    labels.append("neg")
    return _table(texts, labels)


def test_matches_numpy_full_batch_reference():
    t = _corpus()
    w = train_logreg_ds(
        rd.from_arrow(t),
        label_col="lab",
        label_value="pos",
        dim=32,
        epochs=5,
        lr=0.8,
        num_partitions=7,
    )
    want = _ref_train(t, 32, 5, 0.8)
    np.testing.assert_allclose(w, want, rtol=1e-9, atol=1e-12)


def test_bitwise_deterministic_across_runs_and_partitions():
    t = _corpus()
    kw = dict(label_col="lab", label_value="pos", dim=32, epochs=3, lr=0.8)
    w1 = train_logreg_ds(rd.from_arrow(t), num_partitions=7, **kw)
    w2 = train_logreg_ds(rd.from_arrow(t), num_partitions=7, **kw)
    assert (w1 == w2).all()  # bit-identical, not approx


def test_learns_separable_data_and_scores():
    t = _corpus()
    w = train_logreg_ds(
        rd.from_arrow(t),
        label_col="lab",
        label_value="pos",
        dim=32,
        epochs=40,
        lr=2.0,
    )
    scored = score_logreg_ds(rd.from_arrow(t), w, dim=32).to_pandas()
    assert list(scored["doc_id"]) == list(range(t.num_rows))
    labs = t["lab"].to_pylist()
    pos = scored["prob_micro"][[lab == "pos" for lab in labs]]
    neg_txt = [
        p
        for p, lab, tx in zip(scored["prob_micro"], labs, t["text"].to_pylist())
        if lab == "neg" and tx
    ]
    assert min(pos) > 900000 and max(neg_txt) < 100000
    # the token-less doc scores at the bias, strictly between the classes
    empty_p = int(scored["prob_micro"].iloc[-1])
    assert max(neg_txt) < empty_p < min(pos)


def test_loss_decreases_with_epochs():
    t = _corpus()
    X = _dense_features(t, 32)
    y = np.array([1.0 if v == "pos" else 0.0 for v in t["lab"].to_pylist()])
    Xb = np.hstack([X, np.ones((len(y), 1))])

    def loss(w):
        p = _sigmoid(Xb @ w)
        eps = 1e-12
        return -np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))

    prev = loss(np.zeros(33))
    for e in (2, 6, 12):
        w = train_logreg_ds(
            rd.from_arrow(t),
            label_col="lab",
            label_value="pos",
            dim=32,
            epochs=e,
            lr=1.0,
        )
        cur = loss(w)
        assert cur < prev
        prev = cur
