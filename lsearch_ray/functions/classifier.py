"""Distributed linear quality classifier — a fastText-style logistic
regression over hashed bag-of-words features, trained with
deterministic full-batch gradient descent. The supervised member of
the model-training family (BPE = tokenizer, k-means = unsupervised,
DSIR = importance reweighting): web pipelines train exactly this shape
of model on "wiki-like vs crawl" labels and keep the top-p% scoring
documents (GPT-3/LLaMA-style quality filtering).

Determinism contract (what makes the scores hash-stable): the
per-epoch gradient is the sum of ``num_partitions`` per-partition
partials; each partial is computed over its partition's rows sorted by
(doc, dim) and the driver folds partials in fixed partition order — so
the trained weights are BIT-IDENTICAL across runs, batch layouts and
CPU counts (the partitioning is a doc-id hash, P is fixed).

Scale shape:

1. features materialize ONCE: sparse (doc, __part, dim, v, y) rows
   from the feature-hashing trick (`feathash._doc_dim_sums`, map-side,
   no vocabulary) with per-doc L2 normalization — the epochs loop
   never re-tokenizes;
2. per epoch: ONE groupby(__part) pass with the current weight vector
   broadcast in the task closure; a partition emits ONE
   (part, grad list<double>, n) row — (dim+1)-bounded, never
   doc-shaped;
3. driver update is O(P·dim) — the only driver-side state is the
   weight vector itself.

Full-batch GD (not SGD) is the deliberate choice: it is the variant
whose result is order-independent in exact arithmetic, so the
determinism contract costs nothing statistically at epochs × one
pass, and each epoch is embarrassingly parallel.

Reference counterpart: none; SURVEY §2.9 model-training-family
extension (quality scoring for curation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.functions.dedup import partition_ids
from lsearch_ray.functions.feathash import _doc_dim_sums


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically stable split form
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _feature_rows(
    docs_ds,
    *,
    dim: int,
    label_col: str,
    label_value,
    text_col: str,
    id_col: str,
    num_partitions: int,
):
    """Sparse normalized feature rows (doc, dim, v, y, __part), one
    partition id per doc. Token-less docs keep a bias-only row
    (dim = -1, v = 0) so they stay in the training set."""

    def fn(b: pa.Table) -> pa.Table:
        doc, d, sv = _doc_dim_sums(b, dim, text_col, id_col)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = (
            pc.fill_null(
                pc.equal(b[label_col], pa.scalar(label_value)), False
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # per-doc L2 norm over the signed sums
        v = sv.astype(np.float64)
        order = np.argsort(ids, kind="mergesort")
        rows = order[np.searchsorted(ids[order], doc)]
        norm_sq = np.zeros(len(ids), dtype=np.float64)
        np.add.at(norm_sq, rows, v * v)
        norms = np.sqrt(norm_sq)
        vn = np.where(norms[rows] > 0, v / np.where(norms[rows] > 0, norms[rows], 1.0), 0.0)
        # bias-only sentinel row for every doc (dim −1, v 0) keeps
        # token-less docs present and carries the label exactly once
        all_doc = np.concatenate([doc, ids])
        all_dim = np.concatenate([d, np.full(len(ids), -1, dtype=np.int64)])
        all_v = np.concatenate([vn, np.zeros(len(ids))])
        all_y = np.concatenate([y[rows], y])
        t = pa.table(
            {
                "doc": pa.array(all_doc),
                "dim": pa.array(all_dim),
                "v": pa.array(all_v, type=pa.float64()),
                "y": pa.array(all_y),
            }
        )
        return t.append_column(
            "__part", pa.array(partition_ids(t, ["doc"], num_partitions))
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow").materialize()


def _epoch_partials(rows_ds, w: np.ndarray, dim: int):
    """One training pass: per-partition (part, grad, n) rows with the
    current weights broadcast in the closure."""

    def grad_part(g: pa.Table) -> pa.Table:
        doc = g["doc"].to_numpy()
        dms = g["dim"].to_numpy()
        v = g["v"].to_numpy()
        y = g["y"].to_numpy()
        order = np.lexsort((dms, doc))  # fixed accumulation order
        doc, dms, v, y = doc[order], dms[order], v[order], y[order]
        ud, inv = np.unique(doc, return_inverse=True)
        logits = np.full(len(ud), w[dim], dtype=np.float64)  # bias
        feat = dms >= 0
        np.add.at(logits, inv[feat], v[feat] * w[dms[feat]])
        resid = _sigmoid(logits)
        # y per doc: every row of a doc carries it; take the sentinel's
        is_sent = dms == -1
        y_doc = np.zeros(len(ud), dtype=np.float64)
        y_doc[inv[is_sent]] = y[is_sent]
        resid = resid - y_doc
        grad = np.zeros(dim + 1, dtype=np.float64)
        np.add.at(grad, dms[feat], resid[inv[feat]] * v[feat])
        grad[dim] = resid.sum()  # bias gradient
        part = int(g["__part"][0].as_py())
        return pa.table(
            {
                "part": pa.array([part], type=pa.int64()),
                "grad": pa.array([grad.tolist()], type=pa.list_(pa.float64())),
                "n": pa.array([len(ud)], type=pa.int64()),
            }
        )

    return rows_ds.groupby("__part").map_groups(
        grad_part, batch_format="pyarrow"
    ).take_all()


def train_logreg_ds(
    docs_ds,
    *,
    label_col: str,
    label_value,
    dim: int = 64,
    epochs: int = 8,
    lr: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
) -> np.ndarray:
    """Train the classifier; returns the (dim+1) weight vector (last
    entry is the bias). ``y = (label_col == label_value)``."""
    rows = _feature_rows(
        docs_ds,
        dim=dim,
        label_col=label_col,
        label_value=label_value,
        text_col=text_col,
        id_col=id_col,
        num_partitions=num_partitions,
    )
    w = np.zeros(dim + 1, dtype=np.float64)
    for _ in range(epochs):
        partials = _epoch_partials(rows, w, dim)
        partials.sort(key=lambda r: r["part"])  # fixed fold order
        grad = np.zeros(dim + 1, dtype=np.float64)
        n = 0
        for r in partials:
            grad += np.asarray(r["grad"], dtype=np.float64)
            n += r["n"]
        if n == 0:
            break
        w -= lr * grad / n
    return w


def score_logreg_ds(
    docs_ds,
    w: np.ndarray,
    *,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, prob_micro) sorted by doc_id: the trained model's
    P(label) per document as floor(p·1e6 + 0.5) — stable because the
    weights are deterministic (see module contract)."""
    wb = np.asarray(w, dtype=np.float64)

    def fn(b: pa.Table) -> pa.Table:
        doc, d, sv = _doc_dim_sums(b, dim, text_col, id_col)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = sv.astype(np.float64)
        order = np.argsort(ids, kind="mergesort")
        rows = order[np.searchsorted(ids[order], doc)]
        norm_sq = np.zeros(len(ids), dtype=np.float64)
        np.add.at(norm_sq, rows, v * v)
        norms = np.sqrt(norm_sq)
        vn = np.where(norms[rows] > 0, v / np.where(norms[rows] > 0, norms[rows], 1.0), 0.0)
        logits = np.full(len(ids), wb[dim], dtype=np.float64)
        np.add.at(logits, rows, vn * wb[d])
        p = _sigmoid(logits)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "prob_micro": pa.array(
                    np.floor(p * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow").sort("doc_id")
