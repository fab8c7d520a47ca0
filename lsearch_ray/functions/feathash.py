"""Feature-hashing document embeddings (the "hashing trick",
Weinberger et al. '09): a document's tf vector is projected to ``dim``
dimensions by hashing each term to a bucket ``h % dim`` with a sign bit
from the same hash — no vocabulary, no model, no fitting pass, bounded
memory at any corpus size. This is the deterministic text → vector
bridge: its output feeds the embedding operators (kmeans, knn_join,
LSH/IVF ANN) directly, and because every accumulation is an INTEGER
(signed tf sums) the relational form is exactly SQL-expressible.

Scale shape: pure map-side — ``term_counts_table`` emits each document's
triples inside one batch (a document never spans batches), so the
per-(doc, dim) sums complete within the batch and NO shuffle is needed.
The operator therefore consumes the DOCUMENTS table, not arbitrary
pre-shuffled triples (documented invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsearch_ray.analyzer import term_counts_table
from lsearch_ray.functions.sampling import _key_hash63

# hash bit used for the projection sign — far above any plausible dim's
# bucket bits (h % dim uses the LOW bits), so sign and bucket stay
# independent; a low bit would make the sign a function of the bucket
# for dim > 2^bit, breaking the hashing trick's unbiased-inner-product
# property
_SIGN_BIT = 40


def _doc_dim_sums(
    batch: pa.Table, dim: int, text_col: str, id_col: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_row_idx?, ...) helper: signed tf sums per (doc, dim) for one
    batch of DOCUMENTS. Returns (doc_ids, dims, sums) for groups that
    exist (a group whose signs cancel to 0 is still emitted — SQL GROUP
    BY semantics)."""
    triples = term_counts_table(batch, text_col, id_col)
    if triples.num_rows == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    h = _key_hash63(triples["term"])
    d = h % dim
    sign = np.where((h >> _SIGN_BIT) & 1 == 1, -1, 1)
    tf = triples["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc = triples["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sv = sign * tf
    order = np.lexsort((d, doc))
    doc, d, sv = doc[order], d[order], sv[order]
    change = np.flatnonzero((np.diff(doc) != 0) | (np.diff(d) != 0)) + 1
    starts = np.concatenate(([0], change))
    return doc[starts], d[starts], np.add.reduceat(sv, starts)


def feature_hash_relational(
    docs_ds,
    *,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Relational form: Dataset of (doc_id, dim, v) integer rows, the
    nonzero-structure of every document's hashed tf projection."""

    def fn(b: pa.Table) -> pa.Table:
        doc, d, sv = _doc_dim_sums(b, dim, text_col, id_col)
        return pa.table(
            {
                id_col: pa.array(doc),
                "dim": pa.array(d),
                "v": pa.array(sv),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def feature_hash_vectors(
    docs_ds,
    *,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
):
    """Dense form: Dataset of (doc_id, embedding: list<float32>) — the
    input shape of kmeans / knn_join / IVF. L2-normalized by default
    (token-less documents keep the zero vector)."""

    def fn(b: pa.Table) -> pa.Table:
        doc, d, sv = _doc_dim_sums(b, dim, text_col, id_col)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.zeros((len(ids), dim), dtype=np.float64)
        order = np.argsort(ids, kind="mergesort")
        rows = order[np.searchsorted(ids[order], doc)]
        mat[rows, d] = sv
        if normalize:
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mat = mat / norms
        return pa.table(
            {
                id_col: pa.array(ids),
                "embedding": pa.array(
                    list(mat.astype(np.float32)), type=pa.list_(pa.float32())
                ),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")
