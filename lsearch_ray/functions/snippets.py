"""Query snippet (highlight-window) extraction.

For each document that contains at least one query term, select the
best ``window``-token window of its normalized token stream: the window
containing the most DISTINCT query terms, ties broken by the LEFTMOST
start. Returns the window's 1-based start, its distinct-term score, and
the snippet text (window tokens single-space joined) — the classic
search-results highlighting primitive (KWIC / best-passage selection),
which the reference CLI's grid/score sinks print around (``cli.rs``
grid sink shows raw content; this computes the passage to show).

Window semantics: full ``window``-token windows only; a document
shorter than ``window`` has exactly one candidate window — the whole
document. Windows never span documents.

Scale shape: ENTIRELY map-side (one vectorized pass per batch; the
query is a handful of terms, so per-term containment is a cumsum
difference over the flat token array) plus the output sort. Per-doc
argmax with leftmost tie-break is one ``np.maximum.reduceat`` over a
composite (score·B − offset) key — no per-row Python.

Reference counterpart: none (the reference prints raw lines);
SURVEY §2.9 retrieval-family extension alongside PRF/RRF/MLT.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EMPTY = pa.table(
    {
        "doc_id": pa.array([], type=pa.int64()),
        "start": pa.array([], type=pa.int64()),
        "n_terms": pa.array([], type=pa.int64()),
        "snippet": pa.array([], type=pa.large_string()),
    }
)


def _query_terms(query: str) -> list[str]:
    """Distinct normalized query terms, via the shared analyzer."""
    from lsearch_ray.analyzer import flat_tokens_arrow

    _, flat = flat_tokens_arrow(pa.array([query], type=pa.large_string()))
    return sorted(set(flat.to_pylist()))


def snippets_ds(
    docs_ds,
    query: str,
    *,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, start, n_terms, snippet) sorted by doc_id, one row per
    document containing ≥ 1 query term."""
    terms = _query_terms(query)
    if not terms:
        raise ValueError("query has no terms after normalization")

    def best(b: pa.Table) -> pa.Table:
        from lsearch_ray.analyzer import flat_tokens_arrow

        parents, flat = flat_tokens_arrow(b[text_col])
        n = len(flat)
        if n == 0:
            return _EMPTY
        nrows = b.num_rows
        L = np.bincount(parents, minlength=nrows).astype(np.int64)
        doc_first = np.concatenate(([0], np.cumsum(L)))[:-1]
        # window end per flat start j: min(j + window, end of j's doc)
        ends = np.minimum(
            np.arange(n, dtype=np.int64) + window,
            (doc_first + L)[parents],
        )
        score = np.zeros(n, dtype=np.int64)
        for t in terms:
            occ = pc.equal(flat, pa.scalar(t, type=flat.type))
            occ = occ.to_numpy(zero_copy_only=False).astype(np.int64)
            cs = np.concatenate(([0], np.cumsum(occ)))
            score += cs[ends] > cs[np.arange(n)]
        # candidate starts: in-doc offset ≤ max(L − window, 0)
        off = np.arange(n, dtype=np.int64) - doc_first[parents]
        valid = off <= np.maximum(L - window, 0)[parents]
        # per-doc argmax, leftmost tie: maximize score·B − offset
        B = np.int64(n + 2)
        key = np.where(valid, score * B - off, np.int64(-1))
        nz = np.flatnonzero(L > 0)  # docs with ≥ 1 token
        mx = np.maximum.reduceat(key, doc_first[nz])
        sc = (mx + B - 1) // B  # ceil(mx / B) == score (offset < B)
        keep = sc >= 1
        if not keep.any():
            return _EMPTY
        rows = nz[keep]
        sc = sc[keep]
        pos = sc * B - mx[keep]  # the winning in-doc offset
        s = doc_first[rows] + pos
        e = np.minimum(s + window, doc_first[rows] + L[rows])
        # rebuild snippets zero-copy: gather the kept token runs into
        # one ListArray and binary_join
        lens = (e - s).astype(np.int64)
        idx = np.repeat(s, lens) + (
            np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(lens)))[:-1], lens)
        )
        toks = flat.take(pa.array(idx))
        offsets = np.concatenate(([0], np.cumsum(lens)))
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), toks
        )
        return pa.table(
            {
                "doc_id": b[id_col].take(pa.array(rows)).cast(pa.int64()),
                "start": pa.array(pos + 1),
                "n_terms": pa.array(sc),
                "snippet": pc.binary_join(
                    lst, pa.scalar(" ", type=pa.large_string())
                ),
            }
        )

    return docs_ds.map_batches(best, batch_format="pyarrow").sort("doc_id")
