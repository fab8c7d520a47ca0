"""Distributed BPE merge learning — the tokenizer-training step of an
LLM data pipeline (Sennrich et al. '16 byte-pair encoding, applied at
the word level): repeatedly find the corpus-wide most frequent ADJACENT
token pair and fuse it into a single token, yielding the ordered merge
table a tokenizer would ship.

Exact contract (any engine can replay it):

- pairs are counted over within-document adjacency of the CURRENT token
  stream (no pair spans two documents);
- the winning merge per step is the (count DESC, w1 ASC, w2 ASC)
  minimum — a deterministic total order;
- applying a merge is GREEDY LEFT-TO-RIGHT, non-overlapping: in a run
  of k consecutive candidate positions (only possible when w1 == w2),
  occurrences at even offsets within the run merge, odd ones are
  consumed — the classic BPE scan order;
- fused tokens join with ``\\x01`` internally (a byte no raw token can
  contain) and render with spaces in the output.

Scale shape: the token-stream state lives as a ``large_list<string>``
column (one row per document — apply is a pure per-batch map, nothing
shuffles); each learning step is ONE combiner-first pair-count shuffle
(per-batch two-key groupby partials → global groupby.sum → per-block
top-1 prune → a 1-row driver argmax broadcast back into the apply
map). ``iters`` steps = ``iters`` passes, each materialized so the next
step reads fused state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.analyzer import flat_tokens_arrow
from lsearch_ray.functions.ngrams import GRAM_SEP


def _toks_state(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(id, toks: large_list<large_string>) initial token-stream state."""
    parents, flat = flat_tokens_arrow(batch[text_col])
    counts = np.bincount(parents, minlength=batch.num_rows)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    lst = pa.LargeListArray.from_arrays(pa.array(offsets), flat)
    return pa.table({id_col: batch[id_col], "toks": lst})


def _flat_with_parents(toks_col) -> tuple[np.ndarray, pa.Array, int]:
    """Flatten a list column back to (parents, flat_tokens, n_rows)."""
    arr = toks_col.combine_chunks()
    counts = np.diff(np.asarray(arr.offsets, dtype=np.int64))
    parents = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return parents, arr.flatten(), len(counts)


def _pair_partial(b: pa.Table) -> pa.Table:
    parents, flat, _ = _flat_with_parents(b["toks"])
    m = len(flat) - 1
    empty = pa.table(
        {
            "w1": pa.array([], type=pa.large_string()),
            "w2": pa.array([], type=pa.large_string()),
            "n": pa.array([], type=pa.int64()),
        }
    )
    if m <= 0:
        return empty
    valid = pa.array(parents[:m] == parents[1:])
    t = pa.table(
        {
            "w1": flat.slice(0, m).filter(valid),
            "w2": flat.slice(1, m).filter(valid),
        }
    )
    if t.num_rows == 0:
        return empty
    agg = t.group_by(["w1", "w2"]).aggregate([("w1", "count")])
    return pa.table(
        {
            "w1": agg["w1"].combine_chunks().cast(pa.large_string()),
            "w2": agg["w2"].combine_chunks().cast(pa.large_string()),
            "n": agg["w1_count"].cast(pa.int64()),
        }
    )


def _best_pair(state_ds) -> tuple[str, str, int] | None:
    """Corpus argmax pair under (n DESC, w1 ASC, w2 ASC)."""
    counts = (
        state_ds.map_batches(_pair_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .sum("n")
    )

    from lsearch_ray.functions.ngrams import _block_topk

    top = (
        counts.map_batches(
            lambda t: _block_topk(
                t,
                1,
                [
                    ("sum(n)", "descending"),
                    ("w1", "ascending"),
                    ("w2", "ascending"),
                ],
            ),
            batch_format="pyarrow",
        )
        .sort(["sum(n)", "w1", "w2"], descending=[True, False, False])
        .limit(1)
        .take_all()
    )
    if not top:
        return None
    r = top[0]
    return str(r["w1"]), str(r["w2"]), int(r["sum(n)"])


def _apply_merge(b: pa.Table, w1: str, w2: str, id_col: str) -> pa.Table:
    """Greedy left-to-right fuse of every (w1, w2) adjacency — fully
    vectorized: candidate mask → run-parity keep set → one if_else over
    the surviving positions."""
    parents, flat, nrows = _flat_with_parents(b["toks"])
    m = len(flat) - 1
    if m <= 0:
        return pa.table({id_col: b[id_col], "toks": b["toks"].combine_chunks()})
    cand = (
        pc.equal(flat.slice(0, m), pa.scalar(w1, pa.large_string()))
        .to_numpy(zero_copy_only=False)
        & pc.equal(flat.slice(1, m), pa.scalar(w2, pa.large_string())).to_numpy(
            zero_copy_only=False
        )
        & (parents[:m] == parents[1:])
    )
    idx = np.flatnonzero(cand)
    if len(idx) == 0:
        return pa.table({id_col: b[id_col], "toks": b["toks"].combine_chunks()})
    # greedy scan order: within each run of consecutive candidates
    # (w1 == w2 repeats), even offsets merge, odd ones are consumed
    run_start = np.concatenate(([True], np.diff(idx) != 1))
    run_id = np.cumsum(run_start) - 1
    offset = np.arange(len(idx)) - np.flatnonzero(run_start)[run_id]
    keep_idx = idx[offset % 2 == 0]
    consumed = np.zeros(len(flat), dtype=bool)
    consumed[keep_idx + 1] = True
    merge_at = np.zeros(len(flat), dtype=bool)
    merge_at[keep_idx] = True
    surv = np.flatnonzero(~consumed)
    joined = pc.binary_join_element_wise(
        flat.slice(0, m),
        flat.slice(1, m),
        pa.scalar(GRAM_SEP, type=pa.large_string()),
    )
    base = flat.take(pa.array(surv))
    merged_vals = joined.take(pa.array(np.minimum(surv, m - 1)))
    out_flat = pc.if_else(pa.array(merge_at[surv]), merged_vals, base)
    new_counts = np.bincount(parents[surv], minlength=nrows)
    offsets = np.concatenate(([0], np.cumsum(new_counts))).astype(np.int64)
    lst = pa.LargeListArray.from_arrays(pa.array(offsets), out_flat)
    return pa.table({id_col: b[id_col], "toks": lst})


def bpe_merges_ds(
    docs_ds,
    *,
    iters: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Learn the first ``iters`` BPE merges over a document corpus.

    Returns an Arrow table (step, w1, w2, n) ordered by step — the
    winning pair and its corpus count at each step, with fused tokens
    rendered space-separated. Stops early (fewer rows) when no adjacent
    pair remains.
    """
    state = docs_ds.map_batches(
        lambda b: _toks_state(b, text_col, id_col), batch_format="pyarrow"
    ).materialize()
    steps: list[tuple[int, str, str, int]] = []
    for k in range(1, iters + 1):
        best = _best_pair(state)
        if best is None:
            break
        w1, w2, n = best
        steps.append((k, w1, w2, n))
        if k < iters:
            state = state.map_batches(
                lambda b, _w1=w1, _w2=w2: _apply_merge(b, _w1, _w2, id_col),
                batch_format="pyarrow",
            ).materialize()
    return pa.table(
        {
            "step": pa.array([s[0] for s in steps], pa.int64()),
            "w1": pa.array(
                [s[1].replace(GRAM_SEP, " ") for s in steps], pa.large_string()
            ),
            "w2": pa.array(
                [s[2].replace(GRAM_SEP, " ") for s in steps], pa.large_string()
            ),
            "n": pa.array([s[3] for s in steps], pa.int64()),
        }
    )


def bpe_apply_ds(
    docs_ds,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Apply a learned merge list to a corpus — the tokenize step once
    the merge table is trained. Returns (id_col, n_tokens) per document
    (the fused-stream length; the list state itself stays distributed).
    Merges use the INTERNAL token representation (``\\x01``-joined).

    ONE plan stage: the merge list loops INSIDE the batch function (a
    trained table has thousands of entries — one chained map_batches
    per merge would build a thousands-deep logical plan and flatten /
    rebuild every list column once per stage)."""

    def apply_all(b: pa.Table) -> pa.Table:
        t = _toks_state(b, text_col, id_col)
        for w1, w2 in merges:
            t = _apply_merge(t, w1, w2, id_col)
        return t

    state = docs_ds.map_batches(apply_all, batch_format="pyarrow")
    return state.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "n_tokens": pa.array(
                    np.diff(
                        np.asarray(
                            b["toks"].combine_chunks().offsets, dtype=np.int64
                        )
                    ),
                    type=pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
