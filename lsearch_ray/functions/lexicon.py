"""Lexicon-based topic tagging over a text column.

The taxonomy-tagging stage of a training-data pipeline: a small
curated lexicon (topic → term list) is broadcast to every map task;
each document gets a per-topic matching-token count and an argmax tag.
This is the keyword complement of the learned classifier
(:mod:`lsearch_ray.functions.classifier`) — zero training, fully
auditable, the shape used for domain-mix labeling (e.g. RedPajama /
Dolma source tags) and PII/topic triage.

Semantics (the operator's defined kernel, mirrored by the SQL twin):

- tokens come from the engine analyzer (lowercase, ``[a-z0-9]`` runs —
  the reference's case-fold + split, cli.rs:520-536 applied corpus-side);
- ``<topic>_n`` = number of token OCCURRENCES in the topic's term set
  (a multiset count, not distinct terms);
- ``tag`` = alphabetically-first topic among those with the maximum
  count, or ``none_tag`` when every count is zero (token-less docs
  included).

Scale shape: pure map-side — the lexicon is a constant shipped inside
the map closure (tiny: tens of terms), matching is one vectorized
``pc.is_in`` over the flat token array per topic plus a ``bincount``
segment-sum; no shuffle, no driver materialization. At 100 TB this is
embarrassingly parallel.

Reference counterpart: none (the reference has no tagging surface);
SURVEY §2.9 text-analysis extension.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.analyzer import flat_tokens_arrow


def lexicon_tag_ds(
    docs_ds,
    lexicon: dict[str, list[str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    none_tag: str = "none",
):
    """Per-doc topic counts + argmax tag.

    Returns a Dataset of ``(id_col, <topic>_n … one int64 column per
    topic in alphabetical order, tag)``; one output row per input row
    (docs with no matching tokens keep zero counts and ``none_tag``).
    """
    topics = sorted(lexicon)
    if not topics:
        raise ValueError("lexicon must name at least one topic")
    value_sets = {
        t: pa.array(sorted(set(lexicon[t])), type=pa.large_string())
        for t in topics
    }
    topic_arr = np.array(topics, dtype=object)

    def tag_batch(b: pa.Table) -> pa.Table:
        n = b.num_rows
        parents, flat = flat_tokens_arrow(b[text_col])
        counts = np.zeros((len(topics), n), dtype=np.int64)
        if len(flat):
            for ti, t in enumerate(topics):
                m = pc.is_in(flat, value_set=value_sets[t]).to_numpy(
                    zero_copy_only=False
                )
                if m.any():
                    counts[ti] = np.bincount(parents[m], minlength=n)
        if n:
            best = counts.argmax(axis=0)  # first max = alphabetical min
            mx = counts.max(axis=0)
            tags = np.where(mx > 0, topic_arr[best], none_tag)
        else:
            tags = np.empty(0, dtype=object)
        cols: dict[str, pa.Array | pa.ChunkedArray] = {id_col: b[id_col]}
        for ti, t in enumerate(topics):
            cols[f"{t}_n"] = pa.array(counts[ti], type=pa.int64())
        cols["tag"] = pa.array(tags.tolist(), type=pa.string())
        return pa.table(cols)

    return docs_ds.map_batches(tag_batch, batch_format="pyarrow")
