"""Word n-gram operators over a text column: corpus n-gram counts and
benchmark decontamination.

Training-data hygiene ops for a web-scale corpus (SURVEY.md §2.9 gap
families — the reference engine has no n-gram surface). Both share one
vectorized gram extractor built on ``analyzer.flat_tokens_arrow`` (the
byte-level tokenizer already oracle-proven by ``tf_triples``): grams are
formed by joining n zero-copy slices of the flat token array with
``pyarrow.compute.binary_join_element_wise`` — no Python per-row loop.

Scale design:

- ``ngram_counts_ds``: per-batch ``value_counts`` partials (the combiner)
  → one ``groupby(gram).sum`` shuffle over pre-aggregated rows → per-block
  top-k prune → tiny global sort/limit. The all-to-all carries at most
  one row per distinct gram per batch, never one per occurrence.
- ``decontaminate_ds``: the benchmark side is SMALL BY NATURE (an eval
  suite vs a 100-TB corpus), so its distinct grams are collected once and
  broadcast into every task — membership is an exact Arrow ``is_in`` on
  gram strings, no shuffle of the big side at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.analyzer import flat_tokens_arrow

# joins tokens inside a gram; cannot appear in a token ([a-z0-9]+ runs)
GRAM_SEP = "\x01"


def doc_ngrams(
    texts: pa.ChunkedArray | pa.Array, n: int
) -> tuple[np.ndarray, pa.Array]:
    """Word n-grams of each row of a string column.

    Returns ``(parents, grams)``: gram i came from row ``parents[i]``;
    grams are the n lowercase tokens joined with ``GRAM_SEP``. Rows with
    fewer than n tokens contribute none. Vectorized: n zero-copy slices
    of the flat token array joined element-wise, with a boundary mask
    dropping windows that span two rows.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    parents, flat = flat_tokens_arrow(texts)
    empty = (np.empty(0, dtype=np.int64), pa.array([], type=pa.large_string()))
    m = len(flat) - n + 1
    if m <= 0:
        return empty
    # window [i, i+n) stays inside one row iff its first and last tokens
    # share a parent (parents is non-decreasing)
    valid = parents[:m] == parents[n - 1 :]
    if not valid.any():
        return empty
    joined = pc.binary_join_element_wise(
        *[flat.slice(i, m) for i in range(n)],
        pa.scalar(GRAM_SEP, type=pa.large_string()),
    )
    mask = pa.array(valid)
    return parents[:m][valid], joined.filter(mask)


def _count_partial(batch: pa.Table, n: int, text_col: str) -> pa.Table:
    _, grams = doc_ngrams(batch[text_col], n)
    if len(grams) == 0:
        return pa.table(
            {
                "gram": pa.array([], type=pa.large_string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    vc = grams.value_counts()
    return pa.table(
        {"gram": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
    )


def _block_topk(
    t: pa.Table, k: int, sort_keys: list[tuple[str, str]] | None = None
) -> pa.Table:
    """Per-block top-k — every global top-k row is inside its own block's
    top-k, so pruning before the global sort is lossless while cutting
    the final exchange to k rows per block. Default order is the n-gram
    family's (n desc, gram asc); pass ``sort_keys`` for other schemas
    (the same invariant holds for any total order)."""
    if t.num_rows <= k:
        return t
    idx = pc.sort_indices(
        t,
        sort_keys=sort_keys
        or [("n", "descending"), ("gram", "ascending")],
    )
    return t.take(idx.slice(0, k))


#: Vocabulary rows above which the unigram-count table stops being
#: broadcast to every task and is hash-joined instead (the knn_join
#: totalization pattern, functions/ann.py). A 100-TB web crawl's raw
#: token vocabulary (typos, URLs, hashes) is billions of rows — far past
#: any driver collect.
DEFAULT_VOCAB_BROADCAST_ROWS = 2_000_000


def unigram_counts_ds(ds, text_col: str = "text"):
    """Corpus unigram counts as a DATASET of (term, ``sum(n)``) — the
    scale-safe form: per-batch ``value_counts`` partials into one
    groupby-sum, nothing driver-side. The shared counting stage behind
    pmi_bigrams_ds / bigram_lm_ds / term_clusters_ds; collect it with
    :func:`unigram_counts_rows` only under the broadcast budget."""
    from lsearch_ray.analyzer import flat_tokens_arrow

    def uni_partial(batch: pa.Table) -> pa.Table:
        _, flat = flat_tokens_arrow(batch[text_col])
        if len(flat) == 0:
            return pa.table(
                {
                    "term": pa.array([], type=pa.large_string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        vc = flat.value_counts()
        return pa.table(
            {"term": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    return (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("n")
    )


def unigram_counts_rows(ds, text_col: str = "text") -> list[dict]:
    """Driver-side collect of :func:`unigram_counts_ds` — only valid for
    vocabularies under the broadcast budget; the routed consumers call
    this exclusively on that side of the cap."""
    return unigram_counts_ds(ds, text_col).take_all()


def ngram_counts_ds(
    ds, n: int = 3, k: int = 20, text_col: str = "text"
) -> pa.Table:
    """Top-k most frequent word n-grams of a corpus.

    Returns (gram, n) with grams rendered space-separated, ordered by
    (count desc, gram asc) — a deterministic total order.
    """
    partials = ds.map_batches(
        lambda b: _count_partial(b, n, text_col), batch_format="pyarrow"
    )
    agg = partials.groupby("gram").sum("n")
    pruned = agg.map_batches(
        lambda t: _block_topk(
            pa.table({"gram": t["gram"], "n": t["sum(n)"]}), k
        ),
        batch_format="pyarrow",
    )
    top = (
        pruned.sort(["n", "gram"], descending=[True, False]).limit(k).take_all()
    )
    grams = [r["gram"].replace(GRAM_SEP, " ") for r in top]
    return pa.table(
        {
            "gram": pa.array(grams, type=pa.large_string()),
            "n": pa.array([int(r["n"]) for r in top], type=pa.int64()),
        }
    )


def benchmark_grams(bench_ds, n: int, text_col: str = "text") -> list[str]:
    """Distinct n-grams of the (small) benchmark corpus, collected to the
    driver for broadcast. Per-batch ``unique()`` keeps the exchange to
    distinct grams only."""

    def partial(batch: pa.Table) -> pa.Table:
        _, grams = doc_ngrams(batch[text_col], n)
        return pa.table({"gram": grams.unique()})

    return bench_ds.map_batches(partial, batch_format="pyarrow").unique("gram")


class _MarkContaminated:
    """map_batches combiner: per-doc count of DISTINCT grams shared with
    the broadcast benchmark set. The gram set ships once per task via the
    serialized instance (object-store broadcast), not per batch."""

    def __init__(self, bench_grams: list[str], n: int, text_col: str, id_col: str):
        self.value_set = pa.array(sorted(bench_grams), type=pa.large_string())
        self.n = n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                self.id_col: pa.array([], type=pa.int64()),
                "n_shared": pa.array([], type=pa.int64()),
            }
        )
        parents, grams = doc_ngrams(batch[self.text_col], self.n)
        if len(grams) == 0:
            return empty
        shared = pc.is_in(grams, value_set=self.value_set).to_numpy(
            zero_copy_only=False
        )
        if not shared.any():
            return empty
        # distinct (doc, gram) pairs: dictionary-encode the shared grams,
        # then unique over (parent, code) — a doc's rows never split
        # across batches (one row per doc), so per-batch distinct is
        # globally correct
        codes = np.asarray(
            grams.filter(pa.array(shared)).dictionary_encode().indices
        ).astype(np.int64)
        hit_parents = parents[shared]
        pairs = np.unique(np.stack([hit_parents, codes], axis=1), axis=0)
        docs, counts = np.unique(pairs[:, 0], return_counts=True)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)[docs]
        return pa.table(
            {
                self.id_col: pa.array(ids, type=pa.int64()),
                "n_shared": pa.array(counts, type=pa.int64()),
            }
        )


def _repetition_partial(batch: pa.Table, n: int, text_col: str, id_col: str) -> pa.Table:
    nrows = batch.num_rows
    total = np.zeros(nrows, dtype=np.int64)
    distinct = np.zeros(nrows, dtype=np.int64)
    top = np.zeros(nrows, dtype=np.int64)
    parents, grams = doc_ngrams(batch[text_col], n)
    if len(grams):
        total = np.bincount(parents, minlength=nrows).astype(np.int64)
        # dictionary-encode grams → per-(doc, gram) pair counts in one
        # unique pass; safe per batch because each doc is one row
        codes = np.asarray(grams.dictionary_encode().indices).astype(np.int64)
        pairs, pair_counts = np.unique(
            np.stack([parents, codes], axis=1), axis=0, return_counts=True
        )
        distinct = np.bincount(pairs[:, 0], minlength=nrows).astype(np.int64)
        np.maximum.at(top, pairs[:, 0], pair_counts)
    return pa.table(
        {
            id_col: batch[id_col],
            "total_grams": pa.array(total, type=pa.int64()),
            "distinct_grams": pa.array(distinct, type=pa.int64()),
            "top_gram_n": pa.array(top, type=pa.int64()),
        }
    )


def doc_repetition_stats(
    docs_ds, *, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
):
    """Per-document repetition signals (Gopher-style quality filtering):
    total word n-grams, distinct n-grams, and the count of the most
    repeated n-gram. Emitted as INTEGERS so the duplicate-gram fraction
    (1 - distinct/total) and top-gram fraction (top/total) are derivable
    bit-exactly by any consumer — and so the SQL oracle compares on exact
    values, not float encodings. Docs with fewer than n tokens report
    zeros. Pure map-side: one batch pass, no shuffle.
    """
    return docs_ds.map_batches(
        lambda b: _repetition_partial(b, n, text_col, id_col),
        batch_format="pyarrow",
    )


def decontaminate_ds(
    docs_ds,
    bench_grams: list[str],
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Flag corpus documents sharing any word n-gram with a benchmark set.

    Returns a Dataset of (id_col, n_shared) for CONTAMINATED documents
    only — n_shared = number of distinct benchmark grams the document
    contains. Pure map-side: the benchmark gram set is broadcast, the
    corpus streams through once, nothing shuffles.
    """
    return docs_ds.map_batches(
        _MarkContaminated(bench_grams, n, text_col, id_col),
        batch_format="pyarrow",
    )


def _ln_of_counts(x: np.ndarray) -> np.ndarray:
    """ln over an integer-count column via ``math.log`` per DISTINCT value
    (libm parity with DuckDB's ln — np.log can differ in the last ulp;
    counts are Zipf-distributed so distinct values ≪ rows)."""
    import math

    uniq, inv = np.unique(x, return_inverse=True)
    lns = np.array([math.log(int(v)) for v in uniq], dtype=np.float64)
    return lns[inv]


def pmi_scored_pairs_ds(
    ds,
    *,
    min_count: int = 5,
    text_col: str = "text",
    uni_rows=None,
    uni_ds=None,
    max_broadcast_rows: int = DEFAULT_VOCAB_BROADCAST_ROWS,
):
    """All adjacent word pairs with n ≥ min_count, PMI-scored — the shared
    scoring stage behind :func:`pmi_bigrams_ds` (top-k collocations) and
    the PMI-graph term clustering. Returns a Dataset of
    (w1, w2, n, pmi_micro); see pmi_bigrams_ds for the exact-replay
    micro-nat contract and the scale plan. Pass precomputed
    ``uni_rows`` (the :func:`unigram_counts_rows` result) or ``uni_ds``
    (the materialized :func:`unigram_counts_ds` Dataset) to avoid a
    second full-corpus tokenize pass when the caller already has one.

    Routing: vocabularies ≤ ``max_broadcast_rows`` broadcast the unigram
    table into two vectorized lookup joins (one object-store copy read
    by every task); beyond the cap the lookups run as partitioned hash
    joins on the term key (``joins.hash_join``) — both sides stay
    Datasets, nothing vocabulary-sized touches the driver. The two paths
    are value-identical (parity-tested with a forced tiny cap)."""
    import ray.data

    from lsearch_ray.functions.joins import (
        broadcast_join,
        hash_join,
        safe_partitions,
    )

    if uni_rows is not None:
        t_total = sum(int(r["sum(n)"]) for r in uni_rows)
        vocab_n = len(uni_rows)
    else:
        if uni_ds is None:
            uni_ds = unigram_counts_ds(ds, text_col).materialize()
        vocab_n = uni_ds.count()
        # Dataset.sum returns None on an empty dataset — guard before int().
        t_total = int(uni_ds.sum("sum(n)") or 0)
        if vocab_n <= max_broadcast_rows:
            uni_rows = uni_ds.take_all()

    _EMPTY_PMI = pa.table(
        {
            "w1": pa.array([], pa.large_string()),
            "w2": pa.array([], pa.large_string()),
            "n": pa.array([], pa.int64()),
            "pmi_micro": pa.array([], pa.int64()),
        }
    )
    if t_total == 0:
        return ray.data.from_arrow(_EMPTY_PMI)

    big_ds = (
        ds.map_batches(
            lambda b: _count_partial(b, 2, text_col), batch_format="pyarrow"
        )
        .groupby("gram")
        .sum("n")
        .materialize()
    )
    b_total = int(big_ds.sum("sum(n)") or 0)
    if b_total == 0:
        # Every surviving doc was a single token — no adjacent pairs.
        return ray.data.from_arrow(_EMPTY_PMI)

    import math

    const = 2 * math.log(t_total) - math.log(b_total)

    def split(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["sum(n)"], pa.scalar(min_count)))
        parts = pc.split_pattern(
            t["gram"].combine_chunks().cast(pa.large_string()), GRAM_SEP
        )
        return pa.table(
            {
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
                "n": t["sum(n)"].cast(pa.int64()),
            }
        )

    pairs = big_ds.map_batches(split, batch_format="pyarrow")
    if uni_rows is not None:
        uni_terms = pa.array(
            [r["term"] for r in uni_rows], type=pa.large_string()
        )
        uni_counts = pa.array(
            [int(r["sum(n)"]) for r in uni_rows], type=pa.int64()
        )
        lut1 = pa.table({"w1": uni_terms, "n1a": uni_counts})
        lut2 = pa.table({"w2": uni_terms, "n1b": uni_counts})
        joined = broadcast_join(
            broadcast_join(pairs, lut1, on="w1"), lut2, on="w2"
        )
    else:
        nparts = safe_partitions(64, vocab_n)
        r1 = uni_ds.map_batches(
            lambda t: pa.table(
                {
                    "w1": t["term"].cast(pa.large_string()),
                    "n1a": t["sum(n)"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        r2 = uni_ds.map_batches(
            lambda t: pa.table(
                {
                    "w2": t["term"].cast(pa.large_string()),
                    "n1b": t["sum(n)"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(
            hash_join(pairs, r1, on="w1", num_partitions=nparts),
            r2,
            on="w2",
            num_partitions=nparts,
        )

    def score(b: pa.Table) -> pa.Table:
        n2 = b["n"].to_numpy(zero_copy_only=False)
        pmi = (
            _ln_of_counts(n2)
            - _ln_of_counts(b["n1a"].to_numpy(zero_copy_only=False))
            - _ln_of_counts(b["n1b"].to_numpy(zero_copy_only=False))
            + const
        )
        return pa.table(
            {
                "w1": b["w1"],
                "w2": b["w2"],
                "n": pa.array(n2, type=pa.int64()),
                "pmi_micro": pa.array(
                    np.floor(pmi * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def pmi_bigrams_ds(
    ds,
    *,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    max_broadcast_rows: int = DEFAULT_VOCAB_BROADCAST_ROWS,
):
    """Top-k collocations: adjacent word pairs ranked by pointwise mutual
    information, ``pmi = ln(p(w1 w2) / (p(w1) p(w2)))`` with p from corpus
    bigram / unigram counts.

    Returns an Arrow table (w1, w2, n, pmi_micro) ordered by
    (pmi_micro desc, w1, w2), n ≥ min_count. pmi is computed as
    ``ln n2 − ln n1a − ln n1b + (2 ln T − ln B)`` — each term an ln of an
    integer count — and rounded half-up to integer micro-nats, so the SQL
    oracle replays the identical IEEE operation sequence bit-exactly.

    Scale plan: unigram and bigram counts are both per-batch
    ``value_counts`` partials into one groupby-sum each (the exchange
    carries one row per distinct gram per batch, never per occurrence);
    the vocab-sized unigram table is broadcast into two vectorized
    lookup joins (hash-join on term is the alternative for vocabularies
    too big to broadcast — see ``functions.joins.hash_join``); per-block
    top-k prunes before the tiny global sort.
    """
    scored = pmi_scored_pairs_ds(
        ds,
        min_count=min_count,
        text_col=text_col,
        max_broadcast_rows=max_broadcast_rows,
    )

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("pmi_micro", "descending"),
                ("w1", "ascending"),
                ("w2", "ascending"),
            ],
        )
        return t.take(idx.slice(0, k))

    top = (
        scored.map_batches(block_topk, batch_format="pyarrow")
        .sort(["pmi_micro", "w1", "w2"], descending=[True, False, False])
        .limit(k)
        .take_all()
    )
    return pa.table(
        {
            "w1": pa.array([r["w1"] for r in top], type=pa.large_string()),
            "w2": pa.array([r["w2"] for r in top], type=pa.large_string()),
            "n": pa.array([int(r["n"]) for r in top], type=pa.int64()),
            "pmi_micro": pa.array(
                [int(r["pmi_micro"]) for r in top], type=pa.int64()
            ),
        }
    )


def skipgram_pairs(
    texts: pa.ChunkedArray | pa.Array, window: int
) -> pa.Array:
    """Ordered within-row token pairs (i, i+d) for 1 ≤ d ≤ ``window``,
    rendered as ``w1 GRAM_SEP w2`` — the word2vec-style co-occurrence
    universe. Vectorized exactly like :func:`doc_ngrams`: one zero-copy
    slice pair + boundary mask per offset d."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    parents, flat = flat_tokens_arrow(texts)
    chunks = []
    for d in range(1, window + 1):
        m = len(flat) - d
        if m <= 0:
            break
        valid = parents[:m] == parents[d:]
        if not valid.any():
            continue
        mask = pa.array(valid)
        chunks.append(
            pc.binary_join_element_wise(
                flat.slice(0, m).filter(mask),
                flat.slice(d, m).filter(mask),
                pa.scalar(GRAM_SEP, type=pa.large_string()),
            )
        )
    if not chunks:
        return pa.array([], type=pa.large_string())
    return pa.concat_arrays([c.cast(pa.large_string()) for c in chunks])


def skipgram_counts_ds(
    ds, *, window: int = 2, k: int = 20, text_col: str = "text"
) -> pa.Table:
    """Top-k skip-gram co-occurrence counts of a corpus: ordered token
    pairs within ``window`` positions, ranked by (count desc, w1, w2).

    Same scale plan as :func:`ngram_counts_ds`: per-batch ``value_counts``
    partials (the shuffle carries one row per distinct pair per batch,
    never per occurrence — pair volume is ``window × tokens``), one
    groupby-sum, lossless per-block top-k prune, tiny global sort.
    Returns an Arrow table (w1, w2, n).
    """

    from lsearch_ray.functions.dedup import value_counts_table

    def partial(batch: pa.Table) -> pa.Table:
        return value_counts_table(
            skipgram_pairs(batch[text_col], window), "gram", "n"
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("gram").sum("n")
    pruned = agg.map_batches(
        lambda t: _block_topk(pa.table({"gram": t["gram"], "n": t["sum(n)"]}), k),
        batch_format="pyarrow",
    )
    top = pruned.sort(["n", "gram"], descending=[True, False]).limit(k).take_all()
    w1, w2 = [], []
    for r in top:
        a, b = r["gram"].split(GRAM_SEP, 1)
        w1.append(a)
        w2.append(b)
    return pa.table(
        {
            "w1": pa.array(w1, type=pa.large_string()),
            "w2": pa.array(w2, type=pa.large_string()),
            "n": pa.array([int(r["n"]) for r in top], type=pa.int64()),
        }
    )


def bigram_lm_ds(
    ds,
    *,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    max_broadcast_rows: int = DEFAULT_VOCAB_BROADCAST_ROWS,
):
    """Top-k bigram conditional probabilities — the add-nothing MLE
    bigram language model ``P(w2|w1) = count(w1 w2) / count(w1)`` in
    floor-micro units (pure integers, so any engine replays it exactly):

        p_micro = (n2 * 10^6) // n1a

    Returns an Arrow table ``(w1, w2, n, p_micro)`` with ``n ≥
    min_count``, ordered by (n DESC, w1, w2) LIMIT k — the count
    ordering keeps the result stable under probability ties.

    Same scale plan as :func:`pmi_bigrams_ds` (combiner-first unigram +
    bigram counts, vocab-table broadcast into a vectorized lookup, a
    partitioned hash join on w1 past ``max_broadcast_rows``); only the
    scoring kernel differs, and it needs just the w1 unigram count.
    """
    from lsearch_ray.functions.joins import (
        broadcast_join,
        hash_join,
        safe_partitions,
    )

    uni_ds = unigram_counts_ds(ds, text_col).materialize()
    vocab_n = uni_ds.count()

    big_ds = (
        ds.map_batches(
            lambda b: _count_partial(b, 2, text_col), batch_format="pyarrow"
        )
        .groupby("gram")
        .sum("n")
    )

    def split(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["sum(n)"], pa.scalar(min_count)))
        parts = pc.split_pattern(
            t["gram"].combine_chunks().cast(pa.large_string()), GRAM_SEP
        )
        return pa.table(
            {
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
                "n": t["sum(n)"].cast(pa.int64()),
            }
        )

    pairs = big_ds.map_batches(split, batch_format="pyarrow")
    if vocab_n <= max_broadcast_rows:
        uni_rows = uni_ds.take_all()
        uni_terms = pa.array(
            [r["term"] for r in uni_rows], type=pa.large_string()
        )
        uni_counts = pa.array(
            [int(r["sum(n)"]) for r in uni_rows], type=pa.int64()
        )
        joined = broadcast_join(
            pairs, pa.table({"w1": uni_terms, "n1a": uni_counts}), on="w1"
        )
    else:
        joined = hash_join(
            pairs,
            uni_ds.map_batches(
                lambda t: pa.table(
                    {
                        "w1": t["term"].cast(pa.large_string()),
                        "n1a": t["sum(n)"].cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            on="w1",
            num_partitions=safe_partitions(64, vocab_n),
        )

    def score(b: pa.Table) -> pa.Table:
        n2 = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        n1 = b["n1a"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "w1": b["w1"],
                "w2": b["w2"],
                "n": pa.array(n2),
                "p_micro": pa.array((n2 * 10**6) // n1),
            }
        )

    out = (
        joined.map_batches(score, batch_format="pyarrow")
        .map_batches(
            lambda t: _block_topk(
                t,
                k,
                [("n", "descending"), ("w1", "ascending"), ("w2", "ascending")],
            ),
            batch_format="pyarrow",
        )
        .sort(["n", "w1", "w2"], descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            "w1": pa.array(out["w1"], pa.large_string()),
            "w2": pa.array(out["w2"], pa.large_string()),
            "n": pa.array(out["n"], pa.int64()),
            "p_micro": pa.array(out["p_micro"], pa.int64()),
        }
    )


def term_clusters_ds(
    ds,
    *,
    min_count: int = 5,
    min_pmi_micro: int = 0,
    text_col: str = "text",
    max_rounds: int = 50,
    num_partitions: int | None = None,
    max_broadcast_rows: int = DEFAULT_VOCAB_BROADCAST_ROWS,
):
    """Term-association clusters: the PMI-filtered bigram graph (edges =
    adjacent pairs with n ≥ min_count and pmi_micro ≥ min_pmi_micro,
    self-loops dropped) run through distributed connected components —
    the classic collocation-clustering composition (PMI scoring →
    association graph → min-label propagation).

    Returns a Dataset of (term, comp_term) for every vocabulary term —
    comp_term = the lexicographically smallest term reachable in the
    association graph (edge-free terms label themselves) — sorted by
    term.

    Routing: under ``max_broadcast_rows`` the sorted vocabulary is
    broadcast as an ordinal map, terms travel as ordinals through the
    integer components kernel, and the min-ordinal label IS the min-lex
    term. Beyond the cap nothing vocabulary-sized touches the driver:
    node ids are the uniform 63-bit term hash (computed map-side on both
    nodes and edges), components runs on the hashed graph, and the
    min-LEX label is recovered with one ``groupby(component).min(term)``
    plus a hash join back — value-identical to the ordinal path absent a
    63-bit hash collision (p ≈ V²/2⁶⁴; parity-tested with a forced tiny
    cap)."""
    import ray.data as rd

    from lsearch_ray.functions.components import component_labels_ds
    from lsearch_ray.functions.joins import hash_join, safe_partitions

    uni_ds = unigram_counts_ds(ds, text_col).materialize()
    vocab_n = uni_ds.count()

    if vocab_n <= max_broadcast_rows:
        uni_rows = uni_ds.take_all()
        vocab = sorted(r["term"] for r in uni_rows)
        ord_of = {t: i for i, t in enumerate(vocab)}
        vocab_arr = np.array(vocab, dtype=object)

        # the vocab rows double as the PMI stage's unigram counts — ONE
        # full-corpus tokenize pass, not two
        scored = pmi_scored_pairs_ds(
            ds, min_count=min_count, text_col=text_col, uni_rows=uni_rows
        )

        def to_edges(t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.and_(
                    pc.greater_equal(t["pmi_micro"], pa.scalar(min_pmi_micro)),
                    pc.not_equal(t["w1"], t["w2"]),
                )
            )
            a = np.array(
                [ord_of[w] for w in t["w1"].to_pylist()], dtype=np.int64
            )
            b = np.array(
                [ord_of[w] for w in t["w2"].to_pylist()], dtype=np.int64
            )
            return pa.table({"a": pa.array(a), "b": pa.array(b)})

        edges = scored.map_batches(to_edges, batch_format="pyarrow")
        nodes = rd.from_arrow(
            pa.table({"tid": pa.array(np.arange(len(vocab), dtype=np.int64))})
        )
        labels = component_labels_ds(
            nodes, edges, "tid", max_rounds=max_rounds,
            num_partitions=num_partitions,
            sort=False,  # terminal .sort("term") below orders the output
        )

        def back(t: pa.Table) -> pa.Table:
            tid = t["tid"].to_numpy(zero_copy_only=False)
            comp = t["component"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "term": pa.array(
                        vocab_arr[tid].tolist(), pa.large_string()
                    ),
                    "comp_term": pa.array(
                        vocab_arr[comp].tolist(), pa.large_string()
                    ),
                }
            )

        return labels.map_batches(back, batch_format="pyarrow").sort("term")

    # --- over-budget route: hashed node ids, min-lex label recovery ---
    from lsearch_ray.functions.sampling import _key_hash63

    scored = pmi_scored_pairs_ds(
        ds,
        min_count=min_count,
        text_col=text_col,
        uni_ds=uni_ds,
        max_broadcast_rows=max_broadcast_rows,
    )

    def to_edges_hashed(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["pmi_micro"], pa.scalar(min_pmi_micro)),
                pc.not_equal(t["w1"], t["w2"]),
            )
        )
        return pa.table(
            {
                "a": pa.array(_key_hash63(t["w1"])),
                "b": pa.array(_key_hash63(t["w2"])),
            }
        )

    edges = scored.map_batches(to_edges_hashed, batch_format="pyarrow")
    term_tid = uni_ds.map_batches(
        lambda t: pa.table(
            {
                "tid": pa.array(_key_hash63(t["term"])),
                "term": t["term"].cast(pa.large_string()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    labels = component_labels_ds(
        term_tid.select_columns(["tid"]),
        edges,
        "tid",
        max_rounds=max_rounds,
        num_partitions=num_partitions,
        sort=False,  # the hash join below re-shuffles by tid hash
    )
    nparts = safe_partitions(64, vocab_n)
    lab_terms = hash_join(
        labels, term_tid, on="tid", num_partitions=nparts
    )
    comp_min = (
        lab_terms.groupby("component")
        .min("term")
        .map_batches(
            lambda t: pa.table(
                {
                    "component": t["component"],
                    "comp_term": t["min(term)"].cast(pa.large_string()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    out = hash_join(
        lab_terms.select_columns(["term", "component"]),
        comp_min,
        on="component",
        num_partitions=nparts,
    )
    return out.select_columns(["term", "comp_term"]).sort("term")


def _doc_gram_counts(
    batch: pa.Table, n: int, text_col: str, id_col: str
) -> pa.Table:
    """Per-document n-gram counts for one batch of DOCUMENTS: a table of
    (id_col, gram, c). A document never spans batches (one row per doc),
    so per-batch counts are per-doc-complete — the shared combiner behind
    :func:`bigram_nll_ds` and :func:`ngram_novelty_ds`."""
    parents, grams = doc_ngrams(batch[text_col], n)
    if len(grams) == 0:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "gram": pa.array([], type=pa.large_string()),
                "c": pa.array([], type=pa.int64()),
            }
        )
    enc = grams.dictionary_encode()
    codes = np.asarray(enc.indices).astype(np.int64)
    pairs, counts = np.unique(
        np.stack([parents, codes], axis=1), axis=0, return_counts=True
    )
    ids = batch[id_col].to_numpy(zero_copy_only=False)[pairs[:, 0]]
    return pa.table(
        {
            id_col: pa.array(ids.astype(np.int64)),
            "gram": enc.dictionary.take(pa.array(pairs[:, 1])).cast(
                pa.large_string()
            ),
            "c": pa.array(counts.astype(np.int64)),
        }
    )


def bigram_nll_ds(
    docs_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    broadcast_costs: bool = True,
):
    """Per-document negative log-likelihood under the corpus MLE bigram
    LM — the order-2 counterpart of ``unigram_nll`` (documents whose
    word TRANSITIONS are improbable under the corpus score high; the
    perplexity-style fluency signal of a training-data pipeline).

    Returns a Dataset of (id_col, n_bigrams, nll_micro) over documents
    with at least one bigram:

        cost(w1 w2) = floor(-ln(n2 / n1) * 1e6 + 0.5)    [micro-nats]
        nll_micro   = Σ_bigrams c_doc · cost

    where ``n2`` = corpus count of the bigram and ``n1 = Σ_w n(w1 w)``
    is the left-context total (so Σ_w P(w|w1) = 1 exactly). Every
    per-bigram cost is rounded to an INTEGER before the weighted sum —
    pure integer totals, bit-exact across engines regardless of
    summation order.

    Scale plan mirrors ``unigram_nll``: ONE per-doc bigram-count pass
    (materialized, consumed by the corpus aggregate and the scoring
    join); ``broadcast_costs=True`` collects the (gram, cost) table —
    vocabulary-pair-sized — and ships it once per task, else everything
    stays distributed: n2 by one gram shuffle, n1 by a w1 shuffle over
    the (already tiny) n2 rows, costs attached by partitioned hash
    joins. ln via ``math.log`` per DISTINCT (n2, n1) pair (libm parity
    with DuckDB's ln).
    """
    import math

    from ray.data.aggregate import Sum

    per = docs_ds.map_batches(
        lambda b: _doc_gram_counts(b, 2, text_col, id_col),
        batch_format="pyarrow",
    ).materialize()
    n2_ds = per.select_columns(["gram", "c"]).groupby("gram").sum("c")

    def cost_rows(grams: pa.Array, n2: np.ndarray, n1: np.ndarray) -> pa.Table:
        pairs = np.stack([n2, n1], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        c = np.array(
            [
                math.floor(-math.log(int(a) / int(b)) * 1e6 + 0.5)
                for a, b in uniq
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "gram": grams.cast(pa.large_string()),
                "__cost": pa.array(c[inv], type=pa.int64()),
            }
        )

    from lsearch_ray.functions.joins import (
        broadcast_join,
        hash_join,
        safe_partitions,
    )

    if broadcast_costs:
        tab = pa.Table.from_pylist(
            n2_ds.take_all(),
            schema=pa.schema(
                [("gram", pa.large_string()), ("sum(c)", pa.int64())]
            ),
        )
        grams = tab["gram"].combine_chunks()
        n2 = tab["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
        w1 = pc.list_element(pc.split_pattern(grams, GRAM_SEP), 0)
        agg = (
            pa.table({"w1": w1, "n": pa.array(n2)})
            .group_by("w1")
            .aggregate([("n", "sum")])
        )
        lut = dict(
            zip(
                agg["w1"].to_pylist(),
                agg["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64),
            )
        )
        n1 = np.array([lut[w] for w in w1.to_pylist()], dtype=np.int64)
        joined = broadcast_join(per, cost_rows(grams, n2, n1), on="gram")
    else:
        n2_ds = n2_ds.materialize()
        # both cost joins are n2-table-sized on their smaller side
        num_partitions = safe_partitions(num_partitions, n2_ds.count())

        def to_w1(b: pa.Table) -> pa.Table:
            g = b["gram"].combine_chunks().cast(pa.large_string())
            return pa.table(
                {
                    "w1": pc.list_element(pc.split_pattern(g, GRAM_SEP), 0),
                    "gram": g,
                    "n2": b["sum(c)"].cast(pa.int64()),
                }
            )

        with_w1 = n2_ds.map_batches(to_w1, batch_format="pyarrow")
        n1_ds = (
            with_w1.select_columns(["w1", "n2"]).groupby("w1").sum("n2")
        ).map_batches(
            lambda b: pa.table(
                {
                    # groupby output downgrades to string — the join key
                    # must match with_w1's large_string exactly
                    "w1": b["w1"].cast(pa.large_string()),
                    "n1": b["sum(n2)"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        costs_ds = hash_join(
            with_w1, n1_ds, on="w1", num_partitions=num_partitions
        ).map_batches(
            lambda b: cost_rows(
                b["gram"].combine_chunks(),
                b["n2"].to_numpy(zero_copy_only=False).astype(np.int64),
                b["n1"].to_numpy(zero_copy_only=False).astype(np.int64),
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(
            per, costs_ds, on="gram", num_partitions=num_partitions
        )

    def partial(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        contrib = c * b["__cost"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                id_col: b[id_col],
                "c": pa.array(c),
                "contrib": pa.array(contrib),
            }
        )
        return t.group_by(id_col).aggregate([("c", "sum"), ("contrib", "sum")])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Sum("c_sum", alias_name="n_bigrams"),
            Sum("contrib_sum", alias_name="nll_micro"),
        )
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "n_bigrams": b["n_bigrams"].cast(pa.int64()),
                "nll_micro": b["nll_micro"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def ngram_novelty_ds(
    docs_ds,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
):
    """Per-document n-gram novelty: the share of a document's DISTINCT
    word n-grams that appear in NO other document — the inter-document
    diversity signal complementing ``doc_repetition`` (intra-document
    repetition). Boilerplate-heavy near-duplicates score near 0; unique
    prose scores near 1e6.

    Returns a Dataset of (id_col, distinct_grams, novel_grams,
    novelty_micro) over documents with at least one n-gram, where
    ``novelty_micro = novel_grams * 1e6 // distinct_grams`` (floor
    fixed-point over non-negative integers — exact in any engine).

    Scale plan: one per-doc distinct-gram pass (each (doc, gram) row
    emitted once); gram document-frequency is ONE gram-keyed shuffle
    over those rows; the df=1 flag joins back by the SAME key (the join
    reuses the gram partitioning); per-doc totals are per-batch partial
    sums into a final id shuffle. Nothing is ever collected driver-side.
    """
    from ray.data.aggregate import Sum

    from lsearch_ray.functions.joins import hash_join, safe_partitions

    per = (
        docs_ds.map_batches(
            lambda b: _doc_gram_counts(b, n, text_col, id_col),
            batch_format="pyarrow",
        )
        .select_columns([id_col, "gram"])
        .materialize()
    )
    df_ds = (
        per.select_columns(["gram"])
        .groupby("gram")
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    # groupby output downgrades to string — the join key
                    # must match per's large_string exactly
                    "gram": b["gram"].cast(pa.large_string()),
                    "df": b["count()"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    ).materialize()
    # the df table is the join's smaller side — partitions must be sized
    # to IT (and to the live cpu count) or tiny inputs produce empty
    # partitions / small sessions deadlock the shuffle aggregators
    num_partitions = safe_partitions(num_partitions, df_ds.count())
    joined = hash_join(per, df_ds, on="gram", num_partitions=num_partitions)

    def partial(b: pa.Table) -> pa.Table:
        novel = pc.equal(b["df"], pa.scalar(1)).cast(pa.int64())
        t = pa.table(
            {
                id_col: b[id_col],
                "d": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "nov": novel,
            }
        )
        return t.group_by(id_col).aggregate([("d", "sum"), ("nov", "sum")])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Sum("d_sum", alias_name="distinct_grams"),
            Sum("nov_sum", alias_name="novel_grams"),
        )
    )

    def final(b: pa.Table) -> pa.Table:
        d = b["distinct_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        nv = b["novel_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: b[id_col],
                "distinct_grams": pa.array(d),
                "novel_grams": pa.array(nv),
                "novelty_micro": pa.array(nv * 10**6 // d),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


def oov_rate_by_slice_ds(
    ds,
    *,
    k: int = 100,
    slice_col: str = "lang",
    text_col: str = "text",
):
    """Out-of-vocabulary token mass per slice: with the vocabulary fixed
    to the corpus's top-``k`` terms by frequency (ties broken by term
    ascending — deterministic), what integer-exact share of each slice's
    tokens falls OUTSIDE it? The tokenizer-budget / slice-coverage
    diagnostic: a vocabulary sized on the dominant slice starves thin
    ones, and this surfaces exactly which.

    Returns (slice_col, total_tokens, oov_tokens, oov_micro) sorted by
    slice, where ``oov_micro = oov_tokens * 1e6 // total_tokens`` (floor
    fixed-point over non-negative integers — exact in any engine; 0 for
    a token-less slice).

    Scale shape: the shared combiner unigram count (one groupby-sum over
    distinct terms), per-block top-k pruning before a k-row global sort,
    the k-term vocabulary broadcast (bounded by k, never by the corpus),
    then ONE map-side membership pass emitting per-(batch, slice)
    partial sums into a |slices|-row groupby — nothing vocabulary- or
    corpus-sized touches the driver."""
    from ray.data.aggregate import Sum

    from lsearch_ray.analyzer import flat_tokens_arrow

    top = (
        unigram_counts_ds(ds, text_col)
        .map_batches(
            lambda t: _block_topk(
                t, k, [("sum(n)", "descending"), ("term", "ascending")]
            ),
            batch_format="pyarrow",
        )
        .sort(["sum(n)", "term"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    vocab = pa.array(
        sorted(r["term"] for r in top), type=pa.large_string()
    )

    def partial(b: pa.Table) -> pa.Table:
        parents, flat = flat_tokens_arrow(b[text_col])
        sl = b[slice_col]
        if isinstance(sl, pa.ChunkedArray):
            sl = sl.combine_chunks()
        if len(flat) == 0:
            # emit a zero row per distinct slice in the batch so
            # token-less slices still appear in the output
            uniq = pc.unique(sl)
            z = np.zeros(len(uniq), dtype=np.int64)
            return pa.table(
                {slice_col: uniq, "tot": pa.array(z), "oov": pa.array(z)}
            )
        oov = pc.invert(pc.is_in(flat, value_set=vocab))
        t = pa.table(
            {
                slice_col: sl.take(pa.array(parents)),
                "o": oov.cast(pa.int64()),
            }
        )
        agg = t.group_by([slice_col]).aggregate(
            [("o", "sum"), ("o", "count")]
        )
        out = pa.table(
            {
                slice_col: agg[slice_col],
                "tot": agg["o_count"].cast(pa.int64()),
                "oov": agg["o_sum"].cast(pa.int64()),
            }
        )
        # zero rows for the batch's slices whose docs all tokenized to
        # nothing, so they still appear in the final output
        uniq = pc.unique(sl)
        missing = uniq.filter(
            pc.invert(pc.is_in(uniq, value_set=agg[slice_col]))
        )
        if len(missing):
            z = np.zeros(len(missing), dtype=np.int64)
            out = pa.concat_tables(
                [
                    out,
                    pa.table(
                        {
                            slice_col: missing,
                            "tot": pa.array(z),
                            "oov": pa.array(z),
                        }
                    ),
                ]
            )
        return out

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(slice_col)
        .aggregate(
            Sum("tot", alias_name="total_tokens"),
            Sum("oov", alias_name="oov_tokens"),
        )
    )

    def final(t: pa.Table) -> pa.Table:
        tot = t["total_tokens"].to_numpy(zero_copy_only=False).astype(object)
        ov = t["oov_tokens"].to_numpy(zero_copy_only=False).astype(object)
        micro = [
            int(o) * 10**6 // int(n) if int(n) > 0 else 0
            for o, n in zip(ov, tot)
        ]
        return pa.table(
            {
                slice_col: t[slice_col],
                "total_tokens": t["total_tokens"].cast(pa.int64()),
                "oov_tokens": t["oov_tokens"].cast(pa.int64()),
                "oov_micro": pa.array(micro, pa.int64()),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow").sort(slice_col)


def vocab_growth_ds(ds, *, n_buckets: int = 8, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Heaps'-law vocabulary growth curve: distinct-term count of the
    corpus prefix ``doc_id < thr_i`` for an equal-width ladder of
    ``n_buckets`` thresholds over the id range — the tokenizer-budget /
    crawl-saturation diagnostic ("how fast is new vocabulary still
    arriving?").

    Plan shape: per-batch (term → min doc_id) partials (one arrow
    group_by per batch), ONE term-keyed groupby-min shuffle, then each
    term folds into the bincount bucket of its FIRST appearance
    (searchsorted against the broadcast ladder) so the driver only ever
    holds ``n_buckets`` partial rows — the vocabulary itself never
    leaves the cluster. Cumulative sum over the tiny bucket table gives
    the curve. Generalizes the reference's corpus-scan counting
    (`search.rs:274-276`) into a prefix-distinct analytic.

    Returns (bucket:int64 1-based, doc_id_lt:int64, vocab_size:int64),
    sorted by bucket.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    from lsearch_ray.analyzer import flat_tokens_arrow

    bounds = ds.aggregate(
        Min(id_col, alias_name="lo"), Max(id_col, alias_name="hi")
    )
    if not bounds or bounds.get("lo") is None:  # empty corpus
        return rd.from_arrow(
            pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "doc_id_lt": pa.array([], pa.int64()),
                    "vocab_size": pa.array([], pa.int64()),
                }
            )
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = hi - lo + 1
    thrs = np.array(
        [lo + (span * i + n_buckets - 1) // n_buckets
         for i in range(1, n_buckets + 1)],
        dtype=np.int64,
    )

    def first_seen_partial(batch: pa.Table) -> pa.Table:
        parents, flat = flat_tokens_arrow(batch[text_col])
        if len(flat) == 0:
            return pa.table(
                {
                    "term": pa.array([], type=pa.large_string()),
                    "md": pa.array([], type=pa.int64()),
                }
            )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"term": flat, "md": pa.array(ids[parents])})
        g = t.group_by(["term"]).aggregate([("md", "min")])
        return pa.table({"term": g["term"], "md": g["md_min"]})

    firsts = (
        ds.map_batches(first_seen_partial, batch_format="pyarrow")
        .groupby("term")
        .min("md")
    )

    def bucket_partial(t: pa.Table) -> pa.Table:
        md = t["min(md)"].to_numpy(zero_copy_only=False).astype(np.int64)
        # first bucket whose threshold exceeds md (md <= hi < thrs[-1],
        # so every term lands inside the ladder)
        b = np.searchsorted(thrs, md, side="right")
        cnt = np.bincount(b, minlength=n_buckets).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    np.arange(1, n_buckets + 1, dtype=np.int64)
                ),
                "n_new": pa.array(cnt),
            }
        )

    rows = (
        firsts.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_new", alias_name="n_new"))
        .take_all()
    )  # <= n_buckets rows: the only driver-side state
    new_by_bucket = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        new_by_bucket[int(r["bucket"]) - 1] = int(r["n_new"])
    out = pa.table(
        {
            "bucket": pa.array(np.arange(1, n_buckets + 1, dtype=np.int64)),
            "doc_id_lt": pa.array(thrs),
            "vocab_size": pa.array(np.cumsum(new_by_bucket).astype(np.int64)),
        }
    )
    return rd.from_arrow(out)


def kn_bigram_lm_ds(
    ds,
    *,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
):
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney '95 /
    Chen & Goodman '98, absolute discount d = 3/4) — the smoothing
    upgrade over the MLE :func:`bigram_lm_ds`, in exact floor-micro
    units. With c1 = Σ_w c(w1,w), N1+(w1·) = distinct continuations of
    w1, N1+(·w2) = distinct left contexts of w2 and Nt = distinct
    bigram types:

        P_kn(w2|w1) = max(c12 − 3/4, 0)/c1
                      + (3/4 · N1+(w1·)/c1) · N1+(·w2)/Nt
        pkn_micro   = (10⁶·(max(4·c12−3, 0)·Nt + 3·N1+(w1·)·N1+(·w2)))
                      // (4·c1·Nt)

    Returns (w1, w2, n, pkn_micro) for the top-k bigrams with
    n ≥ min_count, ordered (n DESC, w1, w2).

    Scale shape: ONE combiner bigram-count shuffle builds the type
    table; the two continuation aggregates are groupbys OVER THE TYPE
    TABLE (already one row per bigram — never re-shuffling tokens);
    selection is the lossless per-block top-k prune; only the k
    selected rows are scored, with Python-int products (the widest term
    10⁶·4·c12·Nt overflows int64 at web scale). Stats for the k rows
    come back through map-side ``is_in`` filters — nothing
    vocabulary-sized reaches the driver.
    """
    from ray.data.aggregate import Count, Sum

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            b["gram"].combine_chunks().cast(pa.large_string()), GRAM_SEP
        )
        return pa.table(
            {
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
                "n": b["sum(n)"].cast(pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(
            lambda b: _count_partial(b, 2, text_col), batch_format="pyarrow"
        )
        .groupby("gram")
        .sum("n")
        .map_batches(split, batch_format="pyarrow")
        .materialize()
    )
    nt = pairs.count()
    empty = pa.table(
        {
            "w1": pa.array([], pa.large_string()),
            "w2": pa.array([], pa.large_string()),
            "n": pa.array([], pa.int64()),
            "pkn_micro": pa.array([], pa.int64()),
        }
    )
    if nt == 0:
        return empty

    sel = (
        pairs.map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["n"], pa.scalar(min_count))
            ),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda t: _block_topk(
                t,
                k,
                [("n", "descending"), ("w1", "ascending"), ("w2", "ascending")],
            ),
            batch_format="pyarrow",
        )
        .sort(["n", "w1", "w2"], descending=[True, False, False])
        .limit(k)
        .take_all()
    )
    if not sel:
        return empty
    w1_set = pa.array(sorted({r["w1"] for r in sel}), pa.large_string())
    w2_set = pa.array(sorted({r["w2"] for r in sel}), pa.large_string())

    left = {
        r["w1"]: (int(r["c1"]), int(r["n1p"]))
        for r in pairs.map_batches(
            lambda b: b.filter(pc.is_in(b["w1"], value_set=w1_set)),
            batch_format="pyarrow",
        )
        .groupby("w1")
        .aggregate(Sum("n", alias_name="c1"), Count(alias_name="n1p"))
        .take_all()
    }
    right = {
        r["w2"]: int(r["n1m"])
        for r in pairs.map_batches(
            lambda b: b.filter(pc.is_in(b["w2"], value_set=w2_set)),
            batch_format="pyarrow",
        )
        .groupby("w2")
        .aggregate(Count(alias_name="n1m"))
        .take_all()
    }

    w1s, w2s, ns, ps = [], [], [], []
    for r in sel:
        c12, (c1, n1p), n1m = int(r["n"]), left[r["w1"]], right[r["w2"]]
        numer = 10**6 * (max(4 * c12 - 3, 0) * nt + 3 * n1p * n1m)
        ps.append(numer // (4 * c1 * nt))
        w1s.append(r["w1"])
        w2s.append(r["w2"])
        ns.append(c12)
    return pa.table(
        {
            "w1": pa.array(w1s, pa.large_string()),
            "w2": pa.array(w2s, pa.large_string()),
            "n": pa.array(ns, pa.int64()),
            "pkn_micro": pa.array(ps, pa.int64()),
        }
    )


def grouped_vocab_growth_ds(
    ds,
    *,
    group_col: str = "lang",
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-slice Heaps'-law vocabulary growth: :func:`vocab_growth_ds`
    with an independent curve per ``group_col`` value over the SAME
    global doc_id ladder (comparable x-axes — the question is "which
    language's vocabulary is still growing?"). Every (group, bucket)
    cell is emitted, zero-vocab cells included.

    Same scale shape: one (group, term)-keyed groupby-min shuffle (the
    composite key travels as one concatenated column), per-batch bucket
    bincounts, and a |groups|·n_buckets-row driver finish — the
    vocabulary never leaves the cluster.

    Returns (group_col, bucket, doc_id_lt, vocab_size) sorted by
    (group, bucket).
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    from lsearch_ray.analyzer import flat_tokens_arrow

    SEP = "\x01"
    bounds = ds.aggregate(
        Min(id_col, alias_name="lo"), Max(id_col, alias_name="hi")
    )
    empty = pa.table(
        {
            group_col: pa.array([], pa.large_string()),
            "bucket": pa.array([], pa.int64()),
            "doc_id_lt": pa.array([], pa.int64()),
            "vocab_size": pa.array([], pa.int64()),
        }
    )
    if not bounds or bounds.get("lo") is None:
        return rd.from_arrow(empty)
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = hi - lo + 1
    thrs = np.array(
        [lo + (span * i + n_buckets - 1) // n_buckets
         for i in range(1, n_buckets + 1)],
        dtype=np.int64,
    )
    groups = sorted(
        str(r[group_col])
        for r in ds.groupby(group_col).count().take_all()
    )

    def first_seen_partial(batch: pa.Table) -> pa.Table:
        parents, flat = flat_tokens_arrow(batch[text_col])
        if len(flat) == 0:
            return pa.table(
                {
                    "gt": pa.array([], pa.large_string()),
                    "md": pa.array([], pa.int64()),
                }
            )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = batch[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        grp = grp.cast(pa.large_string())
        gt = pc.binary_join_element_wise(
            grp.take(pa.array(parents)),
            flat.cast(pa.large_string()),
            pa.scalar(SEP, type=pa.large_string()),
        )
        t = pa.table({"gt": gt, "md": pa.array(ids[parents])})
        g = t.group_by(["gt"]).aggregate([("md", "min")])
        return pa.table({"gt": g["gt"], "md": g["md_min"]})

    firsts = (
        ds.map_batches(first_seen_partial, batch_format="pyarrow")
        .groupby("gt")
        .min("md")
    )

    def bucket_partial(t: pa.Table) -> pa.Table:
        gt = t["gt"].combine_chunks().cast(pa.large_string())
        parts = pc.split_pattern(gt, SEP)
        grp = pc.list_element(parts, 0)
        md = t["min(md)"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.searchsorted(thrs, md, side="right") + 1
        out = pa.table(
            {
                "g": grp,
                "b": pa.array(b.astype(np.int64)),
                "one": pa.array(np.ones(len(md), dtype=np.int64)),
            }
        )
        agg = out.group_by(["g", "b"]).aggregate([("one", "sum")])
        return pa.table(
            {
                "gb": pc.binary_join_element_wise(
                    agg["g"].combine_chunks().cast(pa.large_string()),
                    pc.cast(agg["b"], pa.string()).combine_chunks().cast(
                        pa.large_string()
                    ),
                    pa.scalar(SEP, type=pa.large_string()),
                ),
                "n_new": agg["one_sum"].cast(pa.int64()),
            }
        )

    rows = (
        firsts.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("gb")
        .aggregate(Sum("n_new", alias_name="n_new"))
        .take_all()
    )  # <= |groups| * n_buckets rows
    new = {}
    for r in rows:
        g, b = r["gb"].rsplit(SEP, 1)
        new[(g, int(b))] = int(r["n_new"])
    out_g, out_b, out_t, out_v = [], [], [], []
    for g in groups:
        acc = 0
        for i in range(1, n_buckets + 1):
            acc += new.get((g, i), 0)
            out_g.append(g)
            out_b.append(i)
            out_t.append(int(thrs[i - 1]))
            out_v.append(acc)
    return rd.from_arrow(
        pa.table(
            {
                group_col: pa.array(out_g, pa.large_string()),
                "bucket": pa.array(out_b, pa.int64()),
                "doc_id_lt": pa.array(out_t, pa.int64()),
                "vocab_size": pa.array(out_v, pa.int64()),
            }
        )
    )
