"""Edit-distance-1 string matching via symmetric deletion banding.

The SymSpell identity: two strings are within Levenshtein distance 1
iff their deletion-1 neighborhoods (the string itself plus every
single-character deletion) intersect — so bucketing rows by
neighborhood member is EXACT candidate generation (no recall loss),
and the bucket shuffle replaces the all-pairs comparison a naive
fuzzy match would need. The fuzzy-string companion to the MinHash
banding the near-dup family uses (entity resolution, catalog/name
cleanup).

Plan shape (the shared dedup-family skeleton):
1. map-side: each row emits its deletion neighborhood — vectorized per
   DELETION POSITION (one slice+join kernel per position, never a loop
   over rows; strings are short so positions ≪ rows).
2. ONE bucket shuffle (``cluster.bucket_pairs_ds``) emits candidate
   pairs; multi-bucket duplicates collapse through the shared
   hash-partitioned dedup.
3. exact verify: names travel to the pair rows through hash joins
   (``cluster.attach_pair_payloads``), then a fully vectorized
   prefix/suffix-alignment check (padded byte matrices + cumprods)
   decides distance ≤ 1 — no per-pair Python, no DP table.

Deletion positions are CODEPOINTS (``pc.utf8_slice_codeunits`` slices
whole codepoints despite its name), while the verify is byte-level —
generation is therefore a SUPERSET of what byte-distance-1 needs on
valid UTF-8, and the operator is exact byte-level Levenshtein ≤ 1 for
any valid UTF-8 input. Null strings are skipped (SQL semantics:
``levenshtein(NULL, x)`` is NULL, never a match).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BIG = 1 << 30  # "to end of string" slice stop


def deletion_variants(col) -> tuple[np.ndarray, pa.Array]:
    """(parents, variants): each row's deletion-1 neighborhood including
    the row itself. parents[i] is the source row of variants[i]."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.int64), pa.array([], type=pa.large_string())
    col = col.cast(pa.large_string())
    lens = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    parts: list[pa.Array] = [col]
    parent_parts: list[np.ndarray] = [np.arange(n, dtype=np.int64)]
    maxlen = int(lens.max()) if n else 0
    idx = np.arange(n, dtype=np.int64)
    for k in range(maxlen):
        mask = lens > k
        if not mask.any():
            break
        sub = col.filter(pa.array(mask))
        var = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sub, 0, k),
            pc.utf8_slice_codeunits(sub, k + 1, _BIG),
            pa.scalar("", type=pa.large_string()),
        )
        parts.append(var)
        parent_parts.append(idx[mask])
    return np.concatenate(parent_parts), pa.concat_arrays(
        [p.cast(pa.large_string()) for p in parts]
    )


def _pad_bytes(names: list[str], width: int) -> np.ndarray:
    """(n, width) uint8 matrix of the UTF-8 bytes, NUL-padded (strings
    must not contain NUL — guaranteed by the text-shaped contract)."""
    w = max(width, 1)
    return (
        np.array([s.encode() for s in names], dtype=f"S{w}")
        .view(np.uint8)
        .reshape(len(names), w)
    )


def edit1_mask(a_names: list[str], b_names: list[str]) -> np.ndarray:
    """Vectorized per-pair Levenshtein(a, b) ≤ 1 over byte strings."""
    n = len(a_names)
    if n == 0:
        return np.zeros(0, dtype=bool)
    la = np.array([len(s.encode()) for s in a_names], dtype=np.int64)
    lb = np.array([len(s.encode()) for s in b_names], dtype=np.int64)
    w = int(max(la.max(), lb.max(), 1)) + 1
    A, B = _pad_bytes(a_names, w), _pad_bytes(b_names, w)
    # normalize so A is the shorter string of each pair
    swap = la > lb
    if swap.any():
        A[swap], B[swap] = B[swap].copy(), A[swap].copy()
        la[swap], lb[swap] = lb[swap].copy(), la[swap].copy()
    out = np.zeros(n, dtype=bool)
    diff = lb - la
    # same length: at most one mismatching byte (padding matches itself)
    same = diff == 0
    if same.any():
        out[same] = (A[same] != B[same]).sum(axis=1) <= 1
    # length difference 1: B with one byte deleted equals A ⟺ there is a
    # split i with A[:i] == B[:i] and A[i:] == B[i+1:]
    one = diff == 1
    if one.any():
        Ao, Bo, lao = A[one], B[one], la[one]
        pos = np.arange(w, dtype=np.int64)[None, :]
        # pe[:, i] = prefix A[:i] == B[:i]  (pe[:, 0] = True)
        eq = Ao == Bo
        pe = np.ones((Ao.shape[0], w + 1), dtype=bool)
        pe[:, 1:] = np.cumprod(eq, axis=1).astype(bool)
        # t[:, j] = (A[j] == B[j+1]); positions j ≥ la are vacuously ok
        t = np.ones_like(eq)
        t[:, :-1] = Ao[:, :-1] == Bo[:, 1:]
        t |= pos >= lao[:, None]
        # ss[:, i] = all t[:, i:] — reverse cumprod
        ss = np.ones((Ao.shape[0], w + 1), dtype=bool)
        ss[:, :-1] = np.cumprod(t[:, ::-1], axis=1)[:, ::-1].astype(bool)
        out[one] = (pe & ss).any(axis=1)
    # diff >= 2 stays False
    return out


def edit1_matches_ds(
    ds,
    col: str,
    id_col: str,
    *,
    num_partitions: int = 16,
    bucket_cap: int = 256,
):
    """All id pairs (a < b) whose ``col`` strings are within Levenshtein
    distance 1. Exact (deletion banding misses nothing, every candidate
    is verified) up to the over-cap chaining caveat shared with the LSH
    family: a variant bucket holding > ``bucket_cap`` rows emits pairs
    only against its minimum id."""
    from lsearch_ray.functions.cluster import (
        attach_pair_payloads,
        bucket_pairs_ds,
        unique_pairs,
    )

    # consumed twice below (variants + name payloads): materialize once
    ds = ds.select_columns([id_col, col]).materialize()

    def variants(b: pa.Table) -> pa.Table:
        # null names never match (SQL levenshtein(NULL, x) semantics) —
        # and a shared null variant would pair them spuriously
        b = b.filter(pc.is_valid(b[col]))
        parents, vars_ = deletion_variants(b[col])
        t = pa.table(
            {
                "variant": vars_,
                id_col: b[id_col].take(pa.array(parents)),
            }
        )
        # deleting either of a doubled character yields the SAME variant;
        # a duplicated (variant, id) row would put one id twice in a
        # bucket and emit a self-pair
        return t.group_by(["variant", id_col]).aggregate([])

    vds = ds.map_batches(variants, batch_format="pyarrow")
    pairs = bucket_pairs_ds(
        vds, ["variant"], id_col=id_col,
        cap=bucket_cap, num_partitions=num_partitions,
    ).map_batches(
        # belt-and-braces: no self-pairs even if an upstream dedup is
        # bypassed
        lambda b: b.filter(pc.invert(pc.equal(b["a"], b["b"]))),
        batch_format="pyarrow",
    )
    # a pair can share several neighborhood members — shared pair dedup
    pairs = unique_pairs(pairs).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pairs
    names = ds.map_batches(
        lambda b: pa.table({id_col: b[id_col], "nm": b[col]}),
        batch_format="pyarrow",
    )
    # join partitions sized to the (deduped) pair volume: Ray's hash-join
    # rejects fully-empty partitions, which tiny pair sets with many
    # partitions produce (the minhash _pair_partitions rule)
    from lsearch_ray.functions.minhash import _pair_partitions

    joined = attach_pair_payloads(
        pairs, names, id_col, num_partitions=_pair_partitions(n_pairs)
    )

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "nm_a": pa.array([], pa.large_string()),
                    "nm_b": pa.array([], pa.large_string()),
                }
            )
        keep = edit1_mask(
            b["nm_a"].to_pylist(), b["nm_b"].to_pylist()
        )
        return b.select(["a", "b", "nm_a", "nm_b"]).filter(pa.array(keep))

    return joined.map_batches(verify, batch_format="pyarrow")


def spell_suggestions_ds(
    docs_ds,
    query_terms: list[str],
    *,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Did-you-mean spell correction: for each query term, the top-k
    corpus vocabulary terms within Levenshtein distance ≤ 1, ranked by
    (document frequency desc, term asc) — the query-assist companion to
    the reference's substring matching (`search.rs:233-248` Has), which
    offers no fuzzy recovery for misspelled targets.

    Plan shape: the df aggregate (``pipelines.fulltext.term_df``, one
    combiner-first term shuffle) is the ONLY data-sized exchange. The
    query side is tiny and travels in the map closure: each vocabulary
    batch is length-prefiltered per query term (|len−len(q)| ≤ 1) and
    exact-verified with the vectorized :func:`edit1_mask` alignment
    kernel — no per-pair Python, no vocabulary collect. Survivors are
    ranked by the grouped top-k (per-block lossless prune + one
    group-keyed shuffle of ≤ k·|Q| rows per block).

    Returns (qterm, term, df, rn) with rn ∈ [1, k].
    """
    from lsearch_ray.functions.grouped import grouped_topk_ds
    from lsearch_ray.pipelines.fulltext import term_df

    qterms = sorted(set(q for q in query_terms if q))
    qlens = np.array([len(q.encode()) for q in qterms], dtype=np.int64)

    def candidates(b: pa.Table) -> pa.Table:
        terms = b["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        tl = pc.binary_length(terms).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        df = b["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q: list[str] = []
        out_t: list[pa.Array] = []
        out_d: list[np.ndarray] = []
        for q, ql in zip(qterms, qlens):
            near = np.abs(tl - ql) <= 1
            if not near.any():
                continue
            cand = terms.filter(pa.array(near))
            names = cand.to_pylist()
            ok = edit1_mask([q] * len(names), names)
            if not ok.any():
                continue
            out_q.extend([q] * int(ok.sum()))
            out_t.append(cand.filter(pa.array(ok)))
            out_d.append(df[near][ok])
        if not out_q:
            return pa.table(
                {
                    "qterm": pa.array([], type=pa.large_string()),
                    "term": pa.array([], type=pa.large_string()),
                    "df": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "qterm": pa.array(out_q, type=pa.large_string()),
                "term": pa.concat_arrays(
                    [a.cast(pa.large_string()) for a in out_t]
                ),
                "df": pa.array(np.concatenate(out_d)),
            }
        )

    cand = term_df(docs_ds, text_col, id_col).map_batches(
        candidates, batch_format="pyarrow"
    )
    return grouped_topk_ds(
        cand, "qterm", "df", id_col="term", k=k
    )
