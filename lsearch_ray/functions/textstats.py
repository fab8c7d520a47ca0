"""Text analysis operators: language id, quality scoring, token counting,
document fingerprinting. All vectorized batch transforms over Arrow.

These extend the reference's per-record content scoring surface
(``ContentScorer``, search.rs:191-197) with the metrics a training-data
pipeline filters on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lsearch_ray.analyzer import flat_tokens_arrow

# Minimal stopword/function-word profiles for an n-gram-free heuristic
# language id: score = fraction of tokens in each language's profile.
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in is for on with that as at by from this be are was "
        "it an or have has not but they you we his her their".split()
    ),
    "es": frozenset(
        "el la de que y en los del se las por un para con una su al es lo "
        "como mas pero sus le ya o este si porque esta entre".split()
    ),
    "de": frozenset(
        "der die und in den von zu das mit sich des auf fur ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach".split()
    ),
    "fr": frozenset(
        "le de la et les des en un du une que est pour qui dans a par plus "
        "pas au sur ne se ce il sont la mais comme ou si leur".split()
    ),
}

# BPE-ish token pattern: words, numbers, or single non-space symbols —
# the "token counting" regex of FIXTURES/engine docs.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_EN_STOPWORDS = LANG_PROFILES["en"]


class LangId:
    """Actor-pool batch transform appending ``lang_pred`` + ``lang_score``.

    Profiles are built once per actor (``__init__``); per batch the flat
    token stream is matched against each profile with Arrow ``is_in`` and
    per-doc fractions come from one ``np.add.reduceat`` per language.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {
            lang: pa.array(sorted(words)) for lang, words in LANG_PROFILES.items()
        }
        self.langs = sorted(self.profiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parents, flat = flat_tokens_arrow(batch[self.text_col])
        counts = (
            np.bincount(parents, minlength=n)
            if len(parents)
            else np.zeros(n, dtype=np.int64)
        )
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        nonempty = counts > 0
        scores = np.zeros((n, len(self.langs)), dtype=np.float64)
        if len(flat):
            rstarts = starts[nonempty]
            for j, lang in enumerate(self.langs):
                hits = pc.is_in(flat, value_set=self.profiles[lang])
                hv = hits.to_numpy(zero_copy_only=False).astype(np.int64)
                if len(rstarts):
                    scores[nonempty, j] = np.add.reduceat(hv, rstarts) / counts[
                        nonempty
                    ]
        best = scores.argmax(axis=1)
        pred = np.where(
            scores.max(axis=1) > 0.0,
            np.array(self.langs, dtype=object)[best],
            "und",
        )
        return batch.append_column(
            "lang_pred", pa.array(pred.tolist(), type=pa.string())
        ).append_column("lang_score", pa.array(scores.max(axis=1)))


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append quality metrics: n_tokens, mean_token_len, stopword_ratio,
    alpha_ratio, digit_ratio, upper_ratio — the standard cheap quality
    signals (Gopher/C4-style rules build on exactly these)."""
    n = batch.num_rows
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    total_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    safe_chars = np.maximum(total_chars, 1.0)

    def char_class_count(pattern: str) -> np.ndarray:
        return (
            pc.count_substring_regex(text, pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )

    digits = char_class_count(r"[0-9]")
    alpha = char_class_count(r"[A-Za-z]")
    upper = char_class_count(r"[A-Z]")

    parents, flat = flat_tokens_arrow(text)
    counts = (
        np.bincount(parents, minlength=n) if len(parents) else np.zeros(n, np.int64)
    )
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    nonempty = counts > 0
    tok_lens = (
        pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
        if len(flat)
        else np.empty(0)
    )
    mean_len = np.zeros(n)
    stop_ratio = np.zeros(n)
    if len(flat) and nonempty.any():
        rstarts = starts[nonempty]
        mean_len[nonempty] = np.add.reduceat(tok_lens, rstarts) / counts[nonempty]
        stop_hits = (
            pc.is_in(flat, value_set=pa.array(sorted(_EN_STOPWORDS)))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        stop_ratio[nonempty] = np.add.reduceat(stop_hits, rstarts) / counts[nonempty]
    def r6(x: np.ndarray) -> np.ndarray:
        # half-away-from-zero to 6 dp (np.round is half-to-even, which
        # disagrees with SQL engines on exactly-representable halves)
        return np.floor(x * 1e6 + 0.5) / 1e6

    return (
        batch.append_column("n_tokens", pa.array(counts.astype(np.int64)))
        .append_column("mean_token_len", pa.array(r6(mean_len)))
        .append_column("stopword_ratio", pa.array(r6(stop_ratio)))
        .append_column("alpha_ratio", pa.array(r6(alpha / safe_chars)))
        .append_column("digit_ratio", pa.array(r6(digits / safe_chars)))
        .append_column("upper_ratio", pa.array(r6(upper / safe_chars)))
    )


def bpe_ish_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_bpe_tokens``: count of BPE-ish pattern matches
    (words / numbers / standalone symbols)."""
    text = batch[text_col]
    c = pc.count_substring_regex(text, BPE_ISH_PATTERN)
    return batch.append_column("n_bpe_tokens", c.cast(pa.int64()))


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``fp64``: order-sensitive 63-bit rolling polynomial hash of
    the token stream (the exact-dup key that ignores whitespace/case but
    not token order)."""
    n = batch.num_rows
    parents, flat = flat_tokens_arrow(batch[text_col])
    from lsearch_ray.corpus import fnv1a64

    h = fnv1a64(flat).astype(np.uint64) if len(flat) else np.empty(0, np.uint64)
    counts = (
        np.bincount(parents, minlength=n) if len(parents) else np.zeros(n, np.int64)
    )
    fp = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    mult = np.uint64(0x100000001B3)
    # rolling hash per doc: sequential in token position, vectorized across
    # docs at each position (docs have few hundred tokens; positions loop)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    max_len = int(counts.max()) if n else 0
    with np.errstate(over="ignore"):
        for k in range(max_len):
            active = counts > k
            fp[active] = (fp[active] ^ h[starts[active] + k]) * mult
    return batch.append_column(
        "fp64",
        pa.array((fp & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)),
    )


# PII-style scrubbing patterns: (name, RE2 pattern, replacement). Both
# pyarrow.compute and DuckDB run RE2, so the oracle can replay these
# exactly. Patterns apply IN ORDER, each seeing the previous ones'
# replacements (counts are taken just before a pattern's own rewrite).
DEFAULT_REDACT_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<email>"),
    # serial-style tokens (letters immediately followed by digits)
    ("serial", r"[a-z]+[0-9]+[a-z0-9]*", "<id>"),
]


def redact_text(
    batch: pa.Table,
    patterns: list[tuple[str, str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Scrub pattern matches from a text column.

    Returns (id_col, n_<name> per pattern, clean_text): per-doc
    non-overlapping match counts plus the text with every pattern
    replaced. Vectorized: one RE2 count + one RE2 replace kernel per
    pattern over the whole batch.
    """
    pats = DEFAULT_REDACT_PATTERNS if patterns is None else patterns
    s = batch[text_col]
    cols: dict[str, object] = {id_col: batch[id_col]}
    for name, pat, repl in pats:
        cols[f"n_{name}"] = pc.count_substring_regex(s, pat).cast(pa.int64())
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    cols["clean_text"] = s
    return pa.table(cols)


def redact_ds(
    ds,
    patterns: list[tuple[str, str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Dataset form of :func:`redact_text` — pure map-side scrubbing."""
    return ds.map_batches(
        lambda b: redact_text(b, patterns, text_col, id_col),
        batch_format="pyarrow",
    )


def extract_matches(
    batch: pa.Table,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """All non-overlapping matches of ``pattern`` per doc, exploded to
    (id, idx, match) rows (idx 1-based per doc) — the regex flat-map.

    Fully vectorized despite Arrow lacking an extract-all kernel: one
    RE2 pass marks every match as ``\\x00match\\x01`` in place, a split
    on ``\\x00`` isolates the pieces (each list's first piece is the
    pre-match junk), and a bounded split on ``\\x01`` strips the trailer
    — three Arrow kernels, no Python over rows. Contract: neither the
    text nor the pattern's matches may contain the \\x00/\\x01 sentinel
    bytes (impossible for any text-shaped pattern; raise the kernel into
    a per-row ``re.findall`` actor if you need binary-robust extraction).
    Null text yields no rows. Match semantics (leftmost, non-overlapping,
    greedy quantifiers) coincide with DuckDB ``regexp_extract_all`` —
    both are RE2.
    """
    ids = batch[id_col].combine_chunks()
    raw = batch[text_col].combine_chunks()
    txt = pc.fill_null(raw, "")
    marked = pc.replace_substring_regex(
        txt, pattern="(" + pattern + ")", replacement="\x00\\1\x01"
    )
    lists = pc.split_pattern(marked, pattern="\x00")
    offs = np.asarray(lists.offsets)
    flat = lists.values
    keep = np.ones(len(flat), dtype=bool)
    keep[offs[:-1]] = False  # each doc's first piece is pre-match text
    if raw.null_count:
        # fill_null("") would let empty-matching patterns (x*) emit a
        # row for null text; SQL's regexp_extract_all(NULL, ...) yields
        # none — drop every piece of null rows
        null_rows = np.asarray(pc.is_null(raw))
        row_of = np.repeat(
            np.arange(len(ids), dtype=np.int64), np.diff(offs)
        )
        keep &= ~null_rows[row_of]
    pieces = flat.filter(pa.array(keep))
    match = pc.list_element(
        pc.split_pattern(pieces, pattern="\x01", max_splits=1), 0
    )
    # matches per row = kept pieces per row (offs are strictly
    # increasing: split always yields at least one piece per row)
    n_per = np.add.reduceat(keep.astype(np.int64), offs[:-1])
    parents = np.repeat(np.arange(len(ids), dtype=np.int64), n_per)
    starts = np.concatenate(([0], np.cumsum(n_per)))
    idx = np.arange(len(match), dtype=np.int64) - starts[parents] + 1
    return pa.table(
        {
            id_col: ids.take(pa.array(parents)),
            "idx": pa.array(idx),
            "match": match,
        }
    )


def extract_matches_ds(
    ds, pattern: str, *, text_col: str = "text", id_col: str = "doc_id"
):
    """Dataset form of :func:`extract_matches` — pure map-side."""
    return ds.map_batches(
        lambda b: extract_matches(b, pattern, text_col, id_col),
        batch_format="pyarrow",
    )


def doc_entropy(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Per-doc token-distribution entropy as an exact integer quality
    signal: ``ent_microdl = dl·lnm(dl) − Σ_t c_t·lnm(c_t)`` where lnm(x)
    is ln(x) rounded half-up to integer micro-nats — this is dl·1e6
    times the Shannon entropy H = ln dl − (1/dl)Σ c ln c, kept as a pure
    integer so both engines agree bit-for-bit (the unigram_nll
    round-before-weighted-sum convention; boilerplate → 0, uniform
    vocabulary → dl·ln(dl)·1e6). Token-less docs emit (dl=0, 0).
    Pure map-side — no shuffle."""
    from lsearch_ray.analyzer import flat_tokens_arrow
    from lsearch_ray.functions.ngrams import _ln_of_counts

    n = batch.num_rows
    parents, flat = flat_tokens_arrow(batch[text_col])
    dl = (
        np.bincount(parents, minlength=n).astype(np.int64)
        if len(parents)
        else np.zeros(n, dtype=np.int64)
    )
    acc = np.zeros(n, dtype=np.int64)
    if len(parents):
        tf = (
            pa.table({"d": pa.array(parents), "w": flat})
            .group_by(["d", "w"])
            .aggregate([("w", "count")])
        )
        d_idx = tf["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = tf["w_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        lnm_c = np.floor(_ln_of_counts(c) * 1e6 + 0.5).astype(np.int64)
        np.add.at(acc, d_idx, c * lnm_c)
    ent = np.zeros(n, dtype=np.int64)
    pos = dl > 0
    if pos.any():
        lnm_dl = np.floor(_ln_of_counts(dl[pos]) * 1e6 + 0.5).astype(np.int64)
        ent[pos] = dl[pos] * lnm_dl - acc[pos]
    return pa.table(
        {
            id_col: batch[id_col],
            "dl": pa.array(dl),
            "ent_microdl": pa.array(ent),
        }
    )


def doc_entropy_ds(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset form of :func:`doc_entropy` — pure map-side."""
    return ds.map_batches(
        lambda b: doc_entropy(b, text_col, id_col), batch_format="pyarrow"
    )


def quality_percentile_gate_ds(
    ds,
    *,
    frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Dynamic-threshold quality gate: keep the docs whose
    token-distribution entropy signal (:func:`doc_entropy`'s integer
    ``ent_microdl`` — low for boilerplate / repetitive / short docs) is
    at or above the corpus's (1−frac) quantile — "keep the top ``frac``
    share of the corpus by signal", with the cutoff LEARNED from the
    corpus rather than hand-tuned (the Gopher-style percentile gate the
    fixed-threshold :func:`quality_filter_ds` can't express).

    Threshold = the exact order statistic at rank floor((1−frac)·(n−1))
    of ent_microdl ascending (functions.quantiles.exact_quantiles —
    streamed histogram-refinement passes, nothing corpus-sized on the
    driver); every doc AT the threshold is kept, so the survivor set is
    deterministic under any partitioning (no tie-breaking needed).
    Returns (id_col, dl, ent_microdl) for survivors, sorted by id_col.

    Scale shape: one map-side scoring pass (materialized — consumed by
    both the quantile passes and the final filter), O(log range)
    streamed histogram passes for the threshold, one filter pass.
    ent_microdl stays exact in the quantile's float64 bucketing below
    2^53 (breaking that needs ≳10^9 tokens in a SINGLE doc)."""
    if not (0.0 < frac <= 1.0):
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    from lsearch_ray.functions.quantiles import exact_quantiles

    scored = doc_entropy_ds(
        ds, text_col=text_col, id_col=id_col
    ).materialize()
    qt = exact_quantiles(scored, "ent_microdl", [1.0 - frac])
    thr_f = qt["value"][0].as_py()
    if thr_f != thr_f:  # NaN — empty corpus: typed empty passes through
        return scored
    thr = pa.scalar(int(thr_f), pa.int64())
    return scored.map_batches(
        lambda b: b.filter(pc.greater_equal(b["ent_microdl"], thr)),
        batch_format="pyarrow",
    ).sort(id_col)


def grouped_quality_percentile_gate_ds(
    ds,
    group_col: str,
    *,
    frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_broadcast_rows: int = 2_000_000,
    num_partitions: int = 64,
):
    """Per-slice dynamic quality gate: within EACH group (language,
    source, domain …) keep the docs whose entropy signal is at or above
    that group's own (1−frac) quantile — per-slice quality floors differ
    (a thin language must not be gated by the dominant one's
    distribution), so the cutoff is learned per group. Same rank rule as
    :func:`quality_percentile_gate_ds` (value at floor((1−frac)·(n_g−1))
    ascending; threshold ties all survive).

    Returns (id_col, dl, ent_microdl, group_col) survivors sorted by
    id_col.

    Scale shape: one map-side scoring pass (group column carried
    through); per-group thresholds via grouped_quantiles_ds (ONE
    group-keyed shuffle of (group, value) — assumes a single group's
    rows fit one reduce task); the |groups|-row threshold table joins
    back by broadcast up to ``max_broadcast_rows`` groups (per-language
    shapes) and by partitioned hash join past it (per-domain shapes),
    the house totalization pattern."""
    if not (0.0 < frac <= 1.0):
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    from lsearch_ray.functions.joins import (
        broadcast_join,
        hash_join,
        safe_partitions,
    )
    from lsearch_ray.functions.quantiles import grouped_quantiles_ds

    def score(b: pa.Table) -> pa.Table:
        return doc_entropy(b, text_col, id_col).append_column(
            group_col, b[group_col]
        )

    scored = ds.map_batches(score, batch_format="pyarrow").materialize()
    thr_ds = grouped_quantiles_ds(
        scored, group_col, "ent_microdl", [1.0 - frac],
        num_partitions=num_partitions,
    ).materialize()

    def to_thr(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                group_col: t[group_col],
                "__thr": pc.cast(
                    t["value"], pa.int64()
                ),  # exact: int64 values below 2^53 round-trip float64
            }
        )

    n_groups = thr_ds.count()
    if n_groups == 0:
        return scored  # empty corpus: typed empty passes through
    if n_groups <= max_broadcast_rows:
        import ray

        lut = pa.concat_tables(
            ray.get(
                thr_ds.map_batches(
                    to_thr, batch_format="pyarrow"
                ).to_arrow_refs()
            ),
            promote_options="permissive",
        )
        joined = broadcast_join(scored, lut, on=group_col)
    else:
        joined = hash_join(
            scored,
            thr_ds.map_batches(to_thr, batch_format="pyarrow"),
            on=group_col,
            num_partitions=safe_partitions(num_partitions, n_groups),
        )
    out = joined.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b["ent_microdl"], b["__thr"])
        ).drop_columns(["__thr"]),
        batch_format="pyarrow",
    )
    return out.sort(id_col)


def json_int_field(
    col: pa.ChunkedArray | pa.Array, field: str
) -> pa.Array:
    """Vectorized integer-field extraction from a FLAT-JSON string
    column: one RE2 ``extract_regex`` pass (`"field": <int>`), null where
    the field is absent/non-integer. The semi-structured-props ETL
    primitive — both engines speak RE2, so the DuckDB twin
    (``regexp_extract``) replays it byte-for-byte. For nested JSON use a
    real parser in an actor stage; this kernel targets the flat
    event-props shape."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # extract_regex requires NAMED groups; the SQL twin uses the same
    # pattern with a plain group + regexp_extract(..., 1). The trailing
    # [,}\s] anchor rejects digit PREFIXES of non-integer values (12.5,
    # 12e3) — RE2 has no lookahead, and flat-JSON values are always
    # followed by a separator or the closing brace
    pat = f'"{field}":\\s*(?P<v>-?\\d+)[,}}\\s]'
    st = pc.extract_regex(col, pat)
    return pc.cast(pc.struct_field(st, ["v"]), pa.int64())


def props_field_stats_ds(
    ds,
    *,
    props_col: str = "props",
    group_col: str = "event_type",
    field: str = "k",
):
    """Per-group integer stats (n, sum, min, max) of a flat-JSON props
    field: map-side extraction + per-batch partial aggregation, one tiny
    groupby — the events-ETL shape (parse once, aggregate everywhere)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        k = json_int_field(b[props_col], field)
        t = pa.table({group_col: b[group_col], "k": k}).filter(
            pc.is_valid(k)
        )
        g = t.group_by(group_col).aggregate(
            [("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max")]
        )
        # select by NAME: arrow appends the group key after the aggregates
        return g.select(
            [group_col, "k_count", "k_sum", "k_min", "k_max"]
        ).rename_columns([group_col, "n", "sum_k", "min_k", "max_k"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


def quality_filter_ds(
    ds,
    *,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_alpha: float = 0.5,
    max_digit: float = 0.3,
    min_stop: float = 0.01,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_all: bool = False,
):
    """Gopher/C4-style document quality gate: keep docs whose
    :func:`quality_stats` signals clear fixed thresholds (token count in
    [min_tokens, max_tokens], alpha_ratio ≥ min_alpha, digit_ratio ≤
    max_digit, stopword_ratio ≥ min_stop) — the standard pretraining
    corpus filter, composed from the already-parity-checked signals so
    threshold comparisons see bit-identical values on every engine.

    Pure map-side (one vectorized pass, no shuffle, no state). Returns
    the surviving ``(doc_id, n_tokens)`` rows — or, with
    ``keep_all=True``, the surviving INPUT rows with all their columns
    (the composed-pipeline form: downstream dedup stages need the text).
    """
    def filt(b: pa.Table) -> pa.Table:
        q = quality_stats(b, text_col)
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(q["n_tokens"], pa.scalar(min_tokens)),
                pc.less_equal(q["n_tokens"], pa.scalar(max_tokens)),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(q["alpha_ratio"], pa.scalar(min_alpha)),
                    pc.less_equal(q["digit_ratio"], pa.scalar(max_digit)),
                ),
                pc.greater_equal(q["stopword_ratio"], pa.scalar(min_stop)),
            ),
        )
        if keep_all:
            return b.filter(keep)
        return q.filter(keep).select([id_col, "n_tokens"])

    return ds.map_batches(filt, batch_format="pyarrow")


class CompressionRatio:
    """Actor-pool batch transform: per-document zlib compression ratio —
    the model-free redundancy signal of web-pipeline quality filters
    (boilerplate / spam compresses far better than prose; Gopher-class
    pipelines gate on it). Emits (id_col, raw_len, comp_len,
    ratio_micro) with ``ratio_micro = comp_len * 1e6 // max(raw_len, 1)``
    — integers, so downstream threshold compares are exact.

    Compression is inherently per-document: the loop body is one C call
    (``zlib.compress`` at a FIXED level for determinism) per doc, the
    legitimate per-row shape (same as multimodal decode). No SQL twin
    exists — DuckDB has no zlib — so the op is pytest-verified against a
    direct zlib replay and registered without an oracle entry.
    """

    LEVEL = 6  # zlib default — pinned so outputs are reproducible

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        import zlib

        self.zlib = zlib
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        raw = np.empty(len(texts), dtype=np.int64)
        comp = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            bs = (t or "").encode("utf-8")
            raw[i] = len(bs)
            comp[i] = len(self.zlib.compress(bs, self.LEVEL))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "raw_len": pa.array(raw),
                "comp_len": pa.array(comp),
                "ratio_micro": pa.array(
                    comp * 10**6 // np.maximum(raw, 1)
                ),
            }
        )


def source_quality_ds(
    docs_ds,
    *,
    source_col: str = "source",
    text_col: str = "text",
):
    """Per-SOURCE quality triage table — the crawl-curation decision
    surface (keep / downweight / drop a whole feed): document count,
    token mass, and fixed-point quality ratios aggregated from pure
    INTEGER primitives so every value replays exactly in any engine:

        tokens_per_doc_micro  = tot_tokens · 1e6 // n_docs
        stopword_ratio_micro  = tot_stop   · 1e6 // max(tot_tokens, 1)
        alpha_ratio_micro     = tot_alpha  · 1e6 // max(tot_chars, 1)

    (chars are BYTES of the utf-8 text via Arrow ``binary_length`` —
    spelled ``strlen`` in the SQL twin). One combiner pass emits
    per-batch per-source integer partials; ONE source-keyed shuffle of
    pre-aggregated rows finishes it. Null sources group under
    ``<none>``.
    """
    from lsearch_ray.analyzer import flat_tokens_arrow

    stop_set = pa.array(sorted(_EN_STOPWORDS))

    def partial(b: pa.Table) -> pa.Table:
        src = pc.fill_null(
            b[source_col].combine_chunks().cast(pa.string()), "<none>"
        )
        nrows = b.num_rows
        # null text ⇒ empty string (matches COALESCE(text,'') in the SQL
        # twin); unguarded, binary_length(null)→null turns into garbage
        # through .to_numpy().astype(int64)
        text = pc.fill_null(
            b[text_col].combine_chunks().cast(pa.string()), ""
        )
        parents, flat = flat_tokens_arrow(text)
        toks = np.bincount(parents, minlength=nrows).astype(np.int64)
        stops = np.zeros(nrows, dtype=np.int64)
        if len(flat):
            hits = (
                pc.is_in(flat, value_set=stop_set)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            np.add.at(stops, parents, hits)
        chars = (
            pc.binary_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        # alpha BYTES: strip non-letters, count remaining bytes
        alpha = (
            pc.binary_length(
                pc.replace_substring_regex(text, "[^A-Za-z]", "")
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        t = pa.table(
            {
                "source": src,
                "n_docs": pa.array(np.ones(nrows, dtype=np.int64)),
                "tok": pa.array(toks),
                "stop": pa.array(stops),
                "alpha": pa.array(alpha),
                "chars": pa.array(chars),
            }
        )
        return t.group_by("source").aggregate(
            [
                ("n_docs", "sum"),
                ("tok", "sum"),
                ("stop", "sum"),
                ("alpha", "sum"),
                ("chars", "sum"),
            ]
        )

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum(["n_docs_sum", "tok_sum", "stop_sum", "alpha_sum", "chars_sum"])
    )

    def final(b: pa.Table) -> pa.Table:
        nd = b["sum(n_docs_sum)"].to_numpy(zero_copy_only=False).astype(np.int64)
        tok = b["sum(tok_sum)"].to_numpy(zero_copy_only=False).astype(np.int64)
        stp = b["sum(stop_sum)"].to_numpy(zero_copy_only=False).astype(np.int64)
        alp = b["sum(alpha_sum)"].to_numpy(zero_copy_only=False).astype(np.int64)
        chs = b["sum(chars_sum)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": b["source"],
                "n_docs": pa.array(nd),
                "n_tokens": pa.array(tok),
                "tokens_per_doc_micro": pa.array(tok * 10**6 // nd),
                "stopword_ratio_micro": pa.array(
                    stp * 10**6 // np.maximum(tok, 1)
                ),
                "alpha_ratio_micro": pa.array(
                    alp * 10**6 // np.maximum(chs, 1)
                ),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow").sort("source")


def tokenizer_fertility_ds(ds, *, text_col: str = "text",
                           lang_col: str = "lang"):
    """Tokenizer fertility per language slice: BPE-ish tokens emitted
    per whitespace word, in exact floor-micro —

        fertility_micro = (Σ n_bpe_tokens · 10⁶) // Σ n_ws_words

    — the multilingual tokenizer-budget diagnostic (a slice whose
    fertility is far above the corpus norm pays more context window per
    word; the signal vocab-allocation decisions read). Both counts are
    RE2 kernels (``BPE_ISH_PATTERN`` and ``\\S+``) so the SQL twin
    replays them exactly. Map-side per-batch partials collapse to one
    row per (batch, lang) before the |langs|-row groupby; Python-int
    finisher (no overflow at corpus scale).

    Returns (lang, bpe_tokens, ws_words, fertility_micro) sorted by
    lang; empty slices (no whitespace words) report fertility 0.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        text = b[text_col]
        bpe = pc.count_substring_regex(text, BPE_ISH_PATTERN).cast(
            pa.int64()
        )
        ws = pc.count_substring_regex(text, r"\S+").cast(pa.int64())
        t = pa.table(
            {
                lang_col: b[lang_col],
                "bpe": bpe,
                "ws": ws,
            }
        )
        g = t.group_by([lang_col]).aggregate([("bpe", "sum"), ("ws", "sum")])
        return pa.table(
            {
                lang_col: g[lang_col],
                "bpe": g["bpe_sum"],
                "ws": g["ws_sum"],
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(lang_col)
        .aggregate(Sum("bpe", alias_name="bpe"), Sum("ws", alias_name="ws"))
    )

    def finish(t: pa.Table) -> pa.Table:
        bpe = t["bpe"].to_numpy(zero_copy_only=False).astype(object)
        ws = t["ws"].to_numpy(zero_copy_only=False).astype(object)
        fert = [
            int(b) * 10**6 // int(w) if int(w) > 0 else 0
            for b, w in zip(bpe, ws)
        ]
        return pa.table(
            {
                lang_col: t[lang_col],
                "bpe_tokens": t["bpe"].cast(pa.int64()),
                "ws_words": t["ws"].cast(pa.int64()),
                "fertility_micro": pa.array(fert, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(lang_col)
