"""BM25 top-k query serving over the sharded inverted index.

Three query paths, all rank-identical to ``golden.GoldenIndex.bm25``:

- :func:`search_index` — driver-side convenience (loads postings for the
  query's terms only, via parquet predicate pushdown). Tests/smoke.
- :class:`BatchSearcher` — the Ray-Data path: a callable CLASS for
  ``queries_ds.map_batches(BatchSearcher,
  fn_constructor_kwargs={"index_dir": ...}, concurrency=N)``.
  Each actor opens the index once (``__init__``), then per batch loads
  postings for the batch's union of terms (term-pushdown IO) and scores
  every query vectorized. Streams arbitrarily many queries.
- :class:`_ShardGroupSearcher` + :class:`QueryEngine` — scatter-gather
  serving: one raw Ray actor per shard group holds ENCODED postings plus
  the global termstats in memory, answers in a single scatter round with
  per-term contribution caches, and returns an exact shard-local top-k
  (doc-sharding makes per-shard scores complete); the driver merges.
  Raw actors are justified here: a long-lived shared index server is the
  one stage the Dataset API can't express (SURVEY.md §4).
- :func:`phrase_search` / :class:`BatchPhraseSearcher` — exact-phrase
  top-k over a positional index; and ALL three term paths accept the
  extended grammar (``'"exact phrase" loose -banned -"bad seq"'``) with
  identical golden-defined semantics (the shared _extended_search core).

Determinism contract (matches golden.py bit-for-bit):
- query terms deduped + sorted; contributions accumulated per doc in that
  term order via ``np.add.at`` (in-order scatter-add), float64;
- idf/tf-norm arithmetic written with the exact same operation order as
  the golden implementation;
- final order: score desc, doc_id asc.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from lsearch_ray.analyzer import parse_query, parse_query_full, tokenize
from lsearch_ray.index import fsio
from lsearch_ray.index.build import IndexMeta, _shard_dir
from lsearch_ray.index.codec import LazyPostings, decode_posting_column


def _postings_files(index_dir: str, num_shards: int, fs=None) -> list[str]:
    if fs is None:
        return [
            os.path.join(_shard_dir(index_dir, s), "postings.parquet")
            for s in range(num_shards)
        ]
    return [
        fsio.join(index_dir, f"shard={s:05d}", "postings.parquet")
        for s in range(num_shards)
    ]


# per-process cache of shard doc tables (the ordinal -> raw-id mapping the
# docs blobs reference; embedded in postings.parquet row 0, docs_tab
# column): one entry per postings path, invalidated by mtime+size so
# compaction/merge rewrites are picked up — and coherent by construction,
# since table and blobs live in the same atomically-replaced file
_DOC_TABLE_CACHE: dict[tuple, tuple[tuple[int, int], np.ndarray]] = {}


# value: (meta.json (mtime_ns, size) freshness key — or None when the
# index has no meta.json yet — , block_size); re-validated on every hit
# like _DOC_TABLE_CACHE so an in-place rebuild with a different
# block_size is picked up by live serving processes
_BLOCK_SIZE_CACHE: dict[tuple, tuple[tuple[int, int] | None, int]] = {}


def _block_size_for(postings_path: str, fs=None) -> int:
    """The index's block size (codec delta-reset stride) for a shard
    file, from the index's meta.json (finalize-time); cached per dir,
    invalidated by the meta.json mtime+size."""
    import json

    idx_dir = os.path.dirname(os.path.dirname(postings_path))
    cache_key = (fsio.fs_cache_key(fs), idx_dir)
    meta_path = (
        os.path.join(idx_dir, "meta.json")
        if fs is None
        else fsio.join(idx_dir, "meta.json")
    )
    meta_exists = (
        os.path.exists(meta_path) if fs is None else fsio.exists(fs, meta_path)
    )
    fkey = fsio.file_key(fs, meta_path) if meta_exists else None
    ent = _BLOCK_SIZE_CACHE.get(cache_key)
    if ent is not None and ent[0] == fkey:
        return ent[1]
    from lsearch_ray.index.codec import DEFAULT_BLOCK_SIZE

    if not meta_exists:
        bs = DEFAULT_BLOCK_SIZE
    elif fs is None:
        with open(meta_path) as f:
            bs = int(json.load(f)["block_size"])
    else:
        bs = int(fsio.read_json(fs, meta_path)["block_size"])
    _BLOCK_SIZE_CACHE[cache_key] = (fkey, bs)
    return bs


def _doc_table_for(postings_path: str, fs=None) -> np.ndarray:
    from lsearch_ray.index.codec import doc_table_from_postings

    key = fsio.file_key(fs, postings_path)
    cache_key = (fsio.fs_cache_key(fs), postings_path)
    ent = _DOC_TABLE_CACHE.get(cache_key)
    if ent is None or ent[0] != key:
        pf = fsio.parquet_file(fs, postings_path)
        if pf.metadata.num_rows == 0:
            arr = np.empty(0, dtype=np.int64)
        else:
            # row 0 lives in row group 0 — read only that column chunk
            arr = doc_table_from_postings(
                pf.read_row_group(0, columns=["docs_tab"])
            )
        _DOC_TABLE_CACHE[cache_key] = (key, arr)
        return arr
    return ent[1]


def load_postings_for_terms(
    files: list[str], terms: list[str], filesystem=None
) -> dict[str, list[tuple[np.ndarray, np.ndarray, np.ndarray]]]:
    """Read only the query terms' rows (parquet filter pushdown), decode.

    Returns term → list of (doc_ids, tfs, dls) fragments (one per shard
    that contains the term).
    """
    out: dict[str, list[tuple[np.ndarray, np.ndarray, np.ndarray]]] = {}
    if not terms:
        return out
    tset = pa.array(sorted(set(terms)))
    for f in files:
        t = fsio.pq_read(
            filesystem,
            f,
            columns=["term", "docs", "tfs", "dls"],
            filters=pc.field("term").isin(tset),
        )
        if t.num_rows == 0:
            continue
        dt = _doc_table_for(f, filesystem)
        bs = _block_size_for(f, filesystem)
        for i in range(t.num_rows):
            term = t["term"][i].as_py()
            out.setdefault(term, []).append(
                decode_posting_column(
                    t["docs"][i].as_py(), t["tfs"][i].as_py(),
                    t["dls"][i].as_py(), dt, bs,
                )
            )
    return out


def global_dfs(
    postings: dict[str, list[tuple[np.ndarray, np.ndarray, np.ndarray]]]
) -> dict[str, int]:
    return {t: sum(len(frag[0]) for frag in frags) for t, frags in postings.items()}


def load_postings_with_skips(
    files: list[str], terms: list[str], filesystem=None
) -> dict[str, list[tuple]]:
    """Like :func:`load_postings_for_terms` but each fragment also carries
    the block-max skip arrays: (doc_ids, tfs, dls, skip_max_tf, skip_min_dl)."""
    out: dict[str, list[tuple]] = {}
    if not terms:
        return out
    tset = pa.array(sorted(set(terms)))
    cols = ["term", "docs", "tfs", "dls", "skip_max_tf", "skip_min_dl"]
    for f in files:
        t = fsio.pq_read(
            filesystem, f, columns=cols, filters=pc.field("term").isin(tset)
        )
        if t.num_rows == 0:
            continue
        dt = _doc_table_for(f, filesystem)
        bs = _block_size_for(f, filesystem)
        for i in range(t.num_rows):
            term = t["term"][i].as_py()
            doc_ids, tfs, dls = decode_posting_column(
                t["docs"][i].as_py(), t["tfs"][i].as_py(),
                t["dls"][i].as_py(), dt, bs,
            )
            out.setdefault(term, []).append(
                (
                    doc_ids,
                    tfs,
                    dls,
                    np.asarray(t["skip_max_tf"][i].as_py(), dtype=np.int64),
                    np.asarray(t["skip_min_dl"][i].as_py(), dtype=np.int64),
                )
            )
    return out


# below this total posting volume the θ/bound passes are pure overhead;
# both paths are exact so this is a cost knob (tests pin it to 0 to force
# the pruned path on small corpora)
EXHAUSTIVE_CUTOFF = 50_000

# terms at or below this df decode fully in the lazy path and prune with
# exact point impacts instead of block intervals — decoding a short list
# is cheaper than the pruning it defeats (a sparse block's doc-id interval
# spans nearly the whole corpus, which would smear its bound everywhere)
SPARSE_DECODE_LIMIT = 8192

_LAZY_COLS = [
    "term",
    "df",
    "docs",
    "tfs",
    "dls",
    "skip_last",
    "skip_doff",
    "skip_toff",
    "skip_loff",
    "skip_max_tf",
    "skip_min_dl",
]


def _lazy_rows(
    t: pa.Table,
    block_size: int,
    out: dict[str, list[LazyPostings]],
    doc_table: np.ndarray,
):
    for i in range(t.num_rows):
        out.setdefault(t["term"][i].as_py(), []).append(
            LazyPostings(
                t["docs"][i].as_py(),
                t["tfs"][i].as_py(),
                t["dls"][i].as_py(),
                np.asarray(t["skip_last"][i].as_py(), dtype=np.int64),
                np.asarray(t["skip_doff"][i].as_py(), dtype=np.int64),
                np.asarray(t["skip_toff"][i].as_py(), dtype=np.int64),
                np.asarray(t["skip_loff"][i].as_py(), dtype=np.int64),
                np.asarray(t["skip_max_tf"][i].as_py(), dtype=np.int64),
                np.asarray(t["skip_min_dl"][i].as_py(), dtype=np.int64),
                int(t["df"][i].as_py()),
                block_size,
                doc_table,
            )
        )


def load_postings_lazy(
    files: list[str], terms: list[str], block_size: int, filesystem=None
) -> dict[str, list[LazyPostings]]:
    """Pushdown-read the query terms' rows, kept ENCODED: fragments decode
    per block on demand (true skip-pointer decoding)."""
    out: dict[str, list[LazyPostings]] = {}
    if not terms:
        return out
    tset = pa.array(sorted(set(terms)))
    for f in files:
        t = fsio.pq_read(
            filesystem, f, columns=_LAZY_COLS, filters=pc.field("term").isin(tset)
        )
        if t.num_rows == 0:
            continue
        _lazy_rows(t, block_size, out, _doc_table_for(f, filesystem))
    return out


def global_dfs_lazy(postings: dict[str, list[LazyPostings]]) -> dict[str, int]:
    return {t: sum(f.df for f in frags) for t, frags in postings.items()}


def _eager5(
    postings: dict[str, list[LazyPostings]], only: set[str] | None = None
) -> dict[str, list[tuple]]:
    """Full-decode view in the 5-tuple shape the eager scorers consume.

    ``only`` restricts conversion to the given terms — callers holding a
    large term cache (BatchSearcher) must not pay a full-cache rebuild
    per query (measured: the dominant cost of a 500-query batch)."""
    return {
        t: [f.decode_all() + (f.skip_max_tf, f.skip_min_dl) for f in frags]
        for t, frags in postings.items()
        if only is None or t in only
    }


def _range_max(vals: np.ndarray, los: np.ndarray, his: np.ndarray) -> np.ndarray:
    """Vectorized inclusive range-max over ``vals`` via a sparse table
    (O(n log n) build, O(1) per query; ranges may overlap arbitrarily)."""
    n = len(vals)
    if n == 0 or len(los) == 0:
        return np.empty(0, dtype=vals.dtype)
    table = [vals]
    j = 0
    while (1 << (j + 1)) <= n:
        prev = table[j]
        half = 1 << j
        table.append(np.maximum(prev[: len(prev) - half], prev[half:]))
        j += 1
    lengths = his - los + 1
    ks = np.zeros(len(lengths), dtype=np.int64)
    ln = lengths >> 1
    while ln.any():
        ks += (ln > 0).astype(np.int64)
        ln >>= 1
    out = np.empty(len(los), dtype=vals.dtype)
    for k in np.unique(ks):
        m = ks == k
        half = 1 << int(k)
        out[m] = np.maximum(
            table[int(k)][los[m]], table[int(k)][his[m] - half + 1]
        )
    return out


def score_query_blockmax_lazy(
    query: str,
    postings: dict[str, list[LazyPostings]],
    dfs: dict[str, int],
    meta: IndexMeta,
    k: int = 10,
    mode: str = "or",
    banned: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max BM25 top-k with TRUE skip-pointer decoding — decodes only
    posting blocks whose interval upper bound can reach the θ threshold;
    rank- and score-identical to :func:`score_query_blockmax`.

    1. θ := kth-best partial score over the highest-idf term (that term
       decodes fully — it is one list).
    2. Block survival without decoding the LONG lists: sparse terms
       (df ≤ SPARSE_DECODE_LIMIT — cheap) decode fully and contribute
       their exact per-posting impacts as point events at their actual
       doc ids; each block of a long list contributes its impact bound
       ``idf·norm(max_tf, min_dl)`` over its doc-id interval
       [prev skip_last+1, skip_last]. An interval sweep (sorted boundary
       events + prefix sums) yields the active bound-sum per doc-range
       segment, and a long-list block survives iff the max segment sum
       over its interval ≥ θ. Point events are what make pruning bite: a
       rare high-idf term only lifts segments at its actual hits instead
       of smearing its bound across the whole doc-id range.
       Rank identity: any doc with true total ≥ θ has segment sum ≥ its
       (tight) bound ≥ its true total ≥ θ at its position, so every block
       containing it survives and its exact score is complete; pruned
       docs have bound < θ, hence true score < θ, and ≥ k docs score ≥ θ.
    3. Decode surviving blocks only (codec byte-offset slices), refine to
       the per-doc bound, exact-score docs with bound ≥ θ in the same
       deterministic term order as the exhaustive path.

    AND / negation / small-OR queries delegate to the eager paths (they
    need the full lists anyway)."""
    terms, excluded = parse_query(query)
    present = [t for t in terms if postings.get(t)]
    needed = set(terms) | set(excluded)
    if excluded or mode != "or" or not present:
        return score_query_blockmax(
            query, _eager5(postings, needed), dfs, meta, k, mode, banned
        )
    if sum(dfs[t] for t in present) < EXHAUSTIVE_CUTOFF:
        return score_query(
            query, _eager5(postings, needed), dfs, meta, k, mode, banned
        )
    banned = (
        np.asarray(banned, dtype=np.int64)
        if banned is not None and len(banned)
        else None
    )

    def _mask_banned(docs: np.ndarray) -> np.ndarray:
        """True where docs are LIVE (banned is sorted)."""
        sel = np.searchsorted(banned, docs)
        valid = sel < len(banned)
        hit = np.zeros(len(docs), dtype=bool)
        hit[valid] = banned[sel[valid]] == docs[valid]
        return ~hit

    def idf(t: str) -> float:
        df = dfs[t]
        return math.log(1.0 + (meta.n_docs - df + 0.5) / (df + 0.5))

    lead = max(present, key=idf)
    w = idf(lead)
    lead_parts = []
    for f in postings[lead]:
        docs_l, tfs_l, dls_l = f.decode_all()
        if banned is not None:
            live = _mask_banned(docs_l)
            tfs_l, dls_l = tfs_l[live], dls_l[live]
        lead_parts.append(
            w
            * _bm25_norm(
                tfs_l.astype(np.float64), dls_l.astype(np.float64), meta
            )
        )
    lead_scores = (
        np.concatenate(lead_parts) if lead_parts else np.empty(0, np.float64)
    )
    if len(lead_scores) > k:
        theta = float(np.partition(lead_scores, -k)[-k])
    else:
        theta = 0.0
    if theta <= 0.0:
        return score_query_blockmax(
            query, _eager5(postings, needed), dfs, meta, k, mode, banned
        )

    # ---- survival sweep: point events for sparse terms (decoded, exact
    # impacts), interval events for long lists' blocks (no decoding) ----
    sparse = {t for t in present if dfs[t] <= SPARSE_DECODE_LIMIT}
    frag_list: list[tuple[str, LazyPostings, np.ndarray]] = []  # long only
    sparse_decoded: list[tuple[str, np.ndarray, np.ndarray, np.ndarray, float, np.ndarray]] = []
    ev_pos_parts, ev_val_parts = [], []
    for t in present:
        w_t = idf(t)
        for f in postings[t]:
            if t in sparse:
                docs_d, tfs_d, dls_d = f.decode_all()
                impact = w_t * _bm25_norm(
                    tfs_d.astype(np.float64), dls_d.astype(np.float64), meta
                )
                sparse_decoded.append((t, docs_d, tfs_d, dls_d, w_t, impact))
                ev_pos_parts.append(docs_d)
                ev_pos_parts.append(docs_d + 1)
                ev_val_parts.append(impact)
                ev_val_parts.append(-impact)
            else:
                lo, hi = f.block_ranges()
                ub = w_t * _bm25_norm(
                    f.skip_max_tf.astype(np.float64),
                    f.skip_min_dl.astype(np.float64),
                    meta,
                )
                frag_list.append((t, f, ub))
                ev_pos_parts.append(lo)
                ev_pos_parts.append(hi + 1)
                ev_val_parts.append(ub)
                ev_val_parts.append(-ub)
    ev_pos = np.concatenate(ev_pos_parts)
    ev_val = np.concatenate(ev_val_parts)
    order = np.argsort(ev_pos, kind="stable")
    pos_sorted = ev_pos[order]
    cum = np.cumsum(ev_val[order])
    seg_pos = np.unique(pos_sorted)
    seg_sum = cum[np.searchsorted(pos_sorted, seg_pos, side="right") - 1]
    # float slack: the prefix sum over +ub/-ub events cancels, so a
    # segment that mathematically equals a doc's bound can land one ulp
    # BELOW it — and θ comparisons are exact (a kth-ranked doc whose
    # score ties θ would be pruned). Bound the cancellation error
    # (n_events × eps × max |prefix|) plus a relative term; loosening
    # the tests only decodes/scores extra candidates, never changes
    # the exact final ranking.
    slack = (
        np.finfo(np.float64).eps * len(ev_val) * float(np.max(np.abs(cum)))
        if len(ev_val)
        else 0.0
    ) + 1e-12 * theta
    thr = theta - slack

    # ---- decode surviving long-list blocks + per-doc bound refinement ----
    # `decoded` must keep the (term, fragment) iteration order of `present`
    # so the exact-scoring accumulation order matches the eager path
    decoded_by_key: dict[int, tuple] = {}
    doc_parts, ub_parts = [], []
    for t, docs_d, tfs_d, dls_d, w_t, impact in sparse_decoded:
        doc_parts.append(docs_d)
        ub_parts.append(impact)
    for t, f, ub in frag_list:
        lo, hi = f.block_ranges()
        s_lo = np.searchsorted(seg_pos, lo, side="right") - 1
        s_hi = np.searchsorted(seg_pos, hi, side="right") - 1
        alive = _range_max(seg_sum, np.maximum(s_lo, 0), s_hi) >= thr
        sel = np.flatnonzero(alive)
        if len(sel) == 0:
            continue
        docs_d, tfs_d, dls_d = f.decode_blocks(sel)
        decoded_by_key[id(f)] = (docs_d, tfs_d, dls_d)
        counts = f.block_counts()[sel]
        doc_parts.append(docs_d)
        ub_parts.append(np.repeat(ub[sel], counts))
    decoded: list[tuple[str, np.ndarray, np.ndarray, np.ndarray, float]] = []
    for t in present:
        w_t = idf(t)
        for f in postings[t]:
            if t in sparse:
                docs_d, tfs_d, dls_d = f.decode_all()
                decoded.append((t, docs_d, tfs_d, dls_d, w_t))
            elif id(f) in decoded_by_key:
                docs_d, tfs_d, dls_d = decoded_by_key[id(f)]
                decoded.append((t, docs_d, tfs_d, dls_d, w_t))
    if not doc_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    docs = np.concatenate(doc_parts)
    ubs = np.concatenate(ub_parts)
    uniq, inverse = np.unique(docs, return_inverse=True)
    bound = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(bound, inverse, ubs)
    keep_set = uniq[bound >= thr]
    if banned is not None and len(keep_set):
        keep_set = keep_set[_mask_banned(keep_set)]
    if len(keep_set) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    # ---- exact scoring over decoded blocks (deterministic term order) ----
    doc_parts, contrib_parts = [], []
    for t, docs_d, tfs_d, dls_d, w_t in decoded:
        sel = np.searchsorted(keep_set, docs_d)
        valid = sel < len(keep_set)
        mask = np.zeros(len(docs_d), dtype=bool)
        mask[valid] = keep_set[sel[valid]] == docs_d[valid]
        if not mask.any():
            continue
        contrib = w_t * _bm25_norm(
            tfs_d[mask].astype(np.float64), dls_d[mask].astype(np.float64), meta
        )
        doc_parts.append(docs_d[mask])
        contrib_parts.append(contrib)
    if not doc_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    docs = np.concatenate(doc_parts)
    contribs = np.concatenate(contrib_parts)
    uniq, inverse = np.unique(docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inverse, contribs)
    order = np.lexsort((uniq, -scores))[:k]
    return uniq[order].astype(np.int64), scores[order]


class TermPositions:
    """One term's merged positional postings across shards: doc-sorted
    arrays with a CSR position layout (posting i's ascending positions are
    ``pos_flat[pos_offsets[i]:pos_offsets[i+1]]``)."""

    __slots__ = ("docs", "tfs", "dls", "pos_offsets", "pos_flat")

    def __init__(self, frags: list[tuple]):
        docs = np.concatenate([f[0] for f in frags])
        tfs = np.concatenate([f[1] for f in frags])
        dls = np.concatenate([f[2] for f in frags])
        flats = np.concatenate([f[4] for f in frags])
        # per-frag offsets → combined posting order, then doc-sort with a
        # CSR gather (docs are disjoint across shards: doc-sharded index)
        counts = tfs.astype(np.int64)
        order = np.argsort(docs, kind="stable")
        self.docs = docs[order]
        self.tfs = tfs[order]
        self.dls = dls[order]
        src_off = np.concatenate(([0], np.cumsum(counts)))
        sel_counts = counts[order]
        out_off = np.concatenate(([0], np.cumsum(sel_counts)))
        gather = np.arange(out_off[-1], dtype=np.int64) + np.repeat(
            src_off[:-1][order] - out_off[:-1], sel_counts
        )
        self.pos_flat = flats[gather]
        self.pos_offsets = out_off

    def positions_of(self, idx: int) -> np.ndarray:
        return self.pos_flat[self.pos_offsets[idx] : self.pos_offsets[idx + 1]]


def load_postings_with_positions(
    files: list[str], terms: list[str], filesystem=None
) -> dict[str, TermPositions]:
    """Pushdown-read the terms' postings INCLUDING the positions blob;
    returns one merged :class:`TermPositions` per present term."""
    frags: dict[str, list[tuple]] = {}
    if not terms:
        return {}
    tset = pa.array(sorted(set(terms)))
    cols = ["term", "docs", "tfs", "dls", "poss"]
    for f in files:
        avail = fsio.parquet_file(filesystem, f).schema_arrow.names
        if "poss" not in avail:
            continue  # empty shard encoded without the positions column
        t = fsio.pq_read(
            filesystem, f, columns=cols, filters=pc.field("term").isin(tset)
        )
        if t.num_rows == 0:
            continue
        dt = _doc_table_for(f, filesystem)
        bs = _block_size_for(f, filesystem)
        for i in range(t.num_rows):
            term = t["term"][i].as_py()
            doc_ids, tfs, dls = decode_posting_column(
                t["docs"][i].as_py(), t["tfs"][i].as_py(),
                t["dls"][i].as_py(), dt, bs,
            )
            from lsearch_ray.index.codec import decode_positions_column

            po, pf = decode_positions_column(t["poss"][i].as_py(), tfs)
            frags.setdefault(term, []).append((doc_ids, tfs, dls, po, pf))
    return {t: TermPositions(fr) for t, fr in frags.items()}


def phrase_search(
    index_dir: str, phrase: str, k: int = 10, filesystem=None
) -> pa.Table:
    """Top-k docs CONTAINING the exact phrase (adjacent analyzer tokens),
    ranked by BM25 over the phrase's terms — rank- and score-identical to
    ``golden.GoldenIndex.phrase_bm25``. Requires a positional index
    (``build_index(..., positions=True)``).

    Plan: pushdown-load the phrase terms' positional postings, intersect
    doc sets rarest-first (vectorized searchsorted), verify adjacency on
    the survivors' position lists (chained sorted-intersects), then score
    the matched docs with the standard deterministic accumulation.
    """
    meta = IndexMeta.load(index_dir, filesystem=filesystem)
    if not meta.has_positions:
        raise ValueError(
            "phrase_search needs a positional index: build_index(..., positions=True)"
        )
    phrase_terms = tokenize(phrase)
    if not phrase_terms:
        return _empty_phrase_result()
    files = _postings_files(index_dir, meta.num_shards, filesystem)
    tp = load_postings_with_positions(
        files, sorted(set(phrase_terms)), filesystem
    )
    from lsearch_ray.index.tombstones import load_tombstones

    banned = load_tombstones(index_dir, filesystem=filesystem)
    docs_out, scores_out = _phrase_topk(phrase_terms, tp, meta, k, banned)
    return pa.table(
        {
            "rank": pa.array(
                np.arange(1, len(docs_out) + 1, dtype=np.int32), type=pa.int32()
            ),
            "doc_id": pa.array(docs_out, type=pa.int64()),
            "score": pa.array(scores_out, type=pa.float64()),
        }
    )


def _phrase_match_docs(
    phrase_terms: list[str], tp: dict[str, "TermPositions"]
) -> np.ndarray:
    """Sorted doc ids containing the exact adjacent token sequence:
    AND-intersect doc sets rarest-first, then verify adjacency with
    chained sorted-intersects on the position lists."""
    empty = np.empty(0, dtype=np.int64)
    uniq_terms = sorted(set(phrase_terms))
    if not uniq_terms or any(t not in tp for t in uniq_terms):
        return empty
    by_df = sorted(uniq_terms, key=lambda t: len(tp[t].docs))
    cand = tp[by_df[0]].docs
    for t in by_df[1:]:
        docs_t = tp[t].docs
        sel = np.searchsorted(docs_t, cand)
        valid = sel < len(docs_t)
        m = np.zeros(len(cand), dtype=bool)
        m[valid] = docs_t[sel[valid]] == cand[valid]
        cand = cand[m]
        if len(cand) == 0:
            return empty
    matched: list[int] = []
    idx_of = {
        t: np.searchsorted(tp[t].docs, cand) for t in set(phrase_terms)
    }
    for ci, doc in enumerate(cand):
        live = tp[phrase_terms[0]].positions_of(int(idx_of[phrase_terms[0]][ci]))
        for off in range(1, len(phrase_terms)):
            t = phrase_terms[off]
            nxt = tp[t].positions_of(int(idx_of[t][ci]))
            live = np.intersect1d(live + off, nxt, assume_unique=True) - off
            if len(live) == 0:
                break
        if len(live):
            matched.append(int(doc))
    return np.asarray(sorted(matched), dtype=np.int64)


def _phrase_filter_sets(
    phrases: list[list[str]],
    neg_phrases: list[list[str]],
    pos_cache: dict,
    files: list[str],
    filesystem=None,
) -> tuple[np.ndarray | None, np.ndarray]:
    """(allowed, banned) doc-id sets for the extended query grammar.

    ``allowed`` is the intersection of the positive phrases' match sets
    (None when no positive phrases); ``banned`` is the union of the
    negated phrases'. ``pos_cache`` memoizes TermPositions per term
    across calls (per actor / per process)."""
    need = sorted(
        {t for p in phrases for t in p} | {t for p in neg_phrases for t in p}
    )
    misses = [t for t in need if t not in pos_cache]
    if misses:
        loaded = load_postings_with_positions(files, misses, filesystem)
        for t in misses:
            pos_cache[t] = loaded.get(t)
    tp = {t: pos_cache[t] for t in need if pos_cache[t] is not None}
    allowed: np.ndarray | None = None
    for p in phrases:
        m = _phrase_match_docs(p, tp)
        allowed = m if allowed is None else np.intersect1d(allowed, m, assume_unique=True)
    banned_parts = [_phrase_match_docs(p, tp) for p in neg_phrases]
    banned = (
        np.unique(np.concatenate(banned_parts))
        if banned_parts
        else np.empty(0, dtype=np.int64)
    )
    return allowed, banned


def _extended_search(
    query: str,
    meta: IndexMeta,
    files: list[str],
    k: int,
    mode: str,
    pos_cache: dict,
    score_unsorted,
    filesystem=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Quoted-phrase grammar core shared by every serving path: rank the
    base query (via ``score_unsorted(base) -> unsorted (docs, scores)``),
    filter to the phrase match sets BEFORE the top-k sort (scores are
    restriction-independent, so filtering commutes with ranking), then
    sort+truncate. Raises ValueError on a non-positional index — quoted
    phrases are a capability the index must carry."""
    inc, exc, phrases, neg_phrases = parse_query_full(query)
    base = " ".join(inc + [f"-{t}" for t in exc])
    if not (phrases or neg_phrases):
        uniq, scores = score_unsorted(base)
        return _topk(uniq, scores, k)
    if not meta.has_positions:
        raise ValueError(
            "quoted phrases need a positional index: "
            "build_index(..., positions=True)"
        )
    uniq, scores = score_unsorted(base)
    allowed, ph_banned = _phrase_filter_sets(
        phrases, neg_phrases, pos_cache, files, filesystem
    )
    keep = np.ones(len(uniq), dtype=bool)
    if allowed is not None:
        keep &= np.isin(uniq, allowed)
    if len(ph_banned):
        keep &= ~np.isin(uniq, ph_banned)
    return _topk(uniq[keep], scores[keep], k)


def _phrase_topk(
    phrase_terms: list[str],
    tp: dict[str, "TermPositions"],
    meta: IndexMeta,
    k: int,
    banned: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Shared phrase evaluation core: AND-intersect (rarest first),
    adjacency verify on position lists, deterministic BM25 over matches.
    Returns (doc_ids, scores) sorted (score desc, doc asc), top-k."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    uniq_terms = sorted(set(phrase_terms))
    matched_arr = _phrase_match_docs(phrase_terms, tp)
    if len(matched_arr) == 0:
        return empty
    if len(banned):
        matched_arr = matched_arr[~np.isin(matched_arr, banned)]
        if len(matched_arr) == 0:
            return empty
    scores = np.zeros(len(matched_arr), dtype=np.float64)
    for t in uniq_terms:
        df = int(len(tp[t].docs))
        w = math.log(1.0 + (meta.n_docs - df + 0.5) / (df + 0.5))
        sel = np.searchsorted(tp[t].docs, matched_arr)
        tf = tp[t].tfs[sel].astype(np.float64)
        dl = tp[t].dls[sel].astype(np.float64)
        scores += w * _bm25_norm(tf, dl, meta)
    order = np.lexsort((matched_arr, -scores))[:k]
    return matched_arr[order], scores[order]


def _empty_phrase_result() -> pa.Table:
    return pa.table(
        {
            "rank": pa.array([], type=pa.int32()),
            "doc_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )


def _bm25_norm(tf: np.ndarray, dl: np.ndarray, meta: IndexMeta) -> np.ndarray:
    """The tf-normalization factor, operation order matching golden.py."""
    return tf * (meta.k1 + 1.0) / (
        tf + meta.k1 * (1.0 - meta.b + meta.b * dl / meta.avgdl)
    )


def score_query_blockmax(
    query: str,
    postings: dict[str, list[tuple]],
    dfs: dict[str, int],
    meta: IndexMeta,
    k: int = 10,
    mode: str = "or",
    banned: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max-pruned BM25 top-k — rank-identical to :func:`score_query`.

    Vectorized document-at-a-time variant of block-max WAND (Ding &
    Suel '11), restructured for numpy instead of per-posting cursors:

    1. θ := kth-best PARTIAL score over the highest-idf term's postings —
       partial scores lower-bound those docs' totals, so θ lower-bounds
       the true kth-best total.
    2. Per-doc upper bound := scatter-add of per-BLOCK impact bounds
       ``idf · norm(max_tf, min_dl)`` (the codec's block-max metadata;
       valid because the BM25 impact is ↑ in tf and ↓ in dl). Blocks are
       the codec's 128-posting skip units, so this pass touches one cheap
       precomputed bound per posting instead of the float-division chain.
    3. Exact-score only docs whose bound ≥ θ (same deterministic
       sorted-term accumulation as the exhaustive path).

    AND mode intersects posting lists first (semi-join via
    ``np.searchsorted`` against the rarest term — the reference's
    conjunctive short-circuit, cli.rs:405-408) and then scores exactly;
    block-max pruning applies to the OR path where the candidate set is
    the union.
    """
    terms, excluded = parse_query(query)
    if excluded or (banned is not None and len(banned) > 0):
        # masking banned docs breaks block-skip alignment; negation and
        # tombstoned queries take the exhaustive (still exact) path
        return score_query(query, postings, dfs, meta, k, mode, banned)
    present = [t for t in terms if postings.get(t)]
    if not present:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    # small posting sets score faster exhaustively (the θ/bound passes are
    # pure overhead until pruning has enough volume to bite); both paths
    # are exact, so this is a cost choice, not a semantics one
    if mode == "or" and sum(dfs[t] for t in present) < EXHAUSTIVE_CUTOFF:
        return score_query(query, postings, dfs, meta, k, mode)

    def idf(t: str) -> float:
        df = dfs[t]
        return math.log(1.0 + (meta.n_docs - df + 0.5) / (df + 0.5))

    def frag_arrays(t: str):
        for frag in postings[t]:
            yield frag[0], frag[1], frag[2], frag[3], frag[4]

    if mode == "and":
        if len(present) < len(terms):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        # intersect: start from the rarest term's doc set
        rare = min(present, key=lambda t: dfs[t])
        cand = np.concatenate([f[0] for f in postings[rare]])
        cand.sort()
        for t in present:
            if t == rare:
                continue
            docs_t = np.concatenate([f[0] for f in postings[t]])
            docs_t.sort()
            if len(docs_t) == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
            idx = np.searchsorted(docs_t, cand)
            valid = idx < len(docs_t)
            match = np.zeros(len(cand), dtype=bool)
            match[valid] = docs_t[idx[valid]] == cand[valid]
            cand = cand[match]
            if len(cand) == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        keep_set = cand
    else:
        # θ from the single highest-idf term (cheap, exact partial scores)
        lead = max(present, key=idf)
        w = idf(lead)
        lead_scores = np.concatenate(
            [
                w * _bm25_norm(tf.astype(np.float64), dl.astype(np.float64), meta)
                for _, tf, dl, _, _ in frag_arrays(lead)
            ]
        )
        if len(lead_scores) > k:
            theta = float(np.partition(lead_scores, -k)[-k])
        else:
            theta = 0.0
        # per-doc upper bound via block-max metadata
        doc_parts, ub_parts = [], []
        for t in present:
            w_t = idf(t)
            for doc_ids, tf, dl, bmax_tf, bmin_dl in frag_arrays(t):
                block_ub = w_t * _bm25_norm(
                    bmax_tf.astype(np.float64), bmin_dl.astype(np.float64), meta
                )
                n = len(doc_ids)
                n_blocks = len(block_ub)
                reps = np.full(n_blocks, meta_block(meta), dtype=np.int64)
                if n_blocks:
                    reps[-1] = n - (n_blocks - 1) * meta_block(meta)
                doc_parts.append(doc_ids)
                ub_parts.append(np.repeat(block_ub, reps))
        docs = np.concatenate(doc_parts)
        ubs = np.concatenate(ub_parts)
        uniq, inverse = np.unique(docs, return_inverse=True)
        bound = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(bound, inverse, ubs)
        keep_set = uniq[bound >= theta] if theta > 0.0 else uniq

    if len(keep_set) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    # exact scoring restricted to keep_set (deterministic term order)
    doc_parts, contrib_parts = [], []
    for t in present:
        w_t = idf(t)
        for doc_ids, tf, dl, _, _ in frag_arrays(t):
            sel = np.searchsorted(keep_set, doc_ids)
            valid = sel < len(keep_set)
            mask = np.zeros(len(doc_ids), dtype=bool)
            mask[valid] = keep_set[sel[valid]] == doc_ids[valid]
            if not mask.any():
                continue
            contrib = w_t * _bm25_norm(
                tf[mask].astype(np.float64), dl[mask].astype(np.float64), meta
            )
            doc_parts.append(doc_ids[mask])
            contrib_parts.append(contrib)
    if not doc_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    docs = np.concatenate(doc_parts)
    contribs = np.concatenate(contrib_parts)
    uniq, inverse = np.unique(docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inverse, contribs)
    order = np.lexsort((uniq, -scores))[:k]
    return uniq[order].astype(np.int64), scores[order]


def meta_block(meta: IndexMeta) -> int:
    return meta.block_size


def _filter_excluded(
    postings: dict[str, list],
    inc: list[str],
    exc: list[str],
    extra_banned: np.ndarray | None = None,
) -> dict[str, list]:
    """Drop postings of banned docs (docs containing any excluded term,
    plus ``extra_banned`` ids — tombstoned docs).

    Returns 3-tuple fragments only: masking invalidates block-skip
    alignment, so negation queries score exhaustively (still exact).
    """
    has_extra = extra_banned is not None and len(extra_banned) > 0
    if not exc and not has_extra:
        return postings
    ban_parts = [f[0] for t in exc for f in postings.get(t, ())]
    if has_extra:
        ban_parts.append(np.asarray(extra_banned, dtype=np.int64))
    if not ban_parts:
        return {t: postings[t] for t in inc if postings.get(t)}
    banned = np.unique(np.concatenate(ban_parts))
    out: dict[str, list] = {}
    for t in inc:
        kept = []
        for frag in postings.get(t, ()):
            doc_ids = frag[0]
            sel = np.searchsorted(banned, doc_ids)
            valid = sel < len(banned)
            is_banned = np.zeros(len(doc_ids), dtype=bool)
            is_banned[valid] = banned[sel[valid]] == doc_ids[valid]
            if is_banned.all():
                continue
            m = ~is_banned
            kept.append((frag[0][m], frag[1][m], frag[2][m]))
        if kept:
            out[t] = kept
    return out


def _accumulate_scores(
    doc_parts: list[np.ndarray],
    contrib_parts: list[np.ndarray],
    n_terms: int,
    mode: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Unsorted (docs, scores) accumulation shared by every scoring path:
    concat per-term (docs, contribs) parts in sorted-term order,
    scatter-add per doc, AND-filter on hit count."""
    if not doc_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    docs = np.concatenate(doc_parts)
    contribs = np.concatenate(contrib_parts)
    uniq, inverse = np.unique(docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inverse, contribs)  # in concatenation (= term) order
    if mode == "and" and n_terms:
        hits = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(hits, inverse, 1)
        keep = hits == n_terms
        uniq, scores = uniq[keep], scores[keep]
    return uniq.astype(np.int64), scores


def _topk(
    uniq: np.ndarray, scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    if len(uniq) == 0:
        return uniq, scores
    order = np.lexsort((uniq, -scores))[:k]
    return uniq[order], scores[order]


def _accumulate_topk(
    doc_parts: list[np.ndarray],
    contrib_parts: list[np.ndarray],
    n_terms: int,
    k: int,
    mode: str,
) -> tuple[np.ndarray, np.ndarray]:
    """The bit-identity-critical scoring tail shared by score_query and
    the contribution-cache paths: :func:`_accumulate_scores` + (score
    desc, doc asc) top-k."""
    return _topk(*_accumulate_scores(doc_parts, contrib_parts, n_terms, mode), k)


def _build_term_contribs(
    frags: list, df: int, meta: IndexMeta
) -> tuple[np.ndarray, np.ndarray]:
    """One term's concatenated (docs, idf·norm contributions) over its
    LazyPostings fragments — the cacheable per-term scoring state (same
    expression and operation order as score_query, so cached values are
    bit-identical to a fresh computation)."""
    w = math.log(1.0 + (meta.n_docs - df + 0.5) / (df + 0.5))
    doc_parts, contrib_parts = [], []
    for f in frags:
        docs_f, tfs_f, dls_f = f.decode_all()
        doc_parts.append(docs_f)
        contrib_parts.append(
            w * _bm25_norm(tfs_f.astype(np.float64), dls_f.astype(np.float64), meta)
        )
    return np.concatenate(doc_parts), np.concatenate(contrib_parts)


def _contrib_scores_unsorted(
    terms: list[str],
    cache: dict,
    postings: dict[str, list],
    dfs: dict[str, int],
    meta: IndexMeta,
    mode: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Unsorted (docs, scores) from per-term cached contributions,
    filling cache misses from ``postings``/``dfs``."""
    doc_parts, contrib_parts = [], []
    for term in terms:  # sorted unique (parse_query contract)
        c = cache.get(term)
        if c is None:
            frags = postings.get(term)
            if not frags:
                continue
            c = _build_term_contribs(frags, dfs[term], meta)
            cache[term] = c
        doc_parts.append(c[0])
        contrib_parts.append(c[1])
    return _accumulate_scores(doc_parts, contrib_parts, len(terms), mode)


def _score_from_contrib_cache(
    terms: list[str],
    cache: dict,
    postings: dict[str, list],
    dfs: dict[str, int],
    meta: IndexMeta,
    k: int,
    mode: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Score a no-negation query from per-term cached contributions,
    filling cache misses from ``postings``/``dfs``."""
    return _topk(
        *_contrib_scores_unsorted(terms, cache, postings, dfs, meta, mode), k
    )


def score_query_unsorted(
    query: str,
    postings: dict[str, list[tuple[np.ndarray, np.ndarray, np.ndarray]]],
    dfs: dict[str, int],
    meta: IndexMeta,
    mode: str = "or",
    banned: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exhaustive vectorized BM25 WITHOUT the top-k sort — the full
    unsorted (doc_ids, scores) candidate set (extended-grammar callers
    filter before sorting)."""
    terms, excluded = parse_query(query)
    postings = _filter_excluded(postings, terms, excluded, banned)
    doc_parts: list[np.ndarray] = []
    contrib_parts: list[np.ndarray] = []
    for term in terms:
        frags = postings.get(term)
        if not frags:
            continue
        df = dfs[term]
        # math.log, not np.log: they can differ by 1 ulp, and the contract
        # is exact float64 equality with golden.py
        idf = math.log(1.0 + (meta.n_docs - df + 0.5) / (df + 0.5))
        for frag in frags:
            doc_ids, tfs, dls = frag[0], frag[1], frag[2]
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            # operation order mirrors golden.py exactly (float64 IEEE):
            norm = tf * (meta.k1 + 1.0) / (
                tf + meta.k1 * (1.0 - meta.b + meta.b * dl / meta.avgdl)
            )
            doc_parts.append(doc_ids)
            contrib_parts.append(idf * norm)
    return _accumulate_scores(doc_parts, contrib_parts, len(terms), mode)




def score_query(
    query: str,
    postings: dict[str, list[tuple[np.ndarray, np.ndarray, np.ndarray]]],
    dfs: dict[str, int],
    meta: IndexMeta,
    k: int = 10,
    mode: str = "or",
    banned: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exhaustive vectorized BM25; returns (top_doc_ids, top_scores).

    ``banned``: sorted tombstoned doc ids, masked out before scoring."""
    return _topk(
        *score_query_unsorted(query, postings, dfs, meta, mode, banned), k
    )


def search_index(
    index_dir: str,
    query: str,
    k: int = 10,
    mode: str = "or",
    blockmax: bool = True,
    filesystem=None,
) -> pa.Table:
    """One-shot search (driver-side). Returns (rank, doc_id, score)."""
    meta = IndexMeta.load(index_dir, filesystem=filesystem)
    files = _postings_files(index_dir, meta.num_shards, filesystem)
    inc, exc, phrases, neg_phrases = parse_query_full(query)
    terms = sorted(set(inc) | set(exc))
    postings = load_postings_lazy(files, terms, meta.block_size, filesystem)
    dfs = global_dfs_lazy(postings)
    from lsearch_ray.index.tombstones import load_tombstones

    banned = load_tombstones(index_dir, filesystem=filesystem)
    if phrases or neg_phrases:
        doc_ids, scores = _extended_search(
            query,
            meta,
            files,
            k,
            mode,
            {},
            lambda base: score_query_unsorted(
                base, _eager5(postings), dfs, meta, mode, banned
            ),
            filesystem,
        )
    elif blockmax:
        doc_ids, scores = score_query_blockmax_lazy(
            query, postings, dfs, meta, k, mode, banned
        )
    else:
        doc_ids, scores = score_query(
            query, _eager5(postings), dfs, meta, k, mode, banned
        )
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(doc_ids) + 1), type=pa.int32()),
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    )


def _assemble_topk(
    out_qid: list[int],
    out_rank: list[np.ndarray],
    out_doc: list[np.ndarray],
    out_score: list[np.ndarray],
) -> pa.Table:
    """Shared (query_id, rank, doc_id, score) output table for the
    streaming searchers — one schema for every serving path."""
    return pa.table(
        {
            "query_id": pa.array(out_qid, type=pa.int64()),
            "rank": pa.array(
                np.concatenate(out_rank) if out_rank else np.empty(0, np.int64),
                type=pa.int32(),
            ),
            "doc_id": pa.array(
                np.concatenate(out_doc) if out_doc else np.empty(0, np.int64),
                type=pa.int64(),
            ),
            "score": pa.array(
                np.concatenate(out_score) if out_score else np.empty(0),
                type=pa.float64(),
            ),
        }
    )


class BatchSearcher:
    """``map_batches`` actor: stream a query table through the index.

    Input batch: columns (query_id:int64, query:string, ...). Output:
    (query_id, rank, doc_id, score) — top-k rows per query.

    Per batch, one pushdown read fetches the UNION of the batch's terms
    across shards — IO amortizes over the batch. Index metadata loads once
    per actor in ``__init__``.

    Throughput design: with ``cache_contribs=True`` (default) each term's
    per-posting BM25 contribution ``idf·norm(tf, dl)`` is computed ONCE
    per actor and reused across queries — an OR/AND query is then just a
    scatter-add of cached float arrays + top-k (the norm chain and block
    decoding amortize away; score bit-identity with score_query holds
    because the cached values use the exact same expression and the
    accumulation keeps sorted-term order). Queries with negation, and any
    query on a tombstoned index, take the general path. Memory: ~16 bytes
    × df per cached term (the in-memory-serving tradeoff; bounded by
    ``max_cached_terms``).
    """

    def __init__(
        self,
        index_dir: str,
        k: int = 10,
        mode: str = "or",
        max_cached_terms: int = 50_000,
        cache_contribs: bool = True,
        filesystem=None,
    ):
        # one fs instance per actor (pyarrow FileSystems pickle through
        # fn_constructor_kwargs); None = plain local paths, unchanged
        self.fs = filesystem
        self.meta = IndexMeta.load(index_dir, filesystem=filesystem)
        self.files = _postings_files(index_dir, self.meta.num_shards, filesystem)
        from lsearch_ray.index.tombstones import load_tombstones

        self.banned = load_tombstones(index_dir, filesystem=filesystem)
        self.k = k
        self.mode = mode
        # per-actor posting cache: term -> fragments ([] = known-absent).
        # Zipf-distributed query terms hit this hard; bounded by term count.
        self.cache: dict[str, list] = {}
        self.max_cached_terms = max_cached_terms
        self.cache_contribs = cache_contribs
        self._contrib: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._pos_cache: dict = {}

    def _postings_cached(self, terms: list[str]) -> dict[str, list]:
        misses = [t for t in terms if t not in self.cache]
        if misses:
            loaded = load_postings_lazy(
                self.files, misses, self.meta.block_size, self.fs
            )
            if len(self.cache) + len(misses) > self.max_cached_terms:
                # evict everything NOT needed by this batch (wholesale
                # clear would drop this batch's already-cached terms and
                # KeyError below)
                keep = set(terms)
                self.cache = {t: v for t, v in self.cache.items() if t in keep}
                self._contrib = {
                    t: v for t, v in self._contrib.items() if t in keep
                }
                self._pos_cache = {
                    t: v for t, v in self._pos_cache.items() if t in keep
                }
            for t in misses:
                self.cache[t] = loaded.get(t, [])
        return {t: self.cache[t] for t in terms if self.cache[t]}

    def _score_cached(
        self, query: str, postings: dict[str, list], dfs: dict[str, int]
    ) -> tuple[np.ndarray, np.ndarray]:
        """score_query semantics via the shared per-term contribution
        cache (OR/AND, no negation, no tombstones)."""
        terms, _ = parse_query(query)
        return _score_from_contrib_cache(
            terms, self._contrib, postings, dfs, self.meta, self.k, self.mode
        )

    def _search_extended(
        self, query: str, postings: dict[str, list], dfs: dict[str, int]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Quoted-phrase grammar via the shared _extended_search core;
        base scoring goes through the per-term contribution cache when
        its preconditions hold (no negation, no tombstones)."""

        def score_unsorted(base: str) -> tuple[np.ndarray, np.ndarray]:
            terms, excluded = parse_query(base)
            if (
                self.cache_contribs
                and not excluded
                and len(self.banned) == 0
            ):
                return _contrib_scores_unsorted(
                    terms, self._contrib, postings, dfs, self.meta, self.mode
                )
            return score_query_unsorted(
                base,
                _eager5(postings, set(terms) | set(excluded)),
                dfs,
                self.meta,
                self.mode,
                self.banned,
            )

        return _extended_search(
            query,
            self.meta,
            self.files,
            self.k,
            self.mode,
            self._pos_cache,
            score_unsorted,
            self.fs,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        queries = batch["query"].to_pylist()
        qids = batch["query_id"].to_pylist()
        all_terms = sorted(
            {t for q in queries for side in parse_query(q) for t in side}
        )
        postings = self._postings_cached(all_terms)
        dfs = global_dfs_lazy(postings)
        out_qid: list[int] = []
        out_rank: list[np.ndarray] = []
        out_doc: list[np.ndarray] = []
        out_score: list[np.ndarray] = []
        use_cached = self.cache_contribs and len(self.banned) == 0
        for qid, q in zip(qids, queries):
            if '"' in q:
                doc_ids, scores = self._search_extended(q, postings, dfs)
            elif use_cached and not parse_query(q)[1]:  # no negation
                doc_ids, scores = self._score_cached(q, postings, dfs)
            else:
                doc_ids, scores = score_query_blockmax_lazy(
                    q, postings, dfs, self.meta, self.k, self.mode, self.banned
                )
            out_qid.extend([qid] * len(doc_ids))
            out_rank.append(np.arange(1, len(doc_ids) + 1))
            out_doc.append(doc_ids)
            out_score.append(scores)
        return _assemble_topk(out_qid, out_rank, out_doc, out_score)


def route_queries_by_head_term(
    queries_ds,
    *,
    num_routes: int = 8,
    query_col: str = "query",
    index_dir: str | None = None,
    hot_df_fraction: float = 0.01,
    filesystem=None,
):
    """Term-affinity routing for the streaming BatchSearcher path.

    Without routing, a tail term's postings (and its per-term
    contribution cache) are re-loaded and re-computed in EVERY actor of
    the pool — with N actors each term costs up to N loads. This stage
    keys each query by the hash of its head term and sorts the query
    stream on that key: queries sharing a head term become contiguous,
    land in the same batches and therefore the same actor, and each
    actor's caches cover a slice of the term space instead of all of it.

    Skew guard (measured: naive head-term routing is 2× SLOWER on a
    Zipf workload — the hot heads concentrate most of the stream onto
    one actor): when ``index_dir`` is given, terms whose df exceeds
    ``hot_df_fraction`` of the corpus are classed HOT and their queries
    are spread round-robin by query hash instead — a hot term's
    postings end up cached in every actor regardless, so spreading them
    loses no affinity while removing the straggler. Tail terms (the
    actual re-load cost) keep affinity.

    The sort is a shuffle of the QUERY table only (tiny rows — never
    the index), and per-query results are unchanged (rank-identity is
    pytest-gated); only the stream order differs, which ``query_id``
    already disambiguates. Compose as::

        route_queries_by_head_term(queries_ds, num_routes=pool_size,
                                   index_dir=index_dir)
            .map_batches(BatchSearcher, ...)
    """
    from lsearch_ray.corpus import fnv1a64

    hot: set[str] = set()
    if index_dir is not None:
        meta = IndexMeta.load(index_dir, filesystem=filesystem)
        ts_path = (
            os.path.join(index_dir, "termstats")
            if filesystem is None
            else fsio.join(index_dir, "termstats")
        )
        ts = fsio.pq_read(filesystem, ts_path, columns=["term", "df"])
        dfs = ts["df"].to_numpy(zero_copy_only=False)
        thresh = max(1.0, hot_df_fraction * meta.n_docs)
        hot = set(
            ts["term"].combine_chunks().filter(pa.array(dfs >= thresh)).to_pylist()
        )

    def add_route(b: pa.Table) -> pa.Table:
        heads = []
        spread = np.zeros(b.num_rows, dtype=bool)
        for i, q in enumerate(b[query_col].to_pylist()):
            inc, exc = parse_query(q)
            toks = inc or exc
            head = toks[0] if toks else ""
            heads.append(head)
            if head in hot:
                spread[i] = True
        h = fnv1a64(pa.array(heads, type=pa.large_string())).astype(np.uint64)
        if spread.any():
            # spread key: query_id when present (duplicate hot queries
            # then spread too), else the query string's hash
            if "query_id" in b.column_names:
                qid = fnv1a64(
                    pc.cast(b["query_id"], pa.large_string())
                ).astype(np.uint64)
            else:
                qid = fnv1a64(
                    pc.cast(b[query_col], pa.large_string())
                ).astype(np.uint64)
            h = np.where(spread, qid, h)
        return b.append_column(
            "__route",
            pa.array((h % np.uint64(num_routes)).astype(np.int64)),
        )

    return queries_ds.map_batches(add_route, batch_format="pyarrow").sort(
        "__route"
    )


class BatchPhraseSearcher:
    """``map_batches`` actor for streaming PHRASE queries through a
    positional index — the distributed counterpart of :func:`phrase_search`
    (which is driver-side, for tests/one-shots).

    Input batch: (query_id:int64, phrase:string) — or the BatchSearcher
    schema (query_id, query), so one query table can drive either path
    (the tokenizer strips quote characters, so quoted phrases pass
    through unchanged). Output: the shared (query_id, rank, doc_id,
    score) schema, top-k rows per phrase. Positional postings for the
    batch's term union load once per batch (pushdown) and cache per
    actor; tombstoned docs are masked.
    """

    def __init__(
        self,
        index_dir: str,
        k: int = 10,
        max_cached_terms: int = 50_000,
        filesystem=None,
    ):
        self.fs = filesystem
        self.meta = IndexMeta.load(index_dir, filesystem=filesystem)
        if not self.meta.has_positions:
            raise ValueError(
                "BatchPhraseSearcher needs a positional index: "
                "build_index(..., positions=True)"
            )
        self.index_dir = index_dir
        self.files = _postings_files(index_dir, self.meta.num_shards, filesystem)
        from lsearch_ray.index.tombstones import load_tombstones

        self.banned = load_tombstones(index_dir, filesystem=filesystem)
        self.k = k
        self.cache: dict[str, TermPositions | None] = {}
        self.max_cached_terms = max_cached_terms

    def _positions_cached(self, terms: list[str]) -> dict[str, TermPositions]:
        misses = [t for t in terms if t not in self.cache]
        if misses:
            loaded = load_postings_with_positions(self.files, misses, self.fs)
            if len(self.cache) + len(misses) > self.max_cached_terms:
                keep = set(terms)
                self.cache = {t: v for t, v in self.cache.items() if t in keep}
            for t in misses:
                self.cache[t] = loaded.get(t)
        return {t: self.cache[t] for t in terms if self.cache[t] is not None}

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = "phrase" if "phrase" in batch.column_names else "query"
        phrases = batch[col].to_pylist()
        qids = batch["query_id"].to_pylist()
        all_terms = sorted({t for p in phrases for t in tokenize(p)})
        tp = self._positions_cached(all_terms)
        out_qid: list[int] = []
        out_rank: list[np.ndarray] = []
        out_doc: list[np.ndarray] = []
        out_score: list[np.ndarray] = []
        for qid, p in zip(qids, phrases):
            docs, scores = _phrase_topk(
                tokenize(p), tp, self.meta, self.k, self.banned
            )
            out_qid.extend([qid] * len(docs))
            out_rank.append(np.arange(1, len(docs) + 1))
            out_doc.append(docs)
            out_score.append(scores)
        return _assemble_topk(out_qid, out_rank, out_doc, out_score)


class _ShardGroupSearcher:
    """Holds a group of shards in memory (encoded); answers per-group
    top-k. Wrapped as a Ray actor by :class:`QueryEngine`.

    Global dfs load ONCE per actor from the index's termstats table (the
    finalize-time per-shard df aggregate — exactly the sums a per-query
    gather would produce), so idf matches golden without a df round-trip
    per query; plain OR/AND queries score through a per-term contribution
    cache (the BatchSearcher trick — resident postings amortize the norm
    chain), everything else through the lazy block-max path."""

    def __init__(self, index_dir: str, shard_ids: list[int], filesystem=None):
        self.fs = filesystem
        self.meta = IndexMeta.load(index_dir, filesystem=filesystem)
        from lsearch_ray.index.tombstones import load_tombstones

        self.banned = load_tombstones(
            index_dir, shard_ids, filesystem=filesystem
        )
        # this group's shard files only: doc-sharding keeps every match
        # of a doc local, so phrase evaluation per group is complete
        all_files = _postings_files(
            index_dir, self.meta.num_shards, filesystem
        )
        self.files = [all_files[s] for s in shard_ids]
        self._pos_cache: dict = {}
        # resident ENCODED: ~3-4× smaller than decoded arrays (varint),
        # and queries decode only the blocks their θ bound admits
        self.postings: dict[str, list[LazyPostings]] = {}
        for fpath in self.files:
            t = fsio.pq_read(filesystem, fpath, columns=_LAZY_COLS)
            if t.num_rows:
                _lazy_rows(
                    t,
                    self.meta.block_size,
                    self.postings,
                    _doc_table_for(fpath, filesystem),
                )
        ts_path = (
            os.path.join(index_dir, "termstats")
            if filesystem is None
            else fsio.join(index_dir, "termstats")
        )
        ts = fsio.pq_read(filesystem, ts_path)
        self.global_dfs_all: dict[str, int] = dict(
            zip(ts["term"].to_pylist(), ts["df"].to_pylist())
        )
        self._contrib: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def local_dfs(self, terms: list[str]) -> dict[str, int]:
        return {
            t: sum(f.df for f in self.postings.get(t, ())) for t in terms
        }

    def search(
        self, query: str, k: int, mode: str
    ) -> tuple[np.ndarray, np.ndarray]:
        # dfs are GLOBAL (termstats) so idf matches golden; doc-sharding
        # makes local scores complete → local top-k is exact.
        if '"' in query:
            if len(self._pos_cache) > 50_000:
                # long-lived actor: bound the positional cache like
                # BatchSearcher bounds its caches
                self._pos_cache.clear()
            return _extended_search(
                query,
                self.meta,
                self.files,
                k,
                mode,
                self._pos_cache,
                lambda base: self._score_unsorted(base, mode),
                self.fs,
            )
        terms, excluded = parse_query(query)
        if not excluded and len(self.banned) == 0:
            return _score_from_contrib_cache(
                terms,
                self._contrib,
                self.postings,
                self.global_dfs_all,
                self.meta,
                k,
                mode,
            )
        dfs = {
            t: self.global_dfs_all.get(t, 0)
            for t in set(terms) | set(excluded)
        }
        return score_query_blockmax_lazy(
            query, self.postings, dfs, self.meta, k, mode, self.banned
        )

    def _score_unsorted(
        self, base: str, mode: str
    ) -> tuple[np.ndarray, np.ndarray]:
        terms, excluded = parse_query(base)
        if not excluded and len(self.banned) == 0:
            return _contrib_scores_unsorted(
                terms,
                self._contrib,
                self.postings,
                self.global_dfs_all,
                self.meta,
                mode,
            )
        dfs = {
            t: self.global_dfs_all.get(t, 0)
            for t in set(terms) | set(excluded)
        }
        return score_query_unsorted(
            base,
            _eager5(self.postings, set(terms) | set(excluded)),
            dfs,
            self.meta,
            mode,
            self.banned,
        )


class QueryEngine:
    """Scatter-gather BM25 serving over a pool of shard-holding actors.

    One scatter round per query: every actor holds the index's GLOBAL
    (term, df) table (termstats) so idf needs no gather phase; actors
    return exact per-group top-k (doc-sharding makes local scores
    complete), merged by (score desc, doc_id asc). Uses raw
    ``@ray.remote`` actors — the long-lived shared in-memory index is the
    one stage Dataset transforms can't express (SURVEY.md §4).
    """

    def __init__(self, index_dir: str, num_actors: int = 4, filesystem=None):
        import ray

        self.meta = IndexMeta.load(index_dir, filesystem=filesystem)
        shards = list(range(self.meta.num_shards))
        num_actors = max(1, min(num_actors, len(shards)))
        groups = [shards[i::num_actors] for i in range(num_actors)]
        actor_cls = ray.remote(_ShardGroupSearcher)
        self.actors = [
            actor_cls.remote(index_dir, g, filesystem) for g in groups if g
        ]

    def search(self, query: str, k: int = 10, mode: str = "or") -> pa.Table:
        import ray

        # single scatter round: actors hold the GLOBAL termstats dfs, so
        # no per-query df gather is needed
        results = ray.get(
            [a.search.remote(query, k, mode) for a in self.actors]
        )
        docs, scores = self._merge(results, k)
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(docs) + 1), type=pa.int32()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )

    @staticmethod
    def _merge(results, k: int) -> tuple[np.ndarray, np.ndarray]:
        docs = (
            np.concatenate([r[0] for r in results])
            if results
            else np.empty(0, np.int64)
        )
        scores = (
            np.concatenate([r[1] for r in results]) if results else np.empty(0)
        )
        order = np.lexsort((docs, -scores))[:k]
        return docs[order].astype(np.int64), scores[order]

    def search_many(
        self, queries: list[str], k: int = 10, mode: str = "or"
    ) -> pa.Table:
        """Batch serving: every (query, actor) scatter call in flight at
        once (actors hold global termstats dfs — no gather round);
        per-query merge. Returns (query_id, rank, doc_id, score)."""
        import ray

        futures = [
            [a.search.remote(q, k, mode) for a in self.actors]
            for q in queries
        ]
        out_qid: list[int] = []
        parts_docs: list[np.ndarray] = []
        parts_scores: list[np.ndarray] = []
        parts_rank: list[np.ndarray] = []
        for qid, futs in enumerate(futures):
            docs, scores = self._merge(ray.get(futs), k)
            out_qid.extend([qid] * len(docs))
            parts_docs.append(docs)
            parts_scores.append(scores)
            parts_rank.append(np.arange(1, len(docs) + 1))
        return pa.table(
            {
                "query_id": pa.array(out_qid, type=pa.int64()),
                "rank": pa.array(
                    np.concatenate(parts_rank) if parts_rank else np.empty(0),
                    type=pa.int32(),
                ),
                "doc_id": pa.array(
                    np.concatenate(parts_docs) if parts_docs else np.empty(0),
                    type=pa.int64(),
                ),
                "score": pa.array(
                    np.concatenate(parts_scores) if parts_scores else np.empty(0),
                    type=pa.float64(),
                ),
            }
        )
