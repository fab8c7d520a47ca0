"""Distributed inverted-index build: docs → sharded triples → postings.

Pipeline (north star; generalizes the reference's per-record count pass,
``More`` at search.rs:267-283, into an index build):

**Stage A — map (stateless, streaming).**
``map_batches(TriplesWithShard)`` over zero-copy Arrow batches tokenizes
each document and emits ``(term, doc_id, tf, dl, shard)`` triples;
``shard = mix64(doc_id) % num_shards`` — **doc-sharded**: every posting of
a document lands in one shard, so each shard is a complete self-contained
index over its subset of docs, per-shard top-k is exact, and partitioning
is keyed by the *uniform* doc-hash — head-term (Zipf) skew cannot
unbalance it (for raw term-keyed groupbys see
``lsearch_ray.functions.skew``). The stage is a fused
``map_batches(TriplesPartitionedWriter)``: each task tokenizes its batch
and writes the per-shard slices straight into per-shard directories with
idempotent filenames. This is an **external (disk) shuffle** — no
all-to-all through the object store, each map task writes only its own
files, and the partitioned triples directory doubles as the mid-build
checkpoint. (Ray's sort-based groupby shuffle was measured 5-10× slower
here and scaled poorly across CPU counts; the hash-shuffle strategy
deadlocks under small CPU budgets in local mode; Dataset.write_parquet
with partition_cols was several× slower than the fused writer.)

**Stage B — per-shard encode (embarrassingly parallel).**
One Ray task per shard reads only its partition, sorts by (term, doc_id)
(a total order → byte-deterministic output regardless of file arrival
order), encodes ALL posting lists in one vectorized pass (codec.py), and
commits atomically (tmp + rename, manifest last). Raw ``@ray.remote``
tasks are used instead of a Dataset stage because the work is already
partitioned on disk — re-reading it through a Dataset would only re-invent
the per-shard task. Re-running a failed build skips the triples stage if
its completion marker exists and re-encodes only shards without a
committed manifest (**resumable from checkpoint, per-partition lineage**).

**Finalize.** Global doc stats (N, avgdl) summed from shard manifests;
global ``(term, df)`` table via a pre-aggregated groupby over per-shard df
rows (≤ num_shards rows per term — no skew possible); ``meta.json``.

Scale notes: ``num_shards`` bounds stage-B task memory (a shard's triples
must fit one task — at 10^12 docs pick shards of a few GB each); stage A
is a streaming stateless map and never materializes the corpus; stage-A
output is compressed parquet (~2-3× smaller than raw triples).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lsearch_ray.analyzer import term_counts_table
from lsearch_ray.index import fsio
from lsearch_ray.index.codec import (
    DEFAULT_BLOCK_SIZE,
    _empty_postings_table,
    encode_shard_postings,
)

K1 = 1.2
B = 0.75
_MIX = np.uint64(0x9E3779B97F4A7C15)


def shard_of(doc_ids: np.ndarray, num_shards: int) -> np.ndarray:
    """Multiplicative-hash shard assignment (balances sequential ids)."""
    h = (doc_ids.astype(np.uint64) * _MIX) >> np.uint64(33)
    return (h % np.uint64(num_shards)).astype(np.int32)


class TriplesWithShard:
    """Batch transform: documents → doc-sharded tf triples."""

    def __init__(
        self,
        num_shards: int,
        text_col: str = "text",
        id_col: str = "doc_id",
        keep_shards: list[int] | None = None,
    ):
        self.num_shards = num_shards
        self.text_col = text_col
        self.id_col = id_col
        self.keep = (
            np.array(sorted(keep_shards), dtype=np.int32)
            if keep_shards is not None
            else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        triples = term_counts_table(batch, self.text_col, self.id_col)
        shard = shard_of(
            triples["doc_id"].to_numpy(zero_copy_only=False), self.num_shards
        )
        out = triples.append_column("shard", pa.array(shard, type=pa.int32()))
        if self.keep is not None:
            mask = np.isin(shard, self.keep)
            out = out.filter(pa.array(mask))
        return out


class TriplesPartitionedWriter:
    """Fused stage A: tokenize + shard + write per-shard parquet, one pass.

    Writes each batch's per-shard slices straight to
    ``triples_dir/shard=K/part-*.parquet`` from inside the task —
    measured several× faster than ``Dataset.write_parquet(partition_cols)``
    for many small partitions. Filenames derive from the batch's doc-id
    range, so a retried (identical-lineage) task overwrites its own files
    instead of duplicating rows; writes are tmp+rename atomic.
    """

    def __init__(
        self,
        triples_dir: str,
        num_shards: int,
        text_col: str = "text",
        id_col: str = "doc_id",
        keep_shards: list[int] | None = None,
        positions: bool = False,
        filesystem=None,
    ):
        self.triples_dir = triples_dir
        self.num_shards = num_shards
        self.text_col = text_col
        self.id_col = id_col
        self.positions = positions
        self.filesystem = filesystem
        self._fs = None  # resolved once per actor/task, not per batch
        self.keep = (
            np.array(sorted(keep_shards), dtype=np.int32)
            if keep_shards is not None
            else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        triples = term_counts_table(
            batch, self.text_col, self.id_col, positions=self.positions
        )
        # per-shard doc stats over ALL batch docs — token-less docs produce
        # no triples but must still count toward n_docs (BM25 idf/avgdl
        # parity with golden.py on corpora containing empty docs)
        all_ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        doc_shards = shard_of(all_ids, self.num_shards)
        if self.keep is not None:
            dmask = np.isin(doc_shards, self.keep)
            all_ids = all_ids[dmask]
            doc_shards = doc_shards[dmask]
        ndocs_per_shard = np.bincount(doc_shards, minlength=self.num_shards)

        doc_ids = triples["doc_id"].to_numpy(zero_copy_only=False)
        shard = shard_of(doc_ids, self.num_shards)
        if self.keep is not None:
            mask = np.isin(shard, self.keep)
            triples = triples.filter(pa.array(mask))
            shard = shard[mask]
            doc_ids = doc_ids[mask]
        dlsum_per_shard = np.zeros(self.num_shards, dtype=np.int64)
        if triples.num_rows:
            uq, ui = np.unique(doc_ids, return_index=True)
            dls = triples["dl"].to_numpy(zero_copy_only=False)[ui].astype(np.int64)
            np.add.at(dlsum_per_shard, shard_of(uq, self.num_shards), dls)
        if len(all_ids) == 0:
            return pa.table({"n_triples": pa.array([0], type=pa.int64())})
        # idempotent batch tag: doc-id range + row count identifies the
        # batch's lineage, so retries overwrite rather than duplicate
        tag = (
            f"{int(all_ids.min()):016x}-{int(all_ids.max()):016x}-{len(all_ids)}"
        )
        # ONE combined docstats file per batch at the triples root (a
        # per-shard sidecar would double the small-file count stage B pays
        # to open; these rows are tiny, so every encode task just reads
        # them all and filters its shard)
        present = np.flatnonzero(ndocs_per_shard)
        stats = pa.table(
            {
                "shard": pa.array(present.astype(np.int32), type=pa.int32()),
                "n_docs": pa.array(
                    ndocs_per_shard[present].astype(np.int64), type=pa.int64()
                ),
                "dl_sum": pa.array(
                    dlsum_per_shard[present].astype(np.int64), type=pa.int64()
                ),
            }
        )
        if self._fs is None:
            self._fs, self.triples_dir = fsio.resolve_fs(
                self.triples_dir, self.filesystem
            )
        fs = self._fs
        fsio.makedirs(fs, self.triples_dir)
        fsio.write_table(
            fs, fsio.join(self.triples_dir, f"docstats-{tag}.parquet"), stats
        )
        if triples.num_rows:
            order = np.argsort(shard, kind="stable")
            st = triples.take(pa.array(order))
            sv = shard[order]
            bounds = np.flatnonzero(np.diff(sv)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(sv)]))
            for s, e in zip(starts, ends):
                k = int(sv[s])
                sdir = fsio.join(self.triples_dir, f"shard={k}")
                fsio.makedirs(fs, sdir)
                fsio.write_table(
                    fs, fsio.join(sdir, f"part-{tag}.parquet"), st.slice(s, e - s)
                )
        return pa.table({"n_triples": pa.array([int(triples.num_rows)], type=pa.int64())})


def _shard_dir(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, f"shard={shard:05d}")


def shard_path(index_dir: str, shard: int, name: str = "", fs=None) -> str:
    """fs-aware path of a shard artifact (``name=""`` for the shard dir
    itself): THE single spelling of the ``shard={:05d}`` layout for both
    local paths and generic ``pyarrow.fs`` targets — merge, tombstones
    and compaction all route through it so the naming scheme cannot
    diverge between the two dispatches."""
    if fs is None:
        base = _shard_dir(index_dir, shard)
        return os.path.join(base, name) if name else base
    base = fsio.join(index_dir, f"shard={shard:05d}")
    return fsio.join(base, name) if name else base


def _manifest_path(index_dir: str, shard: int) -> str:
    return os.path.join(_shard_dir(index_dir, shard), "manifest.json")


def shard_complete(index_dir: str, shard: int, filesystem=None) -> bool:
    fs, path = fsio.resolve_fs(index_dir, filesystem)
    return fsio.exists(fs, fsio.join(path, f"shard={shard:05d}", "manifest.json"))


def encode_shard_table(
    group: pa.Table,
    index_dir: str,
    shard: int,
    block_size: int,
    doc_stats: tuple[int, int] | None = None,
    extra_manifest: dict | None = None,
    filesystem=None,
) -> dict:
    """Sort one shard's triples, encode, write atomically, commit manifest.

    The manifest is written last and is the commit marker; retries rewrite
    the tmp file and re-rename, so a shard directory is always either
    uncommitted or complete.

    ``doc_stats``: the shard's true (n_docs, dl_sum) from stage A's
    docstats sidecars — counts token-less docs, which triples can't see.
    Falls back to triple-derived counts when absent (direct callers).
    """
    t0 = time.monotonic()
    group = _sort_triples(group)
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False)
    tfs = group["tf"].to_numpy(zero_copy_only=False)
    dls = group["dl"].to_numpy(zero_copy_only=False)
    positions = None
    if "pos" in group.column_names:
        pos_col = group["pos"]
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        positions = np.asarray(pos_col.flatten(), dtype=np.int64)
    postings = encode_shard_postings(
        group["term"], doc_ids, tfs, dls, block_size, positions=positions
    )
    if doc_stats is not None:
        n_docs, dl_sum = int(doc_stats[0]), int(doc_stats[1])
    else:
        uniq_docs, first_idx = np.unique(doc_ids, return_index=True)
        n_docs = int(len(uniq_docs))
        dl_sum = int(dls[first_idx].sum()) if len(first_idx) else 0

    fs, idx_path = fsio.resolve_fs(index_dir, filesystem)
    sdir = fsio.join(idx_path, f"shard={shard:05d}")
    fsio.makedirs(fs, sdir)
    # the ordinal → raw-id doc table rides INSIDE postings.parquet (row 0
    # of docs_tab) — one file stays the unit of atomic replacement, so
    # compaction/merge can never pair a new table with old blobs
    fsio.write_table(fs, fsio.join(sdir, "postings.parquet"), postings)
    manifest = {
        "shard": shard,
        "n_docs": n_docs,
        "dl_sum": dl_sum,
        "n_terms": postings.num_rows,
        "n_postings": int(len(doc_ids)),
        "block_size": block_size,
        "wall_s": round(time.monotonic() - t0, 4),
        **(extra_manifest or {}),
    }
    # manifest LAST: it is the per-shard commit marker on every backend
    fsio.write_json(fs, fsio.join(sdir, "manifest.json"), manifest)
    return manifest


def _sort_triples(group: pa.Table) -> pa.Table:
    """Sort triples by (term, doc_id) via dictionary codes.

    Dictionary-encoding the term column once and lexsorting integer code
    ranks avoids Arrow's full string sort (~2× less memory traffic in the
    shard-encode task; result identical — (term, doc_id) is a total order).
    """
    if group.num_rows == 0:
        return group
    term = group["term"]
    if isinstance(term, pa.ChunkedArray):
        term = term.combine_chunks()
    denc = term if pa.types.is_dictionary(term.type) else term.dictionary_encode()
    codes = np.asarray(denc.indices)
    vocab_order = pa.compute.sort_indices(denc.dictionary)
    rank = np.empty(len(denc.dictionary), dtype=np.int64)
    rank[np.asarray(vocab_order)] = np.arange(len(denc.dictionary))
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((doc_ids, rank[codes]))
    idx = pa.array(order)
    cols = {
        "term": denc.take(idx),
        "doc_id": group["doc_id"].take(idx),
        "tf": group["tf"].take(idx),
        "dl": group["dl"].take(idx),
    }
    if "pos" in group.column_names:
        cols["pos"] = group["pos"].take(idx)
    return pa.table(cols)


def _encode_shard_from_triples(
    triples_dir: str, index_dir: str, shard: int, block_size: int,
    filesystem=None,
) -> dict:
    # one task per CPU slot: stop Arrow's internal pool from oversubscribing
    # the node (32 tasks × default pool was measured ~2× slower)
    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    fs, tri_path = fsio.resolve_fs(triples_dir, filesystem)
    part = fsio.join(tri_path, f"shard={shard}")
    doc_stats = None
    files = sorted(
        fsio.join(part, f)
        for f in fsio.listdir(fs, part)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    # one dataset-API read over the file list: ~3-4× faster than a
    # per-file read_table loop (per-file open/footer overhead dominates
    # at hundreds of small parts per shard)
    if files:
        avail = fsio.parquet_schema_names(fs, files[0])
        cols = ["term", "doc_id", "tf", "dl"] + (
            ["pos"] if "pos" in avail else []
        )
        group = fsio.read_table(fs, files, columns=cols)
    else:
        group = _empty_triples_table()
    stat_files = sorted(
        fsio.join(tri_path, f)
        for f in fsio.listdir(fs, tri_path)
        if f.startswith("docstats-") and f.endswith(".parquet")
    )
    if stat_files:
        st = fsio.read_table(fs, stat_files)
        mine = st.filter(pa.compute.equal(st["shard"], shard))
        doc_stats = (
            int(pa.compute.sum(mine["n_docs"]).as_py() or 0),
            int(pa.compute.sum(mine["dl_sum"]).as_py() or 0),
        )
    return encode_shard_table(
        group, index_dir, shard, block_size, doc_stats, filesystem=filesystem
    )


def _empty_triples_table() -> pa.Table:
    return pa.table(
        {
            "term": pa.array([], type=pa.large_string()),
            "doc_id": pa.array([], type=pa.int64()),
            "tf": pa.array([], type=pa.int32()),
            "dl": pa.array([], type=pa.int32()),
        }
    )


# On-disk index format generation. v2 = doc-ordinal postings (docs blobs
# reference a per-shard doc table embedded as the docs_tab column); indexes
# written before the ordinal codec carry no version field and are treated
# as v0 — their postings lack docs_tab, so this reader cannot decode them.
FORMAT_VERSION = 2


@dataclass
class IndexMeta:
    num_shards: int
    n_docs: int
    avgdl: float
    block_size: int
    k1: float = K1
    b: float = B
    has_positions: bool = False
    format_version: int = FORMAT_VERSION

    @classmethod
    def load(cls, index_dir: str, filesystem=None) -> "IndexMeta":
        if filesystem is None:
            with open(os.path.join(index_dir, "meta.json")) as f:
                d = json.load(f)
        else:
            d = fsio.read_json(filesystem, fsio.join(index_dir, "meta.json"))
        version = int(d.get("format_version", 0))
        if version != FORMAT_VERSION:
            raise ValueError(
                f"index format v{version} "
                f"{'(raw-delta docs, no docs_tab) ' if version < 2 else ''}"
                f"at {index_dir} is incompatible with this reader "
                f"(v{FORMAT_VERSION}) — rebuild required"
            )
        keys = ("num_shards", "n_docs", "avgdl", "block_size", "k1", "b")
        return cls(
            **{k: d[k] for k in keys},
            has_positions=bool(d.get("has_positions", False)),
            format_version=version,
        )

    def save(self, index_dir: str, filesystem=None) -> None:
        fs, path = fsio.resolve_fs(index_dir, filesystem)
        fsio.write_json(fs, fsio.join(path, "meta.json"), self.__dict__, indent=1)


def build_index(
    docs_ds,
    index_dir: str,
    *,
    num_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_size: int = DEFAULT_BLOCK_SIZE,
    resume: bool = True,
    keep_triples: bool = False,
    stage_a_batch_size: int | None = None,
    positions: bool = False,
    filesystem=None,
) -> IndexMeta:
    """Build (or resume building) the sharded inverted index.

    ``docs_ds``: a ``ray.data.Dataset`` with at least (id_col, text_col);
    doc ids must be unique (dedupe upstream — functions.dedup).
    ``positions=True`` adds per-posting token positions to the codec
    (phrase queries via index.search.phrase_search) at ~1.5-2× index
    size; off by default.
    ``index_dir``/``filesystem``: a local path, a filesystem URI
    (``s3://bucket/prefix``), or an explicit ``pyarrow.fs.FileSystem`` —
    all build IO (the stage-A external shuffle included) goes through
    ``index.fsio``, whose commit protocol needs no atomic rename on
    object stores (see that module's docstring).
    """
    import ray

    build_t0 = time.monotonic()
    stage_walls: dict[str, float] = {}
    fs, idx_path = fsio.resolve_fs(index_dir, filesystem)
    fsio.makedirs(fs, idx_path)
    triples_dir = fsio.join(idx_path, "triples")
    triples_marker = fsio.join(idx_path, ".triples_complete")
    missing = [
        s
        for s in range(num_shards)
        if not (resume and shard_complete(idx_path, s, filesystem=fs))
    ]
    if missing:
        if not (resume and fsio.exists(fs, triples_marker)):
            # (re)run stage A from scratch: a partial triples dir may hold
            # appended duplicates, so clear it first
            fsio.delete_dir(fs, triples_dir)
            fsio.delete_file(fs, triples_marker)
            keep = missing if len(missing) < num_shards else None
            writer = TriplesPartitionedWriter(
                triples_dir,
                num_shards,
                text_col,
                id_col,
                keep_shards=keep,
                positions=positions,
                filesystem=fs,
            )
            t0 = time.monotonic()
            # stage_a_batch_size None = one call per input block (no
            # coalescing copies — forcing larger batches measured a
            # consistent stage-A regression); stage B's many-small-file
            # read cost is handled by the one-call list read instead
            counts = docs_ds.map_batches(
                writer, batch_format="pyarrow", batch_size=stage_a_batch_size
            )
            # materialize executes the writes once and keeps the (tiny)
            # count rows so ds.stats() reflects the real execution
            executed = counts.materialize()
            stage_walls["triples_map_s"] = round(time.monotonic() - t0, 3)
            try:
                fsio.write_text(
                    fs, fsio.join(idx_path, "stage_a_stats.txt"), executed.stats()
                )
            except Exception:
                pass
            fsio.write_text(fs, triples_marker, "ok")

        @ray.remote(num_cpus=1)
        def encode_task(shard: int) -> dict:
            return _encode_shard_from_triples(
                triples_dir, idx_path, shard, block_size, filesystem=fs
            )

        t0 = time.monotonic()
        ray.get([encode_task.remote(s) for s in missing])
        stage_walls["encode_shards_s"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    manifests = _read_all_manifests(fs, idx_path, num_shards, block_size)
    meta = finalize_index(
        idx_path, num_shards, block_size, positions=positions, filesystem=fs,
        manifests=manifests,
    )
    stage_walls["finalize_s"] = round(time.monotonic() - t0, 3)
    _write_build_metrics(
        idx_path, num_shards, stage_walls, build_t0, filesystem=fs,
        manifests=manifests,
    )
    if not keep_triples:
        fsio.delete_dir(fs, triples_dir)
        fsio.delete_file(fs, triples_marker)
    return meta


def _write_build_metrics(
    index_dir: str, num_shards: int, stage_walls: dict, build_t0: float,
    filesystem=None, manifests: list[dict] | None = None,
) -> None:
    """metrics.json: build-level stage walls + per-partition metrics rolled
    up from shard manifests (the M3/AppStats counterpart for the build —
    the north rule's "per-partition lineage + metrics")."""
    fs, idx_path = fsio.resolve_fs(index_dir, filesystem)
    if manifests is not None:
        shards = manifests
    else:
        shards = []
        for s in range(num_shards):
            mpath = fsio.join(idx_path, f"shard={s:05d}", "manifest.json")
            if fsio.exists(fs, mpath):
                shards.append(fsio.read_json(fs, mpath))
    metrics = {
        "total_wall_s": round(time.monotonic() - build_t0, 3),
        "stages": stage_walls,
        "shards": {
            "n": len(shards),
            "n_postings_total": sum(m["n_postings"] for m in shards),
            "n_terms_total": sum(m["n_terms"] for m in shards),
            "encode_wall_s_sum": round(sum(m["wall_s"] for m in shards), 3),
            "encode_wall_s_max": round(
                max((m["wall_s"] for m in shards), default=0.0), 4
            ),
            "n_postings_max": max((m["n_postings"] for m in shards), default=0),
        },
    }
    fsio.write_json(fs, fsio.join(idx_path, "metrics.json"), metrics, indent=1)


def _read_all_manifests(
    fs, idx_path: str, num_shards: int, block_size: int
) -> list[dict]:
    """All shard manifests, encoding an empty shard for any missing one
    (resume/empty-corpus path). Reads go through a thread pool: 64 tiny
    sequential JSON reads were ~0.1-0.25 s of pure per-file latency at
    the small-corpus scale where finalize dominates the build wall (and
    on an object store each read is a round trip)."""
    from concurrent.futures import ThreadPoolExecutor

    paths = []
    for s in range(num_shards):
        mpath = fsio.join(idx_path, f"shard={s:05d}", "manifest.json")
        if not fsio.exists(fs, mpath):
            encode_shard_table(
                _empty_triples_table(), idx_path, s, block_size, filesystem=fs
            )
        paths.append(mpath)
    with ThreadPoolExecutor(max_workers=min(16, num_shards)) as ex:
        return list(ex.map(lambda p: fsio.read_json(fs, p), paths))


def finalize_index(
    index_dir: str, num_shards: int, block_size: int, positions: bool = False,
    filesystem=None, manifests: list[dict] | None = None,
) -> IndexMeta:
    """Aggregate shard manifests → meta.json + global termstats parquet."""
    fs, idx_path = fsio.resolve_fs(index_dir, filesystem)
    if manifests is None:
        manifests = _read_all_manifests(fs, idx_path, num_shards, block_size)
    n_docs = sum(m["n_docs"] for m in manifests)
    dl_sum = sum(m["dl_sum"] for m in manifests)

    # global (term, df): pre-aggregated per shard already (≤ num_shards rows
    # per term) → a small groupby-sum, no skew possible. Small vocabularies
    # aggregate driver-side (a Ray groupby has ~seconds of fixed cost);
    # large ones go through the distributed groupby.
    files = [
        fsio.join(idx_path, f"shard={s:05d}", "postings.parquet")
        for s in range(num_shards)
    ]
    final_stats = fsio.join(idx_path, "termstats")
    # per-shard term counts are in the manifests — no file opens needed
    n_term_rows = sum(m["n_terms"] for m in manifests)
    small_vocab = n_term_rows <= 5_000_000

    def write_stats(target: str) -> None:
        if small_vocab:
            t = fsio.read_table(fs, files, columns=["term", "df"])
            t = t.set_column(1, "df", t["df"].cast(pa.int64()))
            agg = t.group_by("term").aggregate([("df", "sum")])
            agg = agg.rename_columns(["term", "df"])
            fsio.makedirs(fs, target)
            fsio.write_table(fs, fsio.join(target, "part-0.parquet"), agg)
        else:
            import ray.data as rd
            from ray.data.aggregate import Sum

            stats = (
                rd.read_parquet(files, columns=["term", "df"], filesystem=fs)
                .groupby("term")
                .aggregate(Sum("df", alias_name="df"))
            )
            stats.write_parquet(target, filesystem=fs)

    if fsio.is_local(fs):
        # local: stage into a tmp dir, publish with one atomic dir rename
        tmp_stats = fsio.join(idx_path, ".termstats.tmp")
        shutil.rmtree(tmp_stats, ignore_errors=True)
        write_stats(tmp_stats)
        shutil.rmtree(final_stats, ignore_errors=True)
        os.replace(tmp_stats, final_stats)
    else:
        # object store: no dir rename exists — clear the prefix and write
        # the final objects directly; meta.json (written below, last) is
        # the build-level commit marker, so a reader that finds meta.json
        # sees a complete termstats prefix
        fsio.delete_dir(fs, final_stats)
        write_stats(final_stats)

    meta = IndexMeta(
        num_shards=num_shards,
        n_docs=n_docs,
        avgdl=(dl_sum / n_docs) if n_docs else 0.0,
        block_size=block_size,
        has_positions=positions,
    )
    meta.save(idx_path, filesystem=fs)
    return meta
