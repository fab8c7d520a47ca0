"""Deletion support: per-shard tombstones + compaction.

Lucene-style semantics: ``delete_docs`` records doc ids in per-shard
tombstone files (doc-sharding routes each id to the one shard that could
hold it); every query path masks tombstoned docs IMMEDIATELY (they can
never appear in results), while corpus statistics (n_docs, avgdl, df)
keep counting them until ``compact_index`` rewrites the affected shards
— at which point the index is byte-identical to a fresh build over the
live corpus (tested, including corpora with token-less docs: compaction
adjusts the manifest counts from the OLD manifest minus the shard's
tombstones rather than recounting from postings, so live token-less docs
stay counted). Caveat: deleting an id that was never indexed makes
n_docs undercount by one after compaction — deletion of nonexistent ids
is out of contract.

Crash safety: tombstone writes and shard rewrites are tmp+rename atomic.
Compaction commits per shard: each shard's manifest carries a cumulative
ledger of the tombstone ids it has ALREADY applied, and the shard's
tombstone file is removed right after the shard commits. A re-run after
a crash — even one where new deletions merged into a stale tombstone
file during the window — subtracts only the not-yet-applied ids, so
compaction is idempotent at every interruption point. (The ledger lives
in manifest JSON; corpora accumulating millions of deletions between
compactions should compact more often or rebuild.)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lsearch_ray.index import fsio
from lsearch_ray.index.build import (
    IndexMeta,
    encode_shard_table,
    finalize_index,
    shard_of,
    shard_path,
)


def _tombstone_path(index_dir: str, shard: int, fs=None) -> str:
    return shard_path(index_dir, shard, "tombstones.parquet", fs)


def delete_docs(index_dir: str, doc_ids, filesystem=None) -> int:
    """Tombstone the given doc ids. Returns the total tombstone count
    across shards after the merge. Idempotent (ids are deduped).
    ``filesystem``: optional ``pyarrow.fs`` target (fsio publish rules:
    local = tmp+rename; object stores = direct write, atomic on close)."""
    fs = filesystem
    meta = IndexMeta.load(index_dir, filesystem=fs)
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if len(ids) == 0:
        return sum(
            len(load_tombstones_for_shard(index_dir, s, filesystem=fs))
            for s in range(meta.num_shards)
        )
    shards = shard_of(ids, meta.num_shards)
    total = 0
    for s in range(meta.num_shards):
        mine = ids[shards == s]
        existing = load_tombstones_for_shard(index_dir, s, filesystem=fs)
        if len(mine) == 0:
            total += len(existing)
            continue
        merged = np.union1d(existing, mine)
        path = _tombstone_path(index_dir, s, fs)
        table = pa.table({"doc_id": pa.array(merged, type=pa.int64())})
        if fs is None:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp.{os.getpid()}"
            pq.write_table(table, tmp)
            os.replace(tmp, path)
        else:
            fsio.makedirs(fs, fsio.join(index_dir, f"shard={s:05d}"))
            fsio.write_table(fs, path, table)
        total += len(merged)
    return total


def load_tombstones_for_shard(
    index_dir: str, shard: int, filesystem=None
) -> np.ndarray:
    path = _tombstone_path(index_dir, shard, filesystem)
    if filesystem is None:
        if not os.path.exists(path):
            return np.empty(0, dtype=np.int64)
    elif not fsio.exists(filesystem, path):
        return np.empty(0, dtype=np.int64)
    t = fsio.pq_read(filesystem, path)
    return t["doc_id"].to_numpy(zero_copy_only=False)


def load_tombstones(index_dir: str, shards=None, filesystem=None) -> np.ndarray:
    """Sorted union of tombstoned ids (all shards, or the given ones)."""
    meta = IndexMeta.load(index_dir, filesystem=filesystem)
    shards = range(meta.num_shards) if shards is None else shards
    parts = [
        load_tombstones_for_shard(index_dir, s, filesystem=filesystem)
        for s in shards
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def compact_index(index_dir: str, filesystem=None) -> IndexMeta:
    """Rewrite shards dropping tombstoned postings; recompute stats.

    After compaction the index is byte-identical to a fresh build over
    the live corpus (same sort→encode reduce as the build and merge).
    ``filesystem``: optional ``pyarrow.fs`` target — the pending-manifest
    commit protocol carries over (on object stores every publish is a
    direct write, atomic on stream close; the pending file remains the
    recovery record for the postings-replace gap)."""
    import json

    from lsearch_ray.index.merge import decode_all_postings

    fs = filesystem
    meta = IndexMeta.load(index_dir, filesystem=fs)

    def _exists(p: str) -> bool:
        return os.path.exists(p) if fs is None else fsio.exists(fs, p)

    def _read_json(p: str):
        if fs is None:
            with open(p) as f:
                return json.load(f)
        return fsio.read_json(fs, p)

    def _remove(p: str) -> None:
        if fs is None:
            os.remove(p)
        else:
            fsio.delete_file(fs, p)

    for s in range(meta.num_shards):
        banned = load_tombstones_for_shard(index_dir, s, filesystem=fs)
        if len(banned) == 0:
            continue
        manifest_path = shard_path(index_dir, s, "manifest.json", fs)
        pending_path = manifest_path + ".pending"
        # the doc-stat BASE is the pending manifest when one exists: a
        # crash between the postings replace and the manifest rename
        # leaves filtered postings with an old manifest, and the deleted
        # docs' dl can no longer be recovered from postings — the pending
        # file (written BEFORE the replace) carries the correct target
        base = _read_json(pending_path if _exists(pending_path) else manifest_path)
        applied = np.asarray(base.get("applied_tombstones", []), dtype=np.int64)
        # only not-yet-applied ids adjust the counts: already-applied ids
        # (from a crashed prior run, even with NEW deletions merged into
        # the stale tombstone file meanwhile) must not subtract twice
        effective = np.setdiff1d(banned, applied)
        if len(effective) == 0 and not _exists(pending_path):
            _remove(_tombstone_path(index_dir, s, fs))
            continue
        cols = ["term", "df", "docs", "tfs", "dls", "docs_tab"]
        path = shard_path(index_dir, s, "postings.parquet", fs)
        avail = fsio.parquet_file(fs, path).schema_arrow.names
        if "poss" in avail:
            cols.append("poss")
        triples = decode_all_postings(
            fsio.pq_read(fs, path, columns=cols), meta.block_size
        )
        doc_ids = triples["doc_id"].to_numpy(zero_copy_only=False)
        # filter with the FULL banned set (idempotent over partial
        # states); dl adjustment only for effective ids still present
        keep = ~np.isin(doc_ids, banned)
        dls = triples["dl"].to_numpy(zero_copy_only=False)
        eff_dropped = np.isin(doc_ids, effective)
        if eff_dropped.any():
            uq, ui = np.unique(doc_ids[eff_dropped], return_index=True)
            deleted_dl = int(dls[eff_dropped][ui].sum())
        else:
            deleted_dl = 0
        doc_stats = (
            int(base["n_docs"]) - int(len(effective)),
            int(base["dl_sum"]) - deleted_dl,
        )
        ledger = np.union1d(applied, banned).tolist()
        # commit protocol: pending manifest → postings → manifest →
        # remove pending → remove tombstones; every crash window resumes
        # correctly (pending is the recovery record for the replace gap)
        pending_obj = {
            "n_docs": doc_stats[0],
            "dl_sum": doc_stats[1],
            "applied_tombstones": ledger,
        }
        if fs is None:
            ptmp = pending_path + f".tmp.{os.getpid()}"
            with open(ptmp, "w") as f:
                json.dump(pending_obj, f)
            os.replace(ptmp, pending_path)
        else:
            fsio.write_json(fs, pending_path, pending_obj)
        encode_shard_table(
            triples.filter(pa.array(keep)),
            index_dir,
            s,
            meta.block_size,
            doc_stats,
            extra_manifest={"applied_tombstones": ledger},
            filesystem=fs,
        )
        _remove(pending_path)
        _remove(_tombstone_path(index_dir, s, fs))
    return finalize_index(
        index_dir,
        meta.num_shards,
        meta.block_size,
        positions=meta.has_positions,
        filesystem=fs,
    )
