"""Index merging: combine sharded indexes into one (sort-based reduce).

Incremental indexing path: build per-increment indexes (e.g. per crawl
snapshot) with the same ``num_shards``/``block_size``, then merge. Because
doc-sharding assigns a doc to the same shard in every index, merging is
per-shard local: decode each input shard's posting lists back to flat
triples (vectorized — one varint decode over the concatenated blobs with
per-term delta reset), concatenate, and re-encode through the same
sort→encode reduce the build uses. Output is byte-identical to a direct
build over the union corpus (tested), so merged indexes inherit every
rank-identity guarantee.

Doc ids must be disjoint across inputs (they are: ids are content hashes
of normalized urls; re-crawled duplicate urls should be deduped upstream,
functions.dedup).
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
    shard_complete,
    shard_path,
)
from lsearch_ray.index.codec import _grouped_undelta, varint_decode


def decode_all_postings(
    table: pa.Table, block_size: int, doc_table: np.ndarray | None = None
) -> pa.Table:
    """Postings table (one row per term) → flat triples table (RAW ids).

    Vectorized: one varint pass per blob column over the concatenated
    bytes; the docs blobs hold ORDINAL deltas resetting at every block
    start (codec), so the reset set is each term's block starts and the
    ordinals map through the shard's doc table — taken from the table's
    own embedded ``docs_tab`` column unless passed explicitly. A
    positional postings table (``poss`` column) round-trips its
    per-posting position lists into a ``pos`` list column, so
    merged/compacted positional shards re-encode through the same path
    as the build.
    """
    from lsearch_ray.index.codec import (
        _block_starts_flat,
        doc_table_from_postings,
    )

    n_terms = table.num_rows
    if n_terms == 0:
        from lsearch_ray.index.build import _empty_triples_table

        return _empty_triples_table()
    if doc_table is None:
        doc_table = doc_table_from_postings(table)
    df = table["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(df)))[:-1]

    def blob_concat(col) -> np.ndarray:
        joined = b"".join(col.to_pylist())
        return np.frombuffer(joined, dtype=np.uint8)

    deltas = varint_decode(blob_concat(table["docs"]))
    ords = _grouped_undelta(
        deltas, _block_starts_flat(df, block_size)
    ).astype(np.int64)
    doc_ids = np.asarray(doc_table, dtype=np.int64)[ords]
    tfs = varint_decode(blob_concat(table["tfs"])).astype(np.int32)
    dls = varint_decode(blob_concat(table["dls"])).astype(np.int32)

    codes = np.repeat(np.arange(n_terms, dtype=np.int64), df)
    term_col = table["term"]
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    terms_flat = pa.DictionaryArray.from_arrays(
        pa.array(codes, type=pa.int32()), term_col
    )
    cols = {
        "term": terms_flat,
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "tf": pa.array(tfs, type=pa.int32()),
        "dl": pa.array(dls, type=pa.int32()),
    }
    if "poss" in table.column_names:
        voff = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
        pos_deltas = varint_decode(blob_concat(table["poss"]))
        pos_flat = _grouped_undelta(pos_deltas, voff[:-1]).astype(np.int32)
        cols["pos"] = pa.LargeListArray.from_arrays(
            pa.array(voff, type=pa.int64()),
            pa.array(pos_flat, type=pa.int32()),
        )
    return pa.table(cols)


def merge_indexes(
    index_dirs: list[str], out_dir: str, *, resume: bool = True, filesystem=None
) -> IndexMeta:
    """Merge same-shape sharded indexes into ``out_dir``.

    ``filesystem``: optional ``pyarrow.fs`` applying to ALL dirs (inputs
    and output) — stage mixed local/remote inputs first.

    Round-2 invariants carried through the merge:
    - token-less docs stay counted: per-shard n_docs/dl_sum come from the
      SOURCE manifests (which include stage-A docstats), not a postings
      recount;
    - tombstones are applied during the merge (deleted postings dropped,
      counts adjusted) — the merged index needs no tombstone files;
    - positional indexes merge positional: when every input has
      positions, the ``poss`` blobs round-trip and the merged meta keeps
      ``has_positions``; mixing positional and non-positional inputs is
      rejected (silently dropping paid-for positions would be worse).
    """
    import json

    import ray

    fs = filesystem
    metas = [IndexMeta.load(d, filesystem=fs) for d in index_dirs]
    num_shards = metas[0].num_shards
    block_size = metas[0].block_size
    for m in metas[1:]:
        if m.num_shards != num_shards or m.block_size != block_size:
            raise ValueError("merge requires identical num_shards/block_size")
    positions = all(m.has_positions for m in metas)
    if any(m.has_positions for m in metas) and not positions:
        raise ValueError(
            "merge requires all inputs positional or all non-positional"
        )
    if fs is None:
        os.makedirs(out_dir, exist_ok=True)
    else:
        fsio.makedirs(fs, out_dir)
    missing = [
        s
        for s in range(num_shards)
        if not (resume and shard_complete(out_dir, s, filesystem=fs))
    ]

    @ray.remote(num_cpus=1)
    def merge_shard(shard: int) -> dict:
        from lsearch_ray.index.tombstones import load_tombstones_for_shard

        pa.set_cpu_count(1)
        base_cols = ["term", "df", "docs", "tfs", "dls", "docs_tab"]
        parts = []
        n_docs, dl_sum = 0, 0
        banned_parts, effective_parts = [], []
        for d in index_dirs:
            path = shard_path(d, shard, "postings.parquet", fs)
            avail = fsio.parquet_file(fs, path).schema_arrow.names
            # an empty shard of a positional index is encoded without the
            # poss column (no triples to carry it) — read what exists;
            # permissive concat fills the missing pos lists
            cols = base_cols + (
                ["poss"] if positions and "poss" in avail else []
            )
            t = fsio.pq_read(fs, path, columns=cols)
            parts.append(decode_all_postings(t, block_size))
            mpath = shard_path(d, shard, "manifest.json", fs)
            if fs is None:
                with open(mpath) as f:
                    m = json.load(f)
            else:
                m = fsio.read_json(fs, mpath)
            n_docs += int(m["n_docs"])
            dl_sum += int(m["dl_sum"])
            b = load_tombstones_for_shard(d, shard, filesystem=fs)
            banned_parts.append(b)
            # ids a crashed compact_index already applied to THIS input's
            # manifest must not be subtracted a second time
            applied = np.asarray(
                m.get("applied_tombstones", []), dtype=np.int64
            )
            effective_parts.append(np.setdiff1d(b, applied))
        # zero-row parts (empty shards) carry plain-string/pos-less
        # schemas that won't promote against the dictionary-typed ones
        nonempty = [p for p in parts if p.num_rows]
        merged = (
            pa.concat_tables(nonempty, promote_options="permissive")
            if nonempty
            else parts[0]
        )
        banned = np.unique(np.concatenate(banned_parts))
        effective = np.unique(np.concatenate(effective_parts))
        if len(banned):
            doc_ids = merged["doc_id"].to_numpy(zero_copy_only=False)
            drop = np.isin(doc_ids, banned)
            if drop.any():
                dls = merged["dl"].to_numpy(zero_copy_only=False)
                eff_drop = drop & np.isin(doc_ids, effective)
                if eff_drop.any():
                    uq, ui = np.unique(doc_ids[eff_drop], return_index=True)
                    dl_sum -= int(dls[eff_drop][ui].sum())
                merged = merged.filter(pa.array(~drop))
            n_docs -= int(len(effective))
        return encode_shard_table(
            merged, out_dir, shard, block_size, (n_docs, dl_sum), filesystem=fs
        )

    if missing:
        ray.get([merge_shard.remote(s) for s in missing])
    return finalize_index(
        out_dir, num_shards, block_size, positions=positions, filesystem=fs
    )
