"""Distributed inverted-index build: docs → triples → doc-sharded postings.

Pipeline (north star; generalizes the reference's per-record count pass,
``More`` at search.rs:267-283, into an index build):

1. ``map_batches(TriplesWithShard)`` — stateless, zero-copy Arrow: tokenize
   each document, emit ``(term, doc_id, tf, dl, shard)`` triples.
   ``shard = mix64(doc_id) % num_shards`` — **doc-sharded**: every posting
   of a document lands in one shard, so each shard is a complete
   self-contained index over its subset of docs, per-shard top-k is exact,
   and the one big shuffle is keyed by the *uniform* doc-hash — head-term
   (Zipf) skew cannot unbalance it. (Term-keyed aggregation below only ever
   sees pre-aggregated rows; for raw term-keyed groupbys see
   ``lsearch_ray.functions.skew.salted_groupby_sum``.)
2. ``groupby("shard").map_groups(ShardWriter)`` — the shuffle. One group
   per shard; the writer sorts the group by (term, doc_id), encodes ALL
   posting lists in one vectorized pass (codec.py), writes
   ``shard=K/postings.parquet`` atomically (tmp + rename) and commits with
   a ``manifest.json`` carrying lineage + metrics. Re-running a failed
   build re-encodes only shards without a committed manifest
   (**resumable from checkpoint, per-partition lineage**).
3. Finalize: global doc stats (N, avgdl) summed from shard manifests;
   global ``(term, df)`` table via a pre-aggregated groupby over the
   per-shard df rows; ``meta.json``.

Scale notes: the shard count bounds per-group memory (a shard's triples
must fit one task: choose ``num_shards ≈ corpus_tokens × 16B / 1 GiB``).
The triples stage is a streaming stateless map; nothing materializes the
corpus.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lsearch_ray.analyzer import term_counts_table
from lsearch_ray.index.codec import DEFAULT_BLOCK_SIZE, encode_shard_postings

K1 = 1.2
B = 0.75
_MIX = np.uint64(0x9E3779B97F4A7C15)


def shard_of(doc_ids: np.ndarray, num_shards: int) -> np.ndarray:
    """Multiplicative-hash shard assignment (balances sequential ids)."""
    h = (doc_ids.astype(np.uint64) * _MIX) >> np.uint64(33)
    return (h % np.uint64(num_shards)).astype(np.int32)


class TriplesWithShard:
    """Actor-pool batch transform: documents → sharded tf triples."""

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


def _shard_dir(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, f"shard={shard:05d}")


def _manifest_path(index_dir: str, shard: int) -> str:
    return os.path.join(_shard_dir(index_dir, shard), "manifest.json")


def shard_complete(index_dir: str, shard: int) -> bool:
    return os.path.exists(_manifest_path(index_dir, shard))


class ShardWriter:
    """``map_groups`` callable: encode + atomically write one shard.

    The manifest is written last and acts as the commit marker; task
    retries overwrite the tmp file and re-rename, so the shard directory
    is always either absent-from-manifest or complete.
    """

    def __init__(self, index_dir: str, block_size: int = DEFAULT_BLOCK_SIZE):
        self.index_dir = index_dir
        self.block_size = block_size

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        shard = int(group["shard"][0].as_py())
        group = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        doc_ids = group["doc_id"].to_numpy(zero_copy_only=False)
        tfs = group["tf"].to_numpy(zero_copy_only=False)
        dls = group["dl"].to_numpy(zero_copy_only=False)
        postings = encode_shard_postings(
            group["term"], doc_ids, tfs, dls, self.block_size
        )
        # per-shard doc stats: each doc_id appears once per distinct term;
        # dedupe to count docs / sum dl once per doc.
        uniq_docs, first_idx = np.unique(doc_ids, return_index=True)
        n_docs = int(len(uniq_docs))
        dl_sum = int(dls[first_idx].sum())

        sdir = _shard_dir(self.index_dir, shard)
        os.makedirs(sdir, exist_ok=True)
        tmp = os.path.join(sdir, f".postings.tmp.{os.getpid()}")
        pq.write_table(postings, tmp)
        os.replace(tmp, os.path.join(sdir, "postings.parquet"))
        manifest = {
            "shard": shard,
            "n_docs": n_docs,
            "dl_sum": dl_sum,
            "n_terms": postings.num_rows,
            "n_postings": int(len(doc_ids)),
            "block_size": self.block_size,
            "wall_s": round(time.monotonic() - t0, 4),
        }
        mtmp = _manifest_path(self.index_dir, shard) + f".tmp.{os.getpid()}"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, _manifest_path(self.index_dir, shard))
        return pa.table(
            {
                "shard": pa.array([shard], type=pa.int32()),
                "n_docs": pa.array([n_docs], type=pa.int64()),
                "n_postings": pa.array([manifest["n_postings"]], type=pa.int64()),
            }
        )


@dataclass
class IndexMeta:
    num_shards: int
    n_docs: int
    avgdl: float
    block_size: int
    k1: float = K1
    b: float = B

    @classmethod
    def load(cls, index_dir: str) -> "IndexMeta":
        with open(os.path.join(index_dir, "meta.json")) as f:
            d = json.load(f)
        return cls(**{k: d[k] for k in ("num_shards", "n_docs", "avgdl", "block_size", "k1", "b")})

    def save(self, index_dir: str) -> None:
        with open(os.path.join(index_dir, "meta.json"), "w") as f:
            json.dump(self.__dict__, f, indent=1)


def build_index(
    docs_ds,
    index_dir: str,
    *,
    num_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_size: int = DEFAULT_BLOCK_SIZE,
    resume: bool = True,
) -> IndexMeta:
    """Build (or resume building) the sharded inverted index.

    ``docs_ds``: a ``ray.data.Dataset`` with at least (id_col, text_col);
    doc ids must be unique (dedupe upstream — functions.dedup).
    """
    os.makedirs(index_dir, exist_ok=True)
    missing = [s for s in range(num_shards) if not (resume and shard_complete(index_dir, s))]
    if missing:
        keep = missing if len(missing) < num_shards else None
        triples = docs_ds.map_batches(
            TriplesWithShard(num_shards, text_col, id_col, keep_shards=keep),
            batch_format="pyarrow",
        )
        # the one big shuffle: uniform doc-hash partitioning
        writer = ShardWriter(index_dir, block_size)

        def write_shard_group(group: pa.Table) -> pa.Table:
            return writer(group)

        manifests = triples.groupby("shard").map_groups(
            write_shard_group, batch_format="pyarrow"
        )
        manifests.materialize()  # execute; result is one tiny row per shard
    return finalize_index(index_dir, num_shards, block_size)


def finalize_index(index_dir: str, num_shards: int, block_size: int) -> IndexMeta:
    """Aggregate shard manifests → meta.json + global termstats parquet."""
    n_docs, dl_sum = 0, 0
    for s in range(num_shards):
        path = _manifest_path(index_dir, s)
        if not os.path.exists(path):
            # a shard with zero rows never formed a group — commit it empty
            os.makedirs(_shard_dir(index_dir, s), exist_ok=True)
            from lsearch_ray.index.codec import _empty_postings_table

            pq.write_table(
                _empty_postings_table(),
                os.path.join(_shard_dir(index_dir, s), "postings.parquet"),
            )
            with open(path, "w") as f:
                json.dump(
                    {"shard": s, "n_docs": 0, "dl_sum": 0, "n_terms": 0,
                     "n_postings": 0, "block_size": block_size, "wall_s": 0.0},
                    f,
                )
        with open(path) as f:
            m = json.load(f)
        n_docs += m["n_docs"]
        dl_sum += m["dl_sum"]

    # global (term, df): pre-aggregated per shard already (≤ num_shards rows
    # per term) → a small groupby-sum, no skew possible.
    import ray.data as rd
    from ray.data.aggregate import Sum

    files = [
        os.path.join(_shard_dir(index_dir, s), "postings.parquet")
        for s in range(num_shards)
    ]
    stats = (
        rd.read_parquet(files, columns=["term", "df"])
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    tmp_stats = os.path.join(index_dir, ".termstats.tmp")
    final_stats = os.path.join(index_dir, "termstats")
    import shutil

    shutil.rmtree(tmp_stats, ignore_errors=True)
    stats.write_parquet(tmp_stats)
    shutil.rmtree(final_stats, ignore_errors=True)
    os.replace(tmp_stats, final_stats)

    meta = IndexMeta(
        num_shards=num_shards,
        n_docs=n_docs,
        avgdl=(dl_sum / n_docs) if n_docs else 0.0,
        block_size=block_size,
    )
    meta.save(index_dir)
    return meta
