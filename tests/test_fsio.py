"""fsio publish-protocol and index-format guard tests (round-4 ADVICE):

- writes through a LOCAL-BACKED wrapped filesystem (SubTreeFileSystem
  over LocalFileSystem) must use the tmp+os.replace atomic publish, not
  truncate-then-write (a crash mid-write must never leave a partial
  file at the final name);
- ``IndexMeta.load`` must reject pre-ordinal-codec indexes (no
  ``format_version`` in meta.json) with a clear rebuild message instead
  of an opaque parquet missing-column error downstream;
- the serving block-size cache must pick up an in-place rebuild with a
  different ``block_size`` (freshness-keyed on meta.json mtime+size).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest
from pyarrow import fs as pafs

from lsearch_ray.index import fsio
from lsearch_ray.index.build import FORMAT_VERSION, IndexMeta


def test_local_real_path_recurses_subtree(tmp_path):
    local = pafs.LocalFileSystem()
    assert fsio.local_real_path(local, "/a/b") == "/a/b"
    sub = pafs.SubTreeFileSystem(str(tmp_path), local)
    assert fsio.local_real_path(sub, "x/y") == f"{tmp_path}/x/y"
    nested = pafs.SubTreeFileSystem("x", sub)
    assert fsio.local_real_path(nested, "z") == f"{tmp_path}/x/z"


def test_write_through_subtree_fs_is_atomic_publish(tmp_path, monkeypatch):
    """A local-backed SubTreeFileSystem write must route through
    tmp+os.replace: os.replace is called with the final host path, and
    no tmp sibling survives."""
    sub = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    replaced: list[tuple[str, str]] = []
    real_replace = os.replace

    def spy(src, dst):
        replaced.append((src, dst))
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", spy)
    fsio.write_table(sub, "out.parquet", pa.table({"a": [1, 2]}))
    fsio.write_text(sub, "marker.json", json.dumps({"ok": 1}))
    assert sorted(os.listdir(tmp_path)) == ["marker.json", "out.parquet"]
    assert [dst for _, dst in replaced] == [
        f"{tmp_path}/out.parquet",
        f"{tmp_path}/marker.json",
    ]
    import pyarrow.parquet as pq

    assert pq.read_table(tmp_path / "out.parquet")["a"].to_pylist() == [1, 2]


def test_index_meta_rejects_preordinal_format(tmp_path):
    meta = {
        "num_shards": 2,
        "n_docs": 10,
        "avgdl": 3.0,
        "block_size": 128,
        "k1": 1.2,
        "b": 0.75,
    }  # no format_version: a pre-doc-ordinal (v0) index
    with open(tmp_path / "meta.json", "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="index format v0.*rebuild"):
        IndexMeta.load(str(tmp_path))
    meta["format_version"] = FORMAT_VERSION
    with open(tmp_path / "meta.json", "w") as f:
        json.dump(meta, f)
    assert IndexMeta.load(str(tmp_path)).block_size == 128


def test_block_size_cache_invalidated_by_meta_rewrite(tmp_path):
    from lsearch_ray.index.search import _block_size_for

    idx = tmp_path / "idx"
    (idx / "shard=00000").mkdir(parents=True)
    postings = str(idx / "shard=00000" / "postings.parquet")

    def write_meta(block_size: int, pad: str) -> None:
        with open(idx / "meta.json", "w") as f:
            json.dump({"block_size": block_size, "_pad": pad}, f)

    write_meta(128, "a")
    assert _block_size_for(postings) == 128
    # in-place rebuild with a different stride: the cache must not serve
    # the stale value (padding changes the size so the freshness key
    # moves even when mtime granularity is coarse)
    write_meta(256, "bb")
    assert _block_size_for(postings) == 256
