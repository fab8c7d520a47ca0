"""Filesystem abstraction for index build IO (pyarrow.fs).

The index build's external shuffle (stage A writes per-shard triples
parts; stage B writes postings + manifest) must run against object
stores on a real cluster, where POSIX atomic rename does not exist.
This module gives every build-side write one of two publish protocols:

- **LocalFileSystem**: write a ``.tmp`` sibling, then ``os.replace`` —
  readers never observe a partial file (the measured-fast single-box
  path, unchanged).
- **Any other pyarrow FileSystem** (S3/GCS/..., or a wrapped fs like
  ``SubTreeFileSystem``): write the final object directly through
  ``open_output_stream`` — object stores publish atomically on stream
  close (an aborted multipart upload is never visible), so tmp+rename
  is unnecessary AND unavailable. Idempotent filenames (stage A's
  lineage-derived part tags, stage B's fixed names) make retries
  overwrite rather than duplicate, and the layer above keeps the
  commit markers last (per-shard ``manifest.json``, build-level
  ``meta.json``), so a prefix is always either uncommitted or complete.

``resolve_fs`` accepts a plain path (local), a URI (``s3://...``), or
an explicit ``(filesystem, path)`` via the ``filesystem=`` parameters
on the build entry points.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
from pyarrow import fs as pafs


def resolve_fs(path: str, filesystem=None):
    """(FileSystem, fs_path) for a path/URI; ``filesystem`` overrides."""
    if filesystem is not None:
        return filesystem, path
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def is_local(fs) -> bool:
    return isinstance(fs, pafs.LocalFileSystem)


def local_real_path(fs, path: str) -> str | None:
    """Host-OS path when ``fs`` bottoms out at LocalFileSystem (recursing
    through SubTreeFileSystem wrappers), else None. Writes to such a
    target must use tmp + ``os.replace``: ``open_output_stream`` on a
    local-backed fs is truncate-then-write, NOT atomic-on-close the way
    an object-store multipart upload is, so a crash mid-write would
    otherwise leave a partial file that the commit-marker protocol
    (manifest.json/meta.json last) would treat as a valid commit."""
    if fs is None or isinstance(fs, pafs.LocalFileSystem):
        return path
    if isinstance(fs, pafs.SubTreeFileSystem):
        base = local_real_path(fs.base_fs, fs.base_path)
        if base is not None:
            return f"{base.rstrip('/')}/{path}" if path else base
    return None


def join(*parts: str) -> str:
    """fs-path join (generic filesystems use '/' regardless of host OS)."""
    return "/".join(p.rstrip("/") for p in parts if p != "")


def makedirs(fs, path: str) -> None:
    fs.create_dir(path, recursive=True)


def exists(fs, path: str) -> bool:
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def delete_file(fs, path: str) -> None:
    if exists(fs, path):
        fs.delete_file(path)


def delete_dir(fs, path: str) -> None:
    if exists(fs, path):
        fs.delete_dir(path)


def listdir(fs, path: str) -> list[str]:
    """Base names of files directly under ``path`` ([] if absent)."""
    if not exists(fs, path):
        return []
    infos = fs.get_file_info(pafs.FileSelector(path, recursive=False))
    return [i.base_name for i in infos if i.type == pafs.FileType.File]


def write_table(fs, path: str, table) -> None:
    """Publish one parquet file atomically (see module docstring)."""
    real = local_real_path(fs, path)
    if real is not None:
        tmp = f"{real}.tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, real)
    else:
        with fs.open_output_stream(path) as f:
            pq.write_table(table, f)


def read_table(fs, paths, columns=None):
    """One list-read over part files (the stage-B fast path)."""
    if is_local(fs):
        return pq.read_table(paths, columns=columns)
    return pq.read_table(paths, columns=columns, filesystem=fs)


def pq_read(fs, path: str, columns=None, filters=None):
    """Serving-side single-file read; ``fs=None`` means plain local
    (identical to today's hot path — no wrapper in the way)."""
    if fs is None or is_local(fs):
        return pq.read_table(path, columns=columns, filters=filters)
    return pq.read_table(path, columns=columns, filters=filters, filesystem=fs)


def parquet_file(fs, path: str) -> pq.ParquetFile:
    """ParquetFile handle for row-group-level reads through any fs."""
    if fs is None or is_local(fs):
        return pq.ParquetFile(path)
    return pq.ParquetFile(fs.open_input_file(path))


def file_key(fs, path: str) -> tuple[int, int]:
    """(mtime_ns, size) freshness key for per-process caches."""
    if fs is None or is_local(fs):
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    info = fs.get_file_info(path)
    mt = info.mtime_ns
    return (0 if mt is None else int(mt), int(info.size))


def fs_cache_key(fs):
    """Hashable component distinguishing filesystems in path-keyed
    caches. ``None`` for the local default; a SubTreeFileSystem keys by
    its base path, anything else by instance identity (one fs instance
    per actor in practice — documented on the serving entry points)."""
    if fs is None or is_local(fs):
        return None
    if isinstance(fs, pafs.SubTreeFileSystem):
        return ("subtree", fs.base_path, fs_cache_key(fs.base_fs))
    return (type(fs).__name__, id(fs))


def parquet_num_rows(fs, path: str) -> int:
    if is_local(fs):
        return pq.ParquetFile(path).metadata.num_rows
    with fs.open_input_file(path) as f:
        return pq.ParquetFile(f).metadata.num_rows


def parquet_schema_names(fs, path: str) -> list[str]:
    if is_local(fs):
        return pq.ParquetFile(path).schema_arrow.names
    with fs.open_input_file(path) as f:
        return pq.ParquetFile(f).schema_arrow.names


def write_text(fs, path: str, text: str) -> None:
    real = local_real_path(fs, path)
    if real is not None:
        tmp = f"{real}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, real)
    else:
        with fs.open_output_stream(path) as f:
            f.write(text.encode())


def write_json(fs, path: str, obj, *, indent=None) -> None:
    write_text(fs, path, json.dumps(obj, indent=indent))


def read_json(fs, path: str):
    with fs.open_input_stream(path) as f:
        return json.loads(f.read().decode())
