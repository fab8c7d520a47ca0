"""JSONL / CSV corpus interchange — the text formats web corpora
actually arrive in (crawl sidecar exports, API dumps, labeling-tool
output) as streaming Ray Data sources and sinks.

- :func:`to_jsonl` / :func:`to_csv` — Dataset → sharded text files
  under a reset directory. The writer is Ray's streaming
  ``write_json`` / ``write_csv``: one file per block, no driver
  materialization, and the shard-per-file layout is the resumable
  partitioned-output convention the parquet sinks already follow.
- :func:`read_jsonl` / :func:`read_csv` — sharded text files →
  Dataset. pyarrow's JSON/CSV readers infer int64/double/string
  schemas and the read parallelizes file-per-shard, so a 100-TB JSONL
  drop ingests exactly like parquet (minus column pruning — convert to
  parquet once, then query; these sources exist for the FIRST hop).

Fidelity note: parquet → JSONL/CSV → Dataset roundtrips integers and
strings exactly (int64 stays int64). CSV cannot distinguish ``''``
from null — corpora with empty-string text should ride JSONL.

Reference counterpart: none (the reference reads filesystem pages
only, `src/search.rs:27-66`); SURVEY §2.1 source-family extension.
"""

from __future__ import annotations

import shutil


def to_jsonl(ds, path: str):
    """Write ``ds`` as sharded JSON-lines files under ``path`` (the
    directory is reset first so re-runs never mix shard generations)."""
    shutil.rmtree(path, ignore_errors=True)
    ds.write_json(path)
    return path


def read_jsonl(path: str):
    """Sharded JSONL directory (or single file) → Dataset."""
    import ray.data as rd

    return rd.read_json(path)


def to_csv(ds, path: str):
    """Write ``ds`` as sharded CSV files under ``path`` (reset first)."""
    shutil.rmtree(path, ignore_errors=True)
    ds.write_csv(path)
    return path


def read_csv(path: str):
    """Sharded CSV directory (or single file) → Dataset."""
    import ray.data as rd

    return rd.read_csv(path)


def to_jsonl_gz(ds, path: str):
    """Write ``ds`` as sharded GZIP-compressed JSON-lines files under
    ``path`` (reset first) — the compressed interchange form web-crawl
    drops actually ship in (WET/WARC sidecars are gzip members). Same
    streaming one-file-per-block writer as :func:`to_jsonl`; the gzip
    stream rides pyarrow's output-stream codec, so compression happens
    inside each write task, never on the driver."""
    shutil.rmtree(path, ignore_errors=True)
    ds.write_json(path, arrow_open_stream_args={"compression": "gzip"})
    return path


def read_jsonl_gz(path: str):
    """Sharded gzip JSONL directory → Dataset (file-per-shard parallel
    read; each task decompresses its own shard through pyarrow's input
    stream codec)."""
    import ray.data as rd

    return rd.read_json(path, arrow_open_stream_args={"compression": "gzip"})
