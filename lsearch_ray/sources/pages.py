"""Sources: shell-glob pattern expansion + Parquet page readers.

Reference parity (SURVEY.md §2.1):
- S1 glob source (cli.rs:443-449), S2 recursive ``**/`` prefixing
  (cli.rs:443-445), S3 hidden-file pruning (cli.rs:416-418),
- S4 canonicalization/dedup (cli.rs:454), S5 literal-path fallback
  (cli.rs:469-482), S6 deterministic ordering (cli.rs:457),
- S7 multi-pattern loop (main.rs:11-20) — each pattern an independent
  Dataset; compose with ``ds.union``.

At scale the "glob" is object-store listing: ``read_pages`` passes the
expanded file list to ``ray.data.read_parquet`` with column pruning and
optional row filters (projection/predicate pushdown to the storage
layer).
"""

from __future__ import annotations

import glob as _glob
import os

import pyarrow as pa


def _is_hidden(path: str) -> bool:
    return os.path.basename(path).startswith(".")


def expand_pattern(
    pattern: str,
    *,
    recursive: bool = False,
    hidden: bool = False,
) -> list[str]:
    """Expand a shell glob into a canonical, deduplicated, sorted file list.

    ``recursive`` prefixes ``**/`` (S2); hidden entries are pruned unless
    ``hidden`` (S3); paths are canonicalized and deduplicated (S4); if the
    glob matches nothing, the pattern is treated as one literal path (S5);
    output is sorted descending like the reference's initial ordering (S6).
    """
    pat = pattern
    if recursive and not pat.startswith("**/"):
        if os.path.isabs(pat):
            # documented divergence: the reference's literal concat
            # ("**/" + pattern, cli.rs:443-445) globs relative to cwd, so
            # for an ABSOLUTE pattern it matches nothing; anchoring the
            # recursion at the pattern's directory is the useful reading
            pat = os.path.join(
                os.path.dirname(pat), "**", os.path.basename(pat)
            )
        else:
            # reference parity (cli.rs:443-445): the WHOLE pattern is
            # prefixed with "**/" as a plain string concat — `corpus/*.rs`
            # becomes `**/corpus/*.rs` (matches the pattern's full relative
            # path at any depth), NOT `corpus/**/*.rs`
            pat = "**/" + pat
    # include_hidden: the reference's glob matches dotfiles and prunes them
    # itself (cli.rs:416-418) — mirror that so --hidden can reveal them
    matches = _glob.glob(pat, recursive=True, include_hidden=True)
    if not matches:
        if os.path.exists(pattern):
            matches = [pattern]
        else:
            raise FileNotFoundError(f"pattern {pattern!r} matched nothing")
    if not hidden:
        matches = [m for m in matches if not _is_hidden(m)]
    canon = sorted({os.path.realpath(m) for m in matches}, reverse=True)
    return canon


def read_pages(
    patterns: str | list[str],
    *,
    columns: list[str] | None = None,
    recursive: bool = False,
    hidden: bool = False,
    filter_expr=None,
):
    """Dataset over parquet pages matched by one or more glob patterns.

    ``columns`` prunes at the read; ``filter_expr`` (a pyarrow dataset
    expression, e.g. ``pc.field("lang") == "en"``) pushes row-group
    filters down to the scan.
    """
    import ray.data as rd

    if isinstance(patterns, str):
        patterns = [patterns]
    files: list[str] = []
    for p in patterns:
        files.extend(expand_pattern(p, recursive=recursive, hidden=hidden))
    kwargs = {}
    if filter_expr is not None:
        kwargs["filter"] = filter_expr
    return rd.read_parquet(files, columns=columns, **kwargs)


def read_web_corpus(
    patterns: str | list[str],
    *,
    recursive: bool = False,
    hidden: bool = False,
    extract: bool = False,
):
    """The canonical web-table ingest: read pages, normalize urls, assign
    stable doc ids; optionally extract text from html (the byte-identical
    extractor). Returns a Dataset with (url, url_norm, doc_id, text, ...)."""
    from lsearch_ray.corpus import assign_doc_ids, extract_text_batch

    ds = read_pages(patterns, recursive=recursive, hidden=hidden)
    ds = ds.map_batches(assign_doc_ids, batch_format="pyarrow")
    if extract:
        ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    return ds
