"""URL blocklist gate: the crawl-ingest filter every web-scale corpus
pipeline runs before extraction (Dolma/RefinedWeb-style domain
blocklists + URL pattern rules).

Three rule classes, applied IN ORDER with first-match-wins:

1. exact host blocklist   (host ∈ set)
2. host suffix blocklist  (host ends with any listed suffix — the
   ``*.ads.example`` wildcard form)
3. URL RE2 patterns       (path/query shapes — session ids, calendars,
   infinite scrolls)

Everything is map-side and vectorized: the rule set travels in the
closure (blocklists at crawl scale are broadcast once per actor, never
per row — a 10M-domain list is still MBs), hosts come from one
``extract_regex`` pass, suffix/pattern rules are one Arrow kernel call
each, and the verdict fold is a single ``np.select``. No shuffle, no
driver state; both pyarrow.compute and DuckDB run RE2 so the SQL twin
replays the patterns exactly (the redact precedent,
textstats.DEFAULT_REDACT_PATTERNS).

Reference counterpart: the reference's hidden-file pruning
(`cli.rs:416-418` — drop paths whose basename starts with '.') is the
single-rule ancestor of this gate; SURVEY §2 S3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)"


def url_gate_ds(
    ds,
    *,
    url_col: str = "url",
    exact_hosts: list[str] | None = None,
    host_suffixes: list[str] | None = None,
    url_patterns: list[tuple[str, str]] | None = None,
):
    """Append ``host`` and ``verdict`` to every row: 'blocked_host' /
    'blocked_suffix' / the pattern's own verdict label / 'keep'.
    ``url_patterns`` is [(verdict_label, RE2 pattern)], applied in list
    order after the host rules. Unparseable URLs get host '' (and can
    only be caught by pattern rules)."""
    exact = sorted(set(exact_hosts or []))
    suffixes = sorted(set(host_suffixes or []))
    patterns = list(url_patterns or [])
    exact_set = pa.array(exact, type=pa.large_string())

    def gate(b: pa.Table) -> pa.Table:
        urls = b[url_col]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        urls = urls.cast(pa.large_string())
        ex = pc.extract_regex(urls, _HOST_RE)
        host = pc.if_else(
            pc.is_null(ex),
            pa.scalar("", type=pa.large_string()),
            pc.struct_field(ex, "host"),
        ).cast(pa.large_string())
        conds: list[np.ndarray] = []
        labels: list[str] = []
        if exact:
            conds.append(
                pc.is_in(host, value_set=exact_set).to_numpy(
                    zero_copy_only=False
                )
            )
            labels.append("blocked_host")
        if suffixes:
            m = np.zeros(b.num_rows, dtype=bool)
            for s in suffixes:
                m |= pc.ends_with(host, pattern=s).to_numpy(
                    zero_copy_only=False
                )
            conds.append(m)
            labels.append("blocked_suffix")
        for label, pat in patterns:
            conds.append(
                pc.match_substring_regex(urls, pattern=pat).to_numpy(
                    zero_copy_only=False
                )
            )
            labels.append(label)
        verdict = (
            np.select(conds, labels, default="keep")
            if conds
            else np.full(b.num_rows, "keep", dtype=object)
        )
        return b.append_column(
            "host", host
        ).append_column(
            "verdict", pa.array(verdict.tolist(), type=pa.large_string())
        )

    return ds.map_batches(gate, batch_format="pyarrow")
