"""Result sinks: parquet writer + the reference's presentation formats.

Reference parity (SURVEY.md §2.1): K1 grid (cli.rs:651-688, MAX_LINE=80),
K2 score lines (cli.rs:573-585), K3 long format (cli.rs:587-621 — we
render carried metadata columns instead of fs perm bits; the reference's
perm-bit rendering is buggy and fs-specific, SURVEY.md §2.1 note), K4
bare lines (cli.rs:623-635), K5 dispatch (cli.rs:520-527).

The engine sink is ``write_results`` (partitioned parquet — resumable);
formatters are driver-side presentation over small result tables.
"""

from __future__ import annotations

import pyarrow as pa

MAX_LINE = 80


def format_grid(items: list[str], max_line: int = MAX_LINE) -> str:
    """Column-aligned grid within ``max_line`` chars (reference
    ``grid_print``: column width = longest item + 1)."""
    if not items:
        return ""
    width = max(len(s) for s in items) + 1
    per_row = max(1, max_line // width)
    lines = []
    for i in range(0, len(items), per_row):
        lines.append("".join(s.ljust(width) for s in items[i : i + per_row]).rstrip())
    return "\n".join(lines)


def format_score(table: pa.Table, label_col: str, score_col: str = "score") -> str:
    """``[score] label`` lines (reference ScoreFormatter)."""
    return "\n".join(
        f"[{s}] {v}"
        for s, v in zip(table[score_col].to_pylist(), table[label_col].to_pylist())
    )


def format_long(table: pa.Table, columns: list[str] | None = None) -> str:
    """One row per line, fixed-width metadata columns then the label
    (reference LongFormatter shape, minus fs perm bits)."""
    cols = columns or table.column_names
    widths = {
        c: max([len(c)] + [len(str(v)) for v in table[c].to_pylist()]) for c in cols
    }
    lines = ["  ".join(c.ljust(widths[c]) for c in cols)]
    for i in range(table.num_rows):
        lines.append(
            "  ".join(str(table[c][i].as_py()).ljust(widths[c]) for c in cols)
        )
    return "\n".join(lines)


def format_std(items: list[str]) -> str:
    """Bare line-per-item (reference StdFormatter)."""
    return "\n".join(items)


def print_results(
    table: pa.Table,
    *,
    label_col: str,
    mode: str = "grid",
    score_col: str = "score",
) -> str:
    """Sink dispatch (K5): long/score → linear; else grid."""
    if mode == "score":
        return format_score(table, label_col, score_col)
    if mode == "long":
        return format_long(table)
    if mode == "std":
        return format_std(table[label_col].to_pylist())
    return format_grid(table[label_col].to_pylist())


def write_results(ds, out_dir: str, *, partition_cols: list[str] | None = None):
    """Engine sink: partitioned parquet directory (resumable layout)."""
    ds.write_parquet(out_dir, partition_cols=partition_cols)


def make_snippets(
    table: pa.Table,
    terms: list[str],
    *,
    text_col: str = "text",
    width: int = 100,
    marks: tuple[str, str] = ("[", "]"),
) -> pa.Table:
    """Append a ``snippet`` column: a ±width/2 context window around the
    first case-insensitive occurrence of any term, with every term
    occurrence inside the window wrapped in ``marks`` (grep -C analog).

    Driver-side presentation over a top-k result table (like the other
    formatters) — a per-row loop is fine at k-scale; don't put this in a
    corpus-wide map stage.
    """
    from lsearch_ray.analyzer import ascii_lower

    folded = [ascii_lower(t) for t in terms if t]
    texts = table[text_col].to_pylist()
    out: list[str] = []
    half = max(1, width // 2)
    for text in texts:
        text = text or ""
        low = ascii_lower(text)
        first = -1
        for t in folded:
            p = low.find(t)
            if p != -1 and (first == -1 or p < first):
                first = p
        start = max(0, first - half) if first != -1 else 0
        end = min(len(text), (first if first != -1 else 0) + half)
        window = text[start:end]
        wlow = low[start:end]
        # collect occurrences, merge overlapping/adjacent spans (multi-term
        # or self-overlapping hits would otherwise nest brackets), then
        # mark back-to-front so offsets stay valid
        hits: list[tuple[int, int]] = []
        for t in folded:
            p = wlow.find(t)
            while p != -1:
                hits.append((p, p + len(t)))
                p = wlow.find(t, p + 1)
        merged: list[tuple[int, int]] = []
        for s, e in sorted(hits):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        for s, e in reversed(merged):
            window = window[:s] + marks[0] + window[s:e] + marks[1] + window[e:]
        prefix = "…" if start > 0 else ""
        suffix = "…" if end < len(text) else ""
        out.append(prefix + window + suffix)
    return table.append_column("snippet", pa.array(out, type=pa.string()))
