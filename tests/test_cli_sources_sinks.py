"""CLI parser/builder, sources, sinks, metrics."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lsearch_ray.cli import build_runs, main, parse_tokens
from lsearch_ray.sources import expand_pattern, read_pages
from lsearch_ray.stages.sinks import (
    format_grid,
    format_long,
    format_score,
    print_results,
)
from lsearch_ray.state.metrics import AppStats, OpStats, RunStats


def test_parse_bundled_short_flags():
    pats, tokens, flags, k = parse_tokens(["-th", "ContentLoader", "-Ee", "rs"])
    assert tokens == [
        ("content-text", None),
        ("has", "ContentLoader"),
        ("content-ext", None),
        ("is", "rs"),
    ]
    assert pats == [] and k is None


def test_build_runs_reference_example():
    """README.md:17-22: `lsearch -th ContentLoader -Ee rs` → two runs."""
    pats, tokens, flags, _ = parse_tokens(["-th", "ContentLoader", "-Ee", "rs"])
    runs = build_runs(tokens, flags)
    assert len(runs) == 2
    assert runs[0].loader == "text"
    assert [o.kind for o in runs[0].ops] == ["has"]
    assert runs[0].ops[0].target == "ContentLoader"
    assert runs[1].loader == "ext"
    assert runs[1].ops[0].target == "rs"
    # explicitly-started runs default sensitive (cli.rs:264,273,283)
    assert runs[0].insensitive is False


def test_build_runs_default_and_insensitive_flip():
    runs = build_runs([], set())
    assert len(runs) == 1 and runs[0].ops[0].kind == "pass"
    pats, tokens, flags, _ = parse_tokens(["-i", "-th", "x"])
    runs = build_runs(tokens, flags)
    assert runs[0].insensitive is True


def test_less_silently_ignored():
    """Reference parity quirk: --less declared, never implemented (R2)."""
    pats, tokens, flags, _ = parse_tokens(["--content-text", "--less", "x", "--more", "y"])
    runs = build_runs(tokens, flags)
    assert [o.kind for o in runs[0].ops] == ["more"]


def test_expand_pattern(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    for name in ["a.parquet", "b.parquet", ".hidden.parquet"]:
        (d / name).write_bytes(b"x")
    sub = d / "sub"
    sub.mkdir()
    (sub / "c.parquet").write_bytes(b"x")
    got = expand_pattern(str(d / "*.parquet"))
    assert [os.path.basename(p) for p in got] == ["b.parquet", "a.parquet"]
    got_hidden = expand_pattern(str(d / "*.parquet"), hidden=True)
    assert len(got_hidden) == 3
    got_rec = expand_pattern(str(d / "*.parquet"), recursive=True)
    assert any(p.endswith("c.parquet") for p in got_rec)
    # literal fallback
    assert expand_pattern(str(d / "a.parquet")) == [
        os.path.realpath(str(d / "a.parquet"))
    ]
    with pytest.raises(FileNotFoundError):
        expand_pattern(str(d / "nope*.parquet"))


def test_expand_pattern_recursive_relative_parity(tmp_path, monkeypatch):
    """Reference parity (cli.rs:443-445): recursive prefixes ``**/`` to the
    WHOLE relative pattern — ``data/*.parquet`` matches that full relative
    path at ANY depth (so ``nest/data/x.parquet`` matches too), and does
    NOT rewrite to ``data/**/*.parquet`` (so ``data/sub/c.parquet`` — a
    different relative path — must NOT match)."""
    d = tmp_path / "data"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"x")
    (d / "sub").mkdir()
    (d / "sub" / "c.parquet").write_bytes(b"x")
    nest = tmp_path / "nest" / "data"
    nest.mkdir(parents=True)
    (nest / "deep.parquet").write_bytes(b"x")
    monkeypatch.chdir(tmp_path)
    got = {
        os.path.relpath(p, tmp_path)
        for p in expand_pattern("data/*.parquet", recursive=True)
    }
    assert got == {"data/a.parquet", "nest/data/deep.parquet"}


def test_read_pages_prunes_columns(tmp_path):
    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": ["a", "b"], "extra": [0, 0]}), p
    )
    ds = read_pages(p, columns=["doc_id", "text"])
    assert set(ds.schema().names) == {"doc_id", "text"}


def test_formatters():
    assert format_grid(["aa", "b", "cc"], max_line=6) == "aa b\ncc"
    t = pa.table({"url": ["u1", "u2"], "score": [2.0, 1.0]})
    assert format_score(t, "url") == "[2.0] u1\n[1.0] u2"
    long = format_long(t)
    assert "url" in long and "u2" in long
    assert print_results(t, label_col="url", mode="std") == "u1\nu2"


def test_metrics_running_means():
    s = OpStats()
    s.record(2, 100.0, 10.0)
    s.record(2, 300.0, 30.0)
    assert s.n == 4 and s.avg_t_ns == 200.0 and s.avg_size == 20.0
    app = AppStats(runs=[RunStats(loader="text", wall_us=5.0, ops={"has(x)": s})])
    assert "has(x)" in app.summary()
    assert '"n": 4' in app.to_json()


def test_cli_end_to_end(tmp_path, capsys):
    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "url": ["https://a/x.html", "https://b/y.rs", "https://c/z.rs"],
                "text": ["biology notes", "rust code", "more rust biology"],
            }
        ),
        p,
    )
    rc = main([p, "--content-text", "--more", "biology", "--score", "--stats"])
    captured = capsys.readouterr().out
    assert rc == 0
    assert "[2.0] https://a/x.html" in captured
    assert "[2.0] https://c/z.rs" in captured
    # more() never drops (reference: 1 + count >= 1.0) — y.rs ranks last
    assert "[1.0] https://b/y.rs" in captured
    assert captured.index("[2.0]") < captured.index("[1.0]")
    assert "more(biology)" in captured  # stats block


def test_cli_strats(capsys):
    rc = main(["--strats", "--content-text", "--has", "x"])
    out = capsys.readouterr().out
    assert "load[text]" in out and "has(x)" in out


def test_cli_content_exec_udf(tmp_path, capsys):
    """--content-exec module:fn runs a user callable as the content loader
    end-to-end (reference search.rs:125-154 semantics, batch-shaped)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    try:
        p = str(tmp_path / "docs.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int64()),
                    "url": ["https://a/x.html", "https://b/y.rs"],
                    "text": ["biology", "rust"],
                }
            ),
            p,
        )
        # reversed text: 'biology' -> 'ygoloib'; has(ygo) matches doc 1 only
        rc = main(
            [p, "--content-exec", "helpers_exec:reversed_text", "--has", "ygo", "--score"]
        )
        out = capsys.readouterr().out
        assert rc == 0
        assert "https://a/x.html" in out
        assert "https://b/y.rs" not in out
    finally:
        sys.path.remove(os.path.dirname(__file__))


def test_cli_content_exec_strats(capsys):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    try:
        rc = main(
            ["--strats", "--content-exec", "helpers_exec:reversed_text", "--has", "x"]
        )
        out = capsys.readouterr().out
        assert rc == 0
        assert "load[<callable>]" in out and "has(x)" in out
    finally:
        sys.path.remove(os.path.dirname(__file__))


def test_cli_content_exec_bad_spec():
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["--strats", "--content-exec", "nope_no_module:fn", "--has", "x"])


def test_make_snippets_windows_and_marks():
    from lsearch_ray.stages.sinks import make_snippets

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": [
                "x" * 200 + " the Biology lab " + "y" * 200,
                "no match here at all",
                "",
            ],
        }
    )
    out = make_snippets(t, ["biology"], width=40)
    s1 = out["snippet"][0].as_py()
    assert "[Biology]" in s1  # original casing preserved, marked
    assert s1.startswith("…") and s1.endswith("…")
    assert len(s1) < 80
    assert out["snippet"][1].as_py().startswith("no match")  # prefix fallback
    assert out["snippet"][2].as_py() == ""


def test_cli_snippet_flag(tmp_path, capsys):
    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "url": ["https://a/x", "https://b/y"],
                "text": ["deep biology notes here", "rust systems code"],
            }
        ),
        p,
    )
    rc = main([p, "--content-text", "--has", "biology", "--snippet"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "[biology]" in out
    assert "https://a/x:" in out
    assert "https://b/y" not in out


def test_make_snippets_overlapping_terms():
    from lsearch_ray.stages.sinks import make_snippets

    t = pa.table(
        {"text": ["data at rest", "aaa"], "doc_id": pa.array([1, 2], type=pa.int64())}
    )
    out = make_snippets(t, ["data", "at"])
    assert out["snippet"][0].as_py() == "[data] [at] rest"
    out2 = make_snippets(t, ["aa"])
    # self-overlapping hits merge into one clean span
    assert out2["snippet"][1].as_py() == "[aaa]"


def test_cli_spec_is_declarative_and_reference_parity():
    """C3: the parser tables derive from cli.yaml (the clap-yaml
    counterpart of reference src/cli.yaml); reference-defined shorts
    match the reference spec exactly."""
    from lsearch_ray.cli import _BOOL_FLAGS, _LOADER_FLAGS, _SCORER_FLAGS, _SHORT

    # reference src/cli.yaml shorts (cli.yaml:13-133)
    ref_shorts = {
        "e": "is", "n": "not", "h": "has", "H": "hasnt", "m": "more",
        "L": "less", "i": "insensitive", "l": "long", "t": "content-text",
        "E": "content-ext", "T": "content-title", "P": "content-path",
        "C": "content-exec", "r": "recursive", "a": "hidden",
    }
    for ch, name in ref_shorts.items():
        assert _SHORT.get(ch) == name, (ch, name, _SHORT.get(ch))
    assert set(_SCORER_FLAGS) == {"is", "not", "has", "hasnt", "more", "less"}
    assert _LOADER_FLAGS == {
        "content-text": "text", "content-title": "title",
        "content-path": "url", "content-ext": "ext",
    }
    assert {"recursive", "hidden", "echo", "stats", "strats"} <= _BOOL_FLAGS


def test_cli_reference_short_aliases_parse():
    """-P/-a/-C bundled shorts (reference spec) reach the plan builder."""
    pats, tokens, flags, _ = parse_tokens(["-P", "-a", "x.parquet"])
    assert "hidden" in flags
    assert [t[0] for t in tokens] == ["content-path"]
    pats, tokens, flags, _ = parse_tokens(["-C", "mod:fn", "-h", "y"])
    assert tokens[0] == ("content-exec", "mod:fn")
    assert tokens[1] == ("has", "y")
