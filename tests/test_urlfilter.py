"""URL blocklist gate: rule ordering, host parsing, RE2 parity.

Generalizes the reference's hidden-file pruning (`cli.rs:416-418`,
SURVEY §2 S3) into the crawl-ingest domain/pattern filter.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.urlfilter import url_gate_ds


def _run(urls, **kw):
    ds = rd.from_arrow(
        pa.table(
            {"i": pa.array(range(len(urls)), pa.int64()), "url": urls}
        )
    )
    out = url_gate_ds(ds, **kw).to_pandas().sort_values("i")
    return list(zip(out["host"], out["verdict"]))


def test_url_gate_rule_order_and_host_parse():
    urls = [
        "https://bad.example.com/page",        # exact host
        "https://ads.tracker.net/x",           # suffix
        "http://ok.site.org/cal?year=2031",    # pattern
        "https://bad.example.com/cal?year=2031",  # exact wins over pattern
        "https://fine.org/article",            # keep
        "not a url at all",                    # unparseable -> host ''
    ]
    got = _run(
        urls,
        exact_hosts=["bad.example.com"],
        host_suffixes=[".tracker.net"],
        url_patterns=[("blocked_pattern", r"\?year=[0-9]{4}$")],
    )
    assert got == [
        ("bad.example.com", "blocked_host"),
        ("ads.tracker.net", "blocked_suffix"),
        ("ok.site.org", "blocked_pattern"),
        ("bad.example.com", "blocked_host"),
        ("fine.org", "keep"),
        ("", "keep"),
    ]


def test_url_gate_pattern_catches_unparseable_and_no_rules():
    got = _run(
        ["garbage with session=deadbeef inside"],
        url_patterns=[("blocked_pattern", "session=[0-9a-f]+")],
    )
    assert got == [("", "blocked_pattern")]
    assert _run(["https://x.org/a"]) == [("x.org", "keep")]


def test_url_gate_first_listed_pattern_wins():
    got = _run(
        ["https://h.io/a?session=ff&year=2030"],
        url_patterns=[
            ("blocked_session", "session=[0-9a-f]+"),
            ("blocked_calendar", "year=[0-9]{4}"),
        ],
    )
    assert got == [("h.io", "blocked_session")]
