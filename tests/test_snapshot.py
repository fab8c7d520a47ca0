"""Crawl snapshot diff: join-free added/removed/changed/same labeling.

No reference coverage (SURVEY.md §2.9 — the reference re-scans from
scratch every run, `cli.rs:443-455`); semantics pinned against a
dict-based Python replay.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.snapshot import snapshot_diff_ds


def _ds(rows: dict[int, int]):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(rows), pa.int64()),
                "fp64": pa.array(list(rows.values()), pa.int64()),
            }
        )
    )


def test_snapshot_diff_all_statuses():
    a = {1: 100, 2: 200, 3: 300, 4: 400}
    b = {2: 200, 3: 333, 4: 400, 9: 900}
    out = {
        int(r["doc_id"]): r["status"]
        for r in snapshot_diff_ds(_ds(a), _ds(b)).take_all()
    }
    expected = {}
    for k in sorted(set(a) | set(b)):
        if k not in b:
            expected[k] = "removed"
        elif k not in a:
            expected[k] = "added"
        elif a[k] == b[k]:
            expected[k] = "same"
        else:
            expected[k] = "changed"
    assert out == expected
    assert expected == {1: "removed", 2: "same", 3: "changed", 4: "same", 9: "added"}


def test_snapshot_diff_identical_and_disjoint():
    a = {7: 70, 8: 80}
    assert {
        r["status"] for r in snapshot_diff_ds(_ds(a), _ds(a)).take_all()
    } == {"same"}
    out = {
        int(r["doc_id"]): r["status"]
        for r in snapshot_diff_ds(_ds({1: 10}), _ds({2: 20})).take_all()
    }
    assert out == {1: "removed", 2: "added"}


def test_snapshot_diff_zero_fingerprint_not_absent():
    """fp64 == 0 is a legal fingerprint and must not read as 'absent'."""
    out = {
        int(r["doc_id"]): r["status"]
        for r in snapshot_diff_ds(
            _ds({1: 0, 2: 0}), _ds({1: 0, 2: 5})
        ).take_all()
    }
    assert out == {1: "same", 2: "changed"}
