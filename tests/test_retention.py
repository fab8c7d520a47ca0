"""Retention cohort matrix vs a pure-pandas reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.functions.funnel import retention_cohorts_ds

DAY_US = 86_400_000_000


def _events():
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [
        # user 1: active day 0, day 1, day 3
        (1, 0.5), (1, 0.6), (1, 1.2), (1, 3.9),
        # user 2: joins day 1, returns day 2
        (2, 1.1), (2, 2.0),
        # user 3: one event only
        (3, 0.0),
        # user 4: joins day 2, twice same day (dedupes to one cell)
        (4, 2.2), (4, 2.8),
    ]
    ts = [base + np.timedelta64(int(d * DAY_US), "us") for _, d in rows]
    return pa.table(
        {
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def _ref(tab: pa.Table) -> pd.DataFrame:
    df = tab.to_pandas()
    df["day"] = df["ts"].dt.floor("D")
    df = df.drop_duplicates(["user_id", "day"])
    first = df.groupby("user_id")["day"].min().rename("cohort")
    df = df.join(first, on="user_id")
    df["age_days"] = ((df["day"] - df["cohort"]).dt.days).astype("int64")
    out = (
        df.groupby(["cohort", "age_days"])["user_id"]
        .nunique()
        .rename("n_users")
        .reset_index()
        .sort_values(["cohort", "age_days"])
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def test_retention_matches_pandas_reference():
    tab = _events()
    got = retention_cohorts_ds(rd.from_arrow(tab).repartition(3)).to_pandas()
    expect = _ref(tab)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), expect, check_dtype=False
    )
    # shape sanity: user 1 contributes ages 0,1,3 in cohort day-0
    c0 = got[got["cohort"] == got["cohort"].min()]
    assert set(c0["age_days"]) == {0, 1, 3}


def test_retention_null_rows_dropped():
    tab = _events()
    with_null = pa.table(
        {
            "user_id": pa.concat_arrays(
                [tab["user_id"].combine_chunks(), pa.array([None, 9], pa.int64())]
            ),
            "ts": pa.concat_arrays(
                [
                    tab["ts"].combine_chunks(),
                    pa.array(
                        [np.datetime64("2024-01-05T00:00:00", "us"), None],
                        pa.timestamp("us"),
                    ),
                ]
            ),
        }
    )
    got = retention_cohorts_ds(rd.from_arrow(with_null)).to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), _ref(tab), check_dtype=False
    )


def test_audience_overlap_matches_pandas_reference():
    from itertools import combinations

    from lsearch_ray.functions.funnel import audience_overlap_ds

    rows = [
        ("a", 1), ("a", 2), ("a", 3), ("a", 3),   # A = {1,2,3}
        ("b", 2), ("b", 3), ("b", 4),             # B = {2,3,4}
        ("c", 9),                                 # C = {9} (no overlap)
        ("d", 1), ("d", 2), ("d", 3), ("d", 4),   # D ⊇ A∪B
    ]
    tab = pa.table(
        {
            "event_type": [t for t, _ in rows],
            "user_id": pa.array([u for _, u in rows], pa.int64()),
        }
    )
    got = audience_overlap_ds(rd.from_arrow(tab).repartition(3)).to_pandas()
    sets = {}
    for t, u in rows:
        sets.setdefault(t, set()).add(u)
    expect = []
    for ta, tb in combinations(sorted(sets), 2):
        c = len(sets[ta] & sets[tb])
        if not c:
            continue
        un = len(sets[ta] | sets[tb])
        expect.append((ta, tb, c, un, c * 1_000_000 // un))
    assert [tuple(r) for r in got.itertuples(index=False)] == expect
    # c must not pair with anything
    assert "c" not in set(got["type_a"]) | set(got["type_b"])


def test_audience_overlap_no_common_users():
    from lsearch_ray.functions.funnel import audience_overlap_ds

    tab = pa.table(
        {
            "event_type": ["a", "b"],
            "user_id": pa.array([1, 2], pa.int64()),
        }
    )
    got = audience_overlap_ds(rd.from_arrow(tab))
    assert got.count() == 0
    # Ray's to_pandas drops columns on a 0-row dataset; the Dataset
    # schema is the contract
    assert got.schema().names == [
        "type_a", "type_b", "n_common", "n_union", "jaccard_micro",
    ]


@pytest.mark.parametrize("blocks", [1, 3])
def test_transition_counts_matches_pandas(blocks):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.funnel import transition_counts_ds

    rng = np.random.RandomState(7)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                rng.randint(0, 10**6, n) * 1000, unit="us"
            ),
            "user_id": rng.randint(0, 40, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c", "d"], n),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    out = transition_counts_ds(ds, k=10, num_partitions=4)

    s = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    same = s["user_id"].to_numpy()[:-1] == s["user_id"].to_numpy()[1:]
    src = s["event_type"].to_numpy()[:-1][same]
    dst = s["event_type"].to_numpy()[1:][same]
    ref = (
        pd.DataFrame({"src_type": src, "dst_type": dst})
        .value_counts()
        .reset_index(name="n")
        .sort_values(["n", "src_type", "dst_type"],
                     ascending=[False, True, True], kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    got = out.to_pandas()
    assert got.equals(ref[["src_type", "dst_type", "n"]].astype(
        {"n": "int64"}))


def test_transition_counts_null_and_separator_types():
    """Null event types are excluded (not merged into a null pair), and
    a type string containing \\x01 must survive intact — the pair count
    is taken on the two columns directly, not a separator rendering."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.funnel import transition_counts_ds

    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4, 5],
            "ts": pd.to_datetime([1, 2, 3, 4, 5, 6], unit="s"),
            "user_id": [1, 1, 1, 1, 2, 2],
            "event_type": ["a\x01b", "c", None, "c", "x", "x"],
        }
    )
    out = transition_counts_ds(
        rd.from_arrow(pa.Table.from_pandas(df)), k=10, num_partitions=2
    ).to_pandas()
    got = {
        (r.src_type, r.dst_type): r.n for r in out.itertuples(index=False)
    }
    # user 1 stream after null exclusion: a\x01b -> c -> c
    assert got == {("a\x01b", "c"): 1, ("c", "c"): 1, ("x", "x"): 1}


def test_basket_lift_matches_python_reference():
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.funnel import basket_lift_ds

    rows = [
        ("view", 1), ("view", 2), ("view", 3), ("view", 3),
        ("click", 1), ("click", 2),
        ("buy", 1),
        ("rare", 9),
        (None, 5), ("view", None),  # nulls excluded
    ]
    tbl = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    got = {
        (r["type_a"], r["type_b"]): (
            int(r["n_common"]),
            int(r["n_a"]),
            int(r["n_b"]),
            int(r["n_users"]),
            int(r["lift_micro"]),
        )
        for r in basket_lift_ds(rd.from_arrow(tbl)).take_all()
    }
    aud: dict[str, set[int]] = {}
    for t, u in rows:
        if t is not None and u is not None:
            aud.setdefault(t, set()).add(u)
    n_users = len({u for s in aud.values() for u in s})
    expected = {}
    for a, b in itertools.combinations(sorted(aud), 2):
        common = len(aud[a] & aud[b])
        if not common:
            continue
        expected[(a, b)] = (
            common,
            len(aud[a]),
            len(aud[b]),
            n_users,
            common * n_users * 10**6 // (len(aud[a]) * len(aud[b])),
        )
    assert got == expected
    # click ⊂ view: maximal association, lift = N/|view| > 1e6
    # (N = 4 users after null exclusion; 2·4·10⁶ // (2·3))
    assert got[("click", "view")][4] == 1_333_333 > 10**6
