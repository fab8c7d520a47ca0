import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.mixture import quota_sample
from lsearch_ray.functions.sampling import _key_hash63


def _table(n=200, seed=9):
    rng = np.random.default_rng(seed)
    langs = rng.choice(["en", "de", "fr", "zh"], size=n, p=[0.6, 0.2, 0.1, 0.1])
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
        }
    )


def _ref_quota(t: pa.Table, caps: dict) -> list[tuple[int, str]]:
    h = _key_hash63(t["doc_id"])
    rows = sorted(
        zip(t["lang"].to_pylist(), h.tolist(), t["doc_id"].to_pylist())
    )
    kept, seen = [], {}
    for lang, hv, d in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        c = seen.get(lang, 0)
        if c < caps.get(lang, 0):
            kept.append((d, lang))
            seen[lang] = c + 1
    return sorted(kept)


def test_quota_sample_exact_counts_and_membership():
    t = _table()
    caps = {"en": 30, "de": 15, "fr": 1000}
    got = sorted(
        (r["doc_id"], r["lang"])
        for r in quota_sample(
            rd.from_arrow(t).repartition(5), "lang", "doc_id", caps
        ).take_all()
    )
    assert got == _ref_quota(t, caps)
    from collections import Counter

    by_lang = Counter(lang for _, lang in got)
    n_fr = t["lang"].to_pylist().count("fr")
    assert by_lang == {"en": 30, "de": 15, "fr": n_fr}  # zh dropped, fr uncapped


def test_quota_sample_partition_invariant():
    t = _table(seed=21)
    caps = {"en": 10, "zh": 5}
    outs = []
    for parts in (1, 7):
        outs.append(
            sorted(
                (r["doc_id"], r["lang"])
                for r in quota_sample(
                    rd.from_arrow(t).repartition(parts), "lang", "doc_id", caps
                ).take_all()
            )
        )
    assert outs[0] == outs[1]


def test_quota_sample_all_null_stratum_batch():
    # a block whose stratum column is ENTIRELY null must filter to empty,
    # not crash the sentinel lookup (cats == [] in that batch)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "lang": pa.array([None, None], type=pa.string()),
        }
    )
    assert quota_sample(rd.from_arrow(t), "lang", "doc_id", {"en": 5}).take_all() == []


def test_quota_sample_null_strata_dropped():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "lang": pa.array(["en", None, "en"]),
        }
    )
    got = quota_sample(rd.from_arrow(t), "lang", "doc_id", {"en": 10}).take_all()
    assert sorted(r["doc_id"] for r in got) == [0, 2]


def test_quota_sample_matches_duckdb():
    import __ray_entry__ as entry_mod

    t = _table(n=300, seed=4)
    got = [
        (r["doc_id"], r["lang"])
        for r in quota_sample(
            rd.from_arrow(t).repartition(4),
            "lang",
            "doc_id",
            entry_mod._QUOTA_CAPS,
        )
        .sort("doc_id")
        .take_all()
    ]
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute(entry_mod.oracle_sql()["quota_sample"]).fetchall()
    assert got == [tuple(r) for r in exp]


def test_temperature_rates_math():
    from lsearch_ray.functions.mixture import temperature_rates

    # counts {a: 100, b: 1}: total 101, T = 33, w = {10, 1}, W = 11
    rates = temperature_rates({"a": 100, "b": 1}, target_num=1, target_den=3)
    assert rates["a"] == ((33 * 10 * 10**6) // (100 * 11), 10**6)
    # tail stratum saturates at keep-all
    assert rates["b"] == (10**6, 10**6)
    # degenerate inputs
    assert temperature_rates({})== {}
    assert temperature_rates({"z": 0})["z"] == (0, 10**6)


def test_temperature_sample_matches_manual_filter(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.mixture import temperature_rates, temperature_sample
    from lsearch_ray.functions.sampling import _key_hash63

    n = 400
    ids = np.arange(n, dtype=np.int64)
    langs = np.where(ids % 10 == 0, "rare", "common")
    tab = pa.table({"k": pa.array(ids), "lang": pa.array(langs.tolist())})
    out = temperature_sample(
        rd.from_arrow(tab).repartition(3), "k", "lang",
        target_num=1, target_den=2,
    ).to_pandas()

    counts = {"rare": 40, "common": 360}
    rates = temperature_rates(counts, target_num=1, target_den=2)
    h = _key_hash63(pa.array([str(i) for i in ids])).astype(np.uint64)
    keep = np.array(
        [h[i] % rates[langs[i]][1] < rates[langs[i]][0] for i in range(n)]
    )
    assert sorted(out["k"]) == sorted(ids[keep])
    # the rare stratum must be kept at a HIGHER rate than the head
    assert rates["rare"][0] > rates["common"][0]
