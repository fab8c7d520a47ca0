import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from lsearch_ray.functions.kmeans import _assign, _round6, kmeans_assign


def _emb_table(mat: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(range(len(mat)), type=pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in mat],
                type=pa.list_(pa.float32()),
            ),
        }
    )


def test_kmeans_separated_clusters():
    rng = np.random.default_rng(3)
    a = rng.normal(0.0, 0.05, size=(20, 4))
    b = rng.normal(5.0, 0.05, size=(20, 4))
    mat = np.concatenate([a[:1], b[:1], a[1:], b[1:]])  # seeds 0,1 in each blob
    ds = rd.from_arrow(_emb_table(mat)).repartition(3)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(ds, k=2, iters=2).take_all()
    }
    assert got[0] == 0 and got[1] == 1
    assert all(got[i] == 0 for i in range(2, 21))
    assert all(got[i] == 1 for i in range(21, 40))


def test_assign_ties_and_dead_clusters():
    m = np.array([[1.0, 0.0]])
    cents = np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 0.0]])
    alive = np.ones(3, dtype=bool)
    # clusters 0 and 1 tie at distance 1; 2 is exact -> wins
    assert _assign(m, cents, alive).tolist() == [2]
    alive[2] = False
    # dead cluster excluded; tie between 0 and 1 -> lowest index
    assert _assign(m, cents, alive).tolist() == [0]


def test_round6_matches_oracle_arithmetic():
    x = np.array([1.2345674, 1.2345675, -0.0000004, -0.0000006])
    assert _round6(x).tolist() == [1.234567, 1.234568, 0.0, -0.000001]


def test_kmeans_matches_duckdb():
    import __ray_entry__ as entry_mod

    rng = np.random.default_rng(17)
    # three loose blobs + uniform noise so near-boundary points exercise
    # the rounding contract
    mat = np.concatenate(
        [
            rng.normal(0.0, 1.0, size=(40, 8)),
            rng.normal(2.0, 1.0, size=(40, 8)),
            rng.normal(-2.0, 1.0, size=(40, 8)),
            rng.uniform(-3, 3, size=(30, 8)),
        ]
    )
    t = _emb_table(mat)
    got = [
        (r["vec_id"], r["cluster"])
        for r in kmeans_assign(
            rd.from_arrow(t).repartition(4),
            k=entry_mod._KMEANS_K,
            iters=entry_mod._KMEANS_ITERS,
        )
        .sort("vec_id")
        .take_all()
    ]
    con = duckdb.connect()
    con.register("embeddings", t)
    exp = con.execute(entry_mod.oracle_sql()["kmeans_clusters"]).fetchall()
    assert got == [tuple(r) for r in exp]


def test_kmeans_needs_k_vectors():
    import pytest

    ds = rd.from_arrow(_emb_table(np.zeros((2, 3))))
    with pytest.raises(ValueError):
        kmeans_assign(ds, k=5)


def test_kmeans_seed_ignores_null_ids():
    t = pa.table(
        {
            "vec_id": pa.array([None, 3, 1, None, 2], type=pa.int64()),
            "embedding": pa.array(
                [[0.0, 0.0], [3.0, 3.0], [1.0, 1.0], [9.0, 9.0], [2.0, 2.0]],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    # iters=0 assigns against the raw seeds: they must be ids 1 and 2
    # (nulls skipped), so those exact points land in clusters 0 and 1
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(rd.from_arrow(t), k=2, iters=0).take_all()
        if r["vec_id"] is not None
    }
    assert got[1] == 0 and got[2] == 1 and got[3] == 1
