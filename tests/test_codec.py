"""Posting codec round-trip + block-max metadata (FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from lsearch_ray.index.codec import (
    build_doc_table,
    decode_posting_column,
    encode_shard_postings,
    varint_decode,
    varint_encode,
)


def _roundtrip(values: np.ndarray) -> np.ndarray:
    data, lengths = varint_encode(values)
    assert lengths.sum() == len(data)
    return varint_decode(data)


def test_varint_roundtrip_edges():
    vals = np.array(
        [0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**28, 2**35, 2**63 - 1, 2**64 - 1],
        dtype=np.uint64,
    )
    assert (_roundtrip(vals) == vals).all()


def test_varint_empty():
    data, lengths = varint_encode(np.empty(0, dtype=np.uint64))
    assert len(data) == 0 and len(lengths) == 0
    assert len(varint_decode(data)) == 0


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip_fuzz(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (_roundtrip(arr) == arr).all()


def _make_shard(rng, n_terms=20, max_df=400):
    rows = []
    for t in range(n_terms):
        df = rng.randint(1, max_df)
        doc_ids = np.unique(
            rng.randint(0, 2**40, size=df * 2, dtype=np.int64)
        )[:df]
        df = len(doc_ids)
        tfs = rng.randint(1, 50, size=df).astype(np.int64)
        dls = rng.randint(1, 500, size=df).astype(np.int64)
        rows.append((f"term{t:03d}", doc_ids, tfs, dls))
    terms = pa.array(
        np.repeat([r[0] for r in rows], [len(r[1]) for r in rows]).tolist()
    )
    return (
        rows,
        terms,
        np.concatenate([r[1] for r in rows]),
        np.concatenate([r[2] for r in rows]),
        np.concatenate([r[3] for r in rows]),
    )


def test_shard_encode_roundtrip():
    rng = np.random.RandomState(7)
    rows, terms, doc_ids, tfs, dls = _make_shard(rng)
    dt = build_doc_table(doc_ids)
    table = encode_shard_postings(terms, doc_ids, tfs, dls, block_size=64)
    assert table.num_rows == len(rows)
    by_term = {
        table["term"][i].as_py(): i for i in range(table.num_rows)
    }
    for term, want_docs, want_tfs, want_dls in rows:
        i = by_term[term]
        assert table["df"][i].as_py() == len(want_docs)
        got_docs, got_tfs, got_dls = decode_posting_column(
            table["docs"][i].as_py(), table["tfs"][i].as_py(),
            table["dls"][i].as_py(), dt, 64,
        )
        assert (got_docs == want_docs).all()
        assert (got_tfs == want_tfs).all()
        assert (got_dls == want_dls).all()


def test_block_max_metadata():
    rng = np.random.RandomState(11)
    rows, terms, doc_ids, tfs, dls = _make_shard(rng, n_terms=5, max_df=300)
    block = 64
    table = encode_shard_postings(terms, doc_ids, tfs, dls, block_size=block)
    for i in range(table.num_rows):
        term = table["term"][i].as_py()
        want = next(r for r in rows if r[0] == term)
        _, w_docs, w_tfs, w_dls = want
        skips_last = table["skip_last"][i].as_py()
        skips_maxtf = table["skip_max_tf"][i].as_py()
        skips_mindl = table["skip_min_dl"][i].as_py()
        n_blocks = (len(w_docs) + block - 1) // block
        assert len(skips_last) == n_blocks
        for b in range(n_blocks):
            sl = slice(b * block, min((b + 1) * block, len(w_docs)))
            assert skips_last[b] == w_docs[sl][-1]
            assert skips_maxtf[b] == w_tfs[sl].max()
            assert skips_mindl[b] == w_dls[sl].min()
        # byte offsets: decoding the sub-blob from a block offset onward must
        # yield the tail of the tf sequence (offset correctness probe)
        toffs = table["skip_toff"][i].as_py()
        blob = table["tfs"][i].as_py()
        for b in range(n_blocks):
            tail = varint_decode(np.frombuffer(blob[toffs[b] :], dtype=np.uint8))
            assert (tail.astype(np.int64) == w_tfs[b * block :]).all()


def test_single_term_single_doc():
    t = encode_shard_postings(
        pa.array(["x"]),
        np.array([123456789], dtype=np.int64),
        np.array([3], dtype=np.int64),
        np.array([10], dtype=np.int64),
    )
    d, tf, dl = decode_posting_column(
        t["docs"][0].as_py(), t["tfs"][0].as_py(), t["dls"][0].as_py(),
        np.array([123456789], dtype=np.int64),
    )
    assert list(d) == [123456789] and list(tf) == [3] and list(dl) == [10]


def test_empty_shard():
    t = encode_shard_postings(
        pa.array([], type=pa.string()),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    )
    assert t.num_rows == 0


def test_embedded_doc_table_layout(tmp_path):
    """The shard doc table rides inside postings.parquet (docs_tab row 0):
    single-file atomicity — a rewrite can never pair new table with old
    blobs — and term-filtered reads never touch it (column pruning)."""
    import pyarrow.parquet as pq

    from lsearch_ray.index.codec import doc_table_from_postings
    from lsearch_ray.index.search import _DOC_TABLE_CACHE, _doc_table_for

    rng = np.random.RandomState(11)
    rows, terms, doc_ids, tfs, dls = _make_shard(rng, n_terms=8)
    t = encode_shard_postings(terms, doc_ids, tfs, dls, block_size=64)
    want = build_doc_table(doc_ids)

    # layout: row 0 = LE int64 bytes of the table, all other rows null
    col = t["docs_tab"]
    assert col.null_count == t.num_rows - 1
    got = np.frombuffer(col[0].as_py(), dtype="<i8")
    assert (got == want).all()
    assert (doc_table_from_postings(t) == want).all()

    # loader path: row-group-0 read + (mtime,size)-keyed cache that picks
    # up an atomic rewrite
    p = str(tmp_path / "postings.parquet")
    pq.write_table(t, p)
    assert (_doc_table_for(p) == want).all()
    rows2, terms2, doc_ids2, tfs2, dls2 = _make_shard(rng, n_terms=5)
    t2 = encode_shard_postings(terms2, doc_ids2, tfs2, dls2, block_size=64)
    tmp2 = str(tmp_path / "postings.parquet.tmp")
    pq.write_table(t2, tmp2)
    import os

    os.replace(tmp2, p)
    assert (_doc_table_for(p) == build_doc_table(doc_ids2)).all()
    _DOC_TABLE_CACHE.clear()
