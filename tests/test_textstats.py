"""Text analysis + skew helper + multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lsearch_ray.functions import (
    LangId,
    bpe_ish_token_count,
    fingerprint,
    quality_stats,
    salted_groupby_sum,
)
from lsearch_ray.functions.multimodal import (
    DecodeImage,
    SampleFrames,
    embed_image,
    suggest_batch_size,
)


def test_langid():
    t = pa.table(
        {
            "text": [
                "the cat is on the mat and the dog is in the house with the bird",
                "el gato esta en la casa y el perro en el jardin con los ninos",
                "der hund ist in dem haus und die katze auf dem dach mit den kindern",
                "xyzzy qwerty plugh",
            ]
        }
    )
    out = LangId()(t)
    assert out["lang_pred"].to_pylist() == ["en", "es", "de", "und"]
    assert out["lang_score"][0].as_py() > 0.3


def test_quality_stats():
    t = pa.table({"text": ["The cat sat. 123!", ""]})
    out = quality_stats(t)
    r = out.to_pylist()[0]
    assert r["n_tokens"] == 4  # the cat sat 123
    assert r["digit_ratio"] == pytest.approx(3 / 17, abs=1e-6)
    assert r["upper_ratio"] == pytest.approx(1 / 17, abs=1e-6)
    assert r["stopword_ratio"] == pytest.approx(1 / 4)
    empty = out.to_pylist()[1]
    assert empty["n_tokens"] == 0 and empty["mean_token_len"] == 0.0


def test_bpe_ish_count():
    t = pa.table({"text": ["Hello, world! 42 times"]})
    # tokens: Hello , world ! 42 times -> 6
    assert bpe_ish_token_count(t)["n_bpe_tokens"].to_pylist() == [6]


def test_fingerprint_order_sensitive_case_insensitive():
    t = pa.table({"text": ["a b c", "A  b C", "c b a", ""]})
    fp = fingerprint(t)["fp64"].to_pylist()
    assert fp[0] == fp[1]  # case/whitespace insensitive
    assert fp[0] != fp[2]  # order sensitive
    assert isinstance(fp[3], int)


def test_salted_groupby_sum():
    n = 5000
    rng = np.random.RandomState(0)
    keys = np.where(rng.rand(n) < 0.7, "hot", rng.choice(["a", "b", "c"], n))
    vals = rng.randint(0, 10, n)
    t = pa.table({"k": keys.tolist(), "v": pa.array(vals, type=pa.int64())})
    out = salted_groupby_sum(rd.from_arrow(t), "k", ["v"], salt=8)
    got = {r["k"]: r["v"] for r in out.take_all()}
    import collections

    want = collections.defaultdict(int)
    for k, v in zip(keys, vals):
        want[k] += int(v)
    assert got == dict(want)


def test_decode_image_fake_and_stub():
    t = pa.table(
        {
            "img_id": pa.array([1, 2], type=pa.int64()),
            "image": pa.array([b"\x03\x04abcdef", b""], type=pa.binary()),
        }
    )
    out = DecodeImage(image_col="image")(t)
    r = out.to_pylist()[0]
    assert r["height"] == 1 + 3 % 8 and r["width"] == 1 + 4 % 8
    assert len(r["pixels"]) == r["height"] * r["width"] * 3
    # unsupported format in real mode raises, naming the missing decoder
    with pytest.raises(ValueError):
        DecodeImage(image_col="image", fake=False)(
            pa.table({"image": pa.array([b"\x89PNGfake"], type=pa.binary())})
        )


def _ppm_bytes(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + px.tobytes()


def _bmp24_bytes(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    header = bytearray(54)
    header[0:2] = b"BM"
    header[10:14] = (54).to_bytes(4, "little")
    header[14:18] = (40).to_bytes(4, "little")
    header[18:22] = w.to_bytes(4, "little")
    header[22:26] = h.to_bytes(4, "little")
    header[26:28] = (1).to_bytes(2, "little")
    header[28:30] = (24).to_bytes(2, "little")
    return bytes(header) + body.tobytes()


def test_decode_image_real_ppm_bmp_through_ray():
    """fake=False REALLY decodes: pure-numpy PPM(P6)/BMP24 paths, driven
    through an actor-pool map_batches stage."""
    rng = np.random.RandomState(5)
    px1 = rng.randint(0, 256, size=(3, 5, 3), dtype=np.uint8)
    px2 = rng.randint(0, 256, size=(4, 2, 3), dtype=np.uint8)
    t = pa.table(
        {
            "img_id": pa.array([1, 2], type=pa.int64()),
            "image": pa.array(
                [_ppm_bytes(px1), _bmp24_bytes(px2)], type=pa.binary()
            ),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            DecodeImage,
            fn_constructor_kwargs={"image_col": "image", "fake": False},
            batch_format="pyarrow",
            concurrency=1,
        )
        .take_all()
    )
    by_id = {r["img_id"]: r for r in out}
    assert (by_id[1]["height"], by_id[1]["width"]) == (3, 5)
    assert by_id[1]["pixels"] == px1.tobytes()
    assert (by_id[2]["height"], by_id[2]["width"]) == (4, 2)
    assert by_id[2]["pixels"] == px2.tobytes()


def test_decode_image_pil_path():
    """PIL-backed decode for compressed formats — runs where PIL exists."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    px = np.random.RandomState(3).randint(0, 256, size=(6, 4, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PIL_Image.fromarray(px).save(buf, format="PNG")
    t = pa.table({"image": pa.array([buf.getvalue()], type=pa.binary())})
    out = DecodeImage(image_col="image", fake=False)(t)
    r = out.to_pylist()[0]
    assert (r["height"], r["width"]) == (6, 4)
    assert r["pixels"] == px.tobytes()


def test_sample_frames_flatmap_shape():
    t = pa.table(
        {
            "vid_id": pa.array([7], type=pa.int64()),
            "video": pa.array([b"0123456789abcdef" * 2], type=pa.binary()),
        }
    )
    out = SampleFrames(video_col="video", every_n=1)(t)
    assert out.column_names == ["vid_id", "frame_idx", "frame"]
    assert out.num_rows >= 1
    assert all(v == 7 for v in out["vid_id"].to_pylist())


def test_embed_image_matches_numpy_reference():
    """The real feature: grid mean-pool + color histogram, L2-normalized,
    verified against an independent straightforward-numpy computation."""
    rng = np.random.RandomState(9)
    h, w, grid, bins = 6, 10, 2, 4
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    t = pa.table(
        {
            "pixels": pa.array([px.tobytes()], type=pa.large_binary()),
            "height": pa.array([h], type=pa.int32()),
            "width": pa.array([w], type=pa.int32()),
        }
    )
    out = embed_image(t, grid=grid, bins=bins)
    v = np.asarray(out["embedding"][0].as_py(), dtype=np.float64)
    assert len(v) == grid * grid * 3 + bins * 3
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)
    # independent reference: explicit block slicing + np.histogram
    ref_pool = []
    for c in range(3):
        for gi in range(grid):
            for gj in range(grid):
                rs = [r for r in range(h) if (r * grid) // h == gi]
                cs = [cc for cc in range(w) if (cc * grid) // w == gj]
                ref_pool.append(px[np.ix_(rs, cs, [c])].mean() / 255.0)
    ref_hist = []
    for c in range(3):
        cnt, _ = np.histogram(px[:, :, c], bins=bins, range=(0, 256))
        ref_hist.extend(cnt / (h * w))
    ref = np.concatenate([ref_pool, ref_hist])
    ref = (ref / np.linalg.norm(ref)).astype(np.float32)
    np.testing.assert_array_equal(v.astype(np.float32), ref)


def test_embed_image_smaller_than_grid_has_no_nan():
    """An image smaller than the pooling grid leaves empty cells: they
    must pool to 0.0, never 0/0 = NaN (review finding r4)."""
    px = np.full((2, 1, 3), 200, dtype=np.uint8)
    t = pa.table(
        {
            "pixels": pa.array([px.tobytes()], type=pa.large_binary()),
            "height": pa.array([2], type=pa.int32()),
            "width": pa.array([1], type=pa.int32()),
        }
    )
    v = np.asarray(embed_image(t)["embedding"][0].as_py(), dtype=np.float64)
    assert np.isfinite(v).all()
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)


def test_embed_image_zero_payload_guard():
    t = pa.table(
        {
            "pixels": pa.array([b""], type=pa.large_binary()),
            "height": pa.array([0], type=pa.int32()),
            "width": pa.array([0], type=pa.int32()),
        }
    )
    v = embed_image(t)["embedding"][0].as_py()
    assert v == [0.0] * 72


def test_suggest_batch_size():
    assert suggest_batch_size(1 << 20, budget_mb=64) == 64
    assert suggest_batch_size(0) > 1


def test_multimodal_through_ray_pipeline():
    """The Ray-side plumbing is real: binary columns stream through an
    actor-pool stage and an ANN stage end-to-end."""
    rng = np.random.RandomState(1)
    payloads = [rng.bytes(64) for _ in range(50)]
    t = pa.table(
        {
            "img_id": pa.array(range(50), type=pa.int64()),
            "image": pa.array(payloads, type=pa.binary()),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            DecodeImage,
            fn_constructor_kwargs={"image_col": "image"},
            batch_format="pyarrow",
            batch_size=suggest_batch_size(64, budget_mb=1),
            concurrency=2,
        )
        .map_batches(embed_image, batch_format="pyarrow")
    )
    rows = out.take_all()
    assert len(rows) == 50
    assert all(len(r["embedding"]) == 72 for r in rows)


def test_image_embed_knn_matches_numpy_reference():
    """End-to-end multimodal flagship (PPM fixture → real decode → real
    feature → knn_join) vs an independent in-process reference: decode
    via straightforward byte slicing, feature via np.histogram + block
    loops, neighbors via a dense cosine matrix."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    from lsearch_ray.functions.multimodal import make_ppm_fixture

    got = em._image_embed_knn_result().to_pylist()

    fixture = make_ppm_fixture(48)
    feats = []
    for raw in fixture["image"].to_pylist():
        # independent PPM parse: header is exactly "P6\n{w} {h}\n255\n"
        head, body = raw.split(b"\n255\n", 1)
        w, h = map(int, head.split(b"\n")[1].split())
        px = np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
        grid, bins = 4, 8
        pool = []
        for c in range(3):
            for gi in range(grid):
                for gj in range(grid):
                    rs = [r for r in range(h) if (r * grid) // h == gi]
                    cs = [cc for cc in range(w) if (cc * grid) // w == gj]
                    pool.append(px[np.ix_(rs, cs, [c])].mean() / 255.0)
        hist = []
        for c in range(3):
            cnt, _ = np.histogram(px[:, :, c], bins=bins, range=(0, 256))
            hist.extend(cnt / (h * w))
        f = np.concatenate([pool, hist])
        feats.append((f / np.linalg.norm(f)).astype(np.float32))
    m = np.asarray(feats, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    sims = (m @ m.T) / (norms[:, None] * norms[None, :])
    micro = np.floor(sims * 1e6 + 0.5).astype(np.int64)
    want = []
    for i in range(48):
        order = sorted(
            (j for j in range(48) if j != i), key=lambda j: (-micro[i, j], j)
        )[:3]
        for rnk, j in enumerate(order, 1):
            want.append((i, j, rnk, int(micro[i, j])))
    assert [
        (r["img_id"], r["neighbor_id"], r["rn"], r["sim_micro"]) for r in got
    ] == want


def test_image_embed_knn_golden_gate():
    """queries()['image_embed_knn'] raises on drift from the committed
    golden — run it to prove the gate passes on the current tree."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    out = em.queries()["image_embed_knn"]("/root/testdata/sf0.001")
    assert out.num_rows == 144


def test_broadcast_and_hash_join():
    from lsearch_ray.functions.joins import broadcast_join, hash_join

    left = pa.table(
        {"k": pa.array([1, 2, 3, 4], type=pa.int64()), "v": ["a", "b", "c", "d"]}
    )
    right = pa.table(
        {"k": pa.array([2, 3, 5], type=pa.int64()), "w": ["x", "y", "z"]}
    )
    bj = broadcast_join(rd.from_arrow(left), right, "k").take_all()
    assert sorted((r["k"], r["w"]) for r in bj) == [(2, "x"), (3, "y")]
    hj = hash_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k", num_partitions=2
    ).take_all()
    assert sorted((r["k"], r["w"]) for r in hj) == [(2, "x"), (3, "y")]


def test_sessionize():
    from lsearch_ray.functions.joins import sessionize

    ts = pa.array(
        [0, 10_000_000, 4_000_000_000, 4_010_000_000, 9_000_000_000],
        type=pa.timestamp("us"),
    )
    ev = pa.table(
        {
            "event_id": pa.array(range(5), type=pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 1], type=pa.int64()),
            "ts": ts,
        }
    )
    out = sessionize(rd.from_arrow(ev), gap_seconds=60.0).take_all()
    assert out == [{"user_id": 1, "n_events": 5, "n_sessions": 3}]


def test_sessionize_many_keys():
    """10^5 distinct keys through the hash-partitioned vectorized path
    (no per-key Python), verified against an independent pandas
    window-function reference."""
    import pandas as pd

    from lsearch_ray.functions.joins import sessionize

    rng = np.random.default_rng(7)
    n = 220_000
    n_keys = 110_000
    user = np.concatenate(
        [
            np.arange(n_keys, dtype=np.int64),  # every key appears ≥ once
            rng.integers(0, n_keys, size=n - n_keys).astype(np.int64),
        ]
    )
    ts_us = rng.integers(0, 3_600_000_000, size=n).astype(np.int64)
    ev = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(user),
            "ts": pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us")),
        }
    )
    gap = 120.0
    out = (
        sessionize(
            rd.from_arrow(ev).repartition(8), gap_seconds=gap, num_partitions=16
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    # independent reference: lag-based session starts per key
    ref = pd.DataFrame({"user_id": user, "ts_us": ts_us, "event_id": np.arange(n)})
    ref = ref.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    prev = ref.groupby("user_id")["ts_us"].shift()
    start = prev.isna() | ((ref["ts_us"] - prev) > gap * 1e6)
    expect = (
        ref.assign(start=start.astype(np.int64))
        .groupby("user_id", sort=True)
        .agg(n_events=("ts_us", "size"), n_sessions=("start", "sum"))
        .reset_index()
    )
    assert len(out) == n_keys == len(expect)
    assert (out["user_id"].to_numpy() == expect["user_id"].to_numpy()).all()
    assert (out["n_events"].to_numpy() == expect["n_events"].to_numpy()).all()
    assert (out["n_sessions"].to_numpy() == expect["n_sessions"].to_numpy()).all()


def test_decode_audio_real_wav_vs_stdlib():
    """DecodeAudio(fake=False) decodes a real PCM WAV; the file is
    WRITTEN by the stdlib `wave` module, so the parser is checked against
    an independent encoder. Odd-sized chunk padding exercised via 8-bit."""
    import io
    import wave

    from lsearch_ray.functions.multimodal import DecodeAudio

    rng = np.random.RandomState(5)
    pcm16 = rng.randint(-(2**15), 2**15, size=(220, 2)).astype("<i2")
    buf16 = io.BytesIO()
    with wave.open(buf16, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(pcm16.tobytes())
    pcm8 = rng.randint(0, 256, size=101).astype(np.uint8)  # odd data size
    buf8 = io.BytesIO()
    with wave.open(buf8, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(pcm8.tobytes())
    t = pa.table(
        {
            "aid": pa.array([1, 2], type=pa.int64()),
            "audio": pa.array(
                [buf16.getvalue(), buf8.getvalue()], type=pa.large_binary()
            ),
        }
    )
    out = DecodeAudio(fake=False)(t)
    assert out["sample_rate"].to_pylist() == [44100, 8000]
    assert out["n_channels"].to_pylist() == [2, 1]
    assert out["n_samples"].to_pylist() == [220, 101]
    got16 = np.frombuffer(out["samples"][0].as_py(), dtype="<i2").reshape(220, 2)
    assert np.array_equal(got16, pcm16)
    got8 = np.frombuffer(out["samples"][1].as_py(), dtype="<i2")
    assert np.array_equal(got8, (pcm8.astype(np.int16) - 128) * 256)


def test_sample_frames_real_y4m():
    """SampleFrames(fake=False) splits a real YUV4MPEG2 stream: correct
    frame count/stride, source-stream frame indices, dims columns."""
    from lsearch_ray.functions.multimodal import SampleFrames

    w, h, n = 4, 2, 7
    fb = w * h * 3 // 2
    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, size=fb).astype(np.uint8).tobytes() for _ in range(n)]
    raw = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n" + b"".join(
        b"FRAME\n" + f for f in frames
    )
    t = pa.table(
        {
            "vid": pa.array([3], type=pa.int64()),
            "video": pa.array([raw], type=pa.large_binary()),
        }
    )
    out = SampleFrames(every_n=3, fake=False)(t)
    assert out["frame_idx"].to_pylist() == [0, 3, 6]
    assert out["frame_w"].to_pylist() == [4, 4, 4]
    assert out["frame_h"].to_pylist() == [2, 2, 2]
    for row, src in enumerate([0, 3, 6]):
        assert out["frame"][row].as_py() == frames[src]
    # unsupported container named, not silently faked
    bad = pa.table(
        {
            "vid": pa.array([1], type=pa.int64()),
            "video": pa.array([b"\x00\x00\x00 ftypmp42"], type=pa.large_binary()),
        }
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        SampleFrames(fake=False)(bad)


def test_wav_streaming_size_sentinel():
    """data chunk size 0xFFFFFFFF (streaming writers) means rest-of-file."""
    import io
    import wave

    from lsearch_ray.functions.multimodal import _decode_wav_pcm

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.arange(64, dtype="<i2").tobytes())
    raw = bytearray(buf.getvalue())
    # find the data chunk header and poison its size with the sentinel
    di = bytes(raw).index(b"data")
    raw[di + 4 : di + 8] = (0xFFFFFFFF).to_bytes(4, "little")
    rate, nch, samples = _decode_wav_pcm(bytes(raw))
    assert (rate, nch) == (8000, 1)
    assert np.array_equal(samples[:, 0], np.arange(64, dtype=np.int16))


def test_redact_text():
    import pyarrow as pa

    from lsearch_ray.functions.textstats import redact_text

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": [
                "contact bob@example.com or sue@mail.org now",
                "serials abc123 and x9y plus plain words",
                "nothing to scrub here",
            ],
        }
    )
    out = redact_text(t)
    assert out.column_names == ["doc_id", "n_email", "n_serial", "clean_text"]
    assert out["n_email"].to_pylist() == [2, 0, 0]
    assert out["n_serial"].to_pylist() == [0, 2, 0]
    assert out["clean_text"].to_pylist() == [
        "contact <email> or <email> now",
        "serials <id> and <id> plus plain words",
        "nothing to scrub here",
    ]


def test_redact_sequential_pattern_contract():
    # an email's digits must NOT be re-counted by the serial pattern:
    # the serial count runs on the post-email-replacement text
    import pyarrow as pa

    from lsearch_ray.functions.textstats import redact_text

    t = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": ["mail a1b2@host3.com and serial z99"],
        }
    )
    out = redact_text(t)
    assert out["n_email"].to_pylist() == [1]
    assert out["n_serial"].to_pylist() == [1]  # only z99; host3 was replaced
    assert out["clean_text"].to_pylist() == ["mail <email> and serial <id>"]


def test_redact_ds_matches_duckdb():
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as entry_mod
    from lsearch_ray.functions.textstats import redact_ds

    t = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": [
                "a.b-c@d.ee plus w1",
                "no hits",
                "x1 y2 z3",
                "double@@at not an email x@y.zz is",
                "",
                "trail9 9lead mix3d",
            ],
        }
    )
    got = redact_ds(rd.from_arrow(t)).sort("doc_id").take_all()
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute(entry_mod.oracle_sql()["redact"]).fetchall()
    assert [
        (r["doc_id"], r["n_email"], r["n_serial"], r["clean_text"]) for r in got
    ] == [tuple(r) for r in exp]


def test_doc_entropy_reference_values():
    import math

    from lsearch_ray.functions.textstats import doc_entropy

    def lnm(x):
        return math.floor(math.log(x) * 1e6 + 0.5)

    b = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "a a a a",          # boilerplate: entropy 0
                "a b c d",          # uniform: dl*lnm(dl)
                "a a b",            # mixed
                "",                 # token-less: (0, 0)
            ],
        }
    )
    out = doc_entropy(b)
    assert out["dl"].to_pylist() == [4, 4, 3, 0]
    want = [
        4 * lnm(4) - 4 * lnm(4),
        4 * lnm(4) - 4 * 0,  # four counts of 1, lnm(1)=0
        3 * lnm(3) - 2 * lnm(2),
        0,
    ]
    assert out["ent_microdl"].to_pylist() == want


def test_json_int_field_rejects_non_integer_values():
    """Digit PREFIXES of floats/exponents must NOT extract (the [,}\\s]
    anchor); integers in any flat-JSON position must."""
    import pyarrow as pa

    from lsearch_ray.functions.textstats import json_int_field

    col = pa.array(
        ['{"k": 12}', '{"k": 12.5}', '{"k": -3, "z": 1}', '{"z": 4}',
         '{"k": 12e3}', '{"k":7}', None]
    )
    assert json_int_field(col, "k").to_pylist() == [
        12, None, -3, None, None, 7, None
    ]


def test_quality_filter_thresholds():
    import pyarrow as pa
    import ray.data as rd

    from lsearch_ray.functions.textstats import quality_filter_ds

    docs = [
        (0, "the cat sat on the mat and it was very happy there today"),  # passes
        (1, "x"),                                        # too few tokens
        (2, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15"),     # all digits
        (3, ""),                                         # empty
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )
    out = quality_filter_ds(ds).to_pandas()
    assert list(out["doc_id"]) == [0]


def test_compression_ratio_matches_zlib_replay():
    import zlib

    import ray.data as rd

    from lsearch_ray.functions.textstats import CompressionRatio

    texts = [
        "spam spam spam spam spam spam spam spam",
        "the quick brown fox jumps over one lazy dog",
        "",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        rd.from_arrow(tab)
        .repartition(2)
        .map_batches(CompressionRatio, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, t in enumerate(texts):
        bs = t.encode("utf-8")
        c = len(zlib.compress(bs, CompressionRatio.LEVEL))
        assert out.loc[i, "raw_len"] == len(bs)
        assert out.loc[i, "comp_len"] == c
        assert out.loc[i, "ratio_micro"] == c * 10**6 // max(len(bs), 1)
    # redundant text compresses much better than prose
    assert out.loc[3, "ratio_micro"] < out.loc[1, "ratio_micro"]


def test_source_quality_integer_replay():
    import re

    import ray.data as rd

    from lsearch_ray.functions.textstats import _EN_STOPWORDS, source_quality_ds

    texts = [
        "The cat and the dog",        # srcA
        "numbers 123 456 789",        # srcA
        "",                           # srcB (0 tokens, 0 chars)
        "to be or not to be",         # srcB
    ]
    sources = ["srcA", "srcA", "srcB", "srcB"]
    tab = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "source": pa.array(sources, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        source_quality_ds(rd.from_arrow(tab).repartition(2))
        .to_pandas()
        .set_index("source")
    )
    for src in ("srcA", "srcB"):
        docs = [t for t, s in zip(texts, sources) if s == src]
        toks = [
            w
            for t in docs
            for w in re.split(r"[^a-z0-9]+", t.lower())
            if w
        ]
        stop = sum(w in _EN_STOPWORDS for w in toks)
        alpha = sum(len(re.sub(r"[^A-Za-z]", "", t).encode()) for t in docs)
        chars = sum(len(t.encode()) for t in docs)
        r = out.loc[src]
        assert r["n_docs"] == len(docs)
        assert r["n_tokens"] == len(toks)
        assert r["tokens_per_doc_micro"] == len(toks) * 10**6 // len(docs)
        assert r["stopword_ratio_micro"] == stop * 10**6 // max(len(toks), 1)
        assert r["alpha_ratio_micro"] == alpha * 10**6 // max(chars, 1)


def test_source_quality_null_text_as_empty():
    """Null text must behave exactly like '' (the SQL twin coalesces);
    regression for the binary_length(null)->NaN->astype(int64) garbage
    path."""
    import ray.data as rd

    from lsearch_ray.functions.textstats import source_quality_ds

    tab = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "source": pa.array(["s", "s", None, None], pa.string()),
            "text": pa.array(["the cat", None, None, "dog"], pa.string()),
        }
    )
    out = (
        source_quality_ds(rd.from_arrow(tab).repartition(2))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    # srcA: "the cat" + null→"" : 2 docs, 2 tokens, 6 alpha bytes, 7 chars
    r = out.loc["s"]
    assert r["n_docs"] == 2 and r["n_tokens"] == 2
    assert r["alpha_ratio_micro"] == 6 * 10**6 // 7
    # null source groups under <none>: null text + "dog"
    r = out.loc["<none>"]
    assert r["n_docs"] == 2 and r["n_tokens"] == 1
    assert r["alpha_ratio_micro"] == 3 * 10**6 // 3


def test_audio_embed_knn_matches_wave_reference():
    """End-to-end audio flagship (WAV fixture → real RIFF decode → real
    DSP feature → knn_join) vs an independent reference: decode via the
    STDLIB ``wave`` module, feature via plain loops/histograms, neighbors
    via a dense cosine matrix."""
    import io
    import sys
    import wave

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    from lsearch_ray.functions.multimodal import make_wav_fixture

    got = em._audio_embed_knn_result().to_pylist()

    fixture = make_wav_fixture(48)
    segments, bins = 8, 8
    feats = []
    for raw in fixture["audio"].to_pylist():
        with wave.open(io.BytesIO(raw)) as wf:
            nch = wf.getnchannels()
            assert wf.getsampwidth() == 2 and wf.getframerate() == 8000
            frames = wf.readframes(wf.getnframes())
        pcm = np.frombuffer(frames, dtype="<i2").reshape(-1, nch)
        mono = pcm.astype(np.int64).sum(axis=1) // nch
        n = len(mono)
        energy, zc = [], []
        for s in range(segments):
            idx = [i for i in range(n) if (i * segments) // n == s]
            energy.append(np.abs(mono[idx]).mean() / 32768.0)
            cross = [
                i
                for i in idx
                if i >= 1 and ((mono[i] >= 0) != (mono[i - 1] >= 0))
            ]
            zc.append(len(cross) / len(idx))
        cnt, _ = np.histogram(mono + 32768, bins=bins, range=(0, 65536))
        f = np.concatenate([energy, zc, cnt / n])
        feats.append((f / np.linalg.norm(f)).astype(np.float32))
    m = np.asarray(feats, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    sims = (m @ m.T) / (norms[:, None] * norms[None, :])
    micro = np.floor(sims * 1e6 + 0.5).astype(np.int64)
    want = []
    for i in range(48):
        order = sorted(
            (j for j in range(48) if j != i), key=lambda j: (-micro[i, j], j)
        )[:3]
        for rnk, j in enumerate(order, 1):
            want.append((i, j, rnk, int(micro[i, j])))
    assert [
        (r["clip_id"], r["neighbor_id"], r["rn"], r["sim_micro"]) for r in got
    ] == want


def test_audio_embed_through_ray_pipeline_and_golden():
    """The registry query gates against the committed golden and the
    fixture's built-in near-pair structure holds: every clip's rank-1
    neighbor is its attenuated twin."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    t = em.queries()["audio_embed_knn"]("/root/testdata/sf0.001")
    rows = t.to_pylist()
    assert len(rows) == 48 * 3
    rn1 = {r["clip_id"]: r["neighbor_id"] for r in rows if r["rn"] == 1}
    assert all(rn1[c] == (c ^ 1) for c in rn1)


def test_video_embed_knn_matches_bytelevel_reference():
    """End-to-end video flagship (Y4M fixture → real frame split →
    luma frame feature → per-video mean pool → knn_join) vs an
    independent reference: byte-level Y4M parse (struct offsets, no
    shared code path), per-frame feature via np.histogram + block
    loops, neighbors via a dense cosine matrix."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    from lsearch_ray.functions.multimodal import make_y4m_fixture

    got = em._video_embed_knn_result().to_pylist()

    fixture = make_y4m_fixture(48)
    grid, bins, every_n = 4, 8, 2
    feats = []
    for raw in fixture["video"].to_pylist():
        nl = raw.index(b"\n")
        toks = dict(
            (t[:1], t[1:]) for t in raw[:nl].split(b" ")[1:] if t
        )
        w, h = int(toks[b"W"]), int(toks[b"H"])
        fsize = w * h * 3 // 2
        frames = []
        pos = nl + 1
        while pos < len(raw):
            assert raw[pos : pos + 6] == b"FRAME\n"
            frames.append(raw[pos + 6 : pos + 6 + fsize])
            pos += 6 + fsize
        vecs = []
        for body in frames[::every_n]:
            y = np.frombuffer(body[: w * h], dtype=np.uint8).reshape(h, w)
            pool = []
            for gi in range(grid):
                for gj in range(grid):
                    rs = [r for r in range(h) if (r * grid) // h == gi]
                    cs = [c for c in range(w) if (c * grid) // w == gj]
                    pool.append(y[np.ix_(rs, cs)].mean() / 255.0)
            cnt, _ = np.histogram(y, bins=bins, range=(0, 256))
            vecs.append(np.concatenate([pool, cnt / (w * h)]))
        mean = np.mean(
            [v.astype(np.float32).astype(np.float64) for v in vecs], axis=0
        )
        feats.append((mean / np.linalg.norm(mean)).astype(np.float32))
    m = np.asarray(feats, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    sims = (m @ m.T) / (norms[:, None] * norms[None, :])
    micro = np.floor(sims * 1e6 + 0.5).astype(np.int64)
    want = []
    for i in range(48):
        order = sorted(
            (j for j in range(48) if j != i), key=lambda j: (-micro[i, j], j)
        )[:3]
        for rnk, j in enumerate(order, 1):
            want.append((i, j, rnk, int(micro[i, j])))
    assert [
        (r["vid_id"], r["neighbor_id"], r["rn"], r["sim_micro"]) for r in got
    ] == want


def test_quality_percentile_gate_matches_rank_rule():
    """The dynamic gate must keep exactly the docs whose ent_microdl is
    >= the value at 0-based rank floor((1-frac)*(n-1)) ascending —
    including every tied doc at the threshold — and frac=1.0 must keep
    the whole corpus."""
    import ray.data as rd

    from lsearch_ray.functions.textstats import (
        doc_entropy,
        quality_percentile_gate_ds,
    )

    texts = [
        "a a a a",                # zero entropy (single repeated token)
        "b b b b",                # zero entropy tie
        "a b c d e f",            # max diversity
        "a a b b c c d d",
        "x y x y x y",
        "one two three four five six seven eight",
        "z z z y",
        "",                       # token-less -> ent 0 tie
    ]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    ds = rd.from_arrow(tab).repartition(3)

    ref = doc_entropy(tab).to_pandas().sort_values("doc_id")
    for frac in (0.5, 0.25, 1.0):
        got = quality_percentile_gate_ds(ds, frac=frac).to_pandas()
        vals = np.sort(ref["ent_microdl"].to_numpy())
        thr = vals[int(np.floor((1.0 - frac) * (len(vals) - 1)))]
        want = ref[ref["ent_microdl"] >= thr]
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), frac
        assert got["ent_microdl"].tolist() == want["ent_microdl"].tolist()
    assert quality_percentile_gate_ds(ds, frac=1.0).count() == len(texts)

    with pytest.raises(ValueError):
        quality_percentile_gate_ds(ds, frac=0.0)


def test_grouped_quality_percentile_gate_per_group_rule():
    """Each group must apply ITS OWN rank-floor threshold (ties at the
    group threshold survive), and the broadcast and hash-join threshold
    routes must be value-identical (forced tiny cap)."""
    import ray.data as rd

    from lsearch_ray.functions.textstats import (
        doc_entropy,
        grouped_quality_percentile_gate_ds,
    )

    texts = [
        "a a a a", "b c d e f g", "a b a b", "q r s t u v w x",
        "z z z z z", "m n m n o", "h i j k l", "p p q q r r",
    ]
    langs = ["en", "en", "en", "en", "de", "de", "de", "de"]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
        }
    )
    ds = rd.from_arrow(tab).repartition(3)

    ref = doc_entropy(tab).to_pandas()
    ref["lang"] = langs
    keep = []
    for g, grp in ref.groupby("lang"):
        vals = np.sort(grp["ent_microdl"].to_numpy())
        thr = vals[int(np.floor(0.5 * (len(vals) - 1)))]
        keep.extend(grp[grp["ent_microdl"] >= thr]["doc_id"].tolist())
    want = sorted(keep)

    got_b = grouped_quality_percentile_gate_ds(ds, "lang", frac=0.5).to_pandas()
    assert got_b["doc_id"].tolist() == want
    assert list(got_b.columns) == ["doc_id", "dl", "ent_microdl", "lang"]

    got_h = grouped_quality_percentile_gate_ds(
        ds, "lang", frac=0.5, max_broadcast_rows=0
    ).to_pandas()
    assert got_b[sorted(got_b.columns)].equals(got_h[sorted(got_h.columns)])


def test_frame_dedup_matches_greedy_replay():
    """frame_dedup_ds equals a pure-Python greedy replay (floor-micro
    cosine, frame order, zero-vector conventions), at any partitioning."""
    import numpy as np
    import ray.data as rd

    from lsearch_ray.functions.multimodal import frame_dedup_ds

    # video 0: two static runs + a scene change; video 1: zeros pair;
    # video 2: orthogonal frames (nothing drops)
    rows = [
        (0, 0, [1.0, 0.0, 0.0]),
        (0, 2, [0.9999, 0.001, 0.0]),   # near-dup of frame 0
        (0, 4, [0.0, 1.0, 0.0]),        # scene change
        (0, 6, [0.001, 0.9999, 0.0]),   # near-dup of frame 4
        (1, 0, [0.0, 0.0, 0.0]),        # zero vector
        (1, 2, [0.0, 0.0, 0.0]),        # zero-zero = exact dup
        (1, 4, [0.5, 0.5, 0.0]),        # zero-nonzero = not dup
        (2, 0, [1.0, 0.0, 0.0]),
        (2, 2, [0.0, 1.0, 0.0]),
        (2, 4, [0.0, 0.0, 1.0]),
    ]
    tau = 995_000
    tbl = pa.table(
        {
            "vid_id": pa.array([r[0] for r in rows], pa.int64()),
            "frame_idx": pa.array([r[1] for r in rows], pa.int32()),
            "embedding": pa.array(
                [r[2] for r in rows], pa.list_(pa.float32())
            ),
        }
    )

    def replay():
        out = {}
        byvid = {}
        for v, f, e in rows:
            byvid.setdefault(v, []).append((f, np.asarray(e, np.float64)))
        for v, frames in byvid.items():
            kept = []
            for f, e in sorted(frames):
                n = np.linalg.norm(e)
                dup = False
                for _, ke in kept:
                    kn = np.linalg.norm(ke)
                    if n == 0.0 and kn == 0.0:
                        sim = 1.0
                    elif n == 0.0 or kn == 0.0:
                        sim = 0.0
                    else:
                        sim = float(ke @ e) / (kn * n)
                    if int(np.floor(sim * 1_000_000)) >= tau:
                        dup = True
                        break
                if not dup:
                    kept.append((f, e))
                out[(v, f)] = 0 if dup else 1
        return out

    expected = replay()
    for nparts in (1, 3):
        got = {
            (int(r["vid_id"]), int(r["frame_idx"])): int(r["kept"])
            for r in frame_dedup_ds(
                rd.from_arrow(tbl).repartition(nparts), tau_micro=tau
            ).take_all()
        }
        assert got == expected
    assert expected[(0, 2)] == 0 and expected[(0, 6)] == 0
    assert expected[(1, 2)] == 0 and expected[(1, 4)] == 1
    assert all(expected[(2, f)] == 1 for f in (0, 2, 4))


def test_frame_dedup_golden_gate():
    """The registry query reproduces the committed golden contract."""
    import __ray_entry__

    t = __ray_entry__.queries()["frame_dedup"]("unused")
    assert t.num_rows == 144
    kept = sum(r["kept"] for r in t.to_pylist())
    assert 0 < kept < 144  # non-trivial thinning at the pinned tau


def test_tokenizer_fertility_matches_python_reference():
    import re

    import ray.data as rd

    from lsearch_ray.functions.textstats import (
        BPE_ISH_PATTERN,
        tokenizer_fertility_ds,
    )

    texts = [
        ("en", "hello world 123 foo-bar!"),
        ("en", "a b c"),
        ("zh", "x1 y2"),
        ("zh", ""),
        ("de", "   "),  # whitespace only: 0 words
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "lang": [l for l, _ in texts],
            "text": [t for _, t in texts],
        }
    )
    out = {
        r["lang"]: (
            int(r["bpe_tokens"]),
            int(r["ws_words"]),
            int(r["fertility_micro"]),
        )
        for r in tokenizer_fertility_ds(rd.from_arrow(tbl)).take_all()
    }
    expected = {}
    agg: dict[str, list[int]] = {}
    for lang, t in texts:
        bpe = len(re.findall(BPE_ISH_PATTERN, t))
        ws = len(re.findall(r"\S+", t))
        a = agg.setdefault(lang, [0, 0])
        a[0] += bpe
        a[1] += ws
    for lang, (b, w) in agg.items():
        expected[lang] = (b, w, b * 10**6 // w if w else 0)
    assert out == expected
    assert out["de"] == (0, 0, 0)
    # punctuation splits: fertility strictly above 1 token/word for en
    assert out["en"][2] > 1_000_000
