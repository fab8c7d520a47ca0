"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Real decode paths (``fake=False``), all pure numpy, no media libraries:

- ``DecodeImage`` — uncompressed PPM (P6) and 24-bit BMP natively; any
  PIL-supported format when PIL is importable (gated import).
- ``DecodeAudio`` — RIFF/WAVE PCM 8/16-bit (chunk walk incl. odd-size
  padding), emitting int16 frame-major sample blobs.
- ``SampleFrames`` — YUV4MPEG2 (Y4M, 4:2:0) streams: header parse +
  fixed-stride frame walk, raw planar YUV frames at source indices.

Compressed containers (JPEG without PIL, MP3, MP4, ...) raise
``ValueError`` naming the missing dependency — never a silent fake.
``fake=True`` keeps deterministic no-dependency stand-ins for
pipeline-shape tests. The feature extractor (``embed_image``) is a REAL
classic-CV global descriptor (grid mean-pool + color histogram,
L2-normalized) — pure numpy, bit-deterministic, no model runtime —
feeding decode → embed → knn_join/kmeans pipelines end to end.
Everything Ray-side — schema handling, actor-pool stage shape, batch
sizing for wide binary rows — is real and tested.

Scale notes: binary payloads make rows wide — size ``batch_size`` small
(``suggest_batch_size``) and keep stages in ``batch_format="pyarrow"``
(binary round-trips zero-copy through Arrow; pandas would object-box it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def suggest_batch_size(mean_payload_bytes: int, budget_mb: int = 64) -> int:
    """Rows per batch so one batch stays under ``budget_mb``."""
    return max(1, (budget_mb << 20) // max(1, mean_payload_bytes))


def _decode_ppm_p6(raw: bytes) -> tuple[int, int, bytes]:
    """Pure-numpy decode of binary PPM (P6): (h, w, RGB row-major)."""
    # header: P6 <w> <h> <maxval>, '#' comments allowed, then raw RGB
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (need 255)")
    body = raw[pos : pos + h * w * 3]
    if len(body) != h * w * 3:
        raise ValueError("truncated PPM body")
    return h, w, body


def _decode_bmp24(raw: bytes) -> tuple[int, int, bytes]:
    """Pure-numpy decode of uncompressed 24-bit BMP: (h, w, RGB)."""
    off = int(np.frombuffer(raw, dtype="<u4", count=1, offset=10)[0])
    w = int(np.frombuffer(raw, dtype="<i4", count=1, offset=18)[0])
    h_signed = int(np.frombuffer(raw, dtype="<i4", count=1, offset=22)[0])
    bpp = int(np.frombuffer(raw, dtype="<u2", count=1, offset=28)[0])
    comp = int(np.frombuffer(raw, dtype="<u4", count=1, offset=30)[0])
    if bpp != 24 or comp != 0:
        raise ValueError(f"BMP bpp={bpp} compression={comp} unsupported")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(raw, dtype=np.uint8, count=h * stride, offset=off)
    px = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        px = px[::-1]
    return h, w, np.ascontiguousarray(px[:, :, ::-1]).tobytes()  # BGR→RGB


try:  # optional dependency: full-format decoding when available
    from PIL import Image as _PILImage  # noqa: N812
except ImportError:  # pragma: no cover - PIL absent in the build container
    _PILImage = None


class DecodeImage:
    """Actor-pool stage: ``image:binary`` → ``height/width/channels`` +
    ``pixels:binary`` (row-major RGB uint8).

    ``fake=True`` (default): a deterministic stand-in derives dimensions
    from the payload bytes so the full Ray pipeline is testable with no
    image data. ``fake=False``: REAL decoding — PIL handles any format it
    knows when importable (gated import above); without PIL a pure-numpy
    path still decodes uncompressed PPM (P6) and 24-bit BMP. Unsupported
    payloads raise ``ValueError`` naming the missing dependency.
    """

    def __init__(self, image_col: str = "image", fake: bool = True):
        self.image_col = image_col
        self.fake = fake

    def _decode_real(self, raw: bytes) -> tuple[int, int, bytes]:
        # native fast paths first, but fall through to PIL for variants
        # they reject (RLE/8/32-bpp BMP, maxval≠255 PPM, ...)
        try:
            if raw[:2] == b"P6":
                return _decode_ppm_p6(raw)
            if raw[:2] == b"BM":
                return _decode_bmp24(raw)
        except ValueError:
            if _PILImage is None:
                raise
        if _PILImage is not None:
            import io

            img = _PILImage.open(io.BytesIO(raw)).convert("RGB")
            return img.height, img.width, img.tobytes()
        raise ValueError(
            "unsupported image format (PPM/BMP decode natively; other "
            "formats need PIL, which is not installed)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.image_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        heights, widths, pixels = [], [], []
        for v in col:
            raw = v.as_py() or b""
            if self.fake:
                # deterministic fake: dims from the payload's first bytes
                h = 1 + (raw[0] if raw else 0) % 8
                w = 1 + (raw[1] if len(raw) > 1 else 0) % 8
                rng = np.random.RandomState(len(raw) % 2**31)
                px = rng.randint(0, 256, size=h * w * 3, dtype=np.uint8).tobytes()
            else:
                h, w, px = self._decode_real(raw)
            heights.append(h)
            widths.append(w)
            pixels.append(px)
        return (
            batch.append_column("height", pa.array(heights, type=pa.int32()))
            .append_column("width", pa.array(widths, type=pa.int32()))
            .append_column("channels", pa.array([3] * batch.num_rows, type=pa.int32()))
            .append_column("pixels", pa.array(pixels, type=pa.large_binary()))
        )


def _decode_wav_pcm(raw: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-numpy decode of RIFF/WAVE PCM (8/16-bit): returns
    ``(sample_rate, n_channels, samples int16 [frame, channel])``.
    8-bit unsigned samples are widened to int16 (centered, ×256)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = int(np.frombuffer(raw, dtype="<u4", count=1, offset=pos + 4)[0])
        if cid == b"data" and size == 0xFFFFFFFF:
            # streaming-writer sentinel (length unknown at header time):
            # the data chunk is the rest of the file
            size = len(raw) - (pos + 8)
        body = raw[pos + 8 : pos + 8 + size]
        if cid in (b"fmt ", b"data") and len(body) != size:
            # never trust the declared size over the actual bytes —
            # silent truncation is data loss, not a decode
            raise ValueError(
                f"truncated WAV {cid.decode(errors='replace').strip()} chunk "
                f"({len(body)} of {size} bytes)"
            )
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even length
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int(np.frombuffer(fmt, dtype="<u2", count=1)[0])
    n_channels = int(np.frombuffer(fmt, dtype="<u2", count=1, offset=2)[0])
    sample_rate = int(np.frombuffer(fmt, dtype="<u4", count=1, offset=4)[0])
    bits = int(np.frombuffer(fmt, dtype="<u2", count=1, offset=14)[0])
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"WAV format={audio_format} bits={bits} unsupported (PCM 8/16 only)")
    if n_channels < 1:
        raise ValueError(f"WAV n_channels={n_channels} invalid")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    else:
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
        ) * 256
    n_frames = len(samples) // n_channels
    return sample_rate, n_channels, samples[: n_frames * n_channels].reshape(
        n_frames, n_channels
    )


class DecodeAudio:
    """Actor-pool stage: ``audio:binary`` → ``sample_rate/n_channels/
    n_samples`` + ``samples:binary`` (int16 LE, frame-major).

    ``fake=False`` REALLY decodes RIFF/WAVE PCM (8/16-bit) in pure numpy
    — no audio library needed; other containers raise ``ValueError``
    naming the gap. ``fake=True`` keeps the deterministic no-dependency
    stand-in for pipeline-shape tests."""

    def __init__(self, audio_col: str = "audio", fake: bool = True):
        self.audio_col = audio_col
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.audio_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        rates, chans, counts, blobs = [], [], [], []
        for v in col:
            raw = v.as_py() or b""
            if self.fake:
                rate, nch = 8000, 1 + (raw[0] if raw else 0) % 2
                rng = np.random.RandomState(len(raw) % 2**31)
                samples = rng.randint(
                    -(2**15), 2**15, size=(8, nch)
                ).astype(np.int16)
            else:
                rate, nch, samples = _decode_wav_pcm(raw)
            rates.append(rate)
            chans.append(nch)
            counts.append(samples.shape[0])
            blobs.append(samples.astype("<i2").tobytes())
        return (
            batch.append_column("sample_rate", pa.array(rates, type=pa.int32()))
            .append_column("n_channels", pa.array(chans, type=pa.int32()))
            .append_column("n_samples", pa.array(counts, type=pa.int64()))
            .append_column("samples", pa.array(blobs, type=pa.large_binary()))
        )


def _y4m_frames(raw: bytes) -> tuple[int, int, list[bytes]]:
    """Pure-numpy frame split of a YUV4MPEG2 (Y4M) stream, 4:2:0 chroma:
    returns ``(width, height, [frame bytes])`` where each frame is the
    raw planar YUV420 payload (w*h*3/2 bytes)."""
    if not raw.startswith(b"YUV4MPEG2"):
        raise ValueError(
            "not a YUV4MPEG2 stream (compressed containers like mp4/webm "
            "need ffmpeg, which is not available here)"
        )
    nl = raw.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M header newline missing")
    header = raw[:nl].split(b" ")
    w = h = None
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C" and not tok[1:].startswith(b"420"):
            raise ValueError(f"Y4M chroma {tok!r} unsupported (420 only)")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    frame_bytes = w * h * 3 // 2
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(raw):
        fnl = raw.find(b"\n", pos)
        if fnl < 0 or raw[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M frame marker missing")
        body = raw[fnl + 1 : fnl + 1 + frame_bytes]
        if len(body) != frame_bytes:
            raise ValueError("truncated Y4M frame")
        frames.append(body)
        pos = fnl + 1 + frame_bytes
    return w, h, frames


class SampleFrames:
    """Actor-pool stage: ``video:binary`` → one row per sampled frame
    (``frame_idx``, ``frame:binary``).

    ``fake=False`` REALLY splits YUV4MPEG2 (Y4M, 4:2:0) streams in pure
    numpy — header parse + fixed-stride frame walk, each sampled frame
    emitted as its raw planar YUV420 payload with ``frame_w/frame_h``
    columns; compressed containers (mp4/webm) would need ffmpeg, which
    this environment lacks, and raise ``ValueError`` saying so.
    ``fake=True`` keeps the deterministic stand-in."""

    def __init__(self, video_col: str = "video", every_n: int = 10, fake: bool = True):
        self.video_col = video_col
        self.every_n = every_n
        self.fake = fake

    def _frames(self, raw: bytes) -> list[bytes]:
        n_frames = 1 + len(raw) % 5
        return [raw[:16] + bytes([i]) for i in range(0, n_frames, 1)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.video_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        step = max(1, self.every_n)
        out_parent, out_idx, out_frame = [], [], []
        out_w, out_h = [], []
        for row, v in enumerate(col):
            raw = v.as_py() or b""
            if self.fake:
                w = h = 0
                frames = self._frames(raw)
            else:
                w, h, frames = _y4m_frames(raw)
            # frame_idx is the index IN THE SOURCE stream (not the
            # sample ordinal) so a sampled frame stays addressable
            for src_i in range(0, len(frames), step):
                out_parent.append(row)
                out_idx.append(src_i)
                out_frame.append(frames[src_i])
                out_w.append(w)
                out_h.append(h)
        parent_cols = {
            name: batch[name].take(pa.array(out_parent, type=pa.int64()))
            for name in batch.column_names
            if name != self.video_col
        }
        cols = {
            **parent_cols,
            "frame_idx": pa.array(out_idx, type=pa.int32()),
            "frame": pa.array(out_frame, type=pa.large_binary()),
        }
        if not self.fake:
            cols["frame_w"] = pa.array(out_w, type=pa.int32())
            cols["frame_h"] = pa.array(out_h, type=pa.int32())
        return pa.table(cols)


def embed_image(
    batch: pa.Table,
    pixel_col: str = "pixels",
    h_col: str = "height",
    w_col: str = "width",
    grid: int = 4,
    bins: int = 8,
) -> pa.Table:
    """REAL deterministic image feature (classic public-knowledge CV, no
    model runtime): per image, a ``grid×grid`` blocked mean-pool of each
    RGB channel (means scaled to [0,1]) concatenated with a
    ``bins``-per-channel color histogram (bin fractions), L2-normalized —
    the color-layout / color-histogram global-descriptor family. Pure
    integer-in/float64-out numpy over the decoded RGB payload, so the
    vector is bit-identical across hosts and decode → embed →
    knn_join / kmeans pipelines are golden-testable. Output column
    ``embedding: list<float>`` of dim ``grid²·3 + bins·3`` (72 default).

    At scale this runs as the per-batch body of an actor-pool
    ``map_batches`` stage right after :class:`DecodeImage`; a learned
    encoder would slot into the same signature with the model loaded in
    the actor's ``__init__``."""
    if 256 % bins:
        raise ValueError(f"bins={bins} must divide 256")
    shift = 256 // bins
    cols = {c: batch[c] for c in (pixel_col, h_col, w_col)}
    for k, v in cols.items():
        if isinstance(v, pa.ChunkedArray):
            cols[k] = v.combine_chunks()
    heights = np.asarray(cols[h_col], dtype=np.int64)
    widths = np.asarray(cols[w_col], dtype=np.int64)
    vecs = []
    for i, v in enumerate(cols[pixel_col]):
        h, w = int(heights[i]), int(widths[i])
        px = np.frombuffer(v.as_py() or b"", dtype=np.uint8)
        if h * w == 0 or len(px) != h * w * 3:
            vecs.append([0.0] * (grid * grid * 3 + bins * 3))
            continue
        px = px.reshape(h, w, 3)
        # blocked mean-pool: map each pixel to its grid cell, channel
        # sums via ONE bincount per channel over flat cell ids
        ri = (np.arange(h) * grid) // h
        ci = (np.arange(w) * grid) // w
        cell = (ri[:, None] * grid + ci[None, :]).ravel()
        counts = np.bincount(cell, minlength=grid * grid).astype(np.float64)
        # an image smaller than the grid leaves empty cells: their count
        # is 0 and 0/0 would poison the whole vector with NaN — an empty
        # cell pools to 0.0 instead (sum is 0 there, so any positive
        # denominator works)
        counts[counts == 0] = 1.0
        pooled = np.concatenate(
            [
                np.bincount(
                    cell, weights=px[:, :, c].ravel(), minlength=grid * grid
                )
                / (counts * 255.0)
                for c in range(3)
            ]
        )
        hist = np.concatenate(
            [
                np.bincount(px[:, :, c].ravel() // shift, minlength=bins)
                / float(h * w)
                for c in range(3)
            ]
        )
        feat = np.concatenate([pooled, hist])
        feat /= np.linalg.norm(feat)  # hist mass guarantees norm > 0
        vecs.append(feat.astype(np.float32).tolist())
    return batch.append_column(
        "embedding", pa.array(vecs, type=pa.list_(pa.float32()))
    )


def embed_yuv_frame(
    batch: pa.Table,
    frame_col: str = "frame",
    w_col: str = "frame_w",
    h_col: str = "frame_h",
    grid: int = 4,
    bins: int = 8,
) -> pa.Table:
    """REAL deterministic per-FRAME feature over raw planar YUV420
    payloads (:class:`SampleFrames` output): the luma (Y) plane — the
    first ``w·h`` bytes — is treated as a grayscale image and embedded
    with the :func:`embed_image` recipe (``grid×grid`` blocked mean-pool
    + ``bins`` histogram, each scaled to [0,1]), dim ``grid² + bins``
    (24 default). NOT normalized — frame vectors are meant to be
    mean-pooled into a video vector first (see
    :func:`mean_pool_embeddings`); normalize after pooling. Undersized
    payloads embed as the zero vector."""
    if 256 % bins:
        raise ValueError(f"bins={bins} must divide 256")
    shift = 256 // bins
    cols = {c: batch[c] for c in (frame_col, w_col, h_col)}
    for k, v in cols.items():
        if isinstance(v, pa.ChunkedArray):
            cols[k] = v.combine_chunks()
    ws = np.asarray(cols[w_col], dtype=np.int64)
    hs = np.asarray(cols[h_col], dtype=np.int64)
    vecs = []
    for i, v in enumerate(cols[frame_col]):
        w, h = int(ws[i]), int(hs[i])
        raw = v.as_py() or b""
        if w * h == 0 or len(raw) < w * h:
            vecs.append([0.0] * (grid * grid + bins))
            continue
        y = np.frombuffer(raw, dtype=np.uint8, count=w * h).reshape(h, w)
        ri = (np.arange(h) * grid) // h
        ci = (np.arange(w) * grid) // w
        cell = (ri[:, None] * grid + ci[None, :]).ravel()
        counts = np.bincount(cell, minlength=grid * grid).astype(np.float64)
        counts[counts == 0] = 1.0
        pooled = (
            np.bincount(cell, weights=y.ravel(), minlength=grid * grid)
            / (counts * 255.0)
        )
        hist = np.bincount(y.ravel() // shift, minlength=bins) / float(w * h)
        vecs.append(
            np.concatenate([pooled, hist]).astype(np.float32).tolist()
        )
    return batch.append_column(
        "embedding", pa.array(vecs, type=pa.list_(pa.float32()))
    )


def mean_pool_embeddings(
    frames_ds,
    id_col: str,
    *,
    emb_col: str = "embedding",
    num_partitions: int = 8,
):
    """(id, embedding)-per-FRAME Dataset → one L2-normalized mean vector
    per id — the frame→video aggregation step. One hash shuffle on the
    id, then a vectorized sum/count per group inside each partition (no
    per-group Python); all-zero means stay zero."""
    import pandas as pd

    from lsearch_ray.functions.dedup import arrow_out, partition_ids

    def tag(b: pa.Table) -> pa.Table:
        t = b.select([id_col, emb_col])
        return t.append_column(
            "__part", pa.array(partition_ids(t, [id_col], num_partitions))
        )

    def pool(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        m = np.stack(
            [np.asarray(v, dtype=np.float64) for v in g[emb_col]]
        )
        new_run = np.empty(len(ids), dtype=bool)
        new_run[0] = True
        new_run[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new_run)
        sums = np.add.reduceat(m, starts, axis=0)
        counts = np.diff(np.append(starts, len(ids)))
        means = sums / counts[:, None]
        norms = np.linalg.norm(means, axis=1)
        norms[norms == 0] = 1.0
        means /= norms[:, None]
        return arrow_out(
            pd.DataFrame(
                {
                    id_col: ids[starts],
                    emb_col: [r.astype(np.float32).tolist() for r in means],
                }
            )
        )

    return (
        frames_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pool, batch_format="pandas")
    )


def make_y4m_fixture(
    n: int = 48, *, frames: int = 6, w: int = 16, h: int = 16, seed: int = 55
) -> pa.Table:
    """Deterministic synthetic YUV4MPEG2 (4:2:0) video table with
    built-in near-pair structure — video 2j+1 is video 2j with a small
    uniform luma shift (the image/audio fixture convention). Columns
    (vid_id:int64, video:binary)."""
    vids = []
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    for i in range(n):
        rng = np.random.RandomState(seed + (i // 2))
        parts = [header]
        for _ in range(frames):
            y = rng.randint(0, 256, size=w * h).astype(np.int16)
            uv = rng.randint(0, 256, size=w * h // 2).astype(np.uint8)
            if i % 2 == 1:
                y = np.clip(y + 4, 0, 255)
            parts.append(b"FRAME\n" + y.astype(np.uint8).tobytes() + uv.tobytes())
        vids.append(b"".join(parts))
    return pa.table(
        {
            "vid_id": pa.array(np.arange(n, dtype=np.int64)),
            "video": pa.array(vids, type=pa.binary()),
        }
    )


def embed_audio(
    batch: pa.Table,
    samples_col: str = "samples",
    nch_col: str = "n_channels",
    segments: int = 8,
    bins: int = 8,
) -> pa.Table:
    """REAL deterministic audio feature (classic public-knowledge DSP, no
    model runtime and no FFT): per clip, the decoded int16 PCM is
    mono-mixed (integer mean across channels), then

    - ``segments`` mean-absolute-amplitude values (scaled to [0,1]) —
      the energy envelope,
    - ``segments`` zero-crossing fractions — the crude spectral proxy,
    - a ``bins`` amplitude histogram over the full clip (fractions),

    concatenated and L2-normalized: dim ``2·segments + bins`` (24
    default). Integer-in/float64-out numpy only, so the vector is
    bit-identical across hosts and decode → embed → knn_join pipelines
    are golden-testable (the audio mirror of :func:`embed_image`).
    Empty clips embed as the zero vector.

    At scale this is the per-batch body of an actor-pool ``map_batches``
    stage right after :class:`DecodeAudio`; a learned audio encoder
    would slot into the same signature with the model loaded in the
    actor's ``__init__``."""
    if 65536 % bins:
        raise ValueError(f"bins={bins} must divide 65536")
    shift = 65536 // bins
    col = batch[samples_col]
    nch = batch[nch_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    chans = np.asarray(nch, dtype=np.int64)
    vecs = []
    for i, v in enumerate(col):
        raw = v.as_py() or b""
        c = max(int(chans[i]), 1)
        pcm = np.frombuffer(raw, dtype="<i2")
        n = len(pcm) // c
        if n == 0:
            vecs.append([0.0] * (2 * segments + bins))
            continue
        # integer mono mix (floor mean, matching // semantics everywhere)
        mono = (
            pcm[: n * c].reshape(n, c).astype(np.int64).sum(axis=1) // c
        )
        seg = (np.arange(n) * segments) // n
        counts = np.bincount(seg, minlength=segments).astype(np.float64)
        counts[counts == 0] = 1.0
        energy = (
            np.bincount(seg, weights=np.abs(mono), minlength=segments)
            / (counts * 32768.0)
        )
        zc = np.zeros(segments, dtype=np.float64)
        if n > 1:
            crossings = (mono[1:] >= 0) != (mono[:-1] >= 0)
            zc = (
                np.bincount(seg[1:], weights=crossings, minlength=segments)
                / counts
            )
        hist = (
            np.bincount((mono + 32768) // shift, minlength=bins) / float(n)
        )
        feat = np.concatenate([energy, zc, hist])
        norm = np.linalg.norm(feat)
        feat = feat / norm if norm > 0 else feat
        vecs.append(feat.astype(np.float32).tolist())
    return batch.append_column(
        "embedding", pa.array(vecs, type=pa.list_(pa.float32()))
    )


def make_wav_fixture(
    n: int = 48, *, n_samples: int = 256, rate: int = 8000, seed: int = 99
) -> pa.Table:
    """Deterministic synthetic RIFF/WAVE PCM16 table with built-in
    near-pair structure — clip 2j+1 is clip 2j attenuated ~3% (same
    envelope shape, so the nearest-neighbor graph is stable and
    golden-testable; the image-fixture convention). Alternating clips
    are mono/stereo to exercise the channel path. Columns
    (clip_id:int64, audio:binary)."""
    import struct

    clips = []
    for i in range(n):
        rng = np.random.RandomState(seed + (i // 2))
        nch = 1 + (i // 2) % 2
        pcm = rng.randint(-20000, 20000, size=(n_samples, nch)).astype(
            np.int64
        )
        if i % 2 == 1:
            pcm = (pcm * 31) // 32
        data = pcm.astype("<i2").tobytes()
        byte_rate = rate * nch * 2
        hdr = (
            b"RIFF"
            + struct.pack("<I", 36 + len(data))
            + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, nch, rate, byte_rate, nch * 2, 16)
            + b"data"
            + struct.pack("<I", len(data))
        )
        clips.append(hdr + data)
    return pa.table(
        {
            "clip_id": pa.array(np.arange(n, dtype=np.int64)),
            "audio": pa.array(clips, type=pa.binary()),
        }
    )


def make_ppm_fixture(
    n: int = 48, *, h: int = 16, w: int = 16, seed: int = 77
) -> pa.Table:
    """Deterministic synthetic PPM (P6) image table with built-in
    near-pair structure — image 2j+1 is image 2j plus a small uniform
    brightness shift, so the nearest-neighbor graph is stable and
    golden-testable. Columns (img_id:int64, image:binary)."""
    imgs = []
    for i in range(n):
        rng = np.random.RandomState(seed + (i // 2))
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.int16)
        if i % 2 == 1:
            px = np.clip(px + 3, 0, 255)
        imgs.append(f"P6\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes())
    return pa.table(
        {
            "img_id": pa.array(np.arange(n, dtype=np.int64)),
            "image": pa.array(imgs, type=pa.binary()),
        }
    )


def frame_dedup_ds(
    frames_ds,
    *,
    id_col: str = "vid_id",
    frame_col: str = "frame_idx",
    emb_col: str = "embedding",
    tau_micro: int = 995_000,
    num_partitions: int = 8,
):
    """Within-video near-duplicate frame removal (keyframe thinning —
    the video counterpart of SemDeDup): walk each video's sampled
    frames in stream order and DROP a frame whose cosine similarity to
    ANY already-kept frame of the same video reaches ``tau_micro``/10⁶
    (floor-micro, so the greedy decision sequence is deterministic).
    Static scenes collapse to their first frame; scene changes survive.

    Zero-vector convention (undersized/black frames embed as zeros):
    zero–zero is similarity 10⁶ (exact dup), zero–nonzero is 0.

    Scale shape: ONE vid-keyed hash shuffle, then per-group greedy with
    the kept-set cosine computed as one matmul per step. Group size =
    frames per video (duration × fps / sample stride) — a per-video
    constant, so the per-group quadratic worst case never becomes a
    corpus-scale term. Returns (id, frame_idx, kept:int8) per frame,
    sorted within each group emission by frame order.
    """
    import pandas as pd

    from lsearch_ray.functions.dedup import arrow_out

    def dedup_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(frame_col, kind="mergesort")
        V = np.stack(
            [np.asarray(v, dtype=np.float64) for v in g[emb_col]]
        )
        n = len(g)
        norms = np.linalg.norm(V, axis=1)
        kept_rows: list[int] = []
        kept = np.zeros(n, dtype=np.int8)
        for i in range(n):
            dup = False
            if kept_rows:
                if norms[i] == 0.0:
                    dup = bool((norms[np.array(kept_rows)] == 0.0).any())
                else:
                    K = np.array(kept_rows)
                    nz = K[norms[K] > 0.0]
                    if len(nz):
                        sims = (V[nz] @ V[i]) / (norms[nz] * norms[i])
                        dup = bool(
                            (np.floor(sims * 1_000_000).astype(np.int64)
                             >= tau_micro).any()
                        )
            if not dup:
                kept_rows.append(i)
                kept[i] = 1
        return arrow_out(
            pd.DataFrame(
                {
                    id_col: g[id_col].to_numpy(),
                    frame_col: g[frame_col].to_numpy(),
                    "kept": kept,
                }
            )
        )

    return (
        frames_ds.groupby(id_col)
        .map_groups(dedup_group, batch_format="pandas")
    )
