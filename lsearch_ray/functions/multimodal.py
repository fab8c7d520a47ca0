"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

``DecodeImage(fake=False)`` really decodes: uncompressed PPM (P6) and
24-bit BMP natively in numpy, any PIL-supported format when PIL is
importable (gated import). ``fake=True`` keeps the deterministic
no-dependency stand-in for pipeline tests. Video frame sampling and the
feature extractor remain declared fakes (no ffmpeg / model runtime in
this environment); everything Ray-side — schema handling, actor-pool
stage shape, batch sizing for wide binary rows — is real and tested.

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


class SampleFrames:
    """Actor-pool stage: ``video:binary`` → one row per sampled frame
    (``frame_idx``, ``frame:binary``). Deterministic fake sampler; the
    real ffmpeg-backed implementation replaces ``_frames``."""

    def __init__(self, video_col: str = "video", every_n: int = 10):
        self.video_col = video_col
        self.every_n = every_n

    def _frames(self, raw: bytes) -> list[bytes]:
        n_frames = 1 + len(raw) % 5
        return [raw[:16] + bytes([i]) for i in range(0, n_frames, 1)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.video_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out_parent, out_idx, out_frame = [], [], []
        for row, v in enumerate(col):
            frames = self._frames(v.as_py() or b"")[:: max(1, self.every_n)]
            for i, f in enumerate(frames):
                out_parent.append(row)
                out_idx.append(i)
                out_frame.append(f)
        parent_cols = {
            name: batch[name].take(pa.array(out_parent, type=pa.int64()))
            for name in batch.column_names
            if name != self.video_col
        }
        return pa.table(
            {
                **parent_cols,
                "frame_idx": pa.array(out_idx, type=pa.int32()),
                "frame": pa.array(out_frame, type=pa.large_binary()),
            }
        )


def embed_fake(batch: pa.Table, payload_col: str = "pixels", dim: int = 16) -> pa.Table:
    """Deterministic fake feature extractor: payload bytes → float vector
    (stands in for a batched model forward pass; the real model loads in
    an actor's ``__init__`` and runs here per batch)."""
    col = batch[payload_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vecs = []
    for v in col:
        raw = np.frombuffer(v.as_py() or b"\x00", dtype=np.uint8)
        acc = np.resize(raw.astype(np.float32), dim)
        norm = np.linalg.norm(acc)
        vecs.append((acc / norm if norm else acc).tolist())
    return batch.append_column("embedding", pa.array(vecs, type=pa.list_(pa.float32())))
