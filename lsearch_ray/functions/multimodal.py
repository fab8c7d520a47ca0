"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment — see ``DecodeImage.__init__``); everything Ray-side is
real and tested: schema handling, actor-pool stage shape, batch sizing
for wide binary rows, and deterministic fake decodes so downstream stages
(resize → feature-extract → write) exercise real data flow.

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


class DecodeImage:
    """Actor-pool stage: ``image:binary`` → ``height/width/channels`` +
    ``pixels:binary`` (row-major uint8).

    Real decoders (PIL / cv2) are absent in this container; with
    ``fake=True`` (default) a deterministic stand-in derives dimensions
    from a 16-byte header so the full Ray pipeline is testable. With
    ``fake=False`` the stage raises ``NotImplementedError`` at
    construction — i.e. per actor, not per batch — marking exactly where
    the real decoder plugs in.
    """

    def __init__(self, image_col: str = "image", fake: bool = True):
        self.image_col = image_col
        if not fake:
            raise NotImplementedError(
                "real image decoding requires PIL/cv2, not present in this "
                "environment; plug the decoder in here"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.image_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        heights, widths, pixels = [], [], []
        for v in col:
            raw = v.as_py() or b""
            # deterministic fake: dims from the payload's first bytes
            h = 1 + (raw[0] if raw else 0) % 8
            w = 1 + (raw[1] if len(raw) > 1 else 0) % 8
            rng = np.random.RandomState(len(raw) % 2**31)
            pixels.append(rng.randint(0, 256, size=h * w * 3, dtype=np.uint8).tobytes())
            heights.append(h)
            widths.append(w)
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
