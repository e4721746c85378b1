"""Multimodal (binary-payload) pipeline stages — plumbing real, codecs stubbed.

Treats image/audio/video as opaque ``binary`` columns with typed metadata,
processed by actor-pool ``map_batches`` stages (codec "loaded" once per actor
in ``__init__``). The container has no image/audio libraries, so the actual
decode is stubbed: a clearly-marked deterministic fake parses the synthetic
header below; attempting a real decode raises ``NotImplementedError``. The
Ray-side plumbing — schema, batch sizing for wide binary rows, actor
signature, output layout — is real and tested.

Payload format (synthetic): b"IMG1" + width(4B LE) + height(4B LE) + pixels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

MAGIC = b"IMG1"

BLOB_SCHEMA = pa.schema([
    pa.field("doc_id", pa.int64()),
    pa.field("blob", pa.binary()),
    pa.field("media_type", pa.string()),
])


def make_blob_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """documents → fake image blobs (deterministic from text bytes)."""
    texts = batch.column(text_col).to_pylist()
    blobs = []
    for t in texts:
        payload = (t or "").encode()
        w = max(1, min(len(payload), 64))
        h = max(1, (len(payload) + w - 1) // w)
        blobs.append(MAGIC + int(w).to_bytes(4, "little") + int(h).to_bytes(4, "little")
                     + payload)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "blob": pa.array(blobs, pa.binary()),
        "media_type": pa.array(["image/x-fake"] * len(blobs), pa.string()),
    }, schema=BLOB_SCHEMA)


class DecodeImage:
    """Actor-pool decode stage. ``real=False`` (default) parses the synthetic
    header; ``real=True`` documents where a real codec (PIL/libvips) plugs in
    and raises ``NotImplementedError`` in this container."""

    def __init__(self, real: bool = False):
        self.real = real
        if real:
            try:
                import PIL.Image  # noqa: F401 — not in this container
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode requires an image library (PIL/libvips); "
                    "not available in this environment — use the deterministic "
                    "fake decoder (real=False)"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("blob").to_pylist()
        w = np.empty(len(blobs), np.int32)
        h = np.empty(len(blobs), np.int32)
        ok = np.empty(len(blobs), bool)
        for i, b in enumerate(blobs):
            good = b is not None and b[:4] == MAGIC and len(b) >= 12
            ok[i] = good
            w[i] = int.from_bytes(b[4:8], "little") if good else 0
            h[i] = int.from_bytes(b[8:12], "little") if good else 0
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "n_pixels": pa.array((w.astype(np.int64) * h), pa.int64()),
            "decode_ok": pa.array(ok),
        })


def decode_blobs(ds: ray.data.Dataset, *, concurrency: int = 2,
                 batch_size: int = 256) -> ray.data.Dataset:
    """Wide-binary-row stage: SMALL batch size (payload bytes, not row count,
    set the memory budget) and an actor pool so codec init happens once."""
    return ds.map_batches(DecodeImage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


class ResizeImage:
    """Actor-pool resize stage (real codec would be PIL/libvips — here the
    deterministic fake resamples the payload bytes nearest-neighbor so output
    dims and payload length are exact). Emits BLOB_SCHEMA rows with the new
    header, so resize stages compose (decode → resize → decode)."""

    def __init__(self, target_w: int, target_h: int):
        self.tw, self.th = int(target_w), int(target_h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("blob").to_pylist():
            if b is None or b[:4] != MAGIC or len(b) < 12:
                out.append(None)
                continue
            w = int.from_bytes(b[4:8], "little")
            h = int.from_bytes(b[8:12], "little")
            px = np.frombuffer(b, np.uint8, count=max(0, len(b) - 12), offset=12)
            if w == 0 or h == 0:
                out.append(None)
                continue
            # empty payload with valid dims → zero pixels (still resizable)
            grid = np.zeros(w * h, np.uint8)
            grid[: len(px)] = px[: w * h]
            grid = grid.reshape(h, w)[
                np.minimum((np.arange(self.th) * h) // self.th, h - 1)][:,
                np.minimum((np.arange(self.tw) * w) // self.tw, w - 1)]
            out.append(MAGIC + self.tw.to_bytes(4, "little")
                       + self.th.to_bytes(4, "little") + grid.tobytes())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "blob": pa.array(out, pa.binary()),
            "media_type": batch.column("media_type"),
        }, schema=BLOB_SCHEMA)


class ExtractImageFeatures:
    """Actor-pool feature extraction: deterministic byte-histogram folded to
    ``dim`` L2-normalized floats — the model-inference stage shape (weights
    "loaded" once per actor; batched forward per __call__). Output bridges
    directly into ``stages.ann`` (embedding column ``list<float>``)."""

    def __init__(self, dim: int = 16):
        self.dim = int(dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for b in batch.column("blob").to_pylist():
            if b is None or len(b) <= 12:
                feats.append([0.0] * self.dim)
                continue
            px = np.frombuffer(b, np.uint8, count=len(b) - 12, offset=12)
            hist = np.bincount(px % self.dim, minlength=self.dim).astype(np.float64)
            n = np.linalg.norm(hist)
            feats.append((hist / n if n else hist).tolist())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "embedding": pa.array(feats, pa.list_(pa.float64())),
        })


def sample_frames(ds: ray.data.Dataset, every_k: int = 4, *,
                  concurrency: int = 2, batch_size: int = 64) -> ray.data.Dataset:
    """Frame sampling for video-shaped blobs: each pixel ROW of the fake
    payload is one "frame"; every k-th frame is emitted as its own
    BLOB_SCHEMA row (1×w image) with ``frame_idx`` and the parent key — the
    explode-with-parent-key pattern (E2/E5) applied to media."""

    def frames(batch: pa.Table) -> pa.Table:
        doc_ids, idxs, blobs = [], [], []
        for did, b in zip(batch.column("doc_id").to_pylist(),
                          batch.column("blob").to_pylist()):
            if b is None or b[:4] != MAGIC or len(b) < 12:
                continue
            w = int.from_bytes(b[4:8], "little")
            h = int.from_bytes(b[8:12], "little")
            px = np.frombuffer(b, np.uint8, count=len(b) - 12, offset=12)
            grid = np.zeros(w * h, np.uint8)
            grid[: len(px)] = px[: w * h]
            grid = grid.reshape(h, w)
            for fi in range(0, h, max(1, every_k)):
                doc_ids.append(did)
                idxs.append(fi)
                blobs.append(MAGIC + w.to_bytes(4, "little")
                             + (1).to_bytes(4, "little") + grid[fi].tobytes())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "blob": pa.array(blobs, pa.binary()),
            "media_type": pa.array(["image/x-fake"] * len(blobs), pa.string()),
        })

    return ds.map_batches(frames, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
