"""Multimodal (binary-payload) pipeline stages.

Treats image/audio/video as opaque ``binary`` columns with typed metadata,
processed by actor-pool ``map_batches`` stages (codec "loaded" once per actor
in ``__init__``). Two codecs:

* ``real=False`` (default): a deterministic fake parsing the synthetic
  header below — exercises the plumbing without any image dependency.
* ``real=True``: a REAL pure-numpy BMP decoder (BITMAPINFOHEADER, 24-bpp
  uncompressed BI_RGB, bottom-up or top-down rows, 4-byte row padding) —
  the format every image library emits without compression. Unsupported
  BMP variants (palettized, RLE, OS/2 core headers) and non-BMP blobs
  report ``decode_ok=False`` rather than raising, so one bad payload
  can't kill a 100 TB scan. Richer codecs (PNG/JPEG) would plug into the
  same actor signature via PIL/libvips where available.

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


def decode_bmp(b: bytes | None) -> tuple[np.ndarray, int, int] | None:
    """Pure-numpy BMP decode: 24-bpp uncompressed BI_RGB with a
    BITMAPINFOHEADER (or larger V4/V5 header). Returns ``(rgb HxWx3 uint8,
    width, height)`` or ``None`` for anything unsupported/malformed."""
    if b is None or len(b) < 54 or b[:2] != b"BM":
        return None
    data_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:  # OS/2 BITMAPCOREHEADER etc.
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    planes = int.from_bytes(b[26:28], "little")
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down, height = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if data_off < 54 or len(b) < data_off + stride * height:
        return None
    rows = np.frombuffer(b, np.uint8, count=stride * height,
                         offset=data_off).reshape(height, stride)
    arr = rows[:, : w * 3].reshape(height, w, 3)
    if not top_down:
        arr = arr[::-1]  # bottom-up storage order
    return arr[:, :, ::-1].copy(), w, height  # BGR → RGB


def encode_bmp(rgb: np.ndarray, top_down: bool = False) -> bytes:
    """Inverse of ``decode_bmp`` (24-bpp BI_RGB): for sinks and tests."""
    height, w = rgb.shape[0], rgb.shape[1]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((height, stride), np.uint8)
    bgr = rgb[:, :, ::-1]
    rows[:, : w * 3] = bgr.reshape(height, w * 3)
    if not top_down:
        rows = rows[::-1]
    data = rows.tobytes()
    size = 54 + len(data)
    header = (b"BM" + size.to_bytes(4, "little") + b"\0\0\0\0"
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + (-height if top_down else height).to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
              + b"\0" * 16)
    return header + data


class DecodeImage:
    """Actor-pool decode stage. ``real=False`` (default) parses the synthetic
    header; ``real=True`` runs the pure-numpy BMP codec (``decode_bmp``)."""

    def __init__(self, real: bool = False):
        self.real = real

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("blob").to_pylist()
        w = np.zeros(len(blobs), np.int32)
        h = np.zeros(len(blobs), np.int32)
        ok = np.zeros(len(blobs), bool)
        for i, b in enumerate(blobs):
            if self.real:
                dec = decode_bmp(b)
                if dec is not None:
                    ok[i], w[i], h[i] = True, dec[1], dec[2]
            else:
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
                 batch_size: int = 256, real: bool = False) -> ray.data.Dataset:
    """Wide-binary-row stage: SMALL batch size (payload bytes, not row count,
    set the memory budget) and an actor pool so codec init happens once."""
    return ds.map_batches(DecodeImage, batch_format="pyarrow",
                          fn_constructor_kwargs={"real": real},
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
