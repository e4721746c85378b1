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
