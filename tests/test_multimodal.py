"""Multimodal binary-payload stage tests (stub codec, real plumbing)."""

import pyarrow as pa
import pytest
import ray.data

from ethereum_etl_ray.stages.multimodal import (
    MAGIC,
    DecodeImage,
    decode_blobs,
    make_blob_batch,
)


def _docs():
    return pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": pa.array(["x" * 100, "y" * 5, ""])})


def test_blob_roundtrip_dimensions():
    blobs = make_blob_batch(_docs())
    out = DecodeImage()(blobs)
    rows = out.to_pylist()
    assert rows[0] == {"doc_id": 1, "width": 64, "height": 2, "n_pixels": 128,
                       "decode_ok": True}
    assert rows[1]["width"] == 5 and rows[1]["height"] == 1
    assert rows[2]["width"] == 1 and rows[2]["height"] == 1  # empty payload floor


def test_corrupt_blob_flagged_not_raised():
    t = pa.table({"doc_id": pa.array([9], pa.int64()),
                  "blob": pa.array([b"NOPE"], pa.binary()),
                  "media_type": pa.array(["image/x-fake"])})
    row = DecodeImage()(t).to_pylist()[0]
    assert row["decode_ok"] is False and row["n_pixels"] == 0


def test_real_codec_clearly_stubbed():
    with pytest.raises(NotImplementedError, match="image library"):
        DecodeImage(real=True)


def test_actor_pool_stage_end_to_end():
    ds = ray.data.from_arrow(_docs())
    blobs = ds.map_batches(make_blob_batch, batch_format="pyarrow")
    out = decode_blobs(blobs).to_pandas()
    assert len(out) == 3 and out.decode_ok.all() == (out.width > 0).all()
    assert bytes(ray.data.from_arrow(make_blob_batch(_docs())).take(1)[0]["blob"])[:4] == MAGIC
