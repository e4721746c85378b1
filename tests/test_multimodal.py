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


def test_resize_exact_dims_and_composes_with_decode():
    from ethereum_etl_ray.stages.multimodal import ResizeImage

    resized = ResizeImage(8, 4)(make_blob_batch(_docs()))
    out = DecodeImage()(resized).to_pylist()
    assert all(r["width"] == 8 and r["height"] == 4 and r["decode_ok"]
               for r in out)
    b = resized.column("blob")[0].as_py()
    assert len(b) == 12 + 8 * 4  # header + exact resampled payload


def test_feature_extract_bridges_to_ann():
    import numpy as np

    from ethereum_etl_ray.stages.ann import brute_force_topk
    from ethereum_etl_ray.stages.multimodal import ExtractImageFeatures

    docs = pa.table({"doc_id": pa.array(list(range(6)), pa.int64()),
                     "text": pa.array(["aaa" * (i + 1) for i in range(6)])})
    feats = ExtractImageFeatures(dim=8)(make_blob_batch(docs))
    assert feats.num_rows == 6
    mats = np.array(feats.column("embedding").to_pylist())
    assert mats.shape == (6, 8)
    assert np.allclose(np.linalg.norm(mats, axis=1), 1.0)  # L2-normalized
    # composes with the similarity-search stage
    ds = ray.data.from_arrow(feats.rename_columns(["vec_id", "embedding"]))
    top = brute_force_topk(ds, np.array([0]), mats[:1], k=3)
    assert len(top) == 3 and (top.query_id == 0).all()


def test_frame_sampling_explodes_with_parent_key():
    from ethereum_etl_ray.stages.multimodal import sample_frames

    docs = pa.table({"doc_id": pa.array([7], pa.int64()),
                     "text": pa.array(["z" * 640])})  # 64 wide × 10 rows
    ds = ray.data.from_arrow(make_blob_batch(docs))
    frames = sample_frames(ds, every_k=3).to_pandas()
    assert frames.doc_id.unique().tolist() == [7]
    assert frames.frame_idx.tolist() == [0, 3, 6, 9]
    decoded = DecodeImage()(pa.Table.from_pandas(frames)).to_pylist()
    assert all(r["width"] == 64 and r["height"] == 1 for r in decoded)


def test_actor_pool_stage_end_to_end():
    ds = ray.data.from_arrow(_docs())
    blobs = ds.map_batches(make_blob_batch, batch_format="pyarrow")
    out = decode_blobs(blobs).to_pandas()
    assert len(out) == 3 and out.decode_ok.all() == (out.width > 0).all()
    assert bytes(ray.data.from_arrow(make_blob_batch(_docs())).take(1)[0]["blob"])[:4] == MAGIC
