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


def test_real_bmp_codec_roundtrip():
    import numpy as np

    from ethereum_etl_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for w, h, top_down in [(5, 3, False), (4, 2, True), (1, 1, False),
                           (7, 6, True)]:  # w=5,7 exercise row padding
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        dec = decode_bmp(encode_bmp(rgb, top_down=top_down))
        assert dec is not None
        arr, gw, gh = dec
        assert (gw, gh) == (w, h)
        assert np.array_equal(arr, rgb)


def test_real_bmp_codec_rejects_unsupported_without_raising():
    import numpy as np

    from ethereum_etl_ray.stages.multimodal import decode_bmp, encode_bmp

    assert decode_bmp(None) is None
    assert decode_bmp(b"NOPE") is None
    assert decode_bmp(b"BM" + b"\0" * 40) is None  # truncated header
    good = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    good[28:30] = (8).to_bytes(2, "little")  # palettized bpp → unsupported
    assert decode_bmp(bytes(good)) is None


def test_decode_blobs_real_codec_on_planted_bmps(ray_session):
    import numpy as np

    from ethereum_etl_ray.stages.multimodal import encode_bmp

    rng = np.random.default_rng(5)
    blobs = [encode_bmp(rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)),
             b"not a bmp",
             encode_bmp(rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8),
                        top_down=True)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "blob": pa.array(blobs, pa.binary()),
        "media_type": pa.array(["image/bmp"] * 3, pa.string()),
    }))
    rows = sorted(decode_blobs(ds, real=True).to_pandas()
                  .to_dict("records"), key=lambda r: r["doc_id"])
    assert rows[0]["decode_ok"] and (rows[0]["width"], rows[0]["height"]) == (6, 4)
    assert not rows[1]["decode_ok"] and rows[1]["n_pixels"] == 0
    assert rows[2]["decode_ok"] and (rows[2]["width"], rows[2]["height"]) == (3, 2)


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
