"""Multimodal plumbing: codecs roundtrip, Spark-side decode/resize/sample."""

from __future__ import annotations

import numpy as np
import pytest

from qcflow import multimodal as mm


def test_qimg_roundtrip():
    img = mm.synth_image(7, 16, 12)
    assert np.array_equal(mm.qimg_decode(mm.qimg_encode(img)), img)


def test_qimg_resize_pooling():
    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    small = mm.qimg_resize(img, 4)
    assert small.shape == (2, 2, 3)
    assert (small == 100).all()


def test_qvid_roundtrip():
    frames = [mm.synth_image(i, 8, 6) for i in range(5)]
    out = mm.qvid_decode(mm.qvid_encode(frames))
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"\xff\xd8", "image/jpeg")


def test_image_features_spark(spark):
    imgs = mm.synth_images_df(spark, 50, partitions=3)
    feats = mm.image_features(imgs, resize_factor=4).toPandas()
    assert len(feats) == 50
    assert (feats.width == 32).all() and (feats.height == 24).all()
    assert (feats.thumb_w == 8).all() and (feats.thumb_h == 6).all()
    # decode a thumbnail back on the driver: plumbing is lossless
    th = mm.qimg_decode(bytes(feats.thumb.iloc[0]))
    assert th.shape == (6, 8, 3)
    # deterministic across partitionings
    feats2 = (
        mm.image_features(mm.synth_images_df(spark, 50, partitions=7))
        .toPandas()
        .sort_values("img_id")
        .reset_index(drop=True)
    )
    f1 = feats.sort_values("img_id").reset_index(drop=True)
    assert (f1.mean_r == feats2.mean_r).all()


def test_video_frame_sample_spark(spark):
    import pandas as pd

    vids = spark.createDataFrame(
        pd.DataFrame(
            {
                "vid_id": [0, 1],
                "payload": [
                    mm.qvid_encode([mm.synth_image(i, 8, 6) for i in range(6)]),
                    mm.qvid_encode([mm.synth_image(10 + i, 8, 6) for i in range(3)]),
                ],
            }
        )
    )
    out = mm.video_frame_sample(vids, every=2).toPandas()
    assert sorted(out[out.vid_id == 0].frame_idx.tolist()) == [0, 2, 4]
    assert sorted(out[out.vid_id == 1].frame_idx.tolist()) == [0, 2]
    f = mm.qimg_decode(bytes(out[out.vid_id == 0].frame.iloc[0]))
    assert f.shape == (6, 8, 3)


def test_phash_deterministic_and_jitter_robust():
    """Kernel invariants: identical arrays hash identically; small
    jitter stays within a small Hamming radius far below random-pair
    distance (~32 bits for independent 64-bit hashes)."""
    rng = np.random.default_rng(99)
    arr = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    h0 = mm.qimg_phash64(arr)
    assert h0 == mm.qimg_phash64(arr.copy())
    jit = np.clip(
        arr.astype(np.int64) + rng.integers(-2, 3, arr.shape), 0, 255
    ).astype(np.uint8)
    assert mm.phash_hamming(h0, mm.qimg_phash64(jit)) <= 6
    other = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    assert mm.phash_hamming(h0, mm.qimg_phash64(other)) >= 12


def test_image_phash_spark_matches_kernel(spark):
    """The mapInPandas path returns exactly the driver-side kernel's
    hashes (bit-identical through Arrow), including sign handling for
    hashes with bit 63 set."""
    import pandas as pd

    arrs = [mm.synth_image(i, 24, 20) for i in range(16)]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "img_id": range(16),
                "payload": [mm.qimg_encode(a) for a in arrs],
            }
        )
    )
    got = mm.image_phash(df).toPandas().set_index("img_id").phash
    for i, a in enumerate(arrs):
        assert int(got[i]) == mm.qimg_phash64(a)
