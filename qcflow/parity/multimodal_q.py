"""Multimodal parity query, hash-gated via construction truth.

A 200-image QIMG fixture with VARIED dimensions is materialized once to
parquet (`.cache/mm_images/`), carrying truth columns written at
construction (true width/height and channel-R mean computed directly on
the source array, before encoding). The Spark side must recover them
THROUGH the bytes — parquet scan -> Arrow batch -> QIMG decode -> pooled
resize — in `qcflow.multimodal.image_features`; the DuckDB oracle only
reads the truth columns and derives the expected pooled-thumbnail
geometry (w//4, h//4, QIMG header 12 bytes + w2*h2*3). A hash match
therefore gates the whole binary-column decode path end-to-end. Real
codecs (JPEG/H.264) remain honestly stubbed (multimodal.py:decode_real);
frame sampling and resize math are additionally unit-tested in
tests/test_multimodal.py.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow.multimodal import image_features, qimg_encode
from qcflow.parity.registry import query

N_IMAGES = 200
RESIZE_FACTOR = 4
_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "mm_images",
)
_FIX = os.path.join(_DIR, "images.parquet")


def _materialize() -> None:
    if os.path.exists(_FIX):
        return
    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_IMAGES):
        rng = np.random.default_rng([5077, 7, i])
        w = int(rng.integers(16, 65))
        h = int(rng.integers(12, 49))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        # truth computed on the SOURCE array (independent of the decode
        # path): plain sum/count, not the reshape-mean the UDF uses
        t_mean_r = float(arr[:, :, 0].astype(np.float64).sum() / (w * h))
        rows.append(
            {
                "img_id": i,
                "payload": qimg_encode(arr),
                "t_width": w,
                "t_height": h,
                "t_mean_r": t_mean_r,
            }
        )
    pd.DataFrame(rows).to_parquet(_FIX, index=False)


_materialize()

_ORACLE = f"""
SELECT img_id,
       CAST(t_width AS INT) AS width,
       CAST(t_height AS INT) AS height,
       ROUND(t_mean_r, 4) AS mean_r,
       CAST(t_width // {RESIZE_FACTOR} AS INT) AS thumb_w,
       CAST(t_height // {RESIZE_FACTOR} AS INT) AS thumb_h,
       CAST(12 + (t_width // {RESIZE_FACTOR}) * (t_height // {RESIZE_FACTOR}) * 3
            AS INT) AS thumb_bytes
FROM '{_FIX}'
"""


N_VIDEOS = 60
FRAME_EVERY = 2
_VFIX = os.path.join(_DIR, "videos.parquet")


def _materialize_videos() -> None:
    if os.path.exists(_VFIX):
        return
    from qcflow.multimodal import qvid_encode

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_VIDEOS):
        rng = np.random.default_rng([5077, 9, i])
        n_frames = int(rng.integers(1, 12))
        w, h = int(rng.integers(8, 33)), int(rng.integers(8, 25))
        frames = [
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n_frames)
        ]
        # truth: per-frame channel-R mean of the SAMPLED frames, plain
        # python sums (independent of the decode path's numpy mean)
        sampled = list(range(0, n_frames, FRAME_EVERY))
        rows.append(
            {
                "vid_id": i,
                "payload": qvid_encode(frames),
                "t_n_frames": n_frames,
                "t_sampled_idx": sampled,
                "t_frame_bytes": 12 + w * h * 3,
                "t_mean_r": [
                    float(sum(int(v) for v in frames[j][:, :, 0].ravel()) / (w * h))
                    for j in sampled
                ],
            }
        )
    pd.DataFrame(rows).to_parquet(_VFIX, index=False)


_materialize_videos()

_VORACLE = f"""
SELECT vid_id,
       CAST(unnest(t_sampled_idx) AS INT) AS frame_idx,
       CAST(unnest(list_transform(t_sampled_idx, i -> t_frame_bytes)) AS INT)
         AS frame_bytes,
       ROUND(unnest(t_mean_r), 4) AS frame_mean_r
FROM '{_VFIX}'
"""


@query("mm_video_frames", oracle=_VORACLE)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through the bytes: QVID payloads -> every
    2nd frame exploded to its own row (mapInPandas) -> per-frame decode
    + channel mean. The oracle unnests construction truth, so the hash
    gates frame COUNTS, frame GEOMETRY, and frame CONTENT end-to-end."""
    from qcflow.multimodal import video_frame_sample

    _materialize_videos()
    vids = spark.read.parquet(_VFIX).select("vid_id", "payload")
    frames = video_frame_sample(vids, every=FRAME_EVERY)
    return (
        frames.select(
            "vid_id",
            "frame_idx",
            F.length("frame").cast("int").alias("frame_bytes"),
            F.col("frame"),
        )
        .withColumn("_m", _frame_mean_r_udf(F.col("frame")))
        .select(
            "vid_id",
            "frame_idx",
            "frame_bytes",
            F.round("_m", 4).alias("frame_mean_r"),
        )
    )


def _frame_mean_r_udf(col):
    @F.pandas_udf("double")
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from qcflow.multimodal import qimg_decode

        for s in it:
            out = []
            for b in s:
                arr = qimg_decode(bytes(b))
                out.append(float(arr[:, :, 0].astype(np.float64).mean()))
            yield pd.Series(out)

    return _udf(col)


@query("mm_image_features", oracle=_ORACLE)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet-scanned QIMG table -> decode + pooled thumbnail + channel
    mean, entirely in Arrow-batched mapInPandas; every output column is
    checked against construction truth."""
    _materialize()
    imgs = spark.read.parquet(_FIX).select("img_id", "payload")
    return image_features(imgs, resize_factor=RESIZE_FACTOR).select(
        "img_id",
        "width",
        "height",
        F.round("mean_r", 4).alias("mean_r"),
        "thumb_w",
        "thumb_h",
        F.length("thumb").cast("int").alias("thumb_bytes"),
    )
