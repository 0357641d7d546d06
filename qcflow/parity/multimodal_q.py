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
