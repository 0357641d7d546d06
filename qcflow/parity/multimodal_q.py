"""Multimodal parity queries (rows-only: binary payloads are not
SQL-expressible in DuckDB, so the driver records the weaker check; the
strong checks live in tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow.multimodal import image_features, synth_images_df
from qcflow.parity.registry import query


@query("mm_image_features")
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 200-image QIMG table -> decode + pooled thumbnail +
    channel means, entirely in Arrow-batched mapInPandas."""
    imgs = synth_images_df(spark, 200)
    return image_features(imgs).select(
        "img_id",
        "width",
        "height",
        F.round("mean_r", 4).alias("mean_r"),
        "thumb_w",
        "thumb_h",
        F.length("thumb").alias("thumb_bytes"),
    )
