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


# ------------------------------------------------ image near-dup (pHash)
#
# Construction-truth fixture for perceptual-hash dedup: 200 base images;
# the first 60 get a JITTERED copy (small uint8 noise, amplitude backed
# off per-image until the block-mean phash stays within Hamming radius
# 3 — last-resort amplitude 0 = exact copy, so the bound is guaranteed
# deterministically). Truth columns (orig_id, copy_id, t_hamming) are
# written at build time with the SAME qimg_phash64 kernel the executors
# run, so Spark's recovered Hamming distances are bit-identical through
# the bytes. Spark must find the pairs via decode -> phash -> 4x16-bit
# banded join (pigeonhole: Hamming <= 3 guarantees a clean band) — the
# oracle only projects the truth columns.

N_PHASH = 200
N_PHASH_COPIES = 60
_PH_OFF = 100_000
_PH_BANDS, _PH_BAND_BITS = 4, 16
_PH_HAM_MAX = _PH_BANDS - 1  # pigeonhole radius for guaranteed recall
_PFIX = os.path.join(_DIR, "phash_v1.parquet")


def _materialize_phash() -> None:
    if os.path.exists(_PFIX):
        return
    from qcflow.multimodal import phash_hamming, qimg_phash64

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_PHASH):
        rng = np.random.default_rng([5077, 11, i])
        w = int(rng.integers(16, 49))
        h = int(rng.integers(16, 41))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append(
            {
                "img_id": i,
                "payload": qimg_encode(arr),
                "orig_id": None,
                "copy_id": None,
                "t_hamming": None,
            }
        )
        if i < N_PHASH_COPIES:
            base = qimg_phash64(arr)
            for amp in (12, 6, 3, 1, 0):
                nrng = np.random.default_rng([5077, 12, i, amp])
                noise = nrng.integers(-amp, amp + 1, arr.shape)
                cp = np.clip(arr.astype(np.int64) + noise, 0, 255).astype(
                    np.uint8
                )
                ham = phash_hamming(base, qimg_phash64(cp))
                if ham <= _PH_HAM_MAX:
                    break
            rows.append(
                {
                    "img_id": i + _PH_OFF,
                    "payload": qimg_encode(cp),
                    "orig_id": i,
                    "copy_id": i + _PH_OFF,
                    "t_hamming": ham,
                }
            )
    pdf = pd.DataFrame(rows)
    for c in ("orig_id", "copy_id", "t_hamming"):
        pdf[c] = pdf[c].astype("Int64")
    pdf.to_parquet(_PFIX, index=False)


_materialize_phash()


@query(
    "dedup_image_phash",
    oracle=f"""
    SELECT CAST(orig_id AS BIGINT) AS id_a,
           CAST(copy_id AS BIGINT) AS id_b,
           CAST(t_hamming AS INT) AS hamming
    FROM '{_PFIX}'
    WHERE copy_id IS NOT NULL AND t_hamming <= {_PH_HAM_MAX}
    """,
)
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs by perceptual hash: decode -> block-mean
    phash (one mapInPandas crossing, 8-byte rows out) -> 4x16-bit banded
    self-join -> exact Hamming filter. Hamming <= 3 guarantees >= 1
    clean band (pigeonhole), so banded recall is 1 within the radius and
    the join never compares full hashes outside shared buckets — the
    dedup_simhash_pairs banding machinery applied to the image modality.
    Restricted to planted (orig, copy) pairs so the DuckDB oracle is a
    pure truth-column projection while Spark recovers everything THROUGH
    the bytes."""
    from qcflow.multimodal import image_phash

    _materialize_phash()
    imgs = spark.read.parquet(_PFIX).select("img_id", "payload")
    ph = image_phash(imgs)
    bands = ph.select(
        "img_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.expr(
                            f"(phash >> {j * _PH_BAND_BITS})"
                            f" & {(1 << _PH_BAND_BITS) - 1}"
                        ).alias("bucket"),
                    )
                    for j in range(_PH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("img_id", "phash", "bb.band", "bb.bucket")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.expr("a.phash ^ b.phash"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.img_id") == F.col("a.img_id") + _PH_OFF),
        )
        .select(
            F.col("a.img_id").alias("id_a"),
            F.col("b.img_id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= _PH_HAM_MAX)
        .dropDuplicates(["id_a", "id_b"])
    )
