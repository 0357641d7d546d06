"""Multimodal binary-column plumbing: images/video as opaque bytes + typed
metadata, processed in Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so real-codec decode (JPEG,
H.264, ...) is STUBBED behind ``decode_real`` (raises NotImplementedError
with the production recipe). What IS real and tested end-to-end is the
Spark-side plumbing a 100 TB multimodal pipeline needs: binary columns with
typed metadata, deterministic fake codecs (QIMG/QVID below), batch-shaped
pandas UDFs, pooling resize, frame sampling, and feature extraction.

QIMG format: b"QIMG" + uint32 width + uint32 height + RGB888 bytes.
QVID format: b"QVID" + uint32 n_frames + concatenated QIMG frames.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IMG_MAGIC = b"QIMG"
_VID_MAGIC = b"QVID"


# ------------------------------------------------------------ fake codecs

def qimg_encode(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return _IMG_MAGIC + struct.pack("<II", w, h) + arr.tobytes()


def qimg_decode(b: bytes) -> np.ndarray:
    if b[:4] != _IMG_MAGIC:
        raise ValueError("not a QIMG payload")
    w, h = struct.unpack("<II", b[4:12])
    return np.frombuffer(b, dtype=np.uint8, offset=12).reshape(h, w, 3)


def qimg_resize(arr: np.ndarray, factor: int) -> np.ndarray:
    """Average-pool downscale by an integer factor (numpy only)."""
    h, w, _ = arr.shape
    h2, w2 = h // factor, w // factor
    clipped = arr[: h2 * factor, : w2 * factor]
    return (
        clipped.reshape(h2, factor, w2, factor, 3)
        .mean(axis=(1, 3))
        .astype(np.uint8)
    )


def qvid_encode(frames: list[np.ndarray]) -> bytes:
    out = [_VID_MAGIC, struct.pack("<I", len(frames))]
    out += [qimg_encode(f) for f in frames]
    return b"".join(out)


def qvid_decode(b: bytes) -> list[np.ndarray]:
    if b[:4] != _VID_MAGIC:
        raise ValueError("not a QVID payload")
    (n,) = struct.unpack("<I", b[4:8])
    frames, off = [], 8
    for _ in range(n):
        w, h = struct.unpack("<II", b[off + 4 : off + 12])
        size = 12 + w * h * 3
        frames.append(qimg_decode(b[off : off + size]))
        off += size
    return frames


def decode_real(b: bytes, mime: str) -> np.ndarray:
    """Production decode for real codecs — not available in this sandbox."""
    raise NotImplementedError(
        f"real-codec decode ({mime}) requires Pillow/ffmpeg on the executors; "
        "install them and dispatch here — the Spark plumbing is unchanged."
    )


def synth_image(idx: int, w: int = 32, h: int = 24) -> np.ndarray:
    rng = np.random.default_rng([5077, idx])
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


# ----------------------------------------------------------- Spark plumbing

IMG_FEATURES_SCHEMA = (
    "img_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double, thumb bytes, thumb_w int, thumb_h int"
)


def image_features(df: DataFrame, resize_factor: int = 4) -> DataFrame:
    """mapInPandas decode -> features + pooled thumbnail. Input schema:
    (img_id long, payload binary)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for img_id, payload in zip(pdf["img_id"], pdf["payload"]):
                arr = qimg_decode(bytes(payload))
                thumb = qimg_resize(arr, resize_factor)
                means = arr.reshape(-1, 3).mean(axis=0)
                rows.append(
                    {
                        "img_id": int(img_id),
                        "width": arr.shape[1],
                        "height": arr.shape[0],
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "thumb": qimg_encode(thumb),
                        "thumb_w": thumb.shape[1],
                        "thumb_h": thumb.shape[0],
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        op,
        "img_id long, width int, height int, mean_r double, mean_g double, "
        "mean_b double, thumb binary, thumb_w int, thumb_h int",
    )


_MASK64 = (1 << 64) - 1


def qimg_phash64(arr: np.ndarray) -> int:
    """Block-mean perceptual hash: grayscale -> 8x8 mean-pooled grid ->
    bit i set iff cell i > median. Returns a SIGNED int64 (Spark long).
    Deterministic numpy-only math — the same kernel runs at fixture
    build time (truth) and inside the executor UDF, so recovered hashes
    are bit-identical (the streaming_q.py gating pattern). Robust to
    small pixel jitter: a perturbation only flips a bit when it moves a
    cell mean across the median."""
    g = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    v = 0
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    med = float(np.median(cells))
    for idx, c in enumerate(cells.ravel()):
        if c > med:
            v |= 1 << idx
    return v - (1 << 64) if v >= (1 << 63) else v


def phash_hamming(a: int, b: int) -> int:
    """Hamming distance between two signed-int64 phashes (two's
    complement popcount — equals Spark's bit_count(a ^ b))."""
    return bin((a ^ b) & _MASK64).count("1")


def image_phash(
    df: DataFrame, id_col: str = "img_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas decode -> 64-bit perceptual hash per image. Input
    (id, payload binary); output (id, phash long). One Arrow crossing,
    8-byte output rows — the scale shape for image near-dup (the banded
    Hamming join downstream never touches the bytes again)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "phash": [
                        qimg_phash64(qimg_decode(bytes(p)))
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        op, f"{id_col} long, phash long"
    )


def video_frame_sample(df: DataFrame, every: int = 2) -> DataFrame:
    """mapInPandas frame sampling: QVID payload -> one row per sampled
    frame (vid_id, frame_idx, frame QIMG payload). Input: (vid_id long,
    payload binary)."""

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for vid_id, payload in zip(pdf["vid_id"], pdf["payload"]):
                frames = qvid_decode(bytes(payload))
                for j in range(0, len(frames), every):
                    rows.append(
                        {
                            "vid_id": int(vid_id),
                            "frame_idx": j,
                            "frame": qimg_encode(frames[j]),
                        }
                    )
            yield pd.DataFrame(rows, columns=["vid_id", "frame_idx", "frame"])

    return df.mapInPandas(op, "vid_id long, frame_idx int, frame binary")


def synth_images_df(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic QIMG table generated executor-side."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "img_id": pdf["id"].values,
                    "payload": [
                        qimg_encode(synth_image(int(i))) for i in pdf["id"].values
                    ],
                }
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        gen, "img_id long, payload binary"
    )
