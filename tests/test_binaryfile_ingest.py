"""Raw-file ingest via Spark's built-in binaryFile source: a directory
of raw audio files becomes (path, content) rows — the entry point for an
audio lake that hasn't been tabularized yet — then flows through the
same decode/feature path as the clip table."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from qcflow import audio
from qcflow.udfs import acoustic_stats


def test_binaryfile_ingest_to_features(spark, tmp_path):
    waves = {}
    for i in range(3):
        x = (0.3 * np.sin(np.arange(8000) / (8 + i))).astype(np.float32)
        waves[f"clip{i}.pcm"] = x
        with open(tmp_path / f"clip{i}.pcm", "wb") as f:
            f.write(audio.pcm16_encode(x))
    (tmp_path / "ignore.txt").write_text("not audio")

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pcm")  # source-side file pruning
        .load(str(tmp_path))
        .select(
            F.element_at(F.split("path", "/"), -1).alias("fname"),
            F.col("length"),
            F.col("content"),
        )
    )
    rows = {r["fname"]: r for r in df.collect()}
    assert set(rows) == set(waves)  # the glob filter dropped ignore.txt
    for fname, x in waves.items():
        r = rows[fname]
        assert r["length"] == 2 * len(x)
        dec = audio.pcm16_decode(bytes(r["content"]))
        got = acoustic_stats(dec, 8000)
        want = acoustic_stats(audio.pcm16_decode(audio.pcm16_encode(x)), 8000)
        assert got == want
