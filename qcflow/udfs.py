"""The only Python-in-the-loop: Arrow-batched pandas UDFs.

Three crossings, all vectorized (never per-row Python):

- ``with_langid_ppl``  — langid (lang, conf) + perplexity in ONE struct
  UDF so the transcript column crosses the Arrow boundary once.
- ``with_pcm_stats``   — decode bytes -> sample count / duration / RMS.
- ``with_snr``         — decode + re-synthesize the original waveform from
  clip_id -> SNR dB (the per-row PCM invariant; validation path only).

Model arrays are broadcast once (``SparkContext.broadcast``) and
lazily localized per executor — not captured per-batch or re-pickled per
task (SURVEY §4 vectorization notes).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow import audio
from qcflow.models import (
    MIN_TRIGRAMS,
    PPL_MAX,
    TEMP,
    V_BUCKETS,
    QcModels,
    char_classes,
    train_models,
    trigram_hashes,
)

_LOCAL: dict[str, QcModels] = {}


def _broadcast_models(spark: SparkSession, seed: int = 1234):
    sc = spark.sparkContext
    return sc.broadcast(train_models(seed))


def _score_batch(models: QcModels, texts: pd.Series) -> pd.DataFrame:
    """Vectorized-per-batch scoring. Hash/bincount per text (numpy), then
    one (n_texts x V) @ (V x L) matmul for the whole batch."""
    n = len(texts)
    langs = np.empty(n, dtype=object)
    confs = np.zeros(n, dtype=np.float64)
    ppls = np.full(n, PPL_MAX, dtype=np.float64)
    counts = np.zeros((n, V_BUCKETS), dtype=np.float32)
    n_tri = np.zeros(n, dtype=np.int64)
    vals = texts.fillna("").astype(str).values
    for i, text in enumerate(vals):
        h = trigram_hashes(text)
        n_tri[i] = len(h)
        if len(h):
            counts[i] = np.bincount(h, minlength=V_BUCKETS)
        c = char_classes(text)
        if len(c) >= 2:
            lp = models.bigram_lp[c[:-1], c[1:]]
            ppls[i] = np.exp(-lp.mean())
    scores = counts @ models.langid_w + models.langid_prior  # (n, L)
    best = scores.argmax(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        norm = scores / np.maximum(n_tri, 1)[:, None] * TEMP
        norm = norm - norm.max(axis=1, keepdims=True)
        p = np.exp(norm)
        p = p / p.sum(axis=1, keepdims=True)
    for i in range(n):
        if n_tri[i] < MIN_TRIGRAMS:
            langs[i] = "und"
            confs[i] = 0.0
        else:
            langs[i] = models.langs[best[i]]
            confs[i] = float(p[i, best[i]])
    return pd.DataFrame({"lang": langs, "lang_conf": confs, "perplexity": ppls})


def with_langid_ppl(df: DataFrame, spark: SparkSession, seed: int = 1234) -> DataFrame:
    """Append lang / lang_conf / perplexity via one Arrow crossing."""
    bc = _broadcast_models(spark, seed)

    @F.pandas_udf("lang string, lang_conf double, perplexity double")
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        models = bc.value  # localized once per worker, reused across batches
        for s in it:
            yield _score_batch(models, s)

    out = df.withColumn("_m", _udf(F.col("transcript")))
    return out.select("*", "_m.lang", "_m.lang_conf", "_m.perplexity").drop("_m")


def with_pcm_stats(df: DataFrame) -> DataFrame:
    """Decode-path stats: true sample count + RMS from the decoded PCM."""

    @F.pandas_udf("n_samples long, rms double")
    def _udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ns = np.zeros(len(pdf), dtype=np.int64)
            rms = np.full(len(pdf), np.nan)
            for i, (b, codec) in enumerate(zip(pdf["bytes"], pdf["codec"])):
                if b is None or codec not in audio.KNOWN_CODECS:
                    continue
                x = audio.decode(bytes(b), codec)
                ns[i] = len(x)
                if len(x):
                    rms[i] = float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
            yield pd.DataFrame({"n_samples": ns, "rms": rms})

    out = df.withColumn("_p", _udf(F.struct("bytes", "codec")))
    return out.select("*", "_p.n_samples", "_p.rms").drop("_p")


def with_snr(df: DataFrame) -> DataFrame:
    """Per-row PCM invariant: SNR of decoded bytes vs the re-synthesized
    original waveform (clip index recovered from clip_id). Validation mode
    only — it re-synthesizes, so it costs ~1x generation."""

    @F.pandas_udf("double")
    def _udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        for pdf in it:
            out = np.full(len(pdf), np.nan)
            for i, (cid, b, codec, sr) in enumerate(
                zip(pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"])
            ):
                if b is None or codec not in audio.KNOWN_CODECS:
                    continue
                est = audio.decode(bytes(b), codec)
                idx = int(cid.rsplit("-", 1)[1])
                sr_eff = int(sr) if int(sr) in audio.VALID_SR else 8000
                ref = audio.synth_wave(idx, len(est), sr_eff)
                out[i] = audio.snr_db(ref, est)
            yield pd.Series(out)

    return df.withColumn(
        "snr_db", _udf(F.struct("clip_id", "bytes", "codec", "sr_hz"))
    )
