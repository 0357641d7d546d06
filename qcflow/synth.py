"""Deterministic synthetic clip-table generator (FIXTURES.md F1).

Runs AS A SPARK JOB: ``spark.range(n)`` -> ``mapInPandas`` -> parquet, so
fixture generation itself scales with parallelism and every row is a pure
function of its index (counter-based RNG, no wall clock, no cross-row
state). The same rows are produced at any partitioning — generation is
partition-count invariant by construction.

Planted defects (fractions of rows, disjoint-ish by independent draws):
invalid sample rate, out-of-band duration (short/long), unknown codec,
dur/PCM inconsistency, empty transcript, high repetition, symbol density,
length mismatch, embedded PII (email/phone/id), toxicity words.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from qcflow import audio
from qcflow.langs import LANG_WEIGHTS, LANGS, gen_text, gen_words

SEED = 20240613

PII_EMAILS = ["kara.tizu@example.com", "molo7@mail.test", "dz.bogu@site.example"]
PII_PHONES = ["+1 555-201-7788", "555 314 1592", "+44 20 7946 0958"]
PII_IDS = ["AB1234567", "ZX99887766", "QT45678901"]
TOX_WORDS = ["damn", "hell", "stupid", "idiot"]


def _gen_row(i: int, with_audio: bool = True) -> dict:
    """One clip as a pure function of its index. ``with_audio=False``
    produces identical metadata/transcript while skipping waveform
    synthesis + encoding (those use a separate counter-based RNG, so the
    main RNG stream stays aligned; the one main-RNG byte draw — opus junk
    — is still consumed)."""
    return _gen_row_impl(i, with_audio)


def _gen_row_impl(i: int, with_audio: bool) -> dict:
    rng = np.random.default_rng([SEED, i])
    lang = str(rng.choice(LANGS, p=LANG_WEIGHTS))
    planted: list[str] = []

    # --- sample rate / codec / duration ---------------------------------
    if rng.random() < 0.02:
        sr = int(rng.choice([0, 3000, 192000]))
        planted.append("invalid_sr")
    else:
        sr = int(rng.choice(audio.VALID_SR, p=[0.40, 0.30, 0.15, 0.10, 0.05]))

    r = rng.random()
    if r < 0.015:
        dur_ms = int(rng.integers(100, 290))
        planted.append("short_dur")
    elif r < 0.03:
        dur_ms = int(rng.integers(30500, 45000))
        planted.append("long_dur")
    else:
        dur_ms = int(np.exp(rng.uniform(np.log(350), np.log(15000))))

    if rng.random() < 0.01:
        codec = "opus"
        planted.append("unknown_codec")
    else:
        codec = "pcm16" if rng.random() < 0.55 else "ulaw"

    # --- audio bytes ------------------------------------------------------
    sr_eff = sr if sr in audio.VALID_SR else 8000
    n_samples = int(round(dur_ms / 1000.0 * sr_eff))
    if rng.random() < 0.01:
        n_samples = max(1, int(n_samples * float(rng.choice([0.8, 1.2]))))
        planted.append("pcm_inconsistent")
    n_samples = min(n_samples, 2_200_000)
    if codec == "opus":
        # unknown codec: opaque junk bytes — drawn from the MAIN rng, so
        # the draw must happen in meta-only mode too (stream alignment)
        junk = rng.integers(0, 256, min(n_samples, 4096), dtype=np.uint8)
        b = junk.tobytes() if with_audio else None
    elif with_audio:
        wave = audio.synth_wave(i, n_samples, sr_eff)
        b = audio.pcm16_encode(wave) if codec == "pcm16" else audio.ulaw_encode(wave)
    else:
        b = None

    # --- transcript -------------------------------------------------------
    cps = float(np.clip(rng.normal(13.0, 2.0), 8.0, 18.0))
    if rng.random() < 0.02:
        cps = float(rng.choice([1.0, 60.0]))
        planted.append("length_mismatch")
    target_chars = max(int(dur_ms / 1000.0 * cps), 1)

    r = rng.random()
    if r < 0.01:
        text = ""
        planted.append("empty_transcript")
    elif r < 0.03:
        word = gen_words(lang, 1, rng)[0]
        text = " ".join([word] * max(target_chars // (len(word) + 1), 3))
        planted.append("high_repetition")
    else:
        text = gen_text(lang, target_chars, rng)
        if rng.random() < 0.02:
            junk = "".join(
                str(rng.choice(list("@#$%&*!?<>{}[]0123456789")))
                for _ in range(max(target_chars // 3, 5))
            )
            text = text + " " + junk
            planted.append("symbol_dense")

    if text and rng.random() < 0.03:
        kind = int(rng.integers(0, 3))
        tok = [PII_EMAILS, PII_PHONES, PII_IDS][kind][int(rng.integers(0, 3))]
        words = text.split(" ")
        pos = int(rng.integers(0, len(words) + 1))
        text = " ".join(words[:pos] + [tok] + words[pos:])
        planted.append("pii")
    if text and rng.random() < 0.02:
        tox = TOX_WORDS[int(rng.integers(0, len(TOX_WORDS)))]
        words = text.split(" ")
        pos = int(rng.integers(0, len(words) + 1))
        text = " ".join(words[:pos] + [tox] + words[pos:])
        planted.append("tox")

    return {
        "clip_id": f"clip-{i:012d}",
        "bytes": b,
        "sr_hz": sr,
        "dur_ms": dur_ms,
        "codec": codec,
        "transcript": text,
        "true_lang": lang,
        "planted": ",".join(planted),
    }


def gen_batch(indices: np.ndarray, with_audio: bool = True) -> pd.DataFrame:
    return pd.DataFrame([_gen_row(int(i), with_audio) for i in indices])


def generate_clips(spark, n_rows: int, out_dir: str, partitions: int | None = None):
    """Distributed generation: clips parquet + truth-meta parquet side table.
    Two mapInPandas passes, but the meta pass skips audio synthesis (the
    dominant cost) — writing the full frame once and re-reading would move
    the same bytes through disk twice instead."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(with_audio: bool):
        def _g(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if len(pdf):
                    yield gen_batch(pdf["id"].values, with_audio)

        return _g

    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
        "transcript string, true_lang string, planted string"
    )
    rng_df = spark.range(0, n_rows, numPartitions=partitions)
    # audio bytes are incompressible (synthetic PCM/u-law of noisy tones);
    # snappy burns scan CPU for ~1.0 ratio — store uncompressed so the
    # decode path reads at memcpy speed
    # small row groups (16 MB vs the 128 MB default) keep the payload
    # files SPLITTABLE: a parquet split can only start at a row-group
    # boundary, so a 110 MB single-group file caps any slice of the table
    # at one task per file (the bench's 10k-clip slice ran 11-wide on 32
    # cores). Identical rows, same files — only the group boundaries move.
    rng_df.mapInPandas(gen(True), schema).select(
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"
    ).write.mode("overwrite").option("compression", "uncompressed").option(
        "parquet.block.size", 16 * 1024 * 1024
    ).parquet(f"{out_dir}/clips.parquet")
    rng_df.mapInPandas(gen(False), schema).select(
        "clip_id", "true_lang", "planted"
    ).write.mode("overwrite").parquet(f"{out_dir}/clips_meta.parquet")


def gen_pandas(n_rows: int) -> pd.DataFrame:
    """Driver-side generation for small unit-test fixtures (same rows)."""
    return gen_batch(np.arange(n_rows))
