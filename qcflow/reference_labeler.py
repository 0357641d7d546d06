"""Reference labeler: an independent single-process pandas implementation
of the full QC semantics, in the reference app's own idiom (eager pandas,
np.nanpercentile thresholds — Home.py:337-365, boolean-mask rule flags —
Home.py:175-183, re.sub scrub). This is the oracle the Spark pipeline must
match at keep/drop F1 >= 0.99 (BASELINE.json .metric).

Deliberately shares NO Spark code with the pipeline — only the trained
model arrays and the scoring spec in qcflow.models' docstring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from qcflow.audio import KNOWN_CODECS, VALID_SR
from qcflow.models import (
    MIN_TRIGRAMS,
    PPL_MAX,
    TEMP,
    V_BUCKETS,
    char_classes,
    train_models,
    trigram_hashes,
)
from qcflow.rules import (
    DUR_MAX_MS,
    DUR_MIN_MS,
    LANG_CONF_MIN,
    P_CPS,
    P_PPL,
    P_REPETITION,
    SYMBOL_MAX,
)
from qcflow.scrub import scrub_text

RULE_ORDER = [
    "invalid_sr",
    "bad_duration",
    "unknown_codec",
    "empty_transcript",
    "high_repetition",
    "symbol_dense",
    "length_mismatch",
    "low_lang_conf",
    "high_perplexity",
]


def _features(df: pd.DataFrame) -> pd.DataFrame:
    t = df["transcript"].fillna("")
    n_chars = t.str.len().astype(float)
    toks = t.str.split(" ").map(lambda ws: [w for w in ws if w])
    n_tokens = toks.map(len).astype(float)
    n_distinct = toks.map(lambda ws: len(set(ws))).astype(float)
    n_sym = t.str.replace(r"[a-z .]", "", regex=True).str.len().astype(float)
    out = df.copy()
    out["n_chars"] = n_chars
    with np.errstate(invalid="ignore", divide="ignore"):
        out["distinct_ratio"] = np.where(n_tokens > 0, n_distinct / n_tokens, np.nan)
        out["symbol_ratio"] = np.where(n_chars > 0, n_sym / n_chars, np.nan)
        out["cps"] = np.where(
            (df["dur_ms"].values > 0) & (n_chars > 0),
            n_chars / (df["dur_ms"].values / 1000.0),
            np.nan,
        )
    return out


def _score_models(df: pd.DataFrame, seed: int = 1234) -> pd.DataFrame:
    m = train_models(seed)
    langs, confs, ppls = [], [], []
    for text in df["transcript"].fillna(""):
        h = trigram_hashes(text)
        c = char_classes(text)
        if len(c) >= 2:
            ppls.append(float(np.exp(-m.bigram_lp[c[:-1], c[1:]].mean())))
        else:
            ppls.append(PPL_MAX)
        if len(h) < MIN_TRIGRAMS:
            langs.append("und")
            confs.append(0.0)
            continue
        cnt = np.bincount(h, minlength=V_BUCKETS).astype(np.float32)
        scores = m.langid_prior + cnt @ m.langid_w
        i = int(np.argmax(scores))
        norm = scores / len(h) * TEMP
        norm = norm - norm.max()
        p = np.exp(norm)
        p /= p.sum()
        langs.append(m.langs[i])
        confs.append(float(p[i]))
    out = df.copy()
    out["lang"] = langs
    out["lang_conf"] = confs
    out["perplexity"] = ppls
    return out


def label(clips: pd.DataFrame, seed: int = 1234) -> pd.DataFrame:
    """clips (input_hint schema, `bytes` optional) -> labels frame."""
    df = _score_models(_features(clips), seed)

    thr_rep = np.nanpercentile(df["distinct_ratio"].values.astype(float), P_REPETITION * 100)
    cps_vals = df["cps"].values.astype(float)
    thr_cps_lo = np.nanpercentile(cps_vals, P_CPS[0] * 100)
    thr_cps_hi = np.nanpercentile(cps_vals, P_CPS[1] * 100)
    thr_ppl = np.nanpercentile(df["perplexity"].values.astype(float), P_PPL * 100)

    flags = {
        "invalid_sr": ~df["sr_hz"].isin(VALID_SR).values,
        "bad_duration": (df["dur_ms"].values < DUR_MIN_MS)
        | (df["dur_ms"].values > DUR_MAX_MS),
        "unknown_codec": ~df["codec"].isin(KNOWN_CODECS).values,
        "empty_transcript": df["transcript"].isna().values
        | (df["transcript"].fillna("").str.len() == 0).values,
        # NaN comparisons are False in numpy — NaN never flags, like pandas.
        "high_repetition": df["distinct_ratio"].values < thr_rep,
        "symbol_dense": df["symbol_ratio"].values > SYMBOL_MAX,
        "length_mismatch": (df["cps"].values < thr_cps_lo)
        | (df["cps"].values > thr_cps_hi),
        "low_lang_conf": df["lang_conf"].values < LANG_CONF_MIN,
        "high_perplexity": df["perplexity"].values > thr_ppl,
    }
    reason_mat = np.array([flags[r] for r in RULE_ORDER])  # (R, n)
    reasons = [
        ",".join(RULE_ORDER[j] for j in range(len(RULE_ORDER)) if reason_mat[j, i])
        for i in range(len(df))
    ]
    out = pd.DataFrame(
        {
            "clip_id": df["clip_id"].values,
            "keep": ~reason_mat.any(axis=0),
            "drop_reasons": reasons,
            "lang": df["lang"].values,
            "lang_conf": df["lang_conf"].values,
            "perplexity": df["perplexity"].values,
            "scrubbed_transcript": [scrub_text(t) for t in df["transcript"]],
        }
    )
    return out
