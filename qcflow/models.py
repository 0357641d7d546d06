"""Broadcastable model artifacts: hashed-ngram langid + char-bigram LM.

Both models are trained once, deterministically, from the synthetic
language definitions (seeded corpus, exact integer counts) and reduced to
plain numpy arrays. On the cluster the arrays are broadcast once per
executor (``SparkContext.broadcast``) and scored inside Arrow-batched
pandas UDFs — never re-trained or re-pickled per task.

Design follows the public fastText idea (hashed character n-gram features
-> linear scores; Joulin et al. 2016) and a KenLM-style smoothed n-gram LM
(Heafield 2011), scaled down to a dependency-free sandbox form.

Scoring spec (shared by ``qcflow.udfs`` and the independent pandas
reference labeler — keep in sync):

- trigram hash of bytes (b0,b1,b2) = (b0*961 + b1*31 + b2) mod V, V=4096
- langid log-score_l = prior_l + sum_t count(t) * W[t, l]
- lang = argmax_l; conf = softmax(score / n_trigrams * TEMP)[lang]
- texts with < MIN_TRIGRAMS trigrams -> lang="und", conf=0.0
- bigram logprob matrix B over byte classes; perplexity =
  exp(-mean_i B[c_{i-1}, c_i]) over the char-class sequence;
  texts shorter than 2 chars -> perplexity = PPL_MAX
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from qcflow.langs import LANGS, gen_text

V_BUCKETS = 4096
TEMP = 12.0
MIN_TRIGRAMS = 4
PPL_MAX = 1e6
N_CLASSES = 32  # char classes for the bigram LM

_TRAIN_DOCS_PER_LANG = 600
_TRAIN_CHARS = 220


def trigram_hashes(text: str) -> np.ndarray:
    """Vectorized trigram hashing of a UTF-8 string -> int32 bucket ids."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.int64)
    if len(b) < 3:
        return np.empty(0, dtype=np.int64)
    h = (b[:-2] * 961 + b[1:-1] * 31 + b[2:]) % V_BUCKETS
    return h


def char_classes(text: str) -> np.ndarray:
    """Map bytes to N_CLASSES classes: 0-25 letters, 26 space, 27 period,
    28 digit, 29 symbol, 30 upper, 31 other."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.int64)
    cls = np.full(len(b), 31, dtype=np.int64)
    cls = np.where((b >= 97) & (b <= 122), b - 97, cls)
    cls = np.where((b >= 65) & (b <= 90), 30, cls)
    cls = np.where(b == 32, 26, cls)
    cls = np.where(b == 46, 27, cls)
    cls = np.where((b >= 48) & (b <= 57), 28, cls)
    sym = ((b >= 33) & (b <= 47) & (b != 46)) | ((b >= 58) & (b <= 64)) | (
        (b >= 91) & (b <= 96)
    ) | ((b >= 123) & (b <= 126))
    cls = np.where(sym, 29, cls)
    return cls


@dataclass(frozen=True)
class QcModels:
    """The broadcast payload: pure numpy arrays, cheap to serialize."""

    langid_w: np.ndarray  # (V_BUCKETS, n_langs) float32 log P(trigram | lang)
    langid_prior: np.ndarray  # (n_langs,) float32
    langs: tuple[str, ...]
    bigram_lp: np.ndarray  # (N_CLASSES, N_CLASSES) float32 log P(c | prev)


@lru_cache(maxsize=2)
def train_models(seed: int = 1234) -> QcModels:
    """Deterministic training: seeded corpus -> exact counts -> log-probs.
    Disk-cached (.npz) after first training so driver startup pays a load,
    not a retrain — the cluster equivalent is shipping the artifact file
    with --files and broadcasting it."""
    import os

    cache = f"/root/repo/.cache/qc_models_{seed}.npz"
    if os.path.exists(cache):
        z = np.load(cache, allow_pickle=False)
        return QcModels(
            langid_w=z["w"],
            langid_prior=z["prior"],
            langs=tuple(str(x) for x in z["langs"]),
            bigram_lp=z["blp"],
        )
    m = _train_models_uncached(seed)
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(
            cache,
            w=m.langid_w,
            prior=m.langid_prior,
            langs=np.array(m.langs),
            blp=m.bigram_lp,
        )
    except OSError:
        pass
    return m


def _train_models_uncached(seed: int = 1234) -> QcModels:
    counts = np.ones((V_BUCKETS, len(LANGS)), dtype=np.float64)  # add-1
    big = np.ones((N_CLASSES, N_CLASSES), dtype=np.float64)
    n_docs = np.zeros(len(LANGS), dtype=np.float64)
    for li, lang in enumerate(LANGS):
        rng = np.random.default_rng([seed, li])
        for _ in range(_TRAIN_DOCS_PER_LANG):
            text = gen_text(lang, _TRAIN_CHARS, rng)
            h = trigram_hashes(text)
            if len(h):
                np.add.at(counts[:, li], h, 1.0)
            c = char_classes(text)
            if len(c) >= 2:
                np.add.at(big, (c[:-1], c[1:]), 1.0)
            n_docs[li] += 1
    w = np.log(counts / counts.sum(axis=0, keepdims=True)).astype(np.float32)
    prior = np.log(n_docs / n_docs.sum()).astype(np.float32)
    blp = np.log(big / big.sum(axis=1, keepdims=True)).astype(np.float32)
    return QcModels(langid_w=w, langid_prior=prior, langs=LANGS, bigram_lp=blp)


def score_langid(models: QcModels, text: str) -> tuple[str, float]:
    """Single-text scoring per the spec (vectorized batch path lives in
    qcflow.udfs; this form is the readable spec both sides follow)."""
    h = trigram_hashes(text)
    if len(h) < MIN_TRIGRAMS:
        return "und", 0.0
    cnt = np.bincount(h, minlength=V_BUCKETS).astype(np.float32)
    scores = models.langid_prior + cnt @ models.langid_w
    norm = scores / len(h) * TEMP
    norm = norm - norm.max()
    p = np.exp(norm)
    p /= p.sum()
    i = int(np.argmax(scores))
    return models.langs[i], float(p[i])


def score_perplexity(models: QcModels, text: str) -> float:
    c = char_classes(text)
    if len(c) < 2:
        return PPL_MAX
    lp = models.bigram_lp[c[:-1], c[1:]]
    return float(np.exp(-lp.mean()))
