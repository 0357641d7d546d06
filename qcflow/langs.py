"""Synthetic language definitions + deterministic text generation.

Four ASCII "languages" with disjoint-ish syllable inventories so a hashed
character-trigram classifier is genuinely learnable (fastText-style, but
dependency-free). Used by the clip generator (transcripts), the langid
model trainer (training corpus), and nowhere else — the pipeline itself
never sees these definitions, only the trained artifact.
"""

from __future__ import annotations

import numpy as np

LANGS = ("aru", "bel", "ces", "dov")

# Zipf-ish language mix: one dominant bucket (skew requirement, FIXTURES.md)
LANG_WEIGHTS = (0.70, 0.15, 0.10, 0.05)

_SYLLABLES = {
    "aru": ["ka", "ti", "ru", "ki", "ta", "ak", "ir", "uta", "rik", "kau", "tir", "ua"],
    "bel": ["mo", "ne", "lo", "men", "nel", "om", "le", "mon", "elo", "nem", "lon", "eme"],
    "ces": ["se", "ca", "de", "sa", "ce", "das", "esc", "ade", "ses", "cad", "ea", "ds"],
    "dov": ["gu", "bo", "zu", "go", "bu", "zob", "ugz", "obu", "guz", "bog", "uz", "ozo"],
}

_STOPWORDS = {
    "aru": ["ka", "tiru"],
    "bel": ["mo", "nelo"],
    "ces": ["se", "cade"],
    "dov": ["gu", "zobo"],
}


def gen_words(lang: str, n_words: int, rng: np.random.Generator) -> list[str]:
    syl = _SYLLABLES[lang]
    stop = _STOPWORDS[lang]
    words = []
    for _ in range(n_words):
        if rng.random() < 0.25:
            words.append(stop[int(rng.integers(0, len(stop)))])
        else:
            k = int(rng.integers(1, 4))
            words.append("".join(syl[int(j)] for j in rng.integers(0, len(syl), k)))
    return words


def gen_text(lang: str, target_chars: int, rng: np.random.Generator) -> str:
    """Sentences of 3-12 words until ~target_chars; lowercase + periods."""
    out: list[str] = []
    total = 0
    while total < target_chars:
        n = int(rng.integers(3, 13))
        sent = " ".join(gen_words(lang, n, rng)) + "."
        out.append(sent)
        total += len(sent) + 1
    return " ".join(out)[: max(target_chars, 1)].rstrip()
