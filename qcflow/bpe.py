"""Distributed BPE tokenizer-merge training.

The standard byte-pair-encoding training loop (Sennrich et al. 2016),
Spark-first: ONE corpus-sized aggregation reduces the input to the
word-TYPE table (word, n_occurrences), and every merge round after that
is vocabulary-sized — adjacent-pair counting is a scan-fused explode +
map-side-combining sum over word types weighted by their corpus counts,
the argmax is a one-row driver collect (scalar-only driver traffic, the
k-means-loop idiom), and the merge is applied to the symbol arrays with
a JVM-side ``aggregate`` fold (greedy left-to-right non-overlapping,
exactly the reference semantics — no Python in the loop). At 10^12
documents only the first count's map side is corpus-sized; the loop cost
is O(rounds x |vocab|), independent of corpus size.

Iterative-loop discipline (CLAUDE.md): the word-type frame is
localCheckpoint-ed every round so the lineage never deepens, and the
only driver traffic is the per-round argmax row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chars(col: str):
    # word -> array of single characters, 1-based substring grid (no
    # dependence on split-by-empty-regex edge semantics)
    return F.transform(
        F.sequence(F.lit(1), F.length(F.col(col))),
        lambda i: F.col(col).substr(i, F.lit(1)),
    )


def _adjacent_pairs(syms: str):
    # [s0..sk] -> [(s0,s1), (s1,s2), ...] — empty for 1-symbol words
    return F.transform(
        F.slice(F.col(syms), 1, F.greatest(F.size(syms) - 1, F.lit(0))),
        lambda s, i: F.struct(
            s.alias("left"), F.element_at(F.col(syms), i + 2).alias("right")
        ),
    )


def _merge_fold(syms: str, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) ->
    left||right inside a symbol array, as a JVM-side aggregate fold.
    A freshly merged symbol never re-merges with the NEXT element in
    the same round unless it itself equals ``left`` (the standard BPE
    single-pass semantics; [a,a,a] with (a,a) -> [aa, a])."""
    merged = left + right

    def step(acc, s):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        F.col(syms), F.expr("cast(array() as array<string>)"), step
    )


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, n) word-type table: the single corpus-sized
    aggregation of BPE training (map-side combine; everything after is
    vocabulary-sized)."""
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda x: x != F.lit("")
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def bpe_train(
    docs: DataFrame, text_col: str = "text", rounds: int = 12
) -> list[dict]:
    """Train ``rounds`` BPE merges; returns [{round, left, right,
    merged, n}] with ``n`` the weighted pair count at merge time.
    Deterministic: the per-round argmax breaks ties by (left, right)
    lexicographic order (construction-truth fixtures assert a margin so
    the tie-break is never load-bearing there)."""
    wt = word_types(docs, text_col).withColumn(
        "syms", _chars("word")
    ).select("syms", "n")
    wt = wt.localCheckpoint()
    merges: list[dict] = []
    for r in range(1, rounds + 1):
        top = (
            wt.select("n", F.explode(_adjacent_pairs("syms")).alias("p"))
            .groupBy("p.left", "p.right")
            .agg(F.sum("n").alias("pn"))
            .orderBy(F.desc("pn"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pn"] is None:
            break
        left, right, pn = top[0]["left"], top[0]["right"], int(top[0]["pn"])
        merges.append(
            {
                "round": r,
                "left": left,
                "right": right,
                "merged": left + right,
                "n": pn,
            }
        )
        wt = wt.withColumn("syms", _merge_fold("syms", left, right))
        # scalar-only driver traffic + flat lineage per iteration
        wt = wt.localCheckpoint()
    return merges


def bpe_train_py(word_counts: dict[str, int], rounds: int = 12) -> list[dict]:
    """Driver-side twin of ``bpe_train`` over a {word: count} dict —
    identical pair-count convention, argmax tie-break and greedy fold;
    used by construction-truth fixtures to compute the expected merge
    table (and to assert per-round margins at build time)."""
    wt = {tuple(w): c for w, c in word_counts.items()}
    merges: list[dict] = []
    for r in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in wt.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (left, right), pn = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append(
            {
                "round": r,
                "left": left,
                "right": right,
                "merged": left + right,
                "n": pn,
            }
        )
        new_wt: dict[tuple, int] = {}
        for syms, c in wt.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            key = tuple(out)
            new_wt[key] = new_wt.get(key, 0) + c
        wt = new_wt
    return merges


def margin_at_round(word_counts: dict[str, int], merges: list[dict]) -> list[int]:
    """Per-round gap between the winning pair count and the runner-up —
    construction fixtures assert these are >= 2 so integer-exact engines
    can never disagree on the argmax."""
    wt = {tuple(w): c for w, c in word_counts.items()}
    gaps: list[int] = []
    for m in merges:
        counts: dict[tuple[str, str], int] = {}
        for syms, c in wt.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        top = ordered[0]
        assert top[0] == (m["left"], m["right"])
        gaps.append(top[1] - (ordered[1][1] if len(ordered) > 1 else 0))
        left, right = m["left"], m["right"]
        new_wt: dict[tuple, int] = {}
        for syms, c in wt.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            key = tuple(out)
            new_wt[key] = new_wt.get(key, 0) + c
        wt = new_wt
    return gaps


def bpe_encode(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge table to a corpus: (id, n_words, n_tokens,
    token_stream). Words explode scan-side, every merge applies as a
    chained JVM fold (Catalyst collapses the projections — one codegen
    stage, no Python), and the only shuffle is the per-document regroup
    (order restored via the posexplode index, the alignment-regroup
    pattern). LITERAL-expression path — right for merge tables up to a
    few dozen rounds (the fixture/gate scale); production vocabularies
    (32k merges) go through ``bpe_encode_udf``, the broadcast-ranks
    strategy (same ann.py lesson: literal expression trees have real
    analysis-time ceilings)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    words = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "word")
    ).withColumn("syms", _chars("word"))
    out = words
    for m in merges:
        out = out.withColumn("syms", _merge_fold("syms", m["left"], m["right"]))
    return (
        out.groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.size("syms")).cast("long").alias("n_tokens"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "syms"))
                        ),
                        lambda s: s["syms"],
                    )
                ),
                " ",
            ).alias("token_stream"),
        )
        .withColumn("n_words", F.col("n_words").cast("int"))
    )


def encode_word_py(word: str, merges: list[dict]) -> list[str]:
    """Driver-side single-word encoder: apply merges in RANK order with
    the same greedy left-to-right fold as ``_merge_fold`` — the twin
    both fixture builds and ``bpe_encode_udf`` share."""
    syms = list(word)
    for m in merges:
        left, right = m["left"], m["right"]
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode_udf(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Production-scale encoder: the merge table ships once per executor
    (closure broadcast; at 32k merges that is a few hundred KB), words
    encode inside an Arrow-batched pandas UDF with a per-batch word
    cache (Zipf corpora re-encode the same types constantly), and the
    output schema matches ``bpe_encode`` exactly — a test pins the two
    paths equal. Map-only until the same per-document regroup."""
    mseq = [(m["left"], m["right"]) for m in merges]

    @F.pandas_udf("array<string>")
    def _enc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, list[str]] = {}

        def one(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                syms = list(w)
                for left, right in mseq:
                    out: list[str] = []
                    for s in syms:
                        if out and out[-1] == left and s == right:
                            out[-1] = left + right
                        else:
                            out.append(s)
                    syms = out
                got = cache[w] = syms
            return got

        for words in it:
            yield words.map(one)

    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    words = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "word")
    ).withColumn("syms", _enc("word"))
    return (
        words.groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.size("syms")).cast("long").alias("n_tokens"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                        lambda s: s["syms"],
                    )
                ),
                " ",
            ).alias("token_stream"),
        )
        .withColumn("n_words", F.col("n_words").cast("int"))
    )
