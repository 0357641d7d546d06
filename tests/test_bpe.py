"""BPE training: fold semantics, Spark-vs-twin equivalence, plan gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcflow.bpe import _merge_fold, bpe_train, bpe_train_py, word_types


def test_merge_fold_is_greedy_left_to_right(spark):
    """[a,a,a] with merge (a,a) -> [aa, a]; chains only re-merge when
    the freshly merged symbol itself equals the left element."""
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a", "a"],)],
        "syms array<string>",
    )
    got = [
        r["m"]
        for r in df.select(_merge_fold("syms", "a", "a").alias("m")).collect()
    ]
    assert got == [["aa", "a"], ["aa", "aa"], ["b", "aa"]]


def test_bpe_spark_matches_python_twin_on_random_corpus(spark):
    """On a corpus with NO planted margins the Spark loop and the
    driver-side twin still agree round for round (same counts, same
    lexicographic tie-break)."""
    import numpy as np

    rng = np.random.default_rng(20260818)
    words = []
    for _ in range(25):
        ln = int(rng.integers(2, 6))
        words.append("".join("abcd"[k] for k in rng.integers(0, 4, ln)))
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + int(rng.integers(1, 40))
    occurrences = [w for w, c in counts.items() for _ in range(c)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(occurrences[i::7]))
            for i in range(7)
        ],
        "doc_id long, text string",
    )
    got = bpe_train(docs, "text", rounds=6)
    want = bpe_train_py(counts, rounds=6)
    assert [
        (m["round"], m["left"], m["right"], m["n"]) for m in got
    ] == [(m["round"], m["left"], m["right"], m["n"]) for m in want]


def test_bpe_loop_stays_jvm_side(spark):
    """Neither the pair-count aggregation nor the fold-merge projection
    may cross into Python — the loop is codegen all the way."""
    from qcflow.bpe import _adjacent_pairs

    docs = spark.createDataFrame(
        [(0, "ab ab abc"), (1, "abc bc")], "doc_id long, text string"
    )
    wt = word_types(docs).withColumn(
        "syms",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
    )
    pairs = (
        wt.select("n", F.explode(_adjacent_pairs("syms")).alias("p"))
        .groupBy("p.left", "p.right")
        .agg(F.sum("n").alias("pn"))
    )
    merged = wt.select(_merge_fold("syms", "a", "b").alias("m"))
    from tests.test_plans import plan_of

    for df in (pairs, merged):
        p = plan_of(df)
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    # pair counting must partial-aggregate map-side before the shuffle
    assert "HashAggregate" in plan_of(pairs), plan_of(pairs)


def test_bpe_fixture_margins(spark):
    """Every fixture round's winning pair beats the runner-up by >= 2
    occurrences (the integer-exactness guarantee for the oracle)."""
    import pandas as pd

    from qcflow.bpe import margin_at_round
    from qcflow.parity.text import _BPE_FIX, _BPE_ROUNDS, _materialize_bpe

    _materialize_bpe()
    corpus = pd.read_parquet(_BPE_FIX)
    counts: dict[str, int] = {}
    for t in corpus["text"]:
        for w in t.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    merges = bpe_train_py(counts, rounds=_BPE_ROUNDS)
    gaps = margin_at_round(counts, merges)
    assert len(merges) == _BPE_ROUNDS
    assert min(gaps) >= 2, gaps


def test_bpe_encode_literal_and_udf_paths_agree(spark):
    """The literal-fold encoder (gate path) and the broadcast-ranks
    pandas-UDF encoder (production-vocabulary path) produce identical
    output on the fixture corpus."""
    import pandas as pd

    from qcflow.bpe import bpe_encode, bpe_encode_udf
    from qcflow.parity.text import _BPE_FIX, _BPE_TRUTH, _materialize_bpe

    _materialize_bpe()
    merges = pd.read_parquet(_BPE_TRUTH).to_dict("records")
    corpus = spark.read.parquet(_BPE_FIX)
    a = bpe_encode(corpus, merges).toPandas().sort_values("doc_id")
    b = bpe_encode_udf(corpus, merges).toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_bpe_encode_literal_path_has_no_python(spark):
    """The literal encode path stays JVM-side end to end (the chained
    folds collapse into codegen projections); exactly one Exchange (the
    per-document regroup)."""
    import pandas as pd

    from qcflow.bpe import bpe_encode
    from qcflow.parity.text import _BPE_FIX, _BPE_TRUTH, _materialize_bpe
    from tests.test_plans import plan_of

    _materialize_bpe()
    merges = pd.read_parquet(_BPE_TRUTH).to_dict("records")
    p = plan_of(bpe_encode(spark.read.parquet(_BPE_FIX), merges))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    tree = p.split("\n\n")[0]
    assert tree.count("Exchange") == 1, p
