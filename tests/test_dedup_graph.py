"""Near-dup cluster resolution: connected components, survivor selection,
and the inverted-index document-frequency cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcflow.graph import connected_components, resolve_clusters, survivors
from qcflow.parity.dedup import _corpus_near, _jaccard_pairs
from qcflow.parity.registry import QUERIES


def test_connected_components_known_graph(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    got = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_resolve_clusters_sizes(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    rows = {r["doc_id"]: r for r in resolve_clusters(edges).collect()}
    assert rows[3]["cluster_rep"] == 1 and rows[3]["cluster_size"] == 3
    assert rows[11]["cluster_rep"] == 10 and rows[11]["cluster_size"] == 2


def test_survivors_keeps_reps_and_singletons(spark):
    corpus = spark.range(100).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(5, 6), (6, 7), (50, 51)], "id_a long, id_b long")
    kept = {r["doc_id"] for r in survivors(corpus, pairs).collect()}
    assert kept == set(range(100)) - {6, 7, 51}


def test_lsh_survivors_equal_exact_jaccard_survivors(spark, sf_dir):
    """The scale path (MinHash-LSH candidates, exact-Jaccard verify at 0.7)
    must dedup the fixture to exactly the corpus the exact all-pairs
    computation keeps — i.e. LSH recall does not change the kept set."""
    lsh_pairs = QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    exact_pairs = _jaccard_pairs(_corpus_near(spark, sf_dir), thr=0.7, df_cap=1 << 30)
    corpus_ids = _corpus_near(spark, sf_dir).select("doc_id")
    kept_lsh = {r["doc_id"] for r in survivors(corpus_ids, lsh_pairs).collect()}
    kept_exact = {r["doc_id"] for r in survivors(corpus_ids, exact_pairs).collect()}
    assert kept_lsh == kept_exact
    assert len(kept_lsh) < corpus_ids.count()  # it actually dropped dups


def test_hot_shingle_df_cap_bounds_candidates(spark):
    """One shingle shared by 100 otherwise-unrelated docs: uncapped, the
    inverted-index self-join fans out 100*99/2 = 4950 pairs from a single
    shuffle key; with df_cap=50 the hot shingle is pruned and zero pairs
    form. (On real corpora the cap only drops pairs whose every shared
    shingle is hot — necessarily far below the 0.5 threshold.)"""
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("common hot shingle u"),
            F.col("id").cast("string"),
            F.lit("a u"),
            F.col("id").cast("string"),
            F.lit("b"),
        ).alias("text"),
    )
    uncapped = _jaccard_pairs(docs, thr=0.0001, df_cap=1 << 30)
    assert uncapped.count() == 4950
    capped = _jaccard_pairs(docs, thr=0.0001, df_cap=50)
    assert capped.count() == 0


def test_stars_known_graph(spark):
    """Direct large-star/small-star run on the same mixed fixture."""
    from qcflow.graph import connected_components_stars

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    got = {r["id"]: r["comp"] for r in connected_components_stars(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_high_diameter_chain_falls_back_to_stars(spark):
    """A 60-node path (diameter 59 > hash-min's max_iter) — the serial-
    edit-chain shape VERDICT r2 flagged. connected_components must fall
    back to the SoCC'14 star alternation and still resolve the single
    component exactly. Node ids are scrambled so the chain order carries
    no information (min id sits mid-chain)."""
    import warnings

    import numpy as np

    n = 60
    perm = np.random.default_rng(7).permutation(n) * 17 + 3
    chain = [(int(perm[i]), int(perm[i + 1])) for i in range(n - 1)]
    edges = spark.createDataFrame(chain, "src long, dst long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        labels = connected_components(edges, max_iter=10).collect()
        assert any("falling back" in str(x.message) for x in w)
    comp = {r["comp"] for r in labels}
    assert comp == {int(perm.min())}
    assert {r["id"] for r in labels} == {int(v) for v in perm}
    # two-cluster variant: chain + separate triangle keeps components apart
    edges2 = spark.createDataFrame(
        chain + [(100000, 100001), (100001, 100002), (100000, 100002)],
        "src long, dst long",
    )
    from qcflow.graph import connected_components_stars

    labels2 = connected_components_stars(edges2).collect()
    comps = {}
    for r in labels2:
        comps.setdefault(r["comp"], set()).add(r["id"])
    assert set(comps) == {int(perm.min()), 100000}
    assert comps[100000] == {100000, 100001, 100002}


def test_stars_keeps_self_loop_only_vertex(spark):
    """Contract parity with hash-min: a vertex whose only edge is a
    self-loop still gets a singleton label from the stars path."""
    from qcflow.graph import connected_components_stars

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (42, 42)], "src long, dst long"
    )
    got = {r["id"]: r["comp"] for r in connected_components_stars(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 42: 42}
    # and the hash-min path agrees on the same input
    hm = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert hm == got
