"""Distributed connected components over pair graphs (near-dup resolution).

A dedup stage's pair generators (MinHash-LSH, SimHash banding, exact
Jaccard — qcflow/parity/dedup.py) emit edges; the corpus-level output a
training-data pipeline needs is the SURVIVOR SET: one representative per
connected component of the pair graph. This module resolves components
with iterated hash-min label propagation — every step is a hash join +
hash aggregate on the (id, comp) key, so the whole algorithm is shuffles
on 8-byte keys and never materializes anything driver-side except the
per-iteration convergence scalar.

Scale notes (10^9-node pair graphs):
- Convergence is O(graph diameter) iterations. Near-dup components are
  quasi-cliques (every member pairs with most others), so diameters are
  tiny (2-4); ``max_iter`` is a safety cap, not the expected cost.
- Each iteration localCheckpoints the label frame: truncating lineage is
  mandatory in an iterative plan or the DAG (and Catalyst analysis time)
  grows linearly with iterations. On a cluster use ``checkpoint()`` with
  a durable dir instead.
- The per-iteration driver round-trip is ONE aggregated long (count of
  changed labels) — loop control, not data movement.
- For power-law graphs with giant components the textbook upgrade is
  large-star/small-star (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14), which bounds iterations by
  O(log^2 n) regardless of diameter; hash-min is the right default for
  dedup graphs where components are small and dense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve undirected ``edges`` into components.

    Returns (id, comp) for every vertex that appears in an edge, where
    ``comp`` is the minimum vertex id reachable from ``id`` (the
    deterministic component representative). Vertices with no edges are
    singletons by definition and are not emitted — callers union them
    back if they need full coverage (see ``survivors``).
    """
    sym = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # the adjacency list is reused every iteration — pin it once
    sym = sym.localCheckpoint(eager=True)

    labels = sym.select(F.col("src").alias("id")).distinct().withColumn(
        "comp", F.col("id")
    )
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # hash-min step: comp'(v) = min(comp(v), min_{u->v} comp(u))
        prop = sym.join(labels, sym.src == labels.id).select(
            F.col("dst").alias("id"), "comp"
        )
        new = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()  # release the superseded iteration's blocks
        labels = new
        if changed == 0:
            break
    else:
        # silent unconverged labels would split true components into
        # several survivors — fail loudly instead (diameter > max_iter,
        # e.g. a long chain of serially-edited near-dup revisions)
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "iterations (graph diameter too large); raise max_iter or "
            "switch to large-star/small-star for this graph"
        )
    sym.unpersist()
    return labels


def resolve_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Pair graph -> per-member cluster assignment.

    Returns (doc_id, cluster_rep, cluster_size) for every document that
    participates in at least one near-dup pair; ``cluster_rep`` is the
    min doc_id of the component (the survivor), ``cluster_size`` its
    member count.
    """
    cc = connected_components(pairs, src=id_a, dst=id_b)
    sizes = cc.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "comp").select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_rep"),
        "cluster_size",
    )


def survivors(corpus_ids: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The deduped corpus: drop every clustered document except its
    component representative; documents in no pair survive untouched.

    ``corpus_ids`` must have column ``id_col``. Returns the same column.
    """
    clustered = resolve_clusters(pairs)
    losers = clustered.filter(F.col("doc_id") != F.col("cluster_rep")).select("doc_id")
    return corpus_ids.join(
        losers.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
