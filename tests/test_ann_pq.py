"""PQ / ADC / IVF+PQ behavior beyond the oracle gates: code recovery on
the construction fixture, ADC-vs-exact agreement, and recall of the
composed IVF+PQ path against the exact inner-product baseline."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from qcflow.ann import ivfpq_topk, kmeans_fit, pq_adc_topk, pq_assign
from qcflow.parity.similarity import (
    _PQ_M,
    _PQ_NQ,
    _PQ_VEC,
    _materialize_pq_truth,
    _pq_codebooks,
)


@pytest.fixture(scope="module")
def pq_fixture(spark):
    _materialize_pq_truth()
    vec = spark.read.parquet(_PQ_VEC)
    return vec, _pq_codebooks()


def test_pq_assign_recovers_planted_codes(spark, pq_fixture):
    vec, cb = pq_fixture
    out = pq_assign(vec.select("vec_id", "emb"), cb)
    bad = out.join(vec, "vec_id").filter(
        " OR ".join(f"code_{m} <> true_code_{m}" for m in range(_PQ_M))
    )
    assert bad.count() == 0


def test_adc_topk_matches_exact_ip_on_codes(spark, pq_fixture):
    """ADC with perfect codes must rank exactly like the reconstructed-
    vector inner product (same information) — checks the LUT projection
    against a numpy recomputation."""
    vec, cb = pq_fixture
    pdf = vec.toPandas().sort_values("vec_id").reset_index(drop=True)
    codes = pdf[[f"true_code_{m}" for m in range(_PQ_M)]].to_numpy()
    recon = np.concatenate(
        [cb[m][codes[:, m]] for m in range(_PQ_M)], axis=1
    )
    emb = np.stack(pdf["emb"].to_numpy())
    coded = pq_assign(vec.select("vec_id", "emb"), cb).select(
        "vec_id", *[f"code_{m}" for m in range(_PQ_M)]
    )
    queries = [(int(i), emb[i]) for i in range(_PQ_NQ)]
    got = (
        pq_adc_topk(coded, queries, cb, k=5)
        .select("query_id", "neighbor_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    for qid, qvec in queries:
        scores = recon @ qvec
        scores[qid] = -np.inf
        order = np.lexsort((np.arange(len(scores)), -scores))[:5]
        want = list(order)
        have = got[got.query_id == qid].neighbor_id.tolist()
        assert have == want, (qid, have, want)


def test_ivfpq_recall_vs_exact(spark, pq_fixture):
    """Composed path: trained coarse quantizer -> probed lists -> ADC.
    Recall@10 vs the exact full-precision inner-product baseline must
    hold on the fixture (codes are near-lossless by construction, so
    losses can come only from list pruning)."""
    vec, cb = pq_fixture
    corpus = vec.select("vec_id", "emb")
    centroids = kmeans_fit(corpus, k=4, id_col="vec_id", n_iter=3, init="farthest")
    pdf = vec.toPandas().sort_values("vec_id").reset_index(drop=True)
    emb = np.stack(pdf["emb"].to_numpy())
    queries = [(int(i), emb[i]) for i in range(_PQ_NQ)]
    def recall_at(nprobe: int) -> list[float]:
        got = (
            ivfpq_topk(corpus, queries, centroids, cb, k=10, nprobe=nprobe)
            .select("query_id", "neighbor_id")
            .toPandas()
        )
        recalls = []
        for qid, qvec in queries:
            scores = emb @ qvec
            scores[qid] = -np.inf
            exact = set(np.lexsort((np.arange(len(scores)), -scores))[:10])
            have = set(got[got.query_id == qid].neighbor_id.tolist())
            recalls.append(len(exact & have) / 10.0)
        return recalls

    # full probe: ADC is near-lossless by construction, so the composed
    # path must EQUAL the exact baseline — losses can come only from
    # list pruning
    assert recall_at(4) == [1.0] * _PQ_NQ
    # pruned probe on an UNclustered cloud (the fixture plants PQ codes,
    # not coarse clusters): 2 of 4 lists still has to find most of the
    # true top-k
    assert float(np.mean(recall_at(2))) >= 0.75
