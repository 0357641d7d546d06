"""Mergeable histogram-quantile sketch (qcflow/summary.hist_quantiles):
edge cases + exact rank semantics against numpy on expanded data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from qcflow.summary import hist_quantiles


def _q(spark, rows, pcts):
    hist = spark.createDataFrame(rows, "g string, bin int, n long")
    out = hist_quantiles(hist, ["g"], pcts, bin_col="bin").collect()
    return {r["g"]: tuple(r[f"p{p}_bin"] for p in pcts) for r in out}


def test_single_bin_group(spark):
    got = _q(spark, [("a", 7, 100)], [50, 99])
    assert got == {"a": (7, 7)}


def test_rank_semantics_match_numpy_inverted_cdf(spark):
    """ceil(p*n/100)-th order statistic == numpy 'inverted_cdf' on the
    bin-expanded sample, for every group and percentile."""
    rng = np.random.default_rng(5)
    rows = []
    samples = {}
    for g in ("x", "y", "z"):
        bins = rng.integers(0, 40, 12)
        counts = rng.integers(1, 50, 12)
        agg = {}
        for b, c in zip(bins, counts):
            agg[int(b)] = agg.get(int(b), 0) + int(c)
        rows += [(g, b, c) for b, c in agg.items()]
        samples[g] = np.repeat(
            np.array(sorted(agg)), [agg[b] for b in sorted(agg)]
        )
    pcts = [1, 25, 50, 75, 99, 100]
    got = _q(spark, rows, pcts)
    for g, s in samples.items():
        want = tuple(
            int(np.percentile(s, p, method="inverted_cdf")) for p in pcts
        )
        assert got[g] == want, g


def test_null_bins_excluded(spark):
    hist = spark.createDataFrame(
        [("a", 1, 10), ("a", None, 1000), ("a", 3, 10)],
        "g string, bin int, n long",
    )
    out = hist_quantiles(hist, ["g"], [50, 99], bin_col="bin").collect()[0]
    # null-bin mass (unmeasurable rows) carries no quantile weight
    assert out["p50_bin"] == 1 and out["p99_bin"] == 3


def test_p100_is_max_bin(spark):
    got = _q(spark, [("a", 5, 1), ("a", 9, 1)], [100])
    assert got == {"a": (9,)}


@pytest.mark.parametrize("n", [1, 2, 99, 100, 101])
def test_p50_boundary_counts(spark, n):
    """ceil-rank boundary: p50 of n ones and n+? — single-bin sanity at
    counts that make p*n/100 land exactly on integers."""
    got = _q(spark, [("a", 0, n // 2 + n % 2), ("a", 1, n // 2)], [50])
    # rank ceil(n/2) falls in bin 0 by construction (bin 0 holds ceil(n/2))
    assert got["a"] == (0,)
