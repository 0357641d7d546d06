"""Incremental IVFPQ index-store semantics beyond the oracle gates:
time travel, crash invisibility, commit bookkeeping, drift math."""

from __future__ import annotations

import numpy as np
import pytest

from qcflow import index_store as ix
from qcflow.parity.similarity import (
    _IX_FIX,
    _IX_N0,
    _IX_N1,
    _build_index_store,
)


@pytest.fixture(scope="module")
def store(spark):
    return _build_index_store(spark)


def test_committed_view_and_time_travel(spark, store):
    d, sid0, sid1 = store
    assert (sid0, sid1) == (0, 2)  # crashed append burned id 1
    full = ix.read_index(spark, d)
    assert full.count() == _IX_N0 + _IX_N1
    # time travel to the first commit: batch 0 only
    asof = ix.read_index(spark, d, as_of=sid0)
    assert asof.count() == _IX_N0
    assert asof.select("snapshot_id").distinct().collect()[0][0] == sid0
    # the crashed batch's rows exist on disk but never in any view
    raw = spark.read.parquet(f"{d}/codes.parquet")
    assert raw.count() == _IX_N0 + _IX_N1 + 100
    assert full.filter("snapshot_id = 1").count() == 0


def test_drift_skew_direction(spark, store):
    d, sid0, sid1 = store
    drift = {
        r["cluster"]: r["delta"]
        for r in ix.list_drift(spark, d, sid0, sid1).collect()
    }
    assert all(drift[c] > 0 for c in (1, 2, 3, 4))
    assert all(drift[c] == 0 for c in (5, 6, 7, 8))
    counts = {
        r["cluster"]: r["n_vectors"]
        for r in ix.list_counts(spark, d).collect()
    }
    assert sum(counts.values()) == _IX_N0 + _IX_N1


def test_read_before_any_commit_raises(spark, tmp_path):
    d = str(tmp_path / "empty_ix")
    ix.init_index(d, np.zeros((2, 4)), np.zeros((2, 2, 2)))
    with pytest.raises(ValueError, match="no committed snapshots"):
        ix.read_index(spark, d)
