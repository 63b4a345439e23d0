"""Serving-mode shared artifacts (SPARK_DAM_SHARE_FRAMES=1) must be
answer-invisible: every incremental-maintenance gate that shares its
maintained base artifact per corpus snapshot has to produce EXACTLY
the cold (per-call rebuild) rows — the _shared materialized-view
contract extended to the incremental family in round 14."""

from __future__ import annotations

import pytest

from database_activity_monitoring_dam_system_spark.plans import dam
from database_activity_monitoring_dam_system_spark.plans.registry import (
    all_queries,
)

from .conftest import SF_SMOKE

GATES = [
    "incremental_containment",
    "incremental_knn_graph",
    "incremental_ivf_topk",
    "incremental_minhash_bands",
    "incremental_postings",
    "bm25_artifact_search",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("gate", GATES)
def test_incremental_artifacts_serving_equals_cold(
    spark, gate, monkeypatch
):
    spec = all_queries()[gate]
    monkeypatch.delenv("SPARK_DAM_SHARE_FRAMES", raising=False)
    cold = _rows(spec.fn(spark, SF_SMOKE))
    monkeypatch.setenv("SPARK_DAM_SHARE_FRAMES", "1")
    try:
        served = _rows(spec.fn(spark, SF_SMOKE))
        # second serve hits the populated cache — same answer again
        served_again = _rows(spec.fn(spark, SF_SMOKE))
    finally:
        # drop this test's persisted frames so later tests (and other
        # parametrizations) see a clean cache
        for (kind, _), df in list(dam._FRAME_CACHE.items()):
            df.unpersist()
        dam._FRAME_CACHE.clear()
    assert served == cold
    assert served_again == cold
    assert len(cold) > 0
