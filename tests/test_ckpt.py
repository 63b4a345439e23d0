"""Gate-scoped localCheckpoint lifecycle (ckpt module): registration
rules, deterministic block release, and the suppression exemption the
_shared serving frames rely on."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from database_activity_monitoring_dam_system_spark import ckpt


def _rdd_ids(spark) -> set[int]:
    return {
        i.id()
        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def _wait_gone(spark, rid: int, timeout: float = 10.0) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout:
        if rid not in _rdd_ids(spark):
            return True
        time.sleep(0.2)
    return False


def _ckpt_rdd_id(df) -> int:
    return df._jdf.queryExecution().logical().rdd().id()


def test_release_frees_blocks_after_action(spark, monkeypatch):
    monkeypatch.setenv("SPARK_DAM_CKPT_SCOPE", "1")
    df = ckpt.checkpoint(
        spark.range(1000).withColumn("v", F.col("id") * 2)
    )
    df.write.format("noop").mode("overwrite").save()
    rid = _ckpt_rdd_id(df)
    assert rid in _rdd_ids(spark)  # blocks materialized
    assert ckpt.release() == 1
    assert _wait_gone(spark, rid)


def test_no_registration_without_scope(spark, monkeypatch):
    monkeypatch.delenv("SPARK_DAM_CKPT_SCOPE", raising=False)
    df = ckpt.checkpoint(spark.range(100))
    df.write.format("noop").mode("overwrite").save()
    # nothing registered -> nothing released; reclaim stays with GC
    assert ckpt.release() == 0
    # the frame is still fully usable (no lifecycle interference)
    assert df.count() == 100


def test_scope_releases_on_exit_and_suppressed_exempts(spark):
    with ckpt.scope():
        kept = None
        with ckpt.suppressed():
            kept = ckpt.checkpoint(spark.range(500), eager=True)
        gone = ckpt.checkpoint(spark.range(600), eager=True)
        rid_kept, rid_gone = _ckpt_rdd_id(kept), _ckpt_rdd_id(gone)
        assert {rid_kept, rid_gone} <= _rdd_ids(spark)
    assert _wait_gone(spark, rid_gone)
    # the suppressed frame survives the scope (serving-cache contract)
    assert rid_kept in _rdd_ids(spark)
    assert kept.count() == 500
    kept._jdf.queryExecution().logical().rdd().unpersist(False)


def test_register_is_chainable_passthrough(spark, monkeypatch):
    monkeypatch.setenv("SPARK_DAM_CKPT_SCOPE", "1")
    df = (
        spark.range(50)
        .localCheckpoint(eager=False)
        .transform(ckpt.register)
    )
    assert df.count() == 50
    assert ckpt.release() == 1


def test_unpersist_direct_handle(spark):
    df = spark.range(700).localCheckpoint(eager=True)
    rid = _ckpt_rdd_id(df)
    assert rid in _rdd_ids(spark)
    assert ckpt.unpersist(df)
    assert _wait_gone(spark, rid)
    # a non-checkpoint frame has no handle -> False, no exception
    assert not ckpt.unpersist(spark.range(3).select(F.col("id") + 1))
