"""Skew-salting equivalence, as-of join edge cases, empty-input
robustness."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from database_activity_monitoring_dam_system_spark.operators import asof, rules, skew
from database_activity_monitoring_dam_system_spark.operators.analytics import (
    activity_stats,
    hourly_timeline,
)
from database_activity_monitoring_dam_system_spark.plans.dam import _activity
from database_activity_monitoring_dam_system_spark.sources.testdata import load_table

from .conftest import SF_SMOKE


def test_salted_count_equals_plain_count(spark):
    events = load_table(spark, SF_SMOKE, "events")
    plain = {
        (r.user_id, r.cnt)
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    salted = {
        (r.user_id, r.cnt)
        for r in skew.salted_group_count(
            events, ["user_id"], salt_col="event_id", buckets=8
        ).collect()
    }
    assert salted == plain


def test_salted_count_on_hot_key_corpus(spark):
    """Pathological skew shape (one key carrying ~20% of all rows,
    long uniform tail): the salted two-phase count still agrees with
    the plain groupBy bit-for-bit. Timing at this shape is documented
    in SCALE.md — map-side partial aggregation already collapses a hot
    key to one row per task, so salting is kept as the escape hatch
    for heavy-state aggregates, not wired into the count paths."""
    n = 200_000
    df = spark.range(n).select(
        F.when(F.col("id") % 5 == 0, F.lit("HOT"))
        .otherwise(
            F.concat(
                F.lit("t"),
                F.pmod(F.xxhash64("id"), F.lit(20_000)).cast("string"),
            )
        )
        .alias("tok"),
        F.col("id"),
    )
    plain = {
        (r.tok, r.cnt)
        for r in df.groupBy("tok").agg(F.count("*").alias("cnt")).collect()
    }
    salted = {
        (r.tok, r.cnt)
        for r in skew.salted_group_count(
            df, ["tok"], salt_col="id", buckets=16
        ).collect()
    }
    assert salted == plain
    hot = dict(plain)["HOT"]
    assert hot == n // 5


def _hot_user_events(spark, n_hot=50_000, n_cold_users=40, per_cold=100):
    """One bot user carrying ~93% of events across a 2h span, plus a
    uniform tail — the app.py:396-403 rate-limit shape. Timestamps are
    deliberately dense (many per second, ties included) and cross
    minute-bin boundaries."""
    n = n_hot + n_cold_users * per_cold
    return spark.range(n).select(
        F.when(F.col("id") < n_hot, F.lit(1))
        .otherwise((F.col("id") % n_cold_users) + 2)
        .cast("long")
        .alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + F.pmod(F.xxhash64("id"), F.lit(7200))
        ).alias("access_timestamp"),
        F.col("id").alias("activity_id"),
    )


def test_binned_trailing_window_matches_plain(spark):
    """The skew-split (user, minute-bin) trailing count must be
    bit-identical to the plain per-user range frame — including tied
    timestamps and events straddling bin boundaries."""
    from database_activity_monitoring_dam_system_spark.operators.anomaly import (
        trailing_window_counts,
    )

    df = _hot_user_events(spark, n_hot=8_000, n_cold_users=20, per_cold=50)
    plain = {
        (r.activity_id, r.trailing_count)
        for r in trailing_window_counts(df, seconds=60).collect()
    }
    salted = {
        (r.activity_id, r.trailing_count)
        for r in skew.binned_trailing_window_counts(df, seconds=60).collect()
    }
    assert salted == plain


def test_binned_trailing_window_splits_hot_key_exchange(spark):
    """The exchange must key on (user_id, _bin), not user_id alone —
    that's the whole point: the hot user's rows spread over one task
    per minute of activity instead of one task total."""
    df = _hot_user_events(spark, n_hot=2_000, n_cold_users=5, per_cold=10)
    plan = (
        skew.binned_trailing_window_counts(df, seconds=60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(user_id" in plan
    bin_keyed = [
        ln
        for ln in plan.splitlines()
        if "hashpartitioning(user_id" in ln and "_bin" in ln
    ]
    assert bin_keyed, "exchange lost the _bin key — hot user unsplit"


def test_battery_salted_rate_opt_in_parity(spark):
    """apply_rule_battery(salted_rate=True) must produce row-identical
    suspicious/severity output to the default path on the hot-key
    fixture (the rate rule consumes the same counts either way)."""
    df = _hot_user_events(spark, n_hot=5_000, n_cold_users=10, per_cold=30).select(
        "*",
        F.lit("SELECT 1").alias("operation_details"),
        F.lit("SELECT").alias("operation_type"),
        F.lit("users").alias("table_name"),
        F.lit(1).alias("rows_affected"),
    )
    cols = ["activity_id", "queries_last_min", "is_suspicious", "severity_level"]
    plain = {
        tuple(r)
        for r in rules.apply_rule_battery(df).select(*cols).collect()
    }
    salted = {
        tuple(r)
        for r in rules.apply_rule_battery(df, salted_rate=True)
        .select(*cols)
        .collect()
    }
    assert salted == plain
    # the hot user must actually trip the rate rule in this fixture
    assert any(r[2] for r in plain)


def test_asof_inclusive_and_null_semantics(spark):
    t = lambda s: dt.datetime(2026, 8, 1, 10, 0, s)
    left = spark.createDataFrame(
        [(1, 10, t(5)), (2, 10, t(10)), (3, 10, t(2)), (4, 20, t(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, t(5), 1.0), (10, t(8), 2.0), (20, t(31), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.ts_asof, r.value_asof)
        for r in asof.asof_join_backward(
            left, right, on=["user_id"], ts_col="ts", carry_cols=["value"]
        ).collect()
    }
    assert out[1] == (t(5), 1.0)      # equal ts is inclusive
    assert out[2] == (t(8), 2.0)      # most recent prior wins
    assert out[3] == (None, None)     # nothing before → NULLs
    assert out[4] == (None, None)     # right exists only after left
    assert len(out) == 4              # all left rows preserved


def test_asof_null_carry_is_atomic(spark):
    """A matched right row with a NULL carry value must yield
    (its ts, NULL) — not stitch the older row's value onto the newer
    row's timestamp."""
    t = lambda s: dt.datetime(2026, 8, 1, 10, 0, s)
    left = spark.createDataFrame(
        [(1, 10, t(6))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, t(0), 5.0), (10, t(5), None)],
        "user_id long, ts timestamp, value double",
    )
    row = asof.asof_join_backward(
        left, right, on=["user_id"], ts_col="ts", carry_cols=["value"]
    ).first()
    assert row["ts_asof"] == t(5)
    assert row["value_asof"] is None


def test_empty_input_frames(spark):
    """Every core operator must return structurally-valid empties, not
    crash, when the day's partition is empty."""
    empty = _activity(spark, SF_SMOKE).filter(F.lit(False))
    checked = rules.apply_rule_battery(empty, with_rate_rule=True)
    assert checked.count() == 0
    assert "severity_level" in checked.columns
    assert rules.derive_alerts(checked).count() == 0
    assert rules.compliance_findings(empty).count() == 0
    now = dt.datetime(2026, 8, 1)
    stats = activity_stats(checked, now=now).first()
    assert stats["total_activities"] == 0
    assert stats["suspicious_count"] is None or stats["suspicious_count"] == 0
    assert hourly_timeline(checked, hours=24, now=now).count() == 0


def test_empty_corpus_extension_operators(spark):
    """The round-4 operators also hold the empty-partition contract:
    structurally-valid empty outputs, no crash."""
    from database_activity_monitoring_dam_system_spark.operators import (
        dedup,
        sketches,
        textops,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    rep = textops.repetition_signals(docs)
    assert rep.count() == 0 and "verdict" in rep.columns
    assert dedup.minhash_near_duplicates_md5(docs).count() == 0
    assert dedup.simhash_near_pairs_md5(docs).count() == 0
    grp = spark.createDataFrame([], "grp string, id long")
    hll = sketches.hll_md5_distinct(grp, ["grp"], "id")
    assert hll.count() == 0 and "est_distinct" in hll.columns
    toks = spark.createDataFrame([], "token string")
    assert sketches.cms_build(toks, hash_family="md5").count() == 0

    # single-doc / single-token degenerate shapes
    one = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    [r] = textops.repetition_signals(one).collect()
    assert r.top_bigram == "" and r.top_bigram_frac == 0.0
    assert dedup.minhash_near_duplicates_md5(one).count() == 0


def test_shared_frame_mode_is_transparent(spark):
    """SPARK_DAM_SHARE_FRAMES=1 (bench serving mode) must be purely an
    execution-strategy switch: same rows as the uncached build, and the
    second build returns the identical persisted frame object."""
    import os

    from database_activity_monitoring_dam_system_spark.plans import dam

    uncached = sorted(
        tuple(r)
        for r in dam._battery(spark, SF_SMOKE)
        .select("activity_id", "is_suspicious", "severity_level")
        .collect()
    )
    os.environ["SPARK_DAM_SHARE_FRAMES"] = "1"
    try:
        dam._FRAME_CACHE.clear()
        first = dam._battery(spark, SF_SMOKE)
        second = dam._battery(spark, SF_SMOKE)
        assert first is second
        cached = sorted(
            tuple(r)
            for r in first.select(
                "activity_id", "is_suspicious", "severity_level"
            ).collect()
        )
        assert cached == uncached
    finally:
        os.environ.pop("SPARK_DAM_SHARE_FRAMES", None)
        for df in dam._FRAME_CACHE.values():
            df.unpersist()
        dam._FRAME_CACHE.clear()


class TestPartitioningInvariance:
    """The determinism claims say reduction order (and therefore input
    partitioning) cannot change results for the decimal/integer-exact
    operators — assert it by running identical queries over 1-partition
    and 13-partition layouts of the same data."""

    def _layouts(self, df):
        return df.repartition(1), df.repartition(13)

    def test_kmeans_exact_assignments_invariant(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            similarity,
        )
        from database_activity_monitoring_dam_system_spark.sources.testdata import (
            load_table,
        )

        from .conftest import SF_SMOKE

        emb = load_table(spark, SF_SMOKE, "embeddings")
        outs = []
        for layout in self._layouts(emb):
            assigned, cents = similarity.kmeans_lloyd_exact(
                layout, k=4, iters=2
            )
            outs.append((
                sorted(tuple(r) for r in assigned.collect()),
                cents,
            ))
        assert outs[0][0] == outs[1][0]
        # centroids bit-identical, not merely close
        assert outs[0][1] == outs[1][1]

    def test_pack_offsets_invariant(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            packing,
        )
        from database_activity_monitoring_dam_system_spark.sources.testdata import (
            load_table,
        )

        from .conftest import SF_SMOKE

        docs = load_table(spark, SF_SMOKE, "documents")
        outs = [
            sorted(
                tuple(r)
                for r in packing.pack_offsets(
                    layout, budget=512, n_shards=4
                ).collect()
            )
            for layout in self._layouts(docs)
        ]
        assert outs[0] == outs[1]

    def test_hll_md5_registers_invariant(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            sketches,
        )
        from database_activity_monitoring_dam_system_spark.sources.testdata import (
            load_table,
        )

        from .conftest import SF_SMOKE

        docs = load_table(spark, SF_SMOKE, "documents")
        outs = [
            sorted(
                tuple(r)
                for r in sketches.hll_md5_distinct(
                    layout, ["lang"], "source"
                ).collect()
            )
            for layout in self._layouts(docs)
        ]
        assert outs[0] == outs[1]


def test_asof_forward_and_tolerance(spark):
    """Forward direction is inclusive at equal ts; tolerance nulls a
    match exactly one microsecond past the bound and keeps one
    exactly on it (exact integer-µs arithmetic, not epoch doubles)."""
    t = lambda s, us=0: dt.datetime(2026, 8, 1, 10, 0, s, us)
    left = spark.createDataFrame(
        [(1, 10, t(5)), (2, 10, t(10)), (3, 20, t(0)), (4, 30, t(0))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, t(5), 1.0),            # equal ts → inclusive for event 1
            (10, t(12), 2.0),           # next for event 2
            (20, t(3, 1), 7.0),         # 3.000001 s after → past 3 s tol
            (30, t(3), 8.0),            # exactly on the 3 s bound → kept
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.ts_asof, r.value_asof)
        for r in asof.asof_join(
            left, right, on=["user_id"], ts_col="ts",
            carry_cols=["value"], direction="forward",
            tolerance_seconds=3,
        ).collect()
    }
    assert out[1] == (t(5), 1.0)
    assert out[2] == (t(12), 2.0)
    assert out[3] == (None, None)
    assert out[4] == (t(3), 8.0)


def test_asof_nearest_tie_prefers_backward(spark):
    """Nearest picks the closer side; an exact distance tie takes the
    backward row, and per-side tolerance disqualifies independently."""
    t = lambda s: dt.datetime(2026, 8, 1, 10, 0, s)
    left = spark.createDataFrame(
        [(1, 10, t(10)), (2, 20, t(10)), (3, 30, t(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, t(7), 1.0), (10, t(12), 2.0),   # fwd closer (2 < 3)
            (20, t(8), 3.0), (20, t(12), 4.0),   # exact tie → backward
            (30, t(1), 5.0), (30, t(14), 6.0),   # bw out of 5s tol → fwd
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.ts_asof, r.value_asof)
        for r in asof.asof_join(
            left, right, on=["user_id"], ts_col="ts",
            carry_cols=["value"], direction="nearest",
            tolerance_seconds=5,
        ).collect()
    }
    assert out[1] == (t(12), 2.0)
    assert out[2] == (t(8), 3.0)
    assert out[3] == (t(14), 6.0)


def test_asof_numeric_axis(spark):
    """A numeric ordering column (sequence/offset instead of
    timestamp) works across all three directions with tolerance —
    the axis type only changes the distance arithmetic."""
    left = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 205.0)],
        "event_id long, user_id long, pos double",
    )
    right = spark.createDataFrame(
        [(10, 95.0, 1.0), (10, 103.0, 2.0), (10, 210.0, 3.0)],
        "user_id long, pos double, value double",
    )
    def go(direction, tol=None):
        return {
            r.event_id: r.value_asof
            for r in asof.asof_join(
                left, right, on=["user_id"], ts_col="pos",
                carry_cols=["value"], direction=direction,
                tolerance_seconds=tol,
            ).collect()
        }
    assert go("backward") == {1: 1.0, 2: 2.0}
    assert go("forward") == {1: 2.0, 2: 3.0}
    assert go("nearest") == {1: 2.0, 2: 3.0}   # fwd closer both: 3<5, 5<102
    assert go("backward", tol=4.0) == {1: None, 2: None}  # 5 and 102 both > 4
    assert go("forward", tol=5.0) == {1: 2.0, 2: 3.0}     # 3 ≤ 5, 5 ≤ 5 inclusive
