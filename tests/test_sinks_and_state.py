"""Partitioned-sink pruning proof + exact stateful rate operator tests."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F

from database_activity_monitoring_dam_system_spark import sinks
from database_activity_monitoring_dam_system_spark.plans.dam import _activity
from database_activity_monitoring_dam_system_spark.streaming import stateful

from .conftest import SF_SMOKE


def test_partitioned_sink_prunes(spark):
    d = tempfile.mkdtemp(prefix="dam_part_")
    try:
        act = _activity(spark, SF_SMOKE)
        sinks.write_activity_partitioned(act, d, mode="overwrite")
        back = sinks.read_activity(spark, d)
        # row fidelity
        assert back.count() == act.count()
        # a date predicate must reach the scan as a PartitionFilter
        pruned = back.filter(F.col("event_date") == "2024-01-05")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "event_date" in plan.split(
            "PartitionFilters"
        )[1][:200]
        expected = act.filter(
            F.to_date("access_timestamp") == "2024-01-05"
        ).count()
        assert pruned.count() == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "username string, access_timestamp timestamp"
    )


def test_exact_rate_counts_batch_semantics(spark):
    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    rows = [("u1", t0 + dt.timedelta(seconds=10 * i)) for i in range(8)]
    rows += [("u2", t0), ("u2", t0 + dt.timedelta(seconds=120))]
    out = {
        (r.username, r.event_ts): (r.queries_last_min, r.breached)
        for r in stateful.exact_rate_counts_batch(
            _mk_events(spark, rows), threshold=5
        ).collect()
    }
    # u1: events every 10 s → trailing-60s counts 1..6 capped by window
    # (event at +60s no longer sees t0 since 60-0 < 60 is false)
    assert out[("u1", t0)] == (1, False)
    assert out[("u1", t0 + dt.timedelta(seconds=50))] == (6, True)
    assert out[("u1", t0 + dt.timedelta(seconds=60))] == (6, True)
    # u2: second event far outside the window
    assert out[("u2", t0 + dt.timedelta(seconds=120))] == (1, False)


def test_exact_rate_counts_streaming(spark):
    import json
    import os

    base = tempfile.mkdtemp(prefix="dam_state_")
    src = f"{base}/src"
    os.makedirs(src)
    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    # two files → two micro-batches; state must carry across them
    with open(f"{src}/a.json", "w") as fh:
        for i in range(4):
            fh.write(json.dumps({
                "event_time": (t0 + dt.timedelta(seconds=5 * i)).isoformat(),
                "user_host": "burst[burst] @ h []",
                "argument": f"SELECT {i}",
            }) + "\n")
    with open(f"{src}/b.json", "w") as fh:
        for i in range(4, 8):
            fh.write(json.dumps({
                "event_time": (t0 + dt.timedelta(seconds=5 * i)).isoformat(),
                "user_host": "burst[burst] @ h []",
                "argument": f"SELECT {i}",
            }) + "\n")
    try:
        from database_activity_monitoring_dam_system_spark.sources.agent import (
            normalize_agent_events,
        )
        from database_activity_monitoring_dam_system_spark.streaming.ingest import (
            read_agent_stream,
        )

        stream = read_agent_stream(
            spark, src, max_files_per_trigger=1
        )
        counted = stateful.exact_rate_counts(
            normalize_agent_events(stream), threshold=5
        )
        q = (
            counted.writeStream.format("memory")
            .queryName("exact_rate")
            .outputMode("append")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {
            r.event_ts: (r.queries_last_min, r.breached)
            for r in spark.sql("SELECT * FROM exact_rate").collect()
        }
        assert len(rows) == 8
        # the 6th event (25 s in) sees all prior 5 → breach at >5
        assert rows[t0 + dt.timedelta(seconds=25)] == (6, True)
        # last event of batch 2 still counts events from batch 1
        # (state carried across micro-batches): 35 s in, window covers all 8
        assert rows[t0 + dt.timedelta(seconds=35)] == (8, True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_exact_rate_counts_streaming_rocksdb(spark):
    """The prod streaming profile (RocksDB state store + changelog
    checkpointing) must produce identical cross-batch exact-rate state
    as the default provider."""
    import json
    import os

    from database_activity_monitoring_dam_system_spark.session import (
        ROCKSDB_STREAMING_CONF,
    )
    from database_activity_monitoring_dam_system_spark.sources.agent import (
        normalize_agent_events,
    )
    from database_activity_monitoring_dam_system_spark.streaming.ingest import (
        read_agent_stream,
    )

    base = tempfile.mkdtemp(prefix="dam_rocks_")
    src = f"{base}/src"
    os.makedirs(src)
    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    for fname, rng in (("a.json", range(4)), ("b.json", range(4, 8))):
        with open(f"{src}/{fname}", "w") as fh:
            for i in rng:
                fh.write(json.dumps({
                    "event_time": (t0 + dt.timedelta(seconds=5 * i)).isoformat(),
                    "user_host": "burst[burst] @ h []",
                    "argument": f"SELECT {i}",
                }) + "\n")
    saved = {
        k: spark.conf.get(k, None) for k in ROCKSDB_STREAMING_CONF
    }
    for k, v in ROCKSDB_STREAMING_CONF.items():
        spark.conf.set(k, v)
    try:
        counted = stateful.exact_rate_counts(
            normalize_agent_events(
                read_agent_stream(spark, src, max_files_per_trigger=1)
            ),
            threshold=5,
        )
        q = (
            counted.writeStream.format("memory")
            .queryName("exact_rate_rocks")
            .outputMode("append")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {
            r.event_ts: (r.queries_last_min, r.breached)
            for r in spark.sql("SELECT * FROM exact_rate_rocks").collect()
        }
        assert len(rows) == 8
        assert rows[t0 + dt.timedelta(seconds=25)] == (6, True)
        assert rows[t0 + dt.timedelta(seconds=35)] == (8, True)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        shutil.rmtree(base, ignore_errors=True)


def test_compaction_preserves_rows_and_reduces_files(spark):
    """Many tiny appended files per partition → compaction rewrites
    each cold partition to the size-targeted file count, with content
    identical and partition pruning still intact."""
    import os

    d = tempfile.mkdtemp(prefix="dam_compact_")
    try:
        act = _activity(spark, SF_SMOKE).limit(400)
        # simulate micro-batch appends: 6 small writes
        for i in range(6):
            sinks.write_activity_partitioned(
                act.filter(F.col("activity_id") % 6 == i).repartition(3), d
            )
        before = sinks.read_activity(spark, d)
        rows_before = sorted(
            (r.activity_id, str(r.event_date)) for r in
            before.select("activity_id", "event_date").collect()
        )

        report = sinks.compact_partitions(
            spark, d, target_bytes=128 << 20, min_files=2
        )
        assert report, "no partitions compacted"
        for part, (nb, na) in report.items():
            assert na < nb and na == 1  # all tiny → single target file

        after = sinks.read_activity(spark, d)
        rows_after = sorted(
            (r.activity_id, str(r.event_date)) for r in
            after.select("activity_id", "event_date").collect()
        )
        assert rows_after == rows_before
        # physical check: no partition dir keeps more than 1 data file
        for part in report:
            files = [
                f for f in os.listdir(os.path.join(d, part))
                if not f.startswith("_") and not f.startswith(".")
            ]
            assert len(files) == 1
        # pruning still works on the compacted layout
        some_date = rows_before[0][1]
        plan = (
            after.filter(F.col("event_date") == some_date)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters" in plan
        # idempotent: second run finds nothing to do
        assert sinks.compact_partitions(spark, d) == {}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compaction_cold_scope_and_crash_recovery(spark):
    """cold_before leaves newer partitions untouched; a leftover
    _compact_old_<date> dir from a crash between retire and promote is
    restored by the next run's recovery sweep."""
    import os

    d = tempfile.mkdtemp(prefix="dam_compact2_")
    try:
        act = _activity(spark, SF_SMOKE).limit(300)
        for i in range(4):
            sinks.write_activity_partitioned(
                act.filter(F.col("activity_id") % 4 == i).repartition(2), d
            )
        parts = sorted(
            p.split("=", 1)[1]
            for p in os.listdir(d)
            if p.startswith(sinks.PARTITION_COL)
        )
        assert len(parts) >= 2
        cutoff = dt.date.fromisoformat(parts[-1])
        report = sinks.compact_partitions(spark, d, cold_before=cutoff)
        assert f"{sinks.PARTITION_COL}={parts[-1]}" not in report
        assert report  # older partitions did compact

        total_healthy = sinks.read_activity(spark, d).count()
        # simulate a crash after retire, before promote
        victim = f"{sinks.PARTITION_COL}={parts[0]}"
        os.rename(
            os.path.join(d, victim),
            os.path.join(d, f"_compact_old_{parts[0]}"),
        )
        sinks.compact_partitions(spark, d, cold_before=cutoff)
        assert os.path.isdir(os.path.join(d, victim))  # restored
        assert not any(
            p.startswith("_compact_") for p in os.listdir(d)
        )
        # every row survives the crash + recovery round trip
        assert sinks.read_activity(spark, d).count() == total_healthy
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rate_state_retention_and_reseed(spark):
    """write_rate_state keeps only the trailing snapshots (small-files
    bound) while read_rate_state still re-seeds correctly: the latest
    partition strictly below the requested batch id, which a retried
    batch always finds inside the keep window."""
    import os

    d = tempfile.mkdtemp(prefix="dam_ratestate_")
    try:
        for b in range(6):
            st = spark.createDataFrame(
                [(7, [100 + b])], "user_id long, recent_epochs array<bigint>"
            )
            stateful.write_rate_state(st, d, b, keep_batches=3)
        kept = sorted(
            n for n in os.listdir(d) if n.startswith("batch_id=")
        )
        assert kept == ["batch_id=3", "batch_id=4", "batch_id=5"]
        latest = stateful.read_rate_state(spark, d, 6)
        assert [r.recent_epochs for r in latest.collect()] == [[105]]
        # a RETRY of batch 5 must re-seed from 4, not from its own
        # half-written attempt
        prior = stateful.read_rate_state(spark, d, 5)
        assert [r.recent_epochs for r in prior.collect()] == [[104]]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_retention_drops_only_expired_partitions(spark, tmp_path):
    """TTL enforcement: partitions strictly older than the cutoff
    vanish (directory-level, no data read), newer ones are
    byte-untouched, dry_run is a no-op, re-running is idempotent,
    and the jobs-level policy derives the cutoff from retain_days."""
    import datetime as dt
    import os

    from database_activity_monitoring_dam_system_spark import (
        jobs, sinks,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "activity")
    rows = []
    for day in (1, 2, 3, 4):
        rows += [
            (i, dt.datetime(2026, 8, day, 12, 0, 0))
            for i in range(day * 10, day * 10 + 3)
        ]
    df = spark.createDataFrame(
        rows, "activity_id LONG, access_timestamp TIMESTAMP"
    )
    sinks.write_activity_partitioned(df, path)
    survivors = sorted(
        str(p)
        for p in (tmp_path / "activity" / "event_date=2026-08-03").glob(
            "*.parquet"
        )
    )
    before = [(p, os.path.getmtime(p)) for p in survivors]
    # dry run names the candidates, touches nothing
    preview = sinks.retire_cold_partitions(
        spark, path, older_than=dt.date(2026, 8, 3), dry_run=True
    )
    assert preview == [
        "event_date=2026-08-01", "event_date=2026-08-02",
    ]
    assert (tmp_path / "activity" / "event_date=2026-08-01").exists()
    dropped = jobs.run_retention_job(
        spark, path, retain_days=2,
        now=dt.datetime(2026, 8, 4, 1, 0, 0),
    )
    assert dropped == [
        "event_date=2026-08-01", "event_date=2026-08-02",
    ]
    left = {
        r.event_date.isoformat()
        for r in spark.read.parquet(path)
        .select("event_date").distinct().collect()
    }
    assert left == {"2026-08-03", "2026-08-04"}
    after = [(p, os.path.getmtime(p)) for p in survivors]
    assert before == after
    # idempotent re-run
    assert jobs.run_retention_job(
        spark, path, retain_days=2,
        now=dt.datetime(2026, 8, 4, 1, 0, 0),
    ) == []


def test_zorder_layout_prunes_row_groups(spark, tmp_path):
    """The lakehouse family's read-side WHY: a selective 2-D
    predicate over a write_zordered layout must actually skip data.
    Both layouts return identical rows, the predicate reaches the
    parquet scan as PushedFilters on BOTH dims, and the z-ordered
    scan's row-group pruning emits a fraction of the rows the
    unsorted layout scans (every unsorted file straddles the full
    (x, y) range, so its min/max stats prune nothing)."""
    from database_activity_monitoring_dam_system_spark.operators import zorder

    n = 200_000
    df = spark.range(n).select(
        F.abs(F.xxhash64("id") % 1000).alias("x"),
        F.abs(F.xxhash64("id", F.lit(1)) % 1000).alias("y"),
        F.col("id"),
    )
    key = zorder.zorder_key(
        "x", "y", x_lo=0, x_hi=999, y_lo=0, y_hi=999, bits=10
    )
    zpath, upath = str(tmp_path / "z"), str(tmp_path / "u")
    zorder.write_zordered(df, zpath, key=key, n_files=16)
    df.repartition(16).write.parquet(upath)  # unsorted control

    def scan(path):
        r = spark.read.parquet(path).filter(
            F.col("x").between(100, 149) & F.col("y").between(200, 249)
        )
        rows = sorted(t.id for t in r.collect())
        plan = r._jdf.queryExecution().executedPlan()
        scan_node = plan.collectLeaves().apply(0)
        emitted = scan_node.metrics().apply("numOutputRows").value()
        return rows, emitted, plan.toString()

    z_rows, z_emitted, z_plan = scan(zpath)
    u_rows, u_emitted, u_plan = scan(upath)
    assert z_rows == u_rows and len(z_rows) > 0     # same answer
    for plan in (z_plan, u_plan):                   # filters pushed
        pushed = plan.split("PushedFilters")[1].split("]")[0]
        assert "x" in pushed and "y" in pushed
    assert u_emitted == n                           # control: no skip
    assert z_emitted < n / 4                        # real row-group skip


# ---------------------------------------------------------------- time travel


def _tt_base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, val string, seq long",
    )


def _tt_journal(spark):
    # k=1: updated then deleted; k=2: updated twice; k=4: inserted
    # then updated; k=3: untouched
    return spark.createDataFrame(
        [
            (1, "a2", 40, "U"),
            (2, "b2", 50, "U"),
            (4, "d", 60, "U"),
            (1, None, 70, "D"),
            (2, "b3", 80, "U"),
            (4, "d2", 90, "U"),
        ],
        "k long, val string, seq long, op string",
    )


def test_snapshot_as_of_points(spark):
    """Every cut reconstructs exactly the state the live merge would
    have held at that sequence; the final cut equals a full
    apply_changes."""
    from database_activity_monitoring_dam_system_spark.operators import cdc

    base, journal = _tt_base(spark), _tt_journal(spark)

    def state(as_of):
        rows = cdc.snapshot_as_of(
            base, journal, key_cols=["k"], seq_col="seq", as_of=as_of
        ).collect()
        return {r["k"]: (r["val"], r["seq"]) for r in rows}

    # before the journal: base verbatim
    assert state(39) == {1: ("a", 10), 2: ("b", 20), 3: ("c", 30)}
    # inclusive cut at the first update
    assert state(40) == {1: ("a2", 40), 2: ("b", 20), 3: ("c", 30)}
    # after the delete of k=1, before k=2's second update
    assert state(70) == {2: ("b2", 50), 3: ("c", 30), 4: ("d", 60)}
    # end of journal ≡ full merge
    full = cdc.apply_changes(
        base, journal, key_cols=["k"], seq_col="seq"
    ).collect()
    assert state(90) == {r["k"]: (r["val"], r["seq"]) for r in full}


def test_snapshot_as_of_timestamp_axis(spark):
    """Wall-clock travel slices on the commit-time column while the
    arbitration still runs on the sequence."""
    import datetime as dtm

    from pyspark.sql import functions as F

    from database_activity_monitoring_dam_system_spark.operators import cdc

    base = _tt_base(spark)
    t0 = dtm.datetime(2024, 1, 1)
    journal = _tt_journal(spark).withColumn(
        "committed_at",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(mins=(F.col("seq") - 40) / 10),
    )
    got = cdc.snapshot_as_of(
        base,
        journal,
        key_cols=["k"],
        seq_col="seq",
        as_of=t0 + dtm.timedelta(minutes=3),  # covers seqs 40..70
        as_of_col="committed_at",
    ).collect()
    assert {r["k"]: r["val"] for r in got} == {2: "b2", 3: "c", 4: "d"}


def test_scd2_intervals_semantics(spark):
    """Deletes close the preceding interval then vanish; the last
    live change per key is current; untouched spans are [seq, next)."""
    from database_activity_monitoring_dam_system_spark.operators import cdc

    journal = _tt_journal(spark)
    rows = cdc.scd2_intervals(
        journal, key_cols=["k"], seq_col="seq"
    ).collect()
    ivals = {(r["k"], r["seq"]): (r["valid_to"], r["is_current"]) for r in rows}
    # k=1's update closes at its delete and nothing is current
    assert ivals[(1, 40)] == (70, False)
    assert not any(k == 1 and cur for (k, _), (_, cur) in ivals.items())
    # k=2: first update closed by the second, second current
    assert ivals[(2, 50)] == (80, False)
    assert ivals[(2, 80)] == (None, True)
    # the delete row itself emits no interval
    assert (1, 70) not in ivals


def test_snapshot_as_of_prunes_partitioned_journal(spark, tmp_path):
    """Time travel over a PERSISTED journal reads only the partitions
    at-or-before the cut: the slice predicate lands in
    PartitionFilters (day-partitioned journal, day as the travel
    axis), so a 100 TB journal's replay cost scales with history up
    to the cut, not total history. Values must still match the
    in-memory replay."""
    from pyspark.sql import functions as F

    from database_activity_monitoring_dam_system_spark.operators import cdc

    base = _tt_base(spark)
    journal = _tt_journal(spark).withColumn(
        "day",
        F.concat(F.lit("2024-01-0"), ((F.col("seq") - 40) / 20 + 1).cast("int")),
    )
    path = str(tmp_path / "journal")
    journal.write.partitionBy("day").parquet(path)
    stored = spark.read.parquet(path)

    tt = cdc.snapshot_as_of(
        base, stored, key_cols=["k"], seq_col="seq",
        as_of="2024-01-02", as_of_col="day",
    )
    plan = tt._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "day" in pf and "2024-01-02" in pf

    want = cdc.snapshot_as_of(
        base, _tt_journal(spark).withColumn(
            "day",
            F.concat(F.lit("2024-01-0"),
                     ((F.col("seq") - 40) / 20 + 1).cast("int")),
        ),
        key_cols=["k"], seq_col="seq",
        as_of="2024-01-02", as_of_col="day",
    )
    canon = lambda df: sorted(
        (r["k"], r["val"], r["seq"]) for r in df.collect()
    )
    assert canon(tt) == canon(want)


def test_scd2_refuses_null_op(spark):
    """A NULL op row must fail loudly at execution, never silently
    vanish after closing the preceding interval."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import cdc

    journal = spark.createDataFrame(
        [(1, "a", 10, "U"), (1, "b", 20, None)],
        "k long, val string, seq long, op string",
    )
    with _pytest.raises(Exception, match="NULL 'op'"):
        cdc.scd2_intervals(
            journal, key_cols=["k"], seq_col="seq"
        ).collect()
