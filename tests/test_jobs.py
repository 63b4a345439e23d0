from __future__ import annotations

import datetime as dt
import json
import tempfile

from database_activity_monitoring_dam_system_spark import jobs
from database_activity_monitoring_dam_system_spark.plans.dam import (
    _activity,
    _anchor,
)

from .conftest import SF_SMOKE


def test_compliance_report_job_writes_file(spark):
    now = _anchor(spark, SF_SMOKE)
    with tempfile.TemporaryDirectory() as d:
        rep = jobs.run_compliance_report_job(
            _activity(spark, SF_SMOKE),
            report_type="weekly",
            output_dir=d,
            now=now,
        )
        with open(rep["output_path"]) as fh:
            on_disk = json.load(fh)
        assert on_disk["report_type"] == "weekly"
        assert on_disk["statistics"]["non_compliant_count"] == len(
            on_disk["findings"]
        )


def test_login_outcome_lockout_cycle(spark):
    now = dt.datetime(2026, 8, 1, 12, 0, 0)
    users = spark.createDataFrame(
        [(1, "alice", 3, None, None)],
        "user_id long, username string, failed_attempts int, "
        "locked_until timestamp, last_login timestamp",
    )
    # two more failures reach the threshold of 5 → locked
    u = jobs.apply_login_outcome(users, "alice", success=False, now=now)
    u = jobs.apply_login_outcome(u, "alice", success=False, now=now)
    row = u.first()
    assert row["failed_attempts"] == 5
    assert row["locked_until"] is not None
    assert u.filter(jobs.is_locked_out(now)).count() == 1
    # lockout expires after the window
    later = now + dt.timedelta(minutes=31)
    assert u.filter(jobs.is_locked_out(later)).count() == 0
    # success resets
    u2 = jobs.apply_login_outcome(u, "alice", success=True, now=later)
    row2 = u2.first()
    assert row2["failed_attempts"] == 0
    assert row2["locked_until"] is None
    assert row2["last_login"] == later


def test_compaction_job_scopes_to_cold(spark):
    """The job wrapper compacts everything strictly before `now`'s
    date and never touches the current date's partition."""
    import datetime as dt
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from database_activity_monitoring_dam_system_spark import jobs, sinks
    from database_activity_monitoring_dam_system_spark.plans.dam import (
        _activity,
    )

    from .conftest import SF_SMOKE

    d = tempfile.mkdtemp(prefix="dam_job_compact_")
    try:
        act = _activity(spark, SF_SMOKE).limit(200)
        for i in range(3):
            sinks.write_activity_partitioned(
                act.filter(F.col("activity_id") % 3 == i).repartition(2), d
            )
        parts = sorted(
            p.split("=", 1)[1]
            for p in os.listdir(d)
            if p.startswith(sinks.PARTITION_COL)
        )
        fake_now = dt.datetime.fromisoformat(parts[-1] + "T12:00:00")
        report = jobs.run_compaction_job(spark, d, now=fake_now)
        assert report
        assert f"{sinks.PARTITION_COL}={parts[-1]}" not in report
        assert all(
            p.split("=", 1)[1] < parts[-1] for p in report
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_maintenance_jobs_default_now_is_utc(monkeypatch):
    """The retention/compaction cutoffs derive from UTC 'now' by
    default, matching the UTC-pinned event_date partitions: a
    driver-local clock past midnight in a TZ ahead of UTC would
    otherwise retire (or compact) one extra day — a compliance-
    sensitive off-by-one."""
    import datetime as real_dt
    import types

    from database_activity_monitoring_dam_system_spark import jobs, sinks
    from database_activity_monitoring_dam_system_spark.streaming import (
        rollup_stream,  # noqa: F401 (imported for parity of namespace)
    )

    class _FrozenDT(real_dt.datetime):
        @classmethod
        def now(cls, tz=None):
            if tz is None:
                # local wall clock already past midnight...
                return real_dt.datetime(2024, 1, 2, 0, 30)
            # ...while UTC is still on the previous day
            return real_dt.datetime(2024, 1, 1, 23, 30, tzinfo=tz)

    fake_dt = types.SimpleNamespace(
        datetime=_FrozenDT,
        timedelta=real_dt.timedelta,
        timezone=real_dt.timezone,
    )
    monkeypatch.setattr(jobs, "dt", fake_dt)

    seen = {}
    monkeypatch.setattr(
        sinks,
        "retire_cold_partitions",
        lambda spark, path, older_than: seen.setdefault(
            "retention_cutoff", older_than
        )
        and [],
    )
    monkeypatch.setattr(
        sinks,
        "compact_partitions",
        lambda spark, path, target_bytes, cold_before: seen.setdefault(
            "compaction_today", cold_before
        )
        and [],
    )
    jobs.run_retention_job(None, "/unused", retain_days=7)
    jobs.run_compaction_job(None, "/unused")
    # UTC date 2024-01-01 (not the local 2024-01-02)
    assert seen["retention_cutoff"] == real_dt.date(
        2024, 1, 1
    ) - real_dt.timedelta(days=6)
    assert seen["compaction_today"] == real_dt.date(2024, 1, 1)
