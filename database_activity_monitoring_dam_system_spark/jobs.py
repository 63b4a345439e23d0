"""Batch jobs (SURVEY.md S11 + P5 lifecycle ops).

The reference schedules daily/weekly/monthly compliance reports with
APScheduler inside the Flask process (app.py:871-905). In the engine
these are plain batch entry points — an external scheduler (cron /
Airflow) or a Structured Streaming ``Trigger.AvailableNow`` run invokes
them; the engine stays stateless.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .api import DamAnalytics


def run_compliance_report_job(
    activity: DataFrame,
    *,
    report_type: str = "daily",
    output_dir: str,
    now: dt.datetime | str | None = None,
) -> dict:
    """generate → persist → log, mirroring _run_scheduled_report
    (app.py:878-905) minus the email side effect (notifier hooks live
    in streaming.ingest)."""
    report = DamAnalytics(activity, now=now).compliance_report(report_type)
    os.makedirs(output_dir, exist_ok=True)
    stamp = str(now or dt.datetime.now(dt.timezone.utc).isoformat()).replace(
        ":", "-"
    ).replace(" ", "_")
    path = os.path.join(output_dir, f"compliance_{report_type}_{stamp}.json")
    with open(path, "w") as fh:
        json.dump(report, fh, default=str, indent=2)
    report["output_path"] = path
    return report


def append_report_log(
    spark: SparkSession,
    log_path: str,
    *,
    report_type: str,
    output_path: str,
    generated_at: dt.datetime,
) -> None:
    """report_log bookkeeping row (app.py:1508-1514) as an append-only
    parquet table."""
    spark.createDataFrame(
        [(report_type, output_path, generated_at)],
        "report_type string, output_path string, generated_at timestamp",
    ).write.mode("append").parquet(log_path)


# ── P5 lifecycle table ops (functional updates; caller persists) ──────────


def resolve_alert(
    alerts: DataFrame, alert_key: int, *, now: dt.datetime,
    key_col: str | None = None,
) -> DataFrame:
    """Alert resolution (app.py:1128-1133): status='Resolved' +
    resolved_at stamp. Key auto-detects: ``alert_id`` when present (the
    batch SECURITY_ALERTS schema and the reference route's key), else
    ``activity_id`` (the streaming alerts sink carries no alert_id) —
    so a ported /api/alerts/<alert_id>/resolve call can't silently
    compare against the wrong column."""
    if key_col is None:
        key_col = "alert_id" if "alert_id" in alerts.columns else "activity_id"
    if key_col not in alerts.columns:
        raise ValueError(f"alerts frame has no {key_col!r} column")
    hit = F.col(key_col) == alert_key
    out = alerts.withColumn(
        "status", F.when(hit, "Resolved").otherwise(F.col("status"))
    )
    if "resolved_at" in alerts.columns:
        out = out.withColumn(
            "resolved_at",
            F.when(hit, F.lit(now)).otherwise(F.col("resolved_at")),
        )
    else:
        out = out.withColumn(
            "resolved_at",
            F.when(hit, F.lit(now)).cast("timestamp"),
        )
    return out


def update_user_status(users: DataFrame, user_id: int, status: str) -> DataFrame:
    """update_status (app.py:245-248) with domain enforcement — the
    reference would pass any string through to the ENUM."""
    from .schemas import ACCOUNT_STATUSES

    if status not in ACCOUNT_STATUSES:
        raise ValueError(
            f"invalid account_status {status!r}; allowed: {ACCOUNT_STATUSES}"
        )
    return users.withColumn(
        "account_status",
        F.when(F.col("user_id") == user_id, status).otherwise(
            F.col("account_status")
        ),
    )


# ── P5/R8: account lockout state (OLTP-shaped, kept as table ops) ─────────


def is_locked_out(now: dt.datetime | str | None = None) -> F.Column:
    """Lockout predicate (app.py:215-222): locked iff locked_until is
    in the future."""
    anchor = (
        F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    )
    return F.col("locked_until").isNotNull() & (F.col("locked_until") > anchor)


def apply_login_outcome(
    users: DataFrame,
    username: str,
    *,
    success: bool,
    now: dt.datetime,
    max_attempts: int = 5,
    lockout_minutes: int = 30,
) -> DataFrame:
    """Pure-functional users-table update for one login outcome:
    success resets counters + stamps last_login; failure increments and
    locks at the threshold (app.py:215-222, Config app.py:80-81).
    Caller persists the returned frame (overwrite) — the engine keeps
    mutation at the storage boundary only."""
    hit = F.col("username") == username
    if success:
        return users.withColumn(
            "failed_attempts", F.when(hit, 0).otherwise(F.col("failed_attempts"))
        ).withColumn(
            "locked_until",
            F.when(hit, F.lit(None).cast("timestamp")).otherwise(
                F.col("locked_until")
            ),
        ).withColumn(
            "last_login",
            F.when(hit, F.lit(now)).otherwise(F.col("last_login")),
        )
    bumped = F.coalesce(F.col("failed_attempts"), F.lit(0)) + 1
    return users.withColumn(
        "failed_attempts", F.when(hit, bumped).otherwise(F.col("failed_attempts"))
    ).withColumn(
        "locked_until",
        F.when(
            hit & (bumped >= max_attempts),
            F.lit(now) + F.make_interval(mins=F.lit(lockout_minutes)),
        ).otherwise(F.col("locked_until")),
    )


def run_compaction_job(
    spark: SparkSession,
    activity_path: str,
    *,
    now: dt.datetime | None = None,
    target_bytes: int = 128 << 20,
) -> dict[str, tuple[int, int]]:
    """Nightly maintenance entry point: compact every activity
    partition older than today (the streaming sink only ever appends
    to the current date's partition, so yesterday back is cold by
    construction). Scheduling is external (cron/Airflow), same policy
    as the report job above."""
    from . import sinks

    # UTC like the retention job: event_date partitions are UTC-derived
    today = (now or dt.datetime.now(dt.timezone.utc)).date()
    return sinks.compact_partitions(
        spark, activity_path, target_bytes=target_bytes, cold_before=today
    )


def run_retention_job(
    spark: SparkSession,
    activity_path: str,
    *,
    retain_days: int,
    now: dt.datetime | None = None,
) -> list[str]:
    """Retention maintenance entry point: drop activity partitions
    older than ``retain_days`` (the audit-retention policy as a
    partition-level delete — no data is ever read). Scheduling is
    external (cron/Airflow), same policy as the compaction job.

    The default ``now`` is UTC (jobs.py's stamp convention): the
    event_date partitions derive from UTC-pinned timestamps, so a
    driver-local clock on a non-UTC host near midnight would retire
    (or retain) one day off the stated policy — a compliance-
    sensitive off-by-one. Pass ``now`` explicitly if the partition
    column was derived in another timezone."""
    from . import sinks

    if retain_days < 1:
        raise ValueError(f"retain_days must be >= 1, got {retain_days}")
    cutoff = ((now or dt.datetime.now(dt.timezone.utc)).date()
              - dt.timedelta(days=retain_days - 1))
    return sinks.retire_cold_partitions(
        spark, activity_path, older_than=cutoff
    )


def run_rollup_maintenance(
    spark: SparkSession,
    partials_path: str,
    *,
    checkpoint_dir: str,
) -> tuple[int, int]:
    """Maintenance entry point for a streamed rollup partials table
    (time or distinct-count — the compactor detects the schema):
    fold per-batch fragments into one, carrying any landed-but-
    uncommitted batch unchanged. Run on the same external schedule
    as compaction/retention, while the stream is not actively
    writing (between availableNow runs)."""
    from .streaming import rollup_stream

    return rollup_stream.compact_rollup_fragments(
        spark, partials_path, checkpoint_dir=checkpoint_dir
    )
