"""Read-side analytics over the activity-log fact table.

Re-expresses the reference's dashboard/chart workload (SURVEY.md E2/E3,
operators A1-A14, F3-F9, J1/J2, W1/W2) as single-pass declarative plans:

  * the reference issues 3 separate COUNT scans + an N+1 severity loop
    per dashboard refresh (app.py:300-302, 742-744); here KPIs + the
    severity histogram are ONE aggregate over ONE scan, and per-group
    counts use hash aggregation with map-side partials;
  * every "now"-relative predicate takes an explicit ``now`` anchor
    (deterministic tests; the reference leans on MySQL NOW()/CURDATE(),
    app.py:281,302);
  * top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject
    (no full shuffle-sort), with ``activity_id`` as deterministic
    tie-break (FIXTURES.md oracle decision #3).

All functions accept/return DataFrames — no collect() inside operators,
so each composes into larger plans and scales with the cluster.
"""

from __future__ import annotations

import datetime as dt
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import SEVERITY_ORDER


def _now_lit(now: dt.datetime | str) -> Column:
    return F.lit(now).cast("timestamp")


# ── F3-F6 + J1 + W1: get_latest with dynamic filters (app.py:269-285) ──────

def latest_activities(
    activity_logs: DataFrame,
    users: DataFrame | None = None,
    *,
    limit: int = 50,
    severity: str | None = None,
    database: str | None = None,
    time_range_hours: int | None = None,
    now: dt.datetime | str | None = None,
) -> DataFrame:
    """Dynamic conjunctive filter + role enrichment + latest-N.

    Preserves the reference's severity-filter ALIASING exactly
    (app.py:273-277): "Critical" → is_suspicious flag (NOT
    severity_level='Critical'); "Failed" → operation_status='Failed'.
    """
    preds: list[Column] = []
    # "All" / "All Databases" are the UI's no-filter sentinels
    # (app.py:272,278) — treat like None.
    if severity == "Critical":
        preds.append(F.col("is_suspicious") == F.lit(True))
    elif severity == "Failed":
        preds.append(F.col("operation_status") == "Failed")
    elif severity and severity != "All":
        preds.append(F.col("severity_level") == severity)
    if database and database != "All Databases":
        preds.append(F.col("table_name").contains(database))
    if time_range_hours is not None:
        anchor = _now_lit(now) if now is not None else F.current_timestamp()
        preds.append(
            F.col("access_timestamp")
            >= anchor - F.make_interval(hours=F.lit(time_range_hours))
        )
    out = activity_logs
    if preds:
        out = out.filter(reduce(lambda a, b: a & b, preds))
    if users is not None:
        out = out.join(
            F.broadcast(users.select("user_id", "role")), "user_id", "left"
        )
    return out.orderBy(
        F.desc("access_timestamp"), F.desc("activity_id")
    ).limit(limit)


# ── A1-A4 + severity histogram (app.py:293-306, 742-744) ───────────────────

def activity_stats(
    activity_logs: DataFrame, *, now: dt.datetime | str | None = None
) -> DataFrame:
    """One-row KPI frame in a single scan (vs the reference's 3+ scans).

    Columns: total / suspicious / failed / today counts plus the 4-bucket
    severity histogram — all conditional sums in one hash aggregate.
    """
    anchor = _now_lit(now) if now is not None else F.current_timestamp()
    # Reference parity (app.py:742-744): histogram counts rows by
    # severity_level ALONE — non-suspicious rows default to 'Low'
    # (DDL DEFAULT), so the Low bucket includes them.
    sev_cols = [
        F.sum(
            F.when(F.col("severity_level") == s, 1).otherwise(0)
        ).alias(f"sev_{s.lower()}")
        for s in SEVERITY_ORDER
    ]
    return activity_logs.agg(
        F.count("*").alias("total_activities"),
        F.sum(F.col("is_suspicious").cast("int")).alias("suspicious_count"),
        F.sum(
            (F.col("operation_status") == "Failed").cast("int")
        ).alias("failed_count"),
        F.sum(
            (F.to_date("access_timestamp") == F.to_date(anchor)).cast("int")
        ).alias("today_count"),
        *sev_cols,
    )


def operations_by_type(activity_logs: DataFrame) -> DataFrame:
    """A3 — group-by count per operation type."""
    return activity_logs.groupBy("operation_type").agg(
        F.count("*").alias("cnt")
    )


def top_users(activity_logs: DataFrame, k: int = 5) -> DataFrame:
    """A4 — top-k users by activity count (partial agg + TakeOrdered)."""
    return (
        activity_logs.groupBy("username")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("username"))
        .limit(k)
    )


# ── A5: hourly timeline, tumbling 1 h (app.py:308-318) ─────────────────────

def hourly_timeline(
    activity_logs: DataFrame,
    *,
    hours: int = 24,
    now: dt.datetime | str | None = None,
) -> DataFrame:
    """Tumbling 1-hour buckets with total / suspicious / failed counts.

    Batch form of ST3; the streaming pipeline reuses the same aggregate
    via groupBy(window(ts, "1 hour")).
    """
    anchor = _now_lit(now) if now is not None else F.current_timestamp()
    return (
        activity_logs.filter(
            F.col("access_timestamp")
            >= anchor - F.make_interval(hours=F.lit(hours))
        )
        .groupBy(
            F.date_format(
                F.date_trunc("hour", "access_timestamp"), "yyyy-MM-dd HH:00"
            ).alias("time_bucket")
        )
        .agg(
            F.count("*").alias("total"),
            F.sum(F.col("is_suspicious").cast("int")).alias("suspicious"),
            F.sum(
                F.when(F.col("operation_status") == "Failed", 1).otherwise(0)
            ).alias("failed"),
        )
        .orderBy("time_bucket")
    )


# ── A6 + A11: behavior profile (app.py:448-461) ────────────────────────────

def user_behavior_profile(
    activity_logs: DataFrame,
    user_id: int,
    *,
    days: int = 7,
    now: dt.datetime | str | None = None,
) -> DataFrame:
    """(hour, operation_type) counts for one user over a trailing window.

    Downstream dict builders sum per hour / per op — the *corrected*
    semantics (the reference's dict comprehension keeps only the last
    row per key, app.py:459-461; FIXTURES.md oracle decision #1).
    """
    anchor = _now_lit(now) if now is not None else F.current_timestamp()
    return (
        activity_logs.filter(
            (F.col("user_id") == user_id)
            & (
                F.col("access_timestamp")
                >= anchor - F.make_interval(days=F.lit(days))
            )
        )
        .groupBy(
            F.hour("access_timestamp").alias("hour"),
            F.col("operation_type"),
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("hour", "operation_type")
    )


# ── J2: active alerts join (app.py:436-444) ────────────────────────────────

def active_alerts(
    security_alerts: DataFrame, activity_logs: DataFrame, *, limit: int = 20
) -> DataFrame:
    return (
        security_alerts.filter(F.col("status") == "New")
        .join(
            activity_logs.select(
                "activity_id", "username", "operation_type", "table_name"
            ),
            "activity_id",
            "inner",
        )
        # tie-break on activity_id (present in BOTH the batch fixture
        # and the streaming alerts sink, which carries no alert_id)
        .orderBy(F.desc("created_at"), F.desc("activity_id"))
        .limit(limit)
    )
