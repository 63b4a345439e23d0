"""DamAnalytics — the reference's HTTP read surface as a facade.

Reproduces the exact JSON payload SHAPES of the dashboard/chart/report
routes (SURVEY.md E2/E3) while collapsing their N+1 query storms into
the single-pass plans of operators/analytics:

* /api/dashboard-data  (app.py:1070-1089): 8+ MySQL round trips → 3
  Spark jobs (latest page, one multi-aggregate scan, alerts join).
* /api/v2/charts/all   (app.py:1266-1270 → 738-773): stats + timeline
  + 4 severity scans → the SAME one-pass aggregate (severity histogram
  rides along as conditional sums) + one windowed aggregate.
* compliance report    (app.py:488-510): full-table fetch into Python
  → distributed filter + explode + count.

collect() happens only here, at the presentation boundary, on
already-aggregated or LIMITed frames.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import analytics, anomaly, rules
from .schemas import SEVERITY_ORDER


def _rows(df: DataFrame) -> list[dict[str, Any]]:
    return [r.asDict(recursive=True) for r in df.collect()]


class DamAnalytics:
    """Facade over a set of DAM tables (DataFrames, batch or the
    parquet sinks of the streaming pipeline)."""

    def __init__(
        self,
        activity_logs: DataFrame,
        *,
        users: DataFrame | None = None,
        security_alerts: DataFrame | None = None,
        now: dt.datetime | str | None = None,
    ) -> None:
        self.activity = activity_logs
        self.users = users
        self.alerts = security_alerts
        self.now = now

    # ── E2: dashboard ──────────────────────────────────────────────

    def stats(self) -> dict[str, Any]:
        """get_stats payload (app.py:297-306) + severity histogram in
        the same single scan."""
        row = analytics.activity_stats(self.activity, now=self.now).first()
        by_type = _rows(analytics.operations_by_type(self.activity))
        top = _rows(analytics.top_users(self.activity, k=5))
        recent_threats = _rows(
            self.activity.filter(F.col("is_suspicious"))
            .orderBy(F.desc("access_timestamp"), F.desc("activity_id"))
            .limit(10)
        )
        return {
            "total_activities": row["total_activities"],
            "suspicious_count": row["suspicious_count"],
            "failed_count": row["failed_count"],
            "today_count": row["today_count"],
            "by_operation_type": {d["operation_type"]: d["cnt"] for d in by_type},
            "top_users": [
                {"username": d["username"], "count": d["cnt"]} for d in top
            ],
            "recent_threats": recent_threats,
            "severity_histogram": {
                s: row[f"sev_{s.lower()}"] for s in SEVERITY_ORDER
            },
        }

    def dashboard_data(
        self,
        *,
        limit: int = 50,
        severity: str | None = None,
        database: str | None = None,
        time_range_hours: int | None = None,
    ) -> dict[str, Any]:
        """/api/dashboard-data payload (app.py:1082-1089)."""
        latest = analytics.latest_activities(
            self.activity,
            self.users,
            limit=limit,
            severity=severity,
            database=database,
            time_range_hours=time_range_hours,
            now=self.now,
        )
        payload = {
            "activities": _rows(latest),
            "stats": self.stats(),
        }
        if self.alerts is not None:
            payload["alerts"] = _rows(
                analytics.active_alerts(self.alerts, self.activity, limit=20)
            )
        return payload

    # ── E3: charts ─────────────────────────────────────────────────

    def chart_data(self, *, timeline_hours: int = 24) -> dict[str, Any]:
        """/api/v2/charts/all payload (app.py:746-773): fixed severity
        label order Low/Medium/High/Critical preserved."""
        s = self.stats()
        timeline = _rows(
            analytics.hourly_timeline(
                self.activity, hours=timeline_hours, now=self.now
            )
        )
        return {
            "kpis": {
                "total": s["total_activities"],
                "suspicious": s["suspicious_count"],
                "failed": s["failed_count"],
                "today": s["today_count"],
            },
            "operation_type_chart": {
                "labels": list(s["by_operation_type"].keys()),
                "data": list(s["by_operation_type"].values()),
            },
            "timeline_chart": {
                "labels": [t["time_bucket"] for t in timeline],
                "total": [t["total"] for t in timeline],
                "suspicious": [t["suspicious"] for t in timeline],
                "failed": [t["failed"] for t in timeline],
            },
            "top_users_chart": {
                "labels": [u["username"] for u in s["top_users"]],
                "data": [u["count"] for u in s["top_users"]],
            },
            "severity_chart": {
                "labels": list(SEVERITY_ORDER),
                "data": [s["severity_histogram"][x] for x in SEVERITY_ORDER],
            },
        }

    # ── compliance report (R4) ─────────────────────────────────────

    def compliance_report(self, report_type: str = "daily") -> dict[str, Any]:
        """generate_report payload (app.py:501-510), fully distributed
        (the reference loads every row into Python, app.py:491-499)."""
        anchor = (
            F.lit(self.now).cast("timestamp")
            if self.now is not None
            else F.current_timestamp()
        )
        if report_type == "daily":
            scoped = self.activity.filter(
                F.to_date("access_timestamp") == F.to_date(anchor)
            )
        elif report_type == "weekly":
            scoped = self.activity.filter(
                F.col("access_timestamp") >= anchor - F.make_interval(days=F.lit(7))
            )
        else:
            scoped = self.activity.filter(
                F.col("access_timestamp") >= anchor - F.make_interval(days=F.lit(30))
            )
        scoped = scoped.cache()
        try:
            findings = _rows(rules.compliance_findings(scoped))
            total = scoped.count()
        finally:
            scoped.unpersist()
        return {
            "report_type": report_type,
            "findings": findings,
            "statistics": {
                "total_activities": total,
                "non_compliant_count": len(findings),
                "standards_covered": ["GDPR", "SOX", "HIPAA", "PCI_DSS"],
            },
        }

    # ── behavior profile (A6+A11, corrected sums) ──────────────────

    def behavior_profile(self, user_id: int, *, days: int = 7) -> dict[str, Any]:
        prof = analytics.user_behavior_profile(
            self.activity, user_id, days=days, now=self.now
        ).collect()
        peak: dict[int, int] = {}
        ops: dict[str, int] = {}
        for r in prof:
            peak[r["hour"]] = peak.get(r["hour"], 0) + r["cnt"]
            ops[r["operation_type"]] = ops.get(r["operation_type"], 0) + r["cnt"]
        return {
            "user_id": user_id,
            "total_activities": sum(r["cnt"] for r in prof),
            "peak_hours": peak,
            "operation_types": ops,
        }

    # ── user-scoped views (app.py:287-291, 1105-1118) ──────────────

    def user_activities(self, user_id: int, *, limit: int = 50) -> list[dict]:
        """get_by_user: the user's latest page (app.py:287-291)."""
        return _rows(
            self.activity.filter(F.col("user_id") == user_id)
            .orderBy(F.desc("access_timestamp"), F.desc("activity_id"))
            .limit(limit)
        )

    def guest_summary(self, user_id: int) -> dict[str, Any]:
        """/api/guest/summary (app.py:1111-1118)."""
        return {
            "total_activities": self.activity.count(),
            "my_activities": len(self.user_activities(user_id)),
        }

    def users_list(self) -> list[dict]:
        """get_all_users projection (app.py:229-233). Tolerates narrow
        users frames (most consumers only carry user_id+role): missing
        columns surface as NULL / 0 rather than an analysis error."""
        if self.users is None:
            return []
        have = set(self.users.columns)

        def col_or(name: str, default):
            return F.col(name) if name in have else F.lit(default)

        return _rows(
            self.users.select(
                col_or("user_id", None).alias("user_id"),
                col_or("username", None).alias("username"),
                col_or("role", None).alias("role"),
                col_or("account_status", None).alias("account_status"),
                col_or("last_login", None).cast("timestamp").alias("last_login"),
                F.coalesce(col_or("failed_attempts", 0), F.lit(0)).alias(
                    "failed_attempts"
                ),
            )
        )

    # ── anomalies ──────────────────────────────────────────────────

    def anomalies(self) -> dict[str, Any]:
        return {
            "volume": _rows(anomaly.volume_anomalies(self.activity)),
            "impossible_travel": _rows(
                anomaly.impossible_travel(self.activity, now=self.now)
            ),
        }
