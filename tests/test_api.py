"""E2/E3 payload-shape tests (SURVEY.md §5 item 2): exact dict
structures of the dashboard/chart/report routes, plus export formats
and scalar-function edge cases.
"""

from __future__ import annotations

import csv
import io

from pyspark.sql import functions as F

from database_activity_monitoring_dam_system_spark.api import DamAnalytics
from database_activity_monitoring_dam_system_spark.operators import exports
from database_activity_monitoring_dam_system_spark.plans.dam import (
    _activity,
    _anchor,
    _battery,
)

from .conftest import SF_SMOKE


def _facade(spark) -> DamAnalytics:
    return DamAnalytics(
        _battery(spark, SF_SMOKE), now=_anchor(spark, SF_SMOKE)
    )


def test_dashboard_payload_shape(spark):
    payload = _facade(spark).dashboard_data(limit=10)
    assert set(payload) == {"activities", "stats"}
    assert len(payload["activities"]) == 10
    s = payload["stats"]
    assert set(s) == {
        "total_activities", "suspicious_count", "failed_count", "today_count",
        "by_operation_type", "top_users", "recent_threats",
        "severity_histogram",
    }
    assert list(s["severity_histogram"]) == ["Low", "Medium", "High", "Critical"]
    assert len(s["top_users"]) == 5
    assert len(s["recent_threats"]) == 10


def test_chart_payload_shape(spark):
    charts = _facade(spark).chart_data(timeline_hours=48)
    assert set(charts) == {
        "kpis", "operation_type_chart", "timeline_chart",
        "top_users_chart", "severity_chart",
    }
    assert charts["severity_chart"]["labels"] == [
        "Low", "Medium", "High", "Critical"
    ]
    tc = charts["timeline_chart"]
    assert len(tc["labels"]) == len(tc["total"]) == len(tc["suspicious"])
    # labels are the reference's DATE_FORMAT '%Y-%m-%d %H:00' buckets
    assert all(lbl.endswith(":00") for lbl in tc["labels"])


def test_severity_filter_aliasing(spark):
    """F4: 'Critical' filter means is_suspicious, not severity label."""
    fac = _facade(spark)
    page = fac.dashboard_data(limit=200, severity="Critical")["activities"]
    assert page and all(a["is_suspicious"] for a in page)
    assert any(a["severity_level"] != "Critical" for a in page)


def test_compliance_report_shape(spark):
    rep = _facade(spark).compliance_report("weekly")
    assert rep["report_type"] == "weekly"
    assert set(rep["statistics"]) == {
        "total_activities", "non_compliant_count", "standards_covered",
    }
    assert rep["statistics"]["non_compliant_count"] == len(rep["findings"])
    standards = {f["standard"] for f in rep["findings"]}
    assert standards <= {"GDPR", "SOX", "PCI_DSS"}


def test_behavior_profile_sums(spark):
    """A11 corrected semantics: counts sum per hour instead of the
    reference's dict-collapse (FIXTURES decision #1)."""
    prof = _facade(spark).behavior_profile(3, days=7)
    assert prof["total_activities"] == sum(prof["peak_hours"].values())
    assert prof["total_activities"] == sum(prof["operation_types"].values())


def test_csv_export_isoformat_and_cap(spark):
    df = _activity(spark, SF_SMOKE).select(
        "activity_id", "username", "access_timestamp"
    )
    text = exports.export_csv_string(df, limit=50)
    rows = list(csv.DictReader(io.StringIO(text)))
    assert len(rows) == 50
    # isoformat 'YYYY-MM-DDTHH:MM:SS'
    assert all("T" in r["access_timestamp"] for r in rows)


def test_export_rows_cap(spark):
    rows = exports.export_rows(_activity(spark, SF_SMOKE), limit=7)
    assert len(rows) == 7
    assert isinstance(rows[0]["access_timestamp"], str)


def test_anomalies_payload(spark):
    out = _facade(spark).anomalies()
    assert set(out) == {"volume", "impossible_travel"}


def test_user_scoped_views(spark):
    fac = _facade(spark)
    acts = fac.user_activities(3, limit=20)
    assert 0 < len(acts) <= 20
    assert all(a["user_id"] == 3 for a in acts)
    summary = fac.guest_summary(3)
    assert summary["total_activities"] >= summary["my_activities"] > 0


def test_alert_resolve_and_user_status(spark):
    import datetime as dt

    from database_activity_monitoring_dam_system_spark import jobs
    from database_activity_monitoring_dam_system_spark.operators.rules import (
        derive_alerts,
    )

    alerts = derive_alerts(_battery(spark, SF_SMOKE))
    target = alerts.first()["activity_id"]
    now = dt.datetime(2026, 8, 2, 9, 0, 0)
    resolved = jobs.resolve_alert(alerts, target, now=now)
    row = resolved.filter(resolved.activity_id == target).first()
    assert row["status"] == "Resolved" and row["resolved_at"] == now
    untouched = resolved.filter(resolved.activity_id != target).first()
    assert untouched["status"] == "New" and untouched["resolved_at"] is None

    users = spark.createDataFrame(
        [(1, "alice", "Active"), (2, "bob", "Active")],
        "user_id long, username string, account_status string",
    )
    updated = jobs.update_user_status(users, 2, "Locked")
    assert {
        (r.user_id, r.account_status) for r in updated.collect()
    } == {(1, "Active"), (2, "Locked")}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        jobs.update_user_status(users, 1, "Banned")
