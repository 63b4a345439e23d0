"""Unit/property tests for the scalar expression library and the rule
battery's semantic quirks (SURVEY.md §5 item 4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_activity_monitoring_dam_system_spark.functions import (
    scalars,
    severity,
)
from database_activity_monitoring_dam_system_spark.operators import rules
from database_activity_monitoring_dam_system_spark.schemas import SEVERITY_ORDER


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


@pytest.mark.parametrize(
    "sql,op",
    [
        ("SELECT 1", "SELECT"),
        ("  select 1", "SELECT"),
        ("CALL p()", "PROCEDURE"),
        ("EXPLAIN SELECT 1", "OTHER"),
        ("TrUnCaTe table t", "TRUNCATE"),
        ("", "OTHER"),
    ],
)
def test_classify_operation(spark, sql, op):
    assert _one(spark, scalars.classify_operation(F.lit(sql))) == op


@pytest.mark.parametrize(
    "sql,table",
    [
        ("SELECT * FROM users u", "users"),
        ("insert into `orders` values (1)", "orders"),
        ("DROP TABLE bar", "bar"),
        ("create table neo (a int)", "neo"),
        ("EXPLAIN something", "unknown"),
        # pattern 1 wins over pattern 2 (reference iterates in order)
        ("alter table wide add c int", "wide"),
    ],
)
def test_extract_table_name(spark, sql, table):
    assert _one(spark, scalars.extract_table_name(F.lit(sql))) == table


@pytest.mark.parametrize(
    "user_host,name",
    [
        ("root[root] @ localhost []", "root"),
        # no '[' → regex captures the WHOLE string (reference behavior:
        # the split('@') fallback at dam_agent.py:144 is unreachable
        # unless the ^[^\[]+ match fails, i.e. leading '[')
        ("agent @ 10.0.0.2", "agent @ 10.0.0.2"),
        ("[odd] @ host", "[odd]"),  # leading '[' → split('@') fallback
        ("", "SYSTEM"),
        (None, "SYSTEM"),
    ],
)
def test_extract_username(spark, user_host, name):
    assert _one(spark, scalars.extract_username(F.lit(user_host))) == name


def test_decode_hex_roundtrip(spark):
    text = "SELECT * FROM users"
    encoded = "0x" + text.encode().hex()
    assert _one(spark, scalars.decode_hex_argument(F.lit(encoded))) == text
    # non-hex passthrough
    assert _one(spark, scalars.decode_hex_argument(F.lit(text))) == text
    # odd-length hex gets zero-padded, not dropped
    assert _one(spark, scalars.decode_hex_argument(F.lit("0x414"))) is not None


def test_severity_lattice_roundtrip_and_monotonicity(spark):
    labels = list(SEVERITY_ORDER)
    for i, a in enumerate(labels):
        assert _one(spark, severity.severity_label(F.lit(i))) == a
        assert _one(spark, severity.severity_rank(F.lit(a))) == i
        for j, b in enumerate(labels):
            got = _one(
                spark, severity.severity_greatest(F.lit(a), F.lit(b))
            )
            assert got == labels[max(i, j)]


def _battery_one(spark, **overrides):
    import datetime as dt

    base = {
        "activity_id": 1,
        "user_id": 1,
        "username": "u",
        "role": "User",
        "operation_type": "SELECT",
        "table_name": "products",
        "operation_status": "Success",
        "operation_details": "select 1",
        "ip_address": "1.2.3.4",
        "access_timestamp": dt.datetime(2026, 8, 1, 12, 0, 0),
        "rows_affected": 1,
    }
    base.update(overrides)
    if isinstance(base["access_timestamp"], str):
        base["access_timestamp"] = dt.datetime.fromisoformat(
            base["access_timestamp"]
        )
    df = spark.createDataFrame(
        [tuple(base.values())],
        "activity_id long, user_id long, username string, role string, "
        "operation_type string, table_name string, operation_status string, "
        "operation_details string, ip_address string, "
        "access_timestamp timestamp, rows_affected int",
    )
    return rules.apply_rule_battery(df, with_rate_rule=False).first()


def test_battery_guest_write_overwrites_blacklist_severity(spark):
    """The reference quirk: rule 2 assigns High UNCONDITIONALLY, even
    over a prior Critical (app.py:357-359) — not a lattice max."""
    bl = None  # no blacklist frame; emulate via injection+guest instead
    row = _battery_one(
        spark, role="Guest", operation_type="DROP",
        operation_details="drop table x",
    )
    # injection (drop table) fires AFTER guest-write → Critical wins here
    assert row["severity_level"] == "Critical"
    row2 = _battery_one(spark, role="Guest", operation_type="DELETE")
    assert row2["severity_level"] == "High"
    assert row2["suspicious_reasons"] == "Guest attempting write operation"


def test_battery_reason_order_and_first_injection_only(spark):
    row = _battery_one(
        spark,
        role="User",
        table_name="customers",
        operation_details="select password from t union select salary -- sleep(1)",
        access_timestamp="2026-08-01 03:00:00",
        rows_affected=5000,
    )
    reasons = row["suspicious_reasons"].split("; ")
    assert reasons == [
        "User accessing sensitive table: customers",
        "Access outside working hours",
        "Suspicious pattern: SQL Injection - UNION",  # first pattern only
        "Access to sensitive column: password",
        "Access to sensitive column: salary",
        "Large data extraction: 5000 rows",
    ]
    assert row["severity_level"] == "Critical"


def test_alert_type_precedence_case_sensitivity(spark):
    df = spark.createDataFrame(
        [
            ("Suspicious pattern: SQL Injection - UNION",),
            ("Access to sensitive column: ssn",),
            ("Rate limit exceeded: 200 queries/min",),  # does NOT match 'rate limit'
            ("Guest attempting write operation",),
        ],
        "reasons string",
    )
    got = [
        r["t"]
        for r in df.select(
            rules.classify_alert_type(F.col("reasons")).alias("t")
        ).collect()
    ]
    assert got == [
        "SQL Injection",
        "Data Leakage",
        "Security Violation",  # unreachable DoS branch, preserved
        "Security Violation",
    ]


def test_status_inference(spark):
    assert _one(
        spark, scalars.infer_operation_status(F.lit("select ERROR from t"))
    ) == "Failed"
    assert _one(
        spark, scalars.infer_operation_status(F.lit("select ok"))
    ) == "Success"
    assert _one(spark, scalars.infer_operation_status(F.lit(None))) == "Success"
