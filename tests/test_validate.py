from __future__ import annotations

from database_activity_monitoring_dam_system_spark.operators import validate
from database_activity_monitoring_dam_system_spark.plans.dam import _battery

from .conftest import SF_SMOKE


def test_engine_output_is_domain_clean(spark):
    """The battery's own output must satisfy the declared domains."""
    checked = _battery(spark, SF_SMOKE)
    row = validate.domain_violation_counts(checked, "activity_logs").first()
    assert all(v == 0 for v in row.asDict().values())


def test_violations_are_surfaced(spark):
    df = spark.createDataFrame(
        [
            (1, "SELECT", "Success", "Low"),
            (2, "FROBNICATE", "Success", "Low"),
            (3, "SELECT", "Maybe", "Apocalyptic"),
            (4, None, None, None),  # NULLs are not domain violations
        ],
        "activity_id long, operation_type string, operation_status string, "
        "severity_level string",
    )
    counts = validate.domain_violation_counts(df, "activity_logs").first()
    assert counts["bad_operation_type"] == 1
    assert counts["bad_operation_status"] == 1
    assert counts["bad_severity_level"] == 1
    bad = {
        r.activity_id: sorted(r.violations)
        for r in validate.domain_violations(df, "activity_logs").collect()
    }
    assert set(bad) == {2, 3}
    assert bad[2] == ["operation_type not in domain: FROBNICATE"]
    assert len(bad[3]) == 2
