"""CHECK-style domain validation (schemas.py's ENUM replacement).

MySQL ENUMs silently coerce bad values to '' — this validator instead
surfaces violations as data: one pass over the frame produces
per-column violation counts (cheap conditional sums) and, on demand, a
violations frame for quarantine. Used at ingest boundaries; at scale
it's one extra projection on a scan that's already happening.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas

# table → {column: allowed values}
DOMAINS: dict[str, dict[str, tuple[str, ...]]] = {
    "users": {
        "role": schemas.ROLES,
        "account_status": schemas.ACCOUNT_STATUSES,
    },
    "activity_logs": {
        "operation_type": schemas.OPERATION_TYPES,
        "operation_status": schemas.OPERATION_STATUSES,
        "severity_level": schemas.SEVERITY_ORDER,
    },
    "security_alerts": {
        "severity": schemas.SEVERITY_ORDER,
        "status": schemas.ALERT_STATUSES,
    },
    "compliance_logs": {
        "standard": schemas.COMPLIANCE_STANDARDS,
        "status": schemas.COMPLIANCE_STATUSES,
    },
    "firewall_rules": {
        "match_type": schemas.FIREWALL_MATCH_TYPES,
        "action": schemas.FIREWALL_ACTIONS,
    },
}


def domain_violation_counts(df: DataFrame, table: str) -> DataFrame:
    """One-row frame: per constrained column, how many non-null values
    fall outside the declared domain. count() (not sum) so an EMPTY
    frame reports 0, not NULL — this runs on micro-batches that may be
    empty."""
    domains = DOMAINS[table]
    aggs = [
        F.count(
            F.when(F.col(c).isNotNull() & ~F.col(c).isin(*allowed), 1)
        ).alias(f"bad_{c}")
        for c, allowed in domains.items()
        if c in df.columns
    ]
    if not aggs:
        raise ValueError(
            f"frame has none of {table!r}'s constrained columns "
            f"{sorted(DOMAINS[table])}"
        )
    return df.agg(*aggs)


def domain_violations(df: DataFrame, table: str) -> DataFrame:
    """Rows violating any domain, with a reasons array — the quarantine
    frame for an ingest dead-letter sink."""
    domains = {c: a for c, a in DOMAINS[table].items() if c in df.columns}
    reasons = F.array(
        *[
            F.when(
                F.col(c).isNotNull() & ~F.col(c).isin(*allowed),
                F.concat(F.lit(f"{c} not in domain: "), F.col(c)),
            )
            for c, allowed in domains.items()
        ]
    )
    out = df.withColumn(
        "violations", F.filter(reasons, lambda x: x.isNotNull())
    )
    return out.filter(F.size("violations") > 0)
