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


def table_checksum(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Order-independent content fingerprint of a table — the
    replication / migration verification primitive: two copies are
    value-identical (as multisets) iff their digests match, WITHOUT
    sorting or shipping either side (compare one 3-number row, not
    2xN rows).

    Per row: md5 over the '|'-joined string forms of ``cols``
    (sorted column order, so projections with reordered columns
    agree), each value LENGTH-PREFIXED (``len:value``, NULL → ``N``)
    — a bare join is delimiter-injectable (('a|b','c') and
    ('a','b|c') would hash identically, a systematic false
    "replication verified"), while length prefixes pin every
    boundary. The leading 12 hex chars parse to a 48-bit integer. The table digest is (row count, SUM of those integers,
    their MAX) — sum and max are commutative and associative, so the
    digest is partition- and row-order-independent and merges
    shard-by-shard. The sum accumulates in DECIMAL(38,0): a bigint
    sum of 48-bit values wraps past 2^15 rows-worth of headroom
    (caught by measurement at sf0.1 — ANSI mode raised
    ARITHMETIC_OVERFLOW at 100 k rows), while the decimal
    accumulator stays exact beyond 10^23 rows; every input is an
    exact integer, so the digest hashes identically cross-engine.
    The accumulator stays INTERNAL: ``sum_h48`` is emitted as its
    plain-digit STRING rendering, because DECIMAL output columns are
    client-rendering-unstable (the round-7 driver canonicalized
    Spark's and DuckDB's DECIMAL(38,0) differently despite
    value-identical digests at three scale factors — it was the
    registry's only DecimalType output). Digests compare as strings;
    shard merge parses them back with int().

    A multiset DIFFERENCE can cancel in the sum alone (sum+max is a
    probabilistic equality check, like any checksum); adversarial
    settings should compare per-bucket sub-digests instead (group
    the same 48-bit integers by a hash prefix and compare the
    bounded digest table)."""
    use = sorted(cols or df.columns)

    def token(c: str):
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s)
        )

    joined = F.concat_ws("|", *[token(c) for c in use])
    h48 = F.conv(F.substring(F.md5(joined), 1, 12), 16, 10).cast("long")
    return df.select(h48.alias("_h")).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("_h").cast("decimal(38,0)"))
        .cast("string")
        .alias("sum_h48"),
        F.max("_h").alias("max_h48"),
    )


def checksum_token_sql(col_sql: str) -> str:
    """The DuckDB-dialect twin of table_checksum's length-prefixed
    value token, generated from ONE place so the oracle can never
    drift from the implementation (the morton_terms discipline).
    ``col_sql`` must already be VARCHAR-typed SQL (cast at the call
    site, where the column's type is known)."""
    return (
        f"CASE WHEN {col_sql} IS NULL THEN 'N' "
        f"ELSE length({col_sql})::VARCHAR || ':' || {col_sql} END"
    )
