"""DAM-domain plans over the ``events`` testdata table.

Each entry maps a SURVEY.md §2 operator onto the deterministic
events→activity derivation (plans/events_activity.py) and pairs it with
a DuckDB oracle built from the same CTE. The oracle severity logic is
the CLOSED FORM of the reference's sequential overwrites, while the
Spark side replays the sequential semantics — agreement of the two
formulations is itself a cross-check of the battery logic.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import (
    analytics,
    anomaly,
    asof,
    cascade,
    geo,
    rangejoin,
    rules,
    sessions,
)
from ..sources.testdata import load_table
from .events_activity import ACTIVITY_CTE, BLACKLISTED_IPS, derive_activity
from .spec import QuerySpec, sql_values

ANCHOR_SQL = "(SELECT max(ts) FROM events)"


_ANCHOR_CACHE: dict[str, dt.datetime] = {}


def clear_anchor_cache() -> None:
    """Invalidate cached anchors (only needed if a dataset under a
    previously-queried path is regenerated within this process)."""
    _ANCHOR_CACHE.clear()


def _anchor(spark: SparkSession, sf_dir: str) -> dt.datetime:
    """Deterministic 'now' = max event time (FIXTURES.md decision #6).

    One column-pruned scan resolved from parquet footer statistics —
    negligible even at 100 TB. Cached per canonical path (the testdata
    is immutable, TESTDATA.md) so battery-composed queries don't re-run
    the scan on every invocation."""
    import os

    key = os.path.realpath(sf_dir)
    if key not in _ANCHOR_CACHE:
        events = load_table(spark, sf_dir, "events")
        _ANCHOR_CACHE[key] = events.agg(F.max("ts")).first()[0]
    return _ANCHOR_CACHE[key]


_FRAME_CACHE: dict[tuple[str, str], DataFrame] = {}

# Index-like _shared kinds: expensive artifacts a real deployment
# builds once per corpus snapshot and PERSISTS — a restarted serving
# process should load them from disk, not recompute. Battery/activity
# derivations stay memory-only (they are cheap scans, not indexes).
_DISK_KINDS = frozenset(
    {
        "dedup_clusters", "emb_near_dups", "ivf_pq_codes",
        "ivf_pq_res_codes", "hnsw_index",
    }
)


def _kind_version(kind: str) -> str:
    """Derivation-algorithm version token baked into the artifact
    path.  ``emb_near_dups`` is keyed under the LSH hyperplane family
    fingerprint: when the sign family changes (as it did in round 11,
    single-multiply parity → splitmix64 avalanche), artifacts built
    under the old family land at a different path and are rebuilt
    instead of loading cleanly and silently mismatching fresh builds
    and regenerated oracles.  Kinds whose derivation is pinned by the
    corpus alone carry no token."""
    if kind == "emb_near_dups":
        from ..operators.similarity import hyperplane_family_fingerprint

        return "_hp" + hyperplane_family_fingerprint()
    return ""


def _index_path(kind: str, sf_dir: str) -> str | None:
    """Under SPARK_DAM_INDEX_DIR, the parquet location for a persisted
    index artifact of ``kind`` over the corpus at ``sf_dir``."""
    import hashlib
    import os

    idx_dir = os.environ.get("SPARK_DAM_INDEX_DIR")
    if not idx_dir:
        return None
    real = os.path.realpath(sf_dir)
    slug = hashlib.md5(real.encode()).hexdigest()[:10]
    return os.path.join(
        idx_dir,
        f"{kind}{_kind_version(kind)}__{os.path.basename(real)}_{slug}",
    )


def _shared(
    kind: str,
    spark: SparkSession,
    sf_dir: str,
    build,
    expect_rows: int | None = None,
) -> DataFrame:
    """Optionally share one persisted frame per (kind, sf_dir).

    Many gates compose the same activity/battery derivation; under
    SPARK_DAM_SHARE_FRAMES=1 (set by bench.py) the first builder call
    persists the frame and later gates reuse the in-memory relation —
    the materialized-view pattern a serving deployment would use. OFF
    by default so the correctness driver and the plan-invariant tests
    see the raw, un-cached plans.

    Index-like kinds (_DISK_KINDS) additionally survive process
    restarts when SPARK_DAM_INDEX_DIR is set: the first build writes
    the artifact as parquet there, and a fresh process loads it
    instead of rebuilding (same contract as similarity.save_ivf_index
    for the IVF quantizer). ``expect_rows`` is the staleness
    fingerprint for disk loads (same contract as the quantizer's
    ``expect_n``): a disk artifact whose row count differs — a
    regenerated corpus at the same path — is rebuilt and overwritten
    instead of silently serving the old corpus's answers. Checked
    once per process (the in-memory cache hit skips it).
    """
    import os

    if os.environ.get("SPARK_DAM_SHARE_FRAMES") != "1":
        return build()
    key = (kind, os.path.realpath(sf_dir))
    df = _FRAME_CACHE.get(key)
    if df is not None and df.sparkSession is spark:
        return df
    from .. import ckpt as _ckpt

    # a cached frame outlives the building gate, so any checkpoint its
    # lineage pins must NOT be released by the gate-scoped lifecycle —
    # evicted persist() blocks would recompute into a freed checkpoint
    with _ckpt.suppressed():
        path = _index_path(kind, sf_dir) if kind in _DISK_KINDS else None
        if path is not None:
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                build().write.mode("overwrite").parquet(path)
            df = spark.read.parquet(path).persist()
            if expect_rows is not None and df.count() != expect_rows:
                df.unpersist()
                build().write.mode("overwrite").parquet(path)
                df = spark.read.parquet(path).persist()
        else:
            df = build().persist()
    _FRAME_CACHE[key] = df
    return df


def _activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared(
        "activity", spark, sf_dir,
        lambda: derive_activity(load_table(spark, sf_dir, "events")),
    )


def _blacklist_df(spark: SparkSession, now: dt.datetime) -> DataFrame:
    """Literal ip_blacklist dim: live rows (expiry after anchor) are the
    oracle's IN-list; one expired row exercises the expiry filter."""
    live = [(i + 1, ip, "fixture", now - dt.timedelta(days=5), now + dt.timedelta(days=1))
            for i, ip in enumerate(BLACKLISTED_IPS)]
    expired = [(99, "10.0.0.20", "expired fixture",
                now - dt.timedelta(days=5), now - dt.timedelta(days=1))]
    return spark.createDataFrame(
        live + expired,
        "ip_id long, ip_address string, reason string, "
        "created_at timestamp, expires_at timestamp",
    )


def _battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        now = _anchor(spark, sf_dir)
        return rules.apply_rule_battery(
            _activity(spark, sf_dir),
            users=None,  # role already derived on the frame
            ip_blacklist=_blacklist_df(spark, now),
            now=now,
        )

    return _shared("battery", spark, sf_dir, build)


# ── oracle SQL builders ────────────────────────────────────────────────────

_IN_BLACKLIST = "(" + ", ".join(f"'{ip}'" for ip in BLACKLISTED_IPS) + ")"
_SENSITIVE_TABLES = "(" + ", ".join(f"'{t}'" for t in rules.SENSITIVE_TABLES) + ")"

_INJ_CASE = "CASE " + " ".join(
    f"WHEN regexp_matches(ql, '(?i){p}') THEN '{d}'"
    for p, d in rules.SUSPICIOUS_QUERY_PATTERNS
) + " END"

_COL_FLAGS = ", ".join(
    f"contains(ql, '{c}') AS c_{i}" for i, c in enumerate(rules.SENSITIVE_COLUMNS)
)
_ANY_COL = " OR ".join(f"c_{i}" for i in range(len(rules.SENSITIVE_COLUMNS)))
_COL_REASONS = ", ".join(
    f"CASE WHEN c_{i} THEN 'Access to sensitive column: {c}' END"
    for i, c in enumerate(rules.SENSITIVE_COLUMNS)
)


def battery_sql(select_clause: str) -> str:
    """Full battery oracle; caller supplies the final SELECT over the
    ``checked`` CTE (columns: activity, r1..r8, inj_desc, is_suspicious,
    severity_level, suspicious_reasons, queries_last_min)."""
    return f"""
WITH {ACTIVITY_CTE},
rated AS (
  SELECT a.*,
    count(*) OVER (
      PARTITION BY user_id
      ORDER BY CAST(floor(epoch(access_timestamp)) AS BIGINT)
      RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS queries_last_min,
    lower(coalesce(operation_details, '')) AS ql
  FROM activity a
),
flags AS (
  SELECT *,
    (ip_address IN {_IN_BLACKLIST}) AS r1,
    (role = 'Guest' AND operation_type IN ('INSERT','UPDATE','DELETE','DROP','ALTER')) AS r2,
    (role = 'User' AND table_name IN {_SENSITIVE_TABLES}
       AND operation_type IN ('SELECT','INSERT','UPDATE')) AS r3,
    (hour(access_timestamp) < {rules.WORKING_HOURS_START}
       OR hour(access_timestamp) >= {rules.WORKING_HOURS_END}) AS r4,
    {_INJ_CASE} AS inj_desc,
    {_COL_FLAGS},
    (rows_affected IS NOT NULL AND rows_affected > {rules.LARGE_EXTRACTION_ROWS}) AS r7,
    (user_id IS NOT NULL AND user_id != 0
       AND queries_last_min > {rules.MAX_QUERIES_PER_MIN}) AS r8
  FROM rated
),
flags2 AS (
  SELECT *, (inj_desc IS NOT NULL) AS r5, ({_ANY_COL}) AS r6 FROM flags
),
checked AS (
  SELECT *,
    (r1 OR r2 OR r3 OR r4 OR r5 OR r6 OR r7 OR r8) AS is_suspicious,
    CASE WHEN r5 OR (r1 AND NOT r2) THEN 'Critical'
         WHEN r6 OR r2 THEN 'High'
         WHEN r3 OR r4 THEN 'Medium'
         WHEN r7 THEN 'High'
         WHEN r8 THEN 'Medium'
         ELSE 'Low' END AS severity_level,
    CASE WHEN (r1 OR r2 OR r3 OR r4 OR r5 OR r6 OR r7 OR r8) THEN concat_ws('; ',
      CASE WHEN r1 THEN 'IP address is blacklisted' END,
      CASE WHEN r2 THEN 'Guest attempting write operation' END,
      CASE WHEN r3 THEN 'User accessing sensitive table: ' || table_name END,
      CASE WHEN r4 THEN 'Access outside working hours' END,
      CASE WHEN r5 THEN 'Suspicious pattern: ' || inj_desc END,
      {_COL_REASONS},
      CASE WHEN r7 THEN 'Large data extraction: ' || CAST(rows_affected AS VARCHAR) || ' rows' END,
      CASE WHEN r8 THEN 'Rate limit exceeded: ' || CAST(queries_last_min AS VARCHAR) || ' queries/min' END
    ) END AS suspicious_reasons
  FROM flags2
)
{select_clause}
"""


def activity_sql(select_clause: str) -> str:
    return f"WITH {ACTIVITY_CTE}\n{select_clause}"


# ── gate queries ───────────────────────────────────────────────────────────

def _q_rule_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _battery(spark, sf_dir).select(
        "activity_id", "is_suspicious", "severity_level", "suspicious_reasons"
    )


def _q_security_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rules.derive_alerts(_battery(spark, sf_dir))


def _q_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rules.compliance_findings(_activity(spark, sf_dir))


FIREWALL_RULES_FIXTURE = [
    (1, "union select", "Block UNION injection", "contains", "block", 1, None, None, True),
    (2, r"sleep\s*\(", "Block sleep payloads", "regex", "block", 2, None, None, True),
    (3, "delete from", "Alert on deletes", "starts_with", "alert", 3, None, None, True),
    (4, "credit_cards", "Card access by user_3", "contains", "alert", 4, "user_3", None, True),
    (5, "from", "Any query from 10.0.0.5", "contains", "alert", 5, None, "10.0.0.5", True),
    (6, "truncate", "Inactive rule", "contains", "block", 0, None, None, False),
    (7, "salary", "Salary mention", "contains", "alert", 3, None, None, True),
]

_RULES_SCHEMA = (
    "rule_id long, pattern string, description string, match_type string, "
    "action string, priority int, applies_to_user string, applies_to_ip string, "
    "is_active boolean"
)


_RULES_FIELDS = [
    "rule_id", "pattern", "description", "match_type", "action",
    "priority", "applies_to_user", "applies_to_ip", "is_active",
]


def _q_firewall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the rule battery is a driver-side constant: feed it straight to
    # the rows entry point — the previous createDataFrame + collect
    # round-trip of a 7-row dimension cost ~0.5 s PER CALL (measured),
    # pure construction tax on a zero-shuffle gate (guide §1.1)
    rule_rows = [
        dict(zip(_RULES_FIELDS, tup)) for tup in FIREWALL_RULES_FIXTURE
    ]
    out = rules.firewall_check_rows(
        _activity(spark, sf_dir), rule_rows, rule_id_type="bigint"
    )
    return out.select("activity_id", "rule_id", "action")


_FIREWALL_SQL_RULES = sql_values(
    [r for r in FIREWALL_RULES_FIXTURE],
    "r",
    ["rule_id", "pattern", "description", "match_type", "action",
     "priority", "applies_to_user", "applies_to_ip", "is_active"],
)

_FIREWALL_SQL = f"""
WITH {ACTIVITY_CTE},
rules AS (SELECT * FROM {_FIREWALL_SQL_RULES}),
matched AS (
  SELECT a.activity_id, r.rule_id, r.action,
         row_number() OVER (
           PARTITION BY a.activity_id
           ORDER BY r.priority ASC, r.rule_id ASC) AS rn
  FROM activity a
  LEFT JOIN rules r
    ON r.is_active
   AND (r.applies_to_user IS NULL OR r.applies_to_user = a.username)
   AND (r.applies_to_ip IS NULL OR r.applies_to_ip = a.ip_address)
   AND (CASE WHEN r.match_type = 'contains'
               THEN contains(lower(coalesce(a.operation_details,'')), lower(r.pattern))
             WHEN r.match_type = 'starts_with'
               THEN starts_with(lower(coalesce(a.operation_details,'')), lower(r.pattern))
             ELSE regexp_matches(lower(coalesce(a.operation_details,'')), '(?i)' || r.pattern)
        END)
)
SELECT activity_id, CAST(rule_id AS BIGINT) AS rule_id, action
FROM matched WHERE rn = 1
"""


def _q_blacklist_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    now = _anchor(spark, sf_dir)
    hits = rules.blacklist_matches(
        _activity(spark, sf_dir), _blacklist_df(spark, now), now=now
    )
    return hits.groupBy("ip_address").agg(F.count("*").alias("cnt"))


_BLACKLIST_SQL = activity_sql(f"""
SELECT ip_address, count(*) AS cnt FROM activity
WHERE ip_address IN {_IN_BLACKLIST}
GROUP BY ip_address
""")


def _q_activity_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    now = _anchor(spark, sf_dir)
    return analytics.activity_stats(_battery(spark, sf_dir), now=now)


_KPIS_SQL = battery_sql(f"""
SELECT count(*) AS total_activities,
       CAST(sum(CASE WHEN is_suspicious THEN 1 ELSE 0 END) AS BIGINT) AS suspicious_count,
       CAST(sum(CASE WHEN operation_status = 'Failed' THEN 1 ELSE 0 END) AS BIGINT) AS failed_count,
       CAST(sum(CASE WHEN CAST(access_timestamp AS DATE) = CAST({ANCHOR_SQL} AS DATE) THEN 1 ELSE 0 END) AS BIGINT) AS today_count,
       CAST(sum(CASE WHEN severity_level = 'Low' THEN 1 ELSE 0 END) AS BIGINT) AS sev_low,
       CAST(sum(CASE WHEN severity_level = 'Medium' THEN 1 ELSE 0 END) AS BIGINT) AS sev_medium,
       CAST(sum(CASE WHEN severity_level = 'High' THEN 1 ELSE 0 END) AS BIGINT) AS sev_high,
       CAST(sum(CASE WHEN severity_level = 'Critical' THEN 1 ELSE 0 END) AS BIGINT) AS sev_critical
FROM checked
""")


def _q_operations_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.operations_by_type(_activity(spark, sf_dir))


_OPS_BY_TYPE_SQL = activity_sql(
    "SELECT operation_type, count(*) AS cnt FROM activity GROUP BY operation_type"
)


def _q_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.top_users(_activity(spark, sf_dir), k=5)


_TOP_USERS_SQL = activity_sql("""
SELECT username, count(*) AS cnt FROM activity
GROUP BY username ORDER BY cnt DESC, username ASC LIMIT 5
""")


def _q_hourly_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    now = _anchor(spark, sf_dir)
    return analytics.hourly_timeline(_battery(spark, sf_dir), hours=48, now=now)


_TIMELINE_SQL = battery_sql(f"""
SELECT strftime(date_trunc('hour', access_timestamp), '%Y-%m-%d %H:00') AS time_bucket,
       count(*) AS total,
       CAST(sum(CASE WHEN is_suspicious THEN 1 ELSE 0 END) AS BIGINT) AS suspicious,
       CAST(sum(CASE WHEN operation_status = 'Failed' THEN 1 ELSE 0 END) AS BIGINT) AS failed
FROM checked
WHERE access_timestamp >= {ANCHOR_SQL} - INTERVAL 48 HOUR
GROUP BY 1 ORDER BY 1
""")


def _q_behavior_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    now = _anchor(spark, sf_dir)
    return analytics.user_behavior_profile(
        _activity(spark, sf_dir), user_id=3, days=7, now=now
    )


_BEHAVIOR_SQL = activity_sql(f"""
SELECT CAST(hour(access_timestamp) AS INTEGER) AS hour, operation_type,
       count(*) AS cnt
FROM activity
WHERE user_id = 3 AND access_timestamp >= {ANCHOR_SQL} - INTERVAL 7 DAY
GROUP BY 1, 2 ORDER BY 1, 2
""")


def _q_behavior_peak_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 with the CORRECTED (summed) semantics — FIXTURES decision #1."""
    now = _anchor(spark, sf_dir)
    prof = analytics.user_behavior_profile(
        _activity(spark, sf_dir), user_id=3, days=7, now=now
    )
    return prof.groupBy("hour").agg(F.sum("cnt").alias("activity_cnt"))


_PEAK_HOURS_SQL = activity_sql(f"""
SELECT CAST(hour(access_timestamp) AS INTEGER) AS hour,
       count(*) AS activity_cnt
FROM activity
WHERE user_id = 3 AND access_timestamp >= {ANCHOR_SQL} - INTERVAL 7 DAY
GROUP BY 1
""")


def _q_recent_activities(spark: SparkSession, sf_dir: str) -> DataFrame:
    now = _anchor(spark, sf_dir)
    latest = analytics.latest_activities(
        _activity(spark, sf_dir), None,
        limit=50, database="pay", time_range_hours=72, now=now,
    )
    return latest.select(
        "activity_id", "username", "operation_type", "table_name",
        "operation_status", "ip_address", "access_timestamp",
    )


_RECENT_SQL = activity_sql(f"""
SELECT activity_id, username, operation_type, table_name,
       operation_status, ip_address, access_timestamp
FROM activity
WHERE contains(table_name, 'pay')
  AND access_timestamp >= {ANCHOR_SQL} - INTERVAL 72 HOUR
ORDER BY access_timestamp DESC, activity_id DESC LIMIT 50
""")


def _q_latest_critical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 aliasing parity: UI filter 'Critical' means is_suspicious flag,
    NOT severity_level='Critical' (app.py:273-275)."""
    now = _anchor(spark, sf_dir)
    latest = analytics.latest_activities(
        _battery(spark, sf_dir), None, limit=50, severity="Critical", now=now
    )
    return latest.select("activity_id", "severity_level", "access_timestamp")


_LATEST_CRITICAL_SQL = battery_sql("""
SELECT activity_id, severity_level, access_timestamp
FROM checked WHERE is_suspicious
ORDER BY access_timestamp DESC, activity_id DESC LIMIT 50
""")


def _q_impossible_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    now = _anchor(spark, sf_dir)
    return anomaly.impossible_travel(
        _activity(spark, sf_dir), now=now, window_hours=744, op="SELECT"
    )


_IMPOSSIBLE_SQL = activity_sql(f"""
SELECT username, access_timestamp AS login_ts, ip_address,
       lag(ip_address) OVER w AS prev_ip,
       lag(access_timestamp) OVER w AS prev_ts
FROM activity
WHERE operation_type = 'SELECT'
  AND access_timestamp >= {ANCHOR_SQL} - INTERVAL 744 HOUR
WINDOW w AS (PARTITION BY username ORDER BY access_timestamp ASC, activity_id ASC)
QUALIFY prev_ip IS NOT NULL AND prev_ip != ip_address
""")


def _q_rate_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — exact trailing-30-min per-user counts via range frame."""
    counted = anomaly.trailing_window_counts(
        _activity(spark, sf_dir), seconds=1800, user_col="user_id",
        out_col="cnt",
    )
    return counted.filter(F.col("cnt") >= 2).select("activity_id", "user_id", "cnt")


_RATE_WINDOW_SQL = activity_sql("""
SELECT activity_id, user_id, cnt FROM (
  SELECT activity_id, user_id,
         count(*) OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(epoch(access_timestamp)) AS BIGINT)
           RANGE BETWEEN 1799 PRECEDING AND CURRENT ROW) AS cnt
  FROM activity
) WHERE cnt >= 2
""")


def _q_anomaly_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = anomaly.user_hourly_baseline(_activity(spark, sf_dir))
    return base.select(
        "user_id",
        F.round("avg_queries", 4).alias("avg_queries"),
        F.round("std_queries", 4).alias("std_queries"),
    )


_BASELINE_SQL = activity_sql("""
SELECT user_id,
       round(avg(queries_per_hour), 4) AS avg_queries,
       round(stddev_pop(queries_per_hour), 4) AS std_queries
FROM (
  SELECT user_id, CAST(access_timestamp AS DATE) AS day,
         hour(access_timestamp) AS hour, count(*) AS queries_per_hour
  FROM activity WHERE user_id IS NOT NULL
  GROUP BY 1, 2, 3
)
GROUP BY user_id
""")


def _q_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anomaly.volume_anomalies(_activity(spark, sf_dir))


_VOLUME_SQL = f"""
WITH {ACTIVITY_CTE},
per_hour AS (
  SELECT user_id, CAST(access_timestamp AS DATE) AS day,
         hour(access_timestamp) AS hour, count(*) AS queries_per_hour
  FROM activity WHERE user_id IS NOT NULL GROUP BY 1, 2, 3
),
baseline AS (
  SELECT user_id, avg(queries_per_hour) AS avg_queries,
         stddev_pop(queries_per_hour) AS std_queries
  FROM per_hour GROUP BY user_id
),
hourly AS (
  SELECT user_id, date_trunc('hour', access_timestamp) AS hour_bucket,
         count(*) AS cnt
  FROM activity WHERE user_id IS NOT NULL GROUP BY 1, 2
)
SELECT h.user_id, h.hour_bucket, h.cnt,
       round(b.avg_queries, 4) AS avg_queries,
       round(b.std_queries, 4) AS std_queries
FROM hourly h JOIN baseline b ON h.user_id = b.user_id
WHERE h.cnt > b.avg_queries
      + 3 * coalesce(CASE WHEN b.std_queries != 0 THEN b.std_queries END, 1.0)
"""


def _q_robust_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anomaly.robust_volume_anomalies(_activity(spark, sf_dir))


_ROBUST_VOLUME_SQL = f"""
WITH {ACTIVITY_CTE},
per_hour AS (
  SELECT user_id, CAST(access_timestamp AS DATE) AS day,
         hour(access_timestamp) AS hour, count(*) AS queries_per_hour
  FROM activity WHERE user_id IS NOT NULL GROUP BY 1, 2, 3
),
med AS (
  SELECT user_id, median(queries_per_hour) AS med_queries
  FROM per_hour GROUP BY user_id
),
robust AS (
  SELECT p.user_id, min(m.med_queries) AS med_queries,
         median(abs(p.queries_per_hour - m.med_queries)) AS mad_queries
  FROM per_hour p JOIN med m ON p.user_id = m.user_id
  GROUP BY p.user_id
),
hourly AS (
  SELECT user_id, date_trunc('hour', access_timestamp) AS hour_bucket,
         count(*) AS cnt
  FROM activity WHERE user_id IS NOT NULL GROUP BY 1, 2
)
SELECT h.user_id, h.hour_bucket, h.cnt,
       round(b.med_queries, 4) AS med_queries,
       round(b.mad_queries, 4) AS mad_queries
FROM hourly h JOIN robust b ON h.user_id = b.user_id
WHERE h.cnt > b.med_queries
      + 4.4478 * coalesce(CASE WHEN b.mad_queries != 0
                               THEN b.mad_queries END, 1.0)
"""


def _q_rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-user trailing-25-event median of the event value
    (integer millis → every interpolated midpoint an exact 0.5
    multiple). A8's robust-statistics sibling: the trailing COUNT
    window generalized to an order statistic."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 1000).cast("long").alias("millis"),
    )
    return anomaly.rolling_median(
        base,
        value_col="millis",
        partition_cols=["user_id"],
        order_cols=["ts", "event_id"],
        frame_rows=25,
        out_col="rolling_med",
    ).select("event_id", "user_id", "millis", "rolling_med")


_ROLLING_MEDIAN_SQL = """
SELECT event_id, user_id, millis,
       median(millis) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 24 PRECEDING AND CURRENT ROW) AS rolling_med
FROM (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 1000) AS BIGINT) AS millis
  FROM events
)
"""


def _q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-class JSON scalar path: parse events.props (SURVEY.md §1.3 JSON
    row) and aggregate — stays JVM-side via get_json_object."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn(
            "k", F.get_json_object("props", "$.k").cast("int")
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg("k"), 3).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


_JSON_PROPS_SQL = """
SELECT event_type, count(*) AS cnt,
       round(avg(k), 3) AS avg_k, max(k) AS max_k
FROM (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
)
GROUP BY event_type
"""


GEO_COUNTRIES = ("US", "DE", "IN", "BR", "JP", "FR", "AU")
_GEO_ROWS = [
    (f"10.0.0.{n}", GEO_COUNTRIES[n % len(GEO_COUNTRIES)]) for n in range(30)
]


def _q_geo_top_countries(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = spark.createDataFrame(_GEO_ROWS, "ip_address string, country string")
    return geo.top_countries(_activity(spark, sf_dir), dim, k=10)


_GEO_SQL = f"""
WITH {ACTIVITY_CTE},
geo AS (SELECT * FROM {sql_values([list(r) for r in _GEO_ROWS], "g", ["ip_address", "country"])})
SELECT country, count(*) AS cnt
FROM activity JOIN geo USING (ip_address)
GROUP BY country ORDER BY cnt DESC, country ASC LIMIT 10
"""


def _q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessions.session_stats(_activity(spark, sf_dir), gap="30 minutes")


_SESSION_SQL = f"""
WITH {ACTIVITY_CTE},
seq AS (
  SELECT user_id, access_timestamp,
         CASE WHEN access_timestamp - lag(access_timestamp) OVER w
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM activity WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY access_timestamp)
),
islands AS (
  SELECT user_id, access_timestamp,
         sum(new_s) OVER (
           PARTITION BY user_id ORDER BY access_timestamp
           ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
)
SELECT user_id,
       min(access_timestamp) AS session_start,
       count(*) AS n_events,
       CAST(floor(epoch(max(access_timestamp)))
            - floor(epoch(min(access_timestamp))) AS BIGINT) AS duration_sec
FROM islands GROUP BY user_id, sid
"""


def _q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation — absent from the reference, free in Spark
    (SURVEY.md §2.4 note); exact form is oracle-checkable."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count("*").alias("cnt"),
    )


_DISTINCT_SQL = """
SELECT event_type, count(DISTINCT user_id) AS distinct_users, count(*) AS cnt
FROM events GROUP BY event_type
"""


def _q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (another free Spark
    aggregate the reference lacks); approx_percentile is the sketch
    variant for 100 TB — exact form used here for oracle parity."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.min("value"), 4).alias("v_min"),
        F.round(F.max("value"), 4).alias("v_max"),
    )


_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(min(value), 4) AS v_min,
       round(max(value), 4) AS v_max
FROM events GROUP BY event_type
"""


def _q_asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of backward join: for every purchase, the user's most recent
    error at-or-before it (the time-series 'last known value' join)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    return asof.asof_join_backward(
        purchases, errors, on=["user_id"], ts_col="ts", carry_cols=["value"]
    )


_ASOF_SQL = """
SELECT l.event_id, l.user_id, l.ts,
       r.ts AS ts_asof, r.value AS value_asof
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def _q_asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: for every purchase, the user's
    EARLIEST error at-or-after it, but only within one hour — the
    'did an error follow this action' probe. The oracle states the
    same thing as a bounded theta join + argmin; the engine plan is
    the union-and-carry scan (one shuffle, no candidate pairs)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    out = asof.asof_join(
        purchases, errors, on=["user_id"], ts_col="ts",
        carry_cols=["value"], direction="forward",
        tolerance_seconds=3600,
    )
    return out.select(
        "event_id", "user_id", "ts", "ts_asof",
        F.round("value_asof", 6).alias("value_asof"),
    )


_ASOF_FWD_SQL = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'error'
),
j AS (
  SELECT l.event_id, r.ts AS rts, r.value,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY r.ts ASC, r.value DESC) AS rn
  FROM l JOIN r ON l.user_id = r.user_id
   AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
)
SELECT l.event_id, l.user_id, l.ts,
       j.rts AS ts_asof, round(j.value, 6) AS value_asof
FROM l LEFT JOIN (SELECT event_id, rts, value FROM j WHERE rn = 1) j
  ON l.event_id = j.event_id
"""


def _q_asof_nearest_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of with tolerance: each purchase matched to its
    temporally CLOSEST error within two hours, exact distance ties
    preferring the backward (already-known) row. The oracle ranks a
    bounded theta join by (distance, backward-first, payload) — the
    same pinned arbitration the engine's two-carry comparison makes."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    out = asof.asof_join(
        purchases, errors, on=["user_id"], ts_col="ts",
        carry_cols=["value"], direction="nearest",
        tolerance_seconds=7200,
    )
    return out.select(
        "event_id", "user_id", "ts", "ts_asof",
        F.round("value_asof", 6).alias("value_asof"),
    )


_ASOF_NEAREST_SQL = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'error'
),
j AS (
  SELECT l.event_id, r.ts AS rts, r.value,
         row_number() OVER (
           PARTITION BY l.event_id
           ORDER BY abs(epoch_us(l.ts) - epoch_us(r.ts)) ASC,
                    CASE WHEN r.ts <= l.ts THEN 1 ELSE 0 END DESC,
                    r.value DESC) AS rn
  FROM l JOIN r ON l.user_id = r.user_id
   AND r.ts >= l.ts - INTERVAL 2 HOUR AND r.ts <= l.ts + INTERVAL 2 HOUR
)
SELECT l.event_id, l.user_id, l.ts,
       j.rts AS ts_asof, round(j.value, 6) AS value_asof
FROM l LEFT JOIN (SELECT event_id, rts, value FROM j WHERE rn = 1) j
  ON l.event_id = j.event_id
"""


def _q_activity_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (operation_type, role) — all four grouping levels in
    one pass (engine extension; reference's dashboards would need 4
    queries). grouping_id disambiguates a NULL group key from the
    all-rows subtotal. One shuffle; Spark expands the cube map-side."""
    act = _activity(spark, sf_dir)
    return (
        act.cube("operation_type", "role")
        .agg(F.count("*").alias("cnt"), F.grouping_id().alias("gid"))
    )


_ACTIVITY_CUBE_SQL = activity_sql("""
SELECT operation_type, role, count(*) AS cnt,
       CAST(GROUPING(operation_type, role) AS BIGINT) AS gid
FROM activity GROUP BY CUBE (operation_type, role)
""")


def _q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bin-bucketing: 24 synthetic 90-minute maintenance
    windows (every 6 h back from the anchor) matched against the event
    stream — per-window traffic during maintenance. The oracle states
    the same thing as a plain theta join; the Spark plan is the
    equi-join rewrite (operators/rangejoin.py), which is the part
    that survives 100 TB."""
    now = _anchor(spark, sf_dir)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    rows = []
    for i in range(24):
        start = now - dt.timedelta(hours=6 * i + 2)
        rows.append((i, start, start + dt.timedelta(minutes=90)))
    windows = spark.createDataFrame(
        rows, "window_id int, start_ts timestamp, end_ts timestamp"
    )
    joined = rangejoin.interval_join(
        events, windows, ts_col="ts", bin_seconds=3600
    )
    return joined.groupBy("window_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


_INTERVAL_SQL = f"""
WITH wins AS (
  SELECT CAST(i AS INTEGER) AS window_id,
         {ANCHOR_SQL} - to_hours(2) - to_hours(6 * i) AS start_ts,
         {ANCHOR_SQL} - to_hours(2) - to_hours(6 * i)
           + to_minutes(90) AS end_ts
  FROM generate_series(0, 23) AS t(i)
)
SELECT w.window_id, count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN wins w ON e.ts >= w.start_ts AND e.ts < w.end_ts
GROUP BY w.window_id
"""


def _q_fk_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 delete propagation: a deterministic user-deletion set
    (user_id % 11 = 0) SET-NULLs activity FKs; an activity-deletion set
    (activity_id % 13 = 0) CASCADEs into security_alerts. Output is the
    surviving activity rows with their post-cascade alert count."""
    act = _activity(spark, sf_dir)
    deleted_users = act.filter(F.col("user_id") % 11 == 0).select("user_id")
    deleted_acts = act.filter(F.col("activity_id") % 13 == 0).select(
        "activity_id"
    )
    alerts = rules.derive_alerts(_battery(spark, sf_dir))
    survivors, children = cascade.propagate_deletes(
        act.select("activity_id", "user_id", "username"),
        deleted_users=deleted_users,
        deleted_activities=deleted_acts,
        children={"security_alerts": alerts},
    )
    alive_alerts = children["security_alerts"].select(
        "activity_id", F.lit(1).alias("__hit")
    )
    return (
        survivors.join(alive_alerts, "activity_id", "left")
        .groupBy("activity_id", "user_id", "username")
        .agg(F.count("__hit").alias("n_alerts"))
    )


_FK_CASCADE_SQL = battery_sql("""
, deleted_u AS (
  SELECT DISTINCT user_id FROM checked
  WHERE user_id IS NOT NULL AND user_id % 11 = 0
),
deleted_a AS (SELECT activity_id FROM checked WHERE activity_id % 13 = 0),
survivors AS (
  SELECT activity_id,
         CASE WHEN user_id IN (SELECT user_id FROM deleted_u)
              THEN NULL ELSE user_id END AS user_id,
         username
  FROM checked
  WHERE activity_id NOT IN (SELECT activity_id FROM deleted_a)
),
alive_alerts AS (
  SELECT activity_id FROM checked
  WHERE is_suspicious AND severity_level IN ('High', 'Critical')
    AND activity_id NOT IN (SELECT activity_id FROM deleted_a)
)
SELECT s.activity_id, s.user_id, s.username,
       CAST(count(a.activity_id) AS BIGINT) AS n_alerts
FROM survivors s LEFT JOIN alive_alerts a ON s.activity_id = a.activity_id
GROUP BY 1, 2, 3
""")


QUERIES: dict[str, QuerySpec] = {
    "fk_cascade": QuerySpec(
        _q_fk_cascade, _FK_CASCADE_SQL,
        "J5 delete propagation: SET NULL on users, CASCADE into alerts",
    ),
    "interval_join_windows": QuerySpec(
        _q_interval_join, _INTERVAL_SQL,
        "bin-bucketed range join (equi-join rewrite of ts BETWEEN)",
    ),
    "activity_cube": QuerySpec(
        _q_activity_cube, _ACTIVITY_CUBE_SQL,
        "CUBE(operation_type, role) with grouping_id (engine extension)",
    ),
    "asof_next_error": QuerySpec(
        _q_asof_next_error, _ASOF_FWD_SQL,
        "forward as-of join with 1h tolerance: earliest error "
        "at-or-after each purchase — union-and-carry scan, one "
        "shuffle, tolerance as a projection not a join",
    ),
    "asof_nearest_error": QuerySpec(
        _q_asof_nearest_error, _ASOF_NEAREST_SQL,
        "nearest as-of join with 2h tolerance: closest error either "
        "side, exact-tie prefers backward — two carries over one key "
        "partitioning, exact integer-microsecond distances",
    ),
    "asof_last_error": QuerySpec(
        _q_asof_last_error, _ASOF_SQL,
        "as-of backward join via union+carry-forward (vs DuckDB ASOF JOIN)",
    ),
    "geo_top_countries": QuerySpec(
        _q_geo_top_countries, _GEO_SQL,
        "A10 geo-dimension broadcast join + top-10 countries",
    ),
    "session_stats": QuerySpec(
        _q_session_stats, _SESSION_SQL,
        "ST8 session_window sessionization (30-min gap) vs gaps-and-islands oracle",
    ),
    "distinct_counts": QuerySpec(
        _q_distinct_counts, _DISTINCT_SQL,
        "distinct aggregation per group (engine extension)",
    ),
    "value_percentiles": QuerySpec(
        _q_value_percentiles, _PERCENTILES_SQL,
        "exact interpolated percentiles per group (engine extension)",
    ),
    "rule_battery": QuerySpec(
        _q_rule_battery, battery_sql(
            "SELECT activity_id, is_suspicious, severity_level, suspicious_reasons FROM checked"
        ),
        "R1 six-family security battery, single projection pass",
    ),
    "security_alerts": QuerySpec(
        _q_security_alerts, battery_sql("""
SELECT activity_id,
       CASE WHEN contains(suspicious_reasons, 'SQL Injection') THEN 'SQL Injection'
            WHEN contains(suspicious_reasons, 'sensitive') THEN 'Data Leakage'
            WHEN contains(suspicious_reasons, 'rate limit') THEN 'DoS Attempt'
            ELSE 'Security Violation' END AS alert_type,
       severity_level AS severity,
       suspicious_reasons AS description,
       'New' AS status,
       access_timestamp AS created_at
FROM checked
WHERE is_suspicious AND severity_level IN ('High', 'Critical')
"""),
        "R2/S6 alert derivation with precedence chain",
    ),
    "compliance_findings": QuerySpec(
        _q_compliance, activity_sql(f"""
SELECT activity_id, 'GDPR' AS standard, 'Non-compliant' AS status,
       'Personal data access without user identification' AS issue
FROM activity
WHERE table_name IN {_SENSITIVE_TABLES}
  AND (user_id IS NULL OR user_id = 0)
UNION ALL
SELECT activity_id, 'SOX',
       CASE WHEN rows_affected IS NOT NULL AND rows_affected != 0
            THEN 'Compliant' ELSE 'Review needed' END,
       'Financial data modification'
FROM activity
WHERE table_name IN ('accounts','financial','transactions')
  AND operation_type IN ('UPDATE','DELETE')
UNION ALL
SELECT activity_id, 'PCI_DSS', 'Monitored', 'Cardholder data access detected'
FROM activity WHERE table_name IN ('payments','credit_cards')
"""),
        "R3 compliance explode (conditional struct array → explode)",
    ),
    "firewall_matches": QuerySpec(
        _q_firewall, _FIREWALL_SQL,
        "R5/J4/W3 first-match-by-priority firewall",
    ),
    "blacklist_hits": QuerySpec(
        _q_blacklist_hits, _BLACKLIST_SQL,
        "J3 live-blacklist semi-join with expiry filter",
    ),
    "activity_kpis": QuerySpec(
        _q_activity_kpis, _KPIS_SQL,
        "A1/A2/A9 one-pass KPI + severity histogram",
    ),
    "operations_by_type": QuerySpec(
        _q_operations_by_type, _OPS_BY_TYPE_SQL, "A3 group-by count",
    ),
    "top_users": QuerySpec(
        _q_top_users, _TOP_USERS_SQL, "A4 top-5 users, deterministic ties",
    ),
    "hourly_timeline": QuerySpec(
        _q_hourly_timeline, _TIMELINE_SQL,
        "A5 tumbling 1-hour timeline, trailing 48 h",
    ),
    "behavior_profile": QuerySpec(
        _q_behavior_profile, _BEHAVIOR_SQL, "A6 hour×op profile for one user",
    ),
    "behavior_peak_hours": QuerySpec(
        _q_behavior_peak_hours, _PEAK_HOURS_SQL,
        "A11 peak hours with corrected summed semantics",
    ),
    "recent_activities": QuerySpec(
        _q_recent_activities, _RECENT_SQL,
        "F3/F5/F6/W1 dynamic filters + latest-50",
    ),
    "latest_critical": QuerySpec(
        _q_latest_critical, _LATEST_CRITICAL_SQL,
        "F4 severity-filter aliasing parity",
    ),
    "impossible_travel": QuerySpec(
        _q_impossible_travel, _IMPOSSIBLE_SQL, "R7/W4 lag-based IP change",
    ),
    "rate_window_counts": QuerySpec(
        _q_rate_window_counts, _RATE_WINDOW_SQL,
        "A8 exact trailing-window counts via range frame",
    ),
    "anomaly_baseline": QuerySpec(
        _q_anomaly_baseline, _BASELINE_SQL,
        "A7 two-level aggregate baseline (stddev_pop parity)",
    ),
    "volume_anomalies": QuerySpec(
        _q_volume_anomalies, _VOLUME_SQL, "R6 volume spike vs 3σ baseline",
    ),
    "rolling_median_value": QuerySpec(
        _q_rolling_median_value, _ROLLING_MEDIAN_SQL,
        "exact trailing-25-row median per user (A8 generalized to an "
        "order statistic) — integer-millis values, exact 0.5-grain "
        "interpolation; mergeable quantile rollups are the scale path",
    ),
    "robust_volume_anomalies": QuerySpec(
        _q_robust_volume_anomalies, _ROBUST_VOLUME_SQL,
        "R6 robust twin: volume spike vs median + 4.4478·MAD — "
        "burst-immune baseline (50% breakdown), exact 0.25-grain "
        "order statistics over integer counts",
    ),
    "json_props_extract": QuerySpec(
        _q_json_props, _JSON_PROPS_SQL, "JSON scalar extraction + aggregate",
    ),
}
