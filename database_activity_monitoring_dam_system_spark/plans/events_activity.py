"""Deterministic events → activity_logs derivation.

The driver's DuckDB-oracle gate only has the generic testdata tables
(TESTDATA.md), not the DAM-native ones, so the DAM rule engines are
exercised by deterministically mapping the ``events`` stream onto the
``activity_logs`` shape — identical arithmetic on the Spark side (this
module) and in the oracle SQL CTE (``ACTIVITY_CTE``), so the rule
batteries themselves are what the hash comparison actually tests.

Mapping (pure functions of event_id/user_id/event_type/value/ts; no
floats in strings — floor() to integers first so both engines render
identical text):

  activity_id   = event_id
  user_id       = NULL when event_id % 7 = 0 (GDPR trigger) else user_id
  username      = 'SYSTEM' for those NULL rows else 'user_<id>'
  role          = Admin/User/Guest by user_id % 3
  operation_type= click/view→SELECT, purchase→UPDATE, signup→INSERT,
                  error→DELETE
  table_name    = 10-table wheel by event_id % 10 (covers sensitive +
                  SOX + PCI lists)
  details       = '<op> from <table> v<floor(value*100)>' plus an
                  injection suffix (event_id % 37 / % 41) and a
                  sensitive-column suffix (event_id % 23 / % 29)
  ip_address    = '10.0.0.<event_id % 30>'
  rows_affected = floor(value * 6)  (→ ~15 % exceed the 1000-row rule)
  operation_status = Failed iff event_type = 'error'
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TABLE_WHEEL = (
    "products", "orders", "users", "customers", "accounts",
    "payments", "credit_cards", "financial", "transactions", "unknown",
)
OP_BY_EVENT_TYPE = (
    ("click", "SELECT"), ("view", "SELECT"), ("purchase", "UPDATE"),
    ("signup", "INSERT"), ("error", "DELETE"),
)
BLACKLISTED_IPS = ("10.0.0.3", "10.0.0.7", "10.0.0.11")


def derive_activity(events: DataFrame) -> DataFrame:
    eid = F.col("event_id")
    op = None
    for et, o in OP_BY_EVENT_TYPE:
        cond = F.col("event_type") == et
        op = F.when(cond, o) if op is None else op.when(cond, o)
    op = op.otherwise("OTHER")

    table = None
    for i, t in enumerate(TABLE_WHEEL):
        cond = (eid % 10) == i
        table = F.when(cond, t) if table is None else table.when(cond, t)

    inj = (
        F.when(eid % 37 == 0, " union select * from t")
        .when(eid % 41 == 0, " or sleep(5)")
        .otherwise("")
    )
    sens = (
        F.when(eid % 23 == 0, " salary")
        .when(eid % 29 == 0, " password")
        .otherwise("")
    )
    base = events.select(
        eid.alias("activity_id"),
        F.when(eid % 7 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        F.when(eid % 7 == 0, "SYSTEM")
        .otherwise(F.concat(F.lit("user_"), F.col("user_id").cast("string")))
        .alias("username"),
        F.when(F.col("user_id") % 3 == 0, "Admin")
        .when(F.col("user_id") % 3 == 1, "User")
        .otherwise("Guest")
        .alias("role"),
        op.alias("operation_type"),
        table.alias("table_name"),
        F.when(F.col("event_type") == "error", "Failed")
        .otherwise("Success")
        .alias("operation_status"),
        F.concat(F.lit("10.0.0."), (eid % 30).cast("string")).alias("ip_address"),
        F.col("ts").alias("access_timestamp"),
        F.floor(F.col("value") * 6).cast("int").alias("rows_affected"),
        inj.alias("_inj"),
        sens.alias("_sens"),
        F.floor(F.col("value") * 100).cast("string").alias("_v"),
    )
    return base.withColumn(
        "operation_details",
        F.concat(
            F.lower("operation_type"),
            F.lit(" from "),
            F.col("table_name"),
            F.lit(" v"),
            F.col("_v"),
            F.col("_inj"),
            F.col("_sens"),
        ),
    ).drop("_inj", "_sens", "_v")


def _sql_table_wheel() -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(TABLE_WHEEL)
    )
    return f"CASE event_id % 10 {whens} END"


def _sql_op() -> str:
    whens = " ".join(f"WHEN '{et}' THEN '{o}'" for et, o in OP_BY_EVENT_TYPE)
    return f"CASE event_type {whens} ELSE 'OTHER' END"


# DuckDB CTE computing the identical frame; compose oracles as
# f"WITH {ACTIVITY_CTE} SELECT ... FROM activity".
ACTIVITY_CTE = f"""
activity_base AS (
  SELECT
    event_id AS activity_id,
    CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id END AS user_id,
    CASE WHEN event_id % 7 = 0 THEN 'SYSTEM'
         ELSE 'user_' || CAST(user_id AS VARCHAR) END AS username,
    CASE WHEN user_id % 3 = 0 THEN 'Admin'
         WHEN user_id % 3 = 1 THEN 'User'
         ELSE 'Guest' END AS role,
    {_sql_op()} AS operation_type,
    {_sql_table_wheel()} AS table_name,
    CASE WHEN event_type = 'error' THEN 'Failed' ELSE 'Success' END
      AS operation_status,
    '10.0.0.' || CAST(event_id % 30 AS VARCHAR) AS ip_address,
    ts AS access_timestamp,
    CAST(floor(value * 6) AS INTEGER) AS rows_affected,
    CASE WHEN event_id % 37 = 0 THEN ' union select * from t'
         WHEN event_id % 41 = 0 THEN ' or sleep(5)'
         ELSE '' END AS _inj,
    CASE WHEN event_id % 23 = 0 THEN ' salary'
         WHEN event_id % 29 = 0 THEN ' password'
         ELSE '' END AS _sens,
    CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) AS _v
  FROM events
),
activity AS (
  SELECT * EXCLUDE (_inj, _sens, _v),
         lower(operation_type) || ' from ' || table_name || ' v' || _v
           || _inj || _sens AS operation_details
  FROM activity_base
)
""".strip()
