"""Explicit StructTypes for every table in the DAM data model.

Derived from the reference DDL (`sql/02_create_tables.sql`, and the
runtime-created tables in `app.py:1464-1514`) per SURVEY.md §1.4. No
schema inference anywhere: ingest validates against these.

MySQL → Spark type decisions (SURVEY.md §1.3):
  * AUTO_INCREMENT PKs  → LongType, generated at ingest (no distributed
    auto-increment; batch uses monotonically_increasing_id + offset,
    streams use deterministic hashes).
  * ENUM               → StringType + CHECK-style validation constants.
  * DATETIME           → TimestampType, session TZ pinned to UTC.
  * BOOLEAN/TINYINT(1) → BooleanType.
  * VARCHAR(n)/TEXT    → StringType (length limits enforced at ingest,
    mirroring dam_agent.py:223 / app.py:847 truncation).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ── ordered domains (reference sql/02_create_tables.sql ENUM columns) ──────

ROLES = ("Admin", "User", "Guest")
ACCOUNT_STATUSES = ("Active", "Inactive", "Locked")
OPERATION_STATUSES = ("Success", "Failed")
# Severity lattice Low < Medium < High < Critical (app.py:364-402).
SEVERITY_ORDER = ("Low", "Medium", "High", "Critical")
ALERT_STATUSES = ("New", "Investigating", "Resolved")
COMPLIANCE_STANDARDS = ("GDPR", "SOX", "HIPAA", "PCI_DSS")
COMPLIANCE_STATUSES = ("Non-compliant", "Compliant", "Review needed", "Monitored")
OPERATION_TYPES = (
    "SELECT", "INSERT", "UPDATE", "DELETE", "CREATE", "DROP", "ALTER",
    "TRUNCATE", "GRANT", "REVOKE", "PROCEDURE", "OTHER", "LOGIN", "LOGOUT",
)
FIREWALL_MATCH_TYPES = ("regex", "contains", "starts_with")
FIREWALL_ACTIONS = ("block", "alert")

# ── core tables ────────────────────────────────────────────────────────────

# sql/02_create_tables.sql:9-21
USERS = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("username", T.StringType(), False),
    T.StructField("password_hash", T.StringType(), True),
    T.StructField("role", T.StringType(), False),
    T.StructField("account_status", T.StringType(), False),
    T.StructField("failed_attempts", T.IntegerType(), True),
    T.StructField("locked_until", T.TimestampType(), True),
    T.StructField("last_login", T.TimestampType(), True),
    T.StructField("created_at", T.TimestampType(), True),
])

# sql/02_create_tables.sql:26-47 — the fact stream. `is_suspicious`,
# `suspicious_reasons`, `severity_level` are DERIVED: the reference
# UPDATEs them post-insert (app.py:406-409); this engine computes them
# before the append (same final contents, no mutation).
ACTIVITY_LOGS = T.StructType([
    T.StructField("activity_id", T.LongType(), False),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("username", T.StringType(), True),
    T.StructField("operation_type", T.StringType(), False),
    T.StructField("table_name", T.StringType(), True),
    T.StructField("operation_status", T.StringType(), True),
    T.StructField("operation_details", T.StringType(), True),
    T.StructField("ip_address", T.StringType(), True),
    T.StructField("access_timestamp", T.TimestampType(), False),
    T.StructField("session_id", T.StringType(), True),
    T.StructField("rows_affected", T.IntegerType(), True),
    T.StructField("query_hash", T.StringType(), True),
    T.StructField("is_suspicious", T.BooleanType(), True),
    T.StructField("suspicious_reasons", T.StringType(), True),
    T.StructField("severity_level", T.StringType(), True),
])

# sql/02_create_tables.sql:52-64
SECURITY_ALERTS = T.StructType([
    T.StructField("alert_id", T.LongType(), False),
    T.StructField("activity_id", T.LongType(), True),
    T.StructField("alert_type", T.StringType(), False),
    T.StructField("severity", T.StringType(), False),
    T.StructField("description", T.StringType(), True),
    T.StructField("status", T.StringType(), False),
    T.StructField("created_at", T.TimestampType(), False),
    T.StructField("resolved_at", T.TimestampType(), True),
])

# sql/02_create_tables.sql:69-77
IP_BLACKLIST = T.StructType([
    T.StructField("ip_id", T.LongType(), False),
    T.StructField("ip_address", T.StringType(), False),
    T.StructField("reason", T.StringType(), True),
    T.StructField("created_at", T.TimestampType(), True),
    T.StructField("expires_at", T.TimestampType(), True),
])

# sql/02_create_tables.sql:82-91
COMPLIANCE_LOGS = T.StructType([
    T.StructField("compliance_id", T.LongType(), False),
    T.StructField("activity_id", T.LongType(), True),
    T.StructField("standard", T.StringType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("finding", T.StringType(), True),
    T.StructField("created_at", T.TimestampType(), True),
])

# app.py:1474-1487
FIREWALL_RULES = T.StructType([
    T.StructField("rule_id", T.LongType(), False),
    T.StructField("pattern", T.StringType(), False),
    T.StructField("description", T.StringType(), True),
    T.StructField("match_type", T.StringType(), False),
    T.StructField("action", T.StringType(), False),
    T.StructField("priority", T.IntegerType(), False),
    T.StructField("applies_to_user", T.StringType(), True),
    T.StructField("applies_to_ip", T.StringType(), True),
    T.StructField("is_active", T.BooleanType(), False),
    T.StructField("created_at", T.TimestampType(), True),
])

# app.py:1489-1498
FIREWALL_BLOCKS = T.StructType([
    T.StructField("block_id", T.LongType(), False),
    T.StructField("username", T.StringType(), True),
    T.StructField("ip_address", T.StringType(), True),
    T.StructField("query_text", T.StringType(), True),
    T.StructField("rule_id", T.LongType(), True),
    T.StructField("blocked_at", T.TimestampType(), False),
])

# dam_agent.py:220-229 — raw agent event as POSTed to /api/agent/activity.
AGENT_EVENT = T.StructType([
    T.StructField("event_time", T.TimestampType(), False),
    T.StructField("user_host", T.StringType(), True),
    T.StructField("argument", T.StringType(), True),
])

# ── driver testdata tables (TESTDATA.md / FIXTURES.md §8) ─────────────────

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    T.StructField("label", T.IntegerType(), True),
])
