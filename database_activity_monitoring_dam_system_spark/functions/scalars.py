"""Scalar expression library (SURVEY.md §2.7, C8/C10-C17/C20).

Every helper returns a Column built from JVM-side built-ins — no Python
UDFs — so the whole normalization pipeline stays inside whole-stage
codegen and runs identically in batch and Structured Streaming.

Behavioral parity targets (reference file:line cited per function) are
the Python helpers of ``dam_agent.py`` and the inline classification in
``app.py``; semantics were reproduced from observed behavior, code not
copied.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# C14 — SQL-verb classification (behavior of dam_agent.py:76-104).
# Prefix → operation type; CALL maps to PROCEDURE; fallback OTHER.
_VERB_MAP = [
    ("SELECT", "SELECT"), ("INSERT", "INSERT"), ("UPDATE", "UPDATE"),
    ("DELETE", "DELETE"), ("CREATE", "CREATE"), ("DROP", "DROP"),
    ("ALTER", "ALTER"), ("TRUNCATE", "TRUNCATE"), ("GRANT", "GRANT"),
    ("REVOKE", "REVOKE"), ("CALL", "PROCEDURE"),
]


def classify_operation(sql_text: Column) -> Column:
    """Chained-`when` prefix classifier; whole-stage-codegen friendly."""
    upper = F.upper(F.trim(sql_text))
    expr = None
    for prefix, op in _VERB_MAP:
        cond = upper.startswith(prefix)
        expr = F.when(cond, op) if expr is None else expr.when(cond, op)
    return expr.otherwise(F.lit("OTHER"))


# C15 — table-name extraction (behavior of dam_agent.py:107-123):
# three regexes over lowercased SQL, first capture wins, else "unknown".
_TABLE_PATTERNS = (
    r"(?:from|into|update|table|join)\s+`?(\w+)`?",
    r"(?:drop|truncate|alter)\s+table\s+`?(\w+)`?",
    r"create\s+table\s+`?(\w+)`?",
)


def extract_table_name(sql_text: Column) -> Column:
    low = F.lower(sql_text)
    candidates = [
        F.nullif(F.regexp_extract(low, p, 1), F.lit("")) for p in _TABLE_PATTERNS
    ]
    return F.coalesce(*candidates, F.lit("unknown"))


# C16 — username extraction (behavior of dam_agent.py:135-145):
# text before the first '[' of "name[name] @ host []", trimmed;
# empty/null user_host → "SYSTEM".
def extract_username(user_host: Column) -> Column:
    head = F.trim(F.regexp_extract(user_host, r"^([^\[]+)", 1))
    fallback = F.trim(F.split_part(user_host, F.lit("@"), F.lit(1)))
    name = F.coalesce(F.nullif(head, F.lit("")), F.nullif(fallback, F.lit("")))
    return F.when(
        user_host.isNull() | (F.length(user_host) == 0), F.lit("SYSTEM")
    ).otherwise(F.coalesce(name, user_host))


# C17 — hex-argument decode (behavior of dam_agent.py:46-73): values like
# "0x53454c..." are unhexed to UTF-8; odd-length hex gets a leading 0.
def decode_hex_argument(argument: Column) -> Column:
    hex_body = F.substring(argument, 3, 1_000_000)
    padded = F.when(
        F.length(hex_body) % 2 == 1, F.concat(F.lit("0"), hex_body)
    ).otherwise(hex_body)
    decoded = F.decode(F.unhex(padded), "UTF-8")
    return F.when(
        argument.startswith("0x") & decoded.isNotNull(), decoded
    ).otherwise(argument)


# F10 — system-query skip filter (behavior of dam_agent.py:28-43,126-132).
# The reference lower-cases then re.searches each pattern with IGNORECASE;
# one case-insensitive alternation is equivalent.
SKIP_PATTERNS = (
    r"SET GLOBAL",
    r"SELECT.*FROM mysql\.general_log",
    r"general_log",
    r"information_schema",
    r"performance_schema",
    r"mysql\.",
    r"SHOW",
    r"USE `?mysql`?",
    r"COMMIT",
    r"BEGIN",
    r"ROLLBACK",
    r"SET AUTOCOMMIT",
    r"SET NAMES",
    r"SET CHARACTER SET",
)
_SKIP_RX = "(?i)(" + "|".join(f"(?:{p})" for p in SKIP_PATTERNS) + ")"


def is_system_query(sql_text: Column) -> Column:
    return sql_text.rlike(_SKIP_RX)


# C20 — status inference (behavior of app.py:1181): Failed iff the query
# text contains "error" or "failed" case-insensitively.
def infer_operation_status(sql_text: Column) -> Column:
    low = F.lower(F.coalesce(sql_text, F.lit("")))
    return F.when(
        low.contains("error") | low.contains("failed"), F.lit("Failed")
    ).otherwise(F.lit("Success"))


# C8 — md5 query fingerprint (app.py:258).
def query_fingerprint(sql_text: Column) -> Column:
    return F.md5(sql_text)
