"""Scalar-function parity plans (SURVEY.md §2.7) over a literal corpus.

The agent-side normalization functions (C14-C17, C20) are pure string
transforms; parity is checked on a fixed SQL-text corpus embedded
identically on the Spark side (createDataFrame) and in the oracle
(VALUES). Covers every branch: all 12 verb classes, the 3 table-name
regexes, hex decode incl. odd-length padding, skip patterns, and
status inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalars
from .spec import QuerySpec, sql_values

# 'SELECT * FROM users' hex-encoded, plus an odd-length hex value.
SQL_CORPUS: list[tuple[int, str]] = [
    (1, "SELECT * FROM users WHERE id=1"),
    (2, "  insert into orders values (1)"),
    (3, "UPDATE accounts SET x=1 WHERE y=2"),
    (4, "delete from payments where id=9"),
    (5, "Create Table foo (a int)"),
    (6, "DROP TABLE bar"),
    (7, "truncate table baz"),
    (8, "ALTER TABLE t ADD c int"),
    (9, "GRANT ALL ON db1 TO bob"),
    (10, "revoke select on t1 from alice"),
    (11, "CALL my_proc(1)"),
    (12, "EXPLAIN SELECT 1"),
    (13, "select a from information_schema.tables"),
    (14, "SELECT x FROM a JOIN b ON a.id=b.id"),
    (15, "0x53454c454354202a2046524f4d207573657273"),
    (16, "select msg from logs where msg = failed"),
    (17, "SHOW TABLES"),
    (18, "SET NAMES utf8"),
    (19, "0x414243444"),
    (20, "   UPDATE `orders` SET q=q+1"),
]

_CORPUS_VALUES = sql_values(
    [list(r) for r in SQL_CORPUS], "c", ["id", "sql_text"]
)


def _corpus_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SQL_CORPUS, "id long, sql_text string")


def _q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14+C15+C20+F10 in one projection — exactly the agent's
    per-event normalization pass (minus hex decode, covered below)."""
    df = _corpus_df(spark)
    return df.select(
        "id",
        scalars.classify_operation(F.col("sql_text")).alias("operation_type"),
        scalars.extract_table_name(F.col("sql_text")).alias("table_name"),
        scalars.infer_operation_status(F.col("sql_text")).alias("operation_status"),
        scalars.is_system_query(F.col("sql_text")).alias("is_system"),
        scalars.query_fingerprint(F.col("sql_text")).alias("query_hash"),
    )


_VERB_CASE = (
    "CASE "
    + " ".join(
        f"WHEN starts_with(upper(trim(sql_text)), '{p}') THEN '{o}'"
        for p, o in [
            ("SELECT", "SELECT"), ("INSERT", "INSERT"), ("UPDATE", "UPDATE"),
            ("DELETE", "DELETE"), ("CREATE", "CREATE"), ("DROP", "DROP"),
            ("ALTER", "ALTER"), ("TRUNCATE", "TRUNCATE"), ("GRANT", "GRANT"),
            ("REVOKE", "REVOKE"), ("CALL", "PROCEDURE"),
        ]
    )
    + " ELSE 'OTHER' END"
)

_TABLE_EXTRACT = r"""
coalesce(
  nullif(regexp_extract(lower(sql_text), '(?:from|into|update|table|join)\s+`?(\w+)`?', 1), ''),
  nullif(regexp_extract(lower(sql_text), '(?:drop|truncate|alter)\s+table\s+`?(\w+)`?', 1), ''),
  nullif(regexp_extract(lower(sql_text), 'create\s+table\s+`?(\w+)`?', 1), ''),
  'unknown')
""".strip()

_SKIP_RX_SQL = "(?i)(" + "|".join(
    f"(?:{p})" for p in scalars.SKIP_PATTERNS
) + ")"

_NORMALIZE_SQL = f"""
SELECT CAST(id AS BIGINT) AS id,
       {_VERB_CASE} AS operation_type,
       {_TABLE_EXTRACT} AS table_name,
       CASE WHEN contains(lower(sql_text), 'error')
              OR contains(lower(sql_text), 'failed')
            THEN 'Failed' ELSE 'Success' END AS operation_status,
       regexp_matches(sql_text, '{_SKIP_RX_SQL}') AS is_system,
       md5(sql_text) AS query_hash
FROM {_CORPUS_VALUES}
"""


def _q_hex_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _corpus_df(spark)
    return df.select(
        "id", scalars.decode_hex_argument(F.col("sql_text")).alias("decoded")
    )


_HEX_SQL = f"""
SELECT CAST(id AS BIGINT) AS id,
  CASE WHEN starts_with(sql_text, '0x')
            AND decode(unhex(CASE WHEN length(substr(sql_text, 3)) % 2 = 1
                                  THEN '0' || substr(sql_text, 3)
                                  ELSE substr(sql_text, 3) END)) IS NOT NULL
       THEN decode(unhex(CASE WHEN length(substr(sql_text, 3)) % 2 = 1
                              THEN '0' || substr(sql_text, 3)
                              ELSE substr(sql_text, 3) END))
       ELSE sql_text END AS decoded
FROM {_CORPUS_VALUES}
"""


QUERIES: dict[str, QuerySpec] = {
    "agent_normalize": QuerySpec(
        _q_normalize, _NORMALIZE_SQL,
        "C14/C15/C20/F10/C8 agent normalization pass on fixed corpus",
    ),
    "hex_decode": QuerySpec(
        _q_hex_decode, _HEX_SQL, "C17 hex-argument decode incl. odd padding",
    ),
}
