"""Agent-event normalization: the E1 ingest path's parse stage.

Re-expresses dam_agent.py's per-row Python loop (decode → skip →
classify → extract, dam_agent.py:204-229) as one column-expression
projection that runs identically on a batch DataFrame or a streaming
micro-batch — the same `transform` is used by both paths, so
batch/stream parity is structural, not tested-by-luck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scalars

# Agent truncates payload SQL to 1000 chars (dam_agent.py:223).
MAX_DETAILS_LEN = 1000


def normalize_agent_events(raw: DataFrame, *, drop_system: bool = True) -> DataFrame:
    """raw(event_time, user_host, argument) → activity-log-shaped rows.

    Stages (all codegen expressions, SURVEY.md C14-C17, C20, F10, C8):
      1. hex decode of 0x… arguments        (dam_agent.py:46-73)
      2. system-query skip filter           (dam_agent.py:126-132)
      3. SQL-verb classification            (dam_agent.py:76-104)
      4. table-name extraction              (dam_agent.py:107-123)
      5. username extraction                (dam_agent.py:135-145)
      6. status inference                   (app.py:1181)
      7. md5 fingerprint + truncation       (app.py:258; dam_agent.py:223)
    """
    decoded = raw.withColumn(
        "sql_text", scalars.decode_hex_argument(F.col("argument"))
    )
    if drop_system:
        decoded = decoded.filter(~scalars.is_system_query(F.col("sql_text")))
    details = F.substring(F.col("sql_text"), 1, MAX_DETAILS_LEN)
    return decoded.select(
        F.col("event_time").alias("access_timestamp"),
        scalars.extract_username(F.col("user_host")).alias("username"),
        scalars.classify_operation(F.col("sql_text")).alias("operation_type"),
        scalars.extract_table_name(F.col("sql_text")).alias("table_name"),
        scalars.infer_operation_status(F.col("sql_text")).alias("operation_status"),
        details.alias("operation_details"),
        scalars.query_fingerprint(details).alias("query_hash"),
    )
