"""Sessionization (SURVEY.md ST8).

The reference carries a session_id column but never aggregates on it
(sql/02_create_tables.sql:36); session windows are the natural cheap
extension Spark gives us: ``session_window(ts, gap)`` — dynamic-gap
event sessions with streaming support (state store + watermark) for
free. Batch and streaming share this exact aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    ts_col: str = "access_timestamp",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-(user, session) stats: start, event count, duration.

    A session groups events whose gaps never exceed ``gap`` (strict >
    starts a new session). Equivalent to gaps-and-islands in SQL — the
    oracle uses lag + cumulative sum; Spark's native session_window is
    one hash aggregate with session merge, streaming-capable.
    """
    return (
        events.filter(F.col(key_col).isNotNull())
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("win"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            key_col,
            F.col("first_ts").alias("session_start"),
            "n_events",
            (
                F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")
            ).alias("duration_sec"),
        )
    )
