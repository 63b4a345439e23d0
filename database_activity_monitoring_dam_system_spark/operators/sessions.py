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


def _session_agg(
    events: DataFrame, *, gap: str, ts_col: str, key_col: str
) -> DataFrame:
    """The ONE sessionization aggregate batch and streaming share —
    the module's whole point: parity between the two modes is by
    construction, not by parallel implementations."""
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
    return _session_agg(events, gap=gap, ts_col=ts_col, key_col=key_col)


def session_stats_stream(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "access_timestamp",
    key_col: str = "user_id",
) -> DataFrame:
    """ST8's STREAMING twin: the identical session aggregate over a
    streaming frame, with watermark-driven state eviction — sessions
    merge across micro-batches in the state store and a session is
    EMITTED (append mode) once the watermark passes its close (last
    event + gap), which is also when its state is dropped, so state
    is bounded by the sessions still open within the watermark
    horizon, not by history. Late events inside ``watermark_delay``
    still extend/merge their session; later ones are dropped (the
    same late-data contract as timeline_stream). Sessions still open
    at stream end stay withheld — exactly the rows a re-run with
    more data would have changed."""
    return _session_agg(
        events.withWatermark(ts_col, watermark_delay),
        gap=gap,
        ts_col=ts_col,
        key_col=key_col,
    )
