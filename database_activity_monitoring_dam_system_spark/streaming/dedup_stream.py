"""Streaming deduplication — exact dedup as an ingest stage.

At 100 TB-scale ingest, repeated events (agent retries, at-least-once
sources) are dropped IN the stream, not in a nightly batch:
``dropDuplicatesWithinWatermark`` keys on the content fingerprint and
keeps per-key state only within the watermark horizon, so state is
bounded by (event rate × delay), not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    normalized: DataFrame,
    *,
    key_cols: list[str] | None = None,
    ts_col: str = "access_timestamp",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate events by fingerprint within the watermark.

    Default key: (query_hash, username) — the reference's md5 content
    hash (app.py:258) plus the actor; two agents replaying the same
    poll window collapse to one row.
    """
    keys = key_cols or ["query_hash", "username"]
    df = normalized
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
