"""Custom stateful streaming operator (SURVEY.md ST5).

The reference keeps a per-user in-memory list of recent event times and
flags users exceeding 100 queries/min (app.py:328, 396-403) — state
that dies with the process. The windowed approximation lives in
ingest.rate_alert_stream (ST4); THIS module is the exact form: an
``applyInPandasWithState`` operator keyed by user whose state is the
trailing event-time buffer, surviving restarts via the checkpoint.

This is the designated escape hatch for per-key custom state — use it
only when windowed aggregates can't express the semantics (here: an
EXACT sliding 60 s count evaluated at every event, not at window
boundaries).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RATE_STATE_SCHEMA = T.StructType([
    T.StructField("recent_ts", T.ArrayType(T.DoubleType()), True),
])

RATE_OUTPUT_SCHEMA = T.StructType([
    T.StructField("username", T.StringType(), False),
    T.StructField("event_ts", T.TimestampType(), False),
    T.StructField("queries_last_min", T.IntegerType(), False),
    T.StructField("breached", T.BooleanType(), False),
])


def _rate_fn(window_sec: float, threshold: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (username,) = key
        if state.hasTimedOut:
            # idle-key eviction: drop the buffer instead of re-arming
            # the timeout forever (unbounded state growth otherwise)
            state.remove()
            yield pd.DataFrame(
                columns=["username", "event_ts", "queries_last_min", "breached"]
            )
            return
        if state.exists:
            (recent,) = state.get
            recent = list(recent)
        else:
            recent = []
        out_rows = []
        # One key's micro-batch may span several Arrow chunks with
        # out-of-order event times; sorting per chunk would let an
        # earlier event (processed after a later one) see a negative
        # delta and fail to evict — materialize all chunks and sort
        # ONCE globally (state stays bounded at ~threshold+batch).
        all_ts = [ts for pdf in pdfs for ts in pdf["access_timestamp"]]
        for ts in sorted(all_ts):
            epoch = ts.timestamp()
            recent.append(epoch)
            # exact trailing window: strictly-less-than 60 s ago,
            # current event included (reference semantics,
            # app.py:398-400)
            recent = [t for t in recent if epoch - t < window_sec]
            out_rows.append(
                (username, ts, len(recent), len(recent) > threshold)
            )
        state.update((recent,))
        # evict idle users' state after an hour without processing
        # activity for the key (ProcessingTimeTimeout)
        state.setTimeoutDuration(3_600_000)
        yield pd.DataFrame(
            out_rows,
            columns=["username", "event_ts", "queries_last_min", "breached"],
        )

    return fn


def exact_rate_counts(
    normalized: DataFrame,
    *,
    window_sec: float = 60.0,
    threshold: int = 100,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-event exact trailing-window counts as a stateful stream.

    Arrow-batched per key; state is a float array of recent epochs —
    bounded by the rate itself (≤ threshold+batch per user).
    Streaming-only (applyInPandasWithState requires a streaming frame);
    the batch twin is exact_rate_counts_batch.
    """
    return normalized.withWatermark(
        "access_timestamp", watermark_delay
    ).groupBy("username").applyInPandasWithState(
        _rate_fn(window_sec, threshold),
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def exact_rate_counts_batch(
    normalized: DataFrame,
    *,
    window_sec: float = 60.0,
    threshold: int = 100,
) -> DataFrame:
    """Batch twin via applyInPandas — same per-key loop, state starts
    empty (a whole batch is one 'micro-batch'). The expression-level
    equivalent is anomaly.trailing_window_counts (range frame); this
    exists so streaming and batch share one Python code path when the
    buffer semantics matter."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        username = pdf["username"].iloc[0]
        recent: list[float] = []
        rows = []
        for ts in sorted(pdf["access_timestamp"]):
            epoch = ts.timestamp()
            recent.append(epoch)
            recent = [t for t in recent if epoch - t < window_sec]
            rows.append((username, ts, len(recent), len(recent) > threshold))
        return pd.DataFrame(
            rows,
            columns=["username", "event_ts", "queries_last_min", "breached"],
        )

    return normalized.groupBy("username").applyInPandas(
        fn, schema=RATE_OUTPUT_SCHEMA
    )
