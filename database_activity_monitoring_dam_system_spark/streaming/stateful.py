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
from pyspark.sql import functions as F
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


def seeded_rate_counts(
    batch: DataFrame,
    state: DataFrame | None,
    *,
    window_sec: int = 60,
    user_col: str = "user_id",
    ts_col: str = "access_timestamp",
    out_col: str = "queries_last_min",
) -> DataFrame:
    """Trailing-window counts over a micro-batch, seeded with epochs
    carried from PRIOR micro-batches — the cross-batch form of
    rules.with_rate_counts with identical within-batch semantics
    (range frame over epoch seconds, ties counted both ways).

    count(event) = |batch events of the user in [t-(w-1), t]|
                 + |carried epochs of the user in [t-(w-1), t]|

    Everything is JVM-side: the within-batch term is the shared range
    frame; the carry term is a broadcast join against the (tiny,
    per-active-user) state followed by size(filter(array)). No Python
    in the hot path, and the fact side shuffles only for the same
    per-user window the batch path already pays.
    """
    from ..operators.anomaly import trailing_window_counts

    within = trailing_window_counts(
        batch, seconds=window_sec, ts_col=ts_col, user_col=user_col,
        out_col="_within",
    )
    if state is None:
        return within.withColumnRenamed("_within", out_col)
    epoch = F.unix_timestamp(F.col(ts_col))
    carried = F.coalesce(
        F.size(
            F.filter(
                "recent_epochs",
                lambda e: ((epoch - e) >= 0) & ((epoch - e) <= window_sec - 1),
            )
        ),
        F.lit(0),
    )
    return (
        within.join(F.broadcast(state), user_col, "left")
        .withColumn(out_col, F.col("_within") + carried.cast("long"))
        .drop("_within", "recent_epochs")
    )


def rate_state_after(
    batch: DataFrame,
    state: DataFrame | None,
    *,
    window_sec: int = 60,
    user_col: str = "user_id",
    ts_col: str = "access_timestamp",
    idle_horizon_sec: int = 600,
) -> DataFrame:
    """The state to carry into the NEXT micro-batch: per user, all
    epochs within the window of that user's newest epoch (exactly what
    _rate_fn's buffer holds after draining sorted events).

    Users whose newest epoch trails the batch's max event time by more
    than window+idle_horizon are evicted — they cannot contribute to
    any future in-order event, and the horizon bounds the out-of-order
    slack exactly like the ingest watermark (reference parity: the
    in-memory list also only ever holds the trailing minute,
    app.py:398-400)."""
    epochs = batch.select(
        F.col(user_col), F.unix_timestamp(F.col(ts_col)).alias("_e")
    ).where(F.col(user_col).isNotNull())
    if state is not None:
        epochs = epochs.unionByName(
            state.select(F.col(user_col), F.explode("recent_epochs").alias("_e"))
        )
    horizon_row = batch.agg(F.max(F.unix_timestamp(F.col(ts_col)))).first()
    out = (
        epochs.groupBy(user_col)
        .agg(F.max("_e").alias("_m"), F.collect_list("_e").alias("_all"))
        .select(
            F.col(user_col),
            F.col("_m"),
            F.filter(
                "_all", lambda e: (F.col("_m") - e) <= window_sec - 1
            ).alias("recent_epochs"),
        )
    )
    if horizon_row is not None and horizon_row[0] is not None:
        out = out.where(
            F.col("_m") >= F.lit(int(horizon_row[0]) - window_sec - idle_horizon_sec)
        )
    return out.drop("_m")


def read_rate_state(
    spark, state_dir: str, batch_id: int, *, user_col: str = "user_id"
) -> DataFrame | None:
    """Latest snapshot strictly before ``batch_id`` (a retried batch
    must re-seed from its PREDECESSOR's state, not its own failed
    attempt). Duplicate rows from a half-written retry partition are
    collapsed — the computation is deterministic, so copies agree.

    Existence is probed through the Hadoop FileSystem API (works on
    local paths, HDFS, and object stores alike): on batch 0 nothing
    has been written yet, and depending on the source the missing-path
    error can surface lazily as FileNotFoundException inside the
    foreachBatch action — where it would kill the stream — rather
    than as AnalysisException at read time."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    snap = spark.read.parquet(state_dir)
    prior = snap.filter(F.col("batch_id") < batch_id)
    latest = prior.agg(F.max("batch_id")).first()[0]
    if latest is None:
        return None
    return (
        prior.filter(F.col("batch_id") == latest)
        .dropDuplicates([user_col])
        .select(user_col, "recent_epochs")
    )


def write_rate_state(
    state: DataFrame, state_dir: str, batch_id: int, *, keep_batches: int = 3
) -> None:
    """Append this batch's snapshot under its own partition — readers
    prune to one partition, and append keeps retries safe (read-side
    dedup).

    Retention: snapshots older than ``keep_batches`` behind the one
    just written are deleted afterwards, so the state dir holds O(keep)
    partitions instead of growing one per micro-batch forever (at one
    batch per few seconds that's millions of tiny parquet files a
    year — a real small-files problem on any filesystem). Ordering is
    crash-safe: the new snapshot is durable before anything is
    removed, the reader takes the LATEST partition strictly below the
    current batch id, and a retried batch re-seeds from its
    predecessor, which is always within the keep window."""
    spark = state.sparkSession
    state.withColumn("batch_id", F.lit(batch_id)).write.mode(
        "append"
    ).partitionBy("batch_id").parquet(state_dir)
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("batch_id="):
            continue
        try:
            old_id = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if old_id <= batch_id - keep_batches:
            fs.delete(status.getPath(), True)


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
