"""Streaming twins of the batch anomaly detectors (SURVEY R6/R7) —
the ingest stream flagging live what operators/anomaly.py flags in
batch, each via the architecture SURVEY prescribes for its shape:

* volume spike (R6): a STREAM-STATIC join — watermarked tumbling
  1-hour counts per user against the broadcast historical baseline
  (operators/anomaly.py user_hourly_baseline, one row per user).
  Pure built-in operators, no custom state: window finalization is
  the watermark's job and the join side is static by definition
  (the baseline is a periodically-recomputed batch artifact, the
  reference's on-demand per-user AVG/STDDEV probe, app.py:522-532).

* impossible travel (R7): consecutive-login pairing needs the pair
  that SPANS the micro-batch boundary (last login of prior batches,
  first of this one) — exactly the transition-stream seam, closed
  the same way (journey_stream's per-user last-event snapshot
  table): each batch pairs its own logins plus the carried
  last-login per user with the SHARED pairing definition
  (operators/anomaly.py login_ip_pairs — one function, so
  stream ≡ batch cannot silently drift), appends the flagged rows
  under its own ``_batch_id`` partition (replay rewrites exactly
  its own fragment), and rolls the snapshot forward.

Correctness contract (same as the transition stream): exact ≡ batch
when each user's logins arrive in event-time order ACROSS batches
(in-batch disorder is fine — the window sorts). State is
O(users × keep_batches) complete snapshots, retention-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import anomaly
from .journey_stream import roll_last_event_snapshot, with_carried_last_events


def volume_anomaly_stream(
    normalized: DataFrame,
    baseline: DataFrame,
    *,
    ts_col: str = "access_timestamp",
    user_col: str = "user_id",
    watermark_delay: str = "10 minutes",
    flags_fn=None,
) -> DataFrame:
    """R6 streaming twin — hour buckets whose live count exceeds the
    user's historical avg + 3·std, matching volume_anomalies row-for-
    row once the watermark finalizes a bucket (append mode emits each
    (user, hour) exactly once; a bucket's count is complete because
    the watermark bounds lateness).

    ``baseline`` is the static user_hourly_baseline frame — compute
    it from history on a schedule (jobs.py cadence); the stream
    re-broadcasts it per micro-batch, so a refreshed baseline table
    takes effect without a restart (SURVEY ST6). Same guard semantics
    as batch: NULL/0 std defaults to 1.

    ``flags_fn`` selects the arbitration (default
    anomaly.volume_flags). Pass anomaly.robust_volume_flags with a
    user_hourly_robust_baseline frame to serve the median+MAD
    detector from the SAME windowed counts — one counting pipeline,
    either threshold, and each arbitration stays the one definition
    its batch twin uses.
    """
    hourly = (
        normalized.filter(F.col(user_col).isNotNull())
        .withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.col(user_col),
            F.window(ts_col, "1 hour").alias("_win"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            user_col,
            F.col("_win.start").alias("hour_bucket"),
            "cnt",
        )
    )
    # the arbitration itself is anomaly.volume_flags (or the robust
    # twin) — the ONE threshold definition batch and stream share
    fn = flags_fn if flags_fn is not None else anomaly.volume_flags
    return fn(hourly, baseline, user_col=user_col)


def start_impossible_travel_stream(
    activity: DataFrame,
    *,
    out_path: str,
    checkpoint_dir: str,
    state_path: str,
    op: str = "LOGIN",
    ts_col: str = "access_timestamp",
    keep_batches: int = 3,
    available_now: bool = False,
):
    """R7 streaming twin — flag consecutive same-user logins from
    different IPs live, including the pairs that span micro-batch
    boundaries. Output fragments land under ``_batch_id=N`` at
    ``out_path`` (dynamic overwrite — a replayed batch rewrites
    exactly its own fragment); read the union for the live flag
    table. The batch arbiter is anomaly.impossible_travel over the
    same logins with a window covering them (both reduce the SAME
    login_ip_pairs definition)."""

    cols = ["username", ts_col, "activity_id", "ip_address"]

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        logins = batch.filter(F.col("operation_type") == op)
        src = with_carried_last_events(
            logins, batch_id, state_path=state_path, cols=cols,
            user_col="username",
        )
        flags = anomaly.login_ip_pairs(
            src, ts_col=ts_col, carry_col="_carry"
        )
        (
            flags.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )
        roll_last_event_snapshot(
            src, batch_id, state_path=state_path, user_col="username",
            order_cols=[ts_col, "activity_id"], keep_batches=keep_batches,
        )

    writer = activity.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
