"""Streaming maintenance of the mergeable time-rollup partials
(operators/rollup.py) — the incremental continuous-aggregate refresh.

Design: each micro-batch reduces ITS OWN events to minute-grain
partial rows (operators.rollup.time_partials — the associative
(count, sum_millis, min, max) state) and appends them under a
``_batch_id=N`` partition; a replayed batch overwrites exactly its
own partition (dynamic partition overwrite — the engine's idempotent
foreachBatch sink pattern, cf. ann_serving/ingest). Because the state
is ASSOCIATIVE, batch fragments for the same minute bucket never need
read-modify-write at ingest time: the reader
(:func:`read_rollup`) merges fragments with the very same
``rollup_partials`` groupBy that merges minutes into hours. No
locking, no upsert, no state store — idempotence comes from the
partition overwrite, correctness from associativity.

100 TB posture: the partials table grows with buckets × groups ×
batches, orders of magnitude smaller than raw events; periodic
compaction (sinks.compact_partitions) can fold old ``_batch_id``
fragments into one, and every coarser dashboard resolution derives
from this one table without ever re-reading the event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import rollup


def start_rollup_stream(
    events: DataFrame,
    *,
    out_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "minute",
    group_cols: list[str] | None = None,
    available_now: bool = False,
):
    """Maintain a ``grain`` partials table from an event stream.

    Each micro-batch writes its own partial rows under
    ``_batch_id=N`` (overwriting that partition on replay). Query the
    result with :func:`read_rollup`.
    """
    groups = list(group_cols or [])

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        partials = rollup.time_partials(
            batch,
            ts_col=ts_col,
            value_col=value_col,
            grain=grain,
            group_cols=groups,
        )
        (
            partials.withColumn("_grain", F.lit(grain))
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    writer = events.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(
    spark: SparkSession,
    path: str,
    *,
    to_grain: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The query-side view of a streamed partials table: merge the
    per-batch fragments (and finer buckets) into ``to_grain``
    partials — the same associative groupBy that makes hour-from-
    minute exact in batch mode makes fragment-merge exact here.

    Refuses a ``to_grain`` FINER than the table's written grain
    (recorded per row as ``_grain``): re-truncating day buckets to
    'hour' is the identity and would return day data silently
    labeled as hourly."""
    df = spark.read.parquet(path)
    if "_grain" in df.columns:
        written = df.select("_grain").first()["_grain"]
        order = rollup._GRAIN_ORDER
        if order.index(to_grain) < order.index(written):
            raise ValueError(
                f"read_rollup: table was written at {written!r} grain; "
                f"cannot derive finer {to_grain!r} partials from it"
            )
        df = df.drop("_grain")
    return rollup.rollup_partials(
        df.drop("_batch_id"),
        to_grain=to_grain,
        group_cols=group_cols,
    )


def compact_rollup_fragments(
    spark: SparkSession,
    path: str,
    *,
    group_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Fold a streamed partials table's per-batch fragments into one
    fragment per bucket — the maintenance job that keeps the partials
    table small after months of micro-batches (fragments grow with
    batch count even though the merged state is bounded by buckets ×
    groups).

    Associativity makes this pure bookkeeping: the merged rows are
    exactly ``rollup_partials`` at the table's own written grain, and
    :func:`read_rollup` answers identically before and after
    (asserted in tests). The rewritten table carries a single
    ``_batch_id = -1`` so later stream batches keep appending their
    own partitions alongside it and the next compaction folds them
    in turn.

    Crash safety is the whole-table retire→promote swap
    (sinks.compact_partitions' discipline): the new table is written
    aside, the live dir renamed away, the new one renamed in, and
    only then is the old copy deleted — at least one complete copy
    exists at every instant. Run it while the stream is NOT actively
    writing (between availableNow runs, or on the stream's pause
    schedule); a concurrent in-flight batch could land in the retired
    copy and be lost.

    Returns (fragments_before, fragments_after).
    """
    import os
    import shutil

    df = spark.read.parquet(path)
    n_before = df.select("_batch_id").distinct().count()
    grain_col = [c for c in df.columns if c == "_grain"]
    written = (
        df.select("_grain").first()["_grain"] if grain_col else "minute"
    )
    groups = list(group_cols or [])
    merged = rollup.rollup_partials(
        df.drop("_batch_id", *grain_col),
        to_grain=written,
        group_cols=groups,
    )
    out = merged.withColumn("_grain", F.lit(written)).withColumn(
        "_batch_id", F.lit(-1)
    )
    tmp = path.rstrip("/") + "_compact_tmp"
    old = path.rstrip("/") + "_compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        out.write.mode("overwrite")
        .partitionBy("_batch_id")
        .parquet(tmp)
    )
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_before, 1
