"""Streaming CDC apply: maintain a keyed, partitioned parquet snapshot
from a changelog stream — each micro-batch is one
``cdc.merge_upsert_partitioned`` call inside ``foreachBatch``.

Replay safety stacks two guarantees: structured streaming only ever
replays the LAST uncommitted batch (batches commit in order), and the
merge itself carries the sequence-number guard (a change wins only if
its seq beats the snapshot row's), so reapplying an already-applied
batch is the identity. Together: exactly-once table state from an
at-least-once stream, with no lakehouse transaction log.

100 TB posture: per batch, the snapshot scan and rewrite touch only
the partitions that batch's changes name — merge cost follows the
changelog rate, not the table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import cdc


def start_cdc_stream(
    changes: DataFrame,
    *,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    partition_col: str,
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    available_now: bool = False,
):
    """Apply each micro-batch of ``changes`` to the snapshot at
    ``table_path``. The table must exist (write an initial snapshot
    first — an empty one is fine); see cdc.merge_upsert_partitioned
    for the partition-functional-dependency requirement."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        cdc.merge_upsert_partitioned(
            batch.sparkSession,
            table_path,
            batch,
            key_cols=key_cols,
            partition_col=partition_col,
            seq_col=seq_col,
            op_col=op_col,
            delete_op=delete_op,
        )

    writer = changes.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_journal_stream(
    changes: DataFrame,
    *,
    journal_path: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Maintain the change JOURNAL artifact from the same changelog
    stream — the history table ``cdc.snapshot_as_of`` /
    ``cdc.scd2_intervals`` serve time travel and audit views from,
    where ``start_cdc_stream`` maintains only the CURRENT state.

    Each micro-batch lands verbatim under its own ``_batch_id=N``
    partition via dynamic overwrite (the rollup-fragment discipline):
    a replayed batch rewrites exactly its own fragment, so the
    journal is append-only AND redelivery-idempotent without a
    read-modify-write. Readers take ``spark.read.parquet(path)`` —
    fragment boundaries are invisible to the sequence axis. Pair with
    ``cdc.prune_tombstones``-style retention by dropping whole
    ``_batch_id`` partitions older than the audit horizon (partition-
    level deletes, never a rewrite)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        (
            batch.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(journal_path)
        )

    writer = changes.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
