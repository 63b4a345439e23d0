"""Streaming maintenance of the transition-matrix partials
(operators/journeys.py transition_partials) — journey analytics kept
fresh by micro-batch, the rollup_stream fragment pattern applied to
the one journey primitive whose state is associative.

Why transitions stream and funnels don't: a transition COUNT is a sum
over consecutive pairs, so per-batch pair counts merge exactly — but
forming the pairs needs the pair that SPANS the batch boundary (last
event of the previous batches, first of this one), which no single
batch contains. That boundary is closed with a per-user last-event
SNAPSHOT table maintained the write_rate_state way (streaming/
stateful.py): each batch writes the FULL per-user snapshot (previous
snapshot merged with its own last events) under its own partition,
the reader takes the LATEST partition strictly before the current
batch id, and partitions more than ``keep_batches`` behind are
deleted — state stays O(users × keep_batches) with no small-files
growth, retries re-seed from the predecessor snapshot, and pruning
is SAFE because every partition is a complete snapshot (unlike a
per-batch delta journal, where pruning would lose idle users'
last events). Funnels are the honest seam: step attribution needs
each user's FULL ordered window (an early step arriving late can
re-label every later step), so there is no bounded carry state —
funnels stay batch (or re-derive from these maintained partials'
source events); documenting that beats pretending.

Pairing definition is journeys.transition_pairs — the SAME function
the batch twin reduces, with its ``carry_col`` seam marking carried
rows (valid as a pair's FROM, never its TO) — so stream ≡ batch holds
by construction, not by parallel implementations.

Correctness contract: exact ≡ batch when each user's events arrive in
event-time order ACROSS batches (in-batch disorder is fine — the
window sorts). An out-of-order straggler spanning a boundary would
pair against the wrong neighbor; the batch twin
(journeys.transition_partials) is the arbiter and the stream ≡ batch
test pins equality under the ordered-source contract.

The fragment table IS a rollup-partials table (n_events = transition
count; the millis fields carry dwell seconds), so the whole existing
maintenance stack applies unchanged: rollup_stream.read_rollup merges
fragments and grains, compact_rollup_fragments folds them
checkpoint-aware, and journeys.transition_matrix serves per-bucket
probabilities from the merged state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import journeys, rollup


def _read_last_events(
    spark, state_path: str, batch_id: int, cols: list[str], user_col: str
) -> DataFrame | None:
    """Latest per-user last-event snapshot strictly before
    ``batch_id`` (a retried batch re-seeds from its predecessor, not
    its own failed attempt). Existence is probed through the Hadoop
    FileSystem API — read_rate_state's discipline: depending on the
    source a missing path can surface lazily as FileNotFoundException
    inside the foreachBatch action (killing the stream) rather than
    as AnalysisException at read time, and a blanket except would
    also silently misread a REAL state error as 'first batch',
    dropping boundary pairs forever. Duplicate rows from a
    half-written retry partition collapse by read-side dedup."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(state_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    snap = spark.read.parquet(state_path)
    prior = snap.filter(F.col("_batch_id") < batch_id)
    latest = prior.agg(F.max("_batch_id")).first()[0]
    if latest is None:
        return None
    return (
        prior.filter(F.col("_batch_id") == latest)
        .dropDuplicates([user_col])
        .select(*cols)
    )


def _write_last_events(
    snapshot: DataFrame,
    state_path: str,
    batch_id: int,
    *,
    keep_batches: int,
) -> None:
    """Append this batch's FULL snapshot under its own partition,
    then prune partitions more than ``keep_batches`` behind — the
    write_rate_state retention contract (new snapshot durable before
    anything is removed; a retried batch's predecessor is always
    inside the keep window)."""
    spark = snapshot.sparkSession
    snapshot.withColumn("_batch_id", F.lit(batch_id)).write.mode(
        "append"
    ).partitionBy("_batch_id").parquet(state_path)
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(state_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("_batch_id="):
            continue
        try:
            old_id = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if old_id <= batch_id - keep_batches:
            fs.delete(status.getPath(), True)


def start_transition_stream(
    events: DataFrame,
    *,
    out_path: str,
    checkpoint_dir: str,
    state_path: str,
    grain: str = "day",
    ts_col: str = "ts",
    id_col: str = "event_id",
    user_col: str = "user_id",
    type_col: str = "event_type",
    keep_batches: int = 3,
    available_now: bool = False,
):
    """Maintain ``grain`` transition partials from an event stream.

    Each micro-batch forms its pairs (own rows plus the boundary
    pairs against the carried snapshot) with the SHARED pairing
    definition, reduces them to time-partials fragments under
    ``_batch_id=N`` at ``out_path`` (dynamic overwrite — replay
    rewrites exactly its own fragment), and rolls the per-user
    last-event snapshot forward at ``state_path``. Query with
    rollup_stream.read_rollup (group_cols=['from_type', 'to_type'])
    and serve probabilities with journeys.transition_matrix; compact
    fragments with the existing rollup maintenance job (the state
    table needs no compaction — it is retention-pruned in-line)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        cols = [user_col, ts_col, id_col, type_col]
        batch = batch.select(*cols)
        carry_in = _read_last_events(
            spark, state_path, batch_id, cols, user_col
        )
        src = batch.withColumn("_carry", F.lit(False))
        if carry_in is not None:
            src = src.unionByName(
                carry_in.withColumn("_carry", F.lit(True))
            )
        pairs = journeys.transition_pairs(
            src,
            user_col=user_col,
            ts_col=ts_col,
            type_col=type_col,
            id_col=id_col,
            carry_col="_carry",
        )
        partials = rollup.time_partials(
            pairs,
            ts_col="ts",
            value_col="gap_seconds",
            grain=grain,
            group_cols=["from_type", "to_type"],
        )
        (
            partials.withColumn("_grain", F.lit(grain))
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )
        # roll the snapshot forward: previous snapshot ∪ this batch,
        # latest event per user (ts, id)-desc — a COMPLETE snapshot,
        # so retention pruning can never lose an idle user's last
        # event
        merged = src.drop("_carry")
        w_last = Window.partitionBy(user_col).orderBy(
            F.col(ts_col).desc(), F.col(id_col).desc()
        )
        snapshot = (
            merged.withColumn("_rn", F.row_number().over(w_last))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        _write_last_events(
            snapshot, state_path, batch_id, keep_batches=keep_batches
        )

    writer = events.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
