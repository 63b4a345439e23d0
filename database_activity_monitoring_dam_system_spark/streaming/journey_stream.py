"""Streaming maintenance of the transition-matrix partials
(operators/journeys.py transition_partials) — journey analytics kept
fresh by micro-batch, the rollup_stream fragment pattern applied to
the one journey primitive whose state is associative.

Why transitions stream and funnels don't: a transition COUNT is a sum
over consecutive pairs, so per-batch pair counts merge exactly — but
forming the pairs needs the pair that SPANS the batch boundary (last
event of the previous batches, first of this one), which no single
batch contains. That boundary is closed with a tiny per-user
last-event STATE table: each batch writes "my last event per user"
under its own ``_batch_id`` partition (dynamic overwrite — replay
rewrites exactly its own state, and the carry-in read filters
``_batch_id < current``, so a replayed batch sees exactly the state
it saw the first time). Funnels are the honest seam: step attribution
needs each user's FULL ordered window (an early step arriving late
can re-label every later step), so there is no bounded carry state —
funnels stay batch (or re-derive from these maintained partials'
source events); documenting that beats pretending.

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
from pyspark.sql.utils import AnalysisException

from ..operators import journeys


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
    available_now: bool = False,
):
    """Maintain ``grain`` transition partials from an event stream.

    Each micro-batch forms its OWN pairs plus the boundary pairs
    against the carried last-event state, reduces them to
    time-partials fragments under ``_batch_id=N`` at ``out_path``,
    and records its per-user last events under ``_batch_id=N`` at
    ``state_path`` — both dynamic partition overwrites, so replays
    are the identity. Query with rollup_stream.read_rollup
    (group_cols=['from_type', 'to_type']) and serve probabilities
    with journeys.transition_matrix; compact fragments with the
    existing rollup maintenance job.

    The state table is bounded by DISTINCT USERS × retained batches
    (one row per user per batch that saw them) — compacting the
    fragments does not touch it; prune old ``_batch_id`` state
    partitions once their batches can no longer replay (same horizon
    reasoning as the CDC tombstone journal)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        cols = [user_col, ts_col, id_col, type_col]
        batch = batch.select(*cols)
        src = batch.withColumn("_carry", F.lit(False))
        try:
            prior = spark.read.parquet(state_path).filter(
                F.col("_batch_id") < batch_id
            )
            w_last = Window.partitionBy(user_col).orderBy(
                F.col(ts_col).desc(), F.col(id_col).desc()
            )
            carry_in = (
                prior.withColumn("_rn", F.row_number().over(w_last))
                .filter(F.col("_rn") == 1)
                .select(*cols)
                .withColumn("_carry", F.lit(True))
            )
            src = src.unionByName(carry_in)
        except AnalysisException:
            pass  # first batch — no state yet
        w = Window.partitionBy(user_col).orderBy(
            F.col(ts_col), F.col(id_col)
        )
        # a pair counts in THIS batch iff its 'to' event is a batch
        # row: within-batch pairs, plus the one boundary pair per
        # user whose 'from' is the carried last event. Carried rows
        # as 'to' are pairs an earlier batch already counted.
        pairs = (
            src.withColumn("_next_type", F.lead(type_col).over(w))
            .withColumn("_next_ts", F.lead(ts_col).over(w))
            .withColumn("_next_carry", F.lead("_carry").over(w))
            .filter(
                F.col("_next_type").isNotNull()
                & ~F.col("_next_carry")
            )
            .select(
                F.col(ts_col).alias("ts"),
                F.col(type_col).alias("from_type"),
                F.col("_next_type").alias("to_type"),
                (
                    (
                        F.unix_millis("_next_ts")
                        - F.unix_millis(ts_col)
                    )
                    / F.lit(1000.0)
                ).alias("gap_seconds"),
            )
        )
        from ..operators import rollup

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
        w_batch_last = Window.partitionBy(user_col).orderBy(
            F.col(ts_col).desc(), F.col(id_col).desc()
        )
        last = (
            batch.withColumn("_rn", F.row_number().over(w_batch_last))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("_batch_id", F.lit(batch_id))
        )
        (
            last.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(state_path)
        )

    writer = events.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# journeys.transition_pairs is the shared pairing definition the
# batch twin uses; re-exported so callers see one module for the
# journey-streaming surface
transition_pairs = journeys.transition_pairs
