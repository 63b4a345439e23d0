"""CDC merge-upsert: apply a keyed changelog (upserts + deletes with a
monotone sequence) to a snapshot table — MERGE INTO semantics on plain
parquet, batch and (via streaming/cdc_stream) micro-batch.

The reference mutates state row-at-a-time through MySQL
(INSERT/UPDATE/DELETE in /root/reference/app.py throughout); at 100 TB
the analytics copy of that state is a partitioned parquet snapshot and
changes arrive as a changelog. The merge here is the lakehouse
MERGE/upsert pattern on plain files:

- reduce the changelog to its LATEST change per key (one shuffle over
  the CHANGES, which are batch-sized, not table-sized);
- anti-join the snapshot against the (broadcast) changed-key set —
  survivors pass through untouched;
- union the non-delete latest changes in.

``merge_upsert_partitioned`` adds the storage side: only partitions
the changelog actually touches are read (partition-pruned scan) and
rewritten (dynamic partition overwrite), so merge cost scales with the
CHANGE set, not the table — the Hive/Delta upsert discipline on plain
parquet. A partition whose rows are ALL deleted cannot be expressed by
a dynamic overwrite (nothing is written there), so those are removed
through the FileSystem API after the write.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..ckpt import unpersist as _ckpt_unpersist


def latest_changes(
    changes: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """The winning (highest-``seq_col``) change per key. The sequence
    must be unique per key (a changelog offset / LSN); equal
    sequences would make the winner nondeterministic, so ties are
    broken by op descending ('U' > 'D') only to keep reruns stable —
    fix the upstream log if you ever rely on it."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """Merged snapshot: base rows whose key has no change survive
    untouched; changed keys take their latest non-delete row; deleted
    keys vanish. ``changes`` must carry every base column (plus
    ``op_col``); the changed-key set is broadcast for the anti-join,
    so the snapshot never shuffles — the merge's only wide work is
    the batch-sized changelog reduction.

    Replay contract — read carefully: the seq guard protects rows
    PRESENT in the snapshot (a redelivered old update loses to the
    newer row), but a DELETE leaves no tombstone, so redelivering a
    changelog segment OLDER than an already-applied delete
    re-inserts the dead key (its seq beats the now-absent row).
    Safe inputs are therefore: (a) the most recent batch replayed
    any number of times — structured streaming's only redelivery
    mode, what streaming/cdc_stream relies on — or (b) segments
    applied strictly in order, each at most until the next has been
    applied — or (c) ANY redelivery order, provided a tombstone
    journal is maintained and passed as ``tombstones``: a frame of
    ``key_cols`` + ``seq_col`` (plus a ``deleted_at`` retention
    stamp, ignored here) recording applied deletes. A change loses
    to a tombstone with an equal-or-higher sequence — a stale
    pre-delete UPDATE can no longer re-insert the dead key — while
    a change sequenced ABOVE the tombstone legitimately resurrects
    it (a real re-insert after the delete). Maintain the journal
    with :func:`extract_tombstones` / :func:`merge_tombstones` and
    bound it with :func:`prune_tombstones` (Delta/Hudi keep delete
    markers in the log for exactly this; the horizon must cover the
    maximum redelivery lag). The tombstone join is change-keyed on
    one side and horizon-bounded on the other — never table-sized;
    AQE picks the build side at runtime."""
    missing = [c for c in base.columns if c not in changes.columns]
    if missing:
        raise ValueError(
            f"apply_changes: changes lack base columns {missing}"
        )
    latest = latest_changes(
        changes, key_cols=key_cols, seq_col=seq_col, op_col=op_col
    )
    if tombstones is not None:
        # delete-journal arbitration BEFORE the merge: a change whose
        # sequence does not beat its key's tombstone is a stale
        # pre-delete row redelivered out of order — discard it
        # wholesale (the key stays dead and its partition untouched)
        # fold to one row per key first: a raw journal that skipped
        # merge_tombstones can carry duplicate key rows, and a
        # duplicated key would fan out the left join below, emitting
        # duplicate upserts into the merged snapshot. The highest
        # sequence governs (same arbitration merge_tombstones keeps).
        tomb = tombstones.groupBy(*key_cols).agg(
            F.max(seq_col).alias("_tomb_seq")
        )
        latest = (
            latest.join(tomb, on=key_cols, how="left")
            .filter(
                F.col("_tomb_seq").isNull()
                | (F.col(seq_col) > F.col("_tomb_seq"))
            )
            .drop("_tomb_seq")
        )
    changed_keys = latest.select(*key_cols)
    survivors = base.join(
        F.broadcast(changed_keys), on=key_cols, how="left_anti"
    )
    if seq_col in base.columns:
        # stale-replay guard: a change only wins if its sequence
        # beats the snapshot row's — an at-least-once upstream can
        # redeliver old changelog segments without regressing rows.
        # Both sides of this arbitration are CHANGE-key-sized (the
        # base side is a broadcast semi join), so the guard adds no
        # table-sized work; the full-outer arbitration itself is the
        # one sort-merge in the plan (full outer cannot broadcast)
        # and both its inputs are changelog-bounded (plan-guarded).
        contested = base.join(
            F.broadcast(changed_keys), on=key_cols, how="left_semi"
        )
        chg = latest.select(
            *key_cols,
            F.col(op_col).alias("_chg_op"),
            *[
                F.col(c).alias(f"_chg_{c}")
                for c in base.columns
                if c not in key_cols
            ],
        )
        arb = contested.join(chg, on=key_cols, how="full_outer")
        chg_seq = F.col(f"_chg_{seq_col}")
        chg_wins = chg_seq.isNotNull() & (
            F.col(seq_col).isNull() | (chg_seq > F.col(seq_col))
        )
        keep = arb.filter(
            ~(chg_wins & (F.col("_chg_op") == delete_op))
        )
        merged_rows = keep.select(
            *key_cols,
            *[
                F.when(chg_wins, F.col(f"_chg_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in base.columns
                if c not in key_cols
            ],
        )
        return survivors.unionByName(merged_rows)
    upserts = latest.filter(F.col(op_col) != delete_op).select(
        *base.columns
    )
    return survivors.unionByName(upserts)


def snapshot_as_of(
    base: DataFrame,
    journal: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str,
    as_of,
    as_of_col: str | None = None,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Time travel: reconstruct the table as it stood at a point in
    journal history — the Delta/Iceberg ``VERSION AS OF`` semantics
    on a plain keyed changelog. ``base`` is the state BEFORE the
    journal's first entry (pass an empty frame with the snapshot
    schema for a journal that starts at table creation); the journal
    is sliced at ``as_of`` (inclusive) along ``as_of_col`` — the
    sequence axis by default, or a commit-timestamp column for
    wall-clock travel (it must be monotone in ``seq_col`` per key,
    which any LSN-stamped log satisfies) — and the slice replays
    through the same :func:`apply_changes` arbitration the live
    merge uses, so travel and merge can never disagree on winner /
    stale / delete semantics.

    Scale shape: the slice predicate pushes to the journal scan
    (partition the journal by day/sequence range and the slice is a
    pruned read); everything after is apply_changes — change-sized
    shuffles, broadcast anti-join, snapshot never shuffles. The
    reference keeps no history at all (MySQL UPDATEs in place,
    /root/reference/app.py throughout); this is what replaces
    point-in-time audit ("what did the table say when the alert
    fired?") at 100 TB."""
    axis = as_of_col or seq_col
    cut = journal.filter(F.col(axis) <= F.lit(as_of))
    return apply_changes(
        base,
        cut,
        key_cols=key_cols,
        seq_col=seq_col,
        op_col=op_col,
        delete_op=delete_op,
    )


def scd2_intervals(
    journal: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 view of a keyed changelog:
    each non-delete change becomes a VALIDITY INTERVAL row —
    ``valid_from`` = its own sequence, ``valid_to`` = the key's next
    change (NULL = still current, flagged ``is_current``). The lead
    is computed over ALL changes INCLUDING deletes, so the interval
    preceding a delete closes at the delete's sequence and the dead
    span simply has no row — then delete rows drop out. Requires the
    journal's sequence to be unique per key (same contract as
    :func:`latest_changes`).

    One window over the journal's own key partitioning — no joins,
    no table scan; the output is journal-sized. Every ``snapshot_as_of``
    point query becomes a BETWEEN predicate on this view, which is
    how an audit UI serves "state at time T" without replaying."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    # a NULL op would fall through `op != delete_op` as a SILENT drop
    # (the row still closes the preceding interval via lead(), then
    # vanishes from the view) — refuse at execution instead, the
    # index_maintenance._arbitrate_batch discipline in lazy form
    checked_op = F.when(
        F.col(op_col).isNotNull(), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.lit(
                "scd2_intervals: journal carries a NULL "
                f"{op_col!r} row — ambiguous operation; clean the feed"
            )
        )
    )
    return (
        journal.withColumn(op_col, checked_op)
        .withColumn("_valid_to", F.lead(seq_col).over(w))
        .filter(F.col(op_col) != delete_op)
        .withColumn("is_current", F.col("_valid_to").isNull())
        .withColumnRenamed("_valid_to", "valid_to")
        .drop(op_col)
    )


def extract_tombstones(
    changes: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    deleted_at: dt.datetime,
) -> DataFrame:
    """The delete journal rows a changelog batch contributes:
    (key, highest delete seq, ``deleted_at``). Extract AFTER applying
    the batch and fold into the persisted journal with
    :func:`merge_tombstones`; ``deleted_at`` is the retention stamp
    :func:`prune_tombstones` ages out — pass it explicitly (wall
    clock is the caller's, not the engine's, same contract as the
    maintenance jobs). Change-batch-sized work: one filter + one
    keyed aggregate over the batch."""
    return (
        changes.filter(F.col(op_col) == delete_op)
        .groupBy(*key_cols)
        .agg(F.max(seq_col).alias(seq_col))
        .withColumn("deleted_at", F.lit(deleted_at).cast("timestamp"))
    )


def merge_tombstones(
    journal: DataFrame,
    new: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str,
) -> DataFrame:
    """Fold a batch's tombstones into the journal: one row per key,
    highest delete sequence wins, newest ``deleted_at`` stamp kept
    (so re-deleting a resurrected key RENEWS its retention). Both
    inputs are journal-shaped (key + seq + deleted_at); the result
    replaces the journal table."""
    return (
        journal.unionByName(new)
        .groupBy(*key_cols)
        .agg(
            F.max(seq_col).alias(seq_col),
            F.max("deleted_at").alias("deleted_at"),
        )
    )


def prune_tombstones(
    journal: DataFrame, *, older_than: dt.datetime
) -> DataFrame:
    """Retention: drop journal rows whose ``deleted_at`` predates
    ``older_than``. The horizon must cover the upstream's maximum
    redelivery lag — a pruned tombstone reopens the re-insert window
    for changelog segments older than it (the documented trade every
    log-compacted CDC store makes)."""
    return journal.filter(
        F.col("deleted_at") >= F.lit(older_than).cast("timestamp")
    )


def merge_upsert_partitioned(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    *,
    key_cols: list[str],
    partition_col: str,
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tombstones: DataFrame | None = None,
) -> list[str]:
    """Apply ``changes`` to the partitioned snapshot at ``path``,
    touching only the partitions the changelog names: the snapshot
    scan is pruned to those partitions, and the dynamic partition
    overwrite rewrites exactly them. The key's partition value must
    be FUNCTIONALLY DETERMINED by the key (rows never move between
    partitions), which is what makes partition-scoped merge exact.

    Returns the touched partition values (as strings). Partitions
    left empty by deletes are removed via the FileSystem API — a
    dynamic overwrite cannot express 'this partition is now empty'.
    With ``tombstones``, a partition named ONLY by journal-blocked
    stale changes is still rewritten (as an identity) — touched
    partitions are derived from the raw changelog before the
    arbitration runs.
    """
    # collect each touched value TWICE: typed (for the pruned-scan
    # filter) and as Spark's own cast-to-string (for directory names
    # — Python's str() disagrees with Spark's rendering for e.g.
    # booleans: dir 'pb=true' vs str(True) == 'True')
    touched_rows = (
        changes.select(
            F.col(partition_col).alias("_v"),
            F.col(partition_col).cast("string").alias("_s"),
        )
        .distinct()
        .collect()
    )
    touched = [r["_v"] for r in touched_rows]
    touched_str = {r["_v"]: r["_s"] for r in touched_rows}
    if not touched:
        return []
    # NULL needs its own predicate: `NULL IN (...)` is SQL NULL, so a
    # bare isin() would silently EXCLUDE the NULL partition's base
    # rows — the merge would then rewrite (or delete) that partition
    # from the changes alone, destroying its untouched keys
    non_null = [v for v in touched if v is not None]
    pred = (
        F.col(partition_col).isin(non_null)
        if non_null
        else F.lit(False)
    )
    if any(v is None for v in touched):
        pred = pred | F.col(partition_col).isNull()
    base = spark.read.parquet(path).filter(pred)
    merged = apply_changes(
        base,
        changes,
        key_cols=key_cols,
        seq_col=seq_col,
        op_col=op_col,
        delete_op=delete_op,
        tombstones=tombstones,
    )
    merged = merged.localCheckpoint(eager=True)  # sever self-read
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    # partitions whose rows were all deleted: nothing was written, so
    # the stale files survive the dynamic overwrite — drop them
    remaining = {
        r[0]
        for r in merged.select(partition_col).distinct().collect()
    }
    _ckpt_unpersist(merged)  # write + collect above fully consumed it
    emptied = [p for p in touched if p not in remaining]
    if emptied:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path
        root = hpath(path)
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        # directory names must be HIVE-ESCAPED exactly as the writer
        # escaped them (':' → '%3A' etc., NULL → the default
        # partition name), over SPARK's string rendering of the value
        # (not Python's) — both halves use Spark's own machinery so
        # neither can disagree with what the writer produced
        esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        for p in emptied:
            dirname = (
                esc.DEFAULT_PARTITION_NAME()
                if p is None
                else esc.escapePathName(touched_str[p])
            )
            part_dir = hpath(root, f"{partition_col}={dirname}")
            if fs.exists(part_dir):
                fs.delete(part_dir, True)
    return [
        touched_str[p]
        if touched_str[p] is not None
        else "__HIVE_DEFAULT_PARTITION__"
        for p in touched
    ]
