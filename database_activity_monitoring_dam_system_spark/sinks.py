"""Partitioned table sinks — the storage layout story for 100 TB.

activity_logs is partitioned by event DATE (mirrors the reference's
idx_timestamp secondary index, sql/02_create_tables.sql:42): every
time-ranged query (F6/F7, dashboards, compliance periods) prunes to
the touched partitions at the parquet-listing level, before any read.

Writers are plain ``DataFrameWriter`` appends so the same functions are
valid inside ``foreachBatch``; a date-partitioned layout plus AQE
coalescing keeps file counts sane (at cluster scale add a periodic
compaction job over cold partitions — ``compact_partitions`` below).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "event_date"


def write_activity_partitioned(
    activity: DataFrame, path: str, *, mode: str = "append"
) -> None:
    (
        activity.withColumn(
            PARTITION_COL, F.to_date("access_timestamp")
        )
        .write.mode(mode)
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )


def read_activity(spark: SparkSession, path: str) -> DataFrame:
    """Read back; time predicates on event_date prune partitions
    (visible as PartitionFilters in the scan node)."""
    return spark.read.parquet(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    *,
    target_bytes: int = 128 << 20,
    min_files: int = 2,
    cold_before: dt.date | None = None,
) -> dict[str, tuple[int, int]]:
    """Small-file compaction over the date-partitioned activity table —
    the maintenance job streaming appends make necessary at scale
    (every micro-batch writes ≥1 file per touched partition; a day of
    30 s batches is ~2 880 files/partition of a few KB each, and scan
    task scheduling drowns in file listings long before data volume
    matters).

    For each ``event_date=...`` partition whose file count exceeds
    ceil(bytes/target_bytes) (and ``min_files``), the partition is
    rewritten into exactly that many files and swapped in.

    ``cold_before`` scopes the pass to partitions strictly OLDER than
    the given date — in a live deployment pass yesterday (or the
    stream's watermark date) so the partition concurrent appends are
    landing in is never rewritten; the default (None) compacts every
    partition and is only safe when no writer is active.

    Crash safety: the swap is retire-then-promote — the live dir is
    RENAMED aside to ``_compact_old_<date>`` (never deleted while it is
    the only copy), the rewritten dir is renamed into place, and only
    then is the retired copy deleted. A crash at any point leaves at
    least one complete copy on disk, and the next run's recovery sweep
    finishes the promotion (or clears a stale tmp). A lakehouse table
    format's OPTIMIZE is the transactional version of this pass; this
    is its plain-parquet equivalent.

    Returns {partition_name: (files_before, files_after)}.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    root = hpath(path)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return {}

    def _part_path(date_str: str) -> object:
        return hpath(root, f"{PARTITION_COL}={date_str}")

    # recovery sweep: finish (or discard) the leftovers of a crashed run
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("_compact_old_"):
            date_str = name.removeprefix("_compact_old_")
            if fs.exists(_part_path(date_str)):
                # promotion completed before the crash → retired copy
                # is redundant
                fs.delete(st.getPath(), True)
            else:
                # crashed between retire and promote → restore the
                # retired copy; a stale tmp (if any) is cleared below
                fs.rename(st.getPath(), _part_path(date_str))
        elif name.startswith("_compact_tmp_"):
            fs.delete(st.getPath(), True)

    compacted: dict[str, tuple[int, int]] = {}
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        part = st.getPath().getName()
        if not part.startswith(f"{PARTITION_COL}="):
            continue
        date_str = part.split("=", 1)[1]
        if cold_before is not None:
            try:
                if dt.date.fromisoformat(date_str) >= cold_before:
                    continue
            except ValueError:
                continue  # __HIVE_DEFAULT_PARTITION__ etc: leave alone
        files = [
            f
            for f in fs.listStatus(st.getPath())
            if f.isFile() and not f.getPath().getName().startswith("_")
        ]
        size = sum(f.getLen() for f in files)
        want = max(1, -(-size // target_bytes))  # ceil
        if len(files) <= max(want, min_files - 1):
            continue
        part_dir = st.getPath()
        tmp = hpath(root, f"_compact_tmp_{date_str}")
        old = hpath(root, f"_compact_old_{date_str}")
        (
            spark.read.parquet(part_dir.toString())
            .repartition(int(want))
            .write.mode("overwrite")
            .parquet(tmp.toString())
        )
        # drop the success marker so the promoted dir holds only data
        marker = hpath(tmp, "_SUCCESS")
        if fs.exists(marker):
            fs.delete(marker, False)
        # retire → promote → clear: one complete copy exists throughout
        fs.rename(part_dir, old)
        fs.rename(tmp, part_dir)
        fs.delete(old, True)
        n_after = sum(
            1
            for f in fs.listStatus(part_dir)
            if f.isFile() and not f.getPath().getName().startswith("_")
        )
        compacted[part] = (len(files), n_after)
    return compacted


def retire_cold_partitions(
    spark: SparkSession,
    path: str,
    *,
    older_than: dt.date,
    dry_run: bool = False,
) -> list[str]:
    """Retention/TTL enforcement over the date-partitioned activity
    table: DROP every ``event_date=<d>`` partition with d strictly
    older than ``older_than`` — the compliance-driven twin of
    :func:`compact_partitions` (the reference keeps MySQL rows
    forever; a 100 TB deployment's audit-retention policy is a
    partition-level delete, never a row-level scan).

    Partition-level deletion is what makes TTL free at scale: no
    data is read, each drop is one directory delete, and a crash
    between drops just leaves the remainder for the next run
    (re-running is idempotent). Readers racing a drop see parquet's
    usual file-listing semantics — run it on the same maintenance
    schedule as compaction. ``dry_run`` returns the candidate
    partitions without touching them.

    Returns the partition names dropped (or would-be dropped)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    root = hpath(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    dropped: list[str] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(f"{PARTITION_COL}=")):
            continue
        date_str = name.split("=", 1)[1]
        try:
            if dt.date.fromisoformat(date_str) >= older_than:
                continue
        except ValueError:
            continue  # __HIVE_DEFAULT_PARTITION__ etc: leave alone
        dropped.append(name)
        if not dry_run:
            fs.delete(st.getPath(), True)
    return sorted(dropped)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    buckets: int = 8,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a hash-bucketed, bucket-sorted parquet table — the
    co-located-join layout for repeated large joins on a stable key.

    At 100 TB a fact×fact join (e.g. activity_logs × alerts on
    activity_id, or events × events on user_id) pays a full shuffle of
    BOTH sides every query. Bucketing pays that shuffle ONCE at write
    time: both tables hash-partitioned into the same ``buckets`` count
    on the same key make every subsequent equi-join a zero-exchange
    SortMergeJoin (asserted in test_plans — no Exchange node on either
    side). The bucket count is the join parallelism; pick it for the
    steady-state cluster, not the write job.

    Bucketing metadata lives in the session catalog, so readers must go
    through ``spark.table(table)`` — a raw ``spark.read.parquet(path)``
    sees plain files and re-shuffles. ``path`` makes it an external
    table (data survives catalog loss, metadata does not).
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
