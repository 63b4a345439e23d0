"""Partitioned table sinks — the storage layout story for 100 TB.

activity_logs is partitioned by event DATE (mirrors the reference's
idx_timestamp secondary index, sql/02_create_tables.sql:42): every
time-ranged query (F6/F7, dashboards, compliance periods) prunes to
the touched partitions at the parquet-listing level, before any read.

Writers are plain ``DataFrameWriter`` appends so the same functions are
valid inside ``foreachBatch``; a date-partitioned layout plus AQE
coalescing keeps file counts sane (at cluster scale add a periodic
compaction job over cold partitions).
"""

from __future__ import annotations

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
) -> dict[str, tuple[int, int]]:
    """Small-file compaction over the date-partitioned activity table —
    the maintenance job streaming appends make necessary at scale
    (every micro-batch writes ≥1 file per touched partition; a day of
    30 s batches is ~2 880 files/partition of a few KB each, and scan
    task scheduling drowns in file listings long before data volume
    matters).

    For each ``event_date=...`` partition whose file count exceeds
    ceil(bytes/target_bytes) (and ``min_files``), the partition is
    rewritten into exactly that many files and swapped in. The swap is
    rename-based — crash-safe to the extent of the filesystem's rename
    (a lakehouse table format's OPTIMIZE is the transactional version;
    this is its plain-parquet equivalent, scoped to COLD partitions so
    concurrent appends to today's partition are never touched).

    Returns {partition_name: (files_before, files_after)}.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return {}
    compacted: dict[str, tuple[int, int]] = {}
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        part = st.getPath().getName()
        if not part.startswith(f"{PARTITION_COL}="):
            continue
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
        tmp = jvm.org.apache.hadoop.fs.Path(
            root, f"_compact_tmp_{part.split('=', 1)[1]}"
        )
        (
            spark.read.parquet(part_dir.toString())
            .repartition(int(want))
            .write.mode("overwrite")
            .parquet(tmp.toString())
        )
        fs.delete(part_dir, True)
        fs.rename(tmp, part_dir)
        # drop the success marker so the dir holds only data files
        marker = jvm.org.apache.hadoop.fs.Path(part_dir, "_SUCCESS")
        if fs.exists(marker):
            fs.delete(marker, False)
        n_after = sum(
            1
            for f in fs.listStatus(part_dir)
            if f.isFile() and not f.getPath().getName().startswith("_")
        )
        compacted[part] = (len(files), n_after)
    return compacted
