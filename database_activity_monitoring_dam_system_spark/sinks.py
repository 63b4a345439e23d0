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
