"""Loaders for the driver-generated parquet testdata (TESTDATA.md).

All reads go through ``spark.read.parquet`` so Catalyst gets native
column pruning + predicate pushdown into the scan. At cluster scale the
same call works against a partitioned table root; nothing here assumes
local paths beyond the ``sf_dir`` argument.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The testdata parquet files are written as a SINGLE row group, and
# parquet scans cannot split below row-group granularity — so every
# scan-side projection (tokenize, minhash, battery regexes) runs in ONE
# task no matter how many cores the session has. At cluster scale the
# input has ~maxPartitionBytes-sized splits and this never triggers; on
# the single-row-group bench files, bench.py sets this switch to fan
# the scan out to the session's parallelism with one tiny round-robin
# exchange. OFF by default: correctness runs and the plan-invariant
# tests audit raw scan plans.
_SPLIT_ENV = "SPARK_DAM_SPLIT_SMALL_SCANS"

# Only the corpus tables carry per-row compute heavy enough (shingle
# hashing, 32-way minhash, vector math) to pay for the extra exchange;
# the relational tables' gates are aggregation-bound and the round-
# robin shuffle just adds a stage.
_SPLIT_TABLES = frozenset({"documents", "embeddings"})


def _maybe_split(spark: SparkSession, df: DataFrame, name: str) -> DataFrame:
    if name not in _SPLIT_TABLES or os.environ.get(_SPLIT_ENV) != "1":
        return df
    return df.repartition(spark.sparkContext.defaultParallelism)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; have {TESTDATA_TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read the raw int64 nanos and truncate to µs
        # (exactly what DuckDB's µs-native TIMESTAMP does), so both
        # engines see identical values.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dict(df.dtypes).get("ts") == "timestamp_ntz":
            # Some testdata generations write µs TIMESTAMP_NTZ instead of
            # int64 nanos. Normalize to the engine schema's TimestampType
            # (schemas.py:142) — value-identical under the pinned-UTC
            # session, and keeps every downstream type check
            # (isoformat export, streaming watermarks) on one type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return _maybe_split(spark, df, name)
    return _maybe_split(spark, spark.read.parquet(f"{sf_dir}/{name}.parquet"), name)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
