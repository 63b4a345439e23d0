"""SparkSession factory.

Pins a single session timezone (UTC) — the reference mixes IST writes
(`app.py:257`) with MySQL server-time `NOW()` predicates (`app.py:281`);
we instead evaluate every "now"-relative predicate against an explicit
anchor timestamp so results are deterministic and timezone-clean.

Scale defaults: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), Arrow on (vectorized pandas interchange), shuffle
partitions sized for the local harness but overridable for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Production streaming profile: RocksDB-backed state store (bounds
# executor heap for large keyed state — per-user rate windows, session
# windows, dedup state — and survives executor restarts via the
# checkpoint). The default HDFS-backed in-memory provider is fine for
# tests; at 100 TB / millions of keys, RocksDB is the standard choice.
# Changelog checkpointing ships per-batch deltas instead of full
# SST uploads.
ROCKSDB_STREAMING_CONF: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
        "true",
}


def get_spark(
    app_name: str = "dam-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for this engine.

    Queries in :mod:`..plans` never create sessions themselves — they
    receive one (the driver passes its own); this factory serves tests,
    bench.py, and ad-hoc use.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    # local[N] runs everything in the driver JVM; the 1g default heap
    # OOMs around sf1 (measured: contamination_flags at 50k docs).
    # Only effective at JVM launch — a pre-existing session keeps its
    # heap.  On a real cluster this maps to executor memory sizing.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Shuffled-hash-join policy: ONLY the AQE rewrite below, which
        # converts a planned sort-merge join at runtime when every
        # post-shuffle partition is under 64MB — keyed off ACTUAL
        # bytes, so the non-spillable build side is memory-bounded at
        # any scale. The static preferSortMergeJoin=false knob was
        # removed (round 14): it keys off size ESTIMATES (often wrong
        # after filters), its build side cannot spill (executor OOM
        # where sort-merge would have spilled), and paired A/B showed
        # it neutral-to-slower here (market_share 1.10 vs 1.40 s warm;
        # up to 4x slower cold-session).
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64MB",
        )
        .config("spark.sql.adaptive.enabled", "true")
        # The generated-class cache defaults to 100 entries; a session
        # serving a large query battery (the 188-gate bench, a real
        # multi-tenant serving driver) evicts every class between two
        # runs of the same query, so each run executes a freshly
        # loaded class at interpreter/C1 speed — measured 0.2 s
        # (JIT-warm) vs 0.9–2.5 s (cold class) on firewall_matches'
        # when-chain. 1000 entries keeps the battery's classes (and
        # their JIT state) resident; generated classes are KB-sized,
        # so the driver cost is negligible at any scale.
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Runtime bloom-filter join pruning: when a selective dim side
        # can't broadcast, Catalyst builds a bloom filter over its
        # join keys and pushes might_contain() into the fact scan —
        # the fact table is pre-filtered BEFORE its shuffle, the
        # classic semi-join reduction at 100 TB. Off by default in
        # Spark; on here (test_plans pins the injection). Thresholds
        # stay at Spark defaults — the filter only builds when the
        # creation side is small enough to be worth it.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # InferFiltersFromGenerate duplicates each explode's generator
        # expression into a size()>0 filter on the scan (interpreted,
        # pre-split) — measured 5× slowdown on shingle pipelines whose
        # arrays are never empty by construction.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
