"""Streaming corpus-quality filtering — the training-data filters as
an incremental ingest stage.

A 100 TB pretraining pipeline doesn't re-score the whole corpus per
crawl drop; new documents stream through the SAME quality/repetition
expressions the batch path uses (textops.quality_scores /
repetition_signals are pure projections — zero shuffles, zero state),
get a keep/drop verdict, and land in a partitioned sink with the
verdict as a partition column so downstream training-mix jobs prune to
``verdict=keep`` without reading rejects. Exact in-stream dedup by
content fingerprint composes in front via dropDuplicatesWithinWatermark
(bounded state — see dedup_stream.py).

Batch/stream parity is structural: both paths run the same Column
expressions (pinned by tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators import dedup, textops

DOC_EVENT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def read_doc_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based JSON-lines document stream (one crawl shard per
    file); in production the same unbounded-table semantics come from
    a Kafka topic or cloud-storage notification source."""
    return (
        spark.readStream.schema(DOC_EVENT)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1000)
        .json(source_dir)
    )


def score_documents(docs: DataFrame) -> DataFrame:
    """The combined per-document filter projection: quality heuristics,
    repetition signals, exact-dedup fingerprint — one pass, no shuffle,
    identical in batch and streaming (it is only projections).

    ``verdict`` is the FIRST failing filter (quality short/noisy/
    low-fluency checks, then the repetition caps), 'keep' otherwise —
    the precedence a staged filter pipeline would apply.

    All signals come from the SAME Column builders the standalone
    batch operators use (textops.quality_signal_cols /
    repetition_mid_cols / repetition_final_cols, dedup fingerprint),
    selected from ``docs`` directly — genuinely stateless in a
    streaming plan.  An earlier version joined three projections of
    the stream on doc_id; Spark plans that as
    StreamingSymmetricHashJoinExec, whose unwatermarked state retains
    every row forever — the fused projection has no state operator at
    all.
    """
    q = textops.quality_signal_cols("text")
    m = textops.repetition_mid_cols("text")
    mid = docs.select(
        "*",
        F.md5(dedup.normalized_text("text")).alias("fingerprint"),
        F.round(q["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(q["punct_ratio"], 4).alias("punct_ratio"),
        q["verdict"].alias("_q_verdict"),
        m["n_chars"].alias("n_chars"),
        m["n_tokens"].alias("n_tokens"),
        m["n_distinct"].alias("n_distinct"),
        m["_t2"].alias("_t2"),
        m["_d3"].alias("_d3"),
    )
    f = textops.repetition_final_cols()
    verdict = (
        F.when(F.col("_q_verdict") != "keep", F.col("_q_verdict"))
        .when(f["verdict"] != "keep", f["verdict"])
        .otherwise("keep")
    )
    return mid.select(
        *docs.columns,
        "fingerprint",
        "stopword_ratio",
        "punct_ratio",
        f["repeated_token_frac"].alias("repeated_token_frac"),
        f["top_bigram_frac"].alias("top_bigram_frac"),
        f["dup_trigram_frac"].alias("dup_trigram_frac"),
        verdict.alias("verdict"),
    )


def start_corpus_filter(
    spark: SparkSession,
    source_dir: str,
    *,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """End-to-end incremental corpus filter: stream → score → append to
    a verdict-partitioned parquet sink. The whole pipeline is one
    stateless projection (repetition/quality/fingerprint expressions
    selected straight from the stream — no joins, no state operator),
    so there is no state store to size and a restart resumes from the
    checkpoint offsets alone (asserted by
    test_corpus_filter_stream_is_stateless).
    """
    stream = read_doc_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    scored = score_documents(stream)
    writer = (
        scored.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("verdict")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
