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


def score_documents(
    docs: DataFrame,
    *,
    gopher_stopwords: tuple[str, ...] | None = None,
) -> DataFrame:
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

    ``gopher_stopwords`` inserts the Gopher word-rule battery
    (textops.gopher_verdict_col — the same rule definition the batch
    operator and the pipeline gate use) between the quality heuristics
    and the repetition caps, cheap-to-expensive, matching
    run_corpus_pipeline's combined gate.
    """
    out_cols = (
        "fingerprint", "stopword_ratio", "punct_ratio",
        "repeated_token_frac", "top_bigram_frac", "dup_trigram_frac",
        "verdict",
    )
    clash = [c for c in docs.columns if c in out_cols]
    if clash:
        raise ValueError(
            f"score_documents: input already has output column(s) {clash}"
        )
    q = textops.quality_signal_cols("text")
    # the split is projected once under _cf_w so the gram-transform
    # lambdas never re-tokenize per position (see repetition_mid_cols)
    m = textops.repetition_mid_cols("text", toks_col=F.col("_cf_w"))
    # Intermediates carry a _cf_ prefix so inputs that already have an
    # n_chars/n_tokens column (the documents table does) don't become
    # ambiguous references in the second select.
    mid = docs.withColumn("_cf_w", textops._tokens("text")).select(
        *docs.columns,
        F.md5(dedup.normalized_text("text")).alias("fingerprint"),
        F.round(q["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(q["punct_ratio"], 4).alias("punct_ratio"),
        q["verdict"].alias("_q_verdict"),
        (
            textops.gopher_verdict_col("text", gopher_stopwords)
            if gopher_stopwords is not None
            else F.lit("keep")
        ).alias("_g_verdict"),
        m["n_chars"].alias("_cf_n_chars"),
        m["n_tokens"].alias("_cf_n_tokens"),
        m["n_distinct"].alias("_cf_n_distinct"),
        m["_t2"].alias("_cf__t2"),
        m["_d3"].alias("_cf__d3"),
    )
    f = textops.repetition_final_cols(prefix="_cf_")
    verdict = (
        F.when(F.col("_q_verdict") != "keep", F.col("_q_verdict"))
        .when(F.col("_g_verdict") != "keep", F.col("_g_verdict"))
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


def reference_band_state(
    ref_docs: DataFrame,
    *,
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Precompute the static reference-corpus state for the streaming
    near-dup gate: the (ref_id, band_id, bucket) MinHash band table
    and the (ref_id, ref_toks) shingle arrays for exact verification.
    Both are persisted — the reference corpus is fixed for the life of
    the stream (re-derive and restart to pick up a new corpus)."""
    base = dedup.token_arrays(ref_docs, shingle=shingle)
    sigs = dedup.minhash_signatures_arr(base, num_hashes=num_hashes)
    band_tbl = (
        dedup.minhash_bands(
            sigs.drop("toks"), num_hashes=num_hashes, bands=bands
        )
        .withColumnRenamed("doc_id", "ref_id")
        .persist()
    )
    ref_toks = (
        base.select(
            F.col("doc_id").alias("ref_id"), F.col("toks").alias("ref_toks")
        ).persist()
    )
    return band_tbl, ref_toks


def near_dup_flags(
    docs: DataFrame,
    ref_bands: DataFrame,
    ref_toks: DataFrame,
    *,
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Flag documents that near-duplicate the reference corpus: the
    doc's MinHash bands probe the broadcast reference band table
    (same broadcast-membership pattern as contamination_flags), and
    band collisions are verified with exact shingle-set Jaccard
    against the broadcast reference arrays — identical hash family,
    banding, and verification arithmetic as the batch
    minhash_near_duplicates, so stream and batch verdicts agree
    structurally (pinned by test_streaming).

    Output: the input rows + ``near_dup_of`` (lowest matching ref_id,
    NULL when clean), ``near_dup_jaccard``, and ``verdict``
    ('near_dup' | 'keep').  Scale shape: signatures are a pure
    projection; both reference sides broadcast (no corpus-keyed
    shuffle); candidate volume ∝ true collisions.  Pure batch
    DataFrame ops — run it per micro-batch via foreachBatch (the
    reference is static, so no cross-batch state is needed and the
    stream stays stateless).
    """
    base = dedup.token_arrays(docs, shingle=shingle)
    sigs = dedup.minhash_signatures_arr(base, num_hashes=num_hashes)
    doc_bands = dedup.minhash_bands(
        sigs.drop("toks"), num_hashes=num_hashes, bands=bands
    )
    cands = (
        doc_bands.join(F.broadcast(ref_bands), ["band_id", "bucket"])
        .select("doc_id", "ref_id")
        .distinct()
    )
    inter = F.size(F.array_intersect("toks", "ref_toks"))
    union = F.size("toks") + F.size("ref_toks") - inter
    matched = (
        cands.join(base.select("doc_id", "toks"), "doc_id")
        .join(F.broadcast(ref_toks), "ref_id")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .groupBy("doc_id")
        .agg(
            F.min("ref_id").alias("near_dup_of"),
            F.round(F.max("jaccard"), 4).alias("near_dup_jaccard"),
        )
    )
    return docs.join(F.broadcast(matched), "doc_id", "left").withColumn(
        "verdict",
        F.when(F.col("near_dup_of").isNotNull(), "near_dup").otherwise("keep"),
    )


def start_near_dup_filter(
    spark: SparkSession,
    source_dir: str,
    *,
    ref_docs: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
    threshold: float = 0.9,
) -> StreamingQuery:
    """Near-dup rejection at ingest: stream → MinHash bands → probe
    the broadcast reference corpus → verdict-partitioned sink.  Runs
    near_dup_flags per micro-batch under foreachBatch — the reference
    state is computed ONCE up front; each batch is joins against
    broadcast statics, so the streaming query itself holds no state
    store and restarts resume from checkpoint offsets alone."""
    ref_bands, ref_toks = reference_band_state(
        ref_docs, num_hashes=num_hashes, bands=bands, shingle=shingle
    )

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        flagged = near_dup_flags(
            batch_df,
            ref_bands,
            ref_toks,
            num_hashes=num_hashes,
            bands=bands,
            shingle=shingle,
            threshold=threshold,
        )
        flagged.write.mode("append").partitionBy("verdict").parquet(sink_dir)

    stream = read_doc_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_corpus_filter(
    spark: SparkSession,
    source_dir: str,
    *,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
    gopher_stopwords: tuple[str, ...] | None = None,
) -> StreamingQuery:
    """End-to-end incremental corpus filter: stream → score → append to
    a verdict-partitioned parquet sink. The whole pipeline is one
    stateless projection (repetition/quality/fingerprint expressions
    selected straight from the stream — no joins, no state operator),
    so there is no state store to size and a restart resumes from the
    checkpoint offsets alone (asserted by
    test_corpus_filter_stream_is_stateless). ``gopher_stopwords``
    adds the Gopher battery stage exactly as in batch
    (score_documents) — still a pure projection.
    """
    stream = read_doc_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    scored = score_documents(stream, gopher_stopwords=gopher_stopwords)
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
