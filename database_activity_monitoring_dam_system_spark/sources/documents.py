"""Robust document ingestion: JSONL / CSV corpus readers with
corrupt-record quarantine.

Web-crawl corpora arrive as JSONL (and occasionally CSV) with a
guaranteed fraction of malformed records — truncated lines from
interrupted uploads, encoding damage, schema drift. A 100 TB ingest
job must neither crash on them (FAILFAST) nor silently drop them
(DROPMALFORMED): the engine reads PERMISSIVE with an explicit
``_corrupt_record`` column, splits the stream into clean rows and a
quarantine frame, and reports the split — the reject-table pattern
every warehouse loader uses, expressed as filters over one scan.

Same reader settings work for ``spark.readStream`` (the corpus-filter
ingest path): schema is explicit (never inferred — inference is a
second full pass at 100 TB and nondeterministic under drift), and the
quarantine frame can be sinked for replay after upstream repair.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit crawl-document schema: nullable everything except the
# corrupt-record capture column, which Spark populates for rows that
# fail to parse (the raw line lands there, all other columns NULL).
CORRUPT_COL = "_corrupt_record"

DOCUMENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField(CORRUPT_COL, T.StringType(), True),
])


class Ingest(NamedTuple):
    """Reader result: the split plus the raw parsed frame.

    ``raw`` exists so summaries run as ONE job over one scan
    (:func:`ingest_report`) instead of separate actions per side;
    unpack ``clean, quarantine, raw = read_documents_jsonl(...)`` or
    use the fields by name.
    """

    clean: DataFrame
    quarantine: DataFrame
    raw: DataFrame


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> Ingest:
    """Read a JSONL corpus → Ingest(clean, quarantine, raw).

    ``clean`` holds fully-parsed rows (corrupt column dropped);
    ``quarantine`` holds one row per malformed line with the raw text
    in ``raw_line`` for replay. Both are filters over one scan.

    A row that parses as JSON but misses every schema field is NOT
    corrupt (it is all-NULL — schema drift, not damage); the
    quarantine predicate is exactly ``_corrupt_record IS NOT NULL``.
    """
    if not any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must include a {CORRUPT_COL} string field")
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split_quarantine(raw, schema)


def read_documents_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType = DOCUMENT_SCHEMA,
    header: bool = True,
) -> Ingest:
    """CSV variant of :func:`read_documents_jsonl` — same PERMISSIVE +
    quarantine contract, for the delimited exports some corpus vendors
    ship."""
    if not any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must include a {CORRUPT_COL} string field")
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )
    return _split_quarantine(raw, schema)


def ingest_report(ingest: Ingest) -> dict:
    """Load-summary dict for job logs: row counts and the malformed
    fraction in permille (integer — log-friendly and exact).

    ONE aggregation job over the raw frame — one scan for both counts
    (separate ``count()`` actions per side would parse the source
    twice, a full duplicate ingest pass at 100 TB). The agg references
    a real data column alongside the corrupt predicate: a plan whose
    only scan column is the corrupt-record column is the exact shape
    QUERY_ONLY_CORRUPT_RECORD_COLUMN forbids on raw JSON/CSV scans
    (same reason the quarantine frame carries a witness column).
    """
    witness = next(
        f.name for f in ingest.raw.schema.fields if f.name != CORRUPT_COL
    )
    row = ingest.raw.groupBy().agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col(CORRUPT_COL).isNotNull().cast("long")).alias("bad"),
        F.count(witness).alias("_witness_ref"),
    ).collect()[0]
    total = row["total"]
    n_bad = int(row["bad"] or 0)
    return {
        "rows_clean": total - n_bad,
        "rows_quarantined": n_bad,
        "malformed_permille": (n_bad * 1000 // total) if total else 0,
    }


def _split_quarantine(raw: DataFrame, schema: T.StructType) -> Ingest:
    clean = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    # Spark forbids a query whose only referenced column from a raw
    # JSON/CSV scan is the corrupt-record column
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the parser would need a
    # second pass to know what failed. Referencing one schema column
    # alongside it keeps the pruned scan legal; for corrupt rows that
    # column is NULL by definition, so it costs nothing and documents
    # itself as parse evidence.
    witness = next(f.name for f in schema.fields if f.name != CORRUPT_COL)
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"),
        F.col(witness).alias("parsed_" + witness),
    )
    return Ingest(clean, quarantine, raw)


def start_document_ingest(
    spark: SparkSession,
    src_dir: str,
    *,
    clean_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
):
    """Streaming crawl ingest with the same quarantine contract as the
    batch readers: a JSONL file stream splits per micro-batch into the
    clean corpus sink and the malformed-line quarantine sink.

    A streaming query has ONE sink, so the split runs in foreachBatch.
    foreachBatch is AT-LEAST-ONCE — a failure between the two writes
    (or before the checkpoint commit) replays the batch — so each
    write is made idempotent by partitioning on the batch id with
    dynamic partition overwrite: a replayed batch OVERWRITES its own
    ``_batch_id=N`` partition instead of appending duplicates. The
    quarantine sink is the replay queue: repair upstream, re-point the
    reader at the quarantined lines, ingest again.
    """
    if not any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must include a {CORRUPT_COL} string field")
    reader = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(src_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        split = _split_quarantine(batch, schema)
        for df, path in (
            (split.clean, clean_dir),
            (split.quarantine, quarantine_dir),
        ):
            (
                df.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(path)
            )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
