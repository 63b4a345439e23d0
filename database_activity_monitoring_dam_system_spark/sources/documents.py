"""Robust document ingestion: JSONL / CSV corpus readers with
corrupt-record quarantine.

Web-crawl corpora arrive as JSONL (and occasionally CSV) with a
guaranteed fraction of malformed records — truncated lines from
interrupted uploads, encoding damage, schema drift. A 100 TB ingest
job must neither crash on them (FAILFAST) nor silently drop them
(DROPMALFORMED): the engine reads PERMISSIVE with an explicit
``_corrupt_record`` column, splits the stream into clean rows and a
quarantine frame, and reports the split — the reject-table pattern
every warehouse loader uses, expressed as two filters over one scan.

Same reader settings work for ``spark.readStream`` (the corpus-filter
ingest path): schema is explicit (never inferred — inference is a
second full pass at 100 TB and nondeterministic under drift), and the
quarantine frame can be sinked for replay after upstream repair.
"""

from __future__ import annotations

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


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus → (clean, quarantine).

    ``clean`` holds fully-parsed rows (corrupt column dropped);
    ``quarantine`` holds one row per malformed line with the raw text
    in ``_corrupt_record`` for replay. Both are filters over one scan
    — Spark reads the files once per action, and a persisted parent or
    a quarantine-first count keeps it to one pass where that matters.

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
) -> tuple[DataFrame, DataFrame]:
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


def ingest_report(clean: DataFrame, quarantine: DataFrame) -> dict:
    """Load-summary dict for job logs: row counts and the malformed
    fraction in permille (integer — log-friendly and exact).

    Both counts aggregate alongside a reference to a real data
    column: a bare ``count()`` prunes every output column, leaving the
    corrupt column (referenced by the split filter) as the scan's only
    column — the exact shape QUERY_ONLY_CORRUPT_RECORD_COLUMN forbids
    on raw JSON/CSV scans (same reason the quarantine frame carries a
    witness column at all)."""

    def counted(df: DataFrame, witness: str) -> int:
        row = df.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.count(witness).alias("_witness_ref"),
        )
        return row.collect()[0]["n"]

    n_clean = counted(clean, clean.columns[0])
    n_bad = counted(quarantine, quarantine.columns[-1])
    total = n_clean + n_bad
    return {
        "rows_clean": n_clean,
        "rows_quarantined": n_bad,
        "malformed_permille": (n_bad * 1000 // total) if total else 0,
    }


def _split_quarantine(
    raw: DataFrame, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
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
    return clean, quarantine


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

    A streaming query has ONE sink, so the split runs in foreachBatch
    — two filtered appends over each micro-batch frame (exactly-once
    via the checkpoint as usual for idempotent parquet appends). The
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
        clean, quarantine = _split_quarantine(batch, schema)
        clean.write.mode("append").parquet(clean_dir)
        quarantine.write.mode("append").parquet(quarantine_dir)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
