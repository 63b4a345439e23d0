"""Streaming maintenance of the BM25 serving artifact: a CDC-shaped
document stream (upserts + optional deletes) folded into the
persisted stats table per micro-batch — the search index kept fresh
by stream, the same freshness story the rollup/transition partials
already have, applied to the invindex family.

Why the BM25 stats table is the right streaming artifact: it is
DOC-KEYED ((doc_id, dl, tf map) — operators/invindex.py
build_bm25_stats), so the fold is an id anti-join plus a
delta-only tokenize — no token-keyed array surgery, no old TEXT
needed for removals (the posting-table fold needs the removed docs'
old tokens, which a CDC stream doesn't carry; the stats table
doesn't). Queries serve from the artifact between batches with
bm25_from_stats, never touching corpus text.

N accounting without a corpus: the artifact is maintained with
``keep_empty_docs=True`` rows (zero-token docs get a (dl=0, empty
map) row), so the row count IS the corpus document count and the
``_n_docs`` stamp is derived from the artifact itself — no side
channel that could drift.

Retry safety: the fold is keyed on ids (anti-join + replace), not
incremental arithmetic, so re-applying the same micro-batch is the
identity — structured streaming's redeliver-the-last-batch mode
composes with the overwrite save. The one non-atomic window is the
parquet overwrite itself (same contract as every artifact updater
here: a crash mid-save needs a rebuild or a restore from the
previous snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import invindex


def fold_bm25_batch(
    stats: DataFrame | None,
    batch: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str | None = None,
    delete_op: str = "D",
    seq_col: str | None = None,
) -> DataFrame:
    """One micro-batch folded into the stats frame (pure function —
    the foreachBatch wrapper adds load/save). Every id mentioned in
    the batch is replaced: upserted ids get freshly-tokenized rows,
    deleted ids vanish, untouched ids carry over. ``seq_col`` picks
    the latest row when a batch carries several operations for one
    id (without it, duplicate in-batch ids REFUSE — silently picking
    an arbitrary row would corrupt the index)."""
    cols = [id_col, text_col] + ([op_col] if op_col else [])
    b = batch.select(*cols)
    if seq_col is not None:
        w = Window.partitionBy(id_col).orderBy(F.col(seq_col).desc())
        b = (
            batch.select(*cols, seq_col)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", seq_col)
        )
    else:
        dupes = b.groupBy(id_col).count().filter(F.col("count") > 1)
        if not dupes.isEmpty():
            raise ValueError(
                "fold_bm25_batch: batch carries multiple rows for "
                f"{dupes.count()} doc id(s) and no seq_col to "
                "arbitrate — dedup upstream or pass seq_col"
            )
    if op_col:
        if not b.filter(F.col(op_col).isNull()).isEmpty():
            # a NULL op would fall through the != filter as neither
            # upsert nor delete, silently dropping the doc from the
            # index — refuse ambiguous CDC input instead
            raise ValueError(
                f"fold_bm25_batch: batch carries NULL {op_col!r} "
                "rows — ambiguous operation; clean the CDC feed"
            )
        alive = b.filter(F.col(op_col) != delete_op).drop(op_col)
    else:
        alive = b
    delta = invindex.build_bm25_stats(
        alive, id_col=id_col, text_col=text_col, keep_empty_docs=True
    ).withColumnRenamed("doc_id", id_col)
    if stats is None:
        return delta.withColumnRenamed(id_col, "doc_id")
    touched = b.select(F.col(id_col))
    kept = stats.withColumnRenamed("doc_id", id_col).join(
        F.broadcast(touched), on=id_col, how="left_anti"
    )
    return kept.unionByName(delta).withColumnRenamed(id_col, "doc_id")


def start_bm25_maintenance_stream(
    docs: DataFrame,
    *,
    artifact_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str | None = None,
    delete_op: str = "D",
    seq_col: str | None = None,
    available_now: bool = False,
):
    """Maintain the BM25 stats artifact at ``artifact_path`` from a
    document upsert stream. Serve between batches with
    ``load_bm25_stats`` + ``bm25_from_stats`` (the stamp row count is
    always the current corpus size). The batch arbiter is
    ``build_bm25_stats(keep_empty_docs=True)`` over the current
    corpus snapshot — stream ≡ batch pinned by test."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        stats = None
        # Hadoop-FS existence probe (read_rate_state discipline): a
        # missing first-batch artifact must read as "fresh start",
        # a real read error must not
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(artifact_path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            raw = spark.read.parquet(artifact_path)
            if raw.isEmpty():
                # a fully-deleted corpus: fold as empty, same result
                # as no prior artifact (load_bm25_stats refuses a
                # stampless zero-row table for SERVING, but the
                # maintainer knows zero rows means zero docs)
                stats = None
            else:
                stats, n_stamped = invindex.load_bm25_stats(
                    spark, artifact_path
                )
                n_rows = stats.count()
                if n_stamped != n_rows:
                    # an artifact from the BATCH path (build without
                    # keep_empty_docs) has no rows for zero-token
                    # docs: stamp N > row count. Adopting it would
                    # silently re-derive N from rows and drop those
                    # docs from N forever — refuse (the stamp-refusal
                    # discipline every artifact here follows)
                    raise ValueError(
                        "start_bm25_maintenance_stream: artifact at "
                        f"{artifact_path!r} stamps N={n_stamped} but "
                        f"holds {n_rows} rows — built without "
                        "keep_empty_docs rows; rebuild it with "
                        "build_bm25_stats(keep_empty_docs=True) "
                        "before stream maintenance"
                    )
        merged = fold_bm25_batch(
            stats,
            batch,
            id_col=id_col,
            text_col=text_col,
            op_col=op_col,
            delete_op=delete_op,
            seq_col=seq_col,
        ).localCheckpoint(eager=True)  # sever the self-read
        invindex.save_bm25_stats(
            merged, artifact_path, n_docs=merged.count()
        )

    writer = docs.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
