"""Streaming maintenance of the BM25 serving artifact: a CDC-shaped
document stream (upserts + optional deletes) folded into the
persisted stats table per micro-batch — the search index kept fresh
by stream, the same freshness story the rollup/transition partials
already have, applied to the invindex family.

Why the BM25 stats table is the anchor artifact: it is DOC-KEYED
((doc_id, dl, tf map) — operators/invindex.py build_bm25_stats), so
its fold is an id anti-join plus a delta-only tokenize, needing no
old TEXT for removals. And it makes the POSTING table maintainable
from the same stream: the posting surgery needs the removed docs'
old distinct tokens, which a CDC stream doesn't carry — but they are
exactly the doc's tf_map keys in the pre-fold stats artifact, so the
combined maintainer (start_search_maintenance_stream) folds both
per batch without ever re-reading corpus text. Queries serve from
the artifacts between batches (bm25_from_stats / search_all_terms).

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
from ..operators.textops import _norm_tokens


def _arbitrate_batch(
    batch: DataFrame,
    *,
    id_col: str,
    text_col: str,
    op_col: str | None,
    delete_op: str,
    seq_col: str | None,
) -> tuple[DataFrame, DataFrame]:
    """The ONE batch-arbitration step both index folds share:
    ``seq_col`` picks the latest row when a batch carries several
    operations for one id (without it, duplicate in-batch ids
    REFUSE — silently picking an arbitrary row would corrupt the
    index), and a NULL op refuses rather than falling through the
    delete filter as a silent drop. Returns (arbitrated batch,
    alive upserted docs)."""
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
                "index maintenance: batch carries multiple rows for "
                f"{dupes.count()} doc id(s) and no seq_col to "
                "arbitrate — dedup upstream or pass seq_col"
            )
    if op_col:
        if not b.filter(F.col(op_col).isNull()).isEmpty():
            raise ValueError(
                f"index maintenance: batch carries NULL {op_col!r} "
                "rows — ambiguous operation; clean the CDC feed"
            )
        alive = b.filter(F.col(op_col) != delete_op).drop(op_col)
    else:
        alive = b
    return b, alive


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
    deleted ids vanish, untouched ids carry over."""
    b, alive = _arbitrate_batch(
        batch, id_col=id_col, text_col=text_col, op_col=op_col,
        delete_op=delete_op, seq_col=seq_col,
    )
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


def fold_postings_batch(
    postings: DataFrame | None,
    old_stats: DataFrame | None,
    batch: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str | None = None,
    delete_op: str = "D",
    seq_col: str | None = None,
) -> DataFrame:
    """One micro-batch folded into the UNCAPPED posting table — the
    conjunctive-search artifact stream-maintained beside the BM25
    stats. The CDC stream carries no OLD text, so which posting rows
    mention a removed/changed doc is recovered from the PRE-FOLD
    stats artifact: the doc's old distinct tokens are exactly its
    tf_map keys (build_bm25_stats dedups per doc, same _norm_tokens
    stream). The merge itself is invindex.patch_postings — the same
    array surgery the batch fold (update_postings) reduces, so
    stream ≡ batch holds by shared definition; its except-both-sides
    form makes re-applying the same patch the identity (the
    batch-retry contract)."""
    b, alive = _arbitrate_batch(
        batch, id_col=id_col, text_col=text_col, op_col=op_col,
        delete_op=delete_op, seq_col=seq_col,
    )
    spark = batch.sparkSession
    id_type = batch.schema[id_col].dataType.simpleString()
    if postings is None:
        postings = spark.createDataFrame(
            [], f"token string, postings array<{id_type}>"
        )
    touched = b.select(F.col(id_col))
    if old_stats is None:
        rm = spark.createDataFrame(
            [], f"token string, _rm_ids array<{id_type}>"
        )
    else:
        rm = (
            old_stats.join(
                F.broadcast(touched),
                old_stats["doc_id"] == touched[id_col],
                "left_semi",
            )
            .select("doc_id", F.explode(F.map_keys("tf_map")).alias("token"))
            .groupBy("token")
            .agg(F.collect_set("doc_id").alias("_rm_ids"))
        )
    ad = (
        alive.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(_norm_tokens(text_col))
            ).alias("token"),
        )
        .groupBy("token")
        .agg(F.collect_set("doc_id").alias("_add_ids"))
    )
    return invindex.patch_postings(postings, rm, ad)


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


def start_search_maintenance_stream(
    docs: DataFrame,
    *,
    bm25_path: str,
    postings_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str | None = None,
    delete_op: str = "D",
    seq_col: str | None = None,
    available_now: bool = False,
):
    """Maintain BOTH search artifacts — the BM25 stats table and the
    uncapped posting table — from one document upsert stream, one
    fold per micro-batch each.

    Save order is POSTINGS FIRST, deliberately: the posting patch
    reads the PRE-fold stats for removed docs' old tokens, so the
    stats fold must not land before it. With that order every retry
    window is safe — a retried batch re-reads pre-fold stats (the
    stats save hadn't happened) and re-applies the posting patch,
    which patch_postings makes the identity. The remaining
    non-atomic window is each parquet overwrite itself, same as
    every artifact updater here."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        jvm = spark._jvm

        def _exists_nonempty(path: str):
            jpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(jpath):
                return None
            df = spark.read.parquet(path)
            return None if df.isEmpty() else df

        old_stats = None
        raw_stats = _exists_nonempty(bm25_path)
        if raw_stats is not None:
            old_stats, n_stamped = invindex.load_bm25_stats(
                spark, bm25_path
            )
            n_rows = old_stats.count()
            if n_stamped != n_rows:
                raise ValueError(
                    "start_search_maintenance_stream: artifact at "
                    f"{bm25_path!r} stamps N={n_stamped} but holds "
                    f"{n_rows} rows — built without keep_empty_docs "
                    "rows; rebuild with build_bm25_stats("
                    "keep_empty_docs=True) before stream maintenance"
                )
            # the posting patch reads old_stats AFTER the postings
            # overwrite below severs nothing for it — pin the frame
            # so the fold cannot observe a half-written state
            old_stats = old_stats.localCheckpoint(eager=True)
        postings = None
        buckets = 0
        raw_post = _exists_nonempty(postings_path)
        if raw_post is not None:
            if "_buckets" in raw_post.columns:
                buckets = int(raw_post.select("_buckets").first()["_buckets"])
            postings = invindex.load_postings(spark, postings_path)
        new_postings = fold_postings_batch(
            postings, old_stats, batch,
            id_col=id_col, text_col=text_col, op_col=op_col,
            delete_op=delete_op, seq_col=seq_col,
        ).localCheckpoint(eager=True)
        new_stats = fold_bm25_batch(
            old_stats, batch,
            id_col=id_col, text_col=text_col, op_col=op_col,
            delete_op=delete_op, seq_col=seq_col,
        ).localCheckpoint(eager=True)
        n_new = new_stats.count()
        invindex.save_postings(
            new_postings, postings_path, n_docs=n_new, buckets=buckets
        )
        invindex.save_bm25_stats(new_stats, bm25_path, n_docs=n_new)

    writer = docs.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
