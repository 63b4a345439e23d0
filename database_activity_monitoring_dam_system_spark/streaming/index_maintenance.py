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
from ..ckpt import register as _ckpt_register
from ..ckpt import scope as _ckpt_scope


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
    # PIN the arbitrated batch: row_number over a duplicate-seq tie
    # is nondeterministic, and every consumer (both index folds, the
    # touched-id set) must see the SAME surviving row per id — a
    # lazily re-executed window could hand one text to the postings
    # and another to the stats tf_map. Batch-sized, so cheap.
    b = b.localCheckpoint(eager=True).transform(_ckpt_register)
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


def _fold_bm25(
    stats: DataFrame | None,
    b: DataFrame,
    alive: DataFrame,
    *,
    id_col: str,
    text_col: str,
) -> DataFrame:
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
    return _fold_bm25(stats, b, alive, id_col=id_col, text_col=text_col)


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
    return _fold_postings(
        postings, old_stats, b, alive, id_col=id_col, text_col=text_col
    )


def _fold_postings(
    postings: DataFrame | None,
    old_stats: DataFrame | None,
    b: DataFrame,
    alive: DataFrame,
    *,
    id_col: str,
    text_col: str,
) -> DataFrame:
    spark = b.sparkSession
    id_type = b.schema[id_col].dataType.simpleString()
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


def _probe_artifact(spark, path: str) -> DataFrame | None:
    """Hadoop-FS existence probe (read_rate_state discipline): a
    missing or EMPTY artifact reads as None — "fresh start" for a
    first batch, "corpus of zero docs" after a delete-all batch —
    while a real read error surfaces instead of masquerading as
    either."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    df = spark.read.parquet(path)
    return None if df.isEmpty() else df


def _load_maintained_stats(spark, path: str, ctx: str):
    """Load-and-vet the stats artifact for maintenance: the stamp
    must equal the row count (an artifact from the BATCH path —
    build without keep_empty_docs — has no rows for zero-token docs;
    adopting it would silently re-derive N from rows and drop those
    docs from N forever). Returns the PINNED frame (localCheckpoint)
    so the folds cannot observe a half-overwritten table, or None
    for a missing/empty artifact."""
    if _probe_artifact(spark, path) is None:
        return None
    stats, n_stamped = invindex.load_bm25_stats(spark, path)
    n_rows = stats.count()
    if n_stamped != n_rows:
        raise ValueError(
            f"{ctx}: artifact at {path!r} stamps N={n_stamped} but "
            f"holds {n_rows} rows — built without keep_empty_docs "
            "rows; rebuild it with build_bm25_stats("
            "keep_empty_docs=True) before stream maintenance"
        )
    return stats.localCheckpoint(eager=True).transform(_ckpt_register)


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

    def _fold_one_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        stats = _load_maintained_stats(
            spark, artifact_path, "start_bm25_maintenance_stream"
        )
        merged = fold_bm25_batch(
            stats,
            batch,
            id_col=id_col,
            text_col=text_col,
            op_col=op_col,
            delete_op=delete_op,
            seq_col=seq_col,
        ).localCheckpoint(eager=True).transform(_ckpt_register)  # sever the self-read
        invindex.save_bm25_stats(
            merged, artifact_path, n_docs=merged.count()
        )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        # every checkpoint this batch pins (loaded state, arbitrated
        # batch, folded artifacts) is batch-scoped: the saves above
        # consume them, so the scope frees their blocks at batch end
        # instead of leaving them to driver GC (guide §5)
        with _ckpt_scope():
            _fold_one_batch(batch, batch_id)

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
    buckets: int | None = None,
    available_now: bool = False,
):
    """Maintain BOTH search artifacts — the BM25 stats table and the
    uncapped posting table — from one document upsert stream, one
    arbitration and one fold per artifact per micro-batch.

    Refusals (the stamp discipline): the two artifacts must be
    maintained TOGETHER — exactly one present means a partial
    deployment whose posting table would silently miss the other's
    corpus (or keep deleted docs forever), so it refuses by name. A
    df-capped posting table (``_min_df``/``_max_df`` stamps) refuses
    too: pruned tokens cannot be repaired incrementally and the
    patch would strip the stamps that make serving refuse.

    ``buckets``: None re-saves with the artifact's own stamped
    layout (0 if bootstrapping); pass an explicit count to force a
    layout — and to PRESERVE one across a corpus-emptying batch (a
    zero-row table carries no stamp rows, so an inherit-only policy
    would silently flatten the layout on the next batch).

    Save order is POSTINGS FIRST, deliberately: the posting patch
    reads the PRE-fold stats for removed docs' old tokens, so the
    stats fold must not land before it. With that order every retry
    window is safe — a retried batch re-reads pre-fold stats (the
    stats save hadn't happened) and re-applies the posting patch,
    which patch_postings makes the identity. The remaining
    non-atomic window is each parquet overwrite itself, same as
    every artifact updater here."""

    def _fold_one_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        old_stats = _load_maintained_stats(
            spark, bm25_path, "start_search_maintenance_stream"
        )
        raw_post = _probe_artifact(spark, postings_path)
        if (old_stats is None) != (raw_post is None):
            have, miss = (
                (bm25_path, postings_path)
                if raw_post is None
                else (postings_path, bm25_path)
            )
            raise ValueError(
                "start_search_maintenance_stream: artifact at "
                f"{have!r} exists but {miss!r} does not — the two "
                "are maintained together (a lone fold would miss "
                "the other's corpus or orphan deleted docs); "
                "bootstrap both from the same corpus snapshot "
                "(build_bm25_stats(keep_empty_docs=True) + "
                "build_postings) or start both fresh"
            )
        postings = None
        stamped_buckets = 0
        if raw_post is not None:
            if (
                "_min_df" in raw_post.columns
                or "_max_df" in raw_post.columns
            ):
                raise ValueError(
                    "start_search_maintenance_stream: posting table "
                    f"at {postings_path!r} was built with df caps — "
                    "pruned tokens cannot be repaired incrementally; "
                    "rebuild without caps for stream maintenance"
                )
            if "_buckets" in raw_post.columns:
                stamped_buckets = int(
                    raw_post.select("_buckets").first()["_buckets"]
                )
            postings = invindex.load_postings(spark, postings_path)
        layout = stamped_buckets if buckets is None else int(buckets)
        # arbitrate ONCE and pin: the two folds must see the SAME
        # surviving row per id — a duplicate-seq tie re-arbitrated
        # per fold could index one text in the postings and another
        # in the stats tf_map, permanently diverging the artifacts
        b, alive = _arbitrate_batch(
            batch, id_col=id_col, text_col=text_col, op_col=op_col,
            delete_op=delete_op, seq_col=seq_col,
        )
        new_postings = _fold_postings(
            postings, old_stats, b, alive, id_col=id_col,
            text_col=text_col,
        ).localCheckpoint(eager=True).transform(_ckpt_register)
        new_stats = _fold_bm25(
            old_stats, b, alive, id_col=id_col, text_col=text_col
        ).localCheckpoint(eager=True).transform(_ckpt_register)
        n_new = new_stats.count()
        invindex.save_postings(
            new_postings, postings_path, n_docs=n_new, buckets=layout
        )
        invindex.save_bm25_stats(new_stats, bm25_path, n_docs=n_new)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        # every checkpoint this batch pins (loaded state, arbitrated
        # batch, folded artifacts) is batch-scoped: the saves above
        # consume them, so the scope frees their blocks at batch end
        # instead of leaving them to driver GC (guide §5)
        with _ckpt_scope():
            _fold_one_batch(batch, batch_id)

    writer = docs.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
