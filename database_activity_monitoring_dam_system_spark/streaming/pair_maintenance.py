"""Streaming maintenance of the exact containment pair artifact: a
CDC-shaped document stream folded through
operators/dedup.py:update_containment_pairs per micro-batch — the
fuzzy-dedup EXACT baseline kept crawl-fresh the same way the search
artifacts are (streaming/index_maintenance.py), so a serving layer
can answer "what near-supersets exist right now" between batches
without a corpus² rebuild.

Unlike the doc-keyed search artifacts, the pair fold needs the FULL
corpus text on both sides of the delta (candidates re-derive from the
new corpus's token order), so the maintainer keeps a corpus snapshot
artifact BESIDE the pair table and CDC-folds it first. The two
artifacts are bound by a content digest (dedup.corpus_digest stamped
into the pair table): a crash between the two saves leaves a torn
state that the next batch REFUSES by digest mismatch instead of
folding garbage — same honesty contract as every artifact updater
here, with the stamp strong enough to catch same-row-count tears.

Per-batch cost: one CDC fold of the snapshot (change-sized) + one
linear substrate build over the corpus + delta-bounded candidate
joins — never pairs². Retry safety: the corpus fold is id-keyed
replace (identity on redelivery) and the pair fold re-derives from
(old corpus, new corpus) diff, so re-running the last batch
reproduces the same artifacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup
from .index_maintenance import _arbitrate_batch


def _artifact_exists(spark, path: str) -> bool:
    """Path-existence probe. index_maintenance's _probe_artifact
    reads EMPTY as absent — right for doc-keyed stats (empty ⇔ zero
    docs ⇔ fresh), wrong here: ZERO PAIRS is a valid state of a
    populated corpus (no near-supersets yet), and an emptied corpus
    snapshot is still a snapshot. Presence means the path exists;
    emptiness is data."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def fold_corpus_batch(
    corpus: DataFrame | None,
    b: DataFrame,
    alive: DataFrame,
    *,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """CDC fold of the corpus snapshot: touched ids drop, alive
    upserts re-enter — the _fold_bm25 kept∪delta shape carrying TEXT
    instead of stats."""
    delta = alive.select(id_col, text_col)
    if corpus is None:
        return delta
    touched = b.select(F.col(id_col))
    kept = corpus.select(id_col, text_col).join(
        F.broadcast(touched), on=id_col, how="left_anti"
    )
    return kept.unionByName(delta)


def start_containment_maintenance_stream(
    docs: DataFrame,
    *,
    pairs_path: str,
    corpus_path: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    shingle: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str | None = None,
    delete_op: str = "D",
    seq_col: str | None = None,
    available_now: bool = False,
):
    """Maintain the containment pair table + its corpus snapshot from
    a document upsert stream. Serve between batches with
    ``dedup.load_containment_pairs(spark, pairs_path,
    threshold=…, shingle=…, corpus_digest=dedup.corpus_digest(
    spark.read.parquet(corpus_path)))`` — the digest check is the
    torn-state gate. The batch arbiter is a fresh
    ``containment_prefix_pairs`` over the final corpus (stream ≡
    batch pinned by test).

    Refusals: exactly one artifact present (partial deployment —
    a lone pair table has no snapshot to diff against; a lone
    snapshot would silently drop all prior pairs); a pair table whose
    (threshold, shingle, corpus digest) stamps don't match.

    Save order is PAIRS FIRST: the pair fold reads the PRE-fold
    corpus, so on a retry after a crash between the saves the next
    load sees pairs stamped with the post-fold digest against a
    pre-fold corpus and refuses — a rebuild (or restoring the prior
    snapshot) is the recovery, never a silent divergent fold."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        corpus_exists = _artifact_exists(spark, corpus_path)
        pairs_exist = _artifact_exists(spark, pairs_path)
        if corpus_exists != pairs_exist:
            have, miss = (
                (pairs_path, corpus_path)
                if not corpus_exists
                else (corpus_path, pairs_path)
            )
            raise ValueError(
                "start_containment_maintenance_stream: artifact at "
                f"{have!r} exists but {miss!r} does not — the pair "
                "table and its corpus snapshot are maintained "
                "together; bootstrap both (save_containment_pairs + "
                "a corpus parquet from one snapshot) or start fresh"
            )
        b, alive = _arbitrate_batch(
            batch, id_col=id_col, text_col=text_col, op_col=op_col,
            delete_op=delete_op, seq_col=seq_col,
        )
        if not corpus_exists:
            new_corpus = fold_corpus_batch(
                None, b, alive, id_col=id_col, text_col=text_col
            ).localCheckpoint(eager=True)
            new_pairs = dedup.containment_prefix_pairs(
                new_corpus, id_col=id_col, text_col=text_col,
                threshold=threshold, shingle=shingle,
            ).localCheckpoint(eager=True)
        else:
            old_corpus = spark.read.parquet(corpus_path).localCheckpoint(
                eager=True
            )
            old_pairs = dedup.load_containment_pairs(
                spark, pairs_path,
                threshold=threshold, shingle=shingle,
                corpus_digest=dedup.corpus_digest(
                    old_corpus, id_col=id_col, text_col=text_col
                ),
            ).localCheckpoint(eager=True)
            new_corpus = fold_corpus_batch(
                old_corpus, b, alive, id_col=id_col, text_col=text_col
            ).localCheckpoint(eager=True)
            new_pairs = dedup.update_containment_pairs(
                old_pairs, old_corpus, new_corpus,
                id_col=id_col, text_col=text_col,
                threshold=threshold, shingle=shingle,
            ).localCheckpoint(eager=True)
        dedup.save_containment_pairs(
            new_pairs, pairs_path,
            threshold=threshold, shingle=shingle,
            corpus_digest=dedup.corpus_digest(
                new_corpus, id_col=id_col, text_col=text_col
            ),
        )
        new_corpus.write.mode("overwrite").parquet(corpus_path)

    writer = docs.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
