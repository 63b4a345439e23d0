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
into the pair table), and the two-artifact commit SELF-HEALS: the new
corpus is staged to a sibling path first, the pair table (with its
digest) is saved second, and the staged corpus is promoted (rename)
last. A crash at any point leaves a state the next batch repairs
mechanically — a staged corpus whose digest matches the pair table's
identity sidecar is a torn commit's missing half (promote and
continue); one that doesn't match is a pre-save orphan (delete and
refold). The digest gate still REFUSES states recovery can't explain
(manual edits, lost artifacts) — honesty first, self-healing where
the tear is provably ours.

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
from ..ckpt import register as _ckpt_register
from ..ckpt import scope as _ckpt_scope
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
    mode: str = "exact",
    k: int = 24,
    hash_family: str = "xxhash64",
    max_df: int | None = None,
):
    """Maintain the containment pair table + its corpus snapshot from
    a document upsert stream. Serve between batches with
    ``dedup.load_containment_pairs(spark, pairs_path,
    threshold=…, shingle=…, corpus_digest=dedup.corpus_digest(
    spark.read.parquet(corpus_path)))`` — the digest check is the
    torn-state gate. The batch arbiter is a fresh
    ``containment_prefix_pairs`` over the final corpus (stream ≡
    batch pinned by test).

    Refusals: exactly one artifact present with no staged corpus to
    repair from (partial deployment — a lone pair table has no
    snapshot to diff against; a lone snapshot would silently drop all
    prior pairs); a pair table whose (threshold, shingle, corpus
    digest) stamps don't match and whose mismatch no staged corpus
    explains.

    Commit order is STAGE-PAIRS-PROMOTE: the new corpus is written to
    ``corpus_path + ".staging"``, the pair table (stamped with the
    new digest) is saved, then the staged corpus is promoted over
    ``corpus_path`` with a rename. Each batch first runs recovery: a
    staged corpus matching the pair table's identity sidecar is a
    torn commit's missing promote (finish it — the retried batch then
    refolds idempotently); a non-matching one is a pre-save orphan
    (delete it). Crashes therefore wedge nothing; only states the
    protocol could not have produced still refuse.

    ``mode="sketch"`` maintains the BANDED estimator's pair table
    instead (containment_sketch_pairs / update_containment_sketch_
    pairs with the given k/hash_family/max_df) — the 100 TB serving
    posture, where the exact table is the audit artifact and the
    sketch table is the one kept crawl-fresh. The sketch identity
    (_mode, _k, _hash_family, _max_df) rides the artifact stamps, so
    a fold under different sketch parameters — or loading a sketch
    table where an exact one is expected — refuses loudly."""
    if mode not in ("exact", "sketch"):
        raise ValueError(
            f"start_containment_maintenance_stream: unknown mode {mode!r}"
        )
    extra_stamps = (
        {
            "_mode": "sketch",
            "_k": int(k),
            "_hash_family": hash_family,
            "_max_df": -1 if max_df is None else int(max_df),
        }
        if mode == "sketch"
        else None
    )

    def _build(corpus):
        if mode == "sketch":
            return dedup.containment_sketch_pairs(
                corpus, id_col=id_col, text_col=text_col,
                threshold=threshold, shingle=shingle, k=k,
                hash_family=hash_family, max_df=max_df,
            )
        return dedup.containment_prefix_pairs(
            corpus, id_col=id_col, text_col=text_col,
            threshold=threshold, shingle=shingle,
        )

    def _fold(old_pairs, old_corpus, new_corpus):
        if mode == "sketch":
            return dedup.update_containment_sketch_pairs(
                old_pairs, old_corpus, new_corpus,
                id_col=id_col, text_col=text_col,
                threshold=threshold, shingle=shingle, k=k,
                hash_family=hash_family, max_df=max_df,
            )
        return dedup.update_containment_pairs(
            old_pairs, old_corpus, new_corpus,
            id_col=id_col, text_col=text_col,
            threshold=threshold, shingle=shingle,
        )

    staging_path = corpus_path.rstrip("/") + ".staging"

    def _fs(spark, path):
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath

    def _promote(spark) -> None:
        fs, dst = _fs(spark, corpus_path)
        _, src = _fs(spark, staging_path)
        if fs.exists(dst):
            fs.delete(dst, True)
        if not fs.rename(src, dst):
            raise IOError(
                f"promote failed: rename {staging_path!r} -> "
                f"{corpus_path!r}"
            )

    def _recover(spark) -> None:
        if not _artifact_exists(spark, staging_path):
            return
        identity = (
            dedup.read_pair_identity(spark, pairs_path)
            if _artifact_exists(spark, pairs_path)
            else None
        )
        staged_digest = None
        if identity is not None:
            try:
                staged_digest = dedup.corpus_digest(
                    spark.read.parquet(staging_path),
                    id_col=id_col, text_col=text_col,
                )
            except Exception:
                staged_digest = None  # half-written staging = orphan
        if identity is not None and staged_digest == identity["_corpus_digest"]:
            # pairs committed, promote didn't: finish the commit
            _promote(spark)
        else:
            fs, jstaging = _fs(spark, staging_path)
            fs.delete(jstaging, True)

    def _fold_one_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        _recover(spark)
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
            ).localCheckpoint(eager=True).transform(_ckpt_register)
            new_pairs = _build(new_corpus).localCheckpoint(eager=True).transform(_ckpt_register)
        else:
            old_corpus = spark.read.parquet(corpus_path).localCheckpoint(
                eager=True
            ).transform(_ckpt_register)
            old_pairs = dedup.load_containment_pairs(
                spark, pairs_path,
                threshold=threshold, shingle=shingle,
                corpus_digest=dedup.corpus_digest(
                    old_corpus, id_col=id_col, text_col=text_col
                ),
                extra_stamps=extra_stamps,
            ).localCheckpoint(eager=True).transform(_ckpt_register)
            new_corpus = fold_corpus_batch(
                old_corpus, b, alive, id_col=id_col, text_col=text_col
            ).localCheckpoint(eager=True).transform(_ckpt_register)
            new_pairs = _fold(
                old_pairs, old_corpus, new_corpus
            ).localCheckpoint(eager=True).transform(_ckpt_register)
        new_corpus.write.mode("overwrite").parquet(staging_path)
        dedup.save_containment_pairs(
            new_pairs, pairs_path,
            threshold=threshold, shingle=shingle,
            corpus_digest=dedup.corpus_digest(
                new_corpus, id_col=id_col, text_col=text_col
            ),
            extra_stamps=extra_stamps,
        )
        _promote(spark)

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
