"""End-to-end corpus pipeline: raw documents → training shards.

The operators compose into the standard pre-training data flow; this
module IS that composition, as one job function a scheduler calls per
corpus snapshot:

    quality filter → near-dup dedup (best-copy retention)
      → LM fluency gate → benchmark decontamination → epoch planning
      → offset packing → sharded write → data card

Every stage is the already-gated operator (quality_scores,
minhash_near_duplicates, duplicate_clusters,
best_keep_representatives, bigram_lm_train/score,
contamination_flags, epoch_plan,
write_packed_shards, corpus_card) — the pipeline adds no new
semantics, only the wiring and a stage-count report. The intermediate
``kept`` frame is persisted across stages (each stage both filters it
and feeds the next), and unpersisted before returning.

Scale: the stages keep their individual shuffle inventories
(SCALE.md); the composition adds no extra exchange — the quality gate
is a scan-side filter (pure projection predicate), and the remaining
drops are broadcast anti joins against violation-sized id sets
(near-dup members, disfluent docs, contaminated docs — ∝ violations,
not corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import dedup, packing, sampling, similarity, textops


def run_corpus_pipeline(
    docs: DataFrame,
    out_dir: str,
    *,
    benchmark: DataFrame | None = None,
    fluency_reference: DataFrame | None = None,
    fluency_floor: float = -12.0,
    epoch_targets: dict[str | None, int] | None = None,
    dedup_threshold: float = 0.9,
    dedup_shingle: int = 3,
    budget: int = 2048,
    n_shards: int = 8,
) -> dict:
    """Run the full corpus-preparation flow; returns the stage report.

    Report keys: per-stage row counts (``n_raw`` → ``n_quality`` →
    ``n_deduped`` → ``n_clean``), the dropped-row breakdown, the epoch
    plan rows (when targets given), and the final per-source data
    card. Shards land under ``out_dir`` via
    :func:`packing.write_packed_shards`.
    """
    # 0. census + id gate in ONE job: rows without an id can't ride
    # the downstream id joins (NULL keys never match), so they are
    # counted explicitly instead of vanishing into the quality number
    # (the PERMISSIVE readers keep schema-drift rows as
    # clean-but-all-NULL). Counting count(doc_id) alongside count(*)
    # also keeps a data column in the scan — a bare count() over a
    # reader's clean frame prunes down to the corrupt-record filter
    # alone, which raw JSON/CSV scans reject
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    # NULL text is gated here too: size(split(trim(NULL))) is NULL, so
    # every quality predicate would evaluate NULL and fall through to
    # 'keep' — textless rows would then bypass dedup/fluency/
    # decontamination (no shingles/bigrams/fingerprints to match) and
    # land in the shards. Count them explicitly instead.
    census = docs.groupBy().agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count("doc_id").alias("n_with_id"),
        F.count(
            F.when(F.col("doc_id").isNotNull(), F.col("text"))
        ).alias("n_with_text"),
    ).collect()[0]
    report: dict = {
        "n_raw": census["n_raw"],
        "n_with_id": census["n_with_id"],
        "n_dropped_null_id": census["n_raw"] - census["n_with_id"],
        "n_dropped_null_text": census["n_with_id"] - census["n_with_text"],
    }
    docs = docs.filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )

    # 1. quality gate — a pure scan-side FILTER (quality_signal_cols
    # is a projection; joining back through an id set would shuffle
    # the whole corpus for nothing)
    kept = docs.filter(
        textops.quality_signal_cols("text")["verdict"] == "keep"
    ).persist()
    report["n_quality"] = kept.count()

    # 2. near-dup dedup with best-copy retention: drop every cluster
    # member except the largest (ties → lowest id). Banding derives
    # from the threshold (S-curve knee), not a hardcoded constant —
    # the auto-tuning the LSH helpers exist for.
    bands, _rows = similarity.minhash_params_for_threshold(
        dedup_threshold, num_hashes=32
    )
    pairs = dedup.minhash_near_duplicates(
        kept,
        threshold=dedup_threshold,
        shingle=dedup_shingle,
        num_hashes=32,
        bands=bands,
    )
    clusters = dedup.duplicate_clusters(pairs)
    # score column derived from the text itself, so inputs without a
    # precomputed n_chars (e.g. the JSONL readers' output) compose
    keepers = dedup.best_keep_representatives(
        clusters,
        kept.withColumn("_doc_size", F.length("text")),
        size_col="_doc_size",
    )
    drop_ids = (
        clusters.join(
            keepers.select(F.col("keep_id").alias("doc_id")),
            "doc_id",
            "left_anti",
        )
        .select("doc_id")
    )
    deduped = kept.join(drop_ids, "doc_id", "left_anti").persist()
    report["n_deduped"] = deduped.count()
    kept.unpersist()

    # 3. LM fluency gate (optional): score against a reference-trained
    # bigram LM, drop docs below the floor. Docs with <2 tokens have
    # no bigrams and no score — they pass (the length gate already
    # judged them).
    if fluency_reference is not None:
        model = textops.bigram_lm_train(fluency_reference, min_count=1)
        scores = textops.bigram_lm_score(deduped, model)
        disfluent = scores.filter(
            F.col("avg_logp") < fluency_floor
        ).select("doc_id")
        fluent = deduped.join(disfluent, "doc_id", "left_anti").persist()
        report["n_fluent"] = fluent.count()
        deduped.unpersist()
    else:
        fluent = deduped
        report["n_fluent"] = report["n_deduped"]

    # 4. benchmark decontamination (optional)
    if benchmark is not None:
        flags = textops.contamination_flags(fluent, benchmark)
        dirty = flags.filter(F.col("verdict") == "contaminated").select(
            "doc_id"
        )
        clean = fluent.join(dirty, "doc_id", "left_anti").persist()
        report["n_clean"] = clean.count()
        fluent.unpersist()
    else:
        clean = fluent
        report["n_clean"] = report["n_fluent"]
    report["n_dropped_quality"] = (
        census["n_with_text"] - report["n_quality"]
    )
    report["n_dropped_dedup"] = report["n_quality"] - report["n_deduped"]
    report["n_dropped_disfluent"] = report["n_deduped"] - report["n_fluent"]
    report["n_dropped_contaminated"] = (
        report["n_fluent"] - report["n_clean"]
    )

    # 5. epoch planning over the surviving corpus (optional)
    if epoch_targets is not None:
        report["epoch_plan"] = [
            row.asDict()
            for row in sampling.epoch_plan(clean, epoch_targets)
            .orderBy("stratum")
            .collect()
        ]

    # 6. pack + write shards
    packing.write_packed_shards(
        clean, out_dir, budget=budget, n_shards=n_shards
    )

    # 7. data card over what shipped
    report["corpus_card"] = [
        row.asDict()
        for row in textops.corpus_card(clean).orderBy("source").collect()
    ]
    clean.unpersist()
    return report
