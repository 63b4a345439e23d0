"""End-to-end corpus pipeline: raw documents → training shards.

The operators compose into the standard pre-training data flow; this
module IS that composition, as one job function a scheduler calls per
corpus snapshot:

    quality filter (+ optional Gopher word-rule battery)
      → near-dup dedup (best-copy retention)
      → exact-substring trim (optional) → LM fluency gate
      → benchmark decontamination → epoch planning
      → offset packing → sharded write → data card

Every stage is the already-gated operator (quality_scores,
minhash_near_duplicates, duplicate_clusters,
best_keep_representatives, bigram_lm_train/score,
contamination_flags, epoch_plan,
write_packed_shards, corpus_card) — the pipeline adds no new
semantics, only the wiring and a stage-count report.

Structure: the PER-DOCUMENT judgements (quality verdict, fluency
score, contamination flag — each a pure function of one document's
text given the fixed reference model / benchmark set) are computed
into one gate table first; the GLOBAL stages (near-dup clustering,
epoch census, packing) then run over survivors.  That split is what
makes incremental runs exact: per-doc gate rows carry forward for
byte-identical documents, while the global stages always recompute
over the merged survivor set (a new crawl batch can near-dup against
an old document — cluster composition is corpus-global and is never
carried).

Incremental mode (the 100 TB crawl-refresh story): pass
``state_dir=`` to persist the per-doc state with a run's outputs,
then ``old_snapshot=`` + ``old_state_dir=`` on the next snapshot —
the pipeline diffs raw fingerprints (corpus_diff, normalize=False:
ANY byte change re-processes), reuses gate rows AND MinHash
signatures for unchanged documents, and runs the per-doc text scans
over added ∪ changed only (the Jaccard verify re-shingles candidate
docs, nothing else).  Output is provably identical to a full
recompute (asserted in test_pipeline) because gate rows and
signatures are pure per-doc functions of unchanged bytes; the
caller's obligation, checked by shape markers in the state tables, is
that the reference corpus and benchmark set are also unchanged (a
changed dedup config just drops the signature carry — outputs don't
depend on where signatures came from).

Scale: the stages keep their individual shuffle inventories
(SCALE.md); the composition adds no extra exchange — in FULL runs
the quality gate is a scan-side filter (pure projection predicate;
incremental runs route it through the carried gate table's id set,
which is the join that merges parquet state with the delta), the
remaining drops are anti joins against violation-sized id sets, and
the incremental path touches full-corpus TEXT only for the delta
(the carried side moves ids + small gate columns through one id
join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import dedup, packing, sampling, similarity, textops

_GATE_COLS = ("doc_id", "fp", "q_keep", "avg_logp", "contaminated")
_NUM_HASHES = 32
_SIG_COLS = ("doc_id", *(f"mh{i}" for i in range(_NUM_HASHES)))


def _keep_predicate(gopher_stopwords: tuple[str, ...] | None):
    """THE quality-keep predicate — one definition consumed by both
    the gate table (q_keep column) and the full-run scan-side filter,
    so the step-2 guarantee "q_keep IS this predicate" is structural
    rather than maintained by keeping two code sites in sync."""
    pred = textops.quality_signal_cols("text")["verdict"] == "keep"
    if gopher_stopwords is not None:
        pred = pred & textops.gopher_keep_col("text", gopher_stopwords)
    return pred


def _gate_table(
    docs: DataFrame,
    fluency_reference: DataFrame | None,
    benchmark: DataFrame | None,
    gopher_stopwords: tuple[str, ...] | None = None,
    contamination_mode: str = "exact",
) -> DataFrame:
    """Per-document gate rows: (doc_id, fp, q_keep, avg_logp,
    contaminated).

    Each column is a pure function of (text, reference model,
    benchmark fingerprints) — document-local, hence carryable across
    snapshots for byte-identical text.  Fluency/contamination are
    scored over quality keepers only (a quality-dropped doc never
    needs them — and a carried non-keeper is still dropped by
    quality).  Docs with no bigrams / no fingerprints have NULL
    avg_logp / absent flags and therefore PASS those gates, matching
    the per-stage operators' documented semantics.
    """
    q_keep = _keep_predicate(gopher_stopwords)
    base = docs.select(
        "doc_id",
        F.md5("text").alias("fp"),
        q_keep.alias("q_keep"),
        "text",
    )
    keepers = base.filter("q_keep").select("doc_id", "text")
    out = base.select("doc_id", "fp", "q_keep")
    if fluency_reference is not None:
        model = textops.bigram_lm_train(fluency_reference, min_count=1)
        logp = textops.bigram_lm_score(keepers, model).select(
            "doc_id", "avg_logp"
        )
        out = out.join(logp, "doc_id", "left")
    else:
        out = out.withColumn("avg_logp", F.lit(None).cast("double"))
    if benchmark is not None:
        # "bloom": eval fingerprints compressed to a fixed-size bitmap
        # (sketches.bloom_bitmap) — one-sided error, so the dropped
        # set is a SUPERSET of the exact mode's (safe direction for
        # decontamination); the mode is part of the incremental-state
        # fingerprint because carried flags from the other mode would
        # not equal fresh ones.
        if contamination_mode == "bloom":
            flags = textops.bloom_contamination(keepers, benchmark).select(
                "doc_id",
                (F.col("verdict") == "maybe_contaminated").alias(
                    "contaminated"
                ),
            )
        else:
            flags = textops.contamination_flags(keepers, benchmark).select(
                "doc_id",
                (F.col("verdict") == "contaminated").alias("contaminated"),
            )
        out = out.join(flags, "doc_id", "left").withColumn(
            "contaminated", F.coalesce("contaminated", F.lit(False))
        )
    else:
        out = out.withColumn("contaminated", F.lit(None).cast("boolean"))
    return out.select(*_GATE_COLS)


def run_corpus_pipeline(
    docs: DataFrame,
    out_dir: str,
    *,
    benchmark: DataFrame | None = None,
    fluency_reference: DataFrame | None = None,
    fluency_floor: float = -12.0,
    gopher_stopwords: tuple[str, ...] | None = None,
    contamination_mode: str = "exact",
    epoch_targets: dict[str | None, int] | None = None,
    dedup_threshold: float = 0.9,
    dedup_shingle: int = 3,
    dup_span_removal_k: int | None = None,
    dup_span_max_frac: float | None = None,
    split_fracs: tuple[float, float] | None = None,
    split_cluster_threshold: float = 0.8,
    budget: int = 2048,
    n_shards: int = 8,
    state_dir: str | None = None,
    old_snapshot: DataFrame | None = None,
    old_state_dir: str | None = None,
) -> dict:
    """Run the full corpus-preparation flow; returns the stage report.

    Report keys: per-stage row counts (``n_raw`` → ``n_quality`` →
    ``n_deduped`` → ``n_clean``), the dropped-row breakdown, the epoch
    plan rows (when targets given), and the final per-source data
    card. Shards land under ``out_dir`` via
    :func:`packing.write_packed_shards`.

    ``state_dir`` persists the per-doc gate table for the NEXT run;
    ``old_snapshot`` + ``old_state_dir`` (both or neither) switch this
    run to incremental: per-doc gates are computed for added∪changed
    documents only and carried forward for byte-identical ones
    (``n_carried``/``n_delta`` report the split), with identical
    output to a full recompute.
    """
    if (old_snapshot is None) != (old_state_dir is None):
        raise ValueError(
            "incremental runs need BOTH old_snapshot and old_state_dir"
        )
    if state_dir is not None and old_state_dir is not None:
        import os

        if os.path.realpath(state_dir) == os.path.realpath(old_state_dir):
            # the carried gate rows are read LAZILY from
            # old_state_dir/gates while step 6 overwrites
            # state_dir/gates — same path would hit Spark's
            # cannot-overwrite-a-path-being-read-from error after all
            # the gate work is done. State dirs rotate per snapshot
            # (also the atomicity story: a failed run never corrupts
            # the previous snapshot's state).
            raise ValueError(
                "state_dir must differ from old_state_dir — rotate "
                "state directories per snapshot (e.g. state/r0042)"
            )
    has_fluency = fluency_reference is not None
    has_benchmark = benchmark is not None
    # Config fingerprint for the optional Gopher gate: the stoplist
    # CONTENT, not just on/off — carried q_keep rows from a run with a
    # different list would not equal fresh ones.
    import json as _json

    gopher_key = (
        _json.dumps(list(gopher_stopwords))
        if gopher_stopwords is not None
        else None
    )
    if contamination_mode not in ("exact", "bloom"):
        raise ValueError(
            f"contamination_mode must be 'exact' or 'bloom', got "
            f"{contamination_mode!r}"
        )

    # 0. census + null gates in ONE job: rows without an id can't ride
    # the downstream id joins (NULL keys never match), and NULL text
    # would evaluate every quality predicate to NULL and fall through
    # to 'keep' while carrying no shingles/bigrams/fingerprints for
    # any later stage to catch — both are counted explicitly instead
    # of vanishing (the PERMISSIVE readers keep schema-drift rows as
    # clean-but-all-NULL). Counting count(doc_id) alongside count(*)
    # also keeps a data column in the scan — a bare count() over a
    # reader's clean frame prunes down to the corrupt-record filter
    # alone, which raw JSON/CSV scans reject
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
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

    # 1. per-doc gate table — fresh for the delta, carried for
    # byte-identical documents when incremental state is given
    carried_ids = None
    old_sigs = None
    if old_snapshot is not None:
        spark = docs.sparkSession
        old_state = spark.read.parquet(old_state_dir + "/gates")
        marker_cols = ["has_fluency", "has_benchmark"]
        old_has_gopher_col = "gopher_key" in old_state.columns
        if old_has_gopher_col:
            marker_cols.append("gopher_key")
        old_has_contam_col = "contam_mode" in old_state.columns
        if old_has_contam_col:
            marker_cols.append("contam_mode")
        marker = old_state.select(*marker_cols).first()
        old_gopher_key = (
            marker["gopher_key"]
            if marker is not None and old_has_gopher_col
            else None
        )
        # state written before the mode marker existed was always
        # exact-mode
        old_contam_mode = (
            marker["contam_mode"]
            if marker is not None and old_has_contam_col
            else "exact"
        )
        if marker is not None and (
            marker["has_fluency"] != has_fluency
            or marker["has_benchmark"] != has_benchmark
            or old_gopher_key != gopher_key
            or old_contam_mode != contamination_mode
        ):
            raise ValueError(
                "old_state_dir was written with a different gate "
                f"configuration (fluency={marker['has_fluency']}, "
                f"benchmark={marker['has_benchmark']}, "
                f"gopher={old_gopher_key!r}, "
                f"contamination={old_contam_mode!r}) — carried rows "
                "would not equal fresh ones; run a full pass instead"
            )
        diff = dedup.corpus_diff(old_snapshot, docs, normalize=False)
        carried_ids = diff.filter(F.col("verdict") == "unchanged").select(
            "doc_id"
        )
        carried = old_state.join(carried_ids, "doc_id").select(*_GATE_COLS)
        fresh_docs = docs.join(
            carried.select("doc_id"), "doc_id", "left_anti"
        )
        gates = _gate_table(
            fresh_docs, fluency_reference, benchmark, gopher_stopwords,
            contamination_mode,
        ).unionByName(carried).persist()
        report["n_carried"] = carried.count()
        report["n_delta"] = census["n_with_text"] - report["n_carried"]
        # MinHash signatures are per-doc pure functions of (text,
        # shingle, num_hashes) too — carry them for unchanged keepers
        # when the stored sig configuration matches; a config change
        # silently falls back to full recompute (output is identical
        # either way, unlike the gate-shape case above).
        try:
            raw_sigs = spark.read.parquet(old_state_dir + "/sigs")
            sig_marker = raw_sigs.select(
                "sig_shingle", "sig_num_hashes"
            ).first()
            if sig_marker is not None and (
                sig_marker["sig_shingle"] == dedup_shingle
                and sig_marker["sig_num_hashes"] == _NUM_HASHES
            ):
                old_sigs = raw_sigs.select(*_SIG_COLS)
        except Exception:  # state written before sigs were persisted
            old_sigs = None
    else:
        gates = _gate_table(
            docs, fluency_reference, benchmark, gopher_stopwords,
            contamination_mode,
        ).persist()

    # 2. quality gate. FULL runs apply the predicate as a scan-side
    # FILTER (pure projection, no exchange); only INCREMENTAL runs
    # route through the gate table's id set, because carried gate
    # rows come from parquet and the join is what merges them with
    # the delta. The two forms are equivalent by construction:
    # q_keep IS _keep_predicate (one shared definition).
    # Cost note, measured at sf1 (50 k docs): the inline predicate
    # re-tokenizes per subexpression reference (FilterExec codegen has
    # no common-subexpression elimination, and the
    # project-flag-then-filter form is re-inlined by predicate
    # pushdown — verified identical plans), adding ~29 % to this one
    # scan with the Gopher gate on (0.38 s → 0.49 s). It is paid once:
    # `kept` is persisted, so downstream stages reuse the
    # materialized survivors.
    if old_snapshot is None:
        kept = docs.filter(_keep_predicate(gopher_stopwords)).persist()
    else:
        kept = docs.join(
            gates.filter("q_keep").select("doc_id"), "doc_id"
        ).persist()
    report["n_quality"] = kept.count()

    # 3. near-dup dedup with best-copy retention: drop every cluster
    # member except the largest (ties → lowest id). Banding derives
    # from the threshold (S-curve knee), not a hardcoded constant.
    # ALWAYS corpus-global — a delta doc can near-dup an unchanged
    # one, so clustering never reuses old state.
    bands, _rows = similarity.minhash_params_for_threshold(
        dedup_threshold, num_hashes=_NUM_HASHES
    )
    # Signature table: carried for unchanged keepers (per-doc pure
    # function), fresh for the delta; candidate generation and the
    # Jaccard verify stay corpus-global inside
    # minhash_near_duplicates_from_sigs (verify re-shingles candidate
    # docs only — the full-text scan touches delta ∪ candidates).
    if old_sigs is not None:
        carried_sigs = (
            old_sigs.join(carried_ids, "doc_id")
            .join(kept.select("doc_id"), "doc_id", "left_semi")
            .select(*_SIG_COLS)
        )
        fresh_sig_docs = kept.join(
            carried_sigs.select("doc_id"), "doc_id", "left_anti"
        )
        fresh_sigs = dedup.minhash_signatures_arr(
            dedup.token_arrays(fresh_sig_docs, shingle=dedup_shingle),
            num_hashes=_NUM_HASHES,
        ).select(*_SIG_COLS)
        sigs = fresh_sigs.unionByName(carried_sigs).persist()
        report["n_sigs_carried"] = carried_sigs.count()
    else:
        sigs = dedup.minhash_signatures_arr(
            dedup.token_arrays(kept, shingle=dedup_shingle),
            num_hashes=_NUM_HASHES,
        ).select(*_SIG_COLS).persist()
    pairs = dedup.minhash_near_duplicates_from_sigs(
        kept,
        sigs,
        threshold=dedup_threshold,
        shingle=dedup_shingle,
        num_hashes=_NUM_HASHES,
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

    # 3a'. ExactSubstr span REMOVAL (optional): excise corpus-
    # duplicated k-char runs from the text itself, keeping exactly
    # the first (doc_id, pos) occurrence of every duplicated passage
    # — the Lee et al. cleaning step, surgical where the 3b frac
    # gate below is whole-doc. Runs over the dedup survivors
    # (corpus-GLOBAL, recomputed per run like the near-dup stage);
    # the text-derived admission gates (quality/fluency/
    # contamination) were judged on the ORIGINAL text — removal is
    # cleaning, not re-admission — and everything downstream
    # (splits, packing, shards) sees the cleaned text. When both
    # options are set, the frac gate measures the RESIDUAL after
    # removal (normally zero).
    if dup_span_removal_k is not None:
        cleaned = dedup.remove_dup_spans(
            deduped, k=dup_span_removal_k
        ).persist()
        stats = cleaned.agg(
            F.sum("removed_chars").alias("rm"),
            F.count(F.when(F.col("n_removed_spans") > 0, 1)).alias(
                "nd"
            ),
        ).collect()[0]
        report["n_span_cleaned_docs"] = stats["nd"]
        report["span_removed_chars"] = int(stats["rm"] or 0)
        deduped.unpersist()
        deduped = cleaned.drop("n_removed_spans", "removed_chars")

    # 3b. exact-substring trim gate (optional): docs whose sampled
    # duplicated-window fraction exceeds the cap drop — the
    # ExactSubstr-style boilerplate/mirror trim that whole-doc near-dup
    # can't see (two distinct pages sharing a big verbatim block).
    # Corpus-GLOBAL like the near-dup stage: cross-doc fingerprint
    # counts are corpus-wide state, recomputed per run over the dedup
    # survivors exactly like cluster composition — never carried.
    if dup_span_max_frac is not None:
        spanful = (
            dedup.dup_span_stats(deduped)
            .filter(F.col("dup_frac") > dup_span_max_frac)
            .select("doc_id")
        )
        span_ok = deduped.join(spanful, "doc_id", "left_anti").persist()
        report["n_span_ok"] = span_ok.count()
        deduped.unpersist()
    else:
        span_ok = deduped
        report["n_span_ok"] = report["n_deduped"]

    # 4. LM fluency gate (optional): drop docs scored below the floor
    # by the reference-trained bigram LM. Docs with <2 tokens have no
    # bigrams and a NULL score — they pass (the length gate already
    # judged them).
    if has_fluency:
        disfluent = gates.filter(
            F.col("avg_logp") < fluency_floor
        ).select("doc_id")
        fluent = span_ok.join(disfluent, "doc_id", "left_anti").persist()
        report["n_fluent"] = fluent.count()
        span_ok.unpersist()
    else:
        fluent = span_ok
        report["n_fluent"] = report["n_span_ok"]

    # 5. benchmark decontamination (optional)
    if has_benchmark:
        dirty = gates.filter("contaminated").select("doc_id")
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
    report["n_dropped_dupspan"] = (
        report["n_deduped"] - report["n_span_ok"]
    )
    report["n_dropped_disfluent"] = report["n_span_ok"] - report["n_fluent"]
    report["n_dropped_contaminated"] = (
        report["n_fluent"] - report["n_clean"]
    )

    # 6. persist the per-doc state for the next (incremental) run:
    # gate table + keeper signature table, each with its shape markers
    if state_dir is not None:
        (
            gates.withColumn("has_fluency", F.lit(has_fluency))
            .withColumn("has_benchmark", F.lit(has_benchmark))
            .withColumn("gopher_key", F.lit(gopher_key).cast("string"))
            .withColumn("contam_mode", F.lit(contamination_mode))
            .write.mode("overwrite")
            .parquet(state_dir + "/gates")
        )
        (
            sigs.withColumn("sig_shingle", F.lit(dedup_shingle))
            .withColumn("sig_num_hashes", F.lit(_NUM_HASHES))
            .write.mode("overwrite")
            .parquet(state_dir + "/sigs")
        )

    # 7. epoch planning over the surviving corpus (optional)
    if epoch_targets is not None:
        report["epoch_plan"] = [
            row.asDict()
            for row in sampling.epoch_plan(clean, epoch_targets)
            .orderBy("stratum")
            .collect()
        ]

    # 8. pack + write shards — with split_fracs, assignment is keyed
    # on a near-dup cluster map built over the SURVIVORS at the
    # LOOSER split_cluster_threshold. The stage-3 (dedup_threshold)
    # map cannot protect anything here: best-copy dedup leaves one
    # member per cluster, so every survivor would key on its own id
    # and 0.85-similar docs could straddle train/eval. Splitting at
    # 0.8-coherence while deduplicating at 0.9 is exactly the Lee et
    # al. recommendation: drop only true duplicates, but never let a
    # near-duplicate of a training doc into the held-out sets. Each
    # split packs into its own subtree (all three subtrees always
    # exist — an empty split is an empty shard tree, not a missing
    # path a loader trips over at train time).
    if split_fracs is not None:
        s_pairs = dedup.minhash_near_duplicates(
            clean,
            threshold=split_cluster_threshold,
            shingle=dedup_shingle,
            bands=similarity.minhash_params_for_threshold(
                split_cluster_threshold, num_hashes=_NUM_HASHES
            )[0],
            num_hashes=_NUM_HASHES,
        )
        split_assign = sampling.cluster_safe_splits(
            clean,
            dedup.duplicate_clusters(s_pairs),
            fracs=split_fracs,
        )
        labeled = clean.join(
            split_assign.select("doc_id", "split"), "doc_id"
        ).persist()
        counts = {
            r["split"]: r["n"]
            for r in labeled.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        report["split_counts"] = {
            name: counts.get(name, 0) for name in ("train", "val", "test")
        }
        for name in ("train", "val", "test"):
            packing.write_packed_shards(
                labeled.filter(F.col("split") == name).drop("split"),
                f"{out_dir}/split={name}",
                budget=budget,
                n_shards=n_shards,
            )
        labeled.unpersist()
    else:
        packing.write_packed_shards(
            clean, out_dir, budget=budget, n_shards=n_shards
        )

    # 9. data card over what shipped
    report["corpus_card"] = [
        row.asDict()
        for row in textops.corpus_card(clean).orderBy("source").collect()
    ]
    clean.unpersist()
    gates.unpersist()
    sigs.unpersist()
    return report
