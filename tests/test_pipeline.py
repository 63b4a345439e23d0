"""End-to-end corpus pipeline test: the full flow on real testdata +
a synthetic case where every stage provably drops something."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_activity_monitoring_dam_system_spark import pipeline
from database_activity_monitoring_dam_system_spark.sources.testdata import (
    load_table,
)

from .conftest import SF_SMOKE


def test_pipeline_on_testdata(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    # a benchmark set sampled FROM the corpus guarantees contamination
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    report = pipeline.run_corpus_pipeline(
        docs,
        str(tmp_path / "shards"),
        benchmark=bench,
        epoch_targets={"en": 100_000, "de": 100_000},
        n_shards=4,
    )
    # monotone survivor counts, every stage accounted for
    assert (
        report["n_raw"]
        >= report["n_quality"]
        >= report["n_deduped"]
        >= report["n_clean"]
        > 0
    )
    assert (
        report["n_dropped_null_id"]
        + report["n_dropped_null_text"]
        + report["n_dropped_quality"]
        + report["n_dropped_dedup"]
        + report["n_dropped_disfluent"]
        + report["n_dropped_contaminated"]
    ) == report["n_raw"] - report["n_clean"]
    # eval items verbatim in the corpus must have been dropped
    assert report["n_dropped_contaminated"] > 0
    # shards on disk hold exactly the survivors
    back = spark.read.parquet(str(tmp_path / "shards"))
    assert back.count() == report["n_clean"]
    # the data card census agrees with the shipped corpus
    assert sum(c["n_docs"] for c in report["corpus_card"]) == report["n_clean"]
    langs_with_targets = {
        e["stratum"] for e in report["epoch_plan"] if e["target_tokens"] > 0
    }
    assert langs_with_targets == {"en", "de"}


def test_pipeline_drops_null_text(spark, tmp_path):
    # A NULL-text row must be counted and dropped at step 0, not slide
    # through the quality gate on NULL predicates (it has no shingles,
    # bigrams, or fingerprints, so every downstream stage is blind to
    # it) and into the shards as a textless training entry.
    good = "the quick brown fox of the field and a dog to run far away"
    docs = spark.createDataFrame(
        [(1, good, "en", "s0"), (2, None, "en", "s0"), (None, good, "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    report = pipeline.run_corpus_pipeline(
        docs, str(tmp_path / "shards"), n_shards=2
    )
    assert report["n_raw"] == 3
    assert report["n_dropped_null_id"] == 1
    assert report["n_dropped_null_text"] == 1
    assert report["n_quality"] == 1 and report["n_clean"] == 1
    back = spark.read.parquet(str(tmp_path / "shards"))
    assert [r.doc_id for r in back.collect()] == [1]
    assert back.filter(F.col("text").isNull()).count() == 0


def test_pipeline_dedup_keeps_best_copy(spark, tmp_path):
    # Three near-identical docs (differing by one token) + one clean
    # doc: the dedup stage must keep exactly one of the trio — the
    # LARGEST (doc 3, which has an extra token), not the min-id.
    base = (
        "the quick brown fox jumps over a lazy dog and the cat sat on "
        "the mat while a bird of prey watched them all from the tall tree"
    )
    rows = [
        (1, base, "en", "s0"),
        (2, base + " again", "en", "s0"),
        (3, base + " again twice", "en", "s0"),
        (4, "completely different content " * 5 + "the a of and to", "en", "s1"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    report = pipeline.run_corpus_pipeline(
        docs, str(tmp_path / "shards"), dedup_threshold=0.8, n_shards=2
    )
    assert report["n_raw"] == 4 and report["n_quality"] == 4
    assert report["n_deduped"] == 2  # trio collapsed to one + doc 4
    survivors = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "shards")).collect()
    }
    assert survivors == {3, 4}  # largest of the trio kept


def test_pipeline_fluency_gate(spark, tmp_path):
    # reference LM trained on one domain; a gibberish doc (unseen
    # bigrams everywhere) must fall below the floor while in-domain
    # text survives.
    domain = (
        "the cat sat on the mat and the dog ran to the cat of a house "
        "and the mat was near a door to the house of the dog"
    )
    ref = spark.createDataFrame(
        [(i, domain, "en", "ref") for i in range(3)],
        "doc_id long, text string, lang string, source string",
    )
    docs = spark.createDataFrame(
        [
            (1, domain, "en", "s0"),
            (2, "zq wv xj kp bn mr dl tz " * 3 + "the a of and to qq", "en", "s0"),
        ],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text"))
    # the smoothing floor is ln(1/V) — with a toy vocabulary that is
    # only ≈ -2.7, so derive the cut from the actual score gap instead
    # of assuming a production-scale constant
    from database_activity_monitoring_dam_system_spark.operators import (
        textops,
    )

    model = textops.bigram_lm_train(ref)
    scores = {
        r.doc_id: r.avg_logp
        for r in textops.bigram_lm_score(docs, model).collect()
    }
    assert scores[1] > scores[2]
    floor = (scores[1] + scores[2]) / 2
    report = pipeline.run_corpus_pipeline(
        docs,
        str(tmp_path / "shards"),
        fluency_reference=ref,
        fluency_floor=floor,
        n_shards=2,
    )
    assert report["n_dropped_disfluent"] == 1
    survivors = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "shards")).collect()
    }
    assert survivors == {1}


def test_pipeline_composes_with_jsonl_reader(spark, tmp_path):
    # the advertised flow: raw JSONL (with damage and drift) straight
    # into the pipeline, no manual schema patching
    from database_activity_monitoring_dam_system_spark.sources import (
        documents as docsrc,
    )

    text = "the quick brown fox of the field and a dog to run far away"
    p = tmp_path / "crawl.jsonl"
    p.write_text(
        f'{{"doc_id": 1, "text": "{text}", "lang": "en", "source": "s0"}}\n'
        "garbage line\n"
        '{"unrelated": "drift row"}\n'
        f'{{"doc_id": 2, "text": "{text} twice", "lang": "en", "source": "s0"}}\n'
    )
    ing = docsrc.read_documents_jsonl(spark, str(p))
    report = pipeline.run_corpus_pipeline(
        ing.clean, str(tmp_path / "shards"), dedup_threshold=0.8, n_shards=2
    )
    assert report["n_raw"] == 3  # 2 documents + 1 drift row
    assert report["n_dropped_null_id"] == 1  # the drift row, accounted
    assert report["n_clean"] >= 1
    back = spark.read.parquet(str(tmp_path / "shards"))
    assert "text" in back.columns and back.count() == report["n_clean"]


def test_pipeline_incremental_equals_full_recompute(spark, tmp_path):
    """The crawl-refresh story: snapshot A runs with state_dir, then
    snapshot B runs incrementally (old_snapshot + old_state_dir) —
    per-doc gates are computed for the delta only, yet the OUTPUT
    (stage counts, corpus card, shard contents) is identical to a
    full recompute of B. The fixture forces the hard case: a document
    ADDED in B near-dups an UNCHANGED document and, being larger,
    displaces it as cluster keeper — carried docs must still flow
    through the global dedup."""
    base = (
        "the quick brown fox jumps over a lazy dog and the cat sat on "
        "the mat while a bird of prey watched them all from the tall tree"
    )
    eval_item = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    bench = spark.createDataFrame(
        [(100, eval_item)], "doc_id long, text string"
    )
    snap_a = spark.createDataFrame(
        [
            (1, base, "en", "s0"),
            (2, "this doc exists only in the first snapshot of the crawl "
                "and talks about the sea and the sky for a while", "en", "s0"),
            (3, "original words of the changed document with many plain "
                "tokens that the gate will keep around today", "en", "s1"),
            (5, "intro words here " + eval_item + " trailing text of the "
                "contaminated document to keep the length fine", "en", "s1"),
            (6, "whitespace churn document with  double  spacing between "
                "some of the tokens and a steady tail of words", "en", "s0"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    snap_b = spark.createDataFrame(
        [
            (1, base, "en", "s0"),  # unchanged
            (3, "revised words of the changed document with many plain "
                "tokens that the gate will keep around today", "en", "s1"),
            (4, base + " again bigger", "en", "s0"),  # added near-dup of 1
            (5, "intro words here " + eval_item + " trailing text of the "
                "contaminated document to keep the length fine", "en", "s1"),
            (6, "whitespace churn document with double spacing between "
                "some of the tokens and a steady tail of words", "en", "s0"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    common = dict(benchmark=bench, dedup_threshold=0.8, n_shards=2)

    full = pipeline.run_corpus_pipeline(
        snap_b, str(tmp_path / "full_shards"), **common
    )
    pipeline.run_corpus_pipeline(
        snap_a, str(tmp_path / "a_shards"),
        state_dir=str(tmp_path / "state_a"), **common
    )
    inc = pipeline.run_corpus_pipeline(
        snap_b, str(tmp_path / "inc_shards"),
        old_snapshot=snap_a,
        old_state_dir=str(tmp_path / "state_a"),
        state_dir=str(tmp_path / "state_b"),
        **common,
    )

    # the per-doc scans ran over the delta only: 1 and 5 are
    # byte-identical; 3 changed, 4 is new, 6 changed in raw bytes
    # (whitespace churn MUST re-process — quality ratios see raw text)
    assert inc["n_carried"] == 2
    assert inc["n_delta"] == 3
    # ...and the MinHash signatures rode along for the unchanged
    # keepers (1 and 5 are byte-identical AND quality-kept), so the
    # dedup stage re-shingled only delta ∪ candidate docs
    assert inc["n_sigs_carried"] == 2
    assert "n_sigs_carried" not in full  # full runs compute all fresh

    for key in (
        "n_quality", "n_deduped", "n_fluent", "n_clean",
        "n_dropped_dedup", "n_dropped_contaminated", "corpus_card",
    ):
        assert inc[key] == full[key], key

    cols = None
    frames = []
    for d in ("full_shards", "inc_shards"):
        df = spark.read.parquet(str(tmp_path / d))
        cols = cols or sorted(df.columns)
        frames.append(sorted(tuple(r) for r in df.select(*cols).collect()))
    assert frames[0] == frames[1]
    survivors = {r[cols.index("doc_id")] for r in frames[1]}
    assert 4 in survivors and 1 not in survivors  # added doc displaced 1
    assert 5 not in survivors  # carried contamination flag applied

    # a changed dedup config silently drops the signature carry (the
    # output doesn't depend on where signatures came from, unlike the
    # gate-shape case below) — gates still ride, sigs recompute fresh
    inc2 = pipeline.run_corpus_pipeline(
        snap_b, str(tmp_path / "inc2_shards"),
        old_snapshot=snap_a,
        old_state_dir=str(tmp_path / "state_a"),
        dedup_shingle=2, **common,
    )
    assert inc2["n_carried"] == 2
    assert "n_sigs_carried" not in inc2

    # state written with a different gate shape refuses to be reused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="gate configuration"):
        pipeline.run_corpus_pipeline(
            snap_b, str(tmp_path / "bad_shards"),
            old_snapshot=snap_a,
            old_state_dir=str(tmp_path / "state_a"),
            dedup_threshold=0.8, n_shards=2,  # benchmark omitted
        )
    with _pytest.raises(ValueError, match="BOTH"):
        pipeline.run_corpus_pipeline(
            snap_b, str(tmp_path / "bad2_shards"),
            old_snapshot=snap_a, **common,
        )


def test_pipeline_dup_span_trim_gate(spark, tmp_path):
    """Two docs that are NOT whole-doc near-dups but share a large
    verbatim block: the exact-substring stage trims the one(s) whose
    sampled duplicated fraction exceeds the cap; with the flag off the
    stage is a no-op (n_span_ok == n_deduped, no n_dropped_dupspan
    rows lost)."""
    shared = (
        "this exact boilerplate navigation header appears verbatim on "
        "every mirrored page of the site and dominates short articles "
        "entirely from start to finish without any change at all"
    )
    rows = [
        # doc 1: almost all shared block → high dup_frac
        (1, shared + " tiny tail", "en", "s0"),
        # doc 2: shared block + a long unique body → low dup_frac
        (
            2,
            shared
            + " but this page then continues with a long and entirely "
            "unique body of text about something else altogether, "
            "paragraph after paragraph of fresh material " * 3,
            "en",
            "s0",
        ),
        (3, "completely different content " * 5 + "the a of and to", "en", "s1"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    report = pipeline.run_corpus_pipeline(
        docs, str(tmp_path / "shards"), dedup_threshold=0.95,
        dup_span_max_frac=0.6, n_shards=2,
    )
    assert report["n_deduped"] == 3  # not whole-doc near-dups
    assert report["n_span_ok"] == 2
    assert report["n_dropped_dupspan"] == 1
    survivors = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "shards")).collect()
    }
    assert survivors == {2, 3}

    off = pipeline.run_corpus_pipeline(
        docs, str(tmp_path / "shards_off"), dedup_threshold=0.95,
        n_shards=2,
    )
    assert off["n_span_ok"] == off["n_deduped"] == 3
    assert off["n_dropped_dupspan"] == 0


def test_pipeline_rejects_same_state_dir(spark, tmp_path):
    """Refreshing state in place would overwrite the parquet the
    carried gate rows are lazily read from — rejected up front."""
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, "some document text here", "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    with _pytest.raises(ValueError, match="state_dir must differ"):
        pipeline.run_corpus_pipeline(
            docs,
            str(tmp_path / "shards"),
            state_dir=str(tmp_path / "state"),
            old_snapshot=docs,
            old_state_dir=str(tmp_path / "state"),
        )


def test_pipeline_split_output(spark, tmp_path):
    """split_fracs partitions the packed output into per-split
    subtrees: doc sets are disjoint, their union is exactly the clean
    survivors, counts match the report, all three subtrees exist even
    when a split is empty — and the load-bearing property: a pair
    whose similarity sits BETWEEN split_cluster_threshold and
    dedup_threshold (both copies survive dedup) still shares a split,
    which the stage-3 dedup map could never guarantee (best-copy
    dedup leaves one member per cluster)."""
    base = (
        "the quick brown fox jumps over a lazy dog and the cat sat on "
        "the mat while a bird of prey watched them all from a tall tree "
        "as evening light faded slowly across the quiet village green"
    )
    rows = []
    for i in range(12):
        rows.append(
            (i, f"document number {i} " + base + f" tail{i}", "en", "s0")
        )
    # the in-between pair: ONE changed trailing word → 3-shingle
    # Jaccard ≈ 0.86 (above the 0.8 split threshold, below the 0.99
    # dedup threshold) — both survive dedup, MUST share a split
    rows.append((100, base + " ending alpha", "en", "s0"))
    rows.append((101, base + " ending omega", "en", "s0"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    report = pipeline.run_corpus_pipeline(
        docs, str(tmp_path / "shards"), dedup_threshold=0.99,
        split_fracs=(0.5, 0.25), split_cluster_threshold=0.8, n_shards=2,
    )
    assert set(report["split_counts"]) == {"train", "val", "test"}
    seen: dict[int, str] = {}
    for name in ("train", "val", "test"):
        p = tmp_path / "shards" / f"split={name}"
        assert p.exists()  # empty split = empty tree, never missing
        if report["split_counts"][name] == 0:
            continue  # zero-row parquet trees carry no readable footer
        ids = {r.doc_id for r in spark.read.parquet(str(p)).collect()}
        assert len(ids) == report["split_counts"][name]
        for i in ids:
            assert i not in seen  # disjoint
            seen[i] = name
    assert len(seen) == report["n_clean"]
    # both in-between near-dups shipped, and in the SAME split
    assert 100 in seen and 101 in seen
    assert seen[100] == seen[101]


def test_pipeline_gopher_gate_and_state_fingerprint(spark, tmp_path):
    """gopher_stopwords= ANDs the Gopher battery into the quality
    gate: a doc passing the length/punct/stopword heuristics but
    failing a Gopher rule (mean word length < 3 here) is dropped; the
    incremental path carries the COMBINED verdict and still equals a
    full recompute; state written without the gate (or with a
    different stoplist) refuses to be reused with it."""
    import pytest as _pytest

    good = " ".join(
        ["the", "quick", "brown", "fox", "and", "some", "plain",
         "words", "that", "keep", "flowing", "along"] * 5
    )  # 60 words, mean len > 3, stopword-rich
    shorty = " ".join((["aa", "to", "of", "a"] * 15))  # 60 words, mean len 2
    rows_a = [(1, good, "en", "s0"), (2, shorty, "en", "s0")]
    rows_b = rows_a + [(3, good + " extra tail words here", "en", "s1")]
    snap_a = spark.createDataFrame(
        rows_a, "doc_id long, text string, lang string, source string"
    )
    snap_b = spark.createDataFrame(
        rows_b, "doc_id long, text string, lang string, source string"
    )
    stops = ("the", "a", "of", "and", "to")
    common = dict(dedup_threshold=0.8, n_shards=1)

    plain = pipeline.run_corpus_pipeline(
        snap_a, str(tmp_path / "plain"), **common
    )
    assert plain["n_quality"] == 2  # both pass the base heuristics

    gated = pipeline.run_corpus_pipeline(
        snap_a, str(tmp_path / "gated"),
        gopher_stopwords=stops,
        state_dir=str(tmp_path / "state_a"), **common,
    )
    assert gated["n_quality"] == 1  # the mean-word-length rule bites

    full = pipeline.run_corpus_pipeline(
        snap_b, str(tmp_path / "full"), gopher_stopwords=stops, **common
    )
    inc = pipeline.run_corpus_pipeline(
        snap_b, str(tmp_path / "inc"),
        gopher_stopwords=stops,
        old_snapshot=snap_a,
        old_state_dir=str(tmp_path / "state_a"),
        state_dir=str(tmp_path / "state_b"), **common,
    )
    assert inc["n_carried"] == 2 and inc["n_delta"] == 1
    for key in ("n_quality", "n_deduped", "n_clean", "corpus_card"):
        assert inc[key] == full[key], key

    # state without the gate cannot serve a gated run, and vice versa
    with _pytest.raises(ValueError, match="gate configuration"):
        pipeline.run_corpus_pipeline(
            snap_b, str(tmp_path / "bad"),
            gopher_stopwords=("different", "list"),
            old_snapshot=snap_a,
            old_state_dir=str(tmp_path / "state_a"), **common,
        )
    pipeline.run_corpus_pipeline(
        snap_a, str(tmp_path / "plain2"),
        state_dir=str(tmp_path / "state_plain"), **common,
    )
    with _pytest.raises(ValueError, match="gate configuration"):
        pipeline.run_corpus_pipeline(
            snap_b, str(tmp_path / "bad2"),
            gopher_stopwords=stops,
            old_snapshot=snap_a,
            old_state_dir=str(tmp_path / "state_plain"), **common,
        )


def test_pipeline_bloom_contamination_mode(spark, tmp_path):
    """contamination_mode='bloom' drops a SUPERSET of the exact
    mode's contaminated docs (one-sided error, the safe direction);
    the mode is part of the incremental-state fingerprint — state
    written under one mode refuses to serve the other."""
    import pytest as _pytest

    docs = load_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    exact = pipeline.run_corpus_pipeline(
        docs, str(tmp_path / "exact"), benchmark=bench, n_shards=2,
    )
    bloom = pipeline.run_corpus_pipeline(
        docs, str(tmp_path / "bloom"), benchmark=bench, n_shards=2,
        contamination_mode="bloom",
        state_dir=str(tmp_path / "state_bloom"),
    )
    assert (
        bloom["n_dropped_contaminated"]
        >= exact["n_dropped_contaminated"]
        > 0
    )
    with _pytest.raises(ValueError, match="contamination_mode"):
        pipeline.run_corpus_pipeline(
            docs, str(tmp_path / "bad"), benchmark=bench,
            contamination_mode="fuzzy",
        )
    # exact-mode incremental run against bloom-mode state must refuse
    with _pytest.raises(ValueError, match="different gate"):
        pipeline.run_corpus_pipeline(
            docs, str(tmp_path / "mix"), benchmark=bench, n_shards=2,
            old_snapshot=docs,
            old_state_dir=str(tmp_path / "state_bloom"),
        )
    # bloom-mode incremental against its own state reproduces itself
    again = pipeline.run_corpus_pipeline(
        docs, str(tmp_path / "again"), benchmark=bench, n_shards=2,
        contamination_mode="bloom",
        old_snapshot=docs,
        old_state_dir=str(tmp_path / "state_bloom"),
    )
    assert again["n_clean"] == bloom["n_clean"]


def test_pipeline_dup_span_removal_excises_not_drops(spark, tmp_path):
    """dup_span_removal_k opt-in: two docs sharing a big verbatim
    block (not whole-doc near-dups) BOTH survive, but the block is
    excised from the later doc while the first keeps it; unique text
    comes out of the shards byte-exact. The surgical alternative to
    the whole-doc dup_span_max_frac drop."""
    block = (
        "this exact boilerplate navigation header appears verbatim on "
        "every mirrored page of the site and never changes between "
        "pages even a little bit"
    )
    body1 = (
        "afterwards the first article continues with its own distinct "
        "reporting on regional infrastructure projects and budgets "
        "covering several departments in detail across the year"
    )
    body2 = (
        "whereas the second page follows with completely different "
        "material about culinary history and seasonal recipes from "
        "various unrelated traditions around the world instead"
    )
    rows = [
        (1, "alpha intro." + block + ".first tail " + body1, "en", "s0"),
        (2, "omega start~" + block + "~second end " + body2, "en", "s0"),
        # NON-repetitive bystander: within-doc repetition ≥ k would
        # itself be (correctly) excised by ExactSubstr
        (3, "a third page holds entirely original prose mentioning "
            "neither header nor article, just plain filler sentences "
            "written once and never repeated anywhere in the corpus",
         "en", "s1"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    report = pipeline.run_corpus_pipeline(
        docs, str(tmp_path / "shards"), dedup_threshold=0.95,
        dup_span_removal_k=24, n_shards=2,
    )
    assert report["n_deduped"] == 3  # removal never drops docs
    assert report["n_span_cleaned_docs"] == 1
    assert report["span_removed_chars"] == len(block)
    out = {
        r.doc_id: r.text
        for r in spark.read.parquet(str(tmp_path / "shards")).collect()
    }
    # first holder byte-exact, later holder spliced byte-exact,
    # bystander untouched
    assert out[1] == rows[0][1]
    assert out[2] == "omega start~" + "~second end " + body2
    assert out[3] == rows[2][1]
