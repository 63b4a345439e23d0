"""Streaming dedup + iterative duplicate-clustering tests."""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import tempfile

import pytest

from database_activity_monitoring_dam_system_spark.operators import dedup
from database_activity_monitoring_dam_system_spark.sources.agent import (
    normalize_agent_events,
)
from database_activity_monitoring_dam_system_spark.streaming import (
    dedup_stream,
    ingest,
)


def _union_find_expected(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_duplicate_clusters_matches_union_find(spark):
    pairs = [
        (1, 2), (2, 3), (3, 4),          # chain → cluster 1
        (10, 11), (11, 12),              # cluster 10
        (20, 21),                        # cluster 20
        (4, 1),                          # cycle back
    ]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.duplicate_clusters(df).collect()
    }
    assert got == _union_find_expected(pairs)


def test_duplicate_clusters_on_real_lsh_pairs(spark):
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = dedup.jaccard_pairs(docs, block_col=None, threshold=0.95)
    clusters = dedup.duplicate_clusters(pairs)
    rows = clusters.collect()
    expected = _union_find_expected(
        [(r.doc_a, r.doc_b) for r in pairs.collect()]
    )
    assert {r.doc_id: r.cluster_id for r in rows} == expected
    # representative is always the cluster minimum
    assert all(r.cluster_id <= r.doc_id for r in rows)


def test_dedup_stream_drops_replayed_events(spark):
    base = tempfile.mkdtemp(prefix="dam_dedup_")
    src = f"{base}/src"
    os.makedirs(src)
    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    ev = lambda i, sql: {
        "event_time": (t0 + dt.timedelta(seconds=i)).isoformat(),
        "user_host": "u[u] @ h []",
        "argument": sql,
    }
    # file 2 replays file 1's events (agent retry) + adds one new one
    batch1 = [ev(i, f"SELECT {i} FROM products") for i in range(5)]
    batch2 = batch1 + [ev(99, "SELECT 99 FROM products")]
    with open(f"{src}/a.json", "w") as fh:
        fh.writelines(json.dumps(r) + "\n" for r in batch1)
    with open(f"{src}/b.json", "w") as fh:
        fh.writelines(json.dumps(r) + "\n" for r in batch2)
    try:
        stream = ingest.read_agent_stream(spark, src, max_files_per_trigger=1)
        deduped = dedup_stream.dedup_stream(normalize_agent_events(stream))
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_t")
            .outputMode("append")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT operation_details FROM dedup_t").collect()
        # 5 unique from batch1 + 1 new from batch2; replays dropped
        assert len(rows) == 6
        assert len({r.operation_details for r in rows}) == 6
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_small_graph_fast_path_equals_distributed(spark):
    """The adaptive union-find path and the distributed label-
    propagation rounds must produce identical labelings."""
    import random

    rng = random.Random(7)
    edges = {(rng.randrange(60), rng.randrange(60)) for _ in range(80)}
    pairs = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    fast = {
        (r.doc_id, r.cluster_id)
        for r in dedup.duplicate_clusters(df).collect()
    }
    dist = {
        (r.doc_id, r.cluster_id)
        for r in dedup.duplicate_clusters(
            df, small_graph_threshold=0
        ).collect()
    }
    assert fast == dist and fast


def test_dup_span_stats_flags_planted_passage(spark):
    """Content-defined sampling picks the SAME windows from the same
    text wherever it appears, so a shared passage is detected even at
    offsets with different alignments (the case position-strided
    sampling misses — verified: a stride-4 variant of this operator
    failed exactly this fixture). Both sharers get n_dup_spans ≥ 1; a
    doc sharing nothing has 0 duplicated sampled windows; sub-window
    docs (len < k) and NULL text drop out entirely."""
    from database_activity_monitoring_dam_system_spark.operators import dedup

    passage = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        # passage offsets 5 and 20: different phases mod any stride>1
        (1, "AAA " + passage + " XYZ unique tail one here padding"),
        (2, "BBB prefix differs " + passage + " other ending text"),
        (3, "completely unrelated content with no shared windows at all"),
        (4, "tiny"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dedup.dup_span_stats(docs, k=24, sample_digits=4).collect()
    }
    assert out[1].n_dup_spans >= 1 and out[2].n_dup_spans >= 1
    if 3 in out:  # present iff any of its windows were sampled
        assert out[3].n_dup_spans == 0 and out[3].dup_frac == 0.0
    assert 4 not in out and 5 not in out
    for r in out.values():
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert abs(r.dup_frac - round(r.n_dup_spans / r.n_spans, 6)) < 1e-9


def test_jaccard_prefix_pairs_lossless_and_pruned(spark):
    """The prefix-filtered exact join returns EXACTLY the unblocked
    quadratic join's pairs (losslessness — the PPJoin theorem), on
    testdata AND on a crafted boundary fixture where a pair sits
    exactly at the threshold; and the prefix candidate set is
    genuinely smaller than all shared-token pairs."""
    from pyspark.sql import functions as F

    from database_activity_monitoring_dam_system_spark.operators import dedup
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exact = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.jaccard_pairs(
            docs, threshold=0.8, shingle=3
        ).collect()
    }
    fast = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.jaccard_prefix_pairs(
            docs, threshold=0.8, shingle=3
        ).collect()
    }
    assert fast == exact and len(fast) > 0
    # the pruning claim, asserted directly: prefix candidates are a
    # strict subset of all shared-token pairs (the quadratic join's
    # candidate space)
    sharr = dedup.token_arrays(docs, shingle=3).select("doc_id", "toks")
    n_cands = dedup.jaccard_prefix_candidates(
        sharr, threshold=0.8
    ).count()
    toks = dedup.distinct_tokens(docs, shingle=3)
    a, b = toks.alias("a"), toks.alias("b")
    n_all = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert 0 < n_cands < n_all / 2, (n_cands, n_all)
    # boundary: sets {a b c d e} vs {a b c d f} → J = 4/6 = 0.667;
    # with t = 2/3 the pair must survive (>=, not >)
    tiny = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f"), (3, "x y z w q")],
        "doc_id long, text string",
    )
    got = dedup.jaccard_prefix_pairs(
        tiny, threshold=2 / 3, shingle=1
    ).collect()
    assert [(r.doc_a, r.doc_b) for r in got] == [(1, 2)]
    assert abs(got[0].jaccard - round(4 / 6, 4)) < 1e-9


# ------------------------------------------------------- containment join


def _contain_docs(spark):
    core = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    wrap = (
        "site header menu about contact " + core +
        " footer copyright terms privacy newsletter subscribe"
    )
    other = "one two three four five six seven eight nine ten"
    return spark.createDataFrame(
        [(1, core), (2, wrap), (3, other)], "doc_id long, text string"
    )


def test_containment_detects_near_superset_jaccard_misses(spark):
    """The operator's reason to exist: a doc wrapped in boilerplate
    fully CONTAINS the original (C(core→wrap) = 1) while symmetric
    Jaccard sits far below any dedup threshold."""
    from database_activity_monitoring_dam_system_spark.operators import dedup

    docs = _contain_docs(spark)
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_prefix_pairs(
            docs, threshold=0.9, shingle=1
        ).collect()
    }
    assert got == {(1, 2): 1.0}  # directed: core ⊂ wrap only
    jac = dedup.jaccard_pairs(docs, threshold=0.3, shingle=1).collect()
    assert all(r["jaccard"] < 0.5 for r in jac)  # symmetric view is blind


def test_containment_prefix_filter_lossless_vs_naive(spark):
    """Filter losslessness on a randomized-ish corpus: the prefix-
    filtered join returns EXACTLY the naive all-directed-pairs set."""
    from pyspark.sql import functions as F

    from database_activity_monitoring_dam_system_spark.operators import dedup

    words = "w%d"
    rows = []
    for i in range(30):
        toks = [words % ((i * 7 + j * 13) % 40) for j in range(6 + i % 5)]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.7
    fast = {
        (r["doc_a"], r["doc_b"], r["containment"])
        for r in dedup.containment_prefix_pairs(
            docs, threshold=t, shingle=1
        ).collect()
    }
    toks = dedup.distinct_tokens(docs, shingle=1)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    naive = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("c"))
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")
            ),
            "doc_a",
        )
        .withColumn("containment", F.col("c") / F.col("n_a"))
        .filter(F.col("containment") >= t)
    )
    slow = {
        (r["doc_a"], r["doc_b"], round(r["containment"], 4))
        for r in naive.collect()
    }
    assert fast == slow and len(slow) > 0


def test_prefix_cut_exact_ceil_boundary_thresholds(spark):
    """Regression: the prefix bound must use the EXACT integer
    ceil(t*n). Double arithmetic overshoots it for thresholds whose
    float product rounds up past the true value (0.55*20 =
    11.000000000000002 → ceil 12 instead of 11), cutting the probe
    prefix one token short and silently dropping qualifying pairs.

    Crafted fixture (t=0.56, n=25: double 0.56*25 = 14.000000000000002
    → buggy ceil 15, exact 14): doc 0 has 11 unique tokens (df=1,
    rarest — they fill the prefix front) + 14 tokens shared with doc 1
    (df≥2) → containment(0→1) = 14/25 = 0.56 exactly.  The correct
    prefix (25-14+1 = 12 tokens) includes one shared token, so the
    pair surfaces; the buggy prefix (11 tokens) holds only the unique
    ones and loses the pair — verified red against the old bound."""
    uniq = " ".join(f"u{i:02d}" for i in range(11))
    shared = " ".join(f"s{i:02d}" for i in range(14))
    filler = " ".join(f"f{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (0, uniq + " " + shared),
            (1, shared + " " + filler),
            (2, shared),  # raises shared-token df above the uniques
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.containment_prefix_pairs(
            docs, threshold=0.56, shingle=1
        ).collect()
    }
    assert (0, 1) in pairs


def test_update_containment_pairs_equals_fresh_rebuild(spark):
    """The corpus_diff fold over the exact pair table ≡ a fresh
    containment_prefix_pairs over the new snapshot, across an
    add + change + remove delta that touches pairs in every way:
    a surviving clean-clean pair, a pair killed by a change, a pair
    killed by a removal, and new pairs minted by the delta on both
    the probe and indexed sides."""
    from database_activity_monitoring_dam_system_spark.operators import dedup

    core = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    wrap = "hdr " + core + " ftr one two"
    core2 = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    wrap2 = "nav " + core2 + " foot three four"
    old = spark.createDataFrame(
        [
            (1, core), (2, wrap),        # clean-clean pair (survives)
            (3, core2), (4, wrap2),      # 4 changes → pair re-derived
            (5, "x1 " + core + " x2 x3"),  # removed → its pairs die
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, core), (2, wrap),
            (3, core2), (4, "totally different words now here indeed"),
            (6, "pre " + core2 + " post five six"),  # added superset of 3
        ],
        "doc_id long, text string",
    )
    t, sh = 0.8, 1
    old_pairs = dedup.containment_prefix_pairs(old, threshold=t, shingle=sh)
    folded = dedup.update_containment_pairs(
        old_pairs, old, new, threshold=t, shingle=sh
    )
    fresh = dedup.containment_prefix_pairs(new, threshold=t, shingle=sh)
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(folded) == canon(fresh)
    got = {(r["doc_a"], r["doc_b"]) for r in folded.collect()}
    assert (1, 2) in got        # survived untouched
    assert (3, 6) in got        # minted by an ADDED indexed-side doc
    assert (3, 4) not in got    # killed by the change
    assert not any(5 in p for p in got)  # removal dropped its pairs


# ------------------------------------------- containment sketch estimator


def test_containment_sketch_exact_when_k_covers_sets(spark):
    """With k ≥ every |T(a)| the bottom-k sketch IS the full token
    set, so the estimator degenerates to the exact join — pair set
    AND values must equal containment_prefix_pairs on the same
    randomized-ish corpus, for both hash families (the hash only
    picks the sample; with nothing left out it cannot matter)."""
    rows = []
    for i in range(30):
        toks = ["w%d" % ((i * 7 + j * 13) % 40) for j in range(6 + i % 5)]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.7
    exact = {
        (r["doc_a"], r["doc_b"], r["containment"])
        for r in dedup.containment_prefix_pairs(
            docs, threshold=t, shingle=1
        ).collect()
    }
    assert exact
    for fam in ("md5", "xxhash64"):
        est = {
            (r["doc_a"], r["doc_b"], r["est_containment"])
            for r in dedup.containment_sketch_pairs(
                docs, k=1000, threshold=t, shingle=1, hash_family=fam
            ).collect()
        }
        assert est == exact, fam


def test_containment_sketch_recall_precision_vs_exact(spark):
    """Sampling regime (k < |T(a)|): on the boilerplate-wrap corpus
    scaled up, the estimator must (a) find every SAFELY-above-
    threshold pair — true containment ≥ t + 2σ, σ = sqrt(t(1-t)/k) —
    and (b) emit no pair whose true containment is below t − 2σ
    (boundary pairs may flip either way; that is the documented
    estimator contract, not a defect)."""
    import math

    # 12 wrapped cores (containment core→wrap = 1.0 > t + 2σ), plus
    # disjoint noise docs (true containment 0 vs everything).
    rows = []
    for i in range(12):
        core = " ".join(f"c{i}t{j}" for j in range(40))
        wrap = (
            " ".join(f"h{i}x{j}" for j in range(6))
            + " " + core + " "
            + " ".join(f"f{i}y{j}" for j in range(6))
        )
        rows.append((2 * i, core))
        rows.append((2 * i + 1, wrap))
    for i in range(8):
        rows.append((100 + i, " ".join(f"n{i}z{j}" for j in range(30))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t, k = 0.8, 24
    sigma = math.sqrt(t * (1 - t) / k)
    exact = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_prefix_pairs(
            docs, threshold=0.0001, shingle=1
        ).collect()
    }
    for fam in ("md5", "xxhash64"):
        est = {
            (r["doc_a"], r["doc_b"]): r["est_containment"]
            for r in dedup.containment_sketch_pairs(
                docs, k=k, threshold=t, shingle=1, hash_family=fam
            ).collect()
        }
        safe_true = {
            p for p, c in exact.items() if c >= t + 2 * sigma
        }
        missed = safe_true - est.keys()
        assert not missed, (fam, missed)  # recall 1.0 on safe pairs
        for p in est:
            assert exact.get(p, 0.0) >= t - 2 * sigma, (fam, p, exact.get(p))


def test_containment_sketch_rejects_unknown_hash_family(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="hash_family"):
        dedup.containment_sketch_pairs(docs, hash_family="sha1")


def test_containment_sketch_max_df_lower_bound_semantics(spark):
    """The df cap drops only above-cap tokens from the INDEX side:
    estimates never increase (deterministic lower bound), pairs whose
    overlap is pure corpus-wide boilerplate disappear, and pairs with
    genuine low-df overlap keep their exact estimate."""
    boiler = "nav footer copyright subscribe"  # in every doc (df=4)
    rows = [
        (1, boiler + " alpha beta gamma delta"),
        (2, boiler + " alpha beta gamma delta epsilon"),  # real overlap
        (3, boiler + " one two three four"),
        (4, boiler + " five six seven eight"),  # boiler-only overlap
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(k=1000, shingle=1, hash_family="md5")
    uncapped = {
        (r.doc_a, r.doc_b): r.est_containment
        for r in dedup.containment_sketch_pairs(
            docs, threshold=0.3, **kw
        ).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.est_containment
        for r in dedup.containment_sketch_pairs(
            docs, threshold=0.3, max_df=3, **kw
        ).collect()
    }
    # lower bound: every capped estimate <= its uncapped twin
    for p, est in capped.items():
        assert est <= uncapped[p] + 1e-9, (p, est, uncapped[p])
    # boilerplate-only pairs (3,4) existed uncapped (4/8 = 0.5 > 0.3)
    # and vanish under the cap (0 real overlap)
    assert (3, 4) in uncapped and (3, 4) not in capped
    # genuine overlap survives with the boiler tokens discounted:
    # C(1→2) capped = 4 shared real tokens / 8 = 0.5
    assert capped[(1, 2)] == 0.5
    # max_df="auto" resolves to max(100, 1% of N) — on this 4-doc
    # corpus that is 100 > every df, so auto ≡ uncapped here; the
    # policy itself (the 100 TB default) is measured in BASELINE.md
    auto = {
        (r.doc_a, r.doc_b): r.est_containment
        for r in dedup.containment_sketch_pairs(
            docs, threshold=0.3, max_df="auto", **kw
        ).collect()
    }
    assert auto == uncapped


def test_load_refuses_cross_family_pair_artifact(spark, tmp_path):
    """A sketch-family pair artifact (_mode/_k/_hash_family/_max_df
    stamps) must REFUSE the exact family's loader even though its
    base (threshold, shingle, digest) stamps match — loading it would
    hand update_containment_pairs a different pair semantics. And the
    matching extra_stamps load it cleanly, stamps stripped."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f g h")],
        "doc_id long, text string",
    )
    stamps = {"_mode": "sketch", "_k": 8, "_hash_family": "md5", "_max_df": -1}
    pairs = dedup.containment_sketch_pairs(
        docs, k=8, threshold=0.5, shingle=1, hash_family="md5"
    )
    path = str(tmp_path / "sketch_pairs")
    digest = dedup.corpus_digest(docs)
    dedup.save_containment_pairs(
        pairs, path, threshold=0.5, shingle=1, corpus_digest=digest,
        extra_stamps=stamps,
    )
    with pytest.raises(ValueError, match="_mode"):
        dedup.load_containment_pairs(
            spark, path, threshold=0.5, shingle=1, corpus_digest=digest
        )
    loaded = dedup.load_containment_pairs(
        spark, path, threshold=0.5, shingle=1, corpus_digest=digest,
        extra_stamps=stamps,
    )
    assert loaded.columns == ["doc_a", "doc_b", "est_containment"]
    assert sorted(map(tuple, loaded.collect())) == sorted(
        map(tuple, pairs.collect())
    )


def test_remove_dup_spans_excises_shared_block_keeps_first(spark):
    """ExactSubstr removal: the shared passage survives ONLY in the
    doc that sorts first by (doc_id, pos); the other sharer has it
    spliced out byte-exact (prefix + suffix intact, boundary windows
    untouched because they straddle differing context); unrelated,
    sub-window, and NULL docs pass through byte-exact with zero
    stats; extra columns ride along."""
    from database_activity_monitoring_dam_system_spark.operators import dedup

    passage = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "AAA " + passage + " XYZ unique tail one here padding", "s1"),
        (2, "BBB prefix differs " + passage + " other ending text", "s2"),
        (3, "completely unrelated content with no shared windows at all",
         "s3"),
        (4, "tiny", "s4"),
        (5, None, "s5"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {
        r.doc_id: r for r in dedup.remove_dup_spans(docs, k=24).collect()
    }
    assert len(out) == 5
    # first holder keeps everything
    assert out[1].text == rows[0][1]
    assert out[1].n_removed_spans == 0 and out[1].removed_chars == 0
    # second holder: the duplicated substring is excised exactly —
    # including the flanking spaces, which are themselves shared
    # context (both docs have ' '+passage+' '), the ExactSubstr
    # maximal-match semantics
    assert out[2].text == "BBB prefix differs" + "other ending text"
    assert out[2].n_removed_spans == 1
    assert out[2].removed_chars == len(passage) + 2
    # untouched docs are byte-exact pass-throughs
    assert out[3].text == rows[2][1] and out[3].n_removed_spans == 0
    assert out[4].text == "tiny" and out[4].removed_chars == 0
    assert out[5].text is None and out[5].n_removed_spans == 0
    # other columns survive
    assert [out[i].source for i in (1, 2, 3, 4, 5)] == [
        "s1", "s2", "s3", "s4", "s5",
    ]


def test_remove_dup_spans_within_doc_and_full_removal(spark):
    """A passage repeated WITHIN one doc keeps only its first
    occurrence; a doc that is byte-identical to an earlier doc is
    excised to the empty string (every window redundant)."""
    from database_activity_monitoring_dam_system_spark.operators import dedup

    block = "0123456789abcdefghijklmnopqrstuvwxyz"  # 36 chars ≥ k
    rows = [
        (1, block + "-middle bit-" + block),
        (2, block + "-middle bit-" + block),  # identical to doc 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r for r in dedup.remove_dup_spans(docs, k=24).collect()
    }
    # doc 1: second copy of block excised (within-doc dedup)...
    assert out[1].text.startswith(block)
    assert block not in out[1].text[len(block):]
    # ...and doc 2 loses everything (all windows first seen in doc 1)
    assert out[2].text == ""
    assert out[2].removed_chars == len(rows[1][1])


def test_data_proportional_partitions_thresholds(spark):
    """The shuffle-sizing helper: None while the session default
    covers the estimate; ceil(est/target) above it; capped at
    max_partitions."""
    from database_activity_monitoring_dam_system_spark.operators import dedup
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, 1000) for i in range(10)], "id long, n long"
    )
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # 10 000 estimated rows at target 1 000 000 → under default → None
    assert dedup.data_proportional_partitions(
        df, F.col("n"), target_rows=1_000_000
    ) is None
    # 10 000 rows at target 10 → 1 000 partitions (> session default)
    got = dedup.data_proportional_partitions(df, F.col("n"), target_rows=10)
    assert got == 1000 and got > cur
    # cap wins
    assert dedup.data_proportional_partitions(
        df, F.col("n"), target_rows=1, max_partitions=64
    ) == 64
    # empty frame → None (estimate 0)
    empty = df.filter(F.col("id") < 0)
    assert dedup.data_proportional_partitions(
        empty, F.col("n"), target_rows=1
    ) is None


def test_window_volume_operators_size_shuffle_without_changing_rows(spark):
    """Forcing a tiny shuffle_target_rows makes the window-volume
    operators widen their fp-keyed exchanges (plan gains a
    data-proportional hashpartitioning) while every output row stays
    identical — partitioning is plan-side only (round-12 verdict
    ask #4)."""
    from database_activity_monitoring_dam_system_spark.operators import dedup, textops
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")

    base = sorted(map(tuple, dedup.remove_dup_spans(docs, k=24).collect()))
    wide_df = dedup.remove_dup_spans(docs, k=24, shuffle_target_rows=50)
    assert sorted(map(tuple, wide_df.collect())) == base
    import re

    plan = wide_df._jdf.queryExecution().optimizedPlan().toString()
    widths = [
        int(w)
        for w in re.findall(r"RepartitionByExpression \[[^\]]+\], (\d+)", plan)
    ]
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert widths and all(w > cur for w in widths), (widths, cur)

    base_s = sorted(map(tuple, dedup.dup_span_stats(docs, k=24).collect()))
    wide_s = dedup.dup_span_stats(docs, k=24, shuffle_target_rows=50)
    assert sorted(map(tuple, wide_s.collect())) == base_s

    base_f = sorted(map(tuple, textops.fingerprint_overlap_pairs(
        docs).collect()))
    wide_f = textops.fingerprint_overlap_pairs(
        docs, shuffle_target_rows=50)
    assert sorted(map(tuple, wide_f.collect())) == base_f


def test_remove_dup_spans_periodic_text_keeps_single_char(spark):
    """Docstring-pinned semantics for SELF-OVERLAPPING periodic text
    (advisor finding, round 12): redundant windows overlapping the
    kept first occurrence merge their full [pos, pos+k-1] intervals,
    so 'a'*100 at k=24 keeps a single 'a' — the documented fixed
    point of the fold (and of the DuckDB oracle), not one intact
    window."""
    from database_activity_monitoring_dam_system_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "a" * 100)], "doc_id long, text string"
    )
    row = dedup.remove_dup_spans(docs, k=24).collect()[0]
    assert row.text == "a"
    assert row.removed_chars == 99
    assert row.n_removed_spans == 1


def test_remove_dup_spans_prefilter_matches_full_on_long_runs(spark):
    """The prefilter scale path (sampled candidate docs, full pass
    only over them) returns the SAME result as the full pass when
    every duplicated run is long enough to contain a sampled window —
    and never touches non-candidate docs."""
    from database_activity_monitoring_dam_system_spark.operators import dedup

    passage = (
        "shared boilerplate block long enough that content sampling "
        "certainly picks several of its windows either place it lands"
    )
    rows = [
        (i, f"unique head {i} " + passage + f" unique tail {i}")
        for i in range(1, 7)
    ] + [(7, "nothing shared in this document body at all, plain text")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        r.doc_id: (r.text, r.n_removed_spans, r.removed_chars)
        for r in dedup.remove_dup_spans(docs, k=24).collect()
    }
    pre = {
        r.doc_id: (r.text, r.n_removed_spans, r.removed_chars)
        for r in dedup.remove_dup_spans(
            docs, k=24, prefilter_digits=4
        ).collect()
    }
    assert full == pre
    assert full[1][1] == 0  # first holder keeps the passage
    for i in range(2, 7):
        assert full[i][1] == 1 and passage not in full[i][0]
    assert full[7][0] == rows[-1][1]
