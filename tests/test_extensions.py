"""Semantic checks for extension ops whose hash functions preclude a
DuckDB oracle: MinHash-LSH vs exact Jaccard, LSH-ANN recall vs brute
force, SimHash sanity, multimodal plumbing determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_activity_monitoring_dam_system_spark.operators import (
    dedup,
    multimodal,
    similarity,
)
from database_activity_monitoring_dam_system_spark.sources.testdata import load_table

from .conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_minhash_subset_of_exact_jaccard(spark):
    """LSH candidates verified at θ are a subset of the exact pairs at
    θ (precision 1 by construction) with decent recall."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.jaccard_pairs(
            _docs(spark), block_col=None, threshold=0.9
        ).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_near_duplicates(
            _docs(spark), threshold=0.9
        ).collect()
    }
    assert lsh <= exact
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.8, f"minhash recall too low: {recall:.2f}"


def test_lsh_multiprobe_recovers_tight_band_recall(spark):
    """Multi-probe (distance-1 bucket flips on the broadcast query
    side) recovers the recall that tightening the bands costs: at 48
    planes / 8-bit bands (256 buckets — 16× tighter than the gate's
    default), probing lifts recall above the tight-band level on
    worst-case uniform-random vectors (0.46 probed under the
    avalanche hyperplane family — the earlier 0.66 was inflated by
    the correlated pre-splitmix family, whose redundant planes made
    bands easier to match at the cost of the sf10 mega-bucket
    collapse). The corpus side is never re-banded — the probe
    expansion multiplies only the tiny query table."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    tight = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_topk(
            emb, qids, k=10, planes=48, band_bits=8, probe_bits=0
        ).collect()
    }
    probed = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_topk(
            emb, qids, k=10, planes=48, band_bits=8, probe_bits=1
        ).collect()
    }
    assert len(probed & exact) >= len(tight & exact)
    assert len(probed & exact) / len(exact) >= 0.44


def test_minhash_md5_matches_hash_family_semantics(spark):
    """The md5-family variant (the oracle-checkable path) keeps the
    production path's contract: verified pairs ⊆ exact shingle-Jaccard
    pairs at θ, with decent recall. Run at the gate's 3-shingle/0.8
    settings so this pins the exact configuration the driver hashes."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.jaccard_pairs(
            _docs(spark), block_col=None, threshold=0.8, shingle=3
        ).collect()
    }
    md5_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_near_duplicates_md5(_docs(spark)).collect()
    }
    assert md5_pairs <= exact
    if exact:
        recall = len(md5_pairs) / len(exact)
        assert recall >= 0.8, f"md5 minhash recall too low: {recall:.2f}"


def test_temperature_mix_flattens_distribution(spark):
    """α<1 rebalancing: the rarest stratum keeps everything (rate 1),
    head strata downsample, and the post-mix share spread is strictly
    narrower than pre-mix."""
    from database_activity_monitoring_dam_system_spark.operators import sampling

    docs = _docs(spark)
    pre = {r.lang: r.cnt for r in docs.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    mixed = sampling.temperature_mix(
        docs, key_col="doc_id", strata_col="lang", alpha=0.5
    )
    post = {r.lang: r.cnt for r in mixed.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    rarest = min(pre, key=pre.get)
    assert post[rarest] == pre[rarest]  # tail kept fully
    def spread(d):
        tot = sum(d.values())
        shares = [v / tot for v in d.values()]
        return max(shares) - min(shares)
    assert spread(post) < spread(pre)
    rates = sampling.temperature_rates(pre, alpha=0.5)
    assert rates[rarest] == 1.0
    assert all(0 < r <= 1.0 for r in rates.values())


def test_temperature_mix_null_strata_and_empty_input(spark):
    """NULL is a real stratum: NULL-lang rows get the rate computed
    from their own count (not the default 1.0 fall-through), matching
    the NULL-safe oracle join; empty input yields an empty frame with
    the mix_rate column instead of a ValueError."""
    from database_activity_monitoring_dam_system_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, None if i % 2 else "en") for i in range(400)],
        "doc_id long, lang string",
    )
    mixed = sampling.temperature_mix(
        docs, key_col="doc_id", strata_col="lang", alpha=0.5
    )
    rows = mixed.collect()
    null_rates = {r.mix_rate for r in rows if r.lang is None}
    # both strata have 200 rows → both rates are exactly 1.0, and the
    # NULL stratum must NOT have been dropped
    assert null_rates == {1.0}
    assert len([r for r in rows if r.lang is None]) == 200

    skewed = spark.createDataFrame(
        [(i, None if i < 900 else "en") for i in range(1000)],
        "doc_id long, lang string",
    )
    skew_mixed = sampling.temperature_mix(
        skewed, key_col="doc_id", strata_col="lang", alpha=0.5
    )
    null_rates = {r.mix_rate for r in skew_mixed.collect() if r.lang is None}
    # the (dominant) NULL stratum downsamples: rate (900/100)^-0.5
    assert null_rates == {round((900 / 100) ** -0.5, 6)}

    empty = docs.filter(F.lit(False))
    out = sampling.temperature_mix(
        empty, key_col="doc_id", strata_col="lang", alpha=0.5
    )
    assert out.columns == ["doc_id", "lang", "mix_rate"]
    assert out.count() == 0


def test_hll_bucket_bits_guard(spark):
    """Non-multiple-of-4 bucket_bits would leave most registers
    permanently empty (hex-char buckets); rejected loudly."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import sketches

    df = spark.range(10).select(
        F.lit("g").alias("grp"), F.col("id")
    )
    for bad in (10, 3, 0, 20):
        with _pytest.raises(ValueError, match="bucket_bits"):
            sketches.hll_md5_distinct(df, ["grp"], "id", bucket_bits=bad)
    # multiples of 4 in range still work
    assert sketches.hll_md5_distinct(
        df, ["grp"], "id", bucket_bits=4
    ).count() == 1


def test_contamination_flags_verbatim_passage(spark):
    """The winnowing guarantee drives decontamination: a corpus doc
    embedding a benchmark passage of ≥ window + k − 1 tokens MUST
    share at least one fingerprint and get flagged; an unrelated doc
    stays clean."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro words here alpha beta gamma delta epsilon zeta eta trailing text"),
            (2, "completely different tokens nothing shared whatsoever at all today"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in textops.contamination_flags(
            corpus, bench, min_hits=1
        ).collect()
    }
    assert rows[1].verdict == "contaminated"
    assert rows[1].contaminated_fp >= 1
    assert rows[2].verdict == "clean"
    assert rows[2].contaminated_fp == 0


def test_repetition_signals_hand_computed(spark):
    """'a b a b a b' (11 chars): tokens 6, distinct 2 →
    repeated_token_frac 4/6; bigrams: 'a b'×3, 'b a'×2 → top 'a b',
    coverage 3·3/11; trigrams: 'a b a'×2, 'b a b'×2 → dup chars
    (2+2)·5/11 (capped at 1)."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y z w")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in textops.repetition_signals(docs).collect()}
    r1 = rows[1]
    assert r1.repeated_token_frac == round(4 / 6, 4)
    assert r1.top_bigram == "a b"
    assert r1.top_bigram_frac == round(9 / 11, 4)
    assert r1.dup_trigram_frac == 1.0  # 20/11 capped
    assert r1.verdict == "bigram_loop"
    r2 = rows[2]  # all tokens unique: no repetition, no dup trigrams
    assert r2.repeated_token_frac == 0.0
    # every bigram cnt=1: tie broken to the lexicographic min 'x y';
    # short docs legitimately exceed the char-coverage cap — the
    # Gopher filters are calibrated for long documents
    assert r2.top_bigram == "x y"
    assert r2.top_bigram_frac == round(3 / 7, 4)
    assert r2.dup_trigram_frac == 0.0


def test_simhash_pairs_have_low_hamming(spark):
    rows = dedup.simhash_near_pairs(_docs(spark), max_hamming=8).collect()
    assert all(0 <= r.hamming <= 8 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_simhash_md5_identical_docs_hamming_zero(spark):
    """Identical texts hash to identical md5-family fingerprints (the
    banded join must surface them at Hamming 0); near-identical texts
    stay within a small Hamming distance of each other."""
    docs = spark.createDataFrame(
        [
            (1, "spark filter join group sort merge window batch stream"),
            (2, "spark filter join group sort merge window batch stream"),
            (3, "completely different words entirely unrelated content here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_near_pairs_md5(docs, max_hamming=64).collect()
    }
    assert rows.get((1, 2)) == 0


def test_lsh_ann_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_topk(emb, qids, k=10).collect()
    }
    # ANN should recover a sane fraction of the true top-k even on
    # RANDOM data (worst case for LSH; defaults planes=24, band_bits=4
    # measured 0.68 recall here — real clustered embeddings do better).
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.5, f"ANN recall degenerate: {recall:.2f}"
    # every ANN hit must be a real corpus vector with rank ≤ 10
    assert all(r.rank <= 10 for r in similarity.lsh_topk(emb, qids, k=10).collect())


def test_multimodal_features_deterministic(spark):
    media = multimodal.synth_media(_docs(spark).limit(20))
    f1 = sorted(
        (r.media_id, r.n_bytes, tuple(r.feature))
        for r in multimodal.extract_features(media).collect()
    )
    f2 = sorted(
        (r.media_id, r.n_bytes, tuple(r.feature))
        for r in multimodal.extract_features(media).collect()
    )
    assert f1 == f2
    assert all(n == 16 for _, n, _ in f1)  # md5 payload = 16 bytes
    assert all(len(f) == 8 and all(0 <= x <= 1 for x in f) for _, _, f in f1)


def test_multimodal_decode_stub_gate(spark):
    media = multimodal.synth_media(_docs(spark).limit(5))
    import pytest as _pytest

    with _pytest.raises(Exception):
        multimodal.extract_features(media, decode_stub=False).collect()


def test_exact_dedup_counts_match_corpus(spark):
    docs = _docs(spark)
    total = docs.count()
    agg = dedup.exact_duplicates(docs).agg(F.sum("cnt")).first()[0]
    assert agg == total


def test_ivf_ann_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    ivf = similarity.ivf_topk(emb, qids, k=10, n_centroids=16, n_probe=4).collect()
    ann = {(r.query_id, r.neighbor_id) for r in ivf}
    # Probing 4/16 lists scans ~25% of a RANDOM corpus (worst case for
    # IVF — no cluster structure); recall floor set accordingly.
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.3, f"IVF recall degenerate: {recall:.2f}"
    assert all(r.rank <= 10 for r in ivf)
    # probing ALL lists must reduce to exact brute-force top-k
    full = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(
            emb, qids, k=10, n_centroids=16, n_probe=16
        ).collect()
    }
    assert full == exact


def test_ivf_refined_recall_beats_seeded_on_clustered_data(spark):
    """Lloyd refinement is what makes seed-by-id a real coarse
    quantizer: on a cluster-structured corpus whose ids are sorted by
    cluster (the realistic worst case for seeding — the first
    n_centroids vectors all come from the first clusters), the
    refined quantizer recovers substantially more of the true top-k
    at equal n_probe.  Fixture: 12 well-separated centers in R^16,
    deterministic md5 noise; measured seeded ≈ 0.61 vs refined ≈ 0.95
    recall.  (On uniform-random embeddings refinement is a wash by
    construction — no structure to learn — which is why this test
    builds structure instead of using the random testdata corpus.)"""
    import hashlib

    n, d, ktrue = 360, 16, 12
    rows = []
    for i in range(n):
        c = (i * ktrue) // n  # sorted-by-cluster id order
        h = hashlib.md5(f"p{i}".encode()).digest()
        vec = [
            ((h[j % len(h)] / 255.0) - 0.5) * 4.0 + (10.0 if j == c else 0.0)
            for j in range(d)
        ]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = list(range(0, n, 36))
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }

    def recall(refine_iters):
        ann = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk(
                emb, qids, k=10, n_centroids=16, n_probe=2,
                refine_iters=refine_iters,
            ).collect()
        }
        return len(ann & exact) / len(exact)

    seeded, refined = recall(0), recall(2)
    assert refined > seeded, (
        f"refinement did not improve recall: {refined:.2f} <= {seeded:.2f}"
    )
    assert refined >= 0.85, f"refined recall too low: {refined:.2f}"


def test_winnowing_shared_run_guarantee(spark):
    """Two docs sharing a token run of length >= window+k-1 (= 6 with
    defaults) must share a fingerprint; disjoint docs must not pair."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    shared = "alpha bravo charlie delta echo foxtrot"
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"{shared} seven eight nine ten eleven twelve"),
        (3, "completely different words nothing in common here at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = textops.winnow_fingerprints(docs)
    by_doc = {
        d: {r.fingerprint for r in g}
        for d, g in __import__("itertools").groupby(
            sorted(fp.collect(), key=lambda r: r.doc_id), key=lambda r: r.doc_id
        )
    }
    assert by_doc[1] & by_doc[2], "shared 6-token run must yield a shared fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])

    pairs = textops.fingerprint_overlap_pairs(docs, min_overlap=1).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}
    p = pairs[0]
    assert 0 < p.containment <= 1 and p.shared_fp >= 1


def test_winnow_short_doc_gets_one_fingerprint(spark):
    from database_activity_monitoring_dam_system_spark.operators import textops

    docs = spark.createDataFrame([(1, "just two")], ["doc_id", "text"])
    rows = textops.winnow_fingerprints(docs).collect()
    assert len(rows) == 1 and rows[0].doc_id == 1


def test_hash_sample_rate_and_determinism(spark):
    from database_activity_monitoring_dam_system_spark.operators import sampling

    docs = load_table(spark, SF_SMOKE, "documents")
    s1 = sampling.hash_sample(docs, key_col="doc_id", default_rate=0.3)
    n, total = s1.count(), docs.count()
    # binomial(500, 0.3): ±5σ ≈ ±51
    assert abs(n - 0.3 * total) < 0.25 * total
    # same salt → identical subset, regardless of partitioning
    ids_a = {r.doc_id for r in s1.collect()}
    ids_b = {
        r.doc_id
        for r in sampling.hash_sample(
            docs.repartition(7), key_col="doc_id", default_rate=0.3
        ).collect()
    }
    assert ids_a == ids_b
    # different salt → different subset
    ids_c = {
        r.doc_id
        for r in sampling.hash_sample(
            docs, key_col="doc_id", default_rate=0.3, salt="other"
        ).collect()
    }
    assert ids_a != ids_c
    # rate 1.0 keeps everything, 0.0 keeps nothing
    assert (
        sampling.hash_sample(docs, key_col="doc_id", default_rate=1.0).count()
        == total
    )
    assert (
        sampling.hash_sample(docs, key_col="doc_id", default_rate=0.0).count() == 0
    )


def test_stratified_cap_bounds_and_stability(spark):
    from database_activity_monitoring_dam_system_spark.operators import sampling

    docs = load_table(spark, SF_SMOKE, "documents")
    capped = sampling.stratified_cap(
        docs, strata_cols=["lang"], cap=5, key_col="doc_id"
    )
    per = capped.groupBy("lang").count().collect()
    assert all(r["count"] <= 5 for r in per)
    ids_a = sorted(r.doc_id for r in capped.collect())
    ids_b = sorted(
        r.doc_id
        for r in sampling.stratified_cap(
            docs.repartition(11), strata_cols=["lang"], cap=5, key_col="doc_id"
        ).collect()
    )
    assert ids_a == ids_b


def test_kmeans_matches_numpy(spark):
    """Lloyd rounds on Spark == Lloyd rounds in numpy from the same
    seeds (assignments compared exactly; FP tolerance via argmin over
    float64 distances computed both ways)."""
    import numpy as np

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = sorted(
        ((r.vec_id, np.array(r.embedding, dtype=np.float64))
         for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    X = np.stack([t[1] for t in rows])
    k, iters = 8, 3
    cents = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            if (assign == c).any():
                cents[c] = X[assign == c].mean(axis=0)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    expected = dict(zip(ids.tolist(), d.argmin(axis=1).tolist()))

    assigned, _ = similarity.kmeans_lloyd(emb, k=k, iters=iters)
    got = {r.vec_id: r.cluster_id for r in assigned.collect()}
    agree = sum(got[i] == expected[i] for i in got)
    # centroid means differ at ulp level between engines; allow a tiny
    # number of boundary flips but require near-total agreement
    assert agree >= len(got) - 2, f"{len(got) - agree} disagreements"


def test_kmeans_cluster_ids_cover_range(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    assigned, cents = similarity.kmeans_lloyd(emb, k=8, iters=2)
    clusters = {r.cluster_id for r in assigned.collect()}
    assert clusters <= set(range(8))
    assert len(cents) == 8


def test_heavy_hitters_rank_and_counts(spark):
    from database_activity_monitoring_dam_system_spark.operators import (
        textops,
    )

    hh = textops.heavy_hitters(_docs(spark), k=5).collect()
    by_lang = {}
    for r in hh:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cnts = [r.cnt for r in rows]
        assert cnts == sorted(cnts, reverse=True)


def test_pii_scrub_literal_cases(spark):
    from database_activity_monitoring_dam_system_spark.operators import (
        textops,
    )

    rows = [
        (1, "mail me at alice.smith+x@corp.example.org today"),
        (2, "server 192.168.1.254 and backup 10.0.0.7 rebooted"),
        (3, "call 555-123-4567 or 555-987-6543"),
        (4, "mixed bob@h.io from 1.2.3.4 dial 111-222-3333"),
        (5, "clean text, nothing to redact"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textops.pii_scrub(df).collect()}
    assert (out[1].n_emails, out[1].n_ipv4s, out[1].n_phones) == (1, 0, 0)
    assert "<EMAIL>" in out[1].scrubbed
    assert out[2].n_ipv4s == 2 and "<IPV4>" in out[2].scrubbed
    assert out[3].n_phones == 2
    assert (out[4].n_emails, out[4].n_ipv4s, out[4].n_phones) == (1, 1, 1)
    assert out[5].scrubbed == rows[4][1]
    # digits inside an already-scrubbed email never double-count: the
    # email host needs an alpha TLD, so an IP-host address counts as an
    # IP; a digit-bearing real address counts once, as an email only
    df2 = spark.createDataFrame(
        [(9, "ping admin@10.0.0.7 now"), (10, "mail a1.2.3.4x@h10.0.0.7.example.com ok")],
        "doc_id long, text string",
    )
    out2 = {r.doc_id: r for r in textops.pii_scrub(df2).collect()}
    assert (out2[9].n_emails, out2[9].n_ipv4s) == (0, 1)
    assert (out2[10].n_emails, out2[10].n_ipv4s) == (1, 0)


def test_interval_join_matches_theta_join(spark):
    """Bin-bucketed rewrite == naive theta join (inner), and the left
    variant partitions events into matched + NULL-interval rows."""
    import datetime as dt

    from database_activity_monitoring_dam_system_spark.operators import (
        rangejoin,
    )

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts"
    )
    anchor = events.agg(F.max("ts")).first()[0]
    rows = []
    for i in range(8):
        start = anchor - dt.timedelta(hours=3 * i + 1)
        rows.append((i, start, start + dt.timedelta(minutes=100)))
    wins = spark.createDataFrame(
        rows, "window_id int, start_ts timestamp, end_ts timestamp"
    )
    got = {
        (r.event_id, r.window_id)
        for r in rangejoin.interval_join(
            events, wins, ts_col="ts", bin_seconds=3600
        ).collect()
    }
    naive = {
        (r.event_id, r.window_id)
        for r in events.crossJoin(wins)
        .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
        .collect()
    }
    assert got == naive and naive  # non-degenerate

    left = rangejoin.interval_join(
        events, wins, ts_col="ts", bin_seconds=3600, how="left"
    )
    n_events = events.count()
    matched_events = {e for e, _ in naive}
    assert left.filter(F.col("window_id").isNull()).count() == (
        n_events - len(matched_events)
    )
    assert left.count() == len(naive) + n_events - len(matched_events)


def test_hll_md5_accuracy_both_branches(spark):
    """The hand-rolled md5 HLL estimates within the m=256 error bound
    on the harmonic branch (σ ≈ 1.04/√m ≈ 6.5%; assert 3σ) and tracks
    small cardinalities via the linear-counting branch."""
    from database_activity_monitoring_dam_system_spark.operators import sketches

    big = spark.range(100_000).select(
        F.lit("g").alias("grp"), F.col("id")
    )
    [r] = sketches.hll_md5_distinct(big, ["grp"], "id").collect()
    assert r.zero_registers == 0  # harmonic branch
    assert abs(r.est_distinct - 100_000) / 100_000 < 0.20

    small = spark.range(20).select(F.lit("g").alias("grp"), F.col("id"))
    [r] = sketches.hll_md5_distinct(small, ["grp"], "id").collect()
    assert r.zero_registers > 0  # linear-counting branch
    assert abs(r.est_distinct - 20) < 5


def test_cms_overestimates_and_merges(spark):
    from database_activity_monitoring_dam_system_spark.operators import (
        sketches, textops,
    )

    docs = _docs(spark)
    tokens = docs.select(
        F.explode(textops._norm_tokens("text")).alias("token")
    )
    exact = {r.token: r.cnt for r in tokens.groupBy("token").agg(
        F.count("*").alias("cnt")).collect()}
    cand = tokens.select("token").distinct()
    sketch = sketches.cms_build(tokens, depth=4, width=64)
    est = {r.token: r.est_cnt for r in sketches.cms_estimate(
        sketch, cand, depth=4, width=64).collect()}
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)  # one-sided error

    # mergeability: sketch(half1) + sketch(half2) == sketch(whole)
    h1 = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.explode(textops._norm_tokens("text")).alias("token"))
    h2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.explode(textops._norm_tokens("text")).alias("token"))
    merged = sketches.cms_merge(
        sketches.cms_build(h1, depth=4, width=64),
        sketches.cms_build(h2, depth=4, width=64),
    )
    whole = {(r.d, r.bucket): r.cnt for r in sketch.collect()}
    got = {(r.d, r.bucket): r.cnt for r in merged.collect()}
    assert got == whole


def test_weighted_sample_bias_and_determinism(spark):
    """A-ES weighted sampling: selection frequency tracks weight
    (heavy rows win far more often across independent salts), the
    global no-strata path (TakeOrdered prune) agrees with a plain
    full-sort reference, non-positive/NULL weights drop, and the
    pick is partitioning-invariant."""
    from database_activity_monitoring_dam_system_spark.operators import sampling

    rows = [(i, 100 if i < 10 else 1) for i in range(110)]
    df = spark.createDataFrame(rows, "id long, w long")
    heavy_hits = 0
    for salt in ("a", "b", "c", "d", "e"):
        got = {
            r.id
            for r in sampling.weighted_sample(
                df, key_col="id", weight_col="w", n=10, salt=salt
            ).collect()
        }
        assert len(got) == 10
        heavy_hits += len([i for i in got if i < 10])
    # 10 heavy rows hold 50% of total weight; uniform would give ~0.9
    # heavy picks per draw of 10 — require a clear multiple of that
    assert heavy_hits >= 20, heavy_hits
    # global path ≡ full-sort reference (same keys, same ranks)
    ref = (
        df.filter(F.col("w") > 0)
        .withColumn(
            "_k",
            -F.log(
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit("a"), F.col("id").cast("string"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    + 1
                )
                / F.lit(float(16**8))
            )
            / F.col("w").cast("double"),
        )
        .orderBy("_k", "id")
        .limit(10)
    )
    ref_ids = [r.id for r in ref.collect()]
    got = sampling.weighted_sample(
        df, key_col="id", weight_col="w", n=10, salt="a"
    ).orderBy("rank")
    assert [r.id for r in got.collect()] == ref_ids
    # NULL / non-positive weights are dropped
    df2 = spark.createDataFrame(
        [(1, None), (2, 0), (3, -5), (4, 7)], "id long, w long"
    )
    kept = sampling.weighted_sample(
        df2, key_col="id", weight_col="w", n=10
    ).collect()
    assert [r.id for r in kept] == [4]
    # partitioning-invariant
    a = sampling.weighted_sample(
        df.repartition(17), key_col="id", weight_col="w", n=10, salt="a"
    ).orderBy("rank").collect()
    b = sampling.weighted_sample(
        df.coalesce(1), key_col="id", weight_col="w", n=10, salt="a"
    ).orderBy("rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bloom_no_false_negatives_and_merges(spark):
    """Bloom filter invariants: every inserted value probes
    maybe_member (NO false negatives — the property decontamination
    relies on), the false-positive rate on fresh values stays near
    the analytic bound, and bitmaps over disjoint shards OR-merge to
    exactly the whole-set bitmap."""
    from database_activity_monitoring_dam_system_spark.operators import sketches

    vals = spark.range(0, 300).select(
        F.concat(F.lit("member-"), F.col("id")).alias("v")
    )
    bloom = sketches.bloom_bitmap(vals, "v", k=3, m_bits=4096)
    row = bloom.collect()[0]
    assert len(row.bitmap) == 4096 // 4 and row.n_values == 300
    # no false negatives
    probed = sketches.bloom_probe(vals, bloom, "v")
    assert probed.filter(~F.col("maybe_member")).count() == 0
    # false-positive rate on 600 non-members ≈ (1 - e^(-3*300/4096))^3
    fresh = spark.range(0, 600).select(
        F.concat(F.lit("absent-"), F.col("id")).alias("v")
    )
    fp = sketches.bloom_probe(fresh, bloom, "v").filter(
        F.col("maybe_member")
    ).count()
    assert fp / 600 < 0.05  # analytic ≈ 0.008; generous slack
    # mergeability: OR of shard bitmaps == whole-set bitmap
    b1 = sketches.bloom_bitmap(
        vals.filter(F.col("v").endswith("0")), "v", k=3, m_bits=4096
    )
    b2 = sketches.bloom_bitmap(
        vals.filter(~F.col("v").endswith("0")), "v", k=3, m_bits=4096
    )
    merged = sketches.bloom_merge(b1, b2).collect()[0]
    assert merged.bitmap == row.bitmap and merged.n_values == 300
    # parameter guards
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        sketches.bloom_bitmap(vals, "v", k=5, m_bits=4096)
    with _pytest.raises(ValueError, match="m_bits"):
        sketches.bloom_bitmap(vals, "v", k=3, m_bits=30)


def test_bloom_contamination_superset_of_exact(spark):
    """The Bloom decontamination verdicts are a SUPERSET of the exact
    path's on the same benchmark split: per-doc maybe_fp ≥
    contaminated_fp everywhere (one-sided error), and every exact
    'contaminated' doc is 'maybe_contaminated' under the Bloom."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    exact = {
        r.doc_id: r
        for r in textops.contamination_flags(corpus, bench).collect()
    }
    bloom = {
        r.doc_id: r
        for r in textops.bloom_contamination(corpus, bench).collect()
    }
    assert set(exact) == set(bloom)
    for d, e in exact.items():
        b = bloom[d]
        assert b.n_fp == e.n_fp
        assert b.maybe_fp >= e.contaminated_fp
        if e.verdict == "contaminated":
            assert b.verdict == "maybe_contaminated"


def test_semantic_dedup_partitions_corpus(spark):
    """Reps ∪ dropped = corpus; no near-dup pair survives with both
    endpoints kept (each component keeps exactly its min id)."""
    from database_activity_monitoring_dam_system_spark.plans.extensions import (
        _q_embedding_near_dups,
        _q_semantic_dedup_reps,
    )
    from database_activity_monitoring_dam_system_spark.operators import dedup as ddp

    emb = load_table(spark, SF_SMOKE, "embeddings")
    total = emb.count()
    pairs = _q_embedding_near_dups(spark, SF_SMOKE).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    edges = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    clusters = {r.doc_id: r.cluster_id for r in ddp.duplicate_clusters(pairs).collect()}
    dropped = {d for d, c in clusters.items() if d != c}
    kept_counts = {
        r.label: r.n_kept for r in _q_semantic_dedup_reps(spark, SF_SMOKE).collect()
    }
    assert sum(kept_counts.values()) == total - len(dropped)
    kept_ids = set(range(total)) - dropped  # vec_id is dense 0..N-1
    surviving = [e for e in edges if e[0] in kept_ids and e[1] in kept_ids]
    assert not surviving, f"near-dup pairs among reps: {surviving[:3]}"


def test_pii_scrub_mixed_case_email(spark):
    from database_activity_monitoring_dam_system_spark.operators import (
        textops,
    )

    df = spark.createDataFrame(
        [(1, "Contact Alice.Smith@Corp.Example.COM today")],
        "doc_id long, text string",
    )
    r = textops.pii_scrub(df).collect()[0]
    assert r.n_emails == 1
    assert "<EMAIL>" in r.scrubbed
    assert "Corp.Example.COM" not in r.scrubbed


def test_kmeans_small_and_empty_corpus(spark):
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    tiny = emb.filter(F.col("vec_id") < 3)
    assigned, cents = similarity.kmeans_lloyd(tiny, k=8, iters=2)
    assert len(cents) == 3  # corpus smaller than k → one cluster per row
    assert {r.cluster_id for r in assigned.collect()} == {0, 1, 2}
    with _pytest.raises(ValueError, match="empty corpus"):
        similarity.kmeans_lloyd(emb.filter(F.col("vec_id") < 0), k=8)


def test_interval_join_left_null_safe(spark):
    """A matched event carrying a NULL column must not be re-emitted
    as an unmatched row (null-safe anti-join)."""
    import datetime as dt

    from database_activity_monitoring_dam_system_spark.operators import (
        rangejoin,
    )

    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    events = spark.createDataFrame(
        [(1, None, t0), (2, 7, t0 + dt.timedelta(hours=5))],
        "event_id long, user_id long, ts timestamp",
    )
    wins = spark.createDataFrame(
        [(0, t0 - dt.timedelta(minutes=5), t0 + dt.timedelta(minutes=5))],
        "window_id int, start_ts timestamp, end_ts timestamp",
    )
    out = rangejoin.interval_join(
        events, wins, ts_col="ts", bin_seconds=600, how="left"
    ).collect()
    assert len(out) == 2
    by_id = {r.event_id: r.window_id for r in out}
    assert by_id[1] == 0  # matched exactly once despite NULL user_id
    assert by_id[2] is None  # unmatched event kept with NULL window


def test_png_codec_roundtrip_all_filters():
    """encode→decode is the identity for every scanline filter type
    and for grey/grey+alpha/RGB/RGBA — the decoder is a real PNG
    reader for the 8-bit non-interlaced class, not a fixture parser."""
    import hashlib

    from database_activity_monitoring_dam_system_spark.operators import (
        imagecodec,
    )

    for channels in (1, 2, 3, 4):
        w, h = 7, 5  # non-square, odd stride exercises edge bytes
        n = w * h * channels
        seed = hashlib.md5(f"codec-{channels}".encode()).digest()
        pixels = (seed * (-(-n // 16)))[:n]
        for ftype in range(5):
            png = imagecodec.encode_png(
                w, h, pixels, channels=channels, filter_type=ftype
            )
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            got = imagecodec.decode_png(png)
            assert got == (w, h, channels, pixels), (channels, ftype)


def test_png_adam7_interlace_roundtrip_and_equivalence():
    """Adam7 interlaced encode→decode is the identity for every
    filter type, channel count and awkward geometry (sub-8 images
    leave passes empty), and decodes to the SAME pixels as the
    sequential layout — lossless both ways (PNG spec 8.2)."""
    import hashlib

    from database_activity_monitoring_dam_system_spark.operators import (
        imagecodec,
    )

    for channels in (1, 2, 3, 4):
        for w, h in ((1, 1), (7, 5), (8, 8), (9, 10), (3, 2)):
            n = w * h * channels
            seed = hashlib.md5(f"adam7-{channels}-{w}x{h}".encode()).digest()
            pixels = (seed * (-(-n // 16)))[:n]
            for ftype in (0, 2, 4):
                il = imagecodec.encode_png(
                    w, h, pixels, channels=channels,
                    filter_type=ftype, interlace=True,
                )
                seq = imagecodec.encode_png(
                    w, h, pixels, channels=channels, filter_type=ftype
                )
                assert il[28] == 1 and seq[28] == 0  # IHDR interlace byte
                assert imagecodec.decode_png(il) == (
                    w, h, channels, pixels,
                ), (channels, w, h, ftype)
                assert imagecodec.decode_png(il) == imagecodec.decode_png(seq)


def test_adpcm_codec_roundtrip_and_tables():
    """IMA ADPCM: the decoder is the spec recurrence (step/index
    tables, bit-shift diff, int16 clamp); the greedy encoder tracks a
    20 k-amplitude sine within one step quantum; the WAV container
    round-trips channels/rate/frame-count; non-IMA tags raise at the
    honest seam."""
    import math
    import struct

    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import adpcm

    assert len(adpcm.STEP_TABLE) == 89 and adpcm.STEP_TABLE[-1] == 32767
    assert len(adpcm.INDEX_TABLE) == 16
    # decode determinism anchors: zero nibbles from (0, 0) stay 0;
    # nibble 7 from index 88 clamps at int16 max
    assert adpcm.decode_nibble(0, 0, 0) == (0, 0)
    assert adpcm.decode_nibble(7, 0, 88) == (32767, 88)
    assert adpcm.decode_nibble(15, -32000, 88)[0] == -32768
    for ch in (1, 2):
        n = 1 + 8 * 25
        src = [
            [int(20000 * math.sin(i * 0.05 + c)) for i in range(n)]
            for c in range(ch)
        ]
        dec = adpcm.decode_block(adpcm.encode_block(src), ch)
        assert [d[0] for d in dec] == [s[0] for s in src]  # header exact
        err = max(
            abs(a - b) for d, s in zip(dec, src) for a, b in zip(d, s)
        )
        assert err < 2000, err
        wav = adpcm.encode_ima_wav(src, sample_rate=16000)
        och, rate, nf, pcm = adpcm.decode_ima_wav(wav)
        assert (och, rate, nf) == (ch, 16000, n)
        vals = struct.unpack(f"<{nf * och}h", pcm)
        assert list(vals[0::och]) == dec[0]
    # seam: PCM tag routes elsewhere, loudly
    pcm_fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    riff = (
        b"WAVEfmt " + struct.pack("<I", len(pcm_fmt)) + pcm_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with _pytest.raises(NotImplementedError, match="0x0001"):
        adpcm.decode_ima_wav(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    with _pytest.raises(ValueError, match="RIFF"):
        adpcm.decode_ima_wav(b"not a wav")


def test_adpcm_media_fixture_decodes_via_audio_features(spark):
    """The compressed-audio gate's plumbing: synth_adpcm_media's
    payloads route through the wave-reader fallback into the real IMA
    decoder, and the per-doc stats equal a driver-side replay of the
    recurrence over md5 nibbles."""
    import hashlib
    import struct

    from database_activity_monitoring_dam_system_spark.operators import adpcm

    docs = _docs(spark).limit(8)
    media = multimodal.synth_adpcm_media(docs)
    got = {
        r.media_id: r
        for r in multimodal.decode_audio_features(media).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        digest = hashlib.md5(
            ("" if row.text is None else row.text).encode()
        ).digest()
        dec = adpcm.decode_block(
            struct.pack("<hBB", 0, 0, 0) + digest, 1
        )[0]
        r = got[row.doc_id]
        assert (r.n_channels, r.sample_rate, r.n_frames) == (1, 8000, 33)
        assert (r.c0_min, r.c0_max, r.c0_sum, r.c0_sumsq) == (
            min(dec), max(dec), sum(dec), sum(v * v for v in dec)
        )
        assert r.c1_min is None and r.c1_sum is None


def test_jpeg_idct_matches_direct_dct3_definition():
    """The matrix-factored IDCT must agree with a direct O(N^4)
    evaluation of the T.81 A.3.3 DCT-III definition — an independent
    arithmetic anchor, so an encoder/decoder round-trip can't hide a
    transform bug shared by both sides."""
    import numpy as np

    from database_activity_monitoring_dam_system_spark.operators import (
        jpegcodec,
    )

    rng = np.random.default_rng(7)
    coeffs = rng.integers(-500, 500, size=(8, 8)).astype(np.float64)
    # direct definition: s(x,y) = 1/4 ΣΣ C(u)C(v) S(u,v) cos.. cos..
    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * coeffs[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            direct[x, y] = acc / 4.0
    m = jpegcodec._DCT_M
    fast = m.T @ coeffs @ m
    assert np.allclose(fast, direct, atol=1e-9)
    # and the forward matrix inverts it (orthonormality)
    assert np.allclose(m @ fast @ m.T, coeffs, atol=1e-9)


def test_jpeg_flat_gray_q100_roundtrip_exact():
    """Flat 8×8 blocks at quality 100 round-trip EXACTLY (DC-only,
    quant step 1) — the arithmetic identity the jpeg_decode_features
    oracle is built on."""
    import hashlib

    import numpy as np

    from database_activity_monitoring_dam_system_spark.operators import (
        jpegcodec,
    )

    digest = hashlib.md5(b"jpeg-fixture").digest()
    blocks = np.frombuffer(digest, dtype=np.uint8).reshape(4, 4)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    for ri in (0, 2):  # plain and restart-marker streams
        data = jpegcodec.encode_jpeg(
            32, 32, img.tobytes(), channels=1, quality=100,
            restart_interval=ri,
        )
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        w, h, ch, pix = jpegcodec.decode_jpeg(data)
        assert (w, h, ch) == (32, 32, 1)
        assert np.array_equal(
            np.frombuffer(pix, dtype=np.uint8).reshape(32, 32), img
        ), f"restart_interval={ri}"


def test_jpeg_color_roundtrip_psnr_and_subsampling():
    """RGB encode→decode is close (not exact — JPEG is lossy): ≥35 dB
    PSNR at q95 4:4:4 on a smooth gradient, ≥30 dB at q90 4:2:0 with
    odd (non-MCU-multiple) dimensions, and restart markers don't
    change decoded pixels."""
    import numpy as np

    from database_activity_monitoring_dam_system_spark.operators import (
        jpegcodec,
    )

    yy, xx = np.mgrid[0:21, 0:37]
    rgb = np.stack(
        [(yy * 3 + xx), (xx * 2 + 40), (yy * 4 + 10)], axis=-1
    ).astype(np.uint8)

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 10 * np.log10(255**2 / max(mse, 1e-12))

    d444 = jpegcodec.encode_jpeg(
        37, 21, rgb.tobytes(), channels=3, quality=95
    )
    w, h, ch, pix = jpegcodec.decode_jpeg(d444)
    assert (w, h, ch) == (37, 21, 3)
    got444 = np.frombuffer(pix, dtype=np.uint8).reshape(21, 37, 3)
    assert psnr(got444, rgb) >= 35.0

    d420 = jpegcodec.encode_jpeg(
        37, 21, rgb.tobytes(), channels=3, quality=90, subsampling="420"
    )
    w, h, ch, pix = jpegcodec.decode_jpeg(d420)
    assert (w, h, ch) == (37, 21, 3)
    got420 = np.frombuffer(pix, dtype=np.uint8).reshape(21, 37, 3)
    assert psnr(got420, rgb) >= 30.0

    d420r = jpegcodec.encode_jpeg(
        37, 21, rgb.tobytes(), channels=3, quality=90,
        subsampling="420", restart_interval=1,
    )
    _, _, _, pixr = jpegcodec.decode_jpeg(d420r)
    assert pixr == pix  # restart markers are framing only


def test_jpeg_decoder_rejects_out_of_scope_streams():
    """Progressive (SOF2) and non-JPEG payloads fail with the reason,
    and decode_image dispatches image/jpeg to this codec (the
    PIL-absent seam is real code, not NotImplementedError)."""
    import numpy as np
    import pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        imagecodec,
        jpegcodec,
    )

    img = np.full((8, 8), 99, dtype=np.uint8)
    data = jpegcodec.encode_jpeg(8, 8, img.tobytes(), channels=1)
    # SOF1 (extended sequential) stays out of scope; a baseline scan
    # script under a flipped SOF2 marker is malformed progressive
    # (full-band DC scan) and fails loudly rather than mis-decoding
    sof = data.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="SOF1"):
        jpegcodec.decode_jpeg(data[:sof] + b"\xff\xc1" + data[sof + 2:])
    with pytest.raises(ValueError, match="Se=0"):
        jpegcodec.decode_jpeg(data[:sof] + b"\xff\xc2" + data[sof + 2:])
    with pytest.raises(ValueError, match="SOI"):
        jpegcodec.decode_jpeg(b"\x89PNG\r\n\x1a\n")
    w, h, ch, pix = imagecodec.decode_image(data, "image/jpeg")
    assert (w, h, ch) == (8, 8, 1) and pix == img.tobytes()
    # audio stays a genuine codec boundary
    with pytest.raises(NotImplementedError):
        imagecodec.decode_image(b"\x00" * 16, "audio/mpeg")


def test_jpeg_decoder_truncation_raises_valueerror():
    """Truncated / malformed streams raise ValueError with a reason —
    never struct.error or IndexError — so the mapInPandas decode path
    fails the documented way on corrupt files at scale (round-11
    advisor finding)."""
    import numpy as np
    import pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        jpegcodec,
    )

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = jpegcodec.encode_jpeg(8, 8, img.tobytes(), channels=1)
    # every header-region prefix must fail as ValueError, not leak
    # struct.error/IndexError (the entropy-coded tail may decode to a
    # short-but-valid image, so only probe up to the SOS payload)
    sos = data.index(b"\xff\xda")
    for cut in range(2, min(sos + 8, len(data))):
        with pytest.raises(ValueError):
            jpegcodec.decode_jpeg(data[:cut])
    # 0xFF as the very last byte (marker byte cut off)
    with pytest.raises(ValueError, match="truncated"):
        jpegcodec.decode_jpeg(b"\xff\xd8\xff")
    # segment declaring more bytes than remain
    with pytest.raises(ValueError, match="truncated"):
        jpegcodec.decode_jpeg(b"\xff\xd8\xff\xdb\x00\x45\x00")
    # length-consistent but internally short DQT/DHT/SOF0/SOS/DRI
    def seg(marker: bytes, payload: bytes) -> bytes:
        import struct as _s

        return (
            b"\xff\xd8\xff" + marker + _s.pack(">H", len(payload) + 2)
            + payload + b"\xff\xd9"
        )

    for m, p in [
        (b"\xdb", b"\x00" + b"\x11" * 10),  # DQT: 10 of 64 entries
        (b"\xc4", b"\x00" + b"\x01" * 5),  # DHT: bits array cut off
        (b"\xc0", b"\x08\x00\x08"),  # SOF0: header cut off
        (b"\xc0", b"\x08\x00\x08\x00\x08\x03\x01\x11"),  # comps cut
        (b"\xda", b"\x02\x01\x00"),  # SOS: 2 comps declared, 1 present
        (b"\xdd", b"\x04"),  # DRI: 1 of 2 bytes
    ]:
        with pytest.raises(ValueError, match="truncated"):
            jpegcodec.decode_jpeg(seg(m, p))


def test_png_resize_nearest_subsample():
    """8×8 → 4×4 nearest-neighbour keeps exactly the even-indexed
    pixels (floor mapping)."""
    from database_activity_monitoring_dam_system_spark.operators import (
        imagecodec,
    )

    src = bytes(range(8 * 8))  # 1 channel, pixel value == index
    out = imagecodec.resize_nearest(src, 8, 8, 1, 4, 4)
    expect = bytes(
        src[(y * 2) * 8 + (x * 2)] for y in range(4) for x in range(4)
    )
    assert out == expect


def test_real_decode_paths(spark):
    """decode_stub=False is a working decode for PNG media: features
    come from decoded pixels, resize really resamples, and non-image
    mimes still raise at the codec boundary."""
    import hashlib

    from database_activity_monitoring_dam_system_spark.operators import (
        imagecodec,
        multimodal,
    )

    docs = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc")], "doc_id long, text string"
    )
    media = multimodal.synth_png_media(docs)

    feats = {
        r.media_id: r
        for r in multimodal.extract_features(
            media, decode_stub=False, feature_dim=4
        ).collect()
    }
    for doc_id, text in [(1, "alpha doc"), (2, "beta doc")]:
        digest = hashlib.md5(text.encode()).digest()
        assert feats[doc_id].n_bytes == 192  # decoded pixels, not png size
        assert feats[doc_id].feature == [b / 255.0 for b in digest[:4]]

    resized = {
        r.media_id: r
        for r in multimodal.resize_media(
            media, width=4, height=4, decode_stub=False
        ).collect()
    }
    for doc_id, text in [(1, "alpha doc"), (2, "beta doc")]:
        row = resized[doc_id]
        assert (row.meta.width, row.meta.height) == (4, 4)
        w, h, ch, pixels = imagecodec.decode_png(bytes(row.payload))
        assert (w, h, ch) == (4, 4, 3)
        digest = hashlib.md5(text.encode()).digest()
        src = (digest * 12)[:192]
        assert pixels == imagecodec.resize_nearest(src, 8, 8, 3, 4, 4)

    # the codec boundary is still explicit for undecodable mimes
    import pytest as _pytest

    from py4j.protocol import Py4JJavaError

    stub_media = multimodal.synth_media(docs)  # mime application/x-fixture
    with _pytest.raises(Exception) as ei:
        multimodal.extract_features(stub_media, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError
    )


def test_geo_enrich_external_caches_per_partition(spark):
    """The external-enrichment pattern (reference GeoTracker's
    per-row HTTP + cache, app.py:709-731, in distributed form): the
    per-partition resolver cache memoizes hot keys — proven by a
    deliberately NON-deterministic resolver whose value must still be
    constant per ip within a partition; failures and NULL ips yield
    NULL geo columns; the default resolver is deterministic."""
    import hashlib

    from database_activity_monitoring_dam_system_spark.operators import geo

    rows = [(i, f"10.0.0.{i % 5}" if i % 17 else None) for i in range(200)]
    df = spark.createDataFrame(
        rows, "activity_id long, ip_address string"
    ).repartition(1)

    # non-deterministic resolver: without memoization, repeat lookups
    # of the same ip would disagree
    def flaky_resolver(ip):
        import random

        if ip.endswith(".4"):
            raise RuntimeError("lookup failed")
        return {"country": f"C{random.random()}", "city": None}

    out = geo.geo_enrich_external(df, resolver=flaky_resolver).collect()
    by_ip: dict = {}
    for r in out:
        by_ip.setdefault(r.ip_address, set()).add(r.country)
    for ip, vals in by_ip.items():
        assert len(vals) == 1, f"{ip}: resolver not memoized ({vals})"
        if ip is None or ip.endswith(".4"):
            assert vals == {None}  # NULL ip / failed lookup → NULL geo
        else:
            assert next(iter(vals)).startswith("C")

    # default resolver: deterministic md5 fake, schema = input + geo
    out2 = geo.geo_enrich_external(df)
    assert out2.columns == ["activity_id", "ip_address", "country", "city"]
    got = {r.ip_address: r.country for r in out2.collect() if r.ip_address}
    countries = (
        "US", "DE", "IN", "BR", "JP", "GB", "FR", "AU",
        "CA", "NL", "SG", "KR",
    )
    for ip, country in got.items():
        h = hashlib.md5(ip.encode()).digest()
        assert country == countries[h[0] % len(countries)]


def test_frame_sample_and_resize_plumbing(spark):
    import pytest as _pytest

    media = multimodal.synth_media(_docs(spark).limit(10))
    frames = multimodal.sample_frames(media, n_frames=4, frame_bytes=4)
    rows = frames.collect()
    # 16-byte payloads → exactly 4 full frames each
    assert len(rows) == 40
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rs in by_media.items():
        assert sorted(x.frame_idx for x in rs) == [0, 1, 2, 3]
        assert all(x.n_bytes == 4 for x in rs)
    # short payloads emit only the frames that exist
    import pyspark.sql.functions as SF

    clipped = media.withColumn("payload", SF.expr("substring(payload, 1, 6)"))
    short = multimodal.sample_frames(clipped, n_frames=4, frame_bytes=4)
    per = short.groupBy("media_id").count().collect()
    assert all(r["count"] == 2 for r in per)  # 6 bytes → frames of 4 + 2

    resized = multimodal.resize_media(media, width=6, height=3)
    # stage composes: same column names and types (nullability may
    # differ between literal-struct input and the declared schema)
    assert resized.schema.simpleString() == media.schema.simpleString()
    feats = multimodal.extract_features(resized).collect()
    assert all(r.n_bytes == 18 for r in feats)

    with _pytest.raises(Exception):
        multimodal.sample_frames(media, decode_stub=False).collect()
    with _pytest.raises(Exception):
        multimodal.resize_media(media, width=2, height=2, decode_stub=False).collect()


def test_y4m_codec_roundtrip_and_seams():
    """videocodec round-trips YUV4MPEG2 byte-exactly, honors the spec
    default colorspace, sizes every supported colorspace correctly,
    raises on truncation/bad magic/unknown colorspace, and the uniform
    sampling rule matches its documented floor(k·total/n) closed form."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        videocodec,
    )

    frames = [bytes(range(i, i + 24)) for i in range(5)]
    payload = videocodec.encode_y4m(frames, width=6, height=4,
                                    colorspace="mono", fps=(30, 1))
    params, got = videocodec.decode_y4m(payload)
    assert got == frames
    assert params == {
        "width": 6, "height": 4, "colorspace": "mono",
        "fps_num": 30, "fps_den": 1, "n_frames": 5,
    }

    # spec default colorspace when C token is absent: 420jpeg
    hdr = b"YUV4MPEG2 W4 H2 F25:1\n"
    p2, g2 = videocodec.decode_y4m(hdr + b"FRAME\n" + bytes(12))
    assert p2["colorspace"] == "420jpeg" and len(g2[0]) == 12

    # frame sizes per colorspace
    assert videocodec.frame_size(4, 2, "mono") == 8
    assert videocodec.frame_size(4, 2, "420jpeg") == 12
    assert videocodec.frame_size(4, 2, "422") == 16
    assert videocodec.frame_size(4, 2, "444") == 24
    with _pytest.raises(NotImplementedError):
        videocodec.frame_size(4, 2, "h264")

    # honesty contract: truncated stream / bad magic raise
    with _pytest.raises(ValueError, match="truncated frame"):
        videocodec.decode_y4m(payload[:-1])
    with _pytest.raises(ValueError, match="bad magic"):
        videocodec.decode_y4m(b"RIFF" + payload)
    with _pytest.raises(ValueError, match="expected FRAME"):
        videocodec.decode_y4m(payload + b"JUNK")
    with _pytest.raises(ValueError):
        videocodec.encode_y4m([bytes(23)], width=6, height=4,
                              colorspace="mono")

    # sampling rule: floor(k*total/n), deduped, ascending
    assert videocodec.sample_indices(8, 4) == [0, 2, 4, 6]
    assert videocodec.sample_indices(3, 4) == [0, 1, 2]
    assert videocodec.sample_indices(10, 3) == [0, 3, 6]
    assert videocodec.sample_indices(0, 4) == []


def test_y4m_real_frame_sampling(spark):
    """synth_y4m_media writes genuine Y4M containers, the real
    sample_frames path recovers the exact tiled-md5 planes at the
    uniform sample indices, frame_pixel_stats reduces them exactly,
    and non-Y4M payloads raise at the magic boundary."""
    import hashlib

    import pytest as _pytest
    from pyspark.errors.exceptions.captured import PythonException

    docs = spark.createDataFrame(
        [(1, "alpha doc"), (2, None)], "doc_id long, text string"
    )
    media = multimodal.synth_y4m_media(docs)
    mrows = {r.media_id: r for r in media.collect()}
    assert mrows[1].meta.mime == "video/x-yuv4mpeg"
    assert bytes(mrows[1].payload).startswith(b"YUV4MPEG2 W6 H4")

    frames = multimodal.sample_frames(media, n_frames=4, decode_stub=False)
    by_media = {}
    for r in frames.collect():
        by_media.setdefault(r.media_id, {})[r.frame_idx] = bytes(r.frame)
    for doc_id, text in [(1, "alpha doc"), (2, None)]:
        digest = hashlib.md5(("" if text is None else text).encode()).digest()
        stream = (digest * 12)[:192]
        got = by_media[doc_id]
        assert sorted(got) == [0, 2, 4, 6]
        for f, plane in got.items():
            assert plane == stream[f * 24:(f + 1) * 24]

    stats = multimodal.frame_pixel_stats(frames).collect()
    assert len(stats) == 8
    for r in stats:
        plane = by_media[r.media_id][r.frame_idx]
        assert r.n_bytes == 24
        assert r.p_min == min(plane) and r.p_max == max(plane)
        assert r.p_sum == sum(plane)
        assert r.p_sumsq == sum(b * b for b in plane)

    # compressed/unknown codecs raise at the magic seam
    fake = multimodal.synth_media(docs)
    with _pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.sample_frames(fake, decode_stub=False).collect()


def test_wav_audio_roundtrip_and_seams(spark):
    """synth_wav_media writes genuine RIFF/WAV containers (stdlib wave
    can reopen them), decode_audio_features recovers the exact tiled
    md5 PCM stats, mono reports NULL for the absent channel, and
    non-16-bit payloads raise at the codec boundary."""
    import hashlib
    import io
    import struct
    import wave

    from database_activity_monitoring_dam_system_spark.operators import (
        multimodal,
    )

    docs = spark.createDataFrame(
        [(1, "alpha doc"), (2, None)], "doc_id long, text string"
    )
    media = multimodal.synth_wav_media(docs)
    rows = {r.media_id: r for r in media.collect()}
    assert rows[1].meta.mime == "audio/wav"
    assert bytes(rows[1].payload)[:4] == b"RIFF"

    stats = {
        r.media_id: r
        for r in multimodal.decode_audio_features(media).collect()
    }
    for doc_id, text in [(1, "alpha doc"), (2, None)]:
        digest = hashlib.md5(("" if text is None else text).encode()).digest()
        lanes = struct.unpack("<8h", digest)
        row = stats[doc_id]
        assert (row.n_channels, row.sample_rate, row.n_frames) == (2, 8000, 32)
        for c in range(2):
            vals = lanes[c::2]
            assert getattr(row, f"c{c}_min") == min(vals)
            assert getattr(row, f"c{c}_max") == max(vals)
            assert getattr(row, f"c{c}_sum") == 8 * sum(vals)
            assert getattr(row, f"c{c}_sumsq") == 8 * sum(v * v for v in vals)

    # mono: second channel is NULL, stats cover the single channel
    mono = multimodal.synth_wav_media(
        docs.filter("doc_id = 1"), channels=1, n_frames=16
    )
    mrow = multimodal.decode_audio_features(mono).collect()[0]
    digest = hashlib.md5(b"alpha doc").digest()
    lanes = struct.unpack("<8h", digest)
    assert mrow.n_channels == 1 and mrow.n_frames == 16
    assert mrow.c0_min == min(lanes) and mrow.c0_max == max(lanes)
    assert mrow.c1_min is None and mrow.c1_sumsq is None

    # codec boundary: 8-bit PCM raises NotImplementedError
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import PythonException

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x00" * 16)
    eight_bit = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "media_id long, payload binary"
    )
    with _pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.decode_audio_features(eight_bit).collect()


def test_ivf_index_save_load_identical(spark, tmp_path):
    """A persisted IVF quantizer loads back bit-identical (doubles
    round-trip parquet exactly), so ivf_topk over a loaded index
    returns EXACTLY the fresh-trained results — a restarted serving
    job skips retraining with zero drift."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = similarity.ivf_centroids(emb, n_centroids=8, refine_iters=1)
    path = str(tmp_path / "ivf_index")
    similarity.save_ivf_index(spark, cents, path)
    loaded = similarity.load_ivf_index(spark, path)
    assert loaded == cents  # exact float equality, not approx

    qids = [0, 1, 2]
    fresh = similarity.ivf_topk(
        emb, qids, k=5, n_probe=3, centroids=cents
    ).collect()
    reload = similarity.ivf_topk(
        emb, qids, k=5, n_probe=3, centroids=loaded
    ).collect()
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, reload))


def test_shared_index_artifacts_survive_restart(spark, tmp_path, monkeypatch):
    """Under SPARK_DAM_INDEX_DIR, index-like _shared kinds persist as
    parquet: after a simulated process restart (memo cache cleared),
    the artifact is LOADED — the builder must not run again."""
    from database_activity_monitoring_dam_system_spark.plans import dam

    monkeypatch.setenv("SPARK_DAM_SHARE_FRAMES", "1")
    monkeypatch.setenv("SPARK_DAM_INDEX_DIR", str(tmp_path / "idx"))

    built = []

    def build():
        built.append(1)
        return spark.createDataFrame(
            [(1, 10), (2, 10)], "doc_id long, cluster_id long"
        )

    first = dam._shared("dedup_clusters", spark, str(tmp_path), build)
    rows = sorted(map(tuple, first.collect()))
    assert built == [1]

    # simulate restart: in-memory memo gone, disk artifact remains
    dam._FRAME_CACHE.pop(("dedup_clusters", __import__("os").path.realpath(
        str(tmp_path))), None)

    def must_not_build():
        raise AssertionError("builder ran despite persisted artifact")

    again = dam._shared("dedup_clusters", spark, str(tmp_path), must_not_build)
    assert sorted(map(tuple, again.collect())) == rows
    dam._FRAME_CACHE.pop(("dedup_clusters", __import__("os").path.realpath(
        str(tmp_path))), None)


def test_shared_expect_rows_rebuilds_stale_artifact(spark, tmp_path, monkeypatch):
    """The disk tier's staleness fingerprint: a persisted artifact
    whose row count differs from expect_rows (regenerated corpus at
    the same path) is REBUILT and overwritten, not silently served;
    a matching count loads without rebuilding."""
    import os

    from database_activity_monitoring_dam_system_spark.plans import dam

    monkeypatch.setenv("SPARK_DAM_SHARE_FRAMES", "1")
    monkeypatch.setenv("SPARK_DAM_INDEX_DIR", str(tmp_path / "idx"))
    key = ("ivf_pq_codes", os.path.realpath(str(tmp_path)))

    def build_v1():
        return spark.createDataFrame(
            [(1, 0, 1), (2, 1, 2)], "vec_id long, cent_id int, code0 int"
        )

    first = dam._shared(
        "ivf_pq_codes", spark, str(tmp_path), build_v1, expect_rows=2
    )
    assert first.count() == 2
    dam._FRAME_CACHE.pop(key, None)

    # same fingerprint -> loaded, builder must not run
    def must_not_build():
        raise AssertionError("builder ran despite fresh artifact")

    again = dam._shared(
        "ivf_pq_codes", spark, str(tmp_path), must_not_build, expect_rows=2
    )
    assert again.count() == 2
    dam._FRAME_CACHE.pop(key, None)

    # corpus regenerated (3 rows now) -> stale disk table rebuilt
    def build_v2():
        return spark.createDataFrame(
            [(1, 0, 1), (2, 1, 2), (3, 0, 3)],
            "vec_id long, cent_id int, code0 int",
        )

    rebuilt = dam._shared(
        "ivf_pq_codes", spark, str(tmp_path), build_v2, expect_rows=3
    )
    assert rebuilt.count() == 3
    dam._FRAME_CACHE.pop(key, None)


def test_ivf_pq_topk_rejects_foreign_encoded_table(spark):
    """The encoded= path fails LOUDLY on a table that is not an
    ivf_pq_encode artifact for these params (missing cent_id or code
    columns) instead of silently dropping every candidate."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    cents = similarity.ivf_centroids(emb, n_centroids=8, refine_iters=1)
    bad = spark.createDataFrame([(1, 0)], "vec_id long, cent_id int")
    with _pytest.raises(ValueError, match="encoded table lacks"):
        similarity.ivf_pq_topk(
            emb, [0], k=5, n_centroids=8, centroids=cents,
            codebooks=books, encoded=bad,
        )


def test_pq_encode_shapes_and_determinism(spark):
    """PQ codebooks have m × ksub × d/m structure, every vector gets m
    in-range codes, and encode is deterministic (argmin with
    lowest-code tie rule over literal codebooks — pure projection)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    assert len(books) == 4
    assert all(len(b) == 8 for b in books)
    assert all(len(c) == 16 for b in books for c in b)
    codes = similarity.pq_encode(emb, books, dim=64).collect()
    assert len(codes) == emb.count()
    for r in codes:
        for j in range(4):
            assert 0 <= r[f"code{j}"] < 8
    again = similarity.pq_encode(emb, books, dim=64).collect()
    assert sorted(map(tuple, codes)) == sorted(map(tuple, again))


def test_pq_topk_recall_vs_bruteforce(spark):
    """ADC over 4×16 codebooks on a RANDOM 64-d corpus (worst case for
    PQ — no subspace structure) still lands a usable fraction of the
    true L2 top-10; and the ranking is k rows per query, self
    excluded."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qids = [0, 1, 2, 3, 4]
    # brute-force L2 top-10 (PQ approximates L2 distance, not cosine)
    v = F.col("embedding").cast("array<double>")
    base = emb.select(F.col("vec_id"), v.alias("v"))
    q = base.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    from pyspark.sql import Window

    d2 = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    exact = {
        (r.query_id, r.vec_id)
        for r in base.join(
            F.broadcast(q), F.col("query_id") != F.col("vec_id")
        )
        .withColumn("d2", d2)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .collect()
    }
    pq = similarity.pq_topk(emb, qids, k=10, m=4, ksub=16, iters=2).collect()
    got = {(r.query_id, r.neighbor_id) for r in pq}
    assert len(pq) == 50
    assert all(r.query_id != r.neighbor_id for r in pq)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.2, f"PQ recall degenerate: {recall:.2f}"


def test_pq_norm_fixes_metric_mismatch_on_varying_norm_corpus(spark):
    """The normalize-then-encode variant's purpose, demonstrated on
    the corpus regime it exists for: vectors with VARYING magnitudes
    (norms 0.25–4×), where raw-L2 ADC ranks by magnitude as much as
    angle while the cosine ground truth ignores magnitude entirely.
    pq_norm's unit pre-transform restores the metric: its cosine
    recall must beat raw pq's by a wide margin.  (The bundled sf*
    embeddings are already unit-norm, so there the two coincide —
    documented in SCALE.md.)"""
    import numpy as np

    rng = np.random.RandomState(7)
    n, d, n_clusters = 240, 64, 8
    centers = rng.randn(n_clusters, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[np.arange(n) % n_clusters] + 0.15 * rng.randn(n, d)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    # the regime under test: spread magnitudes across 16×
    mags = np.exp(rng.uniform(np.log(0.25), np.log(4.0), size=n))
    pts = pts * mags[:, None]
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }

    def recall(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & exact) / len(exact)

    r_raw = recall(
        similarity.pq_topk(emb, qids, k=10, m=8, ksub=32, iters=3)
    )
    r_norm = recall(
        similarity.pq_norm_topk(emb, qids, k=10, m=8, ksub=32, iters=3)
    )
    assert r_norm >= r_raw + 0.15, (
        f"normalization uplift missing: raw={r_raw:.2f} norm={r_norm:.2f}"
    )
    assert r_norm >= 0.6, f"pq_norm recall too low: {r_norm:.2f}"
    # normalization is idempotent on already-unit corpora: same rows
    unit = similarity.normalize_vectors(emb)
    a = sorted(map(tuple, similarity.pq_norm_topk(
        emb, qids, k=10, m=4, ksub=16).collect()))
    b = sorted(map(tuple, similarity.pq_norm_topk(
        unit, qids, k=10, m=4, ksub=16).collect()))
    assert a == b


def test_normalize_vectors_zero_vector_passthrough(spark):
    """Zero vectors survive normalization unchanged (no NaNs) and
    unit vectors stay bit-identical under a second normalization."""
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0, 0.0]), (2, [3.0, 0.0, 4.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.embedding
        for r in similarity.normalize_vectors(emb).collect()
    }
    assert out[1] == [0.0, 0.0, 0.0, 0.0]
    assert out[2] == [0.6, 0.0, 0.8, 0.0]


def test_pq_index_save_load_identical(spark, tmp_path):
    """Persisted PQ codebooks load back bit-identical (doubles
    round-trip parquet exactly): pq_topk over a loaded index returns
    EXACTLY the fresh-trained results — same restart contract as the
    IVF quantizer."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    path = str(tmp_path / "pq_index")
    similarity.save_pq_index(spark, books, path)
    loaded = similarity.load_pq_index(spark, path)
    assert loaded == books  # exact float equality, not approx
    qids = [0, 1, 2]
    fresh = similarity.pq_topk(
        emb, qids, k=5, m=4, ksub=8, iters=1, codebooks=books
    ).collect()
    reload = similarity.pq_topk(
        emb, qids, k=5, m=4, ksub=8, iters=1, codebooks=loaded
    ).collect()
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, reload))


def test_pq_dim_not_divisible_raises(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train(emb, m=5, ksub=4, iters=1, dim=64)


def test_ivf_pq_reduces_to_pq_when_probing_all_lists(spark):
    """With n_probe = n_centroids the probe prunes nothing, so IVF-PQ
    must return EXACTLY pq_topk's ADC ranking (same codebooks); with a
    partial probe it returns k rows per query drawn from the probed
    lists only — the recall/candidate-volume trade."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qids = [0, 1, 2]
    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    cents = similarity.ivf_centroids(emb, n_centroids=8, refine_iters=1)
    full = similarity.ivf_pq_topk(
        emb, qids, k=5, n_centroids=8, n_probe=8,
        centroids=cents, codebooks=books,
    ).collect()
    plain = similarity.pq_topk(
        emb, qids, k=5, codebooks=books
    ).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, plain))
    partial = similarity.ivf_pq_topk(
        emb, qids, k=5, n_centroids=8, n_probe=2,
        centroids=cents, codebooks=books,
    ).collect()
    assert len(partial) == 15
    assert all(r.query_id != r.neighbor_id for r in partial)


def test_ivf_pq_encoded_serving_path_identical(spark):
    """ivf_pq_topk(encoded=...) — the persisted-code-table serving
    posture — must return EXACTLY the inline single-pass plan's rows,
    and the same code table (cent_id dropped) must drive pq_topk's
    ADC ranking bit-identically via pq_score_queries: one artifact,
    both ANN shapes, zero corpus re-scan at query time."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qids = [0, 1, 2]
    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    cents = similarity.ivf_centroids(emb, n_centroids=8, refine_iters=1)
    codes = similarity.ivf_pq_encode(
        emb, centroids=cents, codebooks=books
    )
    assert codes.columns == ["vec_id", "cent_id"] + [
        f"code{j}" for j in range(4)
    ]
    inline = similarity.ivf_pq_topk(
        emb, qids, k=5, n_centroids=8, n_probe=2,
        centroids=cents, codebooks=books,
    ).collect()
    served = similarity.ivf_pq_topk(
        emb, qids, k=5, n_centroids=8, n_probe=2,
        centroids=cents, codebooks=books, encoded=codes,
    ).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, served))
    pq_inline = similarity.pq_topk(
        emb, qids, k=5, codebooks=books
    ).collect()
    pq_served = similarity.pq_score_queries(
        codes.drop("cent_id").withColumnRenamed("vec_id", "neighbor_id"),
        similarity.pq_prepare_queries(
            emb.filter(F.col("vec_id").isin(qids)), books
        ),
        books, k=5, exclude_self=True,
    ).collect()
    assert sorted(map(tuple, pq_inline)) == sorted(map(tuple, pq_served))


def test_kmeans_outliers_are_the_far_tail(spark):
    """kmeans_outliers returns exactly the top-N sqdist rows of the
    decimal-exact assignment (ties → lowest id), farthest first — the
    pruning tail is a deterministic function of the corpus."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    assigned, _ = similarity.kmeans_lloyd_exact(emb, k=4, iters=1)
    rows = assigned.collect()
    expected = sorted(rows, key=lambda r: (-r.sqdist, r.vec_id))[:10]
    out = similarity.kmeans_outliers(emb, k=4, iters=1, top_n=10).collect()
    assert [r.vec_id for r in out] == [r.vec_id for r in expected]
    assert [r.cluster_id for r in out] == [
        r.cluster_id for r in expected
    ]
    for got, exp in zip(out, expected):
        assert abs(got.sqdist - round(exp.sqdist, 6)) < 1e-9
    # far tail is strictly ordered (desc) up to the rounding
    ds = [r.sqdist for r in out]
    assert ds == sorted(ds, reverse=True)


def test_index_load_rejects_stale_corpus_count(spark, tmp_path):
    """Disk index artifacts are stamped with the training corpus's row
    count; loading against a corpus of a different size raises instead
    of silently serving answers for the OLD corpus (the regenerated-
    testdata-same-path trap)."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = similarity.ivf_centroids(emb, n_centroids=4, refine_iters=0)
    p1 = str(tmp_path / "ivf")
    similarity.save_ivf_index(spark, cents, p1, n_corpus=100)
    assert similarity.load_ivf_index(spark, p1, expect_n=100) == cents
    with _pytest.raises(ValueError, match="stale IVF index"):
        similarity.load_ivf_index(spark, p1, expect_n=250)
    # unstamped artifacts (n_corpus=None) stay loadable — back-compat
    p2 = str(tmp_path / "ivf2")
    similarity.save_ivf_index(spark, cents, p2)
    assert similarity.load_ivf_index(spark, p2, expect_n=250) == cents

    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    p3 = str(tmp_path / "pq")
    similarity.save_pq_index(spark, books, p3, n_corpus=100)
    assert similarity.load_pq_index(spark, p3, expect_n=100) == books
    with _pytest.raises(ValueError, match="stale PQ index"):
        similarity.load_pq_index(spark, p3, expect_n=250)

    # residual books record the coarse quantizer they were trained
    # against; replacing the quantizer must refuse the stale books
    # (they load cleanly by every other stamp and would serve
    # silently degraded ADC distances)
    fp = similarity.artifact_fingerprint(cents)
    p4 = str(tmp_path / "pq_res")
    similarity.save_pq_index(
        spark, books, p4, n_corpus=100, trained_against=fp
    )
    assert similarity.load_pq_index(
        spark, p4, expect_n=100, expect_trained_against=fp
    ) == books
    other_fp = similarity.artifact_fingerprint(
        similarity.ivf_centroids(emb, n_centroids=2, refine_iters=0)
    )
    with _pytest.raises(ValueError, match="trained against"):
        similarity.load_pq_index(
            spark, p4, expect_trained_against=other_fp
        )
    # artifacts saved before the stamp (trained_against NULL) pass —
    # same back-compat policy as verify_index_stamp
    assert similarity.load_pq_index(
        spark, p3, expect_trained_against=fp
    ) == books


def test_pq_score_queries_rejects_mismatched_codes(spark):
    """A code table missing the codebooks' code columns is a
    mismatched-artifacts error, not k rows of NULL-distance garbage."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    # codes encoded with m=2 codebooks → only code0/code1 columns
    books2 = similarity.pq_train(emb, m=2, ksub=8, iters=1, dim=64)
    codes2 = similarity.pq_encode(emb, books2, dim=64).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    queries = similarity.pq_prepare_queries(
        emb.filter(F.col("vec_id") == 0), books, dim=64
    )
    with _pytest.raises(ValueError, match="code2"):
        similarity.pq_score_queries(codes2, queries, books, k=5)


def test_audio_decode_zero_frame_wav(spark):
    """A legal zero-frame WAV yields a NULL-stats row, not a dead
    mapInPandas task."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"")
    media = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "media_id long, payload binary"
    )
    rows = multimodal.decode_audio_features(media).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_frames == 0 and r.c0_min is None and r.c0_sumsq is None


def test_hash_embeddings_properties_and_composition(spark):
    """Feature-hashing embeddings: unit L2 norm of the output vector,
    identical text → identical embedding, token-overlap → higher
    cosine than unrelated text — and the vector column composes
    directly with the similarity operators (cosine_topk over REAL
    documents)."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # identical
        (3, "the quick brown fox leaps over the lazy dog"),  # 1 token off
        (4, "completely different words about database monitoring systems"),
        (5, "   "),  # whitespace only → no tokens → no row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = textops.hash_embeddings(docs, dim=32)
    out = {r.doc_id: r for r in emb.collect()}
    assert 5 not in out  # no tokens, no embedding row
    for r in out.values():
        if r.embedding is not None:
            assert abs(sum(x * x for x in r.embedding) - 1.0) < 1e-9
    assert out[1].embedding == out[2].embedding

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    near = cos(out[1].embedding, out[3].embedding)
    far = cos(out[1].embedding, out[4].embedding)
    assert near > far
    assert near > 0.8  # 8/9 shared tokens

    # composition: the embedding column drives the ANN operators
    topk = similarity.cosine_topk(
        emb.filter(F.col("embedding").isNotNull()),
        [1],
        k=2,
        id_col="doc_id",
        vec_col="embedding",
    ).collect()
    assert [r.neighbor_id for r in topk] == [2, 3]  # dup first, near second


def test_bpe_learn_classic_merge_sequence(spark):
    """The Sennrich walk-through corpus: merge order is fully
    determined by the frequency table and the (count DESC, pair ASC)
    tie rule — the first six merges are hand-checkable."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
    merges = textops.bpe_learn(docs, n_merges=6)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"),
        ("l", "o"), ("lo", "w"), ("e", "w"),
    ]
    rank = {p: i for i, p in enumerate(merges)}
    # the classic apply result: an UNSEEN word re-segments through the
    # learned subwords
    assert textops.bpe_encode_word("lowest", rank) == ["low", "est</w>"]
    # seen words collapse to their trained segmentation
    assert textops.bpe_encode_word("low", rank) == ["low", "</w>"]


def test_bpe_token_counts_match_reference(spark):
    """Distributed counts ≡ an independent driver-side re-encode of
    every word; tokens always reconstruct the word + end marker."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    docs = _docs(spark).limit(40)
    merges = textops.bpe_learn(docs, n_merges=50)
    rank = {p: i for i, p in enumerate(merges)}
    out = {r.doc_id: r for r in textops.bpe_token_counts(docs, merges).collect()}
    for row in docs.collect():
        words = [w for w in row.text.strip().lower().split() if w]
        if not words:
            assert row.doc_id not in out
            continue
        expect = 0
        for w in words:
            toks = textops.bpe_encode_word(w, rank)
            assert "".join(toks) == w + "</w>"
            expect += len(toks)
        got = out[row.doc_id]
        assert got.n_words == len(words)
        assert got.n_bpe_tokens == expect
        assert abs(got.avg_tokens_per_word - round(expect / len(words), 4)) < 1e-9
    # real merges compress: fewer BPE tokens than raw chars, more than words
    any_doc = next(iter(out.values()))
    assert any_doc.n_words <= any_doc.n_bpe_tokens


def test_vocab_drift_verdicts_and_kl(spark):
    """All three verdicts fire on a planted drift (a vanished token, a
    new boilerplate token, shifted mass); the restricted-vocabulary KL
    is a true KL (both sides normalized over the same vocab) and
    therefore non-negative; the injected boilerplate carries the
    largest positive KL contribution."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    old = spark.createDataFrame(
        [
            (1, "alpha beta gamma obsolete alpha beta"),
            (2, "alpha beta delta obsolete gamma gamma"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha beta gamma navbar navbar navbar navbar"),
            (2, "alpha beta delta navbar navbar navbar gamma"),
        ],
        "doc_id long, text string",
    )
    rows = {r.token: r for r in textops.vocab_drift(old, new, top_n=50).collect()}
    assert rows["obsolete"].verdict == "vanished"
    assert rows["navbar"].verdict == "new"
    assert rows["alpha"].verdict == "shifted"
    kl = sum(r.kl_term for r in rows.values())
    assert kl >= -1e-6
    assert max(rows.values(), key=lambda r: r.kl_term).token == "navbar"
    # probabilities normalize over the shared vocab on each side
    for col in ("p_old", "p_new"):
        assert abs(sum(getattr(r, col) for r in rows.values()) - 1.0) < 1e-6


def test_pq_update_codes_equals_full_reencode(spark):
    """Incremental index refresh ≡ full re-encode under fixed
    codebooks: carried codes for value-identical vectors, fresh codes
    for changed/added, removed ids gone."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    old = emb.filter(F.col("vec_id") % 10 != 0)
    # new snapshot: drop ids % 7 == 0, perturb ids % 5 == 0 (valid dim
    # preserved), keep the rest byte-identical
    new = emb.filter(F.col("vec_id") % 7 != 0).withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0,
            F.transform(
                F.col("embedding").cast("array<double>"), lambda x: x + 0.25
            ),
        ).otherwise(F.col("embedding").cast("array<double>")),
    )
    old_codes = similarity.pq_encode(old, books, dim=64)
    updated = similarity.pq_update_codes(old_codes, old, new, books, dim=64)
    full = similarity.pq_encode(new, books, dim=64)
    assert sorted(map(tuple, updated.collect())) == sorted(
        map(tuple, full.collect())
    )
    # and the delta really was a delta: removed ids absent
    got_ids = {r.vec_id for r in updated.collect()}
    assert all(i % 7 != 0 for i in got_ids)


def test_index_stamp_verifies_and_rejects(spark):
    """Content-fingerprint stamping on persisted code tables: a
    stamped table scores identically to an unstamped one under the
    codebooks it was encoded with, and fails LOUDLY (not silently
    wrong ADC distances) under codebooks from a different build —
    including codebooks of the SAME m/ksub whose codes are all
    in-range, the case the n_corpus row-count stamp cannot catch."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    # same shape, different content: train on a disjoint corpus slice
    other = similarity.pq_train(
        emb.filter(F.col("vec_id") % 2 == 0), m=4, ksub=8, iters=2, dim=64
    )
    assert other != books
    codes = similarity.pq_encode(emb, books, dim=64).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    stamped = similarity.stamp_index(codes, codebooks=books)
    queries = similarity.pq_prepare_queries(
        emb.filter(F.col("vec_id").isin([1, 2])), books, dim=64
    )
    plain = similarity.pq_score_queries(codes, queries, books, k=5)
    via_stamp = similarity.pq_score_queries(stamped, queries, books, k=5)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, via_stamp.collect())
    )
    with _pytest.raises(ValueError, match="different codebooks"):
        similarity.pq_score_queries(stamped, queries, other, k=5)
    # ivf_pq_topk(encoded=...) checks BOTH artifact stamps
    cents = similarity.ivf_centroids(emb, n_centroids=4, refine_iters=1)
    enc = similarity.stamp_index(
        similarity.ivf_pq_encode(emb, centroids=cents, codebooks=books),
        codebooks=books, centroids=cents,
    )
    with _pytest.raises(ValueError, match="different codebooks"):
        similarity.ivf_pq_topk(
            emb, [1], k=5, centroids=cents, codebooks=other, encoded=enc
        )
    other_cents = similarity.ivf_centroids(
        emb.filter(F.col("vec_id") % 2 == 0), n_centroids=4, refine_iters=2
    )
    with _pytest.raises(ValueError, match="different quantizer"):
        similarity.ivf_pq_topk(
            emb, [1], k=5, centroids=other_cents, codebooks=books,
            encoded=enc,
        )
    # the saved codebook artifact carries the matching content_md5
    fp = similarity.artifact_fingerprint(books)
    assert (
        stamped.select("_cb_md5").limit(1).collect()[0][0] == fp
    )


def test_stamp_metadata_fast_path_and_row_fallback(spark, tmp_path):
    """The stamp fingerprint rides as column METADATA so verification
    of frames stamped by this library (or round-tripped through their
    parquet artifacts) is a driver-side comparison — and a stamp
    column WITHOUT metadata (external/hand-built artifact) still gets
    the full row-level check, including the mismatch rejection."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = similarity.ivf_centroids(emb, n_centroids=4, refine_iters=1)
    other = similarity.ivf_centroids(
        emb.filter(F.col("vec_id") % 2 == 0), n_centroids=4, refine_iters=2
    )
    stamped = similarity.stamp_ivf_assignments(
        similarity.ivf_assignments(emb, cents), cents
    )
    # metadata present in-memory and across a parquet round-trip
    assert stamped.schema[similarity.IVF_ASSIGN_STAMP].metadata[
        "stamp"
    ] == similarity._cent_fingerprint(cents)
    path = str(tmp_path / "assign_pq")
    stamped.write.mode("overwrite").parquet(path)
    loaded = spark.read.parquet(path)
    assert loaded.schema[similarity.IVF_ASSIGN_STAMP].metadata[
        "stamp"
    ] == similarity._cent_fingerprint(cents)
    ok = similarity._verify_assign_stamp(loaded, cents, caller="t")
    assert similarity.IVF_ASSIGN_STAMP not in ok.columns
    with _pytest.raises(ValueError, match="does not match"):
        similarity._verify_assign_stamp(loaded, other, caller="t")
    # a hand-stamped frame with NO metadata falls back to the
    # row-level check: matching rows pass, mismatched rows reject
    bare = similarity.ivf_assignments(emb, cents).withColumn(
        similarity.IVF_ASSIGN_STAMP,
        F.lit(similarity._cent_fingerprint(cents)),
    )
    assert not bare.schema[similarity.IVF_ASSIGN_STAMP].metadata
    similarity._verify_assign_stamp(bare, cents, caller="t")
    with _pytest.raises(ValueError, match="does not match"):
        similarity._verify_assign_stamp(bare, other, caller="t")


def test_pq_update_codes_stamp_and_unpersist_handle(spark):
    """pq_update_codes verifies a stamped old_codes against the
    supplied codebooks (carrying codes across a codebook change is the
    silent-corruption trap), re-stamps its output, and exposes the
    internal persisted classify frame so long-lived drivers can
    unpersist it."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    other = similarity.pq_train(
        emb.filter(F.col("vec_id") % 2 == 0), m=4, ksub=8, iters=2, dim=64
    )
    old = emb.filter(F.col("vec_id") < 400)
    new = emb
    old_codes = similarity.stamp_index(
        similarity.pq_encode(old, books, dim=64), codebooks=books
    )
    with _pytest.raises(ValueError, match="different codebooks"):
        similarity.pq_update_codes(old_codes, old, new, other, dim=64)
    handles: list = []
    updated = similarity.pq_update_codes(
        old_codes, old, new, books, dim=64, persisted_out=handles
    )
    # output is re-stamped and round-trips through the verifier
    assert "_cb_md5" in updated.columns
    full = similarity.pq_encode(new, books, dim=64)
    assert sorted(map(tuple, updated.drop("_cb_md5").collect())) == sorted(
        map(tuple, full.collect())
    )
    assert len(handles) == 1 and handles[0].is_cached
    handles[0].unpersist(blocking=True)
    assert not handles[0].is_cached


def test_nb_hashed_classify_separable_and_margins(spark):
    """On a vocabulary-separable fixture the classifier is perfect on
    held-out docs; margins are positive for confident predictions;
    tokenless docs drop; training is fully relational (no driver-side
    model state to go stale)."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    train_rows = []
    for i in range(20):
        train_rows.append((i * 2, "aaa bbb ccc aaa bbb ccc ddd", "x"))
        train_rows.append((i * 2 + 100, "qqq rrr sss qqq rrr sss ttt", "y"))
    train = spark.createDataFrame(
        train_rows, "doc_id long, text string, lang string"
    )
    score = spark.createDataFrame(
        [
            (1001, "aaa bbb aaa ccc"),
            (1002, "rrr sss qqq ttt"),
            (1003, "   "),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in textops.nb_hashed_classify(
            train, score, label_col="lang"
        ).collect()
    }
    assert out[1001].pred_label == "x" and out[1002].pred_label == "y"
    assert out[1001].margin > 0 and out[1002].margin > 0
    assert 1003 not in out

    # on the synthetic corpus: a real (if weak) signal — beats chance
    docs = _docs(spark)
    pred = textops.nb_hashed_classify(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        label_col="lang",
    )
    joined = pred.join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select((F.col("pred_label") == F.col("lang")).cast("int").alias("hit"))
    acc = joined.agg(F.avg("hit")).first()[0]
    n_labels = docs.select("lang").distinct().count()
    assert acc > 1.5 / n_labels, f"accuracy {acc:.3f} not above chance"


def test_relative_quality_filter_is_language_fair(spark):
    """Each stratum keeps ceil(frac·n) of ITS OWN docs — a stratum
    whose absolute scores are all terrible still keeps its top slice
    (the failure mode of a global cutoff), and within a stratum the
    kept set is exactly the top-ranked rows."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    rows = []
    # 'good' stratum: fluent docs (high stopword ratio, no punct)
    for i in range(10):
        rows.append((i, "the cat and the dog of the house went to a tree", "good"))
    # 'bad' stratum: noisy docs — globally much worse scores
    for i in range(10, 20):
        rows.append((i, f"x{i}!!! ### $$$ %%% zz{i} @@@ !!! ??? *** ((()))", "bad"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = textops.relative_quality_filter(docs, keep_frac=0.5).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        kept = [r for r in rs if r.kept]
        assert len(kept) == 5, f"{lang}: {len(kept)}"  # ceil(0.5 * 10)
        # kept = exactly ranks 1..5
        assert sorted(r.q_rank for r in kept) == [1, 2, 3, 4, 5]
    # global-cutoff failure mode check: the bad stratum's best kept row
    # scores worse than the good stratum's worst dropped row
    best_bad = max(r.q_score for r in by_lang["bad"] if r.kept)
    worst_good_dropped = min(
        r.q_score for r in by_lang["good"] if not r.kept
    )
    assert best_bad < worst_good_dropped


def test_ann_recall_report_structure_and_floors(spark):
    """The evaluation harness measures every ANN variant against the
    same exact ground truth: structurally complete rows, hits bounded
    by expectations, and the exhaustive-scoring methods (int8) beat
    the probe-pruned ones' worst case."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    report = similarity.ann_recall_report(emb, [0, 1, 2], k=5)
    assert [r["method"] for r in report] == [
        "lsh", "ivf", "int8", "pq", "ivf_pq", "ivf_pq_res",
        "ivf_pq_refine",
    ]
    for r in report:
        assert 0 <= r["n_hits"] <= r["n_expected"] == 15
        assert 0.0 <= r["recall_at_k"] <= 1.0
    by = {r["method"]: r["recall_at_k"] for r in report}
    # int8 is exhaustive exact-integer cosine — near-perfect recall
    assert by["int8"] >= 0.9


def test_bucket_dim_guard_and_id_passthrough(spark):
    """dim > 256 would silently zero most buckets (two hex digits);
    both bucket-hashing operators reject it. bpe_token_counts keeps
    the caller's id column name and type (string ids pass through)."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import textops

    docs = spark.createDataFrame(
        [("a1", "some words here"), ("b2", "other words there")],
        "uid string, text string",
    )
    with _pytest.raises(ValueError, match="256"):
        textops.hash_embeddings(docs, dim=512, id_col="uid")
    with _pytest.raises(ValueError, match="256"):
        textops.nb_hashed_classify(
            docs.withColumn("lang", F.lit("x")), docs,
            id_col="uid", dim=300,
        )
    merges = textops.bpe_learn(docs, n_merges=5)
    out = textops.bpe_token_counts(docs, merges, id_col="uid").collect()
    assert {r.uid for r in out} == {"a1", "b2"}
    assert out[0].n_words == 3


def test_cluster_safe_splits_no_leakage(spark):
    """Every member of a duplicate cluster lands in the SAME split —
    the property a per-doc split violates; singletons key on their
    own id; the split is deterministic and exhaustive."""
    from database_activity_monitoring_dam_system_spark.operators import sampling

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 50, 51, 52]], "doc_id long"
    )
    out = sampling.cluster_safe_splits(
        docs, clusters, fracs=(0.5, 0.25)
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == 8
    # leakage check: cluster members share one split
    assert len({by_id[i].split for i in (1, 2, 3)}) == 1
    assert len({by_id[i].split for i in (10, 11)}) == 1
    # singleton keys are their own ids
    assert by_id[50].split_key == 50
    # deterministic on re-run
    again = {
        r.doc_id: r.split
        for r in sampling.cluster_safe_splits(
            docs, clusters, fracs=(0.5, 0.25)
        ).collect()
    }
    assert again == {r.doc_id: r.split for r in out}
    # on the corpus: every near-dup pair agrees across splits
    docs_real = _docs(spark)
    from database_activity_monitoring_dam_system_spark.operators import dedup

    pairs = dedup.jaccard_pairs(
        docs_real, block_col=["lang", "source"], threshold=0.9
    )
    cl = dedup.duplicate_clusters(pairs)
    splits = sampling.cluster_safe_splits(docs_real, cl)
    leak = (
        pairs.join(
            splits.select(F.col("doc_id").alias("doc_a"),
                          F.col("split").alias("sa")), "doc_a")
        .join(
            splits.select(F.col("doc_id").alias("doc_b"),
                          F.col("split").alias("sb")), "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leak == 0


def test_cluster_safe_splits_validation_and_id_col(spark):
    """Out-of-range fracs raise instead of silently emptying the
    held-out sets; a caller id_col applies to the docs side while the
    cluster map keeps its fixed (doc_id, cluster_id) schema."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import sampling

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long"
    )
    docs = spark.createDataFrame([(1,), (2,), (3,)], "uid long")
    out = sampling.cluster_safe_splits(
        docs, clusters, fracs=(0.5, 0.25), id_col="uid"
    ).collect()
    assert {r.uid for r in out} == {1, 2, 3}
    assert len({r.split for r in out if r.uid in (1, 2)}) == 1
    for bad in [(0.7, 0.5), (0.9, -0.1), (1.2, 0.0)]:
        with _pytest.raises(ValueError, match="fracs"):
            sampling.cluster_safe_splits(docs, clusters, fracs=bad, id_col="uid")


def test_compression_signals_orders_repetition(spark):
    """Boilerplate compresses far better than diverse prose, which
    compresses better than random hex; empty text yields NULL ratio;
    the measure is deterministic."""
    import hashlib

    from database_activity_monitoring_dam_system_spark.operators import textops

    rand = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(40)
    )
    rows = [
        (1, "copy paste boilerplate line here " * 40),
        (2, "a reasonably varied sentence about engines, corpora, "
            "shuffles, codecs, tokenizers, and the weather in between "
            "with mostly distinct words appearing once each time"),
        (3, rand),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textops.compression_signals(docs).collect()}
    # boilerplate compresses far better than EITHER content class
    # (hex is itself ~4 bits/char, so it beats short prose — ordering
    # between the two is entropy, not repetition; the boilerplate
    # floor is the signal)
    assert out[1].ratio < min(out[2].ratio, out[3].ratio) - 0.3
    assert out[1].ratio < 0.1  # 40× repeated line ≈ pure structure
    assert out[4].ratio is None and out[4].n_bytes == 0
    again = {r.doc_id: r.ratio for r in textops.compression_signals(docs).collect()}
    assert again == {k: v.ratio for k, v in out.items()}


def test_curriculum_phases_equal_buckets_and_order(spark):
    """Phases are equal-count (within 1), monotone in the score
    direction (ascending=False → phase 0 holds the highest scores),
    deterministic, and validate n_phases."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "doc_id long, s double"
    )
    out = sampling.curriculum_phases(
        docs, F.col("s"), n_phases=3, ascending=False
    ).collect()
    by_phase = {}
    for r in out:
        by_phase.setdefault(r.phase, []).append(r)
    sizes = sorted(len(v) for v in by_phase.values())
    assert sizes == [3, 3, 4]
    # ascending=False: phase 0 = highest scores
    assert min(r.curriculum_score for r in by_phase[0]) > max(
        r.curriculum_score for r in by_phase[max(by_phase)]
    )
    # full cover, ranks 1..N
    assert sorted(r.phase_rank for r in out) == list(range(1, 11))
    with _pytest.raises(ValueError, match="n_phases"):
        sampling.curriculum_phases(docs, F.col("s"), n_phases=0)


def test_gopher_rules_every_verdict_branch(spark):
    """Hand-crafted docs hit each rule in the published short-circuit
    order: word count, mean word length, symbol ratio, alpha
    fraction, stopword presence, keep — and the measures are the
    exact integer-arithmetic ratios."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    keep = "the cat sat and the dog ran off to the big red barn " * 5
    rows = [
        (1, "too short"),  # n_words < 50
        (2, " ".join(["a"] * 60)),  # mean word len 1 < 3
        (3, " ".join(["word#tag"] * 30 + ["#"] * 30)),  # symbols
        (4, " ".join(["123"] * 40 + ["the", "and"] * 10)),  # low alpha
        (5, " ".join(["alpha", "beta", "gamma"] * 20)),  # no stopwords
        (6, keep),
        (7, " ".join(["word…"] * 30 + ["ok"] * 30)),  # U+2026
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textops.gopher_rules(docs).collect()}
    assert out[1].verdict == "bad_word_count"
    assert out[2].verdict == "bad_mean_word_len"
    assert out[3].verdict == "too_symbolic"
    assert out[3].symbol_word_ratio > 0.1
    assert out[4].verdict == "low_alpha"
    assert out[4].frac_alpha_words == round(20 / 60, 6)
    assert out[5].verdict == "no_stopwords"
    assert out[5].n_stop_distinct == 0
    assert out[6].verdict == "keep"
    assert out[6].n_stop_distinct == 3  # the, and, to
    assert out[7].verdict == "too_symbolic"  # unicode ellipses count
    assert out[7].symbol_word_ratio == 0.5
    assert out[2].mean_word_len == 1.0
    # custom stoplist knob: doc 5's vocabulary becomes fluent
    custom = textops.gopher_rules(
        docs, stopwords=("alpha", "beta")
    ).collect()
    assert {r.verdict for r in custom if r.doc_id == 5} == {"keep"}
    # empty stoplist = the rule can never pass (vacuous fail, no crash)
    empty = textops.gopher_rules(docs, stopwords=()).collect()
    assert {r.verdict for r in empty if r.doc_id == 6} == {"no_stopwords"}
    assert all(r.n_stop_distinct == 0 for r in empty)


def test_source_overlap_estimates_and_mergeability(spark):
    """The per-source union sketch estimates the TRUE Jaccard of the
    sources' shingle-set unions (within MinHash tolerance at k=64),
    identical sources agree on every component, and disjoint ones on
    none; output is the strict upper triangle."""
    from database_activity_monitoring_dam_system_spark.operators import dedup

    a = ["alpha beta gamma delta epsilon zeta eta theta"]
    b = ["iota kappa lamda mu nu xi omicron pi"]
    rows = (
        [(i, t, "sA") for i, t in enumerate(a * 3)]          # sA = set A
        + [(10 + i, t, "sB") for i, t in enumerate(a + b)]   # sB = A ∪ B
        + [(20 + i, t, "sC") for i, t in enumerate(b)]       # sC = set B
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {
        (r.group_a, r.group_b): r
        for r in dedup.source_minhash_overlap(
            docs, num_hashes=64, shingle=3
        ).collect()
    }
    assert set(out) == {("sA", "sB"), ("sA", "sC"), ("sB", "sC")}
    # sA ∩ sC = ∅ -> estimate 0
    assert out[("sA", "sC")].n_agree == 0
    # true J(A, A∪B) = |A| / |A∪B| = 6/12 = 0.5 (6 3-shingles each)
    est = out[("sA", "sB")].est_jaccard
    assert 0.25 < est < 0.75, est
    # duplicates within a source don't change its union sketch:
    # sA (3 copies of A) vs a single-copy source must agree fully
    merged = {
        (r.group_a, r.group_b): r.n_agree
        for r in dedup.source_minhash_overlap(
            docs.union(
                spark.createDataFrame(
                    [(30, a[0], "sD")],
                    "doc_id long, text string, source string",
                )
            ),
            num_hashes=64,
            shingle=3,
        ).collect()
    }
    assert merged[("sA", "sD")] == 64  # same underlying set -> all agree


def test_encoding_signals_branches(spark):
    """Every verdict branch and count on crafted docs: replacement
    beats control beats mojibake in the first-failing-rule order;
    tab/newline/CR are NOT control hits; empty text yields NULL
    ratio; clean text is 'ok'."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    R = chr(0xFFFD)
    enc_rows = [
        (1, "clean words only"),
        (2, "bad " + R + R + " decode"),
        (3, "bell " + chr(7) + " and " + chr(27) + " here"),
        (4, "caf" + chr(0xE9) + " ok but " + chr(0x85) + " slipped"),
        (5, "mojibake " + chr(0xC3) + chr(0xA9) + " and "
            + chr(0xE2) + chr(0x20AC) + "quote"),
        (6, "tabs\tand\nnewlines\rare fine"),
        (7, ""),
        (8, "mixed " + R + " " + chr(7) + " end"),
    ]
    df = spark.createDataFrame(enc_rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textops.encoding_signals(df).collect()}
    assert out[1].verdict == "ok" and out[1].bad_ratio == 0.0
    assert out[2].verdict == "replacement" and out[2].n_replacement == 2
    assert out[3].verdict == "control" and out[3].n_control == 2
    assert out[4].verdict == "mojibake" and out[4].n_c1 == 1
    # 'A-tilde + copyright' is one double-encoding pair;
    # 'a-circumflex + euro' is one more
    assert out[5].verdict == "mojibake" and out[5].n_mojibake == 2
    assert out[6].verdict == "ok" and out[6].n_control == 0
    assert out[7].bad_ratio is None and out[7].verdict == "ok"
    assert out[8].verdict == "replacement"
    # e-acute alone is legitimate latin-1, not flagged as mojibake
    assert out[4].n_mojibake == 0


def test_rollup_partials_merge_chain_and_late_data(spark):
    """Continuous-aggregate invariants: minute→hour→day merge chain
    ≡ direct day aggregation from raw (decomposable integer state);
    a late event dirties exactly ONE minute bucket and re-merging
    only that bucket's coarse ancestors reproduces the full
    recompute; bad grain raises."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import rollup
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, SF_SMOKE, "events")
    minute = rollup.time_partials(
        events, grain="minute", group_cols=["event_type"]
    )
    hour = rollup.rollup_partials(
        minute, to_grain="hour", group_cols=["event_type"]
    )
    day_via_chain = rollup.rollup_partials(
        hour, to_grain="day", group_cols=["event_type"]
    )
    day_direct = rollup.time_partials(
        events, grain="day", group_cols=["event_type"]
    )
    chain = sorted(map(tuple, day_via_chain.collect()))
    direct = sorted(map(tuple, day_direct.collect()))
    assert chain == direct and len(chain) > 0
    # late data: one synthetic event lands in exactly one minute bucket
    late = spark.createDataFrame(
        [(999999, "2024-01-15 10:30:45", 7, "login", 2.5, None)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with_late = events.unionByName(late)
    m_before = {tuple(r[:2]): tuple(r[2:]) for r in minute.collect()}
    m_after = {
        tuple(r[:2]): tuple(r[2:])
        for r in rollup.time_partials(
            with_late, grain="minute", group_cols=["event_type"]
        ).collect()
    }
    changed = {
        k for k in (m_before.keys() | m_after.keys())
        if m_before.get(k) != m_after.get(k)
    }
    assert len(changed) == 1
    # re-merging the full (now-dirty) minute table reproduces the
    # direct recompute at day grain — the refresh path a late event
    # actually takes
    day_after_chain = rollup.rollup_partials(
        rollup.rollup_partials(
            rollup.time_partials(
                with_late, grain="minute", group_cols=["event_type"]
            ),
            to_grain="hour", group_cols=["event_type"],
        ),
        to_grain="day", group_cols=["event_type"],
    )
    day_after_direct = rollup.time_partials(
        with_late, grain="day", group_cols=["event_type"]
    )
    assert sorted(map(tuple, day_after_chain.collect())) == sorted(
        map(tuple, day_after_direct.collect())
    )
    with _pytest.raises(ValueError, match="grain"):
        rollup.time_partials(events, grain="week")


def test_oov_stats_coverage_semantics(spark):
    """OOV rate on crafted docs: full-coverage doc → 0.0; unseen
    tokens count; tokenless doc reports NULL rate (distinct from
    perfect coverage); vocab ranking is deterministic under ties."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    ref = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "alpha beta delta")],
        "doc_id long, text string",
    )
    vocab = textops.vocab_top_n(ref, top_n=3)
    vrows = {r.token: (r.cnt, r.vocab_rank) for r in vocab.collect()}
    # alpha(3) > beta(2) > delta/gamma tie broken alphabetically
    assert vrows["alpha"] == (3, 1) and vrows["beta"] == (2, 2)
    assert set(vrows) == {"alpha", "beta", "delta"}
    score = spark.createDataFrame(
        [
            (10, "alpha beta beta"),
            (11, "alpha zeta zeta gamma"),
            (12, "   "),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.oov_stats(score, vocab).collect()}
    assert out[10].oov_rate == 0.0 and out[10].n_oov == 0
    # zeta×2 and gamma (rank 4, cut) are OOV → 3/4
    assert out[11].n_oov == 3 and out[11].oov_rate == 0.75
    assert out[12].n_tokens == 0 and out[12].oov_rate is None


def test_bloom_merge_guard_and_null_values(spark):
    """bloom_merge refuses mismatched (k, m_bits) geometries (silent
    truncation would create false negatives); NULL values are dropped
    at build; n_values counts DISTINCT inserted values."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import sketches

    vals = spark.createDataFrame(
        [("x",), ("y",), ("y",), (None,)], "v string"
    )
    bm = sketches.bloom_bitmap(vals, "v", k=3, m_bits=4096)
    row = bm.collect()[0]
    assert row.n_values == 2  # distinct non-NULL
    probed = {
        r.v: r.maybe_member
        for r in sketches.bloom_probe(
            spark.createDataFrame([("x",), ("y",)], "v string"), bm, "v"
        ).collect()
    }
    assert probed == {"x": True, "y": True}
    other = sketches.bloom_bitmap(vals, "v", k=3, m_bits=8192)
    with _pytest.raises(ValueError, match="mismatched filter parameters"):
        sketches.bloom_merge(bm, other)
    other_k = sketches.bloom_bitmap(vals, "v", k=2, m_bits=4096)
    with _pytest.raises(ValueError, match="mismatched filter parameters"):
        sketches.bloom_merge(bm, other_k)


def test_funnel_strict_ordering_semantics(spark):
    """The funnel is sequence-sensitive: a purchase BEFORE the first
    view does not convert; equal timestamps don't advance (strictly
    after); users with no step-1 event report step_reached via later
    impossible steps as 0 and are dropped; summary conversion is
    monotone non-increasing."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import journeys

    rows = [
        # u1: clean view -> click -> purchase
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "purchase"),
        # u2: purchase BEFORE view — must NOT count
        (2, "2024-01-01 09:00:00", "purchase"),
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:30:00", "click"),
        # u3: click at the SAME instant as view — strictly-after fails
        (3, "2024-01-01 10:00:00", "view"),
        (3, "2024-01-01 10:00:00", "click"),
        # u4: never views — excluded entirely
        (4, "2024-01-01 10:00:00", "click"),
        (4, "2024-01-01 11:00:00", "purchase"),
        # u5: two views; funnel anchors on the FIRST
        (5, "2024-01-01 08:00:00", "view"),
        (5, "2024-01-01 09:00:00", "click"),
        (5, "2024-01-01 12:00:00", "view"),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    steps = ["view", "click", "purchase"]
    out = {r.user_id: r for r in journeys.funnel_steps(events, steps).collect()}
    assert out[1].step_reached == 3
    assert out[2].step_reached == 2 and out[2].t_purchase is None
    assert out[3].step_reached == 1 and out[3].t_click is None
    assert 4 not in out
    assert out[5].step_reached == 2
    assert out[5].t_view < out[5].t_click
    summary = {
        r.step: r
        for r in journeys.funnel_summary(
            journeys.funnel_steps(events, steps), steps
        ).collect()
    }
    assert summary["view"].n_users == 4
    assert summary["click"].n_users == 3
    assert summary["purchase"].n_users == 1
    assert summary["view"].conversion_from_first == 1.0
    with _pytest.raises(ValueError, match="steps"):
        journeys.funnel_steps(events, ["view"])


def test_cohort_retention_matrix(spark):
    """Cohorts key on each user's own first-event date; offsets are
    integer periods from THAT date; retention is bounded by 1 at
    offset 0 and cohort counts are exact on a crafted fixture."""
    from database_activity_monitoring_dam_system_spark.operators import journeys

    rows = [
        # cohort A (2024-01-01): u1 active periods 0,1; u2 only 0
        (1, "2024-01-01 10:00:00"), (1, "2024-01-09 10:00:00"),
        (2, "2024-01-01 11:00:00"),
        # cohort B (2024-01-03): u3 active periods 0 and 2
        (3, "2024-01-03 10:00:00"), (3, "2024-01-18 10:00:00"),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (r.cohort_start, r.period_offset): r
        for r in journeys.cohort_retention(events, period_days=7).collect()
    }
    a0 = out[("2024-01-01", 0)]
    assert a0.n_active == 2 and a0.cohort_size == 2 and a0.retention == 1.0
    a1 = out[("2024-01-01", 1)]
    assert a1.n_active == 1 and a1.retention == 0.5
    b0 = out[("2024-01-03", 0)]
    assert b0.cohort_size == 1
    assert out[("2024-01-03", 2)].n_active == 1
    assert set(out) == {
        ("2024-01-01", 0), ("2024-01-01", 1),
        ("2024-01-03", 0), ("2024-01-03", 2),
    }


def test_profile_operators_semantics(spark):
    """Skew report shares sum to ≤1 and rank the heaviest first;
    histogram bins cover all rows incl. a NULL bin; exact-moment
    Pearson matches numpy's corrcoef on the quantized values and
    returns NULL r for a zero-variance group."""
    import numpy as np

    from database_activity_monitoring_dam_system_spark.operators import profile

    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
            (4, "b", 5.0), (5, "b", 5.0), (6, "b", None)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    skew = profile.key_skew_report(df, ["g"], top_n=5).collect()
    assert [r.g for r in skew] == ["a", "b"]
    assert abs(sum(r.share for r in skew) - 1.0) < 1e-9
    hist = {
        (r.g, r.bin): r.cnt
        for r in profile.value_histogram(
            df, "v", bin_width=10.0, group_cols=["g"]
        ).collect()
    }
    assert hist[("a", 1)] == 1 and hist[("a", 2)] == 1 and hist[("a", 3)] == 1
    assert hist[("b", 0)] == 2 and hist[("b", None)] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bin_width"):
        profile.value_histogram(df, "v", bin_width=0)
    # correlation: y perfectly correlated with x in group a; constant
    # x in group b -> NULL r
    cdf = spark.createDataFrame(
        [("a", 1.0, 2.5), ("a", 2.0, 4.5), ("a", 3.0, 6.5),
         ("a", 4.25, 9.0), ("b", 7.0, 1.0), ("b", 7.0, 2.0)],
        "g string, x double, y double",
    )
    out = {
        r.g: r
        for r in profile.pearson_corr_exact(
            cdf, "x", "y", group_cols=["g"]
        ).collect()
    }
    xs = np.floor(np.array([1.0, 2.0, 3.0, 4.25]) * 1000)
    ys = np.floor(np.array([2.5, 4.5, 6.5, 9.0]) * 1000)
    expect = np.corrcoef(xs, ys)[0, 1]
    assert abs(out["a"].r - round(float(expect), 6)) < 2e-6
    assert out["b"].r is None


def test_distinct_rollup_merge_law(spark):
    """HLL register partials at minute grain merged to day ≡ the HLL
    computed directly over raw events at day grain — register tables
    EXACTLY equal (the merge law), and so are the finalized
    estimates; hll_md5_distinct itself is unchanged by the
    registers/finalize refactor (same output on the docs table)."""
    from database_activity_monitoring_dam_system_spark.operators import (
        rollup, sketches,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, SF_SMOKE, "events")
    minute = rollup.distinct_partials(
        events, distinct_col="user_id", grain="minute",
        group_cols=["event_type"],
    )
    via_chain = rollup.rollup_distinct(
        minute, to_grain="day", group_cols=["event_type"]
    )
    direct_regs = rollup.distinct_partials(
        events, distinct_col="user_id", grain="day",
        group_cols=["event_type"],
    )
    direct = sketches.hll_finalize(
        direct_regs, ["bucket_ts", "event_type"]
    )
    assert sorted(map(tuple, via_chain.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # register-level equality too (stronger than estimate equality)
    merged_regs = sketches.hll_merge_registers(
        minute.selectExpr(
            "date_trunc('day', bucket_ts) AS bucket_ts",
            "event_type", "_bucket", "_r",
        ),
        ["bucket_ts", "event_type"],
    )
    assert sorted(map(tuple, merged_regs.collect())) == sorted(
        map(tuple, direct_regs.drop("_bucket_bits").collect())
    )


def test_quantile_rollup_merge_law_and_geometry_guard(spark):
    """Fixed-bin histogram partials make quantiles rollup-able:
    minute→day merge ≡ direct day-grain histogram (counts are sums on
    a shared integer grid); a mismatched grid must fail loudly; and
    the reported edges bracket the true percentile within one bin
    width."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        rollup,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, SF_SMOKE, "events")
    kw = dict(group_cols=["event_type"], lo=0.0, hi=500.0, bins=200)
    minute = rollup.value_quantile_partials(events, grain="minute", **kw)
    via_chain = rollup.rollup_quantiles(
        minute, to_grain="day", percents=(50, 90, 99), **kw
    )
    direct = rollup.rollup_quantiles(
        rollup.value_quantile_partials(events, grain="day", **kw),
        to_grain="day", percents=(50, 90, 99), **kw,
    )
    rows = sorted(map(tuple, via_chain.collect()))
    assert rows == sorted(map(tuple, direct.collect()))
    assert rows, "no day buckets produced"
    # estimate semantics: the reported edge is the lower edge of the
    # bin containing the NEAREST-RANK percentile element (index
    # ceil(p·n/100) in the sorted group), for every group and p
    import math

    import pyspark.sql.functions as F

    by_group: dict[tuple, list[float]] = {}
    for r in events.select(
        F.date_trunc("day", "ts").alias("b"), "event_type", "value"
    ).collect():
        by_group.setdefault((r["b"], r["event_type"]), []).append(
            r["value"]
        )
    est = {
        (r["bucket_ts"], r["event_type"]): r for r in via_chain.collect()
    }
    width = 500.0 / 200
    for key, vals in by_group.items():
        vals.sort()
        row = est[key]
        assert row["n_values"] == len(vals)
        for p in (50, 90, 99):
            # the operator quantizes to millis before binning
            rank_val = (
                math.floor(vals[math.ceil(p * len(vals) / 100) - 1] * 1000)
                / 1000.0
            )
            e = row[f"p{p}_value"]
            assert e <= rank_val < e + width, (key, p, e, rank_val)
    # geometry guard: partials built on a different grid refuse to
    # finalize
    with _pytest.raises(Exception, match="rollup_quantiles"):
        rollup.rollup_quantiles(
            minute, to_grain="day", group_cols=["event_type"],
            lo=0.0, hi=400.0, bins=200,
        ).collect()


def test_gapfill_buckets_invariants(spark):
    """Gap filling emits exactly the per-group bucket grid: observed
    rows keep their metrics bit-for-bit, synthesized rows are
    zero-count and flagged, and row count per group equals the
    span/grain quotient + 1."""
    import pyspark.sql.functions as F

    from database_activity_monitoring_dam_system_spark.operators import (
        rollup,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, SF_SMOKE, "events")
    hour = rollup.time_partials(
        events, grain="hour", group_cols=["event_type"]
    ).select("bucket_ts", "event_type", "n_events", "sum_millis")
    filled = rollup.gapfill_buckets(
        hour, grain="hour", group_cols=["event_type"]
    )
    observed = {
        (r["bucket_ts"], r["event_type"]): (r["n_events"], r["sum_millis"])
        for r in hour.collect()
    }
    spans = {
        r["event_type"]: (r["b0"], r["b1"])
        for r in hour.groupBy("event_type")
        .agg(F.min("bucket_ts").alias("b0"), F.max("bucket_ts").alias("b1"))
        .collect()
    }
    rows = filled.collect()
    per_group: dict[str, int] = {}
    for r in rows:
        key = (r["bucket_ts"], r["event_type"])
        per_group[r["event_type"]] = per_group.get(r["event_type"], 0) + 1
        if key in observed:
            assert not r["is_gap"]
            assert (r["n_events"], r["sum_millis"]) == observed[key]
        else:
            assert r["is_gap"]
            assert (r["n_events"], r["sum_millis"]) == (0, 0)
    for etype, n in per_group.items():
        b0, b1 = spans[etype]
        expected = int((b1 - b0).total_seconds() // 3600) + 1
        assert n == expected, (etype, n, expected)


def test_inverted_index_search_equals_bruteforce(spark):
    """Index-answered conjunctive search returns exactly the docs a
    brute-force token-containment scan returns; posting lists are
    sorted; df bounds prune; empty term lists refuse."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        invindex,
    )
    from database_activity_monitoring_dam_system_spark.operators.textops import (
        _norm_tokens,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    postings = invindex.build_postings(docs)
    terms = ["dup", "merge", "spark"]
    hits = invindex.search_docs(docs, postings, terms)
    brute = docs.filter(
        F.size(
            F.array_intersect(
                F.array_distinct(_norm_tokens("text")),
                F.array([F.lit(t) for t in terms]),
            )
        )
        == len(terms)
    )
    got = sorted(r.doc_id for r in hits.collect())
    want = sorted(r.doc_id for r in brute.collect())
    assert got == want and 0 < len(got) < docs.count()
    # posting lists are sorted + df matches list length
    for r in postings.collect():
        assert r.postings == sorted(r.postings)
        assert r.df == len(r.postings)
    # df bounds prune (max_df drops the near-stopword tokens)
    capped = invindex.build_postings(docs, min_df=2, max_df=100)
    assert capped.filter(
        (F.col("df") < 2) | (F.col("df") > 100)
    ).count() == 0
    assert capped.count() < postings.count()
    # duplicate query terms must not inflate the intersection count
    dup_hits = invindex.search_all_terms(postings, ["dup", "dup"])
    one_hit = invindex.search_all_terms(postings, ["dup"])
    assert sorted(r.doc_id for r in dup_hits.collect()) == sorted(
        r.doc_id for r in one_hit.collect()
    )
    with _pytest.raises(ValueError, match="at least one term"):
        invindex.search_all_terms(postings, [])


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    """The point of the Morton re-layout: per-file min/max footprints
    (what parquet stat pruning sees) are small in BOTH dimensions,
    so a 2-D range predicate prunes most files — against a 1-D
    sorted layout of the same file count, the Z-ordered layout's
    total normalized box area must shrink and a small rectangle
    query must intersect fewer files. Row multiset is preserved."""
    import glob

    import pyspark.sql.functions as F

    from database_activity_monitoring_dam_system_spark.operators import (
        zorder,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    # sf0.01: enough rows that 16 files' min/max boxes reflect the
    # layout, not sampling noise.
    events = load_table(spark, "/root/testdata/sf0.01", "events")
    # x uniform by construction; y = event epoch seconds (uniform in
    # the synthetic stream). The grid must FIT the distribution —
    # zorder.py documents that a skewed dimension needs a quantile
    # transform first (verified here the honest way: value-millis as
    # y over a uniform [0, 500k) grid clusters WORSE than 1-D sort).
    e = events.select(
        "event_id",
        F.col("user_id").alias("x"),
        F.unix_timestamp("ts").alias("y"),
    )
    x_lo, x_hi, y_lo, y_hi = e.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).first()
    n_files = 16
    zpath = str(tmp_path / "zordered")
    npath = str(tmp_path / "xsorted")
    key = zorder.zorder_key(
        "x", "y", x_lo=x_lo, x_hi=x_hi, y_lo=y_lo, y_hi=y_hi, bits=10
    )
    # deterministic file assignment for the TEST: the key's top
    # log2(n_files) bits are exact Z-curve quadrants (the production
    # writer's repartitionByRange is sampling-based and its file
    # boundaries jitter run to run — measured as a rare flake in the
    # full-suite run)
    (
        e.withColumn("_f", (key / (1 << 16)).cast("int"))
        .write.partitionBy("_f").mode("overwrite").parquet(zpath)
    )
    # 1-D baseline: same machinery, keyed by x alone
    (
        e.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(npath)
    )

    def footprints(path):
        boxes = []
        for f in sorted(
            glob.glob(path + "/*.parquet")
            + glob.glob(path + "/_f=*")
        ):
            st = (
                spark.read.parquet(f)
                .agg(
                    F.min("x"), F.max("x"), F.min("y"), F.max("y"),
                    F.count("*"),
                )
                .first()
            )
            if st[4]:
                boxes.append((st[0], st[1], st[2], st[3]))
        return boxes

    zb, nb = footprints(zpath), footprints(npath)

    # The honest pruning metric: a 1-D sort always wins on ITS
    # dimension (razor-thin slabs) and loses totally on the other
    # (every file spans all of y). Z-order's contract is a bounded
    # WORST CASE across dimensions — a 10%-wide stripe predicate on
    # either dimension must prune well, where the x-sorted layout
    # prunes nothing for y stripes.
    x_span = float(x_hi - x_lo + 1)
    y_span = float(y_hi - y_lo + 1)
    qx = (x_lo + int(0.2 * x_span), x_lo + int(0.3 * x_span))
    qy = (y_lo + int(0.2 * y_span), y_lo + int(0.3 * y_span))

    def hits(boxes, qx=None, qy=None):
        n = 0
        for x0, x1, y0, y1 in boxes:
            if qx and (x1 < qx[0] or x0 > qx[1]):
                continue
            if qy and (y1 < qy[0] or y0 > qy[1]):
                continue
            n += 1
        return n

    worst_z = max(hits(zb, qx=qx), hits(zb, qy=qy))
    worst_n = max(hits(nb, qx=qx), hits(nb, qy=qy))
    assert hits(nb, qy=qy) == len(nb)  # 1-D layout: y stripe hits all
    assert worst_z <= worst_n // 2, (worst_z, worst_n, len(zb))
    # and the 2-D rectangle prunes most files under z-order
    assert hits(zb, qx=qx, qy=qy) <= len(zb) // 4, hits(zb, qx=qx, qy=qy)
    # the re-layout is a permutation: row multiset preserved
    a = sorted(
        map(tuple, spark.read.parquet(zpath).drop("_f").collect())
    )
    b = sorted(map(tuple, e.collect()))
    assert a == b


def test_bm25_matches_python_reference(spark):
    """bm25_scores ≡ a pure-Python BM25 over the same tokenization
    (6-dp), candidates are exactly the docs containing ≥1 query
    term, an absent term contributes 0, and degenerate inputs
    refuse."""
    import math
    import re

    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        invindex,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    terms = ["dup", "merge", "spark"]
    got = {
        r.doc_id: r.score
        for r in invindex.bm25_scores(docs, terms).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    toks = {
        r.doc_id: [
            t
            for t in re.split(r"[^a-z0-9]+", (r.text or "").lower())
            if t
        ]
        for r in rows
    }
    n = len(rows)
    sum_dl = sum(len(v) for v in toks.values())
    dfs = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    k1, b = 1.2, 0.75
    want = {}
    for doc_id, v in toks.items():
        dl = len(v)
        s = 0.0
        for t in terms:
            tf = sum(1 for x in v if x == t)
            if dfs[t] == 0:
                continue
            s += (
                math.log((float(n) - dfs[t] + 0.5) / (dfs[t] + 0.5))
                * (tf * (k1 + 1.0))
                / (tf + k1 * ((1.0 - b) + b * dl * float(n) / float(sum_dl)))
            )
        if any(t in v for t in terms):
            want[doc_id] = round(s, 6)
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])
    # a term absent from the corpus contributes exactly 0
    with_ghost = {
        r.doc_id: r.score
        for r in invindex.bm25_scores(
            docs, terms + ["zzzznotaterm"]
        ).collect()
    }
    assert with_ghost == got
    with _pytest.raises(ValueError, match="at least one term"):
        invindex.bm25_scores(docs, [])
    with _pytest.raises(ValueError, match="distinct"):
        invindex.bm25_scores(docs, ["dup", "dup"])


def test_transition_counts_semantics(spark):
    """Crafted sequences: consecutive-pair counts, deterministic
    equal-timestamp ordering by event id, terminal events excluded,
    per-from probabilities summing to 1."""
    import datetime as dt

    from database_activity_monitoring_dam_system_spark.operators import (
        journeys,
    )

    t0 = dt.datetime(2024, 1, 1)

    def row(eid, uid, secs, etype):
        return (eid, uid, t0 + dt.timedelta(seconds=secs), etype)

    events = spark.createDataFrame(
        [
            # user 1: view -> click -> purchase
            row(1, 1, 0, "view"),
            row(2, 1, 10, "click"),
            row(3, 1, 20, "purchase"),
            # user 2: equal timestamps — id order decides:
            # view(4) -> view(5) -> click(6)
            row(5, 2, 0, "view"),
            row(4, 2, 0, "view"),
            row(6, 2, 0, "click"),
            # user 3: single event — no transitions
            row(7, 3, 0, "view"),
        ],
        "event_id LONG, user_id LONG, ts TIMESTAMP, event_type STRING",
    )
    got = {
        (r.from_type, r.to_type): (
            r.n_transitions, r.from_total, r.probability,
        )
        for r in journeys.transition_counts(events).collect()
    }
    assert got == {
        ("view", "click"): (2, 3, round(2 / 3, 6)),
        ("view", "view"): (1, 3, round(1 / 3, 6)),
        ("click", "purchase"): (1, 1, 1.0),
    }


def test_postings_persistence_and_staleness(spark, tmp_path):
    """The search index artifact: save/load round-trips the posting
    table (search from the loaded index ≡ fresh-built), the token
    sort lands inside files (bucketed write), and a corpus-count
    mismatch refuses to serve — the regenerated-corpus staleness
    trap."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        invindex,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    postings = invindex.build_postings(docs)
    path = str(tmp_path / "postings")
    invindex.save_postings(postings, path, n_docs=n_docs, buckets=4)
    loaded = invindex.load_postings(spark, path, expect_docs=n_docs)
    assert sorted(
        (r.token, tuple(r.postings), r.df) for r in loaded.collect()
    ) == sorted(
        (r.token, tuple(r.postings), r.df) for r in postings.collect()
    )
    terms = ["dup", "merge", "spark"]
    fresh = sorted(
        r.doc_id
        for r in invindex.search_all_terms(postings, terms).collect()
    )
    served = sorted(
        r.doc_id
        for r in invindex.search_all_terms(loaded, terms).collect()
    )
    assert fresh == served and fresh
    with _pytest.raises(ValueError, match="rebuild the index"):
        invindex.load_postings(spark, path, expect_docs=n_docs + 1)


def test_table_checksum_properties(spark):
    """Digest is row-order/partitioning-invariant and column-order-
    insensitive; any single changed value changes it; shard digests
    merge to the whole-table digest."""
    import pyspark.sql.functions as F

    from database_activity_monitoring_dam_system_spark.operators import (
        validate,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    e = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("millis"),
    )
    base = validate.table_checksum(e).first()
    shuffled = validate.table_checksum(
        e.repartition(17).select(
            "millis", "event_type", "user_id", "event_id"
        )
    ).first()
    assert tuple(base) == tuple(shuffled)
    # single-value sensitivity
    tweaked = e.withColumn(
        "millis",
        F.when(F.col("event_id") == 7, F.col("millis") + 1).otherwise(
            F.col("millis")
        ),
    )
    assert tuple(validate.table_checksum(tweaked).first()) != tuple(base)
    # shard-by-shard merge: (count, sum, max) of two halves combine
    # (sum_h48 is a plain-digit STRING — DECIMAL outputs are
    # client-rendering-unstable; parse to merge)
    lo = validate.table_checksum(e.filter("event_id % 2 = 0")).first()
    hi = validate.table_checksum(e.filter("event_id % 2 = 1")).first()
    assert isinstance(base.sum_h48, str)
    assert (
        lo.n_rows + hi.n_rows,
        str(int(lo.sum_h48) + int(hi.sum_h48)),
        max(lo.max_h48, hi.max_h48),
    ) == tuple(base)


def test_zorder_rank_transform_fixes_skewed_dimension(spark, tmp_path):
    """The documented fixed-grid failure case (exponential value
    column) under the RANK-scaled key: worst-case stripe pruning
    beats the 1-D sort, which the uniform grid measurably lost."""
    import glob

    import pyspark.sql.functions as F

    from database_activity_monitoring_dam_system_spark.operators import (
        zorder,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    events = load_table(spark, "/root/testdata/sf0.01", "events")
    e = events.select(
        "event_id",
        F.floor(F.col("value") * 1000).cast("long").alias("x"),
        F.unix_timestamp("ts").alias("y"),
    )
    n_files = 64
    keyed = zorder.zorder_rank_key(e, "x", "y", bits=10)
    zpath, npath = str(tmp_path / "zrank"), str(tmp_path / "xsorted")
    # deterministic quadrant files (see the fixed-grid test's note)
    (
        keyed.withColumn("_f", (keyed["zkey"] / (1 << 14)).cast("int"))
        .drop("zkey")
        .write.partitionBy("_f").mode("overwrite").parquet(zpath)
    )
    (
        e.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(npath)
    )

    def footprints(path):
        boxes = []
        for f in sorted(
            glob.glob(path + "/*.parquet")
            + glob.glob(path + "/_f=*")
        ):
            st = (
                spark.read.parquet(f)
                .agg(
                    F.min("x"), F.max("x"), F.min("y"), F.max("y"),
                    F.count("*"),
                )
                .first()
            )
            if st[4]:
                boxes.append((st[0], st[1], st[2], st[3]))
        return boxes

    zb, nb = footprints(zpath), footprints(npath)
    # stripes in RAW space from data quantiles (10% of mass each)
    qx = tuple(
        int(v * 1000)
        for v in events.approxQuantile("value", [0.4, 0.5], 0.0)
    )
    ys = sorted(r[0] for r in e.select("y").collect())
    qy = (ys[int(0.4 * len(ys))], ys[int(0.5 * len(ys))])

    def hits(boxes, qx=None, qy=None):
        n = 0
        for x0, x1, y0, y1 in boxes:
            if qx and (x1 < qx[0] or x0 > qx[1]):
                continue
            if qy and (y1 < qy[0] or y0 > qy[1]):
                continue
            n += 1
        return n

    worst_z = max(hits(zb, qx=qx), hits(zb, qy=qy))
    worst_n = max(hits(nb, qx=qx), hits(nb, qy=qy))
    assert hits(nb, qy=qy) == len(nb)
    assert worst_z <= worst_n // 2, (worst_z, worst_n, len(zb))
    assert hits(zb, qx=qx, qy=qy) <= len(zb) // 4


def test_table_checksum_delimiter_injection_closed(spark):
    """The review-found false-equality: ('a|b', 'c') and
    ('a', 'b|c') serialize identically under a bare join — the
    length-prefixed tokens must give them different digests; NULL
    and the literal strings 'N'/' NULL' must also stay distinct."""
    from database_activity_monitoring_dam_system_spark.operators import (
        validate,
    )

    a = spark.createDataFrame([("a|b", "c")], "x STRING, y STRING")
    b = spark.createDataFrame([("a", "b|c")], "x STRING, y STRING")
    assert tuple(validate.table_checksum(a).first()) != tuple(
        validate.table_checksum(b).first()
    )
    n1 = spark.createDataFrame([(None, "z")], "x STRING, y STRING")
    n2 = spark.createDataFrame([("N", "z")], "x STRING, y STRING")
    n3 = spark.createDataFrame([(" NULL", "z")], "x STRING, y STRING")
    digests = {
        tuple(validate.table_checksum(f).first()) for f in (n1, n2, n3)
    }
    assert len(digests) == 3


def test_bm25_persisted_handle_releases(spark):
    """The persisted_out escape hatch must actually release storage:
    a localCheckpoint-based handle made unpersist() a silent no-op
    (review-found), so pin that the handed-out frame is CACHED while
    scores compute and FREED after unpersist()."""
    from database_activity_monitoring_dam_system_spark.operators import (
        invindex,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    handles: list = []
    scores = invindex.bm25_scores(
        docs, ["dup", "merge"], persisted_out=handles
    )
    assert scores.count() > 0
    (handle,) = handles
    assert handle.storageLevel.useMemory or handle.storageLevel.useDisk
    handle.unpersist(blocking=True)
    assert not (
        handle.storageLevel.useMemory or handle.storageLevel.useDisk
    )


def test_capped_index_refuses_pruned_term_queries(spark):
    """A df-capped index stamps its caps (_min_df/_max_df); a
    conjunctive query containing a term MISSING from a capped index
    raises — pruned and absent are indistinguishable there, and
    treating a stop-listed term as absent returns an empty result
    even though every doc contains it. Surviving-term queries answer
    normally; uncapped indexes keep the plain missing→empty
    contract."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        invindex,
    )

    docs = spark.createDataFrame(
        [
            (1, "the alpha system"),
            (2, "the beta system"),
            (3, "the alpha protocol"),
            (4, "the gamma run"),
        ],
        "doc_id long, text string",
    )
    capped = invindex.build_postings(docs, max_df=3)  # prunes 'the'
    assert {"_min_df", "_max_df"} <= set(capped.columns)
    # 'the' is in EVERY doc but was pruned — refusing beats an
    # empty answer that contradicts brute-force containment
    with _pytest.raises(ValueError, match="df caps.*the"):
        invindex.search_all_terms(capped, ["alpha", "the"])
    hits = sorted(
        r.doc_id
        for r in invindex.search_all_terms(capped, ["alpha"]).collect()
    )
    assert hits == [1, 3]
    # uncapped: absence IS absence — empty result, no stamps, no raise
    plain = invindex.build_postings(docs)
    assert "_min_df" not in plain.columns
    assert invindex.search_all_terms(plain, ["nonexistent"]).count() == 0
    # stamps survive the save/load round-trip so SERVED capped
    # indexes keep the guard too
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        invindex.save_postings(capped, d + "/idx", n_docs=4)
        loaded = invindex.load_postings(spark, d + "/idx", expect_docs=4)
        with _pytest.raises(ValueError, match="df caps"):
            invindex.search_all_terms(loaded, ["the"])


def test_zorder_rank_key_null_and_empty_guards(spark):
    """NULL dimension values and empty/all-NULL dimensions fail with
    named errors instead of TypeError/ZeroDivisionError deep in the
    grid cumulation (the inner grid-map join would otherwise also
    silently DROP the NULL rows from the keyed output)."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        zorder,
    )

    with_nulls = spark.createDataFrame(
        [(1, 10, 100), (2, None, 200), (3, 30, 300)],
        "id long, x int, y int",
    )
    with _pytest.raises(ValueError, match="'x' contains NULL"):
        zorder.zorder_rank_key(
            with_nulls, "x", "y", bits=8, x_lo=0, x_hi=100,
            y_lo=0, y_hi=1000,
        )
    empty = spark.createDataFrame([], "id long, x int, y int")
    with _pytest.raises(ValueError, match="'x' is empty or all-NULL"):
        zorder.zorder_rank_key(empty, "x", "y", bits=8)
    all_null_y = spark.createDataFrame(
        [(1, 10, None), (2, 20, None)], "id long, x int, y int"
    )
    with _pytest.raises(ValueError, match="'y' is empty or all-NULL"):
        zorder.zorder_rank_key(all_null_y, "x", "y", bits=8)
    # clean input still keys fine under explicit bounds
    clean = with_nulls.filter("x IS NOT NULL")
    out = zorder.zorder_rank_key(
        clean, "x", "y", bits=8, x_lo=0, x_hi=100, y_lo=0, y_hi=1000
    )
    assert out.count() == 2 and "zkey" in out.columns


def test_bloom_merge_propagates_uncounted_sentinel(spark):
    """Merging a with_count=False bitmap (n_values = -1 sentinel)
    must not sum the sentinel into a nonsense understated bound —
    the merge is uncounted (-1) unless BOTH sides counted; the
    merged BITMAP stays exact for the union either way."""
    from database_activity_monitoring_dam_system_spark.operators import (
        sketches,
    )

    a = spark.createDataFrame([("x",), ("y",)], "v string")
    b = spark.createDataFrame([("z",), ("y",)], "v string")
    counted_a = sketches.bloom_bitmap(a, "v", k=3, m_bits=4096)
    counted_b = sketches.bloom_bitmap(b, "v", k=3, m_bits=4096)
    uncounted_b = sketches.bloom_bitmap(
        b, "v", k=3, m_bits=4096, with_count=False
    )
    assert uncounted_b.first().n_values == -1
    both = sketches.bloom_merge(counted_a, counted_b).first()
    assert both.n_values == 4  # na + nb upper bound
    mixed = sketches.bloom_merge(counted_a, uncounted_b).first()
    assert mixed.n_values == -1
    flipped = sketches.bloom_merge(uncounted_b, counted_a).first()
    assert flipped.n_values == -1
    # the bitmap itself is the exact OR regardless of count mode
    assert mixed.bitmap == both.bitmap
    probe = spark.createDataFrame([("x",), ("y",), ("z",)], "v string")
    merged_df = sketches.bloom_merge(counted_a, uncounted_b)
    got = {
        r.v: r.maybe_member
        for r in sketches.bloom_probe(probe, merged_df, "v").collect()
    }
    assert got == {"x": True, "y": True, "z": True}


def test_incremental_index_artifact_roundtrip(spark, tmp_path):
    """update_postings_artifact folds an added/changed/removed
    snapshot delta into the persisted index: the merged artifact is
    row-identical to a fresh build over the new corpus, a served
    search over it answers exactly as a fresh search, the stamp
    check refuses a drifted artifact, and capped indexes refuse the
    incremental path outright."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        invindex,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )
    old = (
        docs.filter(F.col("doc_id") % 10 != 3)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 7,
                F.concat(F.col("text"), F.lit(" vanishingtoken")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 1).select(
                (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                F.lit("ephemeral snapshot row").alias("text"),
            )
        )
    )
    n_old, n_new = old.count(), docs.count()
    path = str(tmp_path / "idx")
    invindex.save_postings(
        invindex.build_postings(old), path, n_docs=n_old
    )
    # drifted-stamp refusal: the claimed old corpus (10 docs) does
    # not match the artifact's n_old stamp
    with _pytest.raises(ValueError, match="rebuild the index"):
        invindex.update_postings_artifact(
            spark, path, docs.limit(10), docs, n_docs=n_new
        )
    invindex.update_postings_artifact(
        spark, path, old, docs, n_docs=n_new
    )
    merged = invindex.load_postings(spark, path, expect_docs=n_new)
    fresh = invindex.build_postings(docs)

    def canon(df):
        return sorted(
            (r.token, r.df, tuple(r.postings)) for r in df.collect()
        )

    assert canon(merged) == canon(fresh)
    # the vanished token (changed docs' old text) must be gone, and
    # no ephemeral doc id may survive anywhere
    assert merged.filter(F.col("token") == "vanishingtoken").count() == 0
    assert (
        merged.select(F.explode("postings").alias("d"))
        .filter(F.col("d") >= 10_000_000)
        .count()
        == 0
    )
    # served search over the merged artifact ≡ fresh search
    terms = ["dup", "merge"]
    served = sorted(
        r.doc_id
        for r in invindex.search_docs(docs, merged, terms).collect()
    )
    fresh_hits = sorted(
        r.doc_id
        for r in invindex.search_docs(docs, fresh, terms).collect()
    )
    assert served == fresh_hits and served
    # capped indexes cannot be incrementally repaired
    capped = invindex.build_postings(docs, min_df=2)
    with _pytest.raises(ValueError, match="df caps"):
        invindex.update_postings(capped, old, docs)


def test_quantile_serving_paths_error_bounds(spark):
    """The three quantile estimators' promised bounds, asserted
    against the TRUE exact percentiles: the grid edge sits within one
    bin width BELOW the truth, the interpolated estimate within one
    bin width either side, and the GK sketch's value has rank within
    n/accuracy of the target rank. Also: interp over the SAME
    partials as the grid path (one partials build serves both)."""
    import math

    import pyspark.sql.functions as F

    from database_activity_monitoring_dam_system_spark.operators import (
        rollup,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, "/root/testdata/sf0.01", "events")
    lo, hi, bins = 0.0, 500.0, 200
    bin_w = (hi - lo) / bins
    kw = dict(lo=lo, hi=hi, bins=bins)
    minute = rollup.value_quantile_partials(events, grain="minute", **kw)
    grid = {
        r.bucket_ts: r
        for r in rollup.rollup_quantiles(
            minute, to_grain="day", percents=(50, 90, 99), **kw
        ).collect()
    }
    interp = {
        r.bucket_ts: r
        for r in rollup.rollup_quantiles_interp(
            minute, to_grain="day", percents=(50, 90, 99), **kw
        ).collect()
    }
    accuracy = 1000
    gk = {
        r.bucket_ts: r
        for r in rollup.quantiles_gk(
            events, grain="day", percents=(50, 90, 99),
            accuracy=accuracy,
        ).collect()
    }
    # true exact percentiles per day (Spark's exact percentile over
    # the SAME millis quantization the partials use)
    truth = {
        r.bucket_ts: r
        for r in events.filter(F.col("value").isNotNull())
        .select(
            F.date_trunc("day", "ts").alias("bucket_ts"),
            (F.floor(F.col("value") * 1000) / 1000.0).alias("v"),
            F.col("value").alias("raw"),
        )
        .groupBy("bucket_ts")
        .agg(
            *[
                F.expr(
                    f"percentile(v, CAST({p} AS DOUBLE)"
                    " / CAST(100 AS DOUBLE))"
                ).alias(f"t{p}")
                for p in (50, 90, 99)
            ],
            F.sort_array(F.collect_list("v")).alias("vals"),
            # GK consumes the RAW values (no millis quantization) and
            # rounds its answer to 6 decimals — rank-check against
            # the raw list with a rounding-tolerant bracket
            F.sort_array(F.collect_list("raw")).alias("rvals"),
        )
        .collect()
    }
    assert grid and set(grid) == set(interp) == set(gk) == set(truth)
    for day, t in truth.items():
        n = len(t.vals)
        for p in (50, 90, 99):
            tv = t[f"t{p}"]
            ge = grid[day][f"p{p}_value"]
            iv = interp[day][f"p{p}_interp"]
            gv = gk[day][f"p{p}_gk"]
            # the grid estimator answers a DIFFERENT rank definition
            # (value at 1-indexed rank ceil(p·n/100), snapped to its
            # bin's lower edge) — in a sparse tail that rank's value
            # can sit many units from the interpolated percentile, so
            # its bound is against ITS OWN rank's value: the edge's
            # bin contains it
            v_rank = t.vals[math.ceil(p * n / 100) - 1]
            assert ge - 1e-9 <= v_rank <= ge + bin_w + 1e-9, (
                day, p, ge, v_rank,
            )
            # interpolation: within one bin width either side
            assert abs(iv - tv) <= bin_w, (day, p, iv, tv)
            # GK: the returned value's RANK is within n/accuracy + 1
            # of the target rank (the sketch's actual guarantee —
            # value distance depends on local density)
            target = math.floor(p / 100 * (n - 1))
            import bisect

            r_lo = bisect.bisect_left(t.rvals, gv - 1e-6)
            r_hi = bisect.bisect_right(t.rvals, gv + 1e-6) - 1
            tol = n / accuracy + 1
            assert r_lo - tol <= target <= r_hi + tol, (
                day, p, gv, target, r_lo, r_hi, n,
            )


def test_zorder_nd_key_interleaves_and_validates(spark):
    """The k-D Morton key is an exact round-robin interleave: decode
    bit i·k+j back to dimension j's grid coordinate and recover the
    inputs; k=2 agrees with the dedicated 2-D generator; the BIGINT
    bit-budget and dimension-count guards refuse out-of-range
    geometry."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        zorder,
    )

    bits, k = 5, 3
    dims = [("a", 0, 31), ("b", 0, 31), ("c", 0, 31)]
    rows = [(3, 17, 30), (0, 0, 0), (31, 31, 31), (1, 2, 4)]
    df = spark.createDataFrame(rows, "a int, b int, c int")
    keyed = df.select(
        "a", "b", "c",
        zorder.zorder_nd_key(dims, bits=bits).alias("z"),
    ).collect()
    for r in keyed:
        # de-interleave: bit position p carries dimension p % k
        coords = [0, 0, 0]
        for p in range(bits * k):
            coords[p % k] |= ((r.z >> p) & 1) << (p // k)
        # lo=0, hi=31, bits=5 → the grid coord IS the value
        assert coords == [r.a, r.b, r.c], (r, coords)
    # k=2 reduces to the dedicated 2-D generator exactly
    two = zorder.zorder_sql(
        "x", "y", x_lo=0, x_hi=1023, y_lo=0, y_hi=499_999,
        bits=10, duck=True,
    )
    nd = zorder.zorder_nd_sql(
        [("x", 0, 1023), ("y", 0, 499_999)], bits=10, duck=True
    )
    assert two == nd
    with _pytest.raises(ValueError, match="need >= 2"):
        zorder.zorder_nd_sql([("a", 0, 1)], bits=4)
    with _pytest.raises(ValueError, match="BIGINT key budget"):
        zorder.zorder_nd_sql(dims, bits=21)  # 63 bits


def test_edit_distance_pairs_lossless_and_degenerate_paths(spark):
    """PassJoin segment filter ≡ brute-force all-pairs at d=1..3 over
    adversarial strings (empty, single-char, shorter-than-segment,
    equal-length, planted near-dups) — the pigeonhole window and the
    short-pool seam both exercised."""
    import itertools
    import random

    from database_activity_monitoring_dam_system_spark.operators import (
        dedup,
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    random.seed(7)
    rows = [
        (i, "".join(random.choice("abc") for _ in range(random.randint(1, 12))))
        for i in range(120)
    ]
    rows += [
        (200, "hello world xyz"),
        (201, "hello w0rld xyz"),
        (202, "hello w0rld xyzq"),
        (203, "ab"),
        (204, "a"),
        (205, ""),  # empty keys are excluded by contract
    ]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    for d in (1, 2, 3):
        got = sorted(
            (r.doc_a, r.doc_b, r.dist)
            for r in dedup.edit_distance_pairs(df, max_dist=d).collect()
        )
        want = sorted(
            (a, b, lev(ka, kb))
            for (a, ka), (b, kb) in itertools.combinations(
                [r for r in rows if r[1]], 2
            )
            if lev(ka, kb) <= d
        )
        assert got == want, f"d={d}: {len(got)} vs {len(want)}"


def test_band_table_artifact_roundtrip_and_stamps(spark, tmp_path):
    """save/load_band_table stamp corpus size AND LSH geometry;
    update_minhash_bands folds a delta into the loaded artifact
    identically to a fresh build, and candidate pairs served from
    the merged table equal fresh candidates; mismatched geometry or
    corpus stamps refuse."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        dedup,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )
    old = docs.filter(F.col("doc_id") % 10 != 3)
    k, b, sh = 16, 4, 3

    def build(frame):
        return dedup.minhash_bands(
            dedup.minhash_signatures_md5(
                dedup.token_arrays(frame, shingle=sh), num_hashes=k
            ),
            num_hashes=k,
            bands=b,
            hex_buckets=True,
        )

    n_old = old.count()
    path = str(tmp_path / "bands")
    dedup.save_band_table(
        build(old), path, n_docs=n_old, num_hashes=k, bands=b, shingle=sh
    )
    with _pytest.raises(ValueError, match="num_hashes"):
        dedup.load_band_table(spark, path, num_hashes=32)
    with _pytest.raises(ValueError, match="document count"):
        dedup.load_band_table(spark, path, expect_docs=n_old + 1)
    # the hash FAMILY is part of the artifact identity: a different
    # signature family or bucket derivation is a disjoint bucket
    # space — refused by stamp, not by silent union
    with _pytest.raises(ValueError, match="signature family"):
        dedup.load_band_table(spark, path, sig_family="xxhash64")
    with _pytest.raises(ValueError, match="hex_buckets"):
        dedup.load_band_table(spark, path, hex_buckets=False)
    # a zero-row artifact cannot verify ANY requested stamp — refuse
    empty_path = str(tmp_path / "empty_bands")
    dedup.save_band_table(
        build(docs.filter(F.lit(False))), empty_path,
        n_docs=0, num_hashes=k, bands=b, shingle=sh,
    )
    with _pytest.raises(ValueError, match="no rows to"):
        dedup.load_band_table(spark, empty_path, expect_docs=n_old)
    # a PARTIALLY-stamped artifact (older writer dropped a stamp
    # column) cannot pass a check it cannot verify — refuse by name,
    # don't skip the missing dimension
    partial_path = str(tmp_path / "partial_bands")
    spark.read.parquet(path).drop("_sig_family").write.parquet(
        partial_path
    )
    with _pytest.raises(ValueError, match="carries no _sig_family"):
        dedup.load_band_table(spark, partial_path, sig_family="md5")
    loaded = dedup.load_band_table(
        spark, path, expect_docs=n_old, num_hashes=k, bands=b, shingle=sh
    )
    # keep_stamps carries the hash identity through to the fold, and
    # update_minhash_bands re-asserts it itself: a fold whose
    # parameters contradict the carried stamps refuses instead of
    # silently unioning disjoint bucket spaces
    stamped_loaded = dedup.load_band_table(
        spark, path, sig_family="md5", keep_stamps=True
    )
    with _pytest.raises(ValueError, match="contradicts"):
        dedup.update_minhash_bands(
            stamped_loaded, old, docs, num_hashes=32, bands=b, shingle=sh
        )
    # ...and the STALENESS half: a fold whose old_docs has drifted
    # from the corpus the table was stamped over refuses too
    with _pytest.raises(ValueError, match="_n_docs"):
        dedup.update_minhash_bands(
            stamped_loaded, old.limit(n_old - 5), docs,
            num_hashes=k, bands=b, shingle=sh,
        )
    merged_stamped = dedup.update_minhash_bands(
        stamped_loaded, old, docs, num_hashes=k, bands=b, shingle=sh
    )
    merged = dedup.update_minhash_bands(
        loaded, old, docs, num_hashes=k, bands=b, shingle=sh
    )
    fresh = build(docs)

    def canon(df):
        return sorted(map(tuple, df.select("doc_id", "band_id", "bucket").collect()))

    assert canon(merged) == canon(fresh)
    assert canon(merged_stamped) == canon(fresh)


def test_bm25_artifact_serves_and_folds_deltas(spark, tmp_path):
    """The persisted BM25 stats artifact (doc_id, dl, tf map) serves
    bit-identical scores to a fresh bm25_scores — the corpus is never
    re-tokenized at query time — and update_bm25_artifact folds an
    add/change/remove delta so the artifact keeps serving the fresh
    answer (idf/Σdl/N constants included). Staleness and zero-row
    artifacts refuse."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        invindex,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )
    old = docs.filter(F.col("doc_id") % 7 != 3)
    terms = ["dup", "merge", "spark"]
    n_old = old.count()
    path = str(tmp_path / "bm25_stats")
    invindex.save_bm25_stats(
        invindex.build_bm25_stats(old), path, n_docs=n_old
    )

    def canon(df):
        return sorted(map(tuple, df.select("doc_id", "score").collect()))

    stats, n_served = invindex.load_bm25_stats(
        spark, path, expect_docs=n_old
    )
    assert n_served == n_old
    served = invindex.bm25_from_stats(stats, terms, n_docs=n_served)
    assert canon(served) == canon(invindex.bm25_scores(old, terms))
    # delta: remove some docs, change others (text edit shifts tf/dl),
    # add new ones — all three verdicts exercised
    removed = old.filter(F.col("doc_id") % 11 == 5)
    changed = old.filter(F.col("doc_id") % 11 == 6).select(
        "doc_id", F.concat(F.col("text"), F.lit(" merge spark")).alias("text")
    )
    added = docs.filter(F.col("doc_id") % 7 == 3).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    new = (
        old.join(removed.select("doc_id"), "doc_id", "left_anti")
        .join(changed.select("doc_id"), "doc_id", "left_anti")
        .unionByName(changed)
        .unionByName(added)
    )
    n_new = new.count()
    assert n_new != n_old
    # drifted artifact refuses to serve the new corpus...
    with _pytest.raises(ValueError, match="corpus now has"):
        invindex.load_bm25_stats(spark, path, expect_docs=n_new)
    # ...and the fold brings it current: artifact ≡ fresh, exactly
    invindex.update_bm25_artifact(spark, path, old, new)
    stats2, n2 = invindex.load_bm25_stats(spark, path, expect_docs=n_new)
    assert n2 == n_new
    assert canon(
        invindex.bm25_from_stats(stats2, terms, n_docs=n2)
    ) == canon(invindex.bm25_scores(new, terms))
    # the folded stats ROWS equal a fresh build too (not just scores
    # for these terms — any future query serves identically)
    fresh = invindex.build_bm25_stats(new)

    def rows(df):
        return sorted(
            (r.doc_id, r.dl, tuple(sorted(r.tf_map.items())))
            for r in df.collect()
        )

    assert rows(stats2) == rows(fresh)
    # a zero-row artifact has no readable stamp — refuse
    empty_path = str(tmp_path / "empty_stats")
    invindex.save_bm25_stats(
        invindex.build_bm25_stats(docs.filter(F.lit(False))),
        empty_path, n_docs=0,
    )
    with _pytest.raises(ValueError, match="no rows"):
        invindex.load_bm25_stats(spark, empty_path)
    # absent-everywhere terms serve the empty frame from the artifact
    # exactly like the fresh path
    assert canon(
        invindex.bm25_from_stats(
            stats2, ["zzzznotaterm"], n_docs=n2
        )
    ) == canon(invindex.bm25_scores(new, ["zzzznotaterm"]))


# --------------------------------------------------------- robust anomalies


def test_robust_baseline_resists_burst_masking(spark):
    """The defining property: a user whose history contains a few
    huge burst hours gets a stddev baseline inflated enough to mask
    a fresh burst, while the median/MAD baseline (50% breakdown)
    still flags it. Exact med/MAD values are pinned."""
    from database_activity_monitoring_dam_system_spark.operators import anomaly

    # 12 quiet hours of 5 queries, 2 historical bursts of 200 —
    # then the hour under test repeats a 200-query burst
    rows = []
    aid = 0
    for h in range(12):
        for _ in range(5):
            rows.append((aid, 7, f"2024-03-01 {h:02d}:10:00")); aid += 1
    for h, n in ((12, 200), (13, 200), (14, 200)):
        for _ in range(n):
            rows.append((aid, 7, f"2024-03-01 {h:02d}:20:00")); aid += 1
    from pyspark.sql import functions as F

    act = spark.createDataFrame(
        rows, "activity_id long, user_id long, ts string"
    ).select(
        "activity_id", "user_id",
        F.to_timestamp("ts").alias("access_timestamp"),
    )

    robust = anomaly.user_hourly_robust_baseline(act).first()
    # 12×5 + 3×200 → median 5, deviations {0×12, 195×3} → MAD 0 → min
    assert robust["med_queries"] == 5.0
    assert robust["mad_queries"] == 0.0

    flagged = anomaly.robust_volume_anomalies(act)
    got = {r["hour_bucket"].hour for r in flagged.collect()}
    assert {12, 13, 14} <= got  # bursts flagged (5 + 4.4478·1 < 200)

    # the mean/σ detector is masked: baseline avg=44, σ≈77.7 →
    # threshold ≈ 277 > 200, so it flags NOTHING
    classic = anomaly.volume_anomalies(act)
    assert classic.count() == 0


def test_robust_baseline_exact_quarter_grain(spark):
    """Even-count medians interpolate to exact .5 / .25 multiples —
    the cross-engine exactness the gate's hash relies on."""
    from pyspark.sql import functions as F

    from database_activity_monitoring_dam_system_spark.operators import anomaly

    rows = []
    aid = 0
    # counts per hour: 1, 2, 4, 8 → median 3.0; devs {2,1,1,5} → MAD 1.5
    for h, n in ((0, 1), (1, 2), (2, 4), (3, 8)):
        for _ in range(n):
            rows.append((aid, 1, f"2024-03-02 {h:02d}:00:30")); aid += 1
    act = spark.createDataFrame(
        rows, "activity_id long, user_id long, ts string"
    ).select(
        "activity_id", "user_id",
        F.to_timestamp("ts").alias("access_timestamp"),
    )
    b = anomaly.user_hourly_robust_baseline(act).first()
    assert b["med_queries"] == 3.0
    assert b["mad_queries"] == 1.5


def test_html_extract_literal_cases(spark):
    """Literal extraction expectations: script/style CONTENT vanishes
    (including a fake closing tag inside a JS string and a bare '<'),
    block tags break lines, inline tags become spaces, entities
    decode in the pinned order (&amp;lt; → '&lt;' exactly once), and
    whitespace collapses."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    html = (
        '<html><head><style>b{x:1}</style>'
        '<script>var s = "</div>"; if (1 < 2) go();</script></head>'
        '<body><!-- c --><h1>Title</h1>'
        '<p>one   two</p><p>a <b>bold</b> word</p>'
        '<p>5 &lt; 6 &amp;&amp; 7 &gt; 2</p>'
        '<p>&amp;lt; stays encoded</p></body></html>'
    )
    docs = spark.createDataFrame([(1, html)], "doc_id long, html string")
    row = textops.html_extract_text(docs).first()
    assert row["text"] == (
        "Title\none two\na bold word\n5 < 6 && 7 > 2\n&lt; stays encoded"
    )
    assert row["n_chars"] == len(row["text"])
    # nothing from script/style leaked
    assert "go()" not in row["text"] and "x:1" not in row["text"]


def test_ivf_update_assignments_fold_and_stamp(spark):
    """Fold ≡ fresh re-assign across all delta classes, and a stamped
    table built under DIFFERENT centroids is refused loudly."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import similarity

    def vec(seed, bump=0.0):
        return [float((seed * 7 + j * 3) % 11) + (bump if j == 0 else 0.0)
                for j in range(8)]

    old = spark.createDataFrame(
        [(i, vec(i)) for i in range(12)] + [(99, vec(99))],
        "vec_id long, embedding array<float>",
    )
    new = spark.createDataFrame(
        # 0-11 kept, but 5 and 7 changed; 99 removed; 20 added
        [(i, vec(i, 1.0 if i in (5, 7) else 0.0)) for i in range(12)]
        + [(20, vec(20))],
        "vec_id long, embedding array<float>",
    )
    cents = similarity.ivf_centroids(old, n_centroids=4, refine_iters=0)
    old_assign = similarity.stamp_ivf_assignments(
        similarity.ivf_assignments(old, cents), cents
    )
    folded = similarity.ivf_update_assignments(old_assign, old, new, cents)
    fresh = similarity.ivf_assignments(new, cents)
    canon = lambda df: sorted(
        (r["vec_id"], r["cent_id"], tuple(r["vec"]), r["n_norm"])
        for r in df.drop(similarity.IVF_ASSIGN_STAMP).collect()
    ) if similarity.IVF_ASSIGN_STAMP in df.columns else sorted(
        (r["vec_id"], r["cent_id"], tuple(r["vec"]), r["n_norm"])
        for r in df.collect()
    )
    assert canon(folded) == canon(fresh)
    # the fold re-stamped its output with the same quantizer
    stamps = {r[0] for r in folded.select(similarity.IVF_ASSIGN_STAMP).distinct().collect()}
    assert stamps == {similarity._cent_fingerprint(cents)}

    other = similarity.ivf_centroids(new, n_centroids=3, refine_iters=0)
    with _pytest.raises(ValueError, match="does not match"):
        similarity.ivf_update_assignments(old_assign, old, new, other)

    # an UNSTAMPED old table is refused by default (it cannot be
    # verified against the fold's centroids)...
    unstamped = similarity.ivf_assignments(old, cents)
    with _pytest.raises(ValueError, match="quantizer stamp"):
        similarity.ivf_update_assignments(unstamped, old, new, cents)
    # ...and the explicit override still folds correctly
    loose = similarity.ivf_update_assignments(
        unstamped, old, new, cents, allow_unstamped=True
    )
    assert canon(loose) == canon(fresh)
    # same contract on the serving path: caller-supplied unstamped
    # assignments are refused, stamped ones serve
    with _pytest.raises(ValueError, match="quantizer stamp"):
        similarity.ivf_topk(
            new, [0], k=2, centroids=cents, assignments=unstamped
        )
    served = similarity.ivf_topk(
        new, [0], k=2, centroids=cents, assignments=folded
    )
    assert served.count() > 0


def test_k_anonymity_semantics(spark):
    """Classes below k surface with their sizes; classes at or above
    k do not; NULL quasi values form their own class."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    rows = (
        [(i, "US", "A") for i in range(5)]     # safe class (k=3)
        + [(90, "DE", "B"), (91, "DE", "B")]   # risky: size 2
        + [(95, None, "C")]                    # risky NULL class: 1
    )
    df = spark.createDataFrame(rows, "id long, geo string, seg string")
    got = {
        (r["geo"], r["seg"]): r["class_size"]
        for r in textops.k_anonymity_report(
            df, quasi_cols=["geo", "seg"], k=3
        ).collect()
    }
    assert got == {("DE", "B"): 2, (None, "C"): 1}


# ------------------------------------------------------ residual IVF-PQ


def _clustered_corpus(spark, n=360, d=64, ktrue=12):
    """Deterministic cluster-structured corpus (md5 noise around 12
    well-separated axis centers, ids sorted by cluster) — residual
    encoding's home turf, and the same construction the refined-
    quantizer test uses. Uniform-random embeddings have no coarse
    structure for residuals to subtract, which is why these tests
    build structure instead of using the random testdata corpus."""
    import hashlib

    rows = []
    for i in range(n):
        c = (i * ktrue) // n
        h = hashlib.md5(f"p{i}".encode()).digest()
        vec = [
            ((h[j % len(h)] / 255.0) - 0.5) * 4.0 + (10.0 if j == c else 0.0)
            for j in range(d)
        ]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_residual_pq_lowers_distortion(spark):
    """The claim residual encoding makes (Jégou et al. §V / the FAISS
    IndexIVFPQ default): quantizing v − centroid(v) against
    residual-trained codebooks reconstructs with LOWER squared error
    than raw-PQ at the SAME m×ksub code budget. Measured here by full
    reconstruction MSE (decode = coarse centroid + codebook entries):
    99.9 raw vs 71.4 residual on the clustered fixture."""
    import numpy as np

    emb = _clustered_corpus(spark)
    d, m, dsub = 64, 4, 16
    cents = similarity.ivf_centroids(emb, n_centroids=16, refine_iters=2)
    books_raw = similarity.pq_train(emb, m=m, ksub=16, iters=2, dim=d)
    books_res = similarity.pq_train_residual(
        emb, cents, m=m, ksub=16, iters=2, dim=d
    )
    V = {
        r.vec_id: np.array(r.v)
        for r in emb.selectExpr(
            "vec_id", "cast(embedding as array<double>) v"
        ).collect()
    }
    R = {
        r.vec_id: (r.cent_id, np.array(r.rv))
        for r in similarity.ivf_residuals(emb, cents).collect()
    }
    C = {c[0]: np.array(c[1]) for c in cents}

    def decode(books, x):
        out = []
        for j in range(m):
            sl = x[j * dsub : (j + 1) * dsub]
            B = np.array(books[j])
            out.append(B[np.argmin(((B - sl) ** 2).sum(1))])
        return np.concatenate(out)

    mse_raw = np.mean(
        [np.sum((V[i] - decode(books_raw, V[i])) ** 2) for i in V]
    )
    mse_res = np.mean(
        [
            np.sum((V[i] - (C[R[i][0]] + decode(books_res, R[i][1]))) ** 2)
            for i in V
        ]
    )
    assert mse_res < 0.85 * mse_raw, (mse_raw, mse_res)
    # residuals really are the arithmetic they claim: v - c(v)
    some = next(iter(V))
    np.testing.assert_allclose(R[some][1], V[some] - C[R[some][0]])


def test_residual_ivf_pq_recall_beats_raw_on_clustered_data(spark):
    """End-to-end payoff: at equal code bytes and equal probe width,
    residual ADC recovers more of the true cosine top-k than raw ADC
    on the clustered fixture (measured 0.57 vs 0.45)."""
    emb = _clustered_corpus(spark)
    d = 64
    qids = list(range(0, 360, 36))
    cents = similarity.ivf_centroids(emb, n_centroids=16, refine_iters=2)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    raw = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_pq_topk(
            emb, qids, k=10, dim=d, centroids=cents,
            codebooks=similarity.pq_train(emb, m=4, ksub=16, iters=2, dim=d),
        ).collect()
    }
    res = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_pq_topk_residual(
            emb, qids, k=10, dim=d, centroids=cents,
            codebooks=similarity.pq_train_residual(
                emb, cents, m=4, ksub=16, iters=2, dim=d
            ),
        ).collect()
    }
    r_raw = len(raw & exact) / len(exact)
    r_res = len(res & exact) / len(exact)
    assert r_res > r_raw, (r_raw, r_res)
    assert r_res >= 0.5, r_res


def test_residual_encoded_artifact_roundtrip_and_stamp_refusal(spark):
    """Serving posture: a stamped ivf_pq_encode_residual artifact
    passed back via encoded= reproduces the in-line answer without
    re-scanning raw vectors; the same artifact under the WRONG
    codebooks (raw-trained) is refused loudly by the stamp."""
    import pytest as _pytest

    emb = _clustered_corpus(spark, n=120)
    d = 64
    cents = similarity.ivf_centroids(emb, n_centroids=8, refine_iters=1)
    books = similarity.pq_train_residual(
        emb, cents, m=4, ksub=8, iters=1, dim=d
    )
    codes = similarity.stamp_index(
        similarity.ivf_pq_encode_residual(
            emb, centroids=cents, codebooks=books, dim=d
        ),
        codebooks=books,
        centroids=cents,
    )
    inline = similarity.ivf_pq_topk_residual(
        emb, [0, 1], k=5, dim=d, centroids=cents, codebooks=books,
        n_centroids=8, n_probe=4,
    )
    served = similarity.ivf_pq_topk_residual(
        emb, [0, 1], k=5, dim=d, centroids=cents, codebooks=books,
        encoded=codes, n_centroids=8, n_probe=4,
    )
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(inline) == canon(served)
    wrong_books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=d)
    with _pytest.raises(ValueError, match="different codebooks"):
        similarity.ivf_pq_topk_residual(
            emb, [0, 1], k=5, dim=d, centroids=cents,
            codebooks=wrong_books, encoded=codes,
            n_centroids=8, n_probe=4,
        ).collect()


def _near_dup_corpus(spark, n_base, n_dups, dim=64):
    """Deterministic corpus with ``n_dups`` planted near-copies
    (cosine ≈ 1) of the first ``n_dups`` base vectors: dup of base i
    gets id n_base + i."""
    import hashlib

    rows = []
    for i in range(n_base):
        h = hashlib.md5(f"nd{i}".encode()).digest()
        v = [((h[(j * 7 + i) % 16] / 255.0) - 0.5) for j in range(dim)]
        rows.append((i, v))
    for i in range(n_dups):
        base = rows[i][1]
        rows.append((n_base + i, [x + 0.001 for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hyperplane_family_is_balanced_and_decorrelated():
    """Statistical pin on the LSH hyperplane family: per-plane sign
    balance and inter-plane correlation must stay within random
    bounds for 96 planes × 64 dims.  The pre-splitmix family (bit 16
    of a single-multiply linear mix) failed this badly — correlated
    planes collapsed 15-bit bands into ~17 K-vector mega-buckets at
    the sf10 probe (3.17 B candidates) — so this is the regression
    net for that class of bug: values are deterministic, bounds sit
    ~30 % above the measured family (|corr| max 0.435 ≈ 3.5σ for
    4.5 K pairs at σ = 1/√64)."""
    import numpy as np

    H = np.array([similarity._hyperplane(i, 64) for i in range(96)])
    assert set(np.unique(H)) == {-1.0, 1.0}
    # per-plane balance: mean |row mean| well under the 1/√64 σ
    assert np.abs(H.mean(axis=1)).mean() < 0.2
    corr = np.abs(np.corrcoef(H)) - np.eye(96)
    assert corr.max() < 0.6, corr.max()
    assert corr.mean() < 0.15, corr.mean()


def test_hyperplane_family_fingerprint_versions_artifacts():
    """Persisted LSH-derived artifacts are keyed under the hyperplane
    FAMILY fingerprint (round-11 advisor finding): a change to the
    sign family moves the emb_near_dups artifact path, so a stale
    artifact built under the old family is rebuilt instead of loading
    cleanly and silently disagreeing with fresh builds/oracles.  The
    fingerprint value is pinned so any future family change trips
    this test and is made consciously (and invalidates old paths by
    construction)."""
    import os
    from unittest import mock

    from database_activity_monitoring_dam_system_spark.plans import dam

    assert similarity.hyperplane_family_fingerprint() == "4058870a"
    with mock.patch.dict(os.environ, {"SPARK_DAM_INDEX_DIR": "/tmp/ix"}):
        p = dam._index_path("emb_near_dups", "/root/testdata/sf0.001")
        assert "_hp4058870a__" in p
        # corpus-pinned kinds carry no family token
        q = dam._index_path("dedup_clusters", "/root/testdata/sf0.001")
        assert "_hp" not in q


def test_lsh_near_dup_auto_banding_scales_and_recalls(spark):
    """The sf10 lesson wired in: lsh_near_dup_pairs sizes band bits
    from the corpus (auto_band_bits) so bucket occupancy — and with
    it candidate volume per vector — stays constant as N grows.
    (a) at a corpus where auto resolves wider than the fixed-8 gate
    plan, every planted near-dup pair (cosine ≈ 1) is still
    recovered; (b) at a corpus where auto resolves TO 8 bits, the
    auto and explicit plans return identical rows (the property that
    lets the oracle-pinned gate delegate to this operator)."""
    emb = _near_dup_corpus(spark, n_base=11_900, n_dups=100)
    assert similarity.auto_band_bits(12_000) > 8
    got = {
        (r.vec_a, r.vec_b)
        for r in similarity.lsh_near_dup_pairs(
            emb, threshold=0.999
        ).collect()
    }
    planted = {(i, 11_900 + i) for i in range(100)}
    assert planted <= got, planted - got

    small = _near_dup_corpus(spark, n_base=2_450, n_dups=50)
    assert similarity.auto_band_bits(2_500) == 8
    auto_rows = sorted(
        map(tuple, similarity.lsh_near_dup_pairs(
            small, threshold=0.999
        ).collect())
    )
    fixed_rows = sorted(
        map(tuple, similarity.lsh_near_dup_pairs(
            small, threshold=0.999, band_bits=8
        ).collect())
    )
    assert auto_rows == fixed_rows and len(auto_rows) >= 50


def test_opq_rotation_lowers_distortion_at_equal_bytes(spark):
    """The OPQ claim (Ge et al. CVPR 2013 / FAISS OPQMatrix): a
    learned orthogonal rotation before PQ lowers quantization
    distortion at the SAME m×ksub code budget.  On the clustered
    fixture: R orthogonal to 1e-9, reconstruction MSE 99.9 raw →
    80.1 rotated (−20 %), and the recall report's opq row ≥ the pq
    row on the same queries (0.44 vs 0.40 measured).  Training is
    deterministic (decimal-exact Lloyd sums + driver-side SVD of an
    order-independent aggregate), so a retrain reproduces the same
    rotation — the property the rows-only driver gate relies on."""
    import numpy as np

    emb = _clustered_corpus(spark)
    d, m, dsub = 64, 4, 16
    books_raw = similarity.pq_train(emb, m=m, ksub=16, iters=2, dim=d)
    rot, books_opq = similarity.pq_train_opq(
        emb, m=m, ksub=16, iters=2, opq_iters=3, dim=d
    )
    R = np.array(rot)
    assert np.allclose(R @ R.T, np.eye(d), atol=1e-9)
    V = np.array(
        [
            r.v
            for r in emb.selectExpr(
                "vec_id", "cast(embedding as array<double>) v"
            ).orderBy("vec_id").collect()
        ]
    )

    def mse(vecs, books):
        out = 0.0
        for xv in vecs:
            rec = []
            for j in range(m):
                sl = xv[j * dsub : (j + 1) * dsub]
                B = np.array(books[j])
                rec.append(B[np.argmin(((B - sl) ** 2).sum(1))])
            out += np.sum((xv - np.concatenate(rec)) ** 2)
        return out / len(vecs)

    m_raw = mse(V, books_raw)
    # rotated-space distortion == original-space distortion of the
    # rotated-back reconstruction (R orthogonal preserves L2)
    m_opq = mse(V @ R.T, books_opq)
    assert m_opq < 0.9 * m_raw, (m_raw, m_opq)

    rep = similarity.ann_recall_report(
        emb, [0, 30, 60, 90, 120], k=10, methods=("pq", "opq")
    )
    by = {r["method"]: r for r in rep}
    assert by["opq"]["recall_at_k"] >= by["pq"]["recall_at_k"], rep
    assert by["opq"]["n_expected"] == 50

    # retrain reproduces the identical artifact pair (determinism)
    rot2, books2 = similarity.pq_train_opq(
        emb, m=m, ksub=16, iters=2, opq_iters=3, dim=d
    )
    assert similarity.artifact_fingerprint(
        rot
    ) == similarity.artifact_fingerprint(rot2)
    assert similarity.artifact_fingerprint(
        books_opq
    ) == similarity.artifact_fingerprint(books2)


def test_ann_recall_report_includes_residual_method(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rep = similarity.ann_recall_report(
        emb, [0, 1, 2], k=5,
        methods=("ivf_pq", "ivf_pq_res", "opq", "opq_ivf_pq_res"),
    )
    assert [r["method"] for r in rep] == [
        "ivf_pq", "ivf_pq_res", "opq", "opq_ivf_pq_res"
    ]
    for r in rep:
        assert r["n_expected"] == 15 and 0 <= r["recall_at_k"] <= 1


def test_ivf_pq_res_update_codes_equals_full_reencode(spark):
    """Incremental residual-index refresh ≡ full re-encode under
    FIXED (quantizer, codebooks): carried (cent_id, codes) for
    value-identical vectors, fresh residual codes for changed/added,
    removed ids gone — and the fold refuses a quantizer mismatch even
    when the codebooks match (a residual code is relative to its
    coarse centroid)."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = similarity.ivf_centroids(emb, n_centroids=8, refine_iters=1)
    books = similarity.pq_train_residual(
        emb, cents, m=4, ksub=8, iters=1, dim=64
    )
    old = emb.filter(F.col("vec_id") % 10 != 0)
    new = emb.filter(F.col("vec_id") % 7 != 0).withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0,
            F.transform(
                F.col("embedding").cast("array<double>"), lambda x: x + 0.25
            ),
        ).otherwise(F.col("embedding").cast("array<double>")),
    )
    old_codes = similarity.stamp_index(
        similarity.ivf_pq_encode_residual(
            old, centroids=cents, codebooks=books, dim=64
        ),
        codebooks=books, centroids=cents,
    )
    handles = []
    updated = similarity.ivf_pq_res_update_codes(
        old_codes, old, new, centroids=cents, codebooks=books, dim=64,
        persisted_out=handles,
    )
    full = similarity.ivf_pq_encode_residual(
        new, centroids=cents, codebooks=books, dim=64
    )
    got = sorted(
        map(tuple, updated.drop(
            similarity.CODEBOOK_STAMP, similarity.QUANTIZER_STAMP
        ).collect())
    )
    assert got == sorted(map(tuple, full.collect()))
    assert all(i % 7 != 0 for i, *_ in got)
    # the refreshed table is re-stamped (serving can keep verifying)
    assert similarity.CODEBOOK_STAMP in updated.columns
    for h in handles:
        h.unpersist()
    other_cents = similarity.ivf_centroids(
        emb.withColumn(
            "embedding",
            F.transform(
                F.col("embedding").cast("array<double>"), lambda x: x + 1.0
            ),
        ),
        n_centroids=8, refine_iters=1,
    )
    with _pytest.raises(ValueError, match="quantizer"):
        similarity.ivf_pq_res_update_codes(
            old_codes, old, new, centroids=other_cents, codebooks=books,
            dim=64,
        ).collect()


def test_refine_recall_beats_adc_only(spark):
    """The refine stage's whole point: exact-cosine re-ranking of the
    ADC shortlist recovers recall the quantized distances lose. On
    the clustered fixture, refined recall must beat ADC-only top-k
    and approach the exhaustive answer (R=50 of 360 corpus rows)."""
    emb = _clustered_corpus(spark)
    d = 64
    qids = list(range(0, 360, 36))
    cents = similarity.ivf_centroids(emb, n_centroids=16, refine_iters=2)
    books = similarity.pq_train_residual(
        emb, cents, m=4, ksub=16, iters=2, dim=d
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_pq_topk_residual(
            emb, qids, k=10, dim=d, centroids=cents, codebooks=books
        ).collect()
    }
    refined = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_pq_refine_topk(
            emb, qids, k=10, rerank=50, dim=d,
            centroids=cents, codebooks=books,
        ).collect()
    }
    r_adc = len(adc & exact) / len(exact)
    r_ref = len(refined & exact) / len(exact)
    assert r_ref > r_adc, (r_adc, r_ref)
    assert r_ref >= 0.8, r_ref
    # the re-ranked output is exactly the exact-cosine order of the
    # shortlist: every refined hit carries the true cosine ordering
    # (rank 1..10, no adc column)
    cols = similarity.ivf_pq_refine_topk(
        emb, qids[:1], k=3, rerank=10, dim=d,
        centroids=cents, codebooks=books,
    ).columns
    assert cols == ["query_id", "neighbor_id", "rank", "cosine"]


def test_refine_degenerates_to_exact_when_unpruned(spark):
    """Invariant pinning the refine algebra: with the probe covering
    every list (n_probe = C) and a shortlist wider than the corpus,
    stage 1 passes everything through and the refine output must be
    EXACTLY cosine_topk — rank for rank, value for value."""
    emb = _clustered_corpus(spark, n=120)
    d = 64
    qids = [0, 5, 11]
    cents = similarity.ivf_centroids(emb, n_centroids=8, refine_iters=1)
    books = similarity.pq_train_residual(
        emb, cents, m=4, ksub=8, iters=1, dim=d
    )
    refined = similarity.ivf_pq_refine_topk(
        emb, qids, k=7, rerank=1000, n_probe=8, dim=d,
        centroids=cents, codebooks=books,
    )
    exact = similarity.cosine_topk(emb, qids, k=7)
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(refined) == canon(exact)


def test_source_containment_detects_subset_source(spark):
    """The directed matrix's reason to exist: a small dump whose
    union vocabulary sits inside a big crawl reads containment ≈ 1
    in that direction (and far less in reverse), while symmetric
    source Jaccard is near-blind to the relationship. With k ≥ the
    union sizes the sketch is the full set, so the values are exact
    set arithmetic."""
    big_vocab = [f"w{i}" for i in range(120)]
    rows = []
    # dumpA: 4 docs drawing only from big_vocab[:30]
    for i in range(4):
        rows.append((i, " ".join(big_vocab[i * 7 : i * 7 + 12]), "dumpA"))
    # crawlB: 10 docs covering all 120 words
    for i in range(10):
        rows.append(
            (100 + i, " ".join(big_vocab[i * 12 : (i + 1) * 12]), "crawlB")
        )
    # otherC: disjoint vocabulary
    for i in range(4):
        rows.append(
            (200 + i, " ".join(f"z{i}x{j}" for j in range(12)), "otherC")
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r.source_a, r.source_b): r.est_containment
        for r in dedup.source_containment_overlap(
            docs, k=1000, shingle=1
        ).collect()
    }
    assert got[("dumpA", "crawlB")] == 1.0     # dump ⊂ crawl, exactly
    assert got[("crawlB", "dumpA")] < 0.35     # reverse is small
    assert not any("otherC" in p for p in got) # disjoint → no rows
    jac = {
        (r.group_a, r.group_b): r.est_jaccard
        for r in dedup.source_minhash_overlap(
            docs, num_hashes=32, shingle=1
        ).collect()
    }
    key = ("crawlB", "dumpA") if ("crawlB", "dumpA") in jac else ("dumpA", "crawlB")
    assert jac[key] < 0.5  # the symmetric view underreads the subset


def test_source_containment_closure_equals_direct_window(spark):
    """The scale derivation (per-doc bottom-k sketches → distinct →
    per-group rank) must equal the direct definition (one rank over
    ALL distinct (group, token) rows) — the bottom-k closure property,
    asserted in the sampling regime where it could actually break
    (k smaller than every union size)."""
    from pyspark.sql import Window as W

    rows = []
    for i in range(24):
        src = f"s{i % 3}"
        toks = " ".join(f"t{(i * 11 + j * 5) % 60}" for j in range(9))
        rows.append((i, toks, src))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    k = 7
    got = dedup.source_containment_overlap(docs, k=k, shingle=1)
    toks = dedup.token_arrays(docs.select("doc_id", "text", "source"), shingle=1)
    sh = toks.select("source", F.explode("toks").alias("tok")).distinct()
    direct_sk = (
        sh.withColumn("h", F.md5("tok"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.asc("h"), F.asc("tok"))
            ),
        )
        .filter(F.col("rn") <= k)
        .select(F.col("source").alias("source_a"), "tok")
    )
    ka = direct_sk.groupBy("source_a").agg(F.count("*").alias("kk"))
    direct = (
        direct_sk.alias("s")
        .join(
            sh.alias("b"),
            (F.col("s.tok") == F.col("b.tok"))
            & (F.col("s.source_a") != F.col("b.source")),
        )
        .groupBy(F.col("s.source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count("*").alias("m"))
        .join(ka, "source_a")
        .select(
            "source_a", "source_b",
            F.round(F.col("m") / F.col("kk"), 4).alias("est_containment"),
        )
    )
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(got) == canon(direct) and got.count() > 0


def test_refine_rejects_shortlist_narrower_than_answer(spark):
    emb = _clustered_corpus(spark, n=40)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rerank"):
        similarity.ivf_pq_refine_topk(emb, [0], k=10, rerank=5)


def test_res_codes_artifact_survives_restart(spark, tmp_path, monkeypatch):
    """Regression for the round-10 review finding: 'ivf_pq_res_codes'
    must be a _DISK_KINDS member, or its serving contract is dead code
    — under SPARK_DAM_INDEX_DIR a restarted process silently re-encodes
    the whole residual code table. After a simulated restart the
    artifact must LOAD, not rebuild."""
    import os

    from database_activity_monitoring_dam_system_spark.plans import dam

    assert "ivf_pq_res_codes" in dam._DISK_KINDS
    monkeypatch.setenv("SPARK_DAM_SHARE_FRAMES", "1")
    monkeypatch.setenv("SPARK_DAM_INDEX_DIR", str(tmp_path / "idx"))
    key = ("ivf_pq_res_codes", os.path.realpath(str(tmp_path)))

    def build():
        return spark.createDataFrame(
            [(1, 0, 1), (2, 1, 2)], "vec_id long, cent_id int, code0 int"
        )

    first = dam._shared(
        "ivf_pq_res_codes", spark, str(tmp_path), build, expect_rows=2
    )
    assert first.count() == 2
    dam._FRAME_CACHE.pop(key, None)

    def must_not_build():
        raise AssertionError("builder ran despite persisted artifact")

    again = dam._shared(
        "ivf_pq_res_codes", spark, str(tmp_path), must_not_build,
        expect_rows=2,
    )
    assert again.count() == 2
    dam._FRAME_CACHE.pop(key, None)


def test_save_pairs_refuses_none_extra_stamp(spark, tmp_path):
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    pairs = dedup.containment_sketch_pairs(docs, k=4, shingle=1)
    with _pytest.raises(ValueError, match="_max_df"):
        dedup.save_containment_pairs(
            pairs, str(tmp_path / "p"), threshold=0.8, shingle=1,
            corpus_digest="x", extra_stamps={"_max_df": None},
        )


def test_opq_index_save_load_roundtrip_and_staleness(spark, tmp_path):
    """The one-artifact OPQ round-trip: save_opq_index → load_opq_index
    returns the EXACT (rotation, codebooks) pair (doubles round-trip
    parquet bit-exactly) and opq_topk over the loaded pair is
    row-identical to fresh-trained serving; a corpus-count or
    training-substrate mismatch REFUSES to load (stale-index
    refusal, same contract as PQ/IVF artifacts)."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rotation, books = similarity.pq_train_opq(
        emb, m=4, ksub=8, iters=1, opq_iters=2, dim=64
    )
    n = emb.count()
    path = str(tmp_path / "opq_index")
    similarity.save_opq_index(
        spark, rotation, books, path, n_corpus=n, trained_against="sub1"
    )
    lr, lb = similarity.load_opq_index(
        spark, path, expect_n=n, expect_trained_against="sub1"
    )
    assert lr == rotation and lb == books  # exact, not approx
    qids = [0, 1, 2]
    fresh = similarity.opq_topk(
        emb, qids, k=5, rotation=rotation, codebooks=books, dim=64
    ).collect()
    served = similarity.opq_topk(
        emb, qids, k=5, rotation=lr, codebooks=lb, dim=64
    ).collect()
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, served))
    with _pytest.raises(ValueError, match="stale OPQ index"):
        similarity.load_opq_index(spark, path, expect_n=n + 1)
    with _pytest.raises(ValueError, match="trained against"):
        similarity.load_opq_index(
            spark, path, expect_trained_against="sub2"
        )
    # artifact content stamp == the combined fingerprint opq_encode
    # stamps code tables with: pairing is provable without loading
    fp = similarity.artifact_fingerprint([rotation, books])
    row = spark.read.parquet(path).limit(1).collect()[0]
    assert row.content_md5 == fp
    codes = similarity.opq_encode(emb, rotation, books, dim=64)
    assert codes.select("_cb_md5").limit(1).collect()[0][0] == fp


def test_opq_update_codes_equals_full_reencode_and_stamp(spark):
    """Incremental OPQ code refresh ≡ full re-encode under a fixed
    (rotation, books) pair — carried codes for value-identical RAW
    vectors, fresh rotated-space codes for changed/added, removed
    gone — and the COMBINED stamp refuses a rotation swap (in-range
    codes, silently wrong ADC — the trap a books-only stamp cannot
    see)."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rotation, books = similarity.pq_train_opq(
        emb, m=4, ksub=8, iters=1, opq_iters=1, dim=64
    )
    old = emb.filter(F.col("vec_id") % 10 != 0)
    new = emb.filter(F.col("vec_id") % 7 != 0).withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0,
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x + 0.25,
            ),
        ).otherwise(F.col("embedding").cast("array<double>")),
    )
    old_codes = similarity.opq_encode(old, rotation, books, dim=64)
    handles: list = []
    updated = similarity.opq_update_codes(
        old_codes, old, new, rotation, books, dim=64,
        persisted_out=handles,
    )
    full = similarity.opq_encode(new, rotation, books, dim=64)
    assert sorted(map(tuple, updated.collect())) == sorted(
        map(tuple, full.collect())
    )
    assert {r.vec_id for r in updated.collect()} == {
        r.vec_id for r in new.select("vec_id").collect()
    }
    for h in handles:
        h.unpersist()
    # rotation swap: same books, different rotated space → refused
    other_rot, _ = similarity.pq_train_opq(
        emb.filter(F.col("vec_id") % 2 == 0),
        m=4, ksub=8, iters=1, opq_iters=2, dim=64,
    )
    assert other_rot != rotation
    with _pytest.raises(ValueError, match="different codebooks"):
        similarity.opq_update_codes(
            old_codes, old, new, other_rot, books, dim=64
        )


def test_jpeg_color_grey_flat_blocks_roundtrip_exact_all_values():
    """The jpeg_color_decode_features gate's exactness contract: a
    grey-valued (r=g=b) 32×32 RGB image of flat 8×8 blocks encoded
    at quality 100 / 4:2:0 / restart 2 decodes BIT-exactly for every
    possible grey value 0..255 — grey keeps the chroma planes flat
    at 128 (all chroma coefficients quantize to 0) and the luma DC
    path is the lossless flat-block one.  This is what licenses the
    arithmetic DuckDB oracle for the full color pipeline."""
    import numpy as np

    from database_activity_monitoring_dam_system_spark.operators import (
        jpegcodec,
    )

    for base in range(0, 256, 16):
        vals = np.arange(base, base + 16, dtype=np.uint8).reshape(4, 4)
        grey = np.repeat(np.repeat(vals, 8, 0), 8, 1)
        rgb = np.stack([grey] * 3, axis=-1)
        data = jpegcodec.encode_jpeg(
            32, 32, rgb.tobytes(), channels=3, quality=100,
            subsampling="420", restart_interval=2,
        )
        w, h, ch, pix = jpegcodec.decode_jpeg(data)
        assert (w, h, ch) == (32, 32, 3)
        assert pix == rgb.tobytes(), f"mismatch in block base {base}"


def test_ann_operating_points_counts_and_bounds(spark):
    """The operating-point harness (recall@k vs candidates-touched):
    full-scan methods count exactly Q·(N−1); IVF candidate counts
    grow monotonically with n_probe and cap at the full scan; probing
    ALL lists makes IVF exact (recall 1.0 at full-scan candidates —
    its re-rank is exact cosine); refine adds its rerank re-scores on
    top of the ADC count.  These are the invariants the SCALE.md
    operating-point table is generated under."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    qids = [0, 1, 2]
    rows = {
        r["label"]: r
        for r in similarity.ann_operating_points(
            emb, qids, k=5,
            points=[
                {"label": "pq", "method": "pq"},
                {"label": "ivf2", "method": "ivf", "n_probe": 2},
                {"label": "ivf4", "method": "ivf", "n_probe": 4},
                {"label": "ivf16", "method": "ivf", "n_probe": 16},
                {"label": "ref", "method": "ivf_pq_refine",
                 "rerank": 20},
                {"label": "lsh", "method": "lsh", "band_bits": 4},
            ],
        )
    }
    full = len(qids) * (n - 1)
    assert rows["pq"]["candidates_touched"] == full
    c2, c4, c16 = (
        rows["ivf2"]["candidates_touched"],
        rows["ivf4"]["candidates_touched"],
        rows["ivf16"]["candidates_touched"],
    )
    assert 0 < c2 < c4 < c16 == full
    # all 16 of 16 lists probed == exact cosine re-rank over everything
    assert rows["ivf16"]["recall_at_k"] == 1.0
    # refine = ADC candidates + min(rerank, per-query) exact re-scores
    ref = rows["ref"]["candidates_touched"]
    assert c4 < ref <= c4 + len(qids) * 20
    # lsh count is a measured DISTINCT pair count inside [0, full]
    assert 0 <= rows["lsh"]["candidates_touched"] <= full
    for r in rows.values():
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["n_expected"] == len(qids) * 5


def _hash_img(h, w, c, seed):
    import numpy as np

    idx = np.arange(h * w * c, dtype=np.uint64)
    x = (
        idx * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed)
    ) & np.uint64((1 << 64) - 1)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64((1 << 64) - 1)
    return (x & np.uint64(255)).astype(np.uint8).reshape(h, w, c)


def test_jpeg_progressive_decode_equals_baseline_exactly():
    """Progressive (SOF2) decode correctness by construction: the
    progressive encoder emits the SAME quantized coefficients as the
    baseline encoder (shared _prepare_qblocks front half) under a
    DC→spectral-bands→successive-approximation-refinement scan
    script, so the decoded pixels must match the baseline decode
    BYTE-exactly — any error in the G.2 scan model (EOB runs,
    correction-bit interleave, point transforms, per-scan restarts)
    breaks the equality.  Covers grey + color, 4:4:4 + 4:2:0,
    non-MCU-multiple dims, quality extremes, restart markers."""
    import numpy as np

    from database_activity_monitoring_dam_system_spark.operators import (
        jpegcodec,
    )

    cases = [
        (16, 16, 1, 90, "444", 0),
        (21, 13, 1, 75, "444", 2),
        (16, 16, 3, 90, "444", 0),
        (37, 21, 3, 85, "420", 0),
        (32, 32, 3, 100, "420", 3),
        (8, 8, 3, 50, "444", 0),
        (64, 48, 1, 30, "444", 0),  # low q → long EOB runs
    ]
    for i, (w, h, c, q, sub, ri) in enumerate(cases):
        im = _hash_img(h, w, c, 1000 + i)
        base = jpegcodec.encode_jpeg(
            w, h, im.tobytes(), channels=c, quality=q,
            subsampling=sub, restart_interval=ri,
        )
        prog = jpegcodec.encode_jpeg_progressive(
            w, h, im.tobytes(), channels=c, quality=q,
            subsampling=sub, restart_interval=ri,
        )
        assert prog[2:4] != base[2:4] or b"\xff\xc2" in prog
        got_b = jpegcodec.decode_jpeg(base)
        got_p = jpegcodec.decode_jpeg(prog)
        assert got_p == got_b, f"case {i}: progressive != baseline"


def test_jpeg_progressive_eob_runs_and_flat_exactness():
    """The EOB-run paths specifically: a mostly-flat image makes
    every AC band empty (maximal EOB runs spanning many blocks, in
    first AND refinement scans), and at quality 100 the flat-block
    fixture must round-trip EXACTLY through the progressive scan
    script — the same lossless identity the driver gate pins for
    baseline.  Also: the progressive stream really is multi-scan
    (one SOS per script entry)."""
    import numpy as np

    from database_activity_monitoring_dam_system_spark.operators import (
        jpegcodec,
    )

    vals = np.arange(16, dtype=np.uint8).reshape(4, 4) * 17
    grey = np.repeat(np.repeat(vals, 8, 0), 8, 1)  # 32×32 flat blocks
    rgb = np.stack([grey] * 3, axis=-1)
    prog = jpegcodec.encode_jpeg_progressive(
        32, 32, rgb.tobytes(), channels=3, quality=100,
        subsampling="420", restart_interval=2,
    )
    w, h, c, pix = jpegcodec.decode_jpeg(prog)
    assert (w, h, c) == (32, 32, 3)
    assert pix == rgb.tobytes()  # lossless flat-block identity
    n_scans = prog.count(b"\xff\xda")
    assert n_scans == 9  # DC + 2 luma AC bands + 2 chroma AC + 4 refines
    # greyscale variant: 5 scans (DC, 2 AC bands, 1 AC refine, DC ref)
    gdata = jpegcodec.encode_jpeg_progressive(
        32, 32, grey.tobytes(), channels=1, quality=100,
    )
    gw, gh, gc, gpix = jpegcodec.decode_jpeg(gdata)
    assert (gw, gh, gc) == (32, 32, 1) and gpix == grey.tobytes()
    assert gdata.count(b"\xff\xda") == 5


def test_hnsw_topk_recall_determinism_and_shape(spark):
    """Sharded HNSW: (a) deterministic — two runs return identical
    rows (hash-drawn levels, id-keyed shards, (distance, id)
    tie-breaks, no RNG anywhere); (b) recall ≥ 0.9 vs exact cosine
    on the small corpus at the gate's operating point; (c) exactly
    k rows per query, self excluded, cosine descending with id
    tie-break; (d) planted near-copies are each other's top match
    across shard boundaries."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    run1 = similarity.hnsw_topk(
        emb, qids, k=10, ef_search=48, n_shards=8
    ).collect()
    run2 = similarity.hnsw_topk(
        emb, qids, k=10, ef_search=48, n_shards=8
    ).collect()
    assert sorted(map(tuple, run1)) == sorted(map(tuple, run2))
    got = {(r.query_id, r.neighbor_id) for r in run1}
    assert len(got & exact) / len(exact) >= 0.9
    per_q: dict = {}
    for r in run1:
        assert r.neighbor_id != r.query_id
        per_q.setdefault(r.query_id, []).append(r)
    for rows in per_q.values():
        assert len(rows) == 10
        rows.sort(key=lambda r: r.rank)
        keys = [(-r.cosine, r.neighbor_id) for r in rows]
        assert keys == sorted(keys)
    # planted near-dups: the copy lands in a DIFFERENT shard than
    # its base for most ids, so finding it proves the fan-out merge
    nd = _near_dup_corpus(spark, n_base=400, n_dups=20)
    top1 = {
        r.query_id: r.neighbor_id
        for r in similarity.hnsw_topk(
            nd, list(range(10)), k=1, ef_search=48, n_shards=4
        ).collect()
    }
    assert all(top1[i] == 400 + i for i in range(10))


def test_hnsw_operating_point_visited_counts(spark):
    """The HNSW row in ann_operating_points MEASURES distance
    evaluations (graph nodes touched): more ef_search → more visits
    and never-worse recall plumbing; the count stays a fraction of a
    corpus-proportional scan on a big-enough corpus (the sf10 row in
    SCALE.md: 0.86 recall touching 5.7 % of full scan)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = {
        r["label"]: r
        for r in similarity.ann_operating_points(
            emb, [0, 1, 2], k=5,
            points=[
                {"label": "h16", "method": "hnsw", "ef_search": 16,
                 "n_shards": 4},
                {"label": "h48", "method": "hnsw", "ef_search": 48,
                 "n_shards": 4},
            ],
        )
    }
    assert 0 < rows["h16"]["candidates_touched"] < rows[
        "h48"
    ]["candidates_touched"]
    assert rows["h48"]["recall_at_k"] >= rows["h16"]["recall_at_k"] - 1e-9
    assert rows["h48"]["recall_at_k"] >= 0.8


def test_hnsw_refine_recall_and_determinism(spark):
    """The HNSW+exact-refine composition (round-12 verdict ask #5):
    deeper per-shard shortlists + raw-vector exact-cosine re-rank.
    On the smoke corpus the union of rerank-deep shard shortlists
    covers the true top-10, so the output must EQUAL cosine_topk's
    rows byte-for-byte (same expression, same tie-break); recall
    must be ≥ the plain sharded-HNSW row's, and the operating-point
    harness accounts visits + point-fetches."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = sorted(
        map(tuple, similarity.cosine_topk(emb, qids, k=10).collect())
    )
    refined = sorted(
        map(
            tuple,
            similarity.hnsw_refine_topk(
                emb, qids, k=10, rerank=60, n_shards=8
            ).collect(),
        )
    )
    assert refined == exact
    with _pytest.raises(ValueError, match="rerank"):
        similarity.hnsw_refine_topk(emb, qids, k=10, rerank=5)
    pts = {
        r["label"]: r
        for r in similarity.ann_operating_points(
            emb, qids, k=10,
            points=[
                {"label": "h", "method": "hnsw", "ef_search": 48,
                 "n_shards": 8},
                {"label": "hr", "method": "hnsw_refine", "rerank": 60,
                 "ef_search": 48, "n_shards": 8},
            ],
        )
    }
    assert pts["hr"]["recall_at_k"] >= pts["h"]["recall_at_k"] - 1e-9
    assert pts["hr"]["recall_at_k"] == 1.0
    # refine pays visits (deeper ef) plus one fetch per shortlist row
    assert pts["hr"]["candidates_touched"] > pts["h"]["candidates_touched"]


def test_filtered_topk_exact_and_graph_paths_agree(spark):
    """Filtered vector search: the pre-filter exact path and the
    exhaustive-config filtered-HNSW traversal are INDEPENDENT
    implementations of the same semantics (subset scan vs full-graph
    navigation with allowed-mask admission) — they must return
    identical rows, every neighbor must satisfy the predicate, and
    queries must resolve against the UNFILTERED corpus (a query that
    fails its own filter still gets answers)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    # pick queries with label != 3 so the query-side-unfiltered rule
    # is actually exercised
    qids = [
        int(r[0])
        for r in emb.filter("label != 3")
        .select("vec_id").orderBy("vec_id").limit(4).collect()
    ]
    exact = sorted(map(tuple, similarity.filtered_topk(
        emb, qids, predicate="label = 3", k=10, strategy="exact",
    ).collect()))
    graph = sorted(map(tuple, similarity.hnsw_filtered_topk(
        emb, qids, predicate="label = 3", k=10,
        ef_search=emb.count(), n_shards=1,
    ).collect()))
    assert exact == graph
    assert len(exact) == 4 * 10
    allowed = {
        int(r[0]) for r in emb.filter("label = 3")
        .select("vec_id").collect()
    }
    assert all(row[1] in allowed for row in exact)
    # two-run determinism of the serving config
    serving = similarity.hnsw_filtered_topk(
        emb, qids, predicate="label = 3", k=10,
        ef_search=64, n_shards=4,
    )
    r1 = sorted(map(tuple, serving.collect()))
    r2 = sorted(map(tuple, serving.collect()))
    assert r1 == r2
    assert all(row[1] in allowed for row in r1)
    # the operating-point harness measures the filtered path against
    # the FILTERED exact reference (visited counts measured, not
    # modeled); the exhaustive config must read recall 1.0
    pts = similarity.ann_operating_points(
        emb, qids, k=10,
        points=[
            {"label": "hf_x", "method": "hnsw_filtered",
             "predicate": "label = 3",
             "ef_search": int(emb.count()), "n_shards": 1},
            {"label": "hf_s", "method": "hnsw_filtered",
             "predicate": "label = 3",
             "ef_search": 64, "n_shards": 4},
        ],
    )
    by = {r["label"]: r for r in pts}
    assert by["hf_x"]["recall_at_k"] == 1.0
    assert by["hf_x"]["n_expected"] == 4 * 10
    # at 10 % selectivity the allowed count per shard is far below
    # ef=64, so the result heap never fills and the serving config
    # also explores ~everything (the documented ef-inflation
    # behavior): visits are measured, recall stays at the ceiling
    assert by["hf_s"]["candidates_touched"] is not None
    assert by["hf_s"]["candidates_touched"] > 0
    assert by["hf_s"]["recall_at_k"] >= 0.9


def test_filtered_topk_auto_strategy_picks_by_selectivity(spark):
    """The auto planner: selective predicate (~10 % pass) → exact
    pre-filter (no pandas traversal in the plan); permissive
    predicate (~90 % pass) → graph post-filter (FlatMapGroupsInPandas
    present).  The decision is observable in the physical plan."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qids = [0, 1, 2]
    selective = similarity.filtered_topk(
        emb, qids, predicate="label = 3", k=5, strategy="auto",
    )
    plan_sel = selective._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan_sel
    permissive = similarity.filtered_topk(
        emb, qids, predicate="label != 3", k=5, strategy="auto",
    )
    plan_perm = (
        permissive._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapGroupsInPandas" in plan_perm
    import pytest as _pytest

    with _pytest.raises(ValueError, match="strategy"):
        similarity.filtered_topk(
            emb, qids, predicate="label = 3", strategy="nope",
        )


def test_hnsw_filtered_navigates_through_blocked_nodes(spark):
    """The filtered traversal must reach an allowed region whose
    graph approaches run THROUGH blocked nodes (the reason blocked
    nodes stay navigable instead of being pruned from the graph): a
    chain corpus where the target cluster's only close neighbors are
    blocked still returns the exact filtered answer exhaustively."""
    import math

    rows = []
    # a 1-D chain in angle space: vectors on the unit circle, ids in
    # walk order; even ids blocked, odd allowed
    for i in range(40):
        ang = i * 0.07
        rows.append((i, [math.cos(ang), math.sin(ang)], i % 2))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, flag int"
    )
    got = similarity.hnsw_filtered_topk(
        emb, [0], predicate="flag = 1", k=5,
        ef_search=40, n_shards=1,
    ).collect()
    # exact answer: nearest odd ids to angle 0 are 1, 3, 5, 7, 9
    assert [r.neighbor_id for r in got] == [1, 3, 5, 7, 9]


def test_knn_graph_matches_per_query_exact_topk(spark):
    """The exact k-NN graph restricted to a query subset must equal
    cosine_topk for that subset (same expression, same tie-break) —
    and every corpus vector must get exactly k rows.  Also pins
    block-count invariance: the fan-out width is a distribution
    knob, never a semantics knob."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    g = similarity.knn_graph(emb, k=5, n_blocks=16)
    assert g.count() == n * 5
    qids = [0, 7, 31]
    sub = sorted(map(tuple, g.filter(
        F.col("query_id").isin(qids)
    ).collect()))
    ref = sorted(map(tuple, similarity.cosine_topk(
        emb, qids, k=5
    ).collect()))
    assert sub == ref
    g3 = similarity.knn_graph(emb, k=5, n_blocks=3, q_blocks=5)
    assert sorted(map(tuple, g3.filter(
        F.col("query_id").isin(qids)
    ).collect())) == ref


def test_knn_graph_update_fold_equals_rebuild(spark):
    """knn_graph_update over an old snapshot with all three delta
    classes (added / changed / removed) must equal the fresh rebuild
    row-for-row; the no-op delta (old == new) must too — the carried
    pairs are re-scored from raw vectors, so even the pure-carry path
    goes through the same precision as the rebuild."""
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    # old snapshot: ids %10==3 absent (adds), %10==7 perturbed
    # (changed), ephemeral high ids present only in old (removed)
    perturbed = F.transform(
        "embedding",
        lambda x, i: F.when(i == 0, (x + F.lit(1.0)).cast("float"))
        .otherwise(x),
    )
    old = (
        emb.filter("vec_id % 10 != 3")
        .select(
            "vec_id",
            F.when(F.col("vec_id") % 10 == 7, perturbed)
            .otherwise(F.col("embedding")).alias("embedding"),
            "label",
        )
        .unionByName(
            emb.filter("vec_id % 10 == 1").select(
                (F.col("vec_id") + F.lit(5_000_000)).alias("vec_id"),
                "embedding", "label",
            )
        )
    )
    prev = similarity.knn_graph(old, k=5, n_blocks=8)
    fold = sorted(map(tuple, similarity.knn_graph_update(
        prev, old, emb, k=5, n_blocks=8
    ).collect()))
    rebuild = sorted(map(tuple, similarity.knn_graph(
        emb, k=5, n_blocks=8
    ).collect()))
    assert fold == rebuild
    # no-op delta
    prev_full = similarity.knn_graph(emb, k=5, n_blocks=8)
    noop = sorted(map(tuple, similarity.knn_graph_update(
        prev_full, emb, emb, k=5, n_blocks=8
    ).collect()))
    assert noop == rebuild


def test_knn_graph_hnsw_degenerate_equals_exact_and_serving_recall(
    spark,
):
    """knn_graph_hnsw at n_shards=1, ef ≥ N is exhaustive ⇒ must
    equal the exact knn_graph row-for-row; at a serving config the
    per-query recall against the exact graph clears the same floor
    the fixed-query HNSW gates pin."""
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(120)
    exact = sorted(map(tuple, similarity.knn_graph(
        emb, k=5, n_blocks=4
    ).collect()))
    exhaustive = sorted(map(tuple, similarity.knn_graph_hnsw(
        emb, k=5, ef_search=120, n_shards=1
    ).collect()))
    assert exhaustive == exact
    serving = similarity.knn_graph_hnsw(
        emb, k=5, ef_search=48, n_shards=4
    ).collect()
    exact_sets: dict[int, set[int]] = {}
    for q, nb, _, _ in exact:
        exact_sets.setdefault(q, set()).add(nb)
    got_sets: dict[int, set[int]] = {}
    for r in serving:
        got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        len(got_sets.get(q, set()) & nbs)
        for q, nbs in exact_sets.items()
    )
    recall = hits / sum(len(v) for v in exact_sets.values())
    assert recall >= 0.8, recall


def test_hnsw_zero_row_shard_still_counts_visits(spark):
    """Advisor finding (round 12): a (query, shard) search whose only
    node is the query itself returns zero neighbor rows, but its
    distance evaluations must still reach candidates_touched — the
    shard emits a visited-count sentinel (NULL neighbor_id) that
    hnsw_topk filters out before ranking."""
    # shard = vec_id % 2; shard 1 holds ONLY vec 1 (the query)
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0]),
        (1, [1.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    sr = similarity._hnsw_shard_results(
        emb, [1], k=3, n_shards=2
    ).collect()
    by_shard = {}
    for r in sr:
        by_shard.setdefault(r.shard, []).append(r)
    # shard 1: exactly the sentinel — no neighbor, but visits counted
    assert [
        (r.neighbor_id, r.cosine) for r in by_shard[1]
    ] == [(None, None)]
    assert by_shard[1][0].visited >= 1
    # shard 0: real neighbor rows, no sentinel
    assert all(r.neighbor_id is not None for r in by_shard[0])
    # the operating-point aggregate includes BOTH shards' visits
    pts = similarity.ann_operating_points(
        emb, [1], k=3,
        points=[{"label": "h", "method": "hnsw", "n_shards": 2}],
    )
    total = sum(r.visited for r in {
        (r.shard, r.query_id): r for r in sr
    }.values())
    assert pts[0]["candidates_touched"] == total
    assert pts[0]["candidates_touched"] > sum(
        r.visited for r in {
            (r.shard, r.query_id): r for r in by_shard[0]
        }.values()
    )
    # the public top-k surface never leaks the sentinel
    topk = similarity.hnsw_topk(emb, [1], k=3, n_shards=2).collect()
    assert topk and all(r.neighbor_id is not None for r in topk)


def test_hnsw_index_artifact_roundtrip_and_staleness(spark, tmp_path):
    """The HNSW serving artifact (build_hnsw_index → save → load →
    hnsw_topk_from_index) returns BIT-identical rows to the fused
    build+search path — the artifact stores per-node adjacency by
    vector id plus unit vectors, so serving never touches the raw
    corpus, and the recomputed entry rule (min id among max-level
    nodes) reproduces the builder's entry point exactly.  A
    corpus-count mismatch refuses to load (stale-index refusal, the
    sibling PQ/IVF/OPQ contract)."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qids = [0, 1, 2, 3, 4]
    fused = sorted(
        map(
            tuple,
            similarity.hnsw_topk(
                emb, qids, k=10, ef_search=48, n_shards=8
            ).collect(),
        )
    )
    idx = similarity.build_hnsw_index(emb, n_shards=8)
    path = str(tmp_path / "hnsw_ix")
    similarity.save_hnsw_index(idx, path)
    loaded = similarity.load_hnsw_index(
        spark, path, expect_n=emb.count()
    )
    qv = [
        (r[0], list(r[1]))
        for r in emb.filter(F.col("vec_id").isin(qids))
        .select("vec_id", "embedding")
        .collect()
    ]
    served = sorted(
        map(
            tuple,
            similarity.hnsw_topk_from_index(
                loaded, qv, k=10, ef_search=48
            ).collect(),
        )
    )
    assert fused == served
    # params ride every row for introspection
    row = loaded.limit(1).collect()[0]
    assert (row.m, row.efc, row.n_shards) == (8, 40, 8)
    with _pytest.raises(ValueError, match="stale HNSW"):
        similarity.load_hnsw_index(spark, path, expect_n=7)


def test_hnsw_gate_rebuilds_stale_disk_artifact(spark, tmp_path, monkeypatch):
    """Call-site staleness pin for the serving gate: the hnsw_index
    _shared call must pass expect_rows (one graph row per corpus
    vector), so a planted stale artifact at the sf_dir's index path —
    a regenerated corpus at the same path — is REBUILT and the gate
    still answers from a graph covering the full corpus, never the
    planted snapshot (advisor finding, round 12)."""
    import os

    from database_activity_monitoring_dam_system_spark.plans import dam
    from database_activity_monitoring_dam_system_spark.plans import extensions as ext

    monkeypatch.setenv("SPARK_DAM_SHARE_FRAMES", "1")
    monkeypatch.setenv("SPARK_DAM_INDEX_DIR", str(tmp_path))
    key = ("hnsw_index", os.path.realpath(SF_SMOKE))
    dam._FRAME_CACHE.pop(key, None)
    # plant a 1-node "index" from a stale snapshot of the corpus
    emb = load_table(spark, SF_SMOKE, "embeddings")
    stale = similarity.build_hnsw_index(emb.limit(1), n_shards=8)
    path = dam._index_path("hnsw_index", SF_SMOKE)
    similarity.save_hnsw_index(stale, path)
    try:
        out = ext._q_embedding_hnsw_topk(spark, SF_SMOKE)
        expected = sorted(
            map(
                tuple,
                similarity.hnsw_topk(
                    emb, list(range(5)), k=10, ef_search=48, n_shards=8
                ).collect(),
            )
        )
        assert sorted(map(tuple, out.collect())) == expected
        # the disk artifact was overwritten with the full-corpus graph
        assert spark.read.parquet(path).count() == emb.count()
    finally:
        dam._FRAME_CACHE.pop(key, None)


def test_hnsw_update_index_equals_full_rebuild(spark):
    """Incremental HNSW fold ≡ fresh rebuild bit-exactly: clean
    shards carry their stored graph rows, dirty shards (any
    added/changed/removed vector) rebuild — and serving from the
    folded index returns the fresh index's rows.  A parameter
    mismatch against the artifact's stamps refuses to fold."""
    import pytest as _pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    old = emb.filter(F.col("vec_id") % 10 != 0)
    # new snapshot: remove ids %7==0, perturb ids %5==0 — dirties the
    # shards those ids hash into, leaves the rest byte-identical
    new = emb.filter(F.col("vec_id") % 7 != 0).withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0,
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x + 0.25,
            ),
        ).otherwise(F.col("embedding").cast("array<double>")),
    )
    old_idx = similarity.build_hnsw_index(old, n_shards=8)
    folded = similarity.hnsw_update_index(
        old_idx, old, new, n_shards=8
    )
    fresh = similarity.build_hnsw_index(new, n_shards=8)

    def canon(df):
        return sorted(
            (
                r.shard, r.node_id,
                tuple(tuple(lvl) for lvl in r.levels),
                tuple(r.unit),
            )
            for r in df.collect()
        )

    assert canon(folded) == canon(fresh)
    # folded index SERVES identically to fresh
    qids = [1, 2, 3]
    qv = [
        (r[0], list(r[1]))
        for r in new.filter(F.col("vec_id").isin(qids))
        .select("vec_id", "embedding")
        .collect()
    ]
    a = similarity.hnsw_topk_from_index(folded, qv, k=5).collect()
    b = similarity.hnsw_topk_from_index(fresh, qv, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with _pytest.raises(ValueError, match="rebuild instead"):
        similarity.hnsw_update_index(old_idx, old, new, n_shards=4)
