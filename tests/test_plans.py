"""Physical-plan invariants (SURVEY.md §4): these assertions fail if a
refactor silently degrades the plan — the filter stops reaching the
scan, a dimension stops broadcasting, or an aggregate loses its
map-side partial phase.
"""

from __future__ import annotations

import pytest

from database_activity_monitoring_dam_system_spark.plans.registry import all_queries

from .conftest import SF_SMOKE

_QS = all_queries()


def _plan(spark, name: str) -> str:
    df = _QS[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns reach the scan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    # partial + final aggregation around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "SortMergeJoin" not in plan  # fact side never shuffles for joins


def test_q6_single_scan_full_pushdown(spark):
    """Q6 shape: zero joins, zero wide exchanges — every predicate
    (date band, discount band, quantity cap) reaches the parquet scan
    and the plan is scan → partial agg → single-row final agg."""
    plan = _plan(spark, "forecast_revenue")
    assert "Join" not in plan
    # the PushedFilters list is display-truncated; the head proves the
    # scan got the filters, the Filter line proves the exact bounds
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)" \
        in plan
    assert "(l_discount" in plan and "(l_quantity" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert plan.count("HashAggregate") >= 2


def test_q3_q10_take_ordered_no_global_sort(spark):
    """Q3/Q10 shapes rank by exact cents with key tie-breaks: the
    top-k must be TakeOrderedAndProject (per-partition top-k + driver
    merge), never a full sort of the aggregated fact, and the
    customer/nation dims broadcast."""
    for name in ("shipping_priority", "returned_item_customers"):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "Sort " not in plan.split("TakeOrderedAndProject")[0], name
        assert "BroadcastHashJoin" in plan, name


def test_q7_q8_q9_dims_broadcast(spark):
    """The Q7/Q8/Q9 star shapes: every dim chain (supplier→nation,
    customer→nation→region, part) broadcasts; the ONLY permissible
    wide join is the single lineitem⋈orders fact×fact exchange on the
    order key — a dim reaching SortMergeJoin would add a second."""
    for name, min_bcast in (
        ("volume_shipping", 2),
        ("market_share", 3),
        ("product_profit", 2),
    ):
        plan = _plan(spark, name)
        assert plan.count("BroadcastHashJoin") >= min_bcast, name
        assert (
            plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
            <= 1
        ), name


def test_rule_battery_single_window_shuffle(spark):
    plan = _plan(spark, "rule_battery")
    # blacklist joins broadcast; the only fact-side hash shuffle is the
    # rate window on user_id
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "events_enriched_latest")
    assert "TakeOrderedAndProject" in plan  # no full sort of the fact table


def test_firewall_zero_shuffle_projection(spark):
    """The first-match pick is a compiled when-chain — no join against
    the rules dim and, critically, no exchange of the fact table on the
    near-unique activity_id key (the would-be scale-killer at 100 TB)."""
    plan = _plan(spark, "firewall_matches")
    assert "Exchange hashpartitioning(activity_id" not in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_fk_cascade_user_join_broadcasts(spark):
    """Both referential actions must be broadcast-shaped: SET NULL is
    a broadcast LEFT join against the deleted-user key set, CASCADE a
    broadcast LEFT ANTI against the deleted-activity set — the fact
    table itself never shuffles for the propagation. (The gate's
    downstream alert-count join may still sort-merge; that join is
    composition, not the cascade operator.)"""
    plan = _plan(spark, "fk_cascade")
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti, BuildRight" in plan
    # the propagation side of the plan carries no exchange of the fact
    # table: the only fact-side hashpartitioning exchange allowed is
    # the final aggregate/count join, keyed on activity_id AFTER the
    # cascade — the cascade stages themselves are exchange-free
    cascade_part = plan.split("SortMergeJoin")[-1]
    assert "BroadcastHashJoin" in cascade_part


def test_heavy_hitters_window_after_aggregate(spark):
    """The rank window must consume the aggregated (group, token)
    count table, not the exploded token stream: exactly one exchange
    carries exploded tokens, and the window's sort input is the
    aggregate output."""
    plan = _plan(spark, "heavy_hitter_tokens")
    assert "HashAggregate" in plan
    # window partition key is the group col, applied post-aggregation
    agg_at = plan.index("HashAggregate")
    win_at = plan.index("Window")
    assert win_at < agg_at  # executed-plan string prints consumers first


def test_interval_join_stays_equi_join(spark):
    """The bin-bucketed rewrite exists precisely so ts-BETWEEN never
    plans as a nested-loop join; if a refactor loses the bin equi-key,
    Catalyst silently falls back to BroadcastNestedLoopJoin — O(N·M)
    and a driver-killer once the interval side grows."""
    plan = _plan(spark, "interval_join_windows")
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # the equi-join survived (hash or sort-merge)


def test_repetition_signals_is_pure_projection(spark):
    """All signals are per-doc: the sorted-array run-length folds keep
    the whole operator a projection. An Exchange or Join appearing
    here means someone reintroduced the explode+groupBy formulation —
    a full-corpus shuffle at 100 TB for a per-row computation."""
    plan = _plan(spark, "repetition_signals")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_pii_scrub_is_pure_projection(spark):
    plan = _plan(spark, "pii_scrub")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_rule_battery_skew_join_parity_under_aqe(spark):
    """The documented skew mitigation (SCALE.md §Skew) actually fires
    and is result-neutral: a deliberately hot user key (120k of 126k
    rows on one user) flows through the rule battery's rate window,
    then a user-keyed sort-merge join downstream.  With the AQE skew
    thresholds scaled to test data, OptimizeSkewedJoin must SPLIT the
    hot partition (SortMergeJoin(skew=true) + skewed AQEShuffleRead
    in the final adaptive plan) and the output must be row-identical
    to the non-adaptive plan.  Note the window's own user_id exchange
    is NOT splittable by design (the frame needs the whole user
    co-located) — that residual skew is the salting escape hatch's
    territory; the join boundary after it is where AQE takes over.
    """
    from pyspark.sql import functions as F

    from database_activity_monitoring_dam_system_spark.operators import rules

    n_hot, n_cold_users, per_cold = 120_000, 30, 200
    n = n_hot + n_cold_users * per_cold
    base = spark.range(n).select(
        F.when(F.col("id") < n_hot, F.lit(1))
        .otherwise((F.col("id") % n_cold_users) + 2)
        .cast("long")
        .alias("user_id"),
        F.concat(F.lit("10.0.0."), (F.col("id") % 200).cast("string")).alias(
            "ip_address"
        ),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") % 3600)).alias(
            "access_timestamp"
        ),
        F.when(F.col("id") % 997 == 0, "SELECT * FROM users WHERE 1=1 OR 1=1")
        .when(F.col("id") % 31 == 0, "select password from accounts")
        .otherwise(
            F.concat(
                F.lit("SELECT col FROM t WHERE id="), F.col("id").cast("string")
            )
        )
        .alias("operation_details"),
        F.element_at(
            F.array(
                F.lit("SELECT"), F.lit("INSERT"), F.lit("UPDATE"), F.lit("DELETE")
            ),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("operation_type"),
        F.element_at(
            F.array(F.lit("users"), F.lit("orders"), F.lit("payments")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("table_name"),
        (F.col("id") % 2000).cast("int").alias("rows_affected"),
    )
    battery = rules.apply_rule_battery(base)
    dim = spark.range(2 + n_cold_users).select(
        (F.col("id") + 1).alias("user_id"),
        F.concat(F.lit("team-"), (F.col("id") % 3).cast("string")).alias("team"),
    )

    keys = [
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    saved = {k: spark.conf.get(k) for k in keys}

    def run(aqe: bool):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "256KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # round-robin repartition models a pipeline stage that broke
        # the window's co-partitioning, so the join inserts a FRESH
        # user_id exchange — the boundary AQE can split
        joined = battery.repartition(64).join(
            dim.hint("merge"), "user_id"
        ).select(
            "user_id", "team", "is_suspicious", "severity_level",
            "queries_last_min", "operation_details",
        )
        rows = sorted(tuple(r) for r in joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        return rows, plan

    try:
        rows_aqe, plan_aqe = run(True)
        rows_plain, plan_plain = run(False)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    assert "skew=true" in plan_aqe, "OptimizeSkewedJoin did not fire"
    assert "skewed" in plan_aqe  # AQEShuffleRead marks split partitions
    assert "skew=true" not in plan_plain
    assert rows_aqe == rows_plain and len(rows_aqe) == n


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Bucketing pays the join shuffle once at WRITE time: two tables
    bucketed into the same count on the join key must equi-join with
    NO Exchange on either side (the repeated-fact-join layout for
    100 TB), and the result must match the plain-parquet join."""
    from pyspark.sql import functions as F

    from database_activity_monitoring_dam_system_spark import sinks
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    per_user = events.groupBy("user_id").agg(F.sum("value").alias("total"))
    try:
        sinks.write_bucketed_table(
            events, "b_events", bucket_col="user_id", buckets=8,
            path=str(tmp_path / "b_events"),
        )
        sinks.write_bucketed_table(
            per_user, "b_totals", bucket_col="user_id", buckets=8,
            path=str(tmp_path / "b_totals"),
        )
        # force the non-broadcast path a real fact×fact join would take
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_events").join(
            spark.table("b_totals"), "user_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert "SelectedBucketsCount" in plan  # scans are bucket-aware
        expect = sorted(
            tuple(r)
            for r in events.join(per_user, "user_id").collect()
        )
        got = sorted(tuple(r) for r in joined.collect())
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS b_events")
        spark.sql("DROP TABLE IF EXISTS b_totals")


def test_chunking_zero_shuffle(spark):
    """doc_chunks is a scan-side projection + generator: any Exchange
    means someone added a shuffle to a pipeline that must have none."""
    plan = _plan(spark, "doc_chunks")
    assert "Exchange" not in plan
    assert "Generate explode" in plan


def test_packing_single_shard_exchange(spark):
    """pack_manifest shuffles exactly once per stage boundary on the
    shard key: one exchange for the running-sum window, one for the
    pack rollup — never a global sort."""
    plan = _plan(spark, "pack_manifest")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Exchange rangepartitioning" not in plan  # no global orderBy
    assert "Window" in plan


def test_corpus_card_rollup_shape(spark):
    """corpus_card touches the corpus once: the (source, lang) census
    aggregate is the only full-width exchange; everything after runs
    on the tiny aggregated frame."""
    plan = _plan(spark, "corpus_card")
    assert plan.count("HashAggregate") >= 2  # partial + final stages
    assert "Exchange rangepartitioning" not in plan


def test_driver_priority_is_generated():
    """_DRIVER_PRIORITY must match what tools/rotate_priority.py emits
    from the CORRECTNESS rounds it was stamped with — the rotation is
    generated, not curated (hand edits drift within a round and go
    stale).  Regeneration is pinned to _DRIVER_PRIORITY_SOURCE_ROUNDS
    so a driver artifact landing AFTER the closing commit (the way
    rounds 8-10 each opened red) produces a skip-with-reminder, not a
    failure; hand edits to the tuple still fail hard."""
    import importlib.util
    import pathlib

    tool_path = (
        pathlib.Path(__file__).resolve().parent.parent
        / "tools"
        / "rotate_priority.py"
    )
    spec = importlib.util.spec_from_file_location("rotate_priority", tool_path)
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    from database_activity_monitoring_dam_system_spark.plans.registry import (
        _DRIVER_PRIORITY,
        _DRIVER_PRIORITY_SOURCE_ROUNDS,
    )

    ordered, _ = tool.generate(rounds=_DRIVER_PRIORITY_SOURCE_ROUNDS)
    assert list(_DRIVER_PRIORITY) == ordered
    avail = tool.available_rounds()
    if tuple(avail) != tuple(_DRIVER_PRIORITY_SOURCE_ROUNDS):
        pytest.skip(
            "rotation stamped from rounds "
            f"{tuple(_DRIVER_PRIORITY_SOURCE_ROUNDS)} but {tuple(avail)} "
            "are on disk — run tools/rotate_priority.py --write"
        )


def test_pq_encode_is_pure_projection(spark):
    """PQ corpus encoding must stay a zero-shuffle, zero-join
    projection against literal codebooks — the property that makes it
    free to fuse into any corpus scan at 100 TB."""
    from database_activity_monitoring_dam_system_spark.operators import similarity
    from database_activity_monitoring_dam_system_spark.sources.testdata import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    plan = (
        similarity.pq_encode(emb, books, dim=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_ivf_pq_broadcasts_probe_and_never_sort_merges(spark):
    """The IVF-PQ candidate join must be a BroadcastHashJoin on
    cent_id (query-probe side broadcast) — a SortMergeJoin here would
    shuffle the whole encoded corpus per query batch."""
    plan = _plan(spark, "embedding_ivf_pq_topk")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan


def test_pq_topk_single_ranking_shuffle(spark):
    """Plain PQ ADC: queries broadcast (nested-loop on the != self
    predicate is fine — the broadcast side is Q rows), corpus side
    never hash-shuffles except for the final per-query ranking
    window."""
    plan = _plan(spark, "embedding_pq_topk")
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # ranking window


def test_round6_text_ops_never_sort_merge(spark):
    """The text-side round-6 operators keep their corpus-frame joins
    broadcast (model/vocab sides are k-row or top-N-row frames): a
    SortMergeJoin in any of them means a corpus-sized shuffle crept
    into what should be small-side broadcasting."""
    for name in ("nb_lang_classify", "vocab_drift", "dup_span_stats"):
        plan = _plan(spark, name)
        assert "SortMergeJoin" not in plan, name


def test_scan_bound_ops_single_exchange(spark):
    """Pure scan-shaped operators (score projection + one agg/window):
    exactly ONE hash exchange, nothing else."""
    for name in ("relative_quality_keep", "doc_hash_embeddings"):
        plan = _plan(spark, name)
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "Join" not in plan, name


def test_funnel_layers_reuse_one_user_exchange(spark):
    """funnel_steps' docstring claim made structural: the three
    layered window steps + the per-user aggregate all ride ONE
    hashpartitioning(user_id) exchange — no per-step join, no extra
    shuffle per layer."""
    plan = _plan(spark, "funnel_steps")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_rollup_chain_shuffle_bound(spark):
    """The minute→hour→day rollup chain is three re-aggregations:
    exactly one exchange per grain level, no raw-event re-scan
    (a single parquet scan node) and no range partitioning."""
    plan = _plan(spark, "rollup_timeline")
    assert plan.count("Exchange hashpartitioning") == 3, plan
    assert plan.count("Scan parquet") == 1
    assert "Exchange rangepartitioning" not in plan


def test_weighted_sample_per_stratum_single_shuffle(spark):
    """weighted_sample's strata path: the ES key is computed in the
    scan-side projection and the per-stratum rank is ONE exchange on
    the stratum key — no global sort."""
    plan = _plan(spark, "weighted_sample")
    assert plan.count("Exchange hashpartitioning(lang") == 1, plan
    assert "Exchange rangepartitioning" not in plan


def test_encoding_signals_pure_projection(spark):
    """All four damage counters are replace-length/match-count
    expressions over the scan — any Exchange is a regression."""
    plan = _plan(spark, "encoding_signals")
    assert "Exchange" not in plan


def test_bloom_probe_no_join(spark):
    """The Bloom membership probe is a pure projection against the
    embedded literal bitmap: the only joins in the gate plan belong
    to the per-doc rollup, and the corpus fingerprint side is never
    joined to an eval-set table (the exact path's broadcast semi-join
    is exactly what the bitmap replaces)."""
    plan = _plan(spark, "bloom_contamination")
    assert "BroadcastHashJoin" not in plan and "SortMergeJoin" not in plan


def test_zorder_key_pure_projection(spark):
    """The Morton key is bit algebra in the scan projection — any
    Exchange is a regression."""
    plan = _plan(spark, "zorder_keys")
    assert "Exchange" not in plan


def test_event_transitions_two_bounded_exchanges(spark):
    """transition_counts' docstring made structural: one user-key
    window shuffle over the events, then everything else (pair agg +
    from-type window) runs on the bounded types² frame — two hash
    exchange keys total, no joins."""
    plan = _plan(spark, "event_transitions")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert "Join" not in plan


def test_cdc_apply_snapshot_never_sort_merges(spark):
    """The merge's contract: survivors and the contested-key split
    ride broadcast joins (the snapshot side never shuffles on the
    merge key); the ONLY sort-merge allowed is the full-outer
    arbitration of the two change-key-sized frames — full outer
    cannot broadcast, and both its inputs are changelog-bounded."""
    plan = _plan(spark, "cdc_apply")
    assert plan.count("SortMergeJoin") == 1, plan
    assert "FullOuter" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_gapfill_composes_after_reduction(spark):
    """Gap filling consumes the partials twice (span agg + join);
    the operator materializes them once, so the executed plan never
    re-reads raw events — zero parquet scans after the reduction."""
    plan = _plan(spark, "gapfill_timeline")
    assert plan.count("Scan parquet") == 0, plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan, plan


def test_quantile_rollup_single_scan_no_join(spark):
    """The histogram-partials chain re-aggregates partials; raw
    events are scanned once and nothing joins."""
    plan = _plan(spark, "rollup_value_quantiles")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan


def test_inverted_postings_single_token_exchange(spark):
    """Index build is one shuffle on the token key."""
    plan = _plan(spark, "inverted_postings")
    assert plan.count("Exchange hashpartitioning(token") == 1, plan
    assert "Join" not in plan


def test_bm25_no_joins_reads_cache(spark):
    """BM25's corpus constants are driver-collected literals and the
    per-doc tf/dl frame is tokenized once and PERSISTED — the scoring
    plan reads the cache (InMemoryTableScan) with no join; the only
    exchange/scan text in the plan is inside the cached relation's
    own (already-executed) subtree."""
    plan = _plan(spark, "bm25_search")
    assert "Join" not in plan, plan
    assert "InMemoryTableScan" in plan, plan


def test_zorder_rank_no_global_sort(spark):
    """The histogram-rank Morton key must NEVER plan a global sort:
    the row_number formulation funnels every row through one reducer
    (Exchange SinglePartition — measured), which is exactly what the
    histogram transform exists to avoid. The fact-side plan is the
    scan plus two broadcast map joins."""
    plan = _plan(spark, "zorder_rank_keys")
    assert "Exchange SinglePartition" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan


def test_q18_aggregate_reduces_before_joins(spark):
    """The Q18 shape's point: the HAVING aggregate runs BELOW the
    joins (lineitem reduces to qualifying keys first), and the
    qualifying side broadcasts — no fact-fact sort-merge."""
    plan = _plan(spark, "large_volume_customers")
    agg_at = plan.index("HashAggregate")
    join_at = plan.index("Join")
    assert join_at < agg_at  # consumers print first: join ABOVE agg
    assert "SortMergeJoin" not in plan, plan


def test_q13_outer_join_two_level_aggregate(spark):
    """Q13 keeps zero-order customers: a LEFT outer join feeding two
    aggregate levels — losing the outer side (an inner join) would
    silently drop the zero bucket."""
    plan = _plan(spark, "customer_order_distribution")
    assert "LeftOuter" in plan, plan
    assert plan.count("HashAggregate") >= 4  # 2 levels x partial+final


def test_q17_decorrelated_no_cartesian(spark):
    """The correlated-avg subquery must stay a decorrelated equi-join
    on l_partkey — a nested-loop/cartesian here is the O(N*M)
    regression the rewrite exists to avoid."""
    plan = _plan(spark, "small_quantity_revenue")
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    assert plan.count("Scan parquet") == 2  # base + per-part agg side


def test_q21_single_per_order_aggregate(spark):
    """The double correlation collapses to ONE per-order aggregate —
    more than one l_orderkey exchange on the aggregate side means
    the decorrelation regressed toward self-joins."""
    plan = _plan(spark, "sole_returning_suppliers")
    # 3 order-keyed exchanges total: the two-phase expand of the
    # double count-distinct (its own two) + the distinct returning
    # side — all aggregate-bounded; more means self-joins came back
    assert plan.count("Exchange hashpartitioning(l_orderkey") <= 3
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") == 1


def test_runtime_bloom_filter_injects_for_selective_shuffle_join(spark):
    """The session profile enables Catalyst's runtime bloom-filter
    join pruning: when a selective dim side cannot broadcast, a bloom
    filter over its join keys is pushed into the FACT side as a
    might_contain() predicate — the fact table is pre-filtered before
    its shuffle (semi-join reduction, the 100 TB lever for
    non-broadcastable dims). Pinned here with the build thresholds
    lowered to fire at test scale; production keeps Spark's defaults
    so the filter only builds when worth it."""
    from pyspark.sql import functions as F

    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    olds = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "10GB",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        events = load_table(spark, SF_SMOKE, "events")
        dim = (
            load_table(spark, SF_SMOKE, "events")
            .select("user_id")
            .distinct()
            .filter(F.col("user_id") % 50 == 3)
        )
        j = events.join(dim, "user_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # and the result is unaffected by the filter (it only prunes)
        expected = events.filter(F.col("user_id") % 50 == 3).count()
        assert j.count() == expected
    finally:
        for k, v in olds.items():
            spark.conf.set(k, v)


def test_decorrelation_gates_never_sort_merge(spark):
    """The four round-9 decorrelation shapes (Q2 argmin, Q11 global
    threshold, Q15 max-of-aggregate, Q14 conditional share) keep the
    fact side unshuffled for every JOIN: dims and scalars broadcast,
    zero SortMergeJoins; the only Exchanges are the shapes' own
    aggregations. The Q2 window min must reuse ONE part-key exchange
    (no per-step shuffles)."""
    for name in (
        "cheapest_supplier_per_part",
        "important_nation_revenue",
        "top_revenue_supplier",
        "promo_revenue_share",
    ):
        plan = _plan(spark, name)
        assert "SortMergeJoin" not in plan, name
        assert "Broadcast" in plan, name
    q2 = _plan(spark, "cheapest_supplier_per_part")
    # window + distinct over the same part key: hashpartitioning
    # exchanges only, and the broadcast part-dim filter is pushed to
    # the dim scan, not evaluated post-join
    assert q2.count("Exchange") <= 2, q2.count("Exchange")
    assert "PushedFilters: [IsNotNull(p_size), GreaterThan(p_size" in q2


def test_q20_q22_decorrelation_shapes(spark):
    """Round-9 Q20/Q22 additions: Q20's only SHUFFLE of raw lineitem
    is the (part, supplier) aggregate — the window total and the
    supplier-name join move reduced frames (part dim + supplier dim
    broadcast, no SortMergeJoin anywhere); Q22's scalar threshold is
    a broadcast nested-loop over a one-row aggregate and the
    shipdate/size filters reach the scans."""
    q20 = _plan(spark, "dominant_part_suppliers")
    assert "SortMergeJoin" not in q20
    assert "BroadcastHashJoin" in q20
    # lineitem scan keeps only the join/agg/filter columns — select
    # the lineitem ReadSchema explicitly (the first scan in the plan
    # text is not guaranteed to be lineitem)
    li_reads = [
        ln.split("ReadSchema:")[1]
        for ln in q20.splitlines()
        if "ReadSchema:" in ln and "lineitem" in ln
    ]
    assert li_reads, "no lineitem scan found in the q20 plan"
    read = li_reads[0]
    assert "l_extendedprice" not in read and "l_returnflag" not in read
    assert "PushedFilters: [IsNotNull(l_shipdate)" in q20
    # agg exchange + window exchange + final supplier-group exchange:
    # bounded, and every one moves a reduced frame
    assert q20.count("Exchange hashpartitioning") <= 3, q20.count(
        "Exchange hashpartitioning"
    )

    q22 = _plan(spark, "idle_rich_customers")
    # the (total, count) scalar broadcasts — never a shuffled join
    assert "BroadcastNestedLoopJoin" in q22
    # the NOT EXISTS is a true anti join against distinct keys
    assert "LeftAnti" in q22
    assert "SortMergeJoin" not in q22


def test_q12_q16_q19_plan_shapes(spark):
    """Q12: two-column shuffled payload (orders scan pruned to
    key+priority) and ONE aggregate pass. Q16: the NOT-IN blocklist
    is a broadcast anti-join, never a shuffled one. Q19: Catalyst
    extracts the per-side disjunctions from the OR-of-ANDs and
    pushes BOTH to their scans — the qty bounds reach lineitem, the
    brand/size arms reach part."""
    q12 = _plan(spark, "priority_line_counts")
    read = [
        ln for ln in q12.splitlines() if "ReadSchema" in ln and "orders" in ln
    ][0].split("ReadSchema:")[1]
    assert "o_totalprice" not in read and "o_custkey" not in read
    assert q12.count("HashAggregate") >= 2  # partial + final, one pass

    q16 = _plan(spark, "supplier_part_counts")
    assert "BroadcastHashJoin" in q16 and "LeftAnti" in q16
    assert "SortMergeJoin" not in q16

    q19 = _plan(spark, "disjunctive_brand_revenue")
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity" in q19, "qty bounds not pushed"
    assert "Or(Or(And(EqualTo(p_brand" in q19, "brand/size arms not pushed"
    assert "SortMergeJoin" not in q19


def test_residual_ivf_pq_same_plan_shape_as_raw(spark):
    """Residual encoding must not change the query plan class: the
    candidate join stays a BroadcastHashJoin on cent_id (probe side
    broadcast), never a SortMergeJoin — the residual arithmetic lives
    entirely inside projections."""
    plan = _plan(spark, "embedding_ivf_pq_res_topk")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan


def test_residual_encode_is_pure_projection(spark):
    """ivf_pq_encode_residual (assignment + residual + m argmins) must
    stay a zero-shuffle, zero-join projection against literal
    centroids/codebooks — one corpus scan at 100 TB, same contract as
    pq_encode."""
    from database_activity_monitoring_dam_system_spark.operators import similarity
    from database_activity_monitoring_dam_system_spark.sources.testdata import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = similarity.ivf_centroids(emb, n_centroids=8, refine_iters=0)
    books = similarity.pq_train_residual(
        emb, cents, m=4, ksub=8, iters=1, dim=64
    )
    plan = (
        similarity.ivf_pq_encode_residual(
            emb, centroids=cents, codebooks=books, dim=64
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_containment_sketch_bounded_shuffles(spark):
    """The sketch estimator's scale contract vs the exact prefix join:
    the bottom-k sketch is a PURE PROJECTION (no document-frequency
    aggregate, no rank window — the exact path needs both), so the
    whole plan carries no Window node and only the candidate-join +
    count-aggregate exchanges."""
    plan = _plan(spark, "containment_minhash_md5")
    assert "Window" not in plan          # no df-rank stage anywhere
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or \
        "BroadcastHashJoin" in plan      # the candidate join exists
    # exact path for contrast: its substrate needs the df-rank window
    exact = _plan(spark, "containment_pairs")
    assert "Window" in exact


def test_rows_only_specs_are_all_deferred():
    """Registry invariant: every oracle-less (rows-only) spec must be
    in _DRIVER_DEFER — that's what guarantees it is emitted last AND
    gets its one-time post-window driver slot (position 51+) from the
    rotation generator.  A rows-only spec outside the defer list would
    silently land mid-window as an ambiguous no_oracle row (caught in
    round 10: containment_minhash_est)."""
    from database_activity_monitoring_dam_system_spark.plans import registry

    rows_only = {n for n, s in all_queries().items() if s.oracle is None}
    assert rows_only == set(registry._DRIVER_DEFER), (
        rows_only ^ set(registry._DRIVER_DEFER)
    )


def test_never_seen_defer_gates_front_outside_driver_window(monkeypatch):
    """Adding a brand-new rows-only gate to _DRIVER_DEFER must leave
    the generated first-DRIVER_WINDOW (50) entries all-full-oracle:
    the never-seen defer gate is inserted at position 50 — first among
    the overflow so the driver records its rows-only row if the window
    ever widens, but never displacing a value-hash slot.  Round 10
    paid exactly one window slot for an unverifiable no_oracle row
    under the old front-at-0 policy; this pins the fix."""
    import importlib.util
    import pathlib

    tool_path = (
        pathlib.Path(__file__).resolve().parent.parent
        / "tools"
        / "rotate_priority.py"
    )
    spec = importlib.util.spec_from_file_location("rotate_priority2", tool_path)
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    from database_activity_monitoring_dam_system_spark.plans import registry

    synthetic = "synthetic_rows_only_gate_for_window_test"
    # snapshot oracles BEFORE patching — all_queries() validates the
    # defer list against the registry, so it must run unpatched
    oracles = {n: s.oracle for n, s in all_queries().items()}
    monkeypatch.setattr(
        registry,
        "_DRIVER_DEFER",
        registry._DRIVER_DEFER + (synthetic,),
    )
    ordered, _ = tool.generate(
        rounds=registry._DRIVER_PRIORITY_SOURCE_ROUNDS
    )
    window = ordered[: tool.DRIVER_WINDOW]
    assert synthetic not in window
    # the never-seen defer block starts AT the window boundary; other
    # genuinely-never-seen defer gates (e.g. a just-added rows-only
    # gate awaiting its first driver round) share it
    idx = ordered.index(synthetic)
    never_seen = [
        n for n in registry._DRIVER_DEFER
        if n not in tool.last_green_rounds(
            registry._DRIVER_PRIORITY_SOURCE_ROUNDS
        )[1]
    ]
    assert tool.DRIVER_WINDOW <= idx < tool.DRIVER_WINDOW + len(never_seen)
    # every in-window entry is a full-oracle gate (has a DuckDB oracle)
    assert all(oracles.get(n) is not None for n in window), [
        n for n in window if oracles.get(n) is None
    ]
