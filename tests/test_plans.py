"""Physical-plan invariants (SURVEY.md §4): these assertions fail if a
refactor silently degrades the plan — the filter stops reaching the
scan, a dimension stops broadcasting, or an aggregate loses its
map-side partial phase.
"""

from __future__ import annotations

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
