"""Bin-bucketed interval (range) join.

Spark has no native range-join operator: a plain ``ts BETWEEN start
AND end`` join plans as BroadcastNestedLoopJoin — O(N·M) comparisons
and a driver-killer the moment the interval side stops being tiny.
The standard scale rewrite (what Databricks' range-join hint does
internally) is implemented here with public DataFrame ops only:

1. quantize both sides to coarse time bins of ``bin_seconds``:
   an event belongs to exactly ONE bin; an interval is exploded to
   EVERY bin it overlaps (``sequence(floor(start/w), floor(end/w))``,
   linear in interval length / bin width);
2. equi-join on (bin [, key]) — a hash join Catalyst can shuffle OR
   broadcast, and AQE can skew-split;
3. re-check the exact bounds as a post-join filter.

Each (event, interval) pair meets in exactly one bin (the event's),
so no dedup pass is needed. Cost: |events| + Σ⌈len/width⌉ exploded
interval rows through one equi-join — pick ``bin_seconds`` near the
median interval length so the explosion factor stays O(1).

The reference has no range join (SURVEY.md §2.3 notes none exist);
this is an engine extension in the same family as the as-of join
(operators/asof.py) for log-vs-maintenance-window analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    *,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_seconds: int = 3600,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join events to the intervals containing them:
    ``interval.start <= event.ts < interval.end`` (half-open, the log
    convention), optionally also equi-matched on ``keys``.

    ``how='inner'`` keeps matched pairs; ``'left'`` keeps unmatched
    events with NULL interval columns (interval cols must not collide
    with event cols).
    """
    w = float(bin_seconds)
    ev_bin = F.floor(F.col(ts_col).cast("double") / w)
    iv_start_bin = F.floor(F.col(start_col).cast("double") / w)
    # half-open end: the end-instant itself needs no bin
    iv_end_bin = F.floor(
        (F.col(end_col).cast("double") - F.lit(1e-6)) / w
    )
    binned_iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(iv_start_bin, F.greatest(iv_end_bin, iv_start_bin))
        ),
    )
    binned_ev = events.withColumn("_bin", ev_bin)
    on = ["_bin", *(keys or [])]
    bounds = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) < F.col(end_col)
    )
    matched = binned_ev.join(binned_iv, on, "inner").filter(bounds).drop(
        "_bin"
    )
    if how == "inner":
        return matched
    if how != "left":
        raise ValueError(f"unsupported how={how!r}")
    # left = matched pairs ∪ events with no containing interval (anti
    # on the matched event rows), interval columns NULL. The anti-join
    # must be NULL-SAFE: with plain equality a matched event carrying a
    # NULL in any column would never anti-filter and would be emitted a
    # second time as an unmatched row.
    iv_cols = [c for c in intervals.columns if c not in (keys or [])]
    m = matched.select(*events.columns).alias("m")
    ev = events.alias("e")
    anti_cond = None
    for c in events.columns:
        eq = F.col(f"e.{c}").eqNullSafe(F.col(f"m.{c}"))
        anti_cond = eq if anti_cond is None else (anti_cond & eq)
    unmatched = ev.join(m, anti_cond, "left_anti")
    for c, t in intervals.dtypes:
        if c in iv_cols:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(t))
    return matched.unionByName(unmatched)
