"""Mergeable multi-resolution time rollups (continuous-aggregate /
hypertable pattern): raw events reduce ONCE into fine-grain partial
aggregates; every coarser resolution derives from partials by MERGE,
never by re-scanning raw data.

Why this matters at 100 TB: the raw event stream is touched exactly
once per refresh window (one map-side-combined groupBy into minute
partials — a table ~10^4-10^5× smaller than the raw events); hourly /
daily / monthly views are then partial-merges over that small table,
and a late event only dirties its single minute bucket, after which
the affected coarse buckets re-merge locally. This is the
TimescaleDB continuous-aggregate / Druid rollup-segment design,
re-expressed as plain DataFrame algebra.

The partial state is the classic decomposable-aggregate tuple
(count, sum, min, max): every field merges associatively —
sum-of-sums, min-of-mins — so merging is partition-order-independent.
Sums are kept EXACT by integer millis (floor(value·1000) per row at
partial-build time): bigint sums are associative-exact, unlike double
sums, which is what makes hour-from-minute ≡ direct-from-raw
bit-for-bit (asserted by the gate and tests).

Reference parity note: the reference's dashboards recompute each
timeline from the raw activity table per request
(/root/reference/app.py:1090-1105); this module is the
materialized-rollup upgrade of that pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..ckpt import register as _ckpt_register

_GRAIN_ORDER = ("minute", "hour", "day", "month")


def _check_grain(grain: str) -> None:
    if grain not in _GRAIN_ORDER:
        raise ValueError(
            f"grain must be one of {_GRAIN_ORDER}, got {grain!r}"
        )


def time_partials(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "minute",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Reduce raw events to ``grain`` partial aggregates — the ONE
    pass that touches raw data. Output per (bucket_ts, *group_cols):
    ``n_events``, ``sum_millis`` / ``min_millis`` / ``max_millis``
    (exact integer millis of the value column). One shuffle with
    map-side combine; output size is bounded by buckets × groups,
    not by event count."""
    _check_grain(grain)
    groups = list(group_cols or [])
    millis = F.floor(F.col(value_col) * 1000).cast("long")
    return (
        events.select(
            F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts"),
            *groups,
            millis.alias("_millis"),
        )
        .groupBy("bucket_ts", *groups)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("_millis").alias("sum_millis"),
            F.min("_millis").alias("min_millis"),
            F.max("_millis").alias("max_millis"),
        )
    )


def rollup_partials(
    partials: DataFrame,
    *,
    to_grain: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge fine-grain partials into ``to_grain`` partials WITHOUT
    touching raw data: re-truncate the bucket, then the associative
    merge (sum-of-sums, sum-of-counts, min-of-mins, max-of-maxes).
    Chaining minute→hour→day is exactly ≡ one direct day aggregation
    because every field is decomposable and the sums are integer-
    exact (gate-pinned)."""
    _check_grain(to_grain)
    groups = list(group_cols or [])
    return (
        partials.select(
            F.date_trunc(to_grain, F.col("bucket_ts")).alias("bucket_ts"),
            *groups,
            "n_events",
            "sum_millis",
            "min_millis",
            "max_millis",
        )
        .groupBy("bucket_ts", *groups)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_millis").alias("sum_millis"),
            F.min("min_millis").alias("min_millis"),
            F.max("max_millis").alias("max_millis"),
        )
    )


def finalize_rollup(
    partials: DataFrame,
    *,
    group_cols: list[str] | None = None,
    bucket_format: str = "yyyy-MM-dd HH:mm",
) -> DataFrame:
    """Present a partial table: formatted bucket string (the timeline
    gates' convention), count, and value stats recovered from the
    exact integer state — avg as ONE division pinned by round(…, 6),
    min/max as exact millis/1000 (3 decimals carry no float error
    beyond the shared representation both engines print
    identically)."""
    groups = list(group_cols or [])
    return partials.select(
        F.date_format("bucket_ts", bucket_format).alias("time_bucket"),
        *groups,
        "n_events",
        "sum_millis",
        F.round(
            F.col("sum_millis") / (F.col("n_events") * F.lit(1000.0)), 6
        ).alias("avg_value"),
        F.round(F.col("min_millis") / 1000.0, 3).alias("v_min"),
        F.round(F.col("max_millis") / 1000.0, 3).alias("v_max"),
    )


def distinct_partials(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    distinct_col: str = "user_id",
    grain: str = "minute",
    group_cols: list[str] | None = None,
    bucket_bits: int = 8,
) -> DataFrame:
    """DISTINCT-count rollup state: per fine-grain bucket, the HLL
    registers of ``distinct_col`` (sketches.hll_registers). Raw
    distinct counts are the one classic aggregate that does NOT
    decompose — count_distinct(day) ≠ Σ count_distinct(minutes) —
    but HLL registers DO (register-wise max), so this is the partial
    that makes "distinct users per hour/day" a merge over the small
    partials table instead of a re-scan of raw events. At most
    2^bucket_bits register rows per (bucket, group).

    The frame carries its geometry as a ``_bucket_bits`` column so a
    later :func:`rollup_distinct` at mismatched ``bucket_bits`` fails
    loudly instead of producing silently-wrong estimates (the same
    discipline as sketches.bloom_merge's geometry check)."""
    _check_grain(grain)
    from . import sketches

    groups = list(group_cols or [])
    df = events.select(
        F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts"),
        *groups,
        distinct_col,
    )
    return sketches.hll_registers(
        df, ["bucket_ts", *groups], distinct_col, bucket_bits=bucket_bits
    ).withColumn("_bucket_bits", F.lit(bucket_bits))


def rollup_distinct(
    partials: DataFrame,
    *,
    to_grain: str,
    group_cols: list[str] | None = None,
    bucket_bits: int = 8,
) -> DataFrame:
    """Merge fine-grain HLL register partials into ``to_grain``
    estimates: re-truncate the bucket, register-wise max, finalize.
    EXACTLY ≡ running the HLL directly over raw events at the coarse
    grain (the merge law; gate-pinned bit-for-bit on the
    harmonic_scaled integer).

    When the partials carry the ``_bucket_bits`` geometry column
    (:func:`distinct_partials` always writes it), every row asserts
    it equals the requested ``bucket_bits`` IN-PLAN (zero extra jobs;
    the assert lives in a filter so Catalyst cannot prune it) —
    finalizing 12-bit registers with the default m=256 would
    otherwise yield negative zero-register counts and garbage
    estimates with no error."""
    _check_grain(to_grain)
    from . import sketches

    groups = list(group_cols or [])
    keep_meta = "_bucket_bits" in partials.columns
    retrunc = partials.select(
        F.date_trunc(to_grain, F.col("bucket_ts")).alias("bucket_ts"),
        *groups,
        "_bucket",
        "_r",
        *(["_bucket_bits"] if keep_meta else []),
    )
    if keep_meta:
        retrunc = retrunc.where(
            F.assert_true(
                F.col("_bucket_bits") == F.lit(bucket_bits),
                F.concat(
                    F.lit(
                        "rollup_distinct: partials were built with "
                        "bucket_bits="
                    ),
                    F.col("_bucket_bits").cast("string"),
                    F.lit(f", not the requested {bucket_bits}"),
                ),
            ).isNull()
        ).drop("_bucket_bits")
    merged = sketches.hll_merge_registers(retrunc, ["bucket_ts", *groups])
    return sketches.hll_finalize(
        merged, ["bucket_ts", *groups], bucket_bits=bucket_bits
    )


def value_quantile_partials(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "minute",
    group_cols: list[str] | None = None,
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 256,
) -> DataFrame:
    """Quantile rollup state: per fine-grain bucket, a fixed-bin
    equi-width histogram of the value column. Quantiles are the other
    classic non-decomposable aggregate (p99(day) is not a function of
    per-minute p99s) — but histogram COUNTS are pure sums, so a
    fixed, shared bin grid makes per-bucket histograms a mergeable
    quantile state (the t-digest role, in exact integer arithmetic).

    The grid is integer-exact end to end: values quantize to millis,
    bin = clamp((millis - lo_millis)·bins DIV span, [0, bins-1]) —
    no float division anywhere, so fold-of-minutes ≡ direct coarse
    histogram bit-for-bit. Out-of-range values clamp into the edge
    bins (their mass is counted; their position saturates). At most
    ``bins`` rows per (bucket, group); estimate resolution is
    span/bins (pick lo/hi for the column's working range).

    Geometry travels WITH the frame (``_lo_millis``/``_span_millis``/
    ``_bins`` columns) and :func:`rollup_quantiles` asserts it
    in-plan, same discipline as the HLL ``_bucket_bits`` stamp."""
    _check_grain(grain)
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    lo_m = int(lo * 1000)
    hi_m = int(hi * 1000)
    span = hi_m - lo_m
    if span <= 0:
        raise ValueError(f"need hi > lo, got lo={lo}, hi={hi}")
    groups = list(group_cols or [])
    millis = F.floor(F.col(value_col) * 1000).cast("long")
    df = events.select(
        F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts"),
        *groups,
        millis.alias("_millis"),
    )
    bin_expr = F.expr(
        f"least({bins - 1}L, greatest(0L, (_millis - {lo_m}L) * {bins}L div {span}L))"
    )
    return (
        # NULL values are EXCLUDED, not binned: a NULL bin would sort
        # NULLS FIRST under Spark's cumulative window but NULLS LAST
        # in SQL engines' default (the documented cross-engine
        # ordering trap), silently dragging every percentile — a
        # quantile of the non-null values is also the only
        # well-defined semantics
        df.filter(F.col("_millis").isNotNull())
        .select("bucket_ts", *groups, bin_expr.alias("bin"))
        .groupBy("bucket_ts", *groups, "bin")
        .agg(F.count("*").alias("n"))
        .withColumn("_lo_millis", F.lit(lo_m).cast("long"))
        .withColumn("_span_millis", F.lit(span).cast("long"))
        .withColumn("_bins", F.lit(bins))
    )


def variance_partials(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "minute",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable MOMENT state per time bucket — (n, Σx, Σx²) in exact
    integer millis — the third classic rollup state beside histogram
    bins (quantiles) and HLL registers (distincts): mean, variance,
    stddev, and z-scores all derive from sums, so hour-from-minute is
    exact by the same fold law. Σx² accumulates in DECIMAL(38,0)
    (millis² × row counts wraps BIGINT at real scale — the
    table-checksum lesson); Σx stays BIGINT (5e5 millis × 10^12 rows
    still fits). The DECIMAL column lives only in the PARTIALS
    table — :func:`rollup_variance` emits doubles, never a
    DecimalType gate output."""
    _check_grain(grain)
    groups = list(group_cols or [])
    millis = F.floor(F.col(value_col) * 1000).cast("long")
    return (
        events.select(
            F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts"),
            *groups,
            millis.alias("_m"),
        )
        .filter(F.col("_m").isNotNull())
        .groupBy("bucket_ts", *groups)
        .agg(
            F.count("*").alias("n_values"),
            F.sum("_m").alias("sum_millis"),
            F.sum(
                (F.col("_m").cast("decimal(38,0)") * F.col("_m"))
            ).alias("_sumsq_millis"),
        )
    )


def rollup_variance(
    partials: DataFrame,
    *,
    to_grain: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Serve mean / population-stddev per ``to_grain`` bucket from
    merged moment partials — no raw re-scan. Everything is exact
    integer sums until ONE fixed float expression per statistic
    (identical text in the oracle): mean = Σx/n, var = Σx²/n −
    (Σx/n)², guarded non-negative against rounding, sqrt is IEEE
    correctly-rounded in both engines. The DOUBLE cast of the
    DECIMAL Σx² rounds identically cross-engine (nearest double of
    the same exact integer — the value_correlation discipline), so
    the gate is a full hash comparison."""
    _check_grain(to_grain)
    groups = list(group_cols or [])
    merged = merge_variance_partials(
        partials.select(
            F.date_trunc(to_grain, F.col("bucket_ts")).alias("bucket_ts"),
            *groups,
            "n_values",
            "sum_millis",
            "_sumsq_millis",
        ),
        group_cols=groups,
    )
    mean = (
        "CAST(sum_millis AS DOUBLE) / CAST(n_values AS DOUBLE)"
        " / CAST(1000 AS DOUBLE)"
    )
    var_m = (
        "CAST(_sumsq_millis AS DOUBLE) / CAST(n_values AS DOUBLE)"
        " - (CAST(sum_millis AS DOUBLE) / CAST(n_values AS DOUBLE))"
        " * (CAST(sum_millis AS DOUBLE) / CAST(n_values AS DOUBLE))"
    )
    std = (
        f"sqrt(greatest(CAST(0 AS DOUBLE), {var_m}))"
        " / CAST(1000 AS DOUBLE)"
    )
    return merged.select(
        "bucket_ts",
        *groups,
        "n_values",
        F.expr(f"round({mean}, 6)").alias("mean_value"),
        F.expr(f"round({std}, 6)").alias("std_value"),
    )


def merge_variance_partials(
    partials: DataFrame, *, group_cols: list[str] | None = None
) -> DataFrame:
    """The moment fold law in one place (grain merge in
    rollup_variance, fragment merge in the streaming compactor):
    all three moments are sums."""
    groups = list(group_cols or [])
    return partials.groupBy("bucket_ts", *groups).agg(
        F.sum("n_values").alias("n_values"),
        F.sum("sum_millis").alias("sum_millis"),
        F.sum("_sumsq_millis").alias("_sumsq_millis"),
    )


def merge_quantile_partials(
    partials: DataFrame, *, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold fragments of a quantile-partials table at its OWN grain:
    bin counts are sums on a shared grid, so the merge is one
    groupBy — with the geometry stamps (``_lo_millis`` /
    ``_span_millis`` / ``_bins``) kept as GROUP KEYS, which preserves
    their exact types and means mixed-geometry fragments come out as
    separate rows instead of silently summed (the caller's
    single-valued stamp check still decides whether that's an
    error). The one merge law shared by the streaming compactor and
    any fragment consumer."""
    groups = list(group_cols or [])
    stamps = [
        c
        for c in ("_lo_millis", "_span_millis", "_bins")
        if c in partials.columns
    ]
    return partials.groupBy(
        "bucket_ts", *groups, "bin", *stamps
    ).agg(F.sum("n").alias("n"))


def _merged_bins(
    partials: DataFrame,
    *,
    to_grain: str,
    group_cols: list[str] | None,
    percents: tuple[int, ...],
    lo: float,
    hi: float,
    bins: int,
    caller: str,
):
    """Shared front half of the quantile serving paths: validate,
    re-truncate to ``to_grain`` with the in-plan geometry-stamp
    assert, merge the bin counts, and cumulate them (the per-group
    running and total sums BOTH estimators read their crossings
    from — shared here so the two paths cannot drift over the same
    partials). Returns (cum frame, group keys, lo_millis,
    span_millis); the cum frame carries bin, _cum, _total."""
    _check_grain(to_grain)
    if not percents or any(not 1 <= p <= 100 for p in percents):
        raise ValueError(f"percents must be ints in [1, 100]: {percents}")
    lo_m = int(lo * 1000)
    span = int(hi * 1000) - lo_m
    groups = list(group_cols or [])
    meta = ("_lo_millis", "_span_millis", "_bins")
    keep_meta = all(c in partials.columns for c in meta)
    retrunc = partials.select(
        F.date_trunc(to_grain, F.col("bucket_ts")).alias("bucket_ts"),
        *groups,
        "bin",
        "n",
        *(meta if keep_meta else ()),
    )
    if keep_meta:
        retrunc = retrunc.where(
            F.assert_true(
                (F.col("_lo_millis") == F.lit(lo_m))
                & (F.col("_span_millis") == F.lit(span))
                & (F.col("_bins") == F.lit(bins)),
                F.concat(
                    F.lit(
                        f"{caller}: partials were built with "
                        "(lo_millis, span_millis, bins)=("
                    ),
                    F.col("_lo_millis").cast("string"),
                    F.lit(", "),
                    F.col("_span_millis").cast("string"),
                    F.lit(", "),
                    F.col("_bins").cast("string"),
                    F.lit(f"), not the requested ({lo_m}, {span}, {bins})"),
                ),
            ).isNull()
        ).drop(*meta)
    merged = retrunc.groupBy("bucket_ts", *groups, "bin").agg(
        F.sum("n").alias("n")
    )
    keys = ["bucket_ts", *groups]
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    cum = merged.select(
        *keys,
        "bin",
        F.sum("n").over(w_cum).alias("_cum"),
        F.sum("n").over(w_all).alias("_total"),
    )
    return cum, keys, lo_m, span


def rollup_quantiles(
    partials: DataFrame,
    *,
    to_grain: str,
    group_cols: list[str] | None = None,
    percents: tuple[int, ...] = (50, 90, 99),
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 256,
) -> DataFrame:
    """Merge fine-grain histogram partials into ``to_grain`` quantile
    estimates: re-truncate the bucket, sum the bins, then read each
    percentile off the cumulative histogram. EXACTLY ≡ histogramming
    raw events directly at the coarse grain (counts are sums; the
    grid is shared), which is what the gate pins.

    ``percents`` are INTEGER percents and the crossing threshold is
    ceil(p·total/100) in pure integer math; the reported estimate is
    the LOWER EDGE of the crossing bin (exact millis / 1000) — every
    hashed byte is determined by integer arithmetic. One shuffle
    (bucket, groups) shared by the merge and both windows.

    Mismatched geometry (different lo/hi/bins than the partials were
    built with) would silently shift every estimate — asserted
    in-plan against the frame's own geometry stamp."""
    cum, keys, lo_m, span = _merged_bins(
        partials, to_grain=to_grain, group_cols=group_cols,
        percents=percents, lo=lo, hi=hi, bins=bins,
        caller="rollup_quantiles",
    )
    # ceil(p*total/100) in integer math: (p*total + 99) div 100
    agg_cols = [F.max("_total").alias("n_values")]
    for p in percents:
        thr = F.expr(f"(_total * {p}L + 99L) div 100L")
        agg_cols.append(
            F.min(F.when(F.col("_cum") >= thr, F.col("bin"))).alias(
                f"_bin_p{p}"
            )
        )
    per_group = cum.groupBy(*keys).agg(*agg_cols)
    out_cols = [*keys, "n_values"]
    for p in percents:
        edge = F.expr(f"{lo_m}L + _bin_p{p} * {span}L div {bins}L")
        out_cols.append(
            F.round(edge / 1000.0, 3).alias(f"p{p}_value")
        )
    return per_group.select(*out_cols)


def rollup_quantiles_interp(
    partials: DataFrame,
    *,
    to_grain: str,
    group_cols: list[str] | None = None,
    percents: tuple[int, ...] = (50, 90, 99),
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 256,
) -> DataFrame:
    """The INTERPOLATED twin of :func:`rollup_quantiles` over the
    very same partials: instead of snapping to the crossing bin's
    lower edge (a one-sided estimator that can sit a full bin width
    below the true quantile), this reads the weighted-multiset
    linear-interpolation percentile of the bin edges — the estimator
    lands BETWEEN edges, with |estimate − true quantile| ≤ one bin
    width (span/bins) always, because every value's distance to its
    bin edge is under one bin. Users pick: hash-stable lower edges
    (``rollup_quantiles``) for alert thresholds that must never
    flap, interpolation here for dashboards that want the smoother
    curve; :func:`quantiles_gk` is the third option when no partials
    are maintained at all.

    Rank math stays integer-exact: the 0-indexed position
    p·(total−1)/100 splits into lower rank (integer div), upper rank
    (integer ceil) and an EXACT rational fraction (mod)/100 — no
    float floor anywhere — and the two edge lookups are the same
    cumulative-crossing min() trick as the grid estimator. The ONLY
    float arithmetic is one fixed expression per percent
    (edge_lo + (edge_hi − edge_lo)·frac/100, then /1000, round 6)
    written with identical text in the oracle, so the gate is a full
    hash comparison despite the interpolation."""
    cum, keys, lo_m, span = _merged_bins(
        partials, to_grain=to_grain, group_cols=group_cols,
        percents=percents, lo=lo, hi=hi, bins=bins,
        caller="rollup_quantiles_interp",
    )
    agg_cols = [F.max("_total").alias("n_values")]
    for p in percents:
        # 0-indexed interpolation position p*(total-1)/100, kept as
        # exact integers: lower rank, upper rank, fraction*100
        lo_rank = F.expr(f"(_total - 1L) * {p}L div 100L")
        hi_rank = F.expr(f"((_total - 1L) * {p}L + 99L) div 100L")
        agg_cols += [
            F.min(
                F.when(F.col("_cum") >= lo_rank + 1, F.col("bin"))
            ).alias(f"_bl_p{p}"),
            F.min(
                F.when(F.col("_cum") >= hi_rank + 1, F.col("bin"))
            ).alias(f"_bh_p{p}"),
            F.max(F.expr(f"(_total - 1L) * {p}L % 100L")).alias(
                f"_f_p{p}"
            ),
        ]
    per_group = cum.groupBy(*keys).agg(*agg_cols)
    out_cols = [*keys, "n_values"]
    for p in percents:
        vl = f"({lo_m}L + _bl_p{p} * {span}L div {bins}L)"
        vh = f"({lo_m}L + _bh_p{p} * {span}L div {bins}L)"
        out_cols.append(
            F.expr(
                f"round((CAST({vl} AS DOUBLE) + CAST({vh} - {vl} AS "
                f"DOUBLE) * CAST(_f_p{p} AS DOUBLE) / CAST(100 AS "
                f"DOUBLE)) / CAST(1000 AS DOUBLE), 6)"
            ).alias(f"p{p}_interp")
        )
    return per_group.select(*out_cols)


def quantiles_gk(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "day",
    group_cols: list[str] | None = None,
    percents: tuple[int, ...] = (50, 90, 99),
    accuracy: int = 10_000,
) -> DataFrame:
    """The no-partials quantile path: Spark's Greenwald-Khanna sketch
    (``percentile_approx``) straight over raw events at the serving
    grain. Error is bounded in RANK — the returned value's rank is
    within total/``accuracy`` of the target rank (the GK guarantee),
    at O(accuracy) state per group regardless of data volume —
    where the histogram rollup's error is bounded in VALUE (one bin
    width) and costs maintained partials. Pick by what you can
    bound: known value range → partials + :func:`rollup_quantiles` /
    :func:`rollup_quantiles_interp`; unknown range or ad-hoc column
    → this. Engine-internal sketch ⇒ rows-only oracle (the gate pins
    schema, group count, and the rank bound is test-asserted)."""
    _check_grain(grain)
    if not percents or any(not 1 <= p <= 100 for p in percents):
        raise ValueError(f"percents must be ints in [1, 100]: {percents}")
    groups = list(group_cols or [])
    pcts = ", ".join(f"CAST({p} AS DOUBLE) / CAST(100 AS DOUBLE)" for p in percents)
    df = events.select(
        F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts"),
        *groups,
        F.col(value_col).alias("_v"),
    ).filter(F.col("_v").isNotNull())
    aggs = [
        F.count("*").alias("n_values"),
        F.expr(
            f"percentile_approx(_v, array({pcts}), {accuracy})"
        ).alias("_q"),
    ]
    out = df.groupBy("bucket_ts", *groups).agg(*aggs)
    return out.select(
        "bucket_ts",
        *groups,
        "n_values",
        *[
            F.round(F.col("_q").getItem(i), 6).alias(f"p{p}_gk")
            for i, p in enumerate(percents)
        ],
    )


def gapfill_buckets(
    partials: DataFrame,
    *,
    grain: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Densify a partials timeline: emit EVERY ``grain`` bucket
    between each group's first and last observed bucket, with
    zero-filled metrics and an ``is_gap`` flag for the synthesized
    rows — dashboards and downstream window functions (moving
    averages, deltas) silently mis-compute over missing buckets
    otherwise.

    Shape: one tiny per-group span aggregate → sequence() explode of
    the bucket grid (bounded by span/grain, never by event count) →
    one left join back to the partials on (bucket, groups). All three
    steps are partials-sized — gap filling composes AFTER the rollup
    reduction, where the data is small.

    The partials frame is consumed by TWO branches (the span
    aggregate and the join), and Spark re-executes a shared subtree
    per consumer — for inline-computed partials that would re-scan
    the raw events twice (measured: two parquet scans in the plan).
    The frame is therefore materialized once via an eager
    localCheckpoint: partials are bounded by buckets × groups by
    contract, so the materialization is small, and the plan test
    asserts the raw scan count stays at zero afterwards."""
    _check_grain(grain)
    groups = list(group_cols or [])
    partials = partials.localCheckpoint(eager=True).transform(_ckpt_register)
    metrics = [c for c in partials.columns if c not in ("bucket_ts", *groups)]
    spans = partials.groupBy(*groups).agg(
        F.min("bucket_ts").alias("_b0"), F.max("bucket_ts").alias("_b1")
    )
    grid = spans.select(
        *groups,
        F.explode(
            F.expr(f"sequence(_b0, _b1, interval 1 {grain})")
        ).alias("bucket_ts"),
    )
    joined = grid.join(partials, on=["bucket_ts", *groups], how="left")
    zero_filled = [
        F.coalesce(F.col(c), F.lit(0)).alias(c)
        if c in ("n_events", "sum_millis", "n")
        else F.col(c)
        for c in metrics
    ]
    return joined.select(
        "bucket_ts",
        *groups,
        *zero_filled,
        F.col(metrics[0]).isNull().alias("is_gap"),
    )
