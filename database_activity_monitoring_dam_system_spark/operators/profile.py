"""Data-profiling operators: key-skew reports, value histograms, and
exact-integer correlation — the diagnostics a pipeline runs BEFORE
committing to a partitioning/join strategy (the skew report is
literally the measurement that decides when operators/skew.py's
salting is worth its extra shuffle).

All three follow the engine's cross-engine-determinism discipline:
integer counting/binning until one final fixed float expression,
rounded for output — so every gate is a full value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    *,
    top_n: int = 10,
) -> DataFrame:
    """Per-key row counts for the ``top_n`` heaviest keys plus each
    key's share of ALL rows — the hot-key diagnostic read before any
    join/groupBy on that key (a >5 % single-key share is where AQE
    skew handling or salting starts paying).

    One map-side-combined count shuffle; ranking runs over the
    AGGREGATED key table only; output is ≤ top_n rows regardless of
    input size. ``share`` uses a window total so the report needs no
    second pass over the data.
    """
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))
    w_all = Window.partitionBy()
    # NULLS LAST to match the oracle convention (Spark's bare asc
    # sorts NULL keys first; DuckDB's default sorts them last)
    w_rank = Window.orderBy(
        F.desc("cnt"), *[F.asc_nulls_last(c) for c in key_cols]
    )
    return (
        counts.withColumn("_total", F.sum("cnt").over(w_all))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= top_n)
        .select(
            "rank",
            *key_cols,
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
        )
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    *,
    bin_width: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram: ``bin = floor(value / bin_width)`` (one
    deterministic double division per row — identical IEEE result in
    any engine), counts per bin, NULL values reported as a NULL bin
    rather than silently dropped. One map-side-combined shuffle on
    (groups, bin); output bounded by value range / bin_width.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    groups = list(group_cols or [])
    binned = df.select(
        *groups,
        F.floor(F.col(value_col) / F.lit(float(bin_width)))
        .cast("bigint")
        .alias("bin"),
    )
    return (
        binned.groupBy(*groups, "bin")
        .agg(F.count("*").alias("cnt"))
        .select(
            *groups,
            "bin",
            F.round(F.col("bin") * F.lit(float(bin_width)), 6).alias(
                "bin_start"
            ),
            "cnt",
        )
    )


def pearson_corr_exact(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_cols: list[str] | None = None,
    scale: int = 3,
) -> DataFrame:
    """Pearson correlation with the engine's float-parity recipe:
    both variables quantize to integers (``floor(v·10^scale)``), the
    five moments accumulate as EXACT DECIMAL(38,0) sums (associative,
    partition-order-independent — unlike a double sum, which is why
    built-in ``corr()`` can't be hash-pinned across engines), and r
    comes out of ONE fixed expression over those integers, rounded
    to 6. Rows where either side is NULL are excluded (the standard
    pairwise-complete rule).

    One map-side-combined shuffle; output is one row per group.
    ``r`` is the correlation of the QUANTIZED values — at scale=3
    the quantization perturbs r by O(10^-scale/σ), documented rather
    than hidden.
    """
    groups = list(group_cols or [])
    mult = float(10**scale)
    xi = F.floor(F.col(x_col) * mult).cast("long")
    yi = F.floor(F.col(y_col) * mult).cast("long")
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*groups, xi.alias("_x"), yi.alias("_y"))
    # per-row products fit int64 (|v|·10^scale ≤ ~2^31 each); the
    # SUMS accumulate as DECIMAL(38,0) — a bigint sum would silently
    # wrap past 2^63 at ~10^7 rows × (5·10^5)² while the oracle's
    # HUGEINT hard-errors: wrong on one engine, crash on the other.
    # 38 digits bounds exactness at ~10^38, unreachable in practice.
    dec = "decimal(38,0)"
    agg = base.groupBy(*groups).agg(
        F.count("*").alias("n"),
        F.sum(F.col("_x").cast(dec)).alias("sx"),
        F.sum(F.col("_y").cast(dec)).alias("sy"),
        F.sum((F.col("_x") * F.col("_x")).cast(dec)).alias("sxx"),
        F.sum((F.col("_y") * F.col("_y")).cast(dec)).alias("syy"),
        F.sum((F.col("_x") * F.col("_y")).cast(dec)).alias("sxy"),
    )
    # ONE fixed left-assoc double expression over exact integers; the
    # bigint→double conversions are IEEE-defined and engine-identical
    num = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    den = F.sqrt(
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        F.col("n").cast("double") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return agg.select(
        *groups,
        "n",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("r"),
    )
