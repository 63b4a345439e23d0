"""Z-order (Morton) clustering: interleave the bits of two integer
dimensions so ONE sort key preserves locality in BOTH — the
multi-dimensional file-clustering trick (Delta/Iceberg OPTIMIZE
ZORDER) on plain parquet.

Why it matters at 100 TB: parquet scan pruning is min/max-stat
pruning per file. A table laid out by one column answers range
predicates on that column with few files but degenerates to a full
scan for the other dimension. Sorting by the Morton key bounds every
file's footprint in BOTH dimensions (each file covers a small Z-curve
segment ⊂ a small rectangle), so 2-D range predicates — user × time,
key × value — prune on both. The key is pure integer bit algebra:
deterministic, engine-neutral, zero-shuffle to compute; the one wide
op in ``write_zordered`` is the range repartition any re-layout pays.

Inputs are pre-quantized integers (callers map values onto the grid —
floats via the engine's exact-millis convention). The grid geometry
(lo/hi per dimension) must be FIXED per table, not derived from the
data, or two writes of the same row would disagree on its key.

The grid must also FIT each dimension's distribution: a heavily
skewed column under a uniform grid collapses most rows into a few
cells and the curve loses locality (measured: value-millis, an
exponential-ish column, clusters WORSE than a plain 1-D sort on a
uniform [0, 500k) grid). Quantile-transform such a dimension first —
rank/ntile at re-layout time, the Delta OPTIMIZE ZORDER range-id
approach — and interleave the transformed coordinate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_expr(col: str, lo: int, hi: int, bits: int, *, duck: bool) -> str:
    """Dialect text mapping integer ``col`` in [lo, hi] onto the
    2^bits grid: (col-lo)·2^bits DIV (hi-lo+1), clamped. Spark and
    DuckDB differ only in the integer-shift spelling."""
    m = 1 << bits
    span = hi - lo + 1
    div = "//" if duck else "div"
    return (
        f"least({m - 1}, greatest(0, "
        f"(({col}) - {lo}) * {m} {div} {span}))"
    )


def zorder_sql(
    x_col: str,
    y_col: str,
    *,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    bits: int = 16,
    duck: bool = False,
) -> str:
    """The Morton key as SQL text — generated once per dialect from
    the same arithmetic so the oracle is the identical expression:
    z = Σ_i ((xg>>i)&1)<<2i | ((yg>>i)&1)<<(2i+1)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xg = _scale_expr(x_col, x_lo, x_hi, bits, duck=duck)
    yg = _scale_expr(y_col, y_lo, y_hi, bits, duck=duck)
    terms = []
    for i in range(bits):
        if duck:
            # fully parenthesized: DuckDB binds + tighter than <<
            terms.append(f"(((_xg >> {i}) & 1) << {2 * i})")
            terms.append(f"(((_yg >> {i}) & 1) << {2 * i + 1})")
        else:
            terms.append(
                f"shiftleft(shiftright(_xg, {i}) & 1, {2 * i})"
            )
            terms.append(
                f"shiftleft(shiftright(_yg, {i}) & 1, {2 * i + 1})"
            )
    z = " + ".join(terms)
    # inline the grid coords via a scalar subquery-free rewrite: both
    # engines accept the full textual substitution
    return z.replace("_xg", f"({xg})").replace("_yg", f"({yg})")


def zorder_key(
    x_col: str,
    y_col: str,
    *,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    bits: int = 16,
) -> Column:
    """The Morton key as a Spark Column — a pure projection (no
    shuffle, whole-stage-codegen bit math)."""
    return F.expr(
        zorder_sql(
            x_col, y_col,
            x_lo=x_lo, x_hi=x_hi, y_lo=y_lo, y_hi=y_hi,
            bits=bits, duck=False,
        )
    )


def _quantile_grid_map(
    df: DataFrame, col: str, lo: int, hi: int, bits: int, fine_bins: int
) -> tuple[DataFrame, str]:
    """Per-dimension mass-uniform grid map: histogram the integer
    column into ``fine_bins`` fixed cells, cumulate the counts
    DRIVER-SIDE (the histogram is ≤ fine_bins rows), and assign each
    cell the grid coordinate rows-strictly-before·2^bits DIV n. Rows
    in the same fine cell share a coordinate — the resolution
    trade every sampled-boundary scheme makes — but unlike sampled
    boundaries the assignment is DETERMINISTIC (pure arithmetic over
    exact counts), so the key is reproducible and oracle-able.
    Returns (bin→coord map frame, the bin expression SQL)."""
    m = 1 << bits
    span = hi - lo + 1
    bin_sql = (
        f"least({fine_bins - 1}L, greatest(0L, "
        f"(CAST({col} AS LONG) - {lo}L) * {fine_bins}L div {span}L))"
    )
    hist = (
        df.select(F.expr(bin_sql).alias("_bin"))
        .groupBy("_bin")
        .count()
        .orderBy("_bin")
        .collect()
    )
    n = sum(r["count"] for r in hist)
    rows, before = [], 0
    for r in hist:
        rows.append((int(r["_bin"]), before * m // n))
        before += r["count"]
    spark = df.sparkSession
    gmap = spark.createDataFrame(rows, "_bin long, _g long")
    return gmap, bin_sql


def zorder_rank_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    bits: int = 16,
    out_col: str = "zkey",
    x_lo: int | None = None,
    x_hi: int | None = None,
    y_lo: int | None = None,
    y_hi: int | None = None,
    fine_bins: int = 4096,
) -> DataFrame:
    """The skew-proof Morton key: each dimension's grid coordinate is
    its (approximate) RANK scaled onto the 2^bits grid, so any
    distribution — the exponential value column included — fills the
    grid uniformly and the curve keeps locality. This is the
    executable form of the quantile-transform caveat in the module
    docstring, and the per-column range-id idea behind Delta's
    OPTIMIZE ZORDER.

    Ranks come from a fixed fine-grained histogram (``fine_bins``
    cells over [lo, hi], defaulting to the column's observed min/max)
    cumulated into rows-before counts: one bounded map-side-combined
    aggregate per dimension plus one broadcast map join — NO global
    sort. (A row_number() formulation is exact to the row but plans
    as an Exchange SinglePartition: every row through one reducer,
    a measured 100 TB non-starter. The histogram transform keeps the
    mass-uniformity property — cells are ≤ 1/fine_bins of the data
    apart in rank — at scale-safe cost, and deterministically, which
    sampled range boundaries are not.)"""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    bounds = {}
    need = [
        ("x", x_col, x_lo, x_hi),
        ("y", y_col, y_lo, y_hi),
    ]
    agg = []
    for tag, col, lo, hi in need:
        if lo is None or hi is None:
            agg += [F.min(col).alias(f"{tag}_lo"), F.max(col).alias(f"{tag}_hi")]
    observed = df.agg(*agg).first() if agg else None
    for tag, col, lo, hi in need:
        bounds[tag] = (
            int(observed[f"{tag}_lo"]) if lo is None else lo,
            int(observed[f"{tag}_hi"]) if hi is None else hi,
        )
    xmap, xbin = _quantile_grid_map(
        df, x_col, bounds["x"][0], bounds["x"][1], bits, fine_bins
    )
    ymap, ybin = _quantile_grid_map(
        df, y_col, bounds["y"][0], bounds["y"][1], bits, fine_bins
    )
    g = (
        df.withColumn("_xbin", F.expr(xbin))
        .withColumn("_ybin", F.expr(ybin))
        .join(
            F.broadcast(
                xmap.select(
                    F.col("_bin").alias("_xbin"), F.col("_g").alias("_xg")
                )
            ),
            "_xbin",
        )
        .join(
            F.broadcast(
                ymap.select(
                    F.col("_bin").alias("_ybin"), F.col("_g").alias("_yg")
                )
            ),
            "_ybin",
        )
    )
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright(_xg, {i}) & 1, {2 * i})")
        terms.append(
            f"shiftleft(shiftright(_yg, {i}) & 1, {2 * i + 1})"
        )
    return g.withColumn(out_col, F.expr(" + ".join(terms))).drop(
        "_xbin", "_ybin", "_xg", "_yg"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    key: Column,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Re-layout ``df`` into ``n_files`` files ordered by the Morton
    key: one range repartition (contiguous Z-curve segments per
    file, balanced by sampling) + in-partition sort (tight min/max
    stats within each file). The key column is dropped from the
    stored schema — it is derivable, and keeping layouts free of
    synthetic columns lets readers stay oblivious."""
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
