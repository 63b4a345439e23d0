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
    # widen to 64-bit BEFORE the multiply: an INT column with values
    # past 2^31/2^bits silently wraps the (col-lo)*m product (garbage
    # keys non-ANSI, ARITHMETIC_OVERFLOW under ANSI) while DuckDB
    # auto-promotes — the divergence the gate would otherwise hide
    cast = "CAST({c} AS BIGINT)" if duck else "CAST({c} AS LONG)"
    wide = cast.format(c=col)
    return (
        f"least({m - 1}, greatest(0, "
        f"(({wide}) - {lo}) * {m} {div} {span}))"
    )


def morton_terms(
    bits: int, *, duck: bool, x: str = "_xg", y: str = "_yg"
) -> str:
    """The 2-D bit-interleave template — :func:`morton_terms_nd` at
    k=2 (x even positions, y odd), kept as a named entry point for
    the 2-D callers. Delegating (rather than a parallel hand-synced
    copy) is what makes 'same arithmetic on both engines and at
    every k' a structural fact: a dialect fix lands once."""
    return morton_terms_nd(bits, [x, y], duck=duck)


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
    return zorder_nd_sql(
        [(x_col, x_lo, x_hi), (y_col, y_lo, y_hi)], bits=bits, duck=duck
    )


def morton_terms_nd(
    bits: int, names: list[str], *, duck: bool
) -> str:
    """The ONE k-dimensional bit-interleave template every caller and
    both dialects share: bit i of dimension j lands at position
    i·k + j (round-robin interleave — every dimension contributes
    equally at every scale level, the same layout Delta's
    multi-column OPTIMIZE ZORDER produces). ``names`` are embedded
    VERBATIM as the coordinate expressions — pass full parenthesized
    SQL, not placeholders to substitute later (a textual replace
    corrupts any column expression that happens to contain the
    placeholder string)."""
    k = len(names)
    terms = []
    for i in range(bits):
        for j, nm in enumerate(names):
            pos = i * k + j
            if duck:
                terms.append(f"((({nm} >> {i}) & 1) << {pos})")
            else:
                terms.append(
                    f"shiftleft(shiftright({nm}, {i}) & 1, {pos})"
                )
    return " + ".join(terms)


def zorder_nd_sql(
    dims: list[tuple[str, int, int]],
    *,
    bits: int = 10,
    duck: bool = False,
) -> str:
    """The k-dimensional Morton key as SQL text — ``dims`` is a list
    of (col_sql, lo, hi) with a FIXED grid per table (same contract
    as 2-D). The key spans bits·k bits, so resolution trades against
    dimension count under the 63-bit BIGINT budget: 2 dims at 16
    bits, 3 at 10, 4 at 7 — exactly the trade Delta documents for
    multi-column ZORDER (each added column dilutes per-column
    locality). Pure integer projection, zero shuffle; same text on
    both engines."""
    k = len(dims)
    if k < 2:
        raise ValueError(f"zorder_nd_sql: need >= 2 dimensions, got {k}")
    if not 1 <= bits * k <= 62:
        raise ValueError(
            f"bits*k must be in [1, 62] (BIGINT key budget), got "
            f"{bits}*{k} = {bits * k}"
        )
    # inline each dimension's scale expression directly — no
    # placeholder substitution pass that could rewrite a column
    # expression containing the placeholder text
    coords = [
        f"({_scale_expr(col, lo, hi, bits, duck=duck)})"
        for col, lo, hi in dims
    ]
    return morton_terms_nd(bits, coords, duck=duck)


def zorder_nd_key(
    dims: list[tuple[str, int, int]], *, bits: int = 10
) -> Column:
    """The k-D Morton key as a Spark Column (pure whole-stage-codegen
    projection)."""
    return F.expr(zorder_nd_sql(dims, bits=bits, duck=False))


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


def _fine_bin_sql(col: str, lo: int, hi: int, fine_bins: int) -> str:
    """The fixed fine-cell assignment (Spark dialect, LONG-widened).
    NULL-transparent by construction: Spark's greatest() SKIPS null
    arguments, so without the CASE a NULL value would silently land
    in bin 0 (keyed as if it were the minimum) instead of surfacing
    — the grid-map builder detects the NULL bin and raises a named
    error."""
    span = hi - lo + 1
    return (
        f"CASE WHEN {col} IS NULL THEN NULL ELSE "
        f"least({fine_bins - 1}L, greatest(0L, "
        f"(CAST({col} AS LONG) - {lo}L) * {fine_bins}L div {span}L)) END"
    )


def _quantile_grid_maps(
    df: DataFrame,
    dims: list[tuple[str, str, int, int]],
    bits: int,
    fine_bins: int,
) -> dict[str, DataFrame]:
    """Mass-uniform grid maps for EVERY dimension in one corpus pass:
    each row explodes into one (dim, fine-cell) pair per dimension,
    one map-side-combined groupBy counts all dims' histograms
    together (≤ dims·fine_bins rows), and the counts cumulate
    DRIVER-SIDE into rows-strictly-before·2^bits DIV n coordinates.
    Rows in the same fine cell share a coordinate — the resolution
    trade every sampled-boundary scheme makes — but unlike sampled
    boundaries the assignment is DETERMINISTIC (pure arithmetic over
    exact counts), so the key is reproducible and oracle-able.
    ``dims``: (tag, col, lo, hi) tuples; returns tag → map frame."""
    m = 1 << bits
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(tag).alias("_dim"),
                    F.expr(
                        _fine_bin_sql(col, lo, hi, fine_bins)
                    ).alias("_bin"),
                )
                for tag, col, lo, hi in dims
            ]
        )
    )
    hist = (
        df.select(pairs.alias("_p"))
        .select("_p._dim", "_p._bin")
        .groupBy("_dim", "_bin")
        .count()
        .orderBy("_dim", "_bin")
        .collect()
    )
    spark = df.sparkSession
    out: dict[str, DataFrame] = {}
    for tag, col, _lo, _hi in dims:
        rows_d = [r for r in hist if r["_dim"] == tag]
        # NULL dimension values produce a NULL fine-bin row; NULL has
        # no rank, so surface it as a named error instead of a
        # TypeError deep in the cumulation (and note that the inner
        # grid-map join downstream would silently DROP those rows).
        if any(r["_bin"] is None for r in rows_d):
            raise ValueError(
                f"zorder grid: dimension {col!r} contains NULL "
                "values — filter or impute them before keying "
                "(NULL has no rank coordinate)"
            )
        n = sum(r["count"] for r in rows_d)
        if n == 0:
            raise ValueError(
                f"zorder grid: dimension {col!r} has no rows — "
                "cannot build a rank grid over an empty dimension"
            )
        rows, before = [], 0
        for r in rows_d:
            rows.append((int(r["_bin"]), before * m // n))
            before += r["count"]
        out[tag] = spark.createDataFrame(rows, "_bin long, _g long")
    return out


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
    cumulated into rows-before counts: BOTH dimensions' histograms
    ride one map-side-combined aggregate (a (dim, cell) explode per
    row), then one broadcast map join each — NO global sort. (A
    row_number() formulation is exact to the row but plans as an
    Exchange SinglePartition: every row through one reducer, a
    measured 100 TB non-starter. The histogram transform keeps the
    mass-uniformity property — cells are ≤ 1/fine_bins of the data
    apart in rank — at scale-safe cost, and deterministically, which
    sampled range boundaries are not.) Total raw passes: one for the
    combined histograms, plus the bounds min/max pass ONLY when lo/hi
    are not supplied — fix the grid per table to skip it, same rule
    as the fixed-grid key."""
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
        if (lo is None or hi is None) and observed[f"{tag}_lo"] is None:
            # min/max over an empty or all-NULL column is NULL —
            # name the column instead of TypeError-ing on int(None)
            raise ValueError(
                f"zorder_rank_key: dimension {col!r} is empty or "
                "all-NULL — no observable bounds"
            )
        bounds[tag] = (
            int(observed[f"{tag}_lo"]) if lo is None else lo,
            int(observed[f"{tag}_hi"]) if hi is None else hi,
        )
    dims = [
        ("x", x_col, bounds["x"][0], bounds["x"][1]),
        ("y", y_col, bounds["y"][0], bounds["y"][1]),
    ]
    gmaps = _quantile_grid_maps(df, dims, bits, fine_bins)
    xmap, ymap = gmaps["x"], gmaps["y"]
    xbin = _fine_bin_sql(x_col, *bounds["x"], fine_bins)
    ybin = _fine_bin_sql(y_col, *bounds["y"], fine_bins)
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
    return g.withColumn(
        out_col, F.expr(morton_terms(bits, duck=False))
    ).drop("_xbin", "_ybin", "_xg", "_yg")


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
