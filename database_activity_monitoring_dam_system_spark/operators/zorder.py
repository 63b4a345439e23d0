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
