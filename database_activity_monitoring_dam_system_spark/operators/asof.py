"""As-of (backward) join — an operator Spark's API lacks natively.

For each left row, attach the most recent right row with right.ts ≤
left.ts within the same key (the time-series "last known value" join;
DuckDB/kdb call it ASOF JOIN).

Implementation is the scalable union + carry-forward formulation, NOT
a range/theta join:

    union(left-tagged, right-tagged)
      → window per key ordered by (ts, right-before-left)
      → last_value(..., ignoreNulls) carries the right payload forward
      → keep left rows

One shuffle on the key, linear scan per partition — no quadratic
candidate pairs and no range-join explosion, which is what makes it
hold at 100 TB where a `l.ts >= r.ts` theta join would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    ts_col: str,
    carry_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of-backward join (inclusive: right.ts == left.ts
    matches; at equal timestamps the right row is visible to the left
    row, matching DuckDB ASOF semantics).

    Returns all left columns + ``{ts_col}{suffix}`` (the matched right
    timestamp) + each carry col as ``{col}{suffix}``; NULLs when no
    right row precedes.
    """
    carried = [f"{c}{suffix}" for c in carry_cols]
    r_ts = f"{ts_col}{suffix}"

    # The right payload travels as ONE struct so it carries atomically:
    # last(field, ignorenulls) per-field would skip a matched right row
    # whose carry value is NULL and stitch ts/value from DIFFERENT
    # right rows. A struct is non-null for every right row even when
    # its fields are null.
    payload_type = (
        f"struct<_pts:{right.schema[ts_col].dataType.simpleString()},"
        + ",".join(
            f"_p{i}:{right.schema[c].dataType.simpleString()}"
            for i, c in enumerate(carry_cols)
        )
        + ">"
        if carry_cols
        else f"struct<_pts:{right.schema[ts_col].dataType.simpleString()}>"
    )

    l_side = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_payload"),
    )
    left_only = [c for c in left.columns if c not in on and c != ts_col]
    r_side = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts_col).alias("_pts"),
            *[
                F.col(c).alias(f"_p{i}")
                for i, c in enumerate(carry_cols)
            ],
        ).alias("_payload"),
    ).select(*l_side.columns)  # align column order for union

    unioned = l_side.unionByName(r_side)
    # right rows (_side 0) sort before left rows at the same ts →
    # inclusive as-of semantics. The payload joins the sort key as a
    # deterministic tie-break among right rows sharing (key, ts): the
    # greatest payload tuple wins (pinned rule, mirrors FIXTURES
    # decision #3 on top-k ties).
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_side").asc(),
            F.col("_payload").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = unioned.withColumn(
        "_payload", F.last("_payload", ignorenulls=True).over(w)
    )
    return (
        unioned.filter(F.col("_side") == 1)
        .withColumn(r_ts, F.col("_payload._pts"))
        .withColumns(
            {a: F.col(f"_payload._p{i}") for i, a in enumerate(carried)}
        )
        .drop("_side", "_payload")
    )
