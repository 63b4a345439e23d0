"""As-of join — an operator Spark's API lacks natively.

For each left row, attach the temporally nearest right row within the
same key: the most recent at-or-before (``backward`` — the
time-series "last known value" join; DuckDB/kdb call it ASOF JOIN),
the earliest at-or-after (``forward`` — "next reading"), or whichever
of the two is closer (``nearest``), optionally bounded by a staleness
``tolerance`` (pandas merge_asof's parameter set).

Implementation is the scalable union + carry formulation, NOT a
range/theta join:

    union(left-tagged, right-tagged)
      → window per key ordered by (ts, right-before-left)
      → last_value(..., ignoreNulls) carries the right payload
        (forward needs the same scan in reverse time order — a second
        sort over the SAME key partitioning, still one shuffle)
      → keep left rows

One shuffle on the key, linear scan per partition — no quadratic
candidate pairs and no range-join explosion, which is what makes it
hold at 100 TB where a `l.ts >= r.ts` theta join would not. The
tolerance is a post-carry predicate (nulls the payload when the
matched row is too far), so it costs one projection, never a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    ts_col: str,
    carry_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join (inclusive on both directions: right.ts ==
    left.ts matches; at equal timestamps the right row is visible to
    the left row, matching DuckDB ASOF semantics).

    ``direction``: 'backward' (most recent right.ts ≤ left.ts),
    'forward' (earliest right.ts ≥ left.ts), or 'nearest' (closer of
    the two; an exact distance tie prefers backward — the
    already-known value beats the future one for feature hygiene).
    ``tolerance_seconds`` nulls the match when |left.ts − right.ts|
    exceeds it (timestamps compare via their epoch-seconds double, so
    sub-second precision is honored; numeric ts columns compare as
    their own doubles).

    Returns all left columns + ``{ts_col}{suffix}`` (the matched right
    timestamp) + each carry col as ``{col}{suffix}``; NULLs when no
    right row qualifies. Among right rows sharing (key, ts) the
    greatest payload tuple wins (pinned rule, mirrors FIXTURES
    decision #3 on top-k ties).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
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
    # right rows (_side 0) sort before left rows at the same ts in BOTH
    # scan directions → inclusive semantics both ways. The payload
    # joins the sort key as a deterministic tie-break among right rows
    # sharing (key, ts): the greatest payload tuple is scanned LAST,
    # so the running carry holds it when the left row is reached.
    def _carry(desc: bool) -> F.Column:
        order = F.col(ts_col).desc() if desc else F.col(ts_col).asc()
        w = (
            Window.partitionBy(*on)
            .orderBy(order, F.col("_side").asc(), F.col("_payload").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_payload", ignorenulls=True).over(w)

    # Distance arithmetic must be EXACT: a timestamp's epoch as double
    # has ~0.25 µs granularity at current epochs, enough to flip a row
    # sitting exactly on the tolerance boundary. Timestamps compare as
    # integer microseconds (unix_micros), tolerance quantized the same
    # way; numeric ts columns compare as their own doubles.
    from pyspark.sql.types import TimestampType

    if isinstance(left.schema[ts_col].dataType, TimestampType):
        pos = F.unix_micros(F.col(ts_col))
        _pval = lambda p: F.unix_micros(p.getField("_pts"))  # noqa: E731
        tol_lit = (
            None
            if tolerance_seconds is None
            else F.lit(int(round(tolerance_seconds * 1_000_000)))
        )
    else:
        pos = F.col(ts_col).cast("double")
        _pval = lambda p: p.getField("_pts").cast("double")  # noqa: E731
        tol_lit = (
            None
            if tolerance_seconds is None
            else F.lit(float(tolerance_seconds))
        )

    def _tol_guard(payload: F.Column) -> F.Column:
        if tol_lit is None:
            return payload
        return F.when(F.abs(pos - _pval(payload)) <= tol_lit, payload)

    if direction == "backward":
        unioned = unioned.withColumn("_chosen", _tol_guard(_carry(desc=False)))
    elif direction == "forward":
        unioned = unioned.withColumn("_chosen", _tol_guard(_carry(desc=True)))
    else:  # nearest: both carries over ONE key partitioning (two
        # sorts, one shuffle), tolerance applied per side BEFORE the
        # distance comparison so an in-tolerance far side never loses
        # to an out-of-tolerance near one
        bw = _tol_guard(_carry(desc=False))
        fw = _tol_guard(_carry(desc=True))
        unioned = (
            unioned.withColumn("_bw", bw)
            .withColumn("_fw", fw)
            .withColumn(
                "_chosen",
                F.when(F.col("_bw").isNull(), F.col("_fw"))
                .when(F.col("_fw").isNull(), F.col("_bw"))
                .when(
                    # backward wins exact distance ties
                    pos - _pval(F.col("_bw"))
                    <= _pval(F.col("_fw")) - pos,
                    F.col("_bw"),
                )
                .otherwise(F.col("_fw")),
            )
            .drop("_bw", "_fw")
        )
    return (
        unioned.filter(F.col("_side") == 1)
        .withColumn(r_ts, F.col("_chosen._pts"))
        .withColumns(
            {a: F.col(f"_chosen._p{i}") for i, a in enumerate(carried)}
        )
        .drop("_side", "_payload", "_chosen")
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    ts_col: str,
    carry_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join — :func:`asof_join` with
    direction='backward' (kept as the named entry point the gates and
    SURVEY cite)."""
    return asof_join(
        left, right, on=on, ts_col=ts_col, carry_cols=carry_cols,
        suffix=suffix, direction="backward",
    )
