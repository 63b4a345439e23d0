"""User-journey analytics over the event stream: ordered-step funnel
conversion and cohort retention — the two classic product-analytics
operators (the reference's dashboards stop at per-user counts and
timelines, app.py:1090-1105; these are their sequence-aware upgrades).

Both are built to ONE shuffle on the user key:

* funnel: the per-user step timestamps are LAYERED WINDOW functions
  over the same `partitionBy(user)` — Spark reuses the single
  exchange for every layer (no join per step, no self-join blowup),
  and each step's "first time AFTER the previous step" is a
  conditional min that references the previous layer's column.
* cohort: first-event timestamp per user is a window min over the
  same partitioning as the event rows, so cohort assignment rides
  along without a dimension join; the final (cohort, offset) rollup
  is a small second shuffle on a bounded key space (weeks × weeks).

At 100 TB: both outputs are bounded (users for the per-user funnel
frame — itself usually aggregated immediately; weeks² for retention),
and neither ever pairs events with events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def check_funnel_steps(steps: list[str]) -> None:
    """The ONE step-list validation the batch funnel and the
    streaming twin share: ≥2 distinct steps, each a safe ``t_<step>``
    column suffix (dots/backticks would parse as struct access or
    break column resolution — and in the stream, kill the query
    mid-run with a parquet field-name error that never names the bad
    step)."""
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be unique, got {steps!r}")
    import re as _re

    for st in steps:
        if not _re.fullmatch(r"[A-Za-z0-9_]+", st):
            raise ValueError(
                f"funnel step {st!r} is not a safe column suffix "
                "(need [A-Za-z0-9_]+)"
            )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: for each user, the first timestamp of
    step 1, then the first step-2 event STRICTLY AFTER it, and so on
    — the sequence-sensitive semantics (a purchase before the first
    view does not count) that a naive per-type min gets wrong.

    Output: one row per user who completed ≥1 step —
    (user, t_<step>… epoch seconds BIGINT, step_reached). Epochs, not
    timestamps, so results are session-timezone-proof.

    Plan: one shuffle on ``user_col``; each step is another window
    layer over the SAME partitioning (no further exchange — asserted
    in test_plans style by the single-shuffle battery pattern).
    """
    check_funnel_steps(steps)
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev_t = None
    t_cols = []
    for step in steps:
        name = f"t_{step}"
        cond = F.col(type_col) == step
        if prev_t is not None:
            cond = cond & (F.col(ts_col) > F.col(prev_t))
        df = df.withColumn(
            name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev_t = name
        t_cols.append(name)
    per_user = (
        df.groupBy(user_col)
        .agg(*[F.first(c).alias(c) for c in t_cols])
        .select(
            user_col,
            *[
                F.unix_timestamp(F.col(c)).cast("bigint").alias(c)
                for c in t_cols
            ],
        )
    )
    reached_col = None
    for i, name in enumerate(t_cols):
        s = F.when(F.col(name).isNotNull(), i + 1).otherwise(0)
        reached_col = s if reached_col is None else F.greatest(reached_col, s)
    return per_user.withColumn(
        "step_reached", reached_col.cast("int")
    ).filter(F.col("step_reached") > 0)


def funnel_summary(per_user: DataFrame, steps: list[str]) -> DataFrame:
    """Aggregate a :func:`funnel_steps` frame into the conversion
    table: (step_idx, step, n_users reaching ≥ that step,
    conversion_from_first round 6). Bounded output (|steps| rows)."""
    counts = per_user.agg(
        *[
            F.coalesce(
                F.sum((F.col("step_reached") >= i + 1).cast("bigint")),
                F.lit(0),
            ).alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step_idx"),
                        F.lit(s).alias("step"),
                        F.col(f"_n{i}").alias("n_users"),
                        F.round(
                            F.col(f"_n{i}")
                            / F.nullif(F.col("_n0"), F.lit(0)),
                            6,
                        ).alias("conversion_from_first"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.*")


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by the DATE PERIOD of
    their first event (cohort), counted as active in each subsequent
    period they produced any event. Output: (cohort_start date-string,
    period_offset int, n_active bigint, cohort_size bigint,
    retention round 6).

    Cohort assignment is a window min over the same user partitioning
    as the rows (no dimension join); the rollup key space is bounded
    (periods × periods), so the final shuffle is tiny. Periods are
    integer day-arithmetic from the cohort's own first-event date —
    no week-start convention to disagree on across engines.
    """
    w = Window.partitionBy(user_col)
    with_first = events.select(
        user_col,
        F.to_date(ts_col).alias("_d"),
    ).withColumn("_first_d", F.min("_d").over(w))
    periods = with_first.select(
        user_col,
        F.date_format("_first_d", "yyyy-MM-dd").alias("cohort_start"),
        (F.datediff(F.col("_d"), F.col("_first_d")) / period_days)
        .cast("int")
        .alias("period_offset"),
    ).distinct()
    active = periods.groupBy("cohort_start", "period_offset").agg(
        F.count("*").cast("bigint").alias("n_active")
    )
    sizes = (
        periods.filter(F.col("period_offset") == 0)
        .groupBy("cohort_start")
        .agg(F.count("*").cast("bigint").alias("cohort_size"))
    )
    return active.join(F.broadcast(sizes), "cohort_start").select(
        "cohort_start",
        "period_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


def transition_counts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    each (from_type, to_type) pair of CONSECUTIVE events within a
    user's timeline, the transition count and probability — what
    "users who view usually click next" dashboards and journey
    anomaly baselines consume.

    Ordering is (ts, id) so equal-timestamp events sequence
    deterministically (the same discipline as the funnel's
    strictness — a data-dependent tie order would make the matrix
    nondeterministic). The terminal event of each user contributes no
    transition.

    Plan: ONE shuffle on the user key for the lead() window, then a
    rollup on the bounded (from, to) key space — types², independent
    of event volume; the probability is each count over its from-row
    total via one window over that tiny frame and ONE division
    (round(…, 6), cross-engine-stable)."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(id_col)
    )
    pairs = (
        events.select(user_col, ts_col, id_col, type_col)
        .withColumn("_next", F.lead(type_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"),
            F.col("_next").alias("to_type"),
        )
        .agg(F.count("*").alias("n_transitions"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.sum("n_transitions").over(w_from).alias("from_total"),
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(w_from),
            6,
        ).alias("probability"),
    )


def transition_pairs(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    carry_col: str | None = None,
) -> DataFrame:
    """The raw consecutive-pair stream under :func:`transition_counts`'
    ordering: one row per (from event, next event) within a user's
    (ts, id)-ordered timeline, carrying the FROM event's timestamp
    and the gap to the next event in seconds (millisecond-quantized).
    This is the ONE pairing definition (ordering, tie-break, gap
    quantization) the batch twin and the streaming maintainer share —
    a change here propagates to both, so stream ≡ batch cannot
    silently drift.

    ``carry_col`` names an optional boolean column marking rows
    CARRIED IN from earlier micro-batches (the streaming boundary
    seam): a carried row may serve as a pair's FROM (the boundary
    pair) but never as its TO — that pair was already counted when
    the carried row was itself fresh. Batch callers leave it None."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    cols = [user_col, ts_col, id_col, type_col]
    if carry_col is not None:
        cols.append(carry_col)
    paired = (
        events.select(*cols)
        .withColumn("_next_type", F.lead(type_col).over(w))
        .withColumn("_next_ts", F.lead(ts_col).over(w))
    )
    keep = F.col("_next_type").isNotNull()
    if carry_col is not None:
        # window expressions can't sit inside filter() — project the
        # lead first
        paired = paired.withColumn("_next_carry", F.lead(carry_col).over(w))
        keep = keep & ~F.col("_next_carry")
    return paired.filter(keep).select(
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("from_type"),
        F.col("_next_type").alias("to_type"),
        (
            (
                F.unix_millis("_next_ts") - F.unix_millis(ts_col)
            )
            / F.lit(1000.0)
        ).alias("gap_seconds"),
    )


def transition_partials(
    events: DataFrame,
    *,
    grain: str = "day",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-bucketed transition state in the MERGEABLE time-partials
    shape: each consecutive pair becomes an event at the FROM
    event's timestamp (the bucketing convention — a transition
    belongs to the bucket it started in) with the gap as its value,
    reduced by rollup.time_partials grouped on (from_type, to_type).
    So ``n_events`` is the transition count and the millis fields
    carry dwell-time stats (mean/min/max seconds between events) —
    and because the shape IS the rollup-partials shape, the whole
    existing maintenance stack applies unchanged: read_rollup merges
    fragments/grains, compact_rollup_fragments folds them, and the
    streaming maintainer (streaming/journey_stream.py) appends
    per-batch fragments."""
    from . import rollup

    pairs = transition_pairs(
        events, user_col=user_col, ts_col=ts_col,
        type_col=type_col, id_col=id_col,
    )
    return rollup.time_partials(
        pairs,
        ts_col="ts",
        value_col="gap_seconds",
        grain=grain,
        group_cols=["from_type", "to_type"],
    )


def transition_matrix(
    partials: DataFrame,
    *,
    to_grain: str = "day",
) -> DataFrame:
    """Per-bucket transition matrix served from maintained partials:
    merge (fragments and finer grains) to ``to_grain``, then derive
    per-bucket from-totals and probabilities — the
    :func:`transition_counts` output shape, time-sliced, WITHOUT
    re-touching raw events. Also surfaces mean dwell seconds per
    transition (sum/count of the carried gap millis)."""
    from . import rollup

    merged = rollup.rollup_partials(
        partials, to_grain=to_grain, group_cols=["from_type", "to_type"]
    )
    w_from = Window.partitionBy("bucket_ts", "from_type")
    return merged.select(
        "bucket_ts",
        "from_type",
        "to_type",
        F.col("n_events").alias("n_transitions"),
        F.sum("n_events").over(w_from).alias("from_total"),
        F.round(
            F.col("n_events") / F.sum("n_events").over(w_from), 6
        ).alias("probability"),
        F.round(
            F.col("sum_millis")
            / F.col("n_events")
            / F.lit(1000.0),
            3,
        ).alias("mean_gap_seconds"),
    )
