"""Anomaly detection (SURVEY.md A7/A8, R6/R7, W4).

The reference computes per-user baselines on demand and checks each new
row with two more round-trip queries (app.py:520-553). Here both checks
are set-oriented over the whole frame:

* baseline = two-level aggregate (partial/final hash agg, one shuffle
  on user_id);
* volume anomaly = windowed counts joined to the baseline (stream-static
  join shape in streaming);
* impossible travel = lag() over (user, time) — canonical window-
  function form of the reference's "last 2 logins" probe.

MySQL STDDEV is population stddev → stddev_pop (FIXTURES.md decision #5).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def user_hourly_baseline(
    activity: DataFrame,
    *,
    ts_col: str = "access_timestamp",
    user_col: str = "user_id",
) -> DataFrame:
    """A7 — per-user mean/population-stddev of per-(day,hour) counts
    (behavior of app.py:522-532, vectorized over ALL users at once)."""
    per_hour = (
        activity.filter(F.col(user_col).isNotNull())
        .groupBy(
            F.col(user_col),
            F.to_date(ts_col).alias("day"),
            F.hour(ts_col).alias("hour"),
        )
        .agg(F.count("*").alias("queries_per_hour"))
    )
    return per_hour.groupBy(user_col).agg(
        F.avg("queries_per_hour").alias("avg_queries"),
        F.stddev_pop("queries_per_hour").alias("std_queries"),
    )


def volume_anomalies(
    activity: DataFrame,
    baseline: DataFrame | None = None,
    *,
    ts_col: str = "access_timestamp",
    user_col: str = "user_id",
) -> DataFrame:
    """R6 — (user, hour-bucket)s whose count exceeds avg + 3·std.

    The reference compares a trailing-1h count against the baseline per
    incoming row (app.py:534-544, std defaulting to 1 when NULL/0); the
    set form flags every hour bucket. Baseline side is small (one row
    per user) → broadcast.
    """
    if baseline is None:
        baseline = user_hourly_baseline(activity, ts_col=ts_col, user_col=user_col)
    hourly = (
        activity.filter(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col), F.date_trunc("hour", ts_col).alias("hour_bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    return volume_flags(hourly, baseline, user_col=user_col)


def volume_flags(
    hourly: DataFrame,
    baseline: DataFrame,
    *,
    user_col: str = "user_id",
) -> DataFrame:
    """The ONE avg+3σ arbitration the batch detector and the
    streaming twin share (the login_ip_pairs discipline — a threshold
    change propagates to both, so stream ≡ batch cannot silently
    drift): join (user, hour_bucket, cnt) rows to the broadcast
    per-user baseline, default NULL/0 std to 1 (app.py:534-544), and
    keep buckets whose count exceeds avg + 3·std."""
    std = F.coalesce(
        F.when(F.col("std_queries") != 0, F.col("std_queries")), F.lit(1.0)
    )
    return (
        hourly.join(F.broadcast(baseline), user_col, "inner")
        .filter(F.col("cnt") > F.col("avg_queries") + 3 * std)
        .select(
            user_col,
            "hour_bucket",
            "cnt",
            F.round("avg_queries", 4).alias("avg_queries"),
            F.round("std_queries", 4).alias("std_queries"),
        )
    )


def user_hourly_robust_baseline(
    activity: DataFrame,
    *,
    ts_col: str = "access_timestamp",
    user_col: str = "user_id",
) -> DataFrame:
    """A7's robust twin: per-user MEDIAN and MAD (median absolute
    deviation) of per-(day,hour) counts. A handful of burst hours
    drag a mean/stddev baseline upward until the bursts themselves
    look normal (masking); order statistics have a 50% breakdown
    point, so the baseline stays put. Cross-engine exactness: counts
    are integers, so every interpolated median is a multiple of 0.5
    and every MAD a multiple of 0.25 — exactly representable, no
    float-fold drift.

    Two hash aggregates on the same user key plus one broadcast join
    of the (users-sized) median frame — the per-hour frame never
    re-scans raw activity."""
    per_hour = (
        activity.filter(F.col(user_col).isNotNull())
        .groupBy(
            F.col(user_col),
            F.to_date(ts_col).alias("day"),
            F.hour(ts_col).alias("hour"),
        )
        .agg(F.count("*").alias("queries_per_hour"))
    )
    med = per_hour.groupBy(user_col).agg(
        F.percentile("queries_per_hour", 0.5).alias("med_queries")
    )
    dev = per_hour.join(F.broadcast(med), user_col).withColumn(
        "_dev", F.abs(F.col("queries_per_hour") - F.col("med_queries"))
    )
    return dev.groupBy(user_col).agg(
        F.min("med_queries").alias("med_queries"),
        F.percentile("_dev", 0.5).alias("mad_queries"),
    )


def robust_volume_flags(
    hourly: DataFrame,
    baseline: DataFrame,
    *,
    user_col: str = "user_id",
) -> DataFrame:
    """The ONE median+k·MAD arbitration (volume_flags' robust twin,
    same shared-definition discipline): keep (user, hour_bucket)
    rows whose count exceeds med + 4.4478·MAD — 3σ-equivalent under
    normality (3 × the 1.4826 consistency constant), but immune to
    the bursts inflating a stddev baseline. Degenerate MAD (0: the
    user's hours are >50% identical) falls back to 1, mirroring
    volume_flags' NULL/0-std default."""
    mad = F.coalesce(
        F.when(F.col("mad_queries") != 0, F.col("mad_queries")),
        F.lit(1.0),
    )
    return (
        hourly.join(F.broadcast(baseline), user_col, "inner")
        .filter(F.col("cnt") > F.col("med_queries") + 4.4478 * mad)
        .select(
            user_col,
            "hour_bucket",
            "cnt",
            F.round("med_queries", 4).alias("med_queries"),
            F.round("mad_queries", 4).alias("mad_queries"),
        )
    )


def robust_volume_anomalies(
    activity: DataFrame,
    baseline: DataFrame | None = None,
    *,
    ts_col: str = "access_timestamp",
    user_col: str = "user_id",
) -> DataFrame:
    """R6's robust twin: hour buckets whose count exceeds the
    median + 4.4478·MAD gate. Same frame plumbing as
    :func:`volume_anomalies`; only the arbitration differs
    (:func:`robust_volume_flags`), so the streaming twin can serve
    either detector from the same windowed counts."""
    if baseline is None:
        baseline = user_hourly_robust_baseline(
            activity, ts_col=ts_col, user_col=user_col
        )
    hourly = (
        activity.filter(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col), F.date_trunc("hour", ts_col).alias("hour_bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    return robust_volume_flags(hourly, baseline, user_col=user_col)


def login_ip_pairs(
    logins: DataFrame,
    *,
    ts_col: str = "access_timestamp",
    carry_col: str | None = None,
) -> DataFrame:
    """The ONE consecutive-login IP-change pairing the batch twin and
    the streaming maintainer share (the transition_pairs discipline —
    a change here propagates to both, so stream ≡ batch cannot
    silently drift): lag() over (username, ts, activity_id) flags each
    login whose predecessor came from a different IP.

    ``carry_col`` names an optional boolean marking rows CARRIED IN
    from earlier micro-batches: a carried last-login may serve as a
    pair's PREVIOUS (the boundary pair) but is never itself flagged
    (its own pair was evaluated when it was fresh). Batch callers
    leave it None."""
    w = Window.partitionBy("username").orderBy(
        F.asc(ts_col), F.asc("activity_id")
    )
    paired = (
        logins.withColumn("prev_ip", F.lag("ip_address").over(w))
        .withColumn("prev_ts", F.lag(ts_col).over(w))
    )
    keep = F.col("prev_ip").isNotNull() & (
        F.col("prev_ip") != F.col("ip_address")
    )
    if carry_col is not None:
        keep = keep & ~F.col(carry_col)
    return paired.filter(keep).select(
        "username",
        F.col(ts_col).alias("login_ts"),
        "ip_address",
        "prev_ip",
        "prev_ts",
    )


def impossible_travel(
    activity: DataFrame,
    *,
    now: dt.datetime | str | None = None,
    window_hours: int = 1,
    ts_col: str = "access_timestamp",
    op: str = "LOGIN",
) -> DataFrame:
    """R7/W4 — consecutive LOGINs for a username from different IPs
    within the trailing window (behavior of app.py:546-552).

    lag() over (username, ts) replaces the reference's per-row
    "ORDER BY ts DESC LIMIT 2" probe; one shuffle by username.
    ``op`` parameterizes the probed operation type (LOGIN in the
    reference; gate fixtures have no LOGIN rows). The pairing itself
    is :func:`login_ip_pairs`, shared with the streaming twin
    (streaming/anomaly_stream.py)."""
    anchor = (
        F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    )
    logins = activity.filter(
        (F.col("operation_type") == op)
        & (F.col(ts_col) >= anchor - F.make_interval(hours=F.lit(window_hours)))
    )
    return login_ip_pairs(logins, ts_col=ts_col)


def rolling_median(
    df: DataFrame,
    *,
    value_col: str,
    partition_cols: list[str],
    order_cols: list[str],
    frame_rows: int = 25,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Exact trailing-window median — the robust twin of a moving
    average (one wild reading drags a trailing mean for the whole
    frame; the median shrugs it off, which is what live latency/value
    dashboards actually want). ROWS frame over a deterministic
    (order_cols) sort; quantize the value to integers first and every
    interpolated midpoint is an exact 0.5 multiple (the
    user_hourly_robust_baseline exactness argument applied to
    windows).

    Cost is O(frame) per row — the exact serving baseline; for
    corpus-scale trailing quantiles the mergeable rollup partials
    (rollup.quantile_partials) are the scale path, same split as
    jaccard_pairs vs MinHash."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(-(frame_rows - 1), 0)
    )
    return df.withColumn(out_col, F.percentile(value_col, 0.5).over(w))


def trailing_window_counts(
    activity: DataFrame,
    *,
    seconds: int = 3600,
    ts_col: str = "access_timestamp",
    user_col: str = "user_id",
    out_col: str = "trailing_count",
) -> DataFrame:
    """A8 — exact per-user trailing-window count via a range frame over
    epoch seconds (Spark range frames need a numeric sort key)."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.unix_timestamp(F.col(ts_col)))
        .rangeBetween(-(seconds - 1), 0)
    )
    return activity.withColumn(out_col, F.count("*").over(w))
