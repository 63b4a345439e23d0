"""Skew mitigation helpers (SCALE.md).

AQE's skew-join splitting covers joins; for AGGREGATIONS on skewed
keys (one bot user producing 10% of all events), two-phase salted
aggregation bounds the biggest reduce task: partial-aggregate on
(key, salt), then final-aggregate on key. Salt is DETERMINISTIC
(xxhash64 of a discriminator column) — replayable, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_group_count(
    df: DataFrame,
    key_cols: list[str],
    *,
    salt_col: str | Column,
    buckets: int = 16,
    out_col: str = "cnt",
) -> DataFrame:
    """Two-phase count: identical result to groupBy(keys).count(), but
    the hot key's rows spread over `buckets` partial tasks first."""
    salt_src = F.col(salt_col) if isinstance(salt_col, str) else salt_col
    salt = F.pmod(F.xxhash64(salt_src), F.lit(buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(out_col))


def binned_trailing_window_counts(
    df: DataFrame,
    *,
    seconds: int,
    ts_col: str = "access_timestamp",
    user_col: str = "user_id",
    out_col: str = "trailing_count",
) -> DataFrame:
    """EXACT trailing-window count, skew-split by time bin.

    Identical results to ``anomaly.trailing_window_counts`` (count of
    the user's events with ts in ``[t-seconds+1, t]``), but partitioned
    by ``(user, floor(epoch/seconds))`` instead of user alone — the
    window-salting escape hatch for the one-bot-user hot key
    (reference analogue app.py:396-403): a user emitting for H hours
    spreads over ``H*3600/seconds`` tasks instead of one.

    Exactness: with bin width == window width, every event in the
    trailing window lies in the evaluation row's bin or the one
    before it.  Each event is therefore REPLICATED into its successor
    bin, and one range frame over the (user, bin) partition sees
    exactly the right set: same-bin originals are always in range
    (``e - e' < seconds`` within a bin) and prior-bin copies are
    range-filtered.  Copies are dropped after evaluation.  Cost: 2x
    rows through the one exchange — opt-in for skewed tenants, not
    the default (the plain range frame moves half the rows).
    """
    e = F.unix_timestamp(F.col(ts_col))
    base = df.withColumn("_e", e).withColumn(
        "_bin", F.floor(F.col("_e") / F.lit(seconds))
    )
    originals = base.withColumn("_orig", F.lit(True))
    carried = base.withColumn("_bin", F.col("_bin") + 1).withColumn(
        "_orig", F.lit(False)
    )
    w = (
        Window.partitionBy(user_col, "_bin")
        .orderBy("_e")
        .rangeBetween(-(seconds - 1), 0)
    )
    return (
        originals.unionByName(carried)
        .withColumn(out_col, F.count("*").over(w))
        .filter(F.col("_orig"))
        .drop("_e", "_bin", "_orig")
    )
