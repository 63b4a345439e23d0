"""Skew mitigation helpers (SCALE.md).

AQE's skew-join splitting covers joins; for AGGREGATIONS on skewed
keys (one bot user producing 10% of all events), two-phase salted
aggregation bounds the biggest reduce task: partial-aggregate on
(key, salt), then final-aggregate on key. Salt is DETERMINISTIC
(xxhash64 of a discriminator column) — replayable, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
