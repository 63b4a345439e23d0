"""Count-min sketch (Cormode & Muthukrishnan, J.Alg. 2005) over token
streams — the mergeable frequency-estimate companion to the engine's
other sketches (HLL++ distinct counts, GK quantiles, both via Spark
built-ins).

Why an explicit CMS when exact heavy-hitter counts exist
(textops.heavy_hitters): at 100 TB the exact (group, token) count
table can itself be billions of rows; the CMS is a FIXED-size (depth ×
width counters) summary that (a) is built in one pass with one
map-side-combined shuffle on (d, bucket), (b) merges across
partitions/days by elementwise addition (unit-tested), and (c) answers
point frequency queries with one-sided error: est ≥ true, and
P[est > true + εN] ≤ δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.

Hashing is xxhash64(token, seed=d) — Spark-native, deterministic
across runs and cluster sizes, but engine-specific → registry entries
built on it are rows-only by design (same policy as MinHash/SimHash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_structs(token_col: str, depth: int, width: int):
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    F.xxhash64(F.col(token_col), F.lit(d)), F.lit(width)
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cms_build(
    tokens: DataFrame,
    *,
    token_col: str = "token",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """One-pass sketch build → (d, bucket, cnt) rows, at most
    depth·width of them regardless of input size. The explode is a
    constant factor ``depth``; the aggregate partial-combines before
    the single shuffle."""
    return (
        tokens.select(
            F.explode(_bucket_structs(token_col, depth, width)).alias("h")
        )
        .groupBy(F.col("h.d").alias("d"), F.col("h.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sketches over disjoint corpus slices merge by elementwise sum —
    the property that makes the sketch shippable across days/shards."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    *,
    token_col: str = "token",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates: min over the candidate's depth
    counters. The sketch is ≤ depth·width rows → broadcast; a bucket
    absent from the sketch means nothing ever hashed there → 0."""
    cand = candidates.select(
        F.col(token_col),
        F.explode(_bucket_structs(token_col, depth, width)).alias("h"),
    ).select(token_col, F.col("h.d").alias("d"), F.col("h.bucket").alias("bucket"))
    return (
        cand.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )
