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

Hashing is xxhash64(token, seed=d) by default — Spark-native,
deterministic across runs and cluster sizes, but engine-specific →
registry entries built on it are rows-only by design (same policy as
MinHash/SimHash). ``hash_family='md5'`` switches every stage to the
oracle-reproducible md5 bucket derivation, and ``hll_md5_distinct``
below is the hand-rolled md5-family HLL — both carry full DuckDB
oracles in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_structs(
    token_col: str, depth: int, width: int, hash_family: str = "xxhash64"
):
    """Per-row array of (d, bucket) for the sketch's ``depth`` hash
    rows. ``hash_family='md5'`` derives the bucket from the first 3
    hex chars (12 bits, so width ≤ 4096) of md5('<d>|' || token) —
    the oracle-reproducible family; xxhash64 is the cheaper default.
    """
    if hash_family == "md5":
        if width > 4096:
            raise ValueError("md5 bucket family supports width <= 4096")

        def bucket(d: int):
            h = F.md5(F.concat(F.lit(f"{d}|"), F.col(token_col)))
            return F.pmod(
                F.conv(F.substring(h, 1, 3), 16, 10).cast("int"), F.lit(width)
            )

    else:

        def bucket(d: int):
            return F.pmod(
                F.xxhash64(F.col(token_col), F.lit(d)), F.lit(width)
            )

    return F.array(
        *[
            F.struct(F.lit(d).alias("d"), bucket(d).alias("bucket"))
            for d in range(depth)
        ]
    )


def cms_build(
    tokens: DataFrame,
    *,
    token_col: str = "token",
    depth: int = 4,
    width: int = 256,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """One-pass sketch build → (d, bucket, cnt) rows, at most
    depth·width of them regardless of input size. The explode is a
    constant factor ``depth``; the aggregate partial-combines before
    the single shuffle."""
    return (
        tokens.select(
            F.explode(
                _bucket_structs(token_col, depth, width, hash_family)
            ).alias("h")
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
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Point-frequency estimates: min over the candidate's depth
    counters. The sketch is ≤ depth·width rows → broadcast; a bucket
    absent from the sketch means nothing ever hashed there → 0."""
    cand = candidates.select(
        F.col(token_col),
        F.explode(_bucket_structs(token_col, depth, width, hash_family)).alias("h"),
    ).select(token_col, F.col("h.d").alias("d"), F.col("h.bucket").alias("bucket"))
    return (
        cand.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


def hll_md5_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    bucket_bits: int = 8,
) -> DataFrame:
    """Hand-rolled HyperLogLog (Flajolet et al. 2007) over md5 — the
    oracle-reproducible companion to approx_count_distinct (whose
    HLL++ registers are implementation-defined). Built entirely from
    deterministic built-ins, so any engine with md5 + string ops
    derives byte-identical registers:

    * bucket  — first ``bucket_bits/4`` md5 hex chars (value parsed
      base-16);
    * rho     — 1 + leading zero BITS of the next 32 hash bits,
      counted via the leading-zero hex run (regexp) plus the first
      non-zero nibble's bit length (a when-chain — no float log2, no
      cross-engine ulp risk);
    * registers — groupBy(group, bucket).max(rho): the standard
      mergeable form (register-wise max merges shards/days);
    * harmonic sum — EXACT integer arithmetic: Σ 2^(−rho) scaled by
      2^33 is a bigint (rho ≤ 33 ⇒ every term 2^(33−rho) is integral,
      total ≤ m·2^33), so the only floating-point steps are the final
      division and the linear-counting ln, both pinned by
      round(est, 2).

    Output per group: ``est_distinct`` (bias-corrected estimate,
    linear counting below 2.5·m when empty registers exist),
    ``zero_registers``, and the exact ``harmonic_scaled`` bigint that
    hash-pins the whole register pipeline.

    Scale: one shuffle on (group, bucket) with map-side max-combine,
    then a tiny per-group rollup — the fixed-size-summary path for
    distinct counts over 100 TB, mergeable across partitions.
    """
    if bucket_bits % 4 != 0 or not 4 <= bucket_bits <= 16:
        # buckets come from whole md5 hex chars; a non-multiple-of-4
        # width would leave (1<<bucket_bits) - 16^(bucket_bits//4)
        # registers permanently empty, skewing both the harmonic
        # estimate and the linear-counting branch
        raise ValueError(
            f"bucket_bits must be a multiple of 4 in [4, 16], got {bucket_bits}"
        )
    m = 1 << bucket_bits
    hex_chars = bucket_bits // 4
    h = F.md5(F.col(value_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, hex_chars), 16, 10).cast("int")
    tail = F.substring(h, hex_chars + 1, 8)
    lead = F.length(F.regexp_extract(tail, "^0*", 0))
    first_nz = tail.substr(lead + F.lit(1), F.lit(1))
    v = F.conv(first_nz, 16, 10).cast("int")
    nibble_lead = (
        F.when(v >= 8, 0).when(v >= 4, 1).when(v >= 2, 2).otherwise(3)
    )
    rho = F.when(lead >= 8, F.lit(33)).otherwise(
        lead * 4 + nibble_lead + 1
    )
    registers = (
        df.select(*group_cols, bucket.alias("_bucket"), rho.alias("_rho"))
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rho").alias("_r"))
    )
    pow33 = F.lit(1 << 33).cast("long")
    per_group = registers.groupBy(*group_cols).agg(
        (
            F.sum(F.expr("shiftleft(1L, 33 - _r)"))
            + (F.lit(m) - F.count("*")) * pow33
        ).alias("harmonic_scaled"),
        (F.lit(m) - F.count("*")).cast("int").alias("zero_registers"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = (
        F.lit(alpha) * F.lit(m) * F.lit(m) * pow33
    ) / F.col("harmonic_scaled")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("zero_registers") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_registers")),
    ).otherwise(raw)
    return per_group.select(
        *group_cols,
        F.round(est, 2).alias("est_distinct"),
        F.col("zero_registers"),
        F.col("harmonic_scaled"),
    )
