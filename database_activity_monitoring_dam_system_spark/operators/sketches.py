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
    registers = hll_registers(
        df, group_cols, value_col, bucket_bits=bucket_bits
    )
    return hll_finalize(registers, group_cols, bucket_bits=bucket_bits)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    bucket_bits: int = 8,
) -> DataFrame:
    """The mergeable state of :func:`hll_md5_distinct`, exposed: one
    (group, _bucket, _r) row per non-empty register. Registers over
    ANY partition of the data — shards, days, micro-batches, finer
    time buckets — merge by :func:`hll_merge_registers` (register-
    wise max) into exactly the registers a direct pass produces,
    which is what makes DISTINCT counts (non-decomposable as raw
    counts) roll up like decomposable aggregates."""
    if bucket_bits % 4 != 0 or not 4 <= bucket_bits <= 16:
        # buckets come from whole md5 hex chars; a non-multiple-of-4
        # width would leave (1<<bucket_bits) - 16^(bucket_bits//4)
        # registers permanently empty, skewing both the harmonic
        # estimate and the linear-counting branch
        raise ValueError(
            f"bucket_bits must be a multiple of 4 in [4, 16], got {bucket_bits}"
        )
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
    return (
        df.select(*group_cols, bucket.alias("_bucket"), rho.alias("_rho"))
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rho").alias("_r"))
    )


def hll_merge_registers(
    registers: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge register tables by register-wise max — the HLL merge
    law. ``group_cols`` is the TARGET grouping: registers from finer
    groups (e.g. minute buckets re-truncated to day) collapse into
    the coarser group's registers exactly."""
    return registers.groupBy(*group_cols, "_bucket").agg(
        F.max("_r").alias("_r")
    )


def hll_finalize(
    registers: DataFrame,
    group_cols: list[str],
    *,
    bucket_bits: int = 8,
) -> DataFrame:
    """Registers → (est_distinct, zero_registers, harmonic_scaled)
    per group — the bias-corrected estimate with linear counting,
    byte-identical to :func:`hll_md5_distinct`'s output."""
    m = 1 << bucket_bits
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


def _bloom_check(k: int, m_bits: int) -> None:
    if not 1 <= k <= 4:
        # positions come from disjoint 8-hex-char (32-bit) slices of
        # one md5; a 32-char digest holds exactly 4 such slices
        raise ValueError(f"bloom k must be in [1, 4], got {k}")
    if m_bits % 4 != 0 or not 64 <= m_bits <= (1 << 22):
        raise ValueError(
            f"m_bits must be a multiple of 4 in [64, 2^22], got {m_bits}"
        )


def _bloom_hash(value: Column, already_hex: bool) -> Column:
    return value if already_hex else F.md5(value.cast("string"))


def _bloom_positions(value: Column, k: int, m_bits: int, already_hex: bool):
    """The k bit positions of ``value``: disjoint 32-bit slices of its
    md5, mod m_bits — deterministic, engine-neutral (DuckDB derives
    the identical positions from the same hex arithmetic)."""
    h = _bloom_hash(value, already_hex)
    return [
        F.pmod(
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long"),
            F.lit(m_bits),
        )
        for i in range(k)
    ]



def _nibble_bit(p):
    """2^(3 - p%4) as a small-int when-chain (big-endian bit order
    within the nibble) — shiftleft() needs a literal shift, so the
    four cases are enumerated."""
    r = F.pmod(p, F.lit(4))
    return (
        F.when(r == 0, 8).when(r == 1, 4).when(r == 2, 2).otherwise(1)
    )


def bloom_bitmap(
    values: DataFrame,
    value_col: str,
    *,
    k: int = 3,
    m_bits: int = 65536,
    already_hex: bool = False,
    with_count: bool = True,
) -> DataFrame:
    """Build a Bloom filter (Bloom, CACM 1970) over a value column as
    ONE row holding the m-bit bitmap as a lowercase hex string
    (m_bits/4 chars) plus ``n_values``.

    Why a Bloom when the engine already broadcasts distinct-value
    tables for semi-joins: the bitmap is FIXED-size regardless of the
    set's cardinality — a 100 M-fingerprint eval set is ~3 GB as a
    broadcast table but 8 KB–512 KB as a bitmap — and it merges
    across shards/days by nibble-wise OR (:func:`bloom_merge`). The
    price is one-sided error: membership answers are "maybe" (false
    positives ≈ (1 − e^(−kn/m))^k), never false negatives.

    Build shape: k-position explode (constant factor k) → one
    map-side-combined DISTINCT on position (≤ m_bits rows by
    construction — the output is fixed-size no matter the input
    cardinality) → the bounded position set lands on the driver and
    packs into the hex string there (the tiny-dimension pattern: the
    filter fits in memory BY DESIGN, that is its entire point; a
    relational nibble-join build measured 4 extra stages of pure
    scheduling overhead on a 16 KB result). ``already_hex`` skips the
    md5 when values are already uniform 32-char hex digests (e.g.
    winnowing fingerprints) — their own hex IS the hash.
    ``with_count=False`` skips the separate n_values count job
    (reported as -1) when the caller doesn't need the load factor.
    """
    _bloom_check(k, m_bits)
    spark = values.sparkSession
    vals = _bloom_vals(values, value_col)
    bitmap = bloom_bitmap_str(
        values, value_col, k=k, m_bits=m_bits, already_hex=already_hex
    )
    # n (for the fp-rate formula) is the DISTINCT inserted-value
    # count — duplicate rows insert nothing new.
    n_values = vals.distinct().count() if with_count else -1
    return spark.createDataFrame(
        [(bitmap, n_values, k, m_bits)],
        "bitmap string, n_values long, k int, m_bits int",
    )


def _bloom_vals(values: DataFrame, value_col: str) -> DataFrame:
    # NULL values carry no membership information (md5(NULL) is NULL,
    # so every position would be NULL) — dropped, same as a NULL key
    # never matching a semi-join.
    return values.select(value_col).filter(F.col(value_col).isNotNull())


def bloom_bitmap_str(
    values: DataFrame,
    value_col: str,
    *,
    k: int = 3,
    m_bits: int = 65536,
    already_hex: bool = False,
) -> str:
    """:func:`bloom_bitmap`'s hex bitmap as a plain driver-side str —
    for callers that immediately embed it as a literal probe
    expression (:func:`bloom_member_col`): one positions job, no
    single-row DataFrame round-trip to read the string back out."""
    _bloom_check(k, m_bits)
    pos_rows = (
        _bloom_vals(values, value_col)
        .select(
            F.explode(
                F.array(
                    *_bloom_positions(
                        F.col(value_col), k, m_bits, already_hex
                    )
                )
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    nibbles = bytearray(m_bits // 4)
    for r in pos_rows:
        p = int(r["pos"])
        nibbles[p // 4] |= 1 << (3 - p % 4)
    return "".join("0123456789abcdef"[v] for v in nibbles)


_BITMAP_CHUNK = 64


def _nibble_at(bitmap, idx: Column) -> Column:
    """Nibble value at 0-based index ``idx`` of a hex bitmap.

    With a driver-side str bitmap the string is embedded as a literal
    ARRAY of 64-char chunks: element_at is O(1), the in-chunk substr
    walks ≤64 bytes. A single long string literal is the trap here —
    Spark's UTF8String.substring counts chars from the START, so
    substr(16 KB literal, pos) is O(pos) PER ROW (measured ~1.2 s of
    pure byte-walking over the sf0.1 fingerprint table). A Column
    bitmap (unknown at plan time) falls back to direct substr."""
    if isinstance(bitmap, str):
        chunks = [
            bitmap[i : i + _BITMAP_CHUNK]
            for i in range(0, len(bitmap), _BITMAP_CHUNK)
        ]
        arr = F.expr(
            "array(" + ",".join("'" + c + "'" for c in chunks) + ")"
        )
        chunk = F.element_at(arr, (idx / _BITMAP_CHUNK).cast("int") + 1)
        ch = chunk.substr(
            F.pmod(idx, F.lit(_BITMAP_CHUNK)).cast("int") + 1, F.lit(1)
        )
    else:
        ch = bitmap.substr(idx.cast("int") + 1, F.lit(1))
    return F.conv(ch, 16, 10).cast("int")


def bloom_member_col(
    value: Column, bitmap, *, k: int, m_bits: int,
    already_hex: bool = False,
) -> Column:
    """Membership predicate (pure codegen projection — no join): all
    k bit positions of ``value`` are set in ``bitmap`` (a driver-side
    hex str — preferred, see :func:`_nibble_at` — or a Column)."""
    _bloom_check(k, m_bits)
    cond = None
    for p in _bloom_positions(value, k, m_bits, already_hex):
        nib = _nibble_at(bitmap, (p / 4).cast("int"))
        bit = _nibble_bit(p)
        c = nib.bitwiseAND(bit) != 0
        cond = c if cond is None else (cond & c)
    return cond


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    value_col: str,
    *,
    already_hex: bool = False,
) -> DataFrame:
    """Probe every row's value against a :func:`bloom_bitmap` frame,
    adding ``maybe_member``. The one-row bitmap is collected (m/8
    bytes — the tiny-dimension pattern) and embedded as a LITERAL in
    the bit-test expressions: one copy in the plan, not a per-row
    16 KB string column that a crossJoin would materialize into
    every output row. Zero shuffle, zero join on ``df``."""
    row = bloom.select("bitmap", "k", "m_bits").first()
    return df.withColumn(
        "maybe_member",
        bloom_member_col(
            F.col(value_col), row["bitmap"],
            k=int(row["k"]), m_bits=int(row["m_bits"]),
            already_hex=already_hex,
        ),
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two same-parameter Bloom bitmaps by nibble-wise OR — the
    mergeable-sketch property (shards/days build independent bitmaps;
    the union's bitmap is their OR, exactly).

    Raises on mismatched (k, m_bits): OR-ing bitmaps of different
    geometry silently truncates to the shorter one and mixes
    positions computed mod different m — a merged filter that yields
    FALSE NEGATIVES, the one failure mode a Bloom must never have.

    ``n_values`` of the merge is na + nb — an UPPER bound on the
    union's cardinality (members present in both shards count twice);
    the bitmap itself is exact for the union. Use the bound only for
    conservative load-factor sizing. A bitmap built with
    ``with_count=False`` carries the -1 sentinel instead of a count;
    summing it would yield a nonsense negative/understated bound, so
    the sentinel PROPAGATES: if either input is uncounted, the merge
    is uncounted (-1) — the documented na+nb bound only holds when
    both sides counted."""
    pa_row = a.select("k", "m_bits").first()
    pb_row = b.select("k", "m_bits").first()
    if (pa_row["k"], pa_row["m_bits"]) != (pb_row["k"], pb_row["m_bits"]):
        raise ValueError(
            "bloom_merge: mismatched filter parameters "
            f"(k={pa_row['k']}, m_bits={pa_row['m_bits']}) vs "
            f"(k={pb_row['k']}, m_bits={pb_row['m_bits']}) — bitmaps "
            "of different geometry cannot be OR-merged"
        )
    pa = a.select(
        F.col("bitmap").alias("ba"), F.col("n_values").alias("na"),
        "k", "m_bits",
    )
    pb = b.select(
        F.col("bitmap").alias("bb"), F.col("n_values").alias("nb"),
    )
    j = pa.crossJoin(pb)
    merged_nib = F.transform(
        F.zip_with(
            F.split(F.col("ba"), ""),
            F.split(F.col("bb"), ""),
            lambda x, y: F.struct(x.alias("x"), y.alias("y")),
        ),
        lambda s: F.lit("0123456789abcdef").substr(
            F.conv(s.x, 16, 10)
            .cast("int")
            .bitwiseOR(F.conv(s.y, 16, 10).cast("int"))
            + 1,
            F.lit(1),
        ),
    )
    merged_n = F.when(
        (F.col("na") < 0) | (F.col("nb") < 0), F.lit(-1).cast("long")
    ).otherwise(F.col("na") + F.col("nb"))
    return j.select(
        F.concat_ws("", merged_nib).alias("bitmap"),
        merged_n.alias("n_values"),
        "k",
        "m_bits",
    )
