"""Streaming maintenance of the mergeable time-rollup partials
(operators/rollup.py) — the incremental continuous-aggregate refresh.

Design: each micro-batch reduces ITS OWN events to minute-grain
partial rows (operators.rollup.time_partials — the associative
(count, sum_millis, min, max) state) and appends them under a
``_batch_id=N`` partition; a replayed batch overwrites exactly its
own partition (dynamic partition overwrite — the engine's idempotent
foreachBatch sink pattern, cf. ann_serving/ingest). Because the state
is ASSOCIATIVE, batch fragments for the same minute bucket never need
read-modify-write at ingest time: the reader
(:func:`read_rollup`) merges fragments with the very same
``rollup_partials`` groupBy that merges minutes into hours. No
locking, no upsert, no state store — idempotence comes from the
partition overwrite, correctness from associativity.

100 TB posture: the partials table grows with buckets × groups ×
batches, orders of magnitude smaller than raw events; periodic
compaction (sinks.compact_partitions) can fold old ``_batch_id``
fragments into one, and every coarser dashboard resolution derives
from this one table without ever re-reading the event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import rollup


def _single_stamp(df: DataFrame, col: str, ctx: str):
    """The one value of a geometry stamp column (``_grain``,
    ``_bucket_bits``) across the WHOLE table — not a sampled first()
    row: a stream restarted into the same out_path with different
    parameters leaves fragments of mixed geometry coexisting, and a
    merge that checks only one arbitrary row silently mixes grains
    (finer-grain guards then pass or fail by sampling luck). One
    distinct over a stamp column of a partials table is cheap; a
    wrong merge is not."""
    rows = df.select(col).distinct().limit(3).collect()
    # a NULL stamp (fragment written without the column, schema-merged
    # as null) must surface as the named mixed-fragment error, not a
    # bare TypeError from sorting NoneType against str/int
    vals = sorted(r[0] for r in rows if r[0] is not None)
    has_null = len(vals) < len(rows)
    if len(vals) > 1 or (has_null and vals):
        shown = vals + (["<null>"] if has_null else [])
        raise ValueError(
            f"{ctx}: table holds fragments with mixed {col} values "
            f"{shown} — a stream was restarted into the same path "
            "with different parameters; rebuild or split the table "
            "before merging"
        )
    if has_null:
        # rows exist but every stamp is null: a stampless writer
        # produced the whole table — refuse by name rather than let
        # the caller crash on order.index(None) / stamp the compacted
        # output with a null
        raise ValueError(
            f"{ctx}: table's {col} stamp is null on every fragment — "
            "written without geometry stamps; rebuild it with the "
            "stamped writer before merging"
        )
    if not vals:
        # zero rows: no stamp to read — every caller needs the value
        # (grain comparisons, re-stamping compacted output), so a
        # None here just defers to an unnamed order.index(None) /
        # null-stamp crash downstream
        raise ValueError(
            f"{ctx}: table has no rows — no {col} stamp to verify; "
            "write at least one fragment before merging"
        )
    return vals[0]


def _check_written_grain(df: DataFrame, to_grain: str, ctx: str) -> DataFrame:
    """The ONE reader-side grain guard all four partials schemas
    share: assert the table's ``_grain`` stamp is single-valued, then
    refuse a ``to_grain`` FINER than it (re-truncating coarse buckets
    is the identity — the result would be coarse data silently
    labeled finer). Returns the frame with the stamp dropped."""
    if "_grain" not in df.columns:
        return df
    written = _single_stamp(df, "_grain", ctx)
    order = rollup._GRAIN_ORDER
    if order.index(to_grain) < order.index(written):
        raise ValueError(
            f"{ctx}: table was written at {written!r} grain; cannot "
            f"derive finer {to_grain!r} partials from it"
        )
    return df.drop("_grain")


def _start_partials_stream(
    events: DataFrame,
    partials_fn,
    *,
    out_path: str,
    checkpoint_dir: str,
    grain: str,
    available_now: bool,
    extra_stamps: dict[str, object] | None = None,
):
    """The ONE foreachBatch writer scaffold all four partials streams
    share: reduce the batch with ``partials_fn(batch)``, stamp
    ``_grain`` (+ any schema-specific stamps), and land the fragment
    under its own ``_batch_id`` partition via dynamic overwrite — so
    a replayed batch rewrites exactly its own fragment (idempotent)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        out = partials_fn(batch).withColumn("_grain", F.lit(grain))
        for c, v in (extra_stamps or {}).items():
            out = out.withColumn(c, F.lit(v))
        (
            out.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    writer = events.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_rollup_stream(
    events: DataFrame,
    *,
    out_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "minute",
    group_cols: list[str] | None = None,
    available_now: bool = False,
):
    """Maintain a ``grain`` partials table from an event stream.

    Each micro-batch writes its own partial rows under
    ``_batch_id=N`` (overwriting that partition on replay). Query the
    result with :func:`read_rollup`.
    """
    groups = list(group_cols or [])
    return _start_partials_stream(
        events,
        lambda batch: rollup.time_partials(
            batch, ts_col=ts_col, value_col=value_col, grain=grain,
            group_cols=groups,
        ),
        out_path=out_path,
        checkpoint_dir=checkpoint_dir,
        grain=grain,
        available_now=available_now,
    )


def read_rollup(
    spark: SparkSession,
    path: str,
    *,
    to_grain: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The query-side view of a streamed partials table: merge the
    per-batch fragments (and finer buckets) into ``to_grain``
    partials — the same associative groupBy that makes hour-from-
    minute exact in batch mode makes fragment-merge exact here.

    Refuses a ``to_grain`` FINER than the table's written grain
    (recorded per row as ``_grain``): re-truncating day buckets to
    'hour' is the identity and would return day data silently
    labeled as hourly."""
    df = _check_written_grain(
        spark.read.parquet(path), to_grain, "read_rollup"
    )
    return rollup.rollup_partials(
        df.drop("_batch_id"),
        to_grain=to_grain,
        group_cols=group_cols,
    )


def start_distinct_rollup_stream(
    events: DataFrame,
    *,
    out_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    distinct_col: str = "user_id",
    grain: str = "minute",
    group_cols: list[str] | None = None,
    bucket_bits: int = 8,
    available_now: bool = False,
):
    """The distinct-count twin of :func:`start_rollup_stream`: each
    micro-batch reduces ITS OWN events to ``grain`` HLL register
    partials (rollup.distinct_partials) under a ``_batch_id=N``
    partition. Registers merge by max — associative like the time
    partials — so fragments never need read-modify-write and
    :func:`read_distinct_rollup` answers exactly as a batch pass
    would. This closes the streaming side of the continuous-aggregate
    story for the one classic aggregate raw counts can't decompose.
    """
    groups = list(group_cols or [])
    return _start_partials_stream(
        events,
        lambda batch: rollup.distinct_partials(
            batch, ts_col=ts_col, distinct_col=distinct_col,
            grain=grain, group_cols=groups, bucket_bits=bucket_bits,
        ),
        out_path=out_path,
        checkpoint_dir=checkpoint_dir,
        grain=grain,
        available_now=available_now,
    )


def read_distinct_rollup(
    spark: SparkSession,
    path: str,
    *,
    to_grain: str,
    group_cols: list[str] | None = None,
    bucket_bits: int = 8,
) -> DataFrame:
    """Query-side view of a streamed register-partials table: merge
    per-batch fragments (and finer buckets) into ``to_grain``
    distinct-count estimates — register-wise max is the one merge
    law for fragments and grains alike, so stream ≡ batch exactly.
    Same finer-grain guard as :func:`read_rollup`; the frame's own
    ``_bucket_bits`` stamp guards the geometry in-plan."""
    df = _check_written_grain(
        spark.read.parquet(path), to_grain, "read_distinct_rollup"
    )
    return rollup.rollup_distinct(
        df.drop("_batch_id"),
        to_grain=to_grain,
        group_cols=group_cols,
        bucket_bits=bucket_bits,
    )


def start_quantile_rollup_stream(
    events: DataFrame,
    *,
    out_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "minute",
    group_cols: list[str] | None = None,
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 256,
    available_now: bool = False,
):
    """The QUANTILE twin of :func:`start_rollup_stream`: each
    micro-batch reduces ITS OWN events to ``grain`` fixed-bin
    histogram partials (rollup.value_quantile_partials — bin counts
    are sums on a shared integer grid, the mergeable quantile state)
    under a ``_batch_id=N`` partition. Fragments merge by the very
    same bin-sum groupBy that merges minutes into days, so
    :func:`read_quantile_rollup` answers exactly as a batch pass
    would — closing the streaming side for the SECOND classic
    non-decomposable aggregate (percentiles) the way the HLL stream
    closed COUNT DISTINCT. The grid geometry (lo/hi/bins) rides
    every row as the stamp columns the read path asserts in-plan;
    restarting into the same out_path with a different grid is
    caught, not merged."""
    groups = list(group_cols or [])
    return _start_partials_stream(
        events,
        lambda batch: rollup.value_quantile_partials(
            batch, ts_col=ts_col, value_col=value_col, grain=grain,
            group_cols=groups, lo=lo, hi=hi, bins=bins,
        ),
        out_path=out_path,
        checkpoint_dir=checkpoint_dir,
        grain=grain,
        available_now=available_now,
    )


def read_quantile_rollup(
    spark: SparkSession,
    path: str,
    *,
    to_grain: str,
    group_cols: list[str] | None = None,
    percents: tuple[int, ...] = (50, 90, 99),
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 256,
    interp: bool = False,
) -> DataFrame:
    """Quantile estimates served from a streamed histogram-partials
    table: fragment merge and grain merge are the one bin-sum
    groupBy inside rollup_quantiles, so stream ≡ batch exactly.
    ``interp`` picks the interpolated estimator
    (rollup_quantiles_interp) over the hash-stable lower-edge one —
    both read the same fragments. Same whole-table ``_grain`` guard
    as :func:`read_rollup`; the grid geometry is asserted IN-PLAN
    against the rows' own stamps (a fragment written under a
    different lo/hi/bins fails the assert instead of silently
    shifting every percentile)."""
    df = _check_written_grain(
        spark.read.parquet(path), to_grain, "read_quantile_rollup"
    )
    fn = (
        rollup.rollup_quantiles_interp if interp else rollup.rollup_quantiles
    )
    return fn(
        df.drop("_batch_id"),
        to_grain=to_grain,
        group_cols=group_cols,
        percents=percents,
        lo=lo,
        hi=hi,
        bins=bins,
    )


def start_variance_rollup_stream(
    events: DataFrame,
    *,
    out_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "minute",
    group_cols: list[str] | None = None,
    available_now: bool = False,
):
    """The MOMENT twin of :func:`start_rollup_stream`: per-batch
    (n, Σx, Σx²) fragments (rollup.variance_partials) under
    ``_batch_id=N`` — the fourth streamed partials schema, closing
    mean/stddev serving the way histograms closed percentiles and
    HLL closed COUNT DISTINCT. Moments are pure sums, so fragments
    and grains merge by the same fold; the Σx² DECIMAL accumulator
    lives only in the fragments (never a served output column)."""
    groups = list(group_cols or [])
    return _start_partials_stream(
        events,
        lambda batch: rollup.variance_partials(
            batch, ts_col=ts_col, value_col=value_col, grain=grain,
            group_cols=groups,
        ),
        out_path=out_path,
        checkpoint_dir=checkpoint_dir,
        grain=grain,
        available_now=available_now,
    )


def read_variance_rollup(
    spark: SparkSession,
    path: str,
    *,
    to_grain: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mean/stddev served from a streamed moment-partials table:
    fragment merge and grain merge are the one sum-fold inside
    rollup_variance, so stream ≡ batch exactly. Same whole-table
    ``_grain`` guard as the other readers."""
    df = _check_written_grain(
        spark.read.parquet(path), to_grain, "read_variance_rollup"
    )
    return rollup.rollup_variance(
        df.drop("_batch_id"), to_grain=to_grain, group_cols=group_cols
    )


# the columns start_rollup_stream itself writes; everything else in a
# partials table is a group dimension
_METRIC_COLS = ("n_events", "sum_millis", "min_millis", "max_millis")
_META_COLS = ("bucket_ts", *_METRIC_COLS, "_grain", "_batch_id")
# the distinct-rollup (HLL register) twin's schema
_DIST_META_COLS = (
    "bucket_ts", "_bucket", "_r", "_bucket_bits", "_grain", "_batch_id",
)
# the quantile-rollup (fixed-bin histogram) twin's schema
_QUANT_META_COLS = (
    "bucket_ts", "bin", "n", "_lo_millis", "_span_millis", "_bins",
    "_grain", "_batch_id",
)
# the moment-rollup (n, Σx, Σx²) twin's schema
_VAR_META_COLS = (
    "bucket_ts", "n_values", "sum_millis", "_sumsq_millis",
    "_grain", "_batch_id",
)


def _committed_batch_ids(hconf, jvm, checkpoint_dir: str) -> set[int]:
    """Batch ids with a commit marker in the stream's checkpoint —
    the set the source will NEVER redeliver. The FileSystem is
    derived from the CHECKPOINT path, not the table's: a table on
    s3a:// with a checkpoint on hdfs:// (a common split) would
    otherwise throw Hadoop's 'Wrong FS'."""
    commits = jvm.org.apache.hadoop.fs.Path(
        checkpoint_dir.rstrip("/") + "/commits"
    )
    fs = commits.getFileSystem(hconf)
    if not fs.exists(commits):
        return set()
    out: set[int] = set()
    for st in fs.listStatus(commits):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith("."):
            try:
                out.add(int(name))
            except ValueError:
                continue
    return out


def compact_rollup_fragments(
    spark: SparkSession,
    path: str,
    *,
    checkpoint_dir: str | None = None,
) -> tuple[int, int]:
    """Fold a streamed partials table's per-batch fragments into one
    fragment per bucket — the maintenance job that keeps the partials
    table small after months of micro-batches (fragments grow with
    batch count even though the merged state is bounded by buckets ×
    groups).

    Associativity makes this pure bookkeeping: the merged rows are
    exactly ``rollup_partials`` at the table's own written grain
    (group columns are DERIVED from the table's own schema — passing
    them would only add a way to silently aggregate a dimension
    away), and :func:`read_rollup` answers identically before and
    after (asserted in tests). The rewritten table carries a single
    ``_batch_id = -1`` so later stream batches keep appending their
    own partitions alongside it and the next compaction folds them
    in turn.

    Replay safety: pass the stream's ``checkpoint_dir`` and any
    fragment whose batch id has NO commit marker is carried through
    UNCHANGED instead of folded — a landed-but-uncommitted batch is
    redelivered on restart, and folding it into ``-1`` first would
    double-count it (the overwrite lands beside the fold, not over
    it). Without a checkpoint, every fragment is folded; only do that
    when the stream shut down cleanly.

    Crash safety is sinks.compact_partitions' retire→promote swap on
    the Hadoop FileSystem API (so hdfs:// and s3a:// table paths work
    the same as file:): recovery sweep first (finish a crashed
    promotion or restore a retired copy), write the new table aside,
    rename the live dir away, rename the new one in, and only then
    delete the old copy — at least one complete copy exists at every
    instant. Run it while the stream is NOT actively writing (between
    availableNow runs); a concurrent in-flight batch could land in
    the retired copy and be lost.

    Returns (fragments_before, fragments_after).
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    root = hpath(path)
    fs = root.getFileSystem(hconf)
    tmp = hpath(path.rstrip("/") + "_compact_tmp")
    old = hpath(path.rstrip("/") + "_compact_old")

    # recovery sweep: finish (or undo) the leftovers of a crashed run
    if fs.exists(old):
        if fs.exists(root):
            fs.delete(old, True)  # crashed after promote → redundant
        else:
            fs.rename(old, root)  # crashed between retire and promote
    if fs.exists(tmp):
        fs.delete(tmp, True)
    if not fs.exists(root):
        # maintenance fired before the stream's first batch landed —
        # same no-op contract as sinks.compact_partitions
        return 0, 0

    # fragment census from the partition listing — no data scan
    batch_ids: list[int] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("_batch_id="):
            batch_ids.append(int(name.split("=", 1)[1]))
    n_before = len(batch_ids)
    uncommitted: list[int] = []
    if checkpoint_dir is not None:
        committed = _committed_batch_ids(hconf, jvm, checkpoint_dir)
        uncommitted = sorted(
            b for b in batch_ids if b >= 0 and b not in committed
        )
    n_after = 1 + len(uncommitted)
    if n_before <= n_after:
        return n_before, n_before  # nothing to fold

    df = spark.read.parquet(path)
    # four streamed-partials schemas share this maintenance job:
    # (count, sum, min, max) time partials, HLL register partials,
    # fixed-bin quantile histograms, and (n, Σx, Σx²) moments — all
    # merge associatively, only the merge op differs
    is_registers = "_bucket" in df.columns and "_r" in df.columns
    is_quantiles = "bin" in df.columns and "_lo_millis" in df.columns
    is_moments = "_sumsq_millis" in df.columns
    meta = (
        _DIST_META_COLS
        if is_registers
        else _QUANT_META_COLS
        if is_quantiles
        else _VAR_META_COLS
        if is_moments
        else _META_COLS
    )
    missing = [c for c in meta if c not in df.columns]
    if missing:
        raise ValueError(
            f"compact_rollup_fragments: {path!r} is not a streamed "
            f"partials table (missing columns {missing})"
        )
    written = _single_stamp(df, "_grain", "compact_rollup_fragments")
    groups = [c for c in df.columns if c not in meta]
    foldable = (
        df.filter(~F.col("_batch_id").isin(uncommitted))
        if uncommitted
        else df
    )
    if is_registers:
        from ..operators import sketches

        bits = _single_stamp(
            df, "_bucket_bits", "compact_rollup_fragments"
        )
        merged = sketches.hll_merge_registers(
            foldable.drop("_batch_id", "_grain", "_bucket_bits"),
            ["bucket_ts", *groups],
        ).withColumn("_bucket_bits", F.lit(bits))
    elif is_quantiles:
        # the geometry stamps must be single-valued across the table
        # (a mixed-grid merge would silently shift every percentile);
        # the merge itself is the shared bin-sum law, which keeps the
        # stamps as group keys so their exact types survive
        for c in ("_lo_millis", "_span_millis", "_bins"):
            _single_stamp(df, c, "compact_rollup_fragments")
        merged = rollup.merge_quantile_partials(
            foldable.drop("_batch_id", "_grain"), group_cols=groups
        )
    elif is_moments:
        merged = rollup.merge_variance_partials(
            foldable.drop("_batch_id", "_grain"), group_cols=groups
        )
    else:
        merged = rollup.rollup_partials(
            foldable.drop("_batch_id", "_grain"),
            to_grain=written,
            group_cols=groups,
        )
    out = merged.withColumn("_grain", F.lit(written)).withColumn(
        "_batch_id", F.lit(-1)
    )
    if uncommitted:
        out = out.unionByName(
            df.filter(F.col("_batch_id").isin(uncommitted)).select(
                *out.columns
            )
        )
    out.write.mode("overwrite").partitionBy("_batch_id").parquet(
        tmp.toString()
    )
    marker = hpath(tmp, "_SUCCESS")
    if fs.exists(marker):
        fs.delete(marker, False)
    # retire → promote → clear: one complete copy exists throughout
    fs.rename(root, old)
    fs.rename(tmp, root)
    fs.delete(old, True)
    return n_before, n_after
