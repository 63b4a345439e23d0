"""Structured Streaming ingest pipeline (SURVEY.md §2.9, E1).

Replaces the reference's poll-loop + high-water-mark + HTTP hops
(dam_agent.py:175-261 → app.py:1167-1190) with one checkpointed
streaming plan:

    readStream(agent events)
      → normalize (same expression transform as batch)
      → watermark (ST1/ST2: checkpoint offsets subsume the agent's
        last_event_time mark; late rows are HANDLED, not silently
        dropped like dam_agent.py:199-200 — delay is configurable,
        0 s reproduces reference behavior)
      → firewall stream-static join (ST6: rules re-resolve every
        micro-batch, fixing the reference's 60 s staleness window)
      → rule battery enrichment (R1, same expressions as batch;
        derived columns computed BEFORE append — no UPDATE-in-place)
      → foreachBatch fan-out (S5/S6/ST7): activity_logs append,
        High/Critical alerts append, optional notifier hook
        (at-least-once, matching the reference's fire-and-forget).

Windowed aggregates (ST3/ST4) are separate streaming queries over the
same normalized stream: tumbling 1 h timeline, sliding per-user rate
counts. Each micro-batch computes the derived columns once; the alert
branch is a filter on the SAME batch frame (no second scan).

The rate rule (R1 family 6) is event-time windowed here rather than
the reference's wall-clock in-memory list — replayable and identical
across retries.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import rules
from ..schemas import AGENT_EVENT
from ..sources.agent import normalize_agent_events


def read_agent_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based agent-event stream (JSON lines with the agent's POST
    shape, dam_agent.py:220-229). In production this is a Kafka topic;
    the file source keeps the same unbounded-table semantics."""
    reader = (
        spark.readStream.schema(AGENT_EVENT)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1000)
    )
    return reader.json(source_dir)


def enrich_stream(
    events: DataFrame,
    *,
    users: DataFrame | None = None,
    ip_blacklist: DataFrame | None = None,
    watermark_delay: str = "10 minutes",
    now: dt.datetime | str | None = None,
) -> DataFrame:
    """normalize → watermark → rule battery (stateless part).

    The rate rule is excluded here because unbounded window functions
    cannot run on a streaming frame — the foreachBatch path
    (start_ingest) applies it per micro-batch, and the exact
    cross-batch form is stateful.exact_rate_counts; everything else is
    the same single projection the batch path uses.
    """
    normalized = (
        normalize_agent_events(events)
        .withWatermark("access_timestamp", watermark_delay)
        .withColumn("activity_id", F.lit(None).cast("long"))
        .withColumn("user_id", F.lit(None).cast("long"))
        .withColumn("ip_address", F.lit(None).cast("string"))
        .withColumn("rows_affected", F.lit(None).cast("int"))
    )
    return rules.apply_rule_battery(
        normalized,
        users=users,
        ip_blacklist=ip_blacklist,
        now=now,
        with_rate_rule=False,
    )


def start_ingest(
    spark: SparkSession,
    source_dir: str,
    *,
    activity_sink: str,
    alerts_sink: str,
    checkpoint_dir: str,
    users: DataFrame | None = None,
    ip_blacklist: DataFrame | None = None,
    firewall_rules: DataFrame | None = None,
    blocks_sink: str | None = None,
    notifier: Callable[[list], None] | None = None,
    watermark_delay: str = "10 minutes",
    available_now: bool = False,
    resolve_user_ids: bool = False,
    exact_rate: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """The full E1 pipeline as one checkpointed query.

    foreachBatch fans one computed frame into both sinks — the batch
    is cached so activity append + alert filter + notifier share a
    single evaluation (the reference re-SELECTs per row; app.py:340).

    ``resolve_user_ids=False`` (default) reproduces the reference
    exactly: agent-ingested rows are inserted with user_id NULL
    (app.py:1182), so the role rules and the user-keyed rate rule are
    structurally inert for them. ``resolve_user_ids=True`` is the
    engine extension a production DAM wants: username → user_id via a
    broadcast of ``users``, which arms the role and rate rules on
    streamed rows with the SAME expressions the batch path uses.

    ``exact_rate=True`` (requires ``resolve_user_ids``) makes the rate
    rule EXACT across micro-batch boundaries: each batch's trailing
    window is seeded with the per-user epoch buffer carried from prior
    batches (stateful.seeded_rate_counts), snapshotted per batch under
    ``{checkpoint_dir}/rate_state``. Default False keeps the
    batch-bounded window — a 100-queries/min burst that straddles a
    batch boundary undercounts there, while the reference's continuous
    in-memory window (app.py:396-403) does not; exact_rate is the
    parity-correct form.
    """
    if exact_rate and not resolve_user_ids:
        raise ValueError(
            "exact_rate=True requires resolve_user_ids=True — without "
            "resolved user ids the rate rule is structurally inert "
            "(user_id NULL, reference parity)"
        )
    rate_state_dir = f"{checkpoint_dir}/rate_state"
    stream = read_agent_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        df = batch_df

        def with_stream_id(normalized: DataFrame) -> DataFrame:
            # Stream activity_id = content hash + an occurrence number
            # so LEGITIMATE duplicate events (same user, same SQL, same
            # second) stay distinct rows: monotonically_increasing_id
            # alone restarts per micro-batch (cross-batch collisions);
            # a bare content hash collides within a batch. The
            # occurrence window shuffles only identical-identity groups
            # (tiny) per micro-batch.
            from pyspark.sql import Window as W

            occ = F.row_number().over(
                W.partitionBy(
                    "access_timestamp", "username", "operation_details"
                ).orderBy(F.monotonically_increasing_id())
            )
            return normalized.withColumn(
                "activity_id",
                F.xxhash64(
                    "access_timestamp",
                    "username",
                    "operation_details",
                    occ.cast("string"),
                ),
            )
        def with_identity(normalized: DataFrame) -> DataFrame:
            out = with_stream_id(normalized)
            if resolve_user_ids and users is not None:
                ids = users.select("username", "user_id")
                out = out.join(F.broadcast(ids), "username", "left")
            else:
                # Reference parity: agent-ingested rows carry no
                # user_id (app.py:1182 inserts NULL).
                out = out.withColumn("user_id", F.lit(None).cast("long"))
            # Agent payloads carry no IP: an all-NULL ip_address column
            # means IP-scoped firewall rules and the blacklist rule
            # never match (NULL fails equality) — without the string
            # collision hazard of scoping them by username.
            return (
                out.withColumn("ip_address", F.lit(None).cast("string"))
                .withColumn("rows_affected", F.lit(None).cast("int"))
            )

        df_norm = with_identity(normalize_agent_events(df))
        if firewall_rules is not None:
            # ST6: rules are re-read per micro-batch via this closure's
            # DataFrame (re-collected each batch) — no TTL staleness.
            fw = rules.firewall_check(
                df_norm,
                firewall_rules,
                user_col="username",
            )
            if blocks_sink is not None:
                # S7: the reference journals EVERY rule hit — block or
                # alert — to firewall_blocks (app.py:843-848); only
                # action='block' keeps the row out of the activity log.
                fw.filter(F.col("rule_id").isNotNull()).select(
                    F.col("rule_id"),
                    F.col("username"),
                    F.col("ip_address"),
                    F.substring("operation_details", 1, 500).alias("query_text"),
                    F.col("access_timestamp").alias("blocked_at"),
                ).write.mode("append").parquet(blocks_sink)
            df_checked = fw.filter(
                F.col("action").isNull() | (F.col("action") != "block")
            ).drop("rule_id", "action", "rule_description")
        else:
            df_checked = df_norm
        # R1 family 6 (rate limit) runs per micro-batch with the SAME
        # trailing event-time window as batch — streamed rows carry
        # "Rate limit exceeded" reason/severity exactly like batch rows
        # (the r8 user_id gate is identical on both paths). The window
        # is bounded by the micro-batch unless exact_rate seeds it with
        # the carried cross-batch state below. Only armed when user ids
        # are resolved: without them user_id is forced NULL, r8 is
        # structurally false (reference parity, app.py:396/1182), and
        # the window would shuffle every row into one NULL-key
        # partition for a provably dead result.
        rate_state = None
        if exact_rate:
            from . import stateful

            rate_state = stateful.read_rate_state(
                spark, rate_state_dir, batch_id
            )
            df_checked = stateful.seeded_rate_counts(df_checked, rate_state)
        enriched = rules.apply_rule_battery(
            df_checked,
            users=users,
            ip_blacklist=ip_blacklist,
            with_rate_rule=resolve_user_ids,
        )
        if "queries_last_min" in enriched.columns:
            enriched = enriched.drop("queries_last_min")  # helper col
        enriched.persist()
        try:
            enriched.write.mode("append").parquet(activity_sink)
            alerts = rules.derive_alerts(enriched)
            alerts.write.mode("append").parquet(alerts_sink)
            if notifier is not None:
                payload = [r.asDict() for r in alerts.collect()]
                if payload:
                    notifier(payload)
            if exact_rate:
                from . import stateful

                stateful.write_rate_state(
                    stateful.rate_state_after(df_checked, rate_state),
                    rate_state_dir,
                    batch_id,
                )
        finally:
            enriched.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    normalized: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("query_hash", "username"),
    ts_col: str = "access_timestamp",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-event view of an at-least-once source: drop
    redelivered copies of an event whose duplicates arrive within
    ``watermark_delay`` of each other. The dedup identity is
    ``key_cols`` PLUS the event timestamp — only byte-identical
    redeliveries (same key AND same event time, the agent's
    retry-the-same-payload mode) collapse; a retry re-stamped with a
    new event time is a distinct event and both copies survive —
    Spark's dropDuplicatesWithinWatermark state store, which (unlike
    a bare streaming dropDuplicates) EVICTS each key once the
    watermark passes it, so state is bounded by the horizon's
    distinct keys instead of growing with history. The agent's HTTP
    ingest retries on timeout (at-least-once by design); this is the
    seam that makes the activity table effectively-once without a
    read-side dedup on 100 TB.

    Honest contract: a duplicate arriving LATER than the watermark
    horizon after its original is NOT caught (its key's state was
    evicted) — size ``watermark_delay`` to the upstream's maximum
    redelivery lag, the same horizon reasoning as the CDC tombstone
    journal. The batch arbiter is plain dropDuplicates over the same
    keys."""
    return normalized.withWatermark(
        ts_col, watermark_delay
    ).dropDuplicatesWithinWatermark([*key_cols, ts_col])


def timeline_stream(
    normalized: DataFrame, *, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """ST3 — streaming tumbling 1-hour timeline (A5's streaming twin)."""
    return (
        normalized.withWatermark("access_timestamp", watermark_delay)
        .groupBy(F.window("access_timestamp", "1 hour").alias("win"))
        .agg(
            F.count("*").alias("total"),
            F.sum(
                F.when(F.col("operation_status") == "Failed", 1).otherwise(0)
            ).alias("failed"),
        )
        .select(
            F.col("win.start").alias("bucket_start"),
            F.col("win.end").alias("bucket_end"),
            "total",
            "failed",
        )
    )


def rate_alert_stream(
    normalized: DataFrame,
    *,
    threshold: int = rules.MAX_QUERIES_PER_MIN,
    watermark_delay: str = "10 minutes",
    slide: str = "10 seconds",
) -> DataFrame:
    """ST4 — sliding per-user rate counts; emits users breaching the
    per-minute budget (R1 family 6, event-time form)."""
    return (
        normalized.withWatermark("access_timestamp", watermark_delay)
        .groupBy(
            F.window("access_timestamp", "60 seconds", slide).alias("win"),
            F.col("username"),
        )
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > threshold)
        .select(
            F.col("win.start").alias("window_start"), "username", "cnt"
        )
    )
