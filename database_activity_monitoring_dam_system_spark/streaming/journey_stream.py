"""Streaming maintenance of the transition-matrix partials
(operators/journeys.py transition_partials) — journey analytics kept
fresh by micro-batch, the rollup_stream fragment pattern applied to
the one journey primitive whose state is associative.

Why transitions stream and funnels don't: a transition COUNT is a sum
over consecutive pairs, so per-batch pair counts merge exactly — but
forming the pairs needs the pair that SPANS the batch boundary (last
event of the previous batches, first of this one), which no single
batch contains. That boundary is closed with a per-user last-event
SNAPSHOT table maintained the write_rate_state way (streaming/
stateful.py): each batch writes the FULL per-user snapshot (previous
snapshot merged with its own last events) under its own partition,
the reader takes the LATEST partition strictly before the current
batch id, and partitions more than ``keep_batches`` behind are
deleted — state stays O(users × keep_batches) with no small-files
growth, retries re-seed from the predecessor snapshot, and pruning
is SAFE because every partition is a complete snapshot (unlike a
per-batch delta journal, where pruning would lose idle users'
last events).

Funnels stream too, but through a different door: step attribution
needs each user's FULL ordered event sequence (an early step arriving
late can re-label every later step), so no associative partials
exist. :func:`funnel_stream` instead keys per-user state with
``applyInPandasWithState``: events newer than the watermark sit in a
replay buffer (re-folded in full on every emission — disorder inside
the horizon re-labels freely), and once the watermark passes an event
it is folded permanently into the resolved step-timestamp prefix and
dropped. State is therefore bounded — |steps| resolved epochs plus a
watermark-horizon buffer per user — and the emitted rows converge to
exactly ``journeys.funnel_steps`` (the single ascending fold and the
layered-window min compute the same strictly-ordered attribution).

Pairing definition is journeys.transition_pairs — the SAME function
the batch twin reduces, with its ``carry_col`` seam marking carried
rows (valid as a pair's FROM, never its TO) — so stream ≡ batch holds
by construction, not by parallel implementations.

Correctness contract: exact ≡ batch when each user's events arrive in
event-time order ACROSS batches (in-batch disorder is fine — the
window sorts). An out-of-order straggler spanning a boundary would
pair against the wrong neighbor; the batch twin
(journeys.transition_partials) is the arbiter and the stream ≡ batch
test pins equality under the ordered-source contract.

The fragment table IS a rollup-partials table (n_events = transition
count; the millis fields carry dwell seconds), so the whole existing
maintenance stack applies unchanged: rollup_stream.read_rollup merges
fragments and grains, compact_rollup_fragments folds them
checkpoint-aware, and journeys.transition_matrix serves per-bucket
probabilities from the merged state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import journeys, rollup


def _read_last_events(
    spark, state_path: str, batch_id: int, cols: list[str], user_col: str
) -> DataFrame | None:
    """Latest per-user last-event snapshot strictly before
    ``batch_id`` (a retried batch re-seeds from its predecessor, not
    its own failed attempt). Existence is probed through the Hadoop
    FileSystem API — read_rate_state's discipline: depending on the
    source a missing path can surface lazily as FileNotFoundException
    inside the foreachBatch action (killing the stream) rather than
    as AnalysisException at read time, and a blanket except would
    also silently misread a REAL state error as 'first batch',
    dropping boundary pairs forever. Duplicate rows from a
    half-written retry partition collapse by read-side dedup."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(state_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    snap = spark.read.parquet(state_path)
    prior = snap.filter(F.col("_batch_id") < batch_id)
    latest = prior.agg(F.max("_batch_id")).first()[0]
    if latest is None:
        return None
    return (
        prior.filter(F.col("_batch_id") == latest)
        .dropDuplicates([user_col])
        .select(*cols)
    )


def _write_last_events(
    snapshot: DataFrame,
    state_path: str,
    batch_id: int,
    *,
    keep_batches: int,
) -> None:
    """Append this batch's FULL snapshot under its own partition,
    then prune partitions more than ``keep_batches`` behind — the
    write_rate_state retention contract (new snapshot durable before
    anything is removed; a retried batch's predecessor is always
    inside the keep window)."""
    spark = snapshot.sparkSession
    snapshot.withColumn("_batch_id", F.lit(batch_id)).write.mode(
        "append"
    ).partitionBy("_batch_id").parquet(state_path)
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(state_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("_batch_id="):
            continue
        try:
            old_id = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if old_id <= batch_id - keep_batches:
            fs.delete(status.getPath(), True)


def with_carried_last_events(
    batch: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    cols: list[str],
    user_col: str,
) -> DataFrame:
    """This batch's rows (``_carry=False``) unioned with the
    predecessor per-user last-event snapshot (``_carry=True``) — the
    input every carried-boundary pairing consumes. Shared by the
    transition stream and the impossible-travel stream (one carry
    discipline, not two drifting copies)."""
    carry_in = _read_last_events(
        batch.sparkSession, state_path, batch_id, cols, user_col
    )
    src = batch.select(*cols).withColumn("_carry", F.lit(False))
    if carry_in is not None:
        src = src.unionByName(carry_in.withColumn("_carry", F.lit(True)))
    return src


def roll_last_event_snapshot(
    src: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    user_col: str,
    order_cols: list[str],
    keep_batches: int,
) -> None:
    """Roll the per-user last-event snapshot forward: newest row per
    user of (carry ∪ batch) by ``order_cols`` desc — a COMPLETE
    snapshot, so retention pruning can never lose an idle user's
    last event. The write/prune contract is _write_last_events."""
    merged = src.drop("_carry")
    w_last = Window.partitionBy(user_col).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    snapshot = (
        merged.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    _write_last_events(
        snapshot, state_path, batch_id, keep_batches=keep_batches
    )


def start_transition_stream(
    events: DataFrame,
    *,
    out_path: str,
    checkpoint_dir: str,
    state_path: str,
    grain: str = "day",
    ts_col: str = "ts",
    id_col: str = "event_id",
    user_col: str = "user_id",
    type_col: str = "event_type",
    keep_batches: int = 3,
    available_now: bool = False,
):
    """Maintain ``grain`` transition partials from an event stream.

    Each micro-batch forms its pairs (own rows plus the boundary
    pairs against the carried snapshot) with the SHARED pairing
    definition, reduces them to time-partials fragments under
    ``_batch_id=N`` at ``out_path`` (dynamic overwrite — replay
    rewrites exactly its own fragment), and rolls the per-user
    last-event snapshot forward at ``state_path``. Query with
    rollup_stream.read_rollup (group_cols=['from_type', 'to_type'])
    and serve probabilities with journeys.transition_matrix; compact
    fragments with the existing rollup maintenance job (the state
    table needs no compaction — it is retention-pruned in-line)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        cols = [user_col, ts_col, id_col, type_col]
        src = with_carried_last_events(
            batch, batch_id, state_path=state_path, cols=cols,
            user_col=user_col,
        )
        pairs = journeys.transition_pairs(
            src,
            user_col=user_col,
            ts_col=ts_col,
            type_col=type_col,
            id_col=id_col,
            carry_col="_carry",
        )
        partials = rollup.time_partials(
            pairs,
            ts_col="ts",
            value_col="gap_seconds",
            grain=grain,
            group_cols=["from_type", "to_type"],
        )
        (
            partials.withColumn("_grain", F.lit(grain))
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )
        roll_last_event_snapshot(
            src, batch_id, state_path=state_path, user_col=user_col,
            order_cols=[ts_col, id_col], keep_batches=keep_batches,
        )

    writer = events.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _funnel_state_schema(ttl_us: int | None):
    """State row schema for the funnel stream.  The TTL-less schema
    is the original 3-field one so checkpoints written before the
    ``state_ttl`` feature resume unchanged; opting into a TTL adds
    the ``last_us`` column the event-time timeout needs (and
    therefore requires a fresh checkpoint location — documented on
    the parameter, along with the one-time incompatibility for
    TTL-less checkpoints written by the intermediate always-4-field
    version)."""
    from pyspark.sql import types as T

    fields = [
        T.StructField("resolved", T.ArrayType(T.LongType()), True),
        T.StructField("buf_ts", T.ArrayType(T.LongType()), True),
        T.StructField("buf_step", T.ArrayType(T.IntegerType()), True),
    ]
    if ttl_us is not None:
        fields.append(T.StructField("last_us", T.LongType(), True))
    return T.StructType(fields)


def _funnel_fn(steps: list[str], user_field: str, ttl_us: int | None = None):
    """Per-user funnel state function for applyInPandasWithState.

    State = (resolved, buf_ts, buf_step): ``resolved`` is the
    strictly-ordered step-completion prefix (epoch µs, one slot per
    step, set-once) folded from events the watermark has passed;
    the buffer holds the not-yet-final events. The fold is the
    single ascending pass equivalent of funnel_steps' layered
    window mins: processing events in (ts, step) order, step 0's
    first event sets slot 0, and step s's first event strictly
    after slot s-1 sets slot s — set-once is sound because the
    ascending order makes the first qualifying event the minimum.

    Event times arrive as the PRE-COMPUTED ``_ts_us`` epoch-µs long
    (unix_micros, projected JVM-side) — never from pandas timestamp
    values: Arrow hands the state fn tz-naive timestamps localized
    to spark.sql.session.timeZone, whose ``.value`` is wall-clock-
    as-UTC, skewed by the session offset against the TRUE epochs of
    getCurrentWatermarkMs() (finalizing hours early/late) and of the
    emitted t_* seconds. The long column is session-TZ-proof.

    ``ttl_us`` (the ``state_ttl`` opt-in) bounds state lifetime: a
    user is evicted when the funnel is complete with nothing left in
    the buffer (the emitted row is terminal), or when event time has
    advanced ``ttl_us`` past the user's last event (event-time
    timeout — a user gone quiet that long restarts from scratch if
    they ever return).  Without it, state is a lifetime aggregate:
    exact for any arrival pattern, but O(users × steps) forever.
    """
    import pandas as pd

    n = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}
    t_names = [f"t_{s}" for s in steps]

    def _fold(resolved: list, events) -> list:
        out = list(resolved)
        for ts, si in events:
            if si == 0:
                if out[0] is None:
                    out[0] = ts
            elif (
                out[si] is None
                and out[si - 1] is not None
                and ts > out[si - 1]
            ):
                out[si] = ts
        return out

    def fn(key, pdfs, state):
        (user,) = key
        if ttl_us is not None and state.hasTimedOut:
            # horizon passed with no new events — the latest emitted
            # row already is the final answer; drop the state
            state.remove()
            yield pd.DataFrame(columns=[user_field, *t_names, "step_reached"])
            return
        if state.exists:
            # the state tuple is 3-field (legacy, checkpoint-stable)
            # without TTL and gains last_us only when the TTL opt-in
            # is on — a pre-TTL checkpoint resumes unchanged for
            # callers that never pass state_ttl
            if ttl_us is not None:
                resolved, buf_ts, buf_step, last_us = state.get
                last_us = (
                    None
                    if last_us is None or pd.isna(last_us)
                    else int(last_us)
                )
            else:
                resolved, buf_ts, buf_step = state.get
                last_us = None
            resolved = [None if pd.isna(v) else int(v) for v in resolved]
            buf = list(zip(buf_ts, buf_step))
        else:
            resolved = [None] * n
            buf = []
            last_us = None
        for pdf in pdfs:
            for ts_us, tp in zip(pdf["_ts_us"], pdf["_type"]):
                si = step_idx.get(tp)
                if si is not None:
                    ts_int = int(ts_us)
                    buf.append((ts_int, si))
                    last_us = (
                        ts_int if last_us is None else max(last_us, ts_int)
                    )
        # events the watermark has passed are totally ordered and
        # final — fold them into the resolved prefix permanently.
        # Strictly-below keeps an ==watermark event replayable (the
        # boundary case costs one extra buffering round, never
        # correctness).
        wm_us = state.getCurrentWatermarkMs() * 1000
        final = sorted(e for e in buf if e[0] < wm_us)
        buf = [e for e in buf if e[0] >= wm_us]
        resolved = _fold(resolved, final)
        # current view: resolved prefix + a full re-fold of the
        # still-mutable buffer (late arrivals inside the horizon can
        # re-label buffered steps, so the buffer is never folded
        # incrementally)
        view = _fold(resolved, sorted(buf))
        reached = 0
        while reached < n and view[reached] is not None:
            reached += 1
        # terminal once the watermark passes the last event: every
        # slot is set-once and any later event is > all of them, so
        # nothing can revise a complete view after that point
        done = reached == n and not buf
        if ttl_us is not None and done:
            if state.exists:
                state.remove()
        else:
            packed = (resolved, [e[0] for e in buf], [e[1] for e in buf])
            state.update(
                packed + (last_us,) if ttl_us is not None else packed
            )
            if ttl_us is not None:
                # complete-in-view funnels evict at the next watermark
                # advance past their last event (confirmation, not the
                # full TTL); incomplete ones wait out the TTL.  Either
                # way the timeout must sit strictly past the watermark.
                horizon_us = last_us + (1_000 if reached == n else ttl_us)
                state.setTimeoutTimestamp(
                    max(horizon_us // 1000, wm_us // 1000 + 1)
                )
        if reached == 0:
            yield pd.DataFrame(columns=[user_field, *t_names, "step_reached"])
            return
        row = {
            user_field: [user],
            **{
                t_names[i]: [None if view[i] is None else view[i] // 1_000_000]
                for i in range(n)
            },
            "step_reached": [reached],
        }
        yield pd.DataFrame(row)

    return fn


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark_delay: str = "10 minutes",
    state_ttl: str | None = None,
) -> DataFrame:
    """Streaming twin of ``journeys.funnel_steps`` (same strictly-
    ordered attribution, same output shape): per-user funnel rows
    kept fresh by micro-batch, exact ≡ batch for any disorder within
    ``watermark_delay`` (events later than that are dropped by the
    watermark — size it to the source's maximum lag, the
    dedup_stream horizon reasoning).

    Emits one APPEND row per (user, invocation) once the user has
    reached ≥1 step; the LATEST row per user is the funnel state (the
    batch arbiter for convergence is funnel_steps over the same
    events). State per user is |steps| resolved epochs + the
    watermark-horizon event buffer — funnel state is a lifetime
    aggregate, so by default keys are never evicted (O(users ×
    steps) total, the per-user-profile state class; the reference
    keeps the same per-user dictionaries in process memory,
    app.py:546-552).

    ``state_ttl`` (e.g. ``"30 days"``) is the bounded-state opt-in a
    years-long stream over 10⁹ users needs: evict a user once the
    funnel is complete with an empty buffer (the emitted row is
    terminal — strictly-ordered attribution means no later event can
    extend it, and sub-watermark re-labels are already final), or
    once event time passes ``last event + state_ttl`` (event-time
    timeout).  State drops from O(all users ever) to O(users active
    within the TTL window).  Exactness contract: identical to the
    unbounded stream — and therefore to batch funnel_steps —
    whenever every user's event gaps fit inside the TTL; a user who
    returns after a longer silence restarts from an empty funnel
    (the documented divergence, tested).  Opting in widens the state
    row (a ``last_us`` column the timeout needs), so flipping
    ``state_ttl`` on an EXISTING stream requires a fresh checkpoint
    location; TTL-less streams keep the original 3-field state and
    resume any pre-TTL checkpoint unchanged.  One-time migration
    caveat: during the interval between the ``state_ttl`` feature
    landing and this conditional schema, TTL-less streams persisted
    4-field state rows (trailing null ``last_us``); a checkpoint
    written by THAT intermediate version cannot resume under the
    restored 3-field schema — restart it from a fresh checkpoint
    location once.  Checkpoints from before the feature and from the
    current version are unaffected.

    The step filter runs BEFORE the shuffle into per-user state, so
    only funnel-typed events reach the state store.
    """
    journeys.check_funnel_steps(steps)
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    ttl_us = None
    if state_ttl is not None:
        import pandas as pd

        ttl_us = int(pd.Timedelta(state_ttl).total_seconds() * 1_000_000)
        if ttl_us <= 0:
            raise ValueError(f"state_ttl must be positive, got {state_ttl!r}")

    user_type = events.schema[user_col].dataType
    out_schema = T.StructType(
        [T.StructField(user_col, user_type, True)]
        + [T.StructField(f"t_{s}", T.LongType(), True) for s in steps]
        + [T.StructField("step_reached", T.IntegerType(), True)]
    )
    state_schema = _funnel_state_schema(ttl_us)
    return (
        events.filter(F.col(type_col).isin(steps))
        .select(
            F.col(user_col),
            F.col(ts_col).alias("_ts"),
            # session-TZ-proof epoch µs computed JVM-side — the state
            # fn must never derive epochs from pandas timestamps (see
            # _funnel_fn)
            F.unix_micros(F.col(ts_col)).alias("_ts_us"),
            F.col(type_col).alias("_type"),
        )
        .withWatermark("_ts", watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            _funnel_fn(steps, user_col, ttl_us=ttl_us),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if ttl_us is None
                else GroupStateTimeout.EventTimeTimeout
            ),
        )
    )
