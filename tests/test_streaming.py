"""Streaming ingest tests (SURVEY.md §5 item 3): micro-batch runs over
a file source with availableNow, checked against the batch pipeline on
the identical raw events — batch/stream parity is the oracle.
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from database_activity_monitoring_dam_system_spark.operators import rules
from database_activity_monitoring_dam_system_spark.schemas import AGENT_EVENT
from database_activity_monitoring_dam_system_spark.sources.agent import (
    normalize_agent_events,
)
from database_activity_monitoring_dam_system_spark.streaming import ingest

T0 = dt.datetime(2026, 8, 1, 10, 0, 0)


def _fixture_events() -> list[dict]:
    rows = []
    sqls = [
        "SELECT * FROM customers WHERE id=%d",
        "insert into orders values (%d)",
        "UPDATE accounts SET bal=bal-1 WHERE id=%d",
        "delete from payments where id=%d",
        "select password from users where uid=%d",
        "select * from t where a=1 union select * from b -- %d",
        "SHOW TABLES -- %d",                       # skipped (system)
        "select x from information_schema.tables -- %d",  # skipped
    ]
    for i in range(160):
        sql = sqls[i % len(sqls)] % i
        if i % 13 == 0:  # hex-encoded argument
            sql = "0x" + sql.encode().hex()
        rows.append(
            {
                "event_time": (T0 + dt.timedelta(seconds=37 * i)).isoformat(),
                "user_host": f"user{i % 5}[user{i % 5}] @ host{i % 3} []",
                "argument": sql,
            }
        )
    # burst segment: one user firing every 5 s (rate-alert coverage)
    burst0 = T0 + dt.timedelta(hours=2)
    for j in range(10):
        rows.append(
            {
                "event_time": (burst0 + dt.timedelta(seconds=5 * j)).isoformat(),
                "user_host": "user0[user0] @ host0 []",
                "argument": f"SELECT * FROM products WHERE id={j}",
            }
        )
    return rows


@pytest.fixture(scope="module")
def stream_dirs(spark):
    base = tempfile.mkdtemp(prefix="dam_stream_")
    src = f"{base}/src"
    import os

    os.makedirs(src)
    events = _fixture_events()
    # two chunks → two micro-batches under maxFilesPerTrigger=1
    for chunk_id, chunk in enumerate([events[:80], events[80:]]):
        with open(f"{src}/chunk{chunk_id}.json", "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
        # pin strictly increasing mtimes: FileStreamSource orders
        # pending files by modification time and same-millisecond
        # writes make the batch split nondeterministic
        os.utime(f"{src}/chunk{chunk_id}.json", (1000 + chunk_id, 1000 + chunk_id))
    yield {
        "src": src,
        "activity": f"{base}/activity",
        "alerts": f"{base}/alerts",
        "ckpt": f"{base}/ckpt",
        "events": events,
    }
    shutil.rmtree(base, ignore_errors=True)


def _raw_batch_df(spark, events):
    rows = [
        (dt.datetime.fromisoformat(e["event_time"]), e["user_host"], e["argument"])
        for e in events
    ]
    return spark.createDataFrame(rows, AGENT_EVENT)


def test_ingest_stream_matches_batch(spark, stream_dirs):
    notifications: list = []
    q = ingest.start_ingest(
        spark,
        stream_dirs["src"],
        activity_sink=stream_dirs["activity"],
        alerts_sink=stream_dirs["alerts"],
        checkpoint_dir=stream_dirs["ckpt"],
        notifier=notifications.extend,
        available_now=True,
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(stream_dirs["activity"])
    raw = _raw_batch_df(spark, stream_dirs["events"])
    batch = rules.apply_rule_battery(
        normalize_agent_events(raw)
        .withColumn("activity_id", F.lit(None).cast("long"))
        .withColumn("user_id", F.lit(None).cast("long"))
        .withColumn("ip_address", F.lit(None).cast("string"))
        .withColumn("rows_affected", F.lit(None).cast("int")),
        with_rate_rule=False,
    )

    key = [
        "access_timestamp", "username", "operation_type", "table_name",
        "operation_status", "operation_details", "query_hash",
        "is_suspicious", "suspicious_reasons", "severity_level",
    ]
    s_rows = sorted(tuple(r) for r in streamed.select(*key).collect())
    b_rows = sorted(tuple(r) for r in batch.select(*key).collect())
    assert s_rows == b_rows
    # system queries (SHOW / information_schema) were dropped: 160 base
    # events lose 2 of every 8, +10 burst rows kept
    assert len(s_rows) == 130

    # alerts sink = High/Critical subset, and notifier saw the same rows
    alerts = spark.read.parquet(stream_dirs["alerts"])
    expected_alerts = rules.derive_alerts(batch)
    assert alerts.count() == expected_alerts.count() == len(notifications)
    assert set(alerts.select("alert_type").toPandas()["alert_type"]) <= {
        "SQL Injection", "Data Leakage", "Security Violation", "DoS Attempt",
    }


def test_ingest_checkpoint_no_reprocessing(spark, stream_dirs):
    """Re-running with the same checkpoint must be a no-op (offsets
    subsume the agent's high-water mark, ST1)."""
    before = spark.read.parquet(stream_dirs["activity"]).count()
    q = ingest.start_ingest(
        spark,
        stream_dirs["src"],
        activity_sink=stream_dirs["activity"],
        alerts_sink=stream_dirs["alerts"],
        checkpoint_dir=stream_dirs["ckpt"],
        available_now=True,
    )
    q.awaitTermination(60)
    after = spark.read.parquet(stream_dirs["activity"]).count()
    assert before == after


def test_timeline_stream_matches_batch(spark, stream_dirs):
    raw_stream = ingest.read_agent_stream(spark, stream_dirs["src"])
    normalized = normalize_agent_events(raw_stream)
    agg = ingest.timeline_stream(normalized, watermark_delay="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("timeline_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r.bucket_start, r.total, r.failed)
        for r in spark.sql("SELECT * FROM timeline_test").collect()
    }
    raw = _raw_batch_df(spark, stream_dirs["events"])
    expected = {
        (r.bucket_start, r.total, r.failed)
        for r in normalize_agent_events(raw)
        .groupBy(F.window("access_timestamp", "1 hour").alias("win"))
        .agg(
            F.count("*").alias("total"),
            F.sum(
                F.when(F.col("operation_status") == "Failed", 1).otherwise(0)
            ).alias("failed"),
        )
        .select(F.col("win.start").alias("bucket_start"), "total", "failed")
        .collect()
    }
    # append mode emits only windows the watermark has closed; the last
    # open window may be withheld → streamed ⊆ batch, missing ≤1 window
    assert got <= expected
    assert len(expected) - len(got) <= 1


def test_rate_alert_stream_runs(spark, stream_dirs):
    raw_stream = ingest.read_agent_stream(spark, stream_dirs["src"])
    normalized = normalize_agent_events(raw_stream)
    alerts = ingest.rate_alert_stream(
        normalized, threshold=1, slide="30 seconds", watermark_delay="0 seconds"
    )
    q = (
        alerts.writeStream.format("memory")
        .queryName("rate_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM rate_test").collect()
    # events are 37 s apart per fixture; sliding 60 s windows catch
    # adjacent pairs → with threshold 1 some windows must breach
    assert all(r.cnt >= 2 for r in rows)
    assert len(rows) > 0


def test_malformed_agent_events_are_dropped(spark):
    """Corrupt JSON lines surface as all-NULL rows from the file
    source; normalization classifies a NULL argument as a system-skip
    (NULL predicate → filtered), so malformed events never reach the
    battery. Documented drop semantics, not a crash."""
    import json as _json
    import tempfile as _tf

    base = _tf.mkdtemp(prefix="dam_malformed_")
    with open(f"{base}/x.json", "w") as fh:
        fh.write("this is not json\n")
        fh.write(_json.dumps({"event_time": "2026-08-01T10:00:00",
                              "user_host": "u[u] @ h []",
                              "argument": "SELECT 1 FROM products"}) + "\n")
        fh.write('{"event_time": "2026-08-01T10:00:05"}\n')  # missing fields
    try:
        raw = spark.read.schema(AGENT_EVENT).json(base)
        out = normalize_agent_events(raw)
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0]["operation_type"] == "SELECT"
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_rate_rule_parity(spark):
    """R1 family 6 on streamed rows: with user identity resolved, a
    >100-queries/min user's streamed rows carry 'Rate limit exceeded'
    and Medium severity — byte-identical to apply_rule_battery on the
    same events (the reference computes this at ingest per event,
    app.py:396-403; agent rows there have user_id NULL, which the
    default resolve_user_ids=False reproduces)."""
    import os

    base = tempfile.mkdtemp(prefix="dam_rate_")
    src = f"{base}/src"
    os.makedirs(src)
    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    events = [
        {
            "event_time": (t0 + dt.timedelta(milliseconds=500 * i)).isoformat(),
            "user_host": "heavy[heavy] @ h []",
            "argument": f"SELECT * FROM products WHERE id={i}",
        }
        for i in range(110)
    ] + [
        {
            "event_time": (t0 + dt.timedelta(seconds=i)).isoformat(),
            "user_host": "calm[calm] @ h []",
            "argument": f"SELECT * FROM products WHERE id={i}",
        }
        for i in range(5)
    ]
    with open(f"{src}/a.json", "w") as fh:
        for r in events:
            fh.write(json.dumps(r) + "\n")
    users_df = spark.createDataFrame(
        [(7, "heavy", "User"), (8, "calm", "User")],
        "user_id long, username string, role string",
    )
    try:
        q = ingest.start_ingest(
            spark,
            src,
            activity_sink=f"{base}/act",
            alerts_sink=f"{base}/al",
            checkpoint_dir=f"{base}/ck",
            users=users_df,
            resolve_user_ids=True,
            available_now=True,
        )
        q.awaitTermination(120)
        streamed = spark.read.parquet(f"{base}/act")
        breached = streamed.filter(
            F.col("suspicious_reasons").contains("Rate limit exceeded")
        ).collect()
        # 110 events 0.5 s apart: two per floored second, so the count
        # at second s is 2(s+1) → the >100 threshold trips for the 10
        # events in seconds 50-54
        assert len(breached) == 10
        assert all(r.severity_level == "Medium" for r in breached)
        assert all(r.username == "heavy" for r in breached)

        raw = _raw_batch_df(spark, events)
        batch = rules.apply_rule_battery(
            normalize_agent_events(raw)
            .join(
                F.broadcast(users_df.select("username", "user_id")),
                "username",
                "left",
            )
            .withColumn("ip_address", F.lit(None).cast("string"))
            .withColumn("rows_affected", F.lit(None).cast("int")),
            users=users_df,
            with_rate_rule=True,
        ).drop("queries_last_min")
        key = [
            "access_timestamp", "username", "operation_details",
            "is_suspicious", "suspicious_reasons", "severity_level",
        ]
        s_rows = sorted(tuple(r) for r in streamed.select(*key).collect())
        b_rows = sorted(tuple(r) for r in batch.select(*key).collect())
        assert s_rows == b_rows
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_exact_rate_across_micro_batches(spark):
    """exact_rate=True: a >100-queries/min burst SPLIT across two
    micro-batches still trips the rate rule on the tail rows, because
    each batch's trailing window is seeded with the per-user epoch
    state carried from prior batches. The per-batch window alone sees
    at most 50 events in batch 2 — structurally unable to breach — so
    the 10 breached rows prove the cross-batch carry. The reference's
    continuous in-memory window (app.py:396-403) has this behavior
    natively; full-batch apply_rule_battery is the oracle."""
    import os

    base = tempfile.mkdtemp(prefix="dam_xrate_")
    src = f"{base}/src"
    os.makedirs(src)
    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    events = [
        {
            "event_time": (t0 + dt.timedelta(milliseconds=500 * i)).isoformat(),
            "user_host": "heavy[heavy] @ h []",
            "argument": f"SELECT * FROM products WHERE id={i}",
        }
        for i in range(110)
    ]
    # 60 events then 50: batch 2 alone can never exceed the 100/min
    # threshold, so any breach must come from carried state
    for chunk_id, chunk in enumerate([events[:60], events[60:]]):
        with open(f"{src}/chunk{chunk_id}.json", "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
        # FileStreamSource orders pending files by modification time;
        # same-millisecond writes make batch order (and therefore the
        # cross-batch carry this test proves) nondeterministic — pin
        # strictly increasing mtimes so chunk0 is batch 0
        os.utime(f"{src}/chunk{chunk_id}.json", (1000 + chunk_id, 1000 + chunk_id))
    users_df = spark.createDataFrame(
        [(7, "heavy", "User")], "user_id long, username string, role string"
    )
    try:
        q = ingest.start_ingest(
            spark,
            src,
            activity_sink=f"{base}/act",
            alerts_sink=f"{base}/al",
            checkpoint_dir=f"{base}/ck",
            users=users_df,
            resolve_user_ids=True,
            exact_rate=True,
            max_files_per_trigger=1,
            available_now=True,
        )
        q.awaitTermination(120)
        streamed = spark.read.parquet(f"{base}/act")
        breached = streamed.filter(
            F.col("suspicious_reasons").contains("Rate limit exceeded")
        ).collect()
        # same closed form as test_stream_rate_rule_parity: the count
        # at event i is (i - i%2) + 2, >100 for i in 100..109
        assert len(breached) == 10
        assert all(r.severity_level == "Medium" for r in breached)

        raw = _raw_batch_df(spark, events)
        batch = rules.apply_rule_battery(
            normalize_agent_events(raw)
            .join(
                F.broadcast(users_df.select("username", "user_id")),
                "username",
                "left",
            )
            .withColumn("ip_address", F.lit(None).cast("string"))
            .withColumn("rows_affected", F.lit(None).cast("int")),
            users=users_df,
            with_rate_rule=True,
        ).drop("queries_last_min")
        key = [
            "access_timestamp", "username", "operation_details",
            "is_suspicious", "suspicious_reasons", "severity_level",
        ]
        s_rows = sorted(tuple(r) for r in streamed.select(*key).collect())
        b_rows = sorted(tuple(r) for r in batch.select(*key).collect())
        # reason strings embed the exact count ("Rate limit exceeded:
        # N queries/min") — equality pins the seeded counts themselves
        assert s_rows == b_rows
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_exact_rate_requires_resolved_ids(spark):
    with pytest.raises(ValueError, match="resolve_user_ids"):
        ingest.start_ingest(
            spark,
            "/nonexistent",
            activity_sink="/tmp/x",
            alerts_sink="/tmp/y",
            checkpoint_dir="/tmp/z",
            exact_rate=True,
        )


def test_firewall_blocks_journal(spark):
    """S7: every rule hit is journaled to firewall_blocks; only
    action='block' rows are kept out of the activity sink
    (app.py:1177-1179, 843-848)."""
    import os

    base = tempfile.mkdtemp(prefix="dam_fw_")
    src = f"{base}/src"
    os.makedirs(src)
    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    events = [
        ("select 1 from t union select 2", True),     # rule 1, block
        ("delete from payments where id=1", False),   # rule 3, alert (kept)
        ("SELECT ok FROM products", None),            # no hit
    ]
    with open(f"{src}/a.json", "w") as fh:
        for i, (sql, _) in enumerate(events):
            fh.write(json.dumps({
                "event_time": (t0 + dt.timedelta(seconds=i)).isoformat(),
                "user_host": "u[u] @ h []",
                "argument": sql,
            }) + "\n")
    from database_activity_monitoring_dam_system_spark.plans.dam import (
        FIREWALL_RULES_FIXTURE,
        _RULES_SCHEMA,
    )

    rules_df = spark.createDataFrame(FIREWALL_RULES_FIXTURE, _RULES_SCHEMA)
    try:
        q = ingest.start_ingest(
            spark,
            src,
            activity_sink=f"{base}/act",
            alerts_sink=f"{base}/al",
            checkpoint_dir=f"{base}/ck",
            firewall_rules=rules_df,
            blocks_sink=f"{base}/blocks",
            available_now=True,
        )
        q.awaitTermination(120)
        blocks = spark.read.parquet(f"{base}/blocks")
        # both hits journaled (block AND alert), non-hit absent
        assert blocks.count() == 2
        assert {r.rule_id for r in blocks.collect()} == {1, 3}
        act = spark.read.parquet(f"{base}/act")
        kept = {r.operation_details for r in act.collect()}
        assert "select 1 from t union select 2" not in kept  # blocked
        assert "delete from payments where id=1" in kept     # alert passes
        assert len(kept) == 2
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_interval_join_stream_static_parity(spark):
    """The bin-bucketed range join is stateless (explode + equi-join +
    filter), so it runs unchanged as a stream-static join: streamed
    events against static maintenance windows must reproduce the batch
    result exactly."""
    import os
    import shutil
    import tempfile

    from database_activity_monitoring_dam_system_spark.operators import (
        rangejoin,
    )

    base = tempfile.mkdtemp(prefix="dam_rj_")
    try:
        rows = [(i, T0 + dt.timedelta(minutes=2 * i)) for i in range(100)]
        events = spark.createDataFrame(rows, "event_id long, ts timestamp")
        os.makedirs(f"{base}/ev")
        events.coalesce(2).write.mode("overwrite").parquet(f"{base}/ev")
        wins = spark.createDataFrame(
            [
                (
                    w,
                    T0 + dt.timedelta(minutes=30 * w),
                    T0 + dt.timedelta(minutes=30 * w + 45),
                )
                for w in range(5)
            ],
            "window_id int, start_ts timestamp, end_ts timestamp",
        )
        batch = {
            (r.event_id, r.window_id)
            for r in rangejoin.interval_join(
                events, wins, ts_col="ts", bin_seconds=1800
            ).collect()
        }
        stream = (
            spark.readStream.schema("event_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/ev")
        )
        joined = rangejoin.interval_join(
            stream, wins, ts_col="ts", bin_seconds=1800
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("rj_out")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{base}/ckpt")
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.event_id, r.window_id)
            for r in spark.table("rj_out").collect()
        }
        assert batch and got == batch
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_near_dup_filter_stream_matches_batch(spark):
    """Streaming near-dup rejection ≡ batch minhash_near_duplicates:
    a stream doc is flagged iff the batch self-join over (reference ∪
    stream) pairs it with a reference doc at the same hash family,
    banding, and Jaccard threshold — including the matched ref id
    (lowest) and the (max, rounded) jaccard value."""
    import json
    import os

    from database_activity_monitoring_dam_system_spark.operators import dedup
    from database_activity_monitoring_dam_system_spark.streaming import (
        corpus_filter,
    )

    ref_rows = [
        (1001, "the quick brown fox jumps over the lazy dog again and again"),
        (1002, "spark filters join group sort merge window stream shuffle"),
        (1003, "completely unrelated reference text about database monitoring"),
    ]
    stream_rows = [
        # exact dup of ref 1001 → jaccard 1.0
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        # one-word change vs ref 1002 → high but < 1 jaccard
        (2, "spark filters join group sort merge window stream shuffles"),
        # unrelated → keep
        (3, "totally novel document with no overlap whatsoever here now"),
        # near-dup of ANOTHER STREAM doc only → must stay keep
        (4, "totally novel document with no overlap whatsoever here now"),
    ]
    kw = dict(num_hashes=32, bands=8, shingle=3, threshold=0.5)

    base = tempfile.mkdtemp(prefix="dam_neardup_")
    src = f"{base}/src"
    os.makedirs(src)
    for chunk_id, chunk in enumerate([stream_rows[:2], stream_rows[2:]]):
        with open(f"{src}/c{chunk_id}.json", "w") as fh:
            for doc_id, text in chunk:
                fh.write(json.dumps(
                    {"doc_id": doc_id, "text": text, "lang": "en",
                     "source": "s"}) + "\n")
    try:
        ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
        q = corpus_filter.start_near_dup_filter(
            spark, src,
            ref_docs=ref,
            sink_dir=f"{base}/out",
            checkpoint_dir=f"{base}/ck",
            available_now=True,
            max_files_per_trigger=1,
            **kw,
        )
        q.awaitTermination(120)
        streamed = {
            r.doc_id: (r.verdict, r.near_dup_of, r.near_dup_jaccard)
            for r in spark.read.parquet(f"{base}/out").collect()
        }
        assert set(streamed) == {1, 2, 3, 4}

        # batch ground truth: self-join over reference ∪ stream, keep
        # only cross pairs (one stream member, one reference member)
        union = ref.union(
            spark.createDataFrame(stream_rows, "doc_id long, text string")
        )
        pairs = dedup.minhash_near_duplicates(union, **kw).collect()
        expect = {}
        for p in pairs:
            sid, rid = (
                (p.doc_a, p.doc_b) if p.doc_b >= 1000 else (p.doc_b, p.doc_a)
            )
            if sid >= 1000 or rid < 1000:
                continue  # ref-ref or stream-stream pair
            cur = expect.get(sid)
            if cur is None:
                expect[sid] = (rid, p.jaccard)
            else:
                expect[sid] = (min(cur[0], rid), max(cur[1], p.jaccard))
        assert expect, "fixture produced no cross near-dup pairs"
        for doc_id, _text in stream_rows:
            verdict, of, jac = streamed[doc_id]
            if doc_id in expect:
                assert verdict == "near_dup", (doc_id, streamed[doc_id])
                assert (of, jac) == expect[doc_id], (doc_id, streamed[doc_id])
            else:
                assert verdict == "keep" and of is None, (
                    doc_id, streamed[doc_id],
                )
        # doc 4 duplicates doc 3 (stream-internal) but no ref doc:
        # the gate must NOT flag it
        assert streamed[4][0] == "keep"
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_corpus_filter_stream_matches_batch(spark):
    """The streaming corpus filter (quality + repetition + fingerprint,
    all stateless projections) writes exactly what the same scoring
    produces in batch, partitioned by verdict for downstream pruning."""
    import json
    import os

    from database_activity_monitoring_dam_system_spark.streaming import (
        corpus_filter,
    )

    base = tempfile.mkdtemp(prefix="dam_corpusf_")
    src = f"{base}/src"
    os.makedirs(src)
    rows = [
        {"doc_id": 1, "lang": "en", "source": "s0",
         "text": "spark filter join group sort merge window stream the and is of"},
        {"doc_id": 2, "lang": "en", "source": "s1",
         "text": "a b a b a b a b a b a b"},
        {"doc_id": 3, "lang": "en", "source": "s2", "text": "xy"},
        {"doc_id": 4, "lang": "de", "source": "s0",
         "text": "the fast key order sort table scan merge part window is "
                 "and of to in that it was for on with"},
    ]
    for chunk_id, chunk in enumerate([rows[:2], rows[2:]]):
        with open(f"{src}/c{chunk_id}.json", "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
    try:
        q = corpus_filter.start_corpus_filter(
            spark, src,
            sink_dir=f"{base}/out",
            checkpoint_dir=f"{base}/ck",
            available_now=True,
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        streamed = spark.read.parquet(f"{base}/out")
        batch = corpus_filter.score_documents(
            spark.createDataFrame(
                [(r["doc_id"], r["text"], r["lang"], r["source"]) for r in rows],
                "doc_id long, text string, lang string, source string",
            )
        )
        cols = sorted(batch.columns)
        assert sorted(streamed.columns) == cols
        s_rows = sorted(tuple(r) for r in streamed.select(*cols).collect())
        b_rows = sorted(tuple(r) for r in batch.select(*cols).collect())
        assert s_rows == b_rows
        # verdict partition pruning works on the sink
        kept = spark.read.parquet(f"{base}/out").filter(
            F.col("verdict") == "keep"
        )
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # genuinely stateless: the fused projection must plan without
        # ANY state operator (the earlier 3-way doc_id self-join was a
        # StreamingSymmetricHashJoin retaining every row forever)
        progresses = [json.loads(p.json) for p in q.recentProgress]
        assert progresses, "no progress recorded"
        assert all(not p.get("stateOperators") for p in progresses), (
            [p.get("stateOperators") for p in progresses]
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_chunking_stream_matches_batch(spark):
    """chunk_documents is a stateless projection+generator, so it runs
    unchanged on a streaming frame: chunks written by the stream must
    equal the batch chunking of the same documents, with no state
    operator in the streaming plan (explode keeps no state)."""
    import os

    from database_activity_monitoring_dam_system_spark.operators import packing

    base = tempfile.mkdtemp(prefix="dam_chunkstream_")
    src = f"{base}/src"
    os.makedirs(src)
    rows = [
        {"doc_id": 1, "text": " ".join(f"w{i}" for i in range(150))},
        {"doc_id": 2, "text": "tiny doc"},
        {"doc_id": 3, "text": " ".join(f"x{i}" for i in range(64))},
    ]
    for chunk_id, chunk in enumerate([rows[:2], rows[2:]]):
        with open(f"{src}/c{chunk_id}.json", "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
    try:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = (
            packing.chunk_documents(stream)
            .writeStream.format("parquet")
            .option("path", f"{base}/out")
            .option("checkpointLocation", f"{base}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = spark.read.parquet(f"{base}/out")
        batch = packing.chunk_documents(
            spark.createDataFrame(
                [(r["doc_id"], r["text"]) for r in rows],
                "doc_id long, text string",
            )
        )
        cols = sorted(batch.columns)
        assert sorted(streamed.columns) == cols
        s_rows = sorted(tuple(r) for r in streamed.select(*cols).collect())
        b_rows = sorted(tuple(r) for r in batch.select(*cols).collect())
        assert s_rows == b_rows and len(s_rows) > 3
        progresses = [json.loads(p.json) for p in q.recentProgress]
        assert progresses, "no progress recorded"
        assert all(not p.get("stateOperators") for p in progresses)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_pq_ann_stream_matches_batch(spark, tmp_path):
    """Streaming PQ ADC serving ≡ the batch scorer: queries arriving
    over two micro-batches against a persisted encoded corpus return
    exactly the batch pq_score_queries results, and a replayed batch
    id cannot duplicate rows (dynamic partition overwrite)."""
    from database_activity_monitoring_dam_system_spark.operators import similarity
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        ann_serving,
    )

    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    codes_path = str(tmp_path / "codes")
    similarity.pq_encode(emb, books, dim=64).withColumnRenamed(
        "vec_id", "neighbor_id"
    ).write.parquet(codes_path)
    codes = spark.read.parquet(codes_path)

    # two query files → two micro-batches (maxFilesPerTrigger=1)
    qdir = tmp_path / "queries"
    qdir.mkdir()
    q_all = emb.filter(F.col("vec_id").isin([0, 1, 2, 3])).toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq_

    for i, ids in enumerate([[0, 1], [2, 3]]):
        part = q_all[q_all.vec_id.isin(ids)]
        pq_.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            str(qdir / f"q{i}.parquet"),
        )

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qdir))
    )
    q = ann_serving.start_pq_ann_stream(
        stream,
        codes,
        books,
        out_path=str(tmp_path / "results"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=5,
        available_now=True,
    )
    q.awaitTermination(120)

    got = (
        spark.read.parquet(str(tmp_path / "results"))
        .select("query_id", "neighbor_id", "rank", "adc_dist")
        .collect()
    )
    batch_queries = similarity.pq_prepare_queries(
        emb.filter(F.col("vec_id").isin([0, 1, 2, 3])), books, dim=64
    )
    want = similarity.pq_score_queries(
        codes, batch_queries, books, k=5, exclude_self=False
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == 20  # 4 queries × k


def test_corpus_filter_gopher_stage(spark):
    """gopher_stopwords= inserts the Gopher battery between the
    quality heuristics and the repetition caps: quality failures keep
    precedence, a quality-passing doc failing a Gopher rule gets that
    rule's verdict, and without the knob behavior is unchanged."""
    from database_activity_monitoring_dam_system_spark.operators import textops
    from database_activity_monitoring_dam_system_spark.streaming import (
        corpus_filter,
    )

    stops = ("the", "a", "of", "and", "to")
    # 60 words, stopword-rich, every bigram unique (no repetition cap)
    good = " ".join(
        tok
        for i in range(30)
        for tok in (("the", "and", "of", "to")[i % 4], f"word{i:03d}")
    )
    # 60 words of len <= 2 (mean word len < 3), every bigram unique
    shortwords = " ".join(
        tok
        for i in range(30)
        for tok in (("to", "of", "a")[i % 3], f"a{i}")
    )
    docs = spark.createDataFrame(
        [(1, good, "en", "s0"), (2, shortwords, "en", "s0"),
         (3, "xy", "en", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    out = {
        r.doc_id: r.verdict
        for r in corpus_filter.score_documents(
            docs, gopher_stopwords=stops
        ).collect()
    }
    assert out[1] == "keep"
    assert out[2] == "bad_mean_word_len"  # quality passed, gopher bit
    assert out[3] == "too_short"  # quality precedence unchanged
    plain = {
        r.doc_id: r.verdict
        for r in corpus_filter.score_documents(docs).collect()
    }
    assert plain[2] == "keep"  # knob off -> battery absent
    # the stage IS the shared rule definition
    g = docs.select(
        "doc_id",
        textops.gopher_verdict_col("text", stops).alias("g"),
    ).collect()
    assert {r.doc_id: r.g for r in g}[2] == "bad_mean_word_len"


def test_rollup_stream_matches_batch_and_replays_idempotently(spark, tmp_path):
    """Streamed minute partials (per-batch fragments, _batch_id
    partitions) merged by read_rollup ≡ batch time_partials directly
    at day grain — associativity makes fragment-merge exact; a second
    availableNow run with the same checkpoint adds nothing."""
    from database_activity_monitoring_dam_system_spark.operators import rollup
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        rollup_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "src")
    # two files → at least two micro-batches with maxFilesPerTrigger=1
    events.filter(F.col("event_id") % 2 == 0).write.parquet(src + "/a.parquet")
    events.filter(F.col("event_id") % 2 == 1).write.parquet(src + "/b.parquet")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    q = rollup_stream.start_rollup_stream(
        stream, out_path=out, checkpoint_dir=ckpt,
        group_cols=["event_type"], available_now=True,
    )
    assert q.awaitTermination(60)
    q.stop()
    frags = spark.read.parquet(out)
    assert frags.select("_batch_id").distinct().count() >= 2
    streamed_day = rollup_stream.read_rollup(
        spark, out, to_grain="day", group_cols=["event_type"]
    )
    batch_day = rollup.time_partials(
        events, grain="day", group_cols=["event_type"]
    )
    assert sorted(map(tuple, streamed_day.collect())) == sorted(
        map(tuple, batch_day.collect())
    )
    # replay 1: same checkpoint, no new files → nothing changes
    n_before = frags.count()
    q2 = rollup_stream.start_rollup_stream(
        stream, out_path=out, checkpoint_dir=ckpt,
        group_cols=["event_type"], available_now=True,
    )
    assert q2.awaitTermination(60)
    q2.stop()
    assert spark.read.parquet(out).count() == n_before
    # replay 2: GENUINE at-least-once redelivery — delete the last
    # commit marker so the final batch re-executes; the _batch_id
    # dynamic-partition overwrite must keep the table identical
    # (this is the path the idempotence claim actually rests on)
    import os

    commits = sorted(os.listdir(ckpt + "/commits"))
    last = [c for c in commits if not c.startswith(".")][-1]
    os.remove(ckpt + "/commits/" + last)
    # the metadata log keeps a .crc sibling; an orphaned crc makes
    # the commit log think another query owns the checkpoint
    crc = ckpt + "/commits/." + last + ".crc"
    if os.path.exists(crc):
        os.remove(crc)
    q3 = rollup_stream.start_rollup_stream(
        stream, out_path=out, checkpoint_dir=ckpt,
        group_cols=["event_type"], available_now=True,
    )
    assert q3.awaitTermination(60)
    q3.stop()
    assert spark.read.parquet(out).count() == n_before
    streamed_again = rollup_stream.read_rollup(
        spark, out, to_grain="day", group_cols=["event_type"]
    )
    assert sorted(map(tuple, streamed_again.collect())) == sorted(
        map(tuple, batch_day.collect())
    )
    # grain guard: a table written at day grain refuses an hour view
    # (re-truncation would be the identity — silently mislabeled data)
    import pytest as _pytest

    out2 = str(tmp_path / "partials_day")
    ckpt2 = str(tmp_path / "ckpt_day")
    q4 = rollup_stream.start_rollup_stream(
        stream, out_path=out2, checkpoint_dir=ckpt2,
        grain="day", group_cols=["event_type"], available_now=True,
    )
    assert q4.awaitTermination(60)
    q4.stop()
    with _pytest.raises(ValueError, match="finer"):
        rollup_stream.read_rollup(
            spark, out2, to_grain="hour", group_cols=["event_type"]
        )


def test_rollup_fragment_compaction_preserves_views(spark, tmp_path):
    """compact_rollup_fragments folds per-batch fragments into one
    _batch_id=-1 fragment; read_rollup answers identically before and
    after, and a resumed stream appends new fragments alongside the
    compacted one (which the next compaction folds in turn)."""
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        rollup_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "src")
    half = events.filter(F.col("event_id") % 2 == 0)
    half.repartition(3).write.parquet(src + "/a.parquet")
    out, ckpt = str(tmp_path / "p"), str(tmp_path / "c")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = rollup_stream.start_rollup_stream(
        stream, out_path=out, checkpoint_dir=ckpt,
        group_cols=["event_type"], available_now=True,
    )
    assert q.awaitTermination(60)
    q.stop()
    before = sorted(
        map(tuple, rollup_stream.read_rollup(
            spark, out, to_grain="day", group_cols=["event_type"]
        ).collect())
    )
    n_before, n_after = rollup_stream.compact_rollup_fragments(
        spark, out, checkpoint_dir=ckpt
    )
    assert n_before > 1 and n_after == 1
    frags = spark.read.parquet(out)
    assert {r._batch_id for r in frags.select("_batch_id").distinct().collect()} == {-1}
    after = sorted(
        map(tuple, rollup_stream.read_rollup(
            spark, out, to_grain="day", group_cols=["event_type"]
        ).collect())
    )
    assert after == before
    # resume: second half arrives as a new file → new fragment lands
    # beside the compacted one; the merged day view equals batch
    events.filter(F.col("event_id") % 2 == 1).write.parquet(
        src + "/b.parquet"
    )
    q2 = rollup_stream.start_rollup_stream(
        stream, out_path=out, checkpoint_dir=ckpt,
        group_cols=["event_type"], available_now=True,
    )
    assert q2.awaitTermination(60)
    q2.stop()
    from database_activity_monitoring_dam_system_spark.operators import rollup

    streamed = sorted(
        map(tuple, rollup_stream.read_rollup(
            spark, out, to_grain="day", group_cols=["event_type"]
        ).collect())
    )
    direct = sorted(
        map(tuple, rollup.time_partials(
            events, grain="day", group_cols=["event_type"]
        ).collect())
    )
    assert streamed == direct


def test_rollup_compaction_crash_recovery_and_uncommitted(
    spark, tmp_path
):
    """The crash windows of the retire→promote swap and the
    landed-but-uncommitted batch hazard:

    - a stale ``_compact_old`` left by a crash after promotion is
      cleared by the next run's recovery sweep (it used to make
      the rename throw 'Directory not empty');
    - a crash BETWEEN retire and promote (live dir missing, old
      present) is restored by the sweep, not silently shadowed by
      a recreated empty table;
    - a fragment whose batch id has no commit marker is carried
      through unchanged, so the stream's replay overwrites it
      instead of double-counting against a folded copy."""
    import shutil

    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        rollup_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "src")
    events.repartition(4).write.parquet(src + "/a.parquet")
    out, ckpt = str(tmp_path / "p"), str(tmp_path / "c")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = rollup_stream.start_rollup_stream(
        stream, out_path=out, checkpoint_dir=ckpt,
        group_cols=["event_type"], available_now=True,
    )
    assert q.awaitTermination(60)
    q.stop()
    expected = sorted(
        map(tuple, rollup_stream.read_rollup(
            spark, out, to_grain="day", group_cols=["event_type"]
        ).collect())
    )
    frag_dirs = sorted(
        p.name for p in (tmp_path / "p").iterdir()
        if p.name.startswith("_batch_id=")
    )
    assert len(frag_dirs) > 2
    last_batch = max(
        int(n.split("=", 1)[1]) for n in frag_dirs
    )
    # forge the uncommitted state: drop the last commit marker (and
    # its .crc sibling) as if the stream crashed pre-commit
    (tmp_path / "c" / "commits" / str(last_batch)).unlink()
    crc = tmp_path / "c" / "commits" / f".{last_batch}.crc"
    if crc.exists():
        crc.unlink()
    # forge a crash-after-promote leftover from a previous run
    (tmp_path / "p_compact_old").mkdir()
    (tmp_path / "p_compact_old" / "junk").write_text("x")
    n_before, n_after = rollup_stream.compact_rollup_fragments(
        spark, out, checkpoint_dir=ckpt
    )
    assert not (tmp_path / "p_compact_old").exists()
    assert n_before == len(frag_dirs) and n_after == 2
    ids = {
        r._batch_id
        for r in spark.read.parquet(out)
        .select("_batch_id").distinct().collect()
    }
    assert ids == {-1, last_batch}
    # restart: the checkpoint redelivers the uncommitted batch; the
    # dynamic overwrite must land ON the carried fragment, keeping
    # the day view identical (no double count)
    q2 = rollup_stream.start_rollup_stream(
        stream, out_path=out, checkpoint_dir=ckpt,
        group_cols=["event_type"], available_now=True,
    )
    assert q2.awaitTermination(60)
    q2.stop()
    after_replay = sorted(
        map(tuple, rollup_stream.read_rollup(
            spark, out, to_grain="day", group_cols=["event_type"]
        ).collect())
    )
    assert after_replay == expected
    # crash BETWEEN retire and promote: live dir gone, old present →
    # sweep restores it and the views still answer
    shutil.move(str(tmp_path / "p"), str(tmp_path / "p_compact_old"))
    n_before2, n_after2 = rollup_stream.compact_rollup_fragments(
        spark, out, checkpoint_dir=ckpt
    )
    assert n_after2 == 1
    restored = sorted(
        map(tuple, rollup_stream.read_rollup(
            spark, out, to_grain="day", group_cols=["event_type"]
        ).collect())
    )
    assert restored == expected


def test_rollup_distinct_bucket_bits_guard(spark):
    """Finalizing register partials at a mismatched bucket_bits must
    fail loudly (negative zero-register counts and garbage estimates
    otherwise) — the geometry is carried on the frame itself."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        rollup,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    minute = rollup.distinct_partials(
        events, distinct_col="user_id", grain="minute",
        bucket_bits=12,
    )
    with _pytest.raises(Exception, match="bucket_bits=12"):
        rollup.rollup_distinct(
            minute, to_grain="day", bucket_bits=8
        ).collect()
    # matched bits work and agree with the direct day-grain registers
    ok = rollup.rollup_distinct(
        minute, to_grain="day", bucket_bits=12
    )
    direct = rollup.distinct_partials(
        events, distinct_col="user_id", grain="day", bucket_bits=12
    )
    from database_activity_monitoring_dam_system_spark.operators import (
        sketches,
    )

    direct_fin = sketches.hll_finalize(
        direct.drop("_bucket_bits"), ["bucket_ts"], bucket_bits=12
    )
    assert sorted(map(tuple, ok.collect())) == sorted(
        map(tuple, direct_fin.collect())
    )


def test_merge_upsert_partitioned_touches_only_named_partitions(
    spark, tmp_path
):
    """The batch CDC merge: only partitions the changelog names are
    rewritten (others' files are byte-identical afterwards), stale
    changes lose to the snapshot's seq, a delete that empties a
    partition removes its directory, and new keys insert."""
    import os

    from database_activity_monitoring_dam_system_spark.operators import (
        cdc,
    )

    path = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [
            # (key, payload, seq, partition)
            (1, "a", 100, 0),
            (2, "b", 100, 0),
            (3, "c", 100, 1),
            (9, "z", 100, 2),  # partition 2: single row, will empty
            (7, "g", 100, 3),  # partition 3: untouched
        ],
        "k INT, v STRING, seq INT, pb INT",
    )
    base.write.partitionBy("pb").parquet(path)
    untouched = sorted(
        str(p)
        for p in (tmp_path / "snap" / "pb=3").glob("*.parquet")
    )
    before = [(p, os.path.getmtime(p)) for p in untouched]
    changes = spark.createDataFrame(
        [
            (1, "a2", 150, 0, "U"),   # fresh update
            (2, "b0", 50, 0, "U"),    # stale update — must lose
            (3, "c2", 150, 1, "D"),   # fresh delete
            (4, "d", 150, 1, "U"),    # new key insert
            (9, "z", 150, 2, "D"),    # delete empties partition 2
        ],
        "k INT, v STRING, seq INT, pb INT, op STRING",
    )
    touched = cdc.merge_upsert_partitioned(
        spark, path, changes,
        key_cols=["k"], partition_col="pb", seq_col="seq",
    )
    assert sorted(touched) == ["0", "1", "2"]
    got = {
        (r.k, r.v, r.seq, r.pb)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "a2", 150, 0),
        (2, "b", 100, 0),   # stale change lost
        (4, "d", 150, 1),
        (7, "g", 100, 3),
    }
    assert not (tmp_path / "snap" / "pb=2").exists()
    after = [(p, os.path.getmtime(p)) for p in untouched]
    assert before == after  # partition 3 files never rewritten


def test_cdc_stream_maintains_snapshot(spark, tmp_path):
    """Streaming CDC apply: micro-batches of changelog files fold
    into the snapshot; the final table equals one batch apply of the
    whole changelog, and replaying the last (uncommitted) batch is
    the identity thanks to the seq guard."""
    from database_activity_monitoring_dam_system_spark.operators import (
        cdc,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        cdc_stream,
    )

    schema = "k INT, v STRING, seq INT, pb INT, op STRING"
    path = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(i, f"v{i}", 0, i % 3) for i in range(12)],
        "k INT, v STRING, seq INT, pb INT",
    )
    base.write.partitionBy("pb").parquet(path)
    src = str(tmp_path / "chglog")
    batch1 = [(3, "u3", 10, 0, "U"), (4, "u4", 11, 1, "D")]
    batch2 = [(3, "u3b", 20, 0, "U"), (5, "x", 21, 2, "U"),
              (20, "new", 22, 2, "U")]
    spark.createDataFrame(batch1, schema).write.parquet(src + "/b1.parquet")
    stream = (
        spark.readStream.schema(base.sparkSession.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    ckpt = str(tmp_path / "ckpt")
    q = cdc_stream.start_cdc_stream(
        stream, table_path=path, checkpoint_dir=ckpt,
        key_cols=["k"], partition_col="pb", seq_col="seq",
        available_now=True,
    )
    assert q.awaitTermination(60)
    q.stop()
    spark.createDataFrame(batch2, schema).write.parquet(src + "/b2.parquet")
    q2 = cdc_stream.start_cdc_stream(
        stream, table_path=path, checkpoint_dir=ckpt,
        key_cols=["k"], partition_col="pb", seq_col="seq",
        available_now=True,
    )
    assert q2.awaitTermination(60)
    q2.stop()
    all_changes = spark.createDataFrame(batch1 + batch2, schema)
    expected = {
        (r.k, r.v, r.seq, r.pb)
        for r in cdc.apply_changes(
            base, all_changes, key_cols=["k"], seq_col="seq"
        ).collect()
    }
    got = {
        (r.k, r.v, r.seq, r.pb)
        for r in spark.read.parquet(path).collect()
    }
    assert got == expected
    # forge a crash-before-commit of the LAST batch and restart: the
    # replayed merge must be the identity (seq guard)
    commits = sorted(
        int(p.name) for p in (tmp_path / "ckpt" / "commits").iterdir()
        if p.name.isdigit()
    )
    last = commits[-1]
    (tmp_path / "ckpt" / "commits" / str(last)).unlink()
    crc = tmp_path / "ckpt" / "commits" / f".{last}.crc"
    if crc.exists():
        crc.unlink()
    q3 = cdc_stream.start_cdc_stream(
        stream, table_path=path, checkpoint_dir=ckpt,
        key_cols=["k"], partition_col="pb", seq_col="seq",
        available_now=True,
    )
    assert q3.awaitTermination(60)
    q3.stop()
    got2 = {
        (r.k, r.v, r.seq, r.pb)
        for r in spark.read.parquet(path).collect()
    }
    assert got2 == expected


def test_distinct_rollup_stream_matches_batch_and_compacts(
    spark, tmp_path
):
    """Streamed HLL register partials: two micro-batches' fragments
    merge (register-wise max) to EXACTLY the batch distinct rollup —
    including the harmonic_scaled integer — and the shared
    compaction job folds register fragments the same way it folds
    time partials, views unchanged."""
    from database_activity_monitoring_dam_system_spark.operators import (
        rollup,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        rollup_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src + "/a.parquet")
    out, ckpt = str(tmp_path / "p"), str(tmp_path / "c")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = rollup_stream.start_distinct_rollup_stream(
        stream, out_path=out, checkpoint_dir=ckpt,
        group_cols=["event_type"], available_now=True,
    )
    assert q.awaitTermination(60)
    q.stop()
    streamed = sorted(
        map(tuple, rollup_stream.read_distinct_rollup(
            spark, out, to_grain="day", group_cols=["event_type"]
        ).collect())
    )
    batch = sorted(
        map(tuple, rollup.rollup_distinct(
            rollup.distinct_partials(
                events, grain="minute", group_cols=["event_type"]
            ),
            to_grain="day", group_cols=["event_type"],
        ).collect())
    )
    assert streamed == batch
    n_before, n_after = rollup_stream.compact_rollup_fragments(
        spark, out, checkpoint_dir=ckpt
    )
    assert n_before > 1 and n_after == 1
    after = sorted(
        map(tuple, rollup_stream.read_distinct_rollup(
            spark, out, to_grain="day", group_cols=["event_type"]
        ).collect())
    )
    assert after == batch
    # finer-grain guard carried over
    import pytest as _pytest

    out2, ckpt2 = str(tmp_path / "p2"), str(tmp_path / "c2")
    q2 = rollup_stream.start_distinct_rollup_stream(
        stream, out_path=out2, checkpoint_dir=ckpt2,
        grain="day", available_now=True,
    )
    assert q2.awaitTermination(60)
    q2.stop()
    with _pytest.raises(ValueError, match="finer"):
        rollup_stream.read_distinct_rollup(
            spark, out2, to_grain="hour"
        )


def test_merge_upsert_escaped_partition_and_missing_table(
    spark, tmp_path
):
    """Two review-found edges: a delete that empties a partition
    whose VALUE needs Hive path escaping (':' → '%3A') must still
    remove the directory, and fragment compaction against a
    not-yet-written table is a (0, 0) no-op instead of a raw Java
    FileNotFoundException."""
    from database_activity_monitoring_dam_system_spark.operators import (
        cdc,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        rollup_stream,
    )

    path = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(1, "a", 100, "2024-01-01 00:00:00"),
         (2, "b", 100, "2024-01-02 00:00:00")],
        "k INT, v STRING, seq INT, pb STRING",
    )
    base.write.partitionBy("pb").parquet(path)
    escaped = tmp_path / "snap" / "pb=2024-01-01 00%3A00%3A00"
    assert escaped.exists()
    changes = spark.createDataFrame(
        [(1, "a", 150, "2024-01-01 00:00:00", "D")],
        "k INT, v STRING, seq INT, pb STRING, op STRING",
    )
    cdc.merge_upsert_partitioned(
        spark, path, changes,
        key_cols=["k"], partition_col="pb", seq_col="seq",
    )
    assert not escaped.exists()
    assert {r.k for r in spark.read.parquet(path).collect()} == {2}
    # compaction no-op contract on a missing table
    assert rollup_stream.compact_rollup_fragments(
        spark, str(tmp_path / "never_written")
    ) == (0, 0)


def test_merge_upsert_boolean_and_null_partitions(spark, tmp_path):
    """The partition-value rendering fixes pinned: a BOOLEAN
    partition column (Spark writes 'pb=true'; Python str(True) is
    'True') gets its delete-emptied directory removed, and the NULL
    partition is merged — not silently excluded by a bare isin()
    (NULL IN (...) is SQL NULL) — so its untouched keys survive a
    targeted delete."""
    from database_activity_monitoring_dam_system_spark.operators import (
        cdc,
    )

    # boolean partitions: delete empties pb=true
    bpath = str(tmp_path / "bsnap")
    spark.createDataFrame(
        [(1, "a", 100, True), (2, "b", 100, False)],
        "k INT, v STRING, seq INT, pb BOOLEAN",
    ).write.partitionBy("pb").parquet(bpath)
    assert (tmp_path / "bsnap" / "pb=true").exists()
    touched = cdc.merge_upsert_partitioned(
        spark,
        bpath,
        spark.createDataFrame(
            [(1, "a", 150, True, "D")],
            "k INT, v STRING, seq INT, pb BOOLEAN, op STRING",
        ),
        key_cols=["k"], partition_col="pb", seq_col="seq",
    )
    assert touched == ["true"]
    assert not (tmp_path / "bsnap" / "pb=true").exists()
    assert {r.k for r in spark.read.parquet(bpath).collect()} == {2}
    # NULL partition: delete one key, the partition's OTHER key must
    # survive (a bare isin() filter would exclude the whole NULL
    # partition from the base scan and the merge would destroy it)
    npath = str(tmp_path / "nsnap")
    spark.createDataFrame(
        [(1, "a", 100, None), (2, "b", 100, None), (3, "c", 100, "p1")],
        "k INT, v STRING, seq INT, pb STRING",
    ).write.partitionBy("pb").parquet(npath)
    touched = cdc.merge_upsert_partitioned(
        spark,
        npath,
        spark.createDataFrame(
            [(1, "a", 150, None, "D")],
            "k INT, v STRING, seq INT, pb STRING, op STRING",
        ),
        key_cols=["k"], partition_col="pb", seq_col="seq",
    )
    assert touched == ["__HIVE_DEFAULT_PARTITION__"]
    got = {(r.k, r.pb) for r in spark.read.parquet(npath).collect()}
    assert got == {(2, None), (3, "p1")}


def test_read_rollup_refuses_mixed_grain_fragments(spark, tmp_path):
    """A stream restarted into the same out_path with a different
    grain leaves fragments of mixed geometry; the readers and the
    compactor must check the _grain stamp across the WHOLE table,
    not one sampled row — a first()-based guard passes or fails by
    sampling luck and the merge silently mixes grains."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import rollup
    from database_activity_monitoring_dam_system_spark.streaming import (
        rollup_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = spark.createDataFrame(
        [
            (1, 7, "login", "2024-03-01 10:00:30", 1.5),
            (2, 7, "login", "2024-03-01 10:01:10", 2.5),
            (3, 8, "query", "2024-03-01 11:00:00", 4.0),
        ],
        "event_id long, user_id long, event_type string, "
        "ts_s string, value double",
    ).selectExpr(
        "event_id", "user_id", "event_type",
        "CAST(ts_s AS TIMESTAMP) AS ts", "value",
    )
    out = str(tmp_path / "mixed")
    for grain, batch_id in (("minute", 0), ("hour", 1)):
        (
            rollup.time_partials(events, grain=grain)
            .withColumn("_grain", F.lit(grain))
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("_batch_id")
            .parquet(out)
        )
    with _pytest.raises(ValueError, match="mixed _grain"):
        rollup_stream.read_rollup(spark, out, to_grain="day")
    with _pytest.raises(ValueError, match="mixed _grain"):
        rollup_stream.compact_rollup_fragments(spark, out)
    # single-grain fragments still merge fine
    clean = str(tmp_path / "clean")
    for batch_id in (0, 1):
        (
            rollup.time_partials(events, grain="minute")
            .withColumn("_grain", F.lit("minute"))
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("_batch_id")
            .parquet(clean)
        )
    merged = rollup_stream.read_rollup(spark, clean, to_grain="hour")
    assert merged.count() == 2  # two distinct hours
    # a NULL-stamp fragment (written without _grain, schema-merged as
    # null) mixed with stamped fragments is the SAME mixed-geometry
    # error — not a bare TypeError from sorting None against str
    nully = str(tmp_path / "nullstamp")
    (
        rollup.time_partials(events, grain="minute")
        .withColumn("_grain", F.lit("minute"))
        .withColumn("_batch_id", F.lit(0))
        .write.mode("append").partitionBy("_batch_id").parquet(nully)
    )
    (
        rollup.time_partials(events, grain="minute")
        .withColumn("_grain", F.lit(None).cast("string"))
        .withColumn("_batch_id", F.lit(1))
        .write.mode("append").partitionBy("_batch_id").parquet(nully)
    )
    with _pytest.raises(ValueError, match="mixed _grain"):
        rollup_stream.read_rollup(spark, nully, to_grain="hour")
    # EVERY fragment null-stamped is its own named refusal (not an
    # order.index(None) crash or a null-stamped compaction output)
    allnull = str(tmp_path / "allnull")
    (
        rollup.time_partials(events, grain="minute")
        .withColumn("_grain", F.lit(None).cast("string"))
        .withColumn("_batch_id", F.lit(0))
        .write.mode("append").partitionBy("_batch_id").parquet(allnull)
    )
    with _pytest.raises(ValueError, match="null on every fragment"):
        rollup_stream.read_rollup(spark, allnull, to_grain="hour")


def test_cdc_tombstone_journal_blocks_stale_resurrections(spark):
    """The delete journal closes the documented out-of-order replay
    gap: a stale pre-delete UPDATE redelivered after the delete
    cannot re-insert the dead key, a change sequenced ABOVE the
    tombstone still resurrects it, and the journal helpers merge by
    max-seq / newest-stamp and prune by retention horizon."""
    import datetime as real_dt

    from database_activity_monitoring_dam_system_spark.operators import cdc

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, v string, seq long",
    )
    # in-order delete of k=1 (seq 100) and k=3 (seq 110)
    dels = spark.createDataFrame(
        [(1, "a", 100, "D"), (3, "c", 110, "D")],
        "k long, v string, seq long, op string",
    )
    base2 = cdc.apply_changes(base, dels, key_cols=["k"], seq_col="seq")
    assert {r.k for r in base2.collect()} == {2}
    journal = cdc.extract_tombstones(
        dels,
        key_cols=["k"],
        seq_col="seq",
        deleted_at=real_dt.datetime(2024, 6, 1),
    )
    assert {(r.k, r.seq) for r in journal.collect()} == {(1, 100), (3, 110)}
    # out-of-order redelivery: stale updates for the dead keys (seqs
    # 50/60 < tombstones), a legit post-delete re-insert for k=3
    # (seq 200 > 110), and a normal update for the live k=2
    stale = spark.createDataFrame(
        [
            (1, "zombie", 50, "U"),
            (3, "zombie", 60, "U"),
            (3, "reborn", 200, "U"),
            (2, "fresh", 90, "U"),
        ],
        "k long, v string, seq long, op string",
    )
    # WITHOUT the journal the seq guard cannot protect dead keys —
    # the documented limitation this feature exists for
    unguarded = cdc.apply_changes(
        base2, stale, key_cols=["k"], seq_col="seq"
    )
    assert {r.k for r in unguarded.collect()} == {1, 2, 3}
    got = {
        r.k: (r.v, r.seq)
        for r in cdc.apply_changes(
            base2, stale, key_cols=["k"], seq_col="seq",
            tombstones=journal,
        ).collect()
    }
    # k=1 stays dead; k=2 updated; k=3 resurrected by the higher seq
    assert got == {2: ("fresh", 90), 3: ("reborn", 200)}
    # a stale DELETE for an already-dead key is also a no-op
    stale_del = spark.createDataFrame(
        [(1, "a", 55, "D")], "k long, v string, seq long, op string"
    )
    still = cdc.apply_changes(
        base2, stale_del, key_cols=["k"], seq_col="seq",
        tombstones=journal,
    )
    assert {r.k for r in still.collect()} == {2}
    # a RAW journal with duplicate key rows (caller skipped
    # merge_tombstones) must not fan out the arbitration join into
    # duplicate upserts — apply_changes folds to max-seq per key
    raw_journal = spark.createDataFrame(
        [(1, 100), (1, 40), (3, 110), (3, 110)],
        "k long, seq long",
    )
    folded = cdc.apply_changes(
        base2, stale, key_cols=["k"], seq_col="seq",
        tombstones=raw_journal,
    ).collect()
    assert len(folded) == len({r.k for r in folded})  # no dup upserts
    assert {r.k: (r.v, r.seq) for r in folded} == {
        2: ("fresh", 90), 3: ("reborn", 200)
    }
    # journal maintenance: merge keeps max seq + newest stamp; prune
    # ages rows out by the retention horizon
    newer = cdc.extract_tombstones(
        spark.createDataFrame(
            [(3, "reborn", 300, "D")],
            "k long, v string, seq long, op string",
        ),
        key_cols=["k"],
        seq_col="seq",
        deleted_at=real_dt.datetime(2024, 7, 1),
    )
    merged = cdc.merge_tombstones(
        journal, newer, key_cols=["k"], seq_col="seq"
    )
    rows = {r.k: (r.seq, r.deleted_at) for r in merged.collect()}
    assert rows[3] == (300, real_dt.datetime(2024, 7, 1))
    assert rows[1][0] == 100
    pruned = cdc.prune_tombstones(
        merged, older_than=real_dt.datetime(2024, 6, 15)
    )
    assert {r.k for r in pruned.collect()} == {3}


def test_transition_stream_matches_batch_and_compacts(spark, tmp_path):
    """Streamed transition partials (boundary pairs closed via the
    per-user last-event state table) merged by read_rollup ≡ batch
    transition_partials at day grain — including the pairs that SPAN
    micro-batch boundaries; transition_matrix serves identical
    probabilities from either; replay is the identity; and the
    existing rollup compaction job folds the fragments unchanged."""
    from database_activity_monitoring_dam_system_spark.operators import (
        journeys,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        journey_stream, rollup_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    # split by TIME (not hash) so per-user order holds across batches
    # and the boundary pairs genuinely exist
    cut = events.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "src")
    events.filter(F.col("event_id") <= cut).write.parquet(src + "/a.parquet")
    events.filter(F.col("event_id") > cut).write.parquet(src + "/b.parquet")
    # events are ts-ordered by event_id in the testdata? assert the
    # contract the stream needs instead of assuming it
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    disorder = (
        events.withColumn("_le", F.lead("event_id").over(w))
        .filter(
            (F.col("_le").isNotNull())
            & (F.col("event_id") <= cut)
            & (F.col("_le") > cut)
        )
        .count()
    )
    assert disorder > 0  # the split really does create boundary pairs
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = str(tmp_path / "trans")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = journey_stream.start_transition_stream(
            stream, out_path=out, checkpoint_dir=ckpt,
            state_path=state, grain="day", available_now=True,
        )
        assert q.awaitTermination(60)
        q.stop()

    run()
    frags = spark.read.parquet(out)
    assert frags.select("_batch_id").distinct().count() >= 2
    streamed = rollup_stream.read_rollup(
        spark, out, to_grain="day",
        group_cols=["from_type", "to_type"],
    )
    batch = journeys.transition_partials(events, grain="day")

    def canon(df):
        return sorted(map(tuple, df.collect()))

    assert canon(streamed) == canon(batch)
    # NEGATIVE CONTROL: pairing each batch's file alone (no carried
    # state) strictly undercounts — the boundary pairs exist only
    # via the state table, so stream == batch above proves the carry
    # path genuinely ran
    solo = sum(
        r.n_events
        for f in ("a.parquet", "b.parquet")
        for r in journeys.transition_partials(
            spark.read.parquet(src + "/" + f), grain="day"
        ).collect()
    )
    full_total = sum(r.n_events for r in batch.collect())
    assert solo < full_total
    # served matrix equality (probabilities derived per bucket)
    assert canon(journeys.transition_matrix(streamed)) == canon(
        journeys.transition_matrix(batch)
    )
    # replay: forge a redelivery of the LAST batch — identity
    import os

    commits = sorted(
        c for c in os.listdir(ckpt + "/commits") if not c.startswith(".")
    )
    os.remove(ckpt + "/commits/" + commits[-1])
    crc = ckpt + "/commits/." + commits[-1] + ".crc"
    if os.path.exists(crc):
        os.remove(crc)
    run()
    assert canon(
        rollup_stream.read_rollup(
            spark, out, to_grain="day",
            group_cols=["from_type", "to_type"],
        )
    ) == canon(batch)
    # the EXISTING maintenance job folds the fragments; views survive
    before, after = rollup_stream.compact_rollup_fragments(
        spark, out, checkpoint_dir=ckpt
    )
    assert before >= 2 and after == 1
    assert canon(
        rollup_stream.read_rollup(
            spark, out, to_grain="day",
            group_cols=["from_type", "to_type"],
        )
    ) == canon(batch)


def test_session_stream_matches_batch(spark, tmp_path):
    """ST8 streaming twin: session_window over a two-file stream —
    sessions spanning the micro-batch boundary merge in the state
    store — emits, under a 0-second watermark, exactly the batch
    sessions the watermark has CLOSED (last_ts + gap behind the max
    event time); everything emitted matches batch bit-for-bit and
    the withheld remainder is exactly the still-open tail."""
    import datetime as real_dt

    from database_activity_monitoring_dam_system_spark.operators import (
        sessions,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    # time-split files so sessions genuinely straddle the batch seam
    cut = events.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "src")
    events.filter(F.col("event_id") <= cut).write.parquet(src + "/a.parquet")
    events.filter(F.col("event_id") > cut).write.parquet(src + "/b.parquet")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    gap = "30 minutes"
    agg = sessions.session_stats_stream(
        stream, gap=gap, watermark_delay="0 seconds",
        ts_col="ts", key_col="user_id",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("session_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(60)
    q.stop()
    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM session_stream_test").collect()
    }
    batch_full = sessions.session_stats(
        events, gap=gap, ts_col="ts", key_col="user_id"
    )
    # sessions the 0-second watermark must have closed: last event +
    # gap strictly behind the stream's max event time
    max_ts = events.agg(F.max("ts")).first()[0]
    horizon = max_ts - real_dt.timedelta(minutes=30)
    closed = {
        tuple(r)
        for r in batch_full.filter(
            (
                F.col("session_start")
                + F.expr("make_interval(0, 0, 0, 0, 0, 0, duration_sec)")
            )
            < F.lit(horizon)
        ).collect()
    }
    everything = {tuple(r) for r in batch_full.collect()}
    assert got <= everything
    assert closed <= got
    # the stream really sessionized (many users, many sessions) and
    # the withheld tail is small
    assert len(got) > 100
    assert len(everything) - len(got) <= events.select(
        "user_id"
    ).distinct().count()


def test_quantile_rollup_stream_matches_batch(spark, tmp_path):
    """Streamed fixed-bin histogram fragments merged by
    read_quantile_rollup ≡ batch quantiles computed directly — both
    estimators (grid edge and interpolated) — the continuous-
    aggregate story closed for percentiles the way the HLL stream
    closed COUNT DISTINCT; replay is the identity; the shared
    compaction job folds the third fragment schema; a restart with a
    DIFFERENT grid geometry is caught, not merged."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        rollup,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        rollup_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "src")
    events.filter(F.col("event_id") % 2 == 0).write.parquet(src + "/a.parquet")
    events.filter(F.col("event_id") % 2 == 1).write.parquet(src + "/b.parquet")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "qparts"), str(tmp_path / "ckpt")
    kw = dict(lo=0.0, hi=500.0, bins=200)

    def run():
        q = rollup_stream.start_quantile_rollup_stream(
            stream, out_path=out, checkpoint_dir=ckpt,
            grain="minute", group_cols=["event_type"],
            available_now=True, **kw,
        )
        assert q.awaitTermination(60)
        q.stop()

    run()
    frags = spark.read.parquet(out)
    assert frags.select("_batch_id").distinct().count() >= 2

    def canon(df):
        return sorted(map(tuple, df.collect()))

    batch_minute = rollup.value_quantile_partials(
        events, grain="minute", group_cols=["event_type"], **kw
    )
    for interp in (False, True):
        fn = (
            rollup.rollup_quantiles_interp
            if interp
            else rollup.rollup_quantiles
        )
        assert canon(
            rollup_stream.read_quantile_rollup(
                spark, out, to_grain="day",
                group_cols=["event_type"], interp=interp, **kw,
            )
        ) == canon(
            fn(
                batch_minute, to_grain="day",
                group_cols=["event_type"], **kw,
            )
        )
    # replay: forge a redelivery of the last batch — identity
    import os

    commits = sorted(
        c for c in os.listdir(ckpt + "/commits") if not c.startswith(".")
    )
    os.remove(ckpt + "/commits/" + commits[-1])
    crc = ckpt + "/commits/." + commits[-1] + ".crc"
    if os.path.exists(crc):
        os.remove(crc)
    run()
    expected = canon(
        rollup.rollup_quantiles(
            batch_minute, to_grain="day", group_cols=["event_type"], **kw
        )
    )
    assert canon(
        rollup_stream.read_quantile_rollup(
            spark, out, to_grain="day", group_cols=["event_type"], **kw
        )
    ) == expected
    # the shared maintenance job folds the third fragment schema
    before, after = rollup_stream.compact_rollup_fragments(
        spark, out, checkpoint_dir=ckpt
    )
    assert before >= 2 and after == 1
    assert canon(
        rollup_stream.read_quantile_rollup(
            spark, out, to_grain="day", group_cols=["event_type"], **kw
        )
    ) == expected
    # geometry guard: serving with a different grid fails in-plan
    with _pytest.raises(Exception, match="partials were built with"):
        rollup_stream.read_quantile_rollup(
            spark, out, to_grain="day", group_cols=["event_type"],
            lo=0.0, hi=500.0, bins=100,
        ).collect()


def test_dedup_stream_drops_redelivered_copies(spark, tmp_path):
    """At-least-once ingest made effectively-once: duplicated events
    (same keys, within the watermark horizon, split ACROSS
    micro-batches) collapse to one row ≡ batch dropDuplicates; a
    distinct event sharing a key but at a different timestamp
    survives."""
    import json as _json
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = {
        "user_host": "u[u] @ h []",
        "argument": "SELECT 1 FROM products",
    }
    ev = [
        dict(base, event_time="2026-08-01T10:00:00"),
        dict(base, event_time="2026-08-01T10:00:00"),  # dup, same file
        dict(base, event_time="2026-08-01T10:02:00"),  # distinct ts
        dict(
            base,
            event_time="2026-08-01T10:03:00",
            argument="SELECT 2 FROM products",
        ),
    ]
    with open(src + "/a.json", "w") as fh:
        for e in ev:
            fh.write(_json.dumps(e) + "\n")
    with open(src + "/b.json", "w") as fh:
        # cross-batch redelivery of the first two events
        fh.write(_json.dumps(ev[0]) + "\n")
        fh.write(_json.dumps(ev[3]) + "\n")
    # one file per micro-batch — the redelivery in b.json must be
    # caught by the state STORE across batches, not by a within-batch
    # dedup (which a stateless implementation would also pass)
    stream = ingest.read_agent_stream(spark, src, max_files_per_trigger=1)
    normalized = normalize_agent_events(stream)
    deduped = ingest.dedup_stream(normalized, watermark_delay="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(60)
    q.stop()
    got = spark.sql(
        "SELECT access_timestamp, query_hash FROM dedup_stream_test"
    ).collect()
    raw = _raw_batch_df(spark, ev + [ev[0], ev[3]])
    batch = (
        normalize_agent_events(raw)
        .dropDuplicates(["query_hash", "username", "access_timestamp"])
        .select("access_timestamp", "query_hash")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    # 3 distinct (key, ts) events out of 6 deliveries: the same-file
    # dup, the cross-batch redelivery, and the duplicate of ev[3]
    # all dropped; the same-key-different-ts event survives
    assert len(got) == 3


def test_variance_rollup_stream_matches_batch(spark, tmp_path):
    """Streamed (n, Σx, Σx²) moment fragments merged by
    read_variance_rollup ≡ batch rollup_variance — the fourth
    streamed partials schema; a forged redelivery of the last batch
    is the identity (the dynamic-partition-overwrite idempotence the
    other three schemas pin); the finer-grain guard refuses; the
    shared compaction job folds it and views survive."""
    import pytest as _pytest
    from database_activity_monitoring_dam_system_spark.operators import (
        rollup,
    )
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        rollup_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "src")
    events.filter(F.col("event_id") % 2 == 0).write.parquet(src + "/a.parquet")
    events.filter(F.col("event_id") % 2 == 1).write.parquet(src + "/b.parquet")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "vparts"), str(tmp_path / "ckpt")

    def run():
        q = rollup_stream.start_variance_rollup_stream(
            stream, out_path=out, checkpoint_dir=ckpt,
            grain="minute", group_cols=["event_type"],
            available_now=True,
        )
        assert q.awaitTermination(60)
        q.stop()

    run()
    assert (
        spark.read.parquet(out).select("_batch_id").distinct().count() >= 2
    )

    def canon(df):
        return sorted(map(tuple, df.collect()))

    batch = rollup.rollup_variance(
        rollup.variance_partials(
            events, grain="minute", group_cols=["event_type"]
        ),
        to_grain="day",
        group_cols=["event_type"],
    )
    expected = canon(batch)
    assert canon(
        rollup_stream.read_variance_rollup(
            spark, out, to_grain="day", group_cols=["event_type"]
        )
    ) == expected
    # forged redelivery of the LAST batch: an append-mode or
    # unpartitioned writer would double-count the moments
    import os

    commits = sorted(
        c for c in os.listdir(ckpt + "/commits") if not c.startswith(".")
    )
    os.remove(ckpt + "/commits/" + commits[-1])
    crc = ckpt + "/commits/." + commits[-1] + ".crc"
    if os.path.exists(crc):
        os.remove(crc)
    run()
    assert canon(
        rollup_stream.read_variance_rollup(
            spark, out, to_grain="day", group_cols=["event_type"]
        )
    ) == expected
    # a minute-written table refuses to masquerade as... anything
    # finer doesn't exist below minute; re-write a day-grain table
    # and refuse the hour view
    out2, ckpt2 = str(tmp_path / "vday"), str(tmp_path / "ckptday")
    q2 = rollup_stream.start_variance_rollup_stream(
        stream, out_path=out2, checkpoint_dir=ckpt2,
        grain="day", group_cols=["event_type"], available_now=True,
    )
    assert q2.awaitTermination(60)
    q2.stop()
    with _pytest.raises(ValueError, match="finer"):
        rollup_stream.read_variance_rollup(
            spark, out2, to_grain="hour", group_cols=["event_type"]
        )
    before, after = rollup_stream.compact_rollup_fragments(
        spark, out, checkpoint_dir=ckpt
    )
    assert before >= 2 and after == 1
    assert canon(
        rollup_stream.read_variance_rollup(
            spark, out, to_grain="day", group_cols=["event_type"]
        )
    ) == expected


def test_funnel_stream_matches_batch_under_disorder(spark, tmp_path):
    """funnel_stream converges to exactly journeys.funnel_steps on a
    replay whose disorder spans micro-batch boundaries (within the
    watermark horizon): a late-arriving step-1 event re-labels the
    funnel, a pre-login query never counts, and once the watermark
    finalizes early events the resolved-prefix + buffer mix still
    serves the batch answer.

    Runs under a NON-UTC session timezone: Arrow hands state fns
    session-TZ-localized naive timestamps whose .value is wall-clock-
    as-UTC — a state fn deriving epochs from them finalizes hours off
    the true watermark and emits skewed t_* seconds (caught in
    review; the JVM-side unix_micros projection is the fix this
    setting pins). Also pins the named refusal for unsafe step
    names (shared check_funnel_steps)."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        journeys,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        journey_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        _run_funnel_disorder_case(
            spark, tmp_path, journeys, journey_stream, _pytest
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def _run_funnel_disorder_case(spark, tmp_path, journeys, journey_stream, _pytest):
    with _pytest.raises(ValueError, match="safe column suffix"):
        journey_stream.funnel_stream(
            spark.readStream.format("rate").load(), ["log.in", "export"]
        )
    steps = ["login", "query", "export"]
    D = "2024-03-01 "
    batches = [
        # b0: u2's query arrives BEFORE its login (which lands in b1)
        [(1, "login", D + "10:00:00"), (2, "query", D + "10:03:00"),
         (3, "login", D + "10:05:00"), (4, "query", D + "10:00:00"),
         (5, "query", D + "10:03:00")],
        # b1: u2 login event-time 10:01:30 < b0's 10:03 query — the
        # cross-batch disorder the state buffer must absorb
        [(1, "query", D + "10:02:00"), (2, "login", D + "10:01:30"),
         (4, "login", D + "10:06:00"), (5, "login", D + "10:02:00")],
        # b2: u2 export predates its t_query (must NOT count); u5's
        # second login re-labels t_login downward after emission
        [(1, "export", D + "10:03:00"), (2, "export", D + "10:02:00"),
         (5, "login", D + "10:01:30")],
        # b3: u2's qualifying export
        [(2, "export", D + "10:04:00")],
        # b4: watermark pusher — finalizes all the above into the
        # resolved prefix (wm -> 10:25 with 5 min delay)
        [(9, "login", D + "10:30:00")],
        # b5: u3 extends a funnel whose login is already resolved —
        # the resolved + still-buffered mix
        [(3, "query", D + "10:29:30")],
    ]
    schema = "user_id long, event_type string, ts timestamp"
    src = str(tmp_path / "src")
    import os as _os
    import time as _time

    _os.makedirs(src)
    all_rows = []
    for i, rows in enumerate(batches):
        typed = [(u, t, __import__("datetime").datetime.strptime(
            ts, "%Y-%m-%d %H:%M:%S")) for u, t, ts in rows]
        all_rows.extend(typed)
        spark.createDataFrame(typed, schema).coalesce(1).write.parquet(
            f"{src}/b{i}.parquet"
        )
        _time.sleep(0.05)  # distinct mod-times keep file order stable
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    funnel = journey_stream.funnel_stream(
        stream, steps, watermark_delay="5 minutes"
    )
    out = str(tmp_path / "out")

    def sink(batch, batch_id):
        batch.withColumn("_b", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        funnel.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got_all = spark.read.parquet(out)
    assert got_all.select("_b").distinct().count() >= 5  # real replay
    from pyspark.sql import Window as W

    latest = (
        got_all.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.col("_b").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_b")
    )
    batch_df = spark.createDataFrame(all_rows, schema)
    want = journeys.funnel_steps(batch_df, steps)

    def canon(df):
        return sorted(
            map(tuple, df.select(
                "user_id", "t_login", "t_query", "t_export", "step_reached"
            ).collect())
        )

    assert canon(latest) == canon(want)
    # the disorder cases really exercised what they claim:
    want_map = {r.user_id: r for r in want.collect()}
    assert want_map[2].step_reached == 3          # late login absorbed
    assert want_map[2].t_export == int(
        __import__("datetime").datetime(
            2024, 3, 1, 10, 4, tzinfo=__import__("datetime").timezone.utc
        ).timestamp()
    )                                             # pre-t_query export skipped
    assert want_map[4].step_reached == 1          # pre-login query never counts
    assert want_map[5].t_login == int(
        __import__("datetime").datetime(
            2024, 3, 1, 10, 1, 30, tzinfo=__import__("datetime").timezone.utc
        ).timestamp()
    )                                             # re-label took the earlier login
    # and the re-label was VISIBLE in the stream: u5's emitted t_login
    # decreased between batches (emission-then-correction, not one shot)
    u5 = sorted(
        (r._b, r.t_login)
        for r in got_all.filter(F.col("user_id") == 5).collect()
    )
    assert len({t for _, t in u5}) == 2 and u5[-1][1] < u5[0][1]


def test_funnel_state_schema_is_checkpoint_stable_without_ttl():
    """The funnel stream's state row keeps the ORIGINAL 3-field shape
    when state_ttl is off, so a checkpoint written before the TTL
    feature resumes unchanged for callers that never opt in; the TTL
    opt-in appends last_us (4 fields) and is the documented
    fresh-checkpoint case (round-11 advisor finding)."""
    from database_activity_monitoring_dam_system_spark.streaming import (
        journey_stream,
    )

    legacy = journey_stream._funnel_state_schema(None)
    assert [f.name for f in legacy.fields] == [
        "resolved", "buf_ts", "buf_step",
    ]
    with_ttl = journey_stream._funnel_state_schema(3_600_000_000)
    assert [f.name for f in with_ttl.fields] == [
        "resolved", "buf_ts", "buf_step", "last_us",
    ]
    # the TTL schema extends the legacy one field-for-field
    assert with_ttl.fields[:3] == legacy.fields


def test_funnel_stream_state_ttl_bounds_state(spark, tmp_path):
    """state_ttl opt-in: within the TTL window the bounded stream is
    EXACTLY the unbounded stream (and therefore batch funnel_steps);
    a user silent past the TTL is genuinely evicted — their post-TTL
    return restarts from an empty funnel instead of extending the
    old one (the documented divergence from batch, and the proof the
    state was dropped rather than kept)."""
    import datetime as dt
    import os as _os
    import time as _time

    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        journeys,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        journey_stream,
    )

    with _pytest.raises(ValueError, match="positive"):
        journey_stream.funnel_stream(
            spark.readStream.format("rate").load(),
            ["login", "export"], state_ttl="-5 minutes",
        )

    steps = ["login", "query", "export"]

    def t(hh, mm, ss=0):
        return dt.datetime(2024, 3, 1, hh, mm, ss)

    batches = [
        # b0: u1 completes the funnel; u2 reaches step 1 then goes
        # quiet; u3 will stay inside the TTL across batches
        [(1, "login", t(10, 0)), (1, "query", t(10, 1)),
         (1, "export", t(10, 2)), (2, "login", t(10, 0))],
        # b1: watermark pusher (wm after this batch: 10:15)
        [(9, "login", t(10, 20))],
        # b2: wm reaches 10:15 > u2's 10:00+10min TTL → u2 evicted;
        # u1 (complete, last event 10:02) evicted at confirmation.
        # u3 starts a funnel inside the current horizon.
        [(9, "query", t(10, 40)), (3, "login", t(10, 38))],
        # b3: u2 RETURNS after eviction — its query at 10:41 would be
        # step 2 in batch (login 10:00 precedes it) but the stream
        # restarted u2 from scratch: query-without-login emits
        # nothing, then the fresh login at 10:42 is step 1.
        # u3 continues within the TTL → exact.
        [(2, "query", t(10, 41)), (2, "login", t(10, 42)),
         (3, "query", t(10, 41)), (3, "export", t(10, 43))],
    ]
    schema = "user_id long, event_type string, ts timestamp"
    src = str(tmp_path / "src")
    _os.makedirs(src)
    all_rows = []
    for i, rows in enumerate(batches):
        all_rows.extend(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/b{i}.parquet"
        )
        _time.sleep(0.05)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    funnel = journey_stream.funnel_stream(
        stream, steps, watermark_delay="5 minutes",
        state_ttl="10 minutes",
    )
    out = str(tmp_path / "out")

    def sink(batch, batch_id):
        batch.withColumn("_b", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        funnel.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got_all = spark.read.parquet(out)
    from pyspark.sql import Window as W

    latest = {
        r.user_id: r
        for r in got_all.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.col("_b").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .collect()
    }
    batch_map = {
        r.user_id: r
        for r in journeys.funnel_steps(
            spark.createDataFrame(all_rows, schema), steps
        ).collect()
    }

    # inside the TTL window the bounded stream is exact vs batch
    for uid in (1, 3):
        for col in ("t_login", "t_query", "t_export", "step_reached"):
            assert latest[uid][col] == batch_map[uid][col], (uid, col)
    assert latest[1].step_reached == 3 and latest[3].step_reached == 3

    # the divergence that PROVES eviction: batch links u2's 10:41
    # query to its 10:00 login; the evicted stream restarted u2
    assert batch_map[2].step_reached == 2
    assert latest[2].step_reached == 1
    assert latest[2].t_login == int(
        t(10, 42).replace(tzinfo=dt.timezone.utc).timestamp()
    )


def test_volume_anomaly_stream_matches_batch(spark, tmp_path):
    """volume_anomaly_stream (watermarked hourly counts stream-static
    joined to the broadcast baseline) emits exactly the batch
    volume_anomalies rows once the watermark finalizes each bucket —
    including a bucket whose events SPAN micro-batches — and a user
    absent from the baseline never surfaces."""
    import datetime as real_dt

    from database_activity_monitoring_dam_system_spark.operators import anomaly
    from database_activity_monitoring_dam_system_spark.streaming import (
        anomaly_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    baseline = spark.createDataFrame(
        [(1, 1.0, 0.5), (2, 2.0, 0.0), (3, 10.0, 2.0)],
        "user_id long, avg_queries double, std_queries double",
    )

    def ev(uid, hh, mm):
        return (uid, real_dt.datetime(2024, 3, 1, hh, mm))

    batches = [
        # u1 hour-10 bucket starts here (2 events)...
        [ev(1, 10, 0), ev(1, 10, 10), ev(2, 10, 5), ev(3, 10, 0)],
        # ...and crosses the batch boundary to 4 total (> 1+3*0.5);
        # u2 reaches 6 (> 2+3*1 — the NULL/0-std default guard)
        [ev(1, 10, 20), ev(1, 10, 40), ev(2, 10, 15), ev(2, 10, 20),
         ev(2, 10, 25), ev(2, 10, 30), ev(2, 10, 35), ev(3, 11, 0)],
        # u3 never breaches (2 < 10+3*2); u99 has no baseline row and
        # also serves as the watermark pusher that finalizes hour 10/11
        [ev(3, 11, 5), ev(99, 14, 0), ev(99, 15, 0)],
    ]
    schema = "user_id long, access_timestamp timestamp"
    src = str(tmp_path / "vsrc")
    import os as _os
    import time as _time

    _os.makedirs(src)
    all_rows = []
    for i, rows in enumerate(batches):
        all_rows.extend(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/b{i}.parquet"
        )
        _time.sleep(0.05)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    flagged = anomaly_stream.volume_anomaly_stream(
        stream, baseline, watermark_delay="5 minutes"
    )
    out = str(tmp_path / "vout")
    q = (
        flagged.writeStream.foreachBatch(
            lambda b, bid: b.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "vckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(out)
    want = anomaly.volume_anomalies(
        spark.createDataFrame(all_rows, schema), baseline
    )

    def canon(df):
        return sorted(
            map(tuple, df.select(
                "user_id", "hour_bucket", "cnt", "avg_queries", "std_queries"
            ).collect())
        )

    assert canon(got) == canon(want)
    flagged_users = {r.user_id for r in got.collect()}
    assert flagged_users == {1, 2}  # u3 under threshold, u99 no baseline
    # the breaching u1 bucket really did span micro-batches
    assert sum(
        1 for (u, ts) in all_rows[:4] if u == 1 and ts.hour == 10
    ) < next(r.cnt for r in got.collect() if r.user_id == 1)


def test_impossible_travel_stream_matches_batch(spark, tmp_path):
    """start_impossible_travel_stream flags consecutive same-user
    different-IP logins live — including the pair spanning the
    micro-batch boundary via the carried last-login snapshot — and
    the union of fragments equals batch impossible_travel over the
    same logins (shared login_ip_pairs definition). Replaying the
    last batch rewrites its own fragment (identity)."""
    import datetime as real_dt
    import os as _os
    import time as _time

    from database_activity_monitoring_dam_system_spark.operators import anomaly
    from database_activity_monitoring_dam_system_spark.streaming import (
        anomaly_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def ev(aid, user, op, ip, mm, ss=0):
        return (aid, user, op, ip, real_dt.datetime(2024, 3, 1, 10, mm, ss))

    batches = [
        # b0: a logs in from ip1; b from ip1 twice (same IP — never
        # flagged); a non-LOGIN row from elsewhere is ignored
        [ev(1, "a", "LOGIN", "ip1", 0), ev(2, "b", "LOGIN", "ip1", 1),
         ev(3, "b", "LOGIN", "ip1", 2), ev(4, "a", "SELECT", "ip9", 3)],
        # b1: a's ip2 login pairs against the CARRIED ip1 (boundary
        # flag); b's ip3 likewise; c's first login has no predecessor
        [ev(5, "a", "LOGIN", "ip2", 10), ev(6, "b", "LOGIN", "ip3", 11),
         ev(7, "c", "LOGIN", "ip5", 12)],
        # b2: a changes IP again (in-batch pair after a carried row);
        # c repeats its IP (no flag)
        [ev(8, "a", "LOGIN", "ip3", 20), ev(9, "a", "LOGIN", "ip4", 21),
         ev(10, "c", "LOGIN", "ip5", 22)],
    ]
    schema = (
        "activity_id long, username string, operation_type string, "
        "ip_address string, access_timestamp timestamp"
    )
    src = str(tmp_path / "isrc")
    _os.makedirs(src)
    all_rows = []
    for i, rows in enumerate(batches):
        all_rows.extend(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/b{i}.parquet"
        )
        _time.sleep(0.05)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = str(tmp_path / "iout")
    state = str(tmp_path / "istate")
    ckpt = str(tmp_path / "ickpt")

    def run():
        q = anomaly_stream.start_impossible_travel_stream(
            stream, out_path=out, checkpoint_dir=ckpt,
            state_path=state, available_now=True,
        )
        assert q.awaitTermination(120)
        q.stop()

    run()
    got = spark.read.parquet(out)
    full = spark.createDataFrame(all_rows, schema)
    want = anomaly.impossible_travel(
        full, now=real_dt.datetime(2024, 3, 1, 11, 0), window_hours=24
    )

    def canon(df):
        return sorted(
            map(tuple, df.select(
                "username", "login_ts", "ip_address", "prev_ip", "prev_ts"
            ).collect())
        )

    assert canon(got) == canon(want)
    assert len(canon(want)) == 4  # a: ip1->2->3->4; b: ip1->ip3
    # NEGATIVE CONTROL: pairing each batch alone misses the
    # boundary pairs — the carry path genuinely ran
    solo = sum(
        anomaly.impossible_travel(
            spark.read.parquet(f"{src}/b{i}.parquet"),
            now=real_dt.datetime(2024, 3, 1, 11, 0), window_hours=24,
        ).count()
        for i in range(3)
    )
    assert solo < len(canon(want))
    # replay the last batch: dynamic overwrite rewrites exactly its
    # own fragment — the flag table is unchanged
    commits = sorted(
        c for c in _os.listdir(ckpt + "/commits") if not c.startswith(".")
    )
    _os.remove(ckpt + "/commits/" + commits[-1])
    crc = ckpt + "/commits/." + commits[-1] + ".crc"
    if _os.path.exists(crc):
        _os.remove(crc)
    run()
    assert canon(spark.read.parquet(out)) == canon(want)


def test_bm25_maintenance_stream_keeps_artifact_fresh(spark, tmp_path):
    """A CDC-shaped doc stream (upserts + deletes, seq-arbitrated)
    folded into the BM25 stats artifact per micro-batch: after the
    replay the artifact serves bit-identical scores to a fresh
    bm25_scores over the final corpus, its row count IS the corpus
    size (zero-token docs included), and redelivering the last batch
    is the identity. Duplicate in-batch ids without a seq refuse."""
    import os as _os
    import time as _time

    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import (
        invindex,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        index_maintenance,
    )

    batches = [
        # b0: initial corpus, incl. a zero-token doc (id 4)
        [(1, "spark merges dup rows", "U", 1),
         (2, "dup dup dedup merge", "U", 2),
         (3, "plain text here", "U", 3),
         (4, "!!!", "U", 4)],
        # b1: change 2 (shifts tf/dl/df), add 5, delete 3; id 5 is
        # upserted TWICE in one batch — seq arbitration keeps seq 7
        [(2, "merge spark merge", "U", 5),
         (5, "first version", "U", 6),
         (5, "spark spark dedup", "U", 7),
         (3, "", "D", 8)],
        # b2: delete the zero-token doc, change 1 to zero-token
        [(4, "", "D", 9), (1, "?", "U", 10)],
    ]
    schema = "doc_id long, text string, op string, seq long"
    src = str(tmp_path / "bsrc")
    _os.makedirs(src)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/b{i}.parquet"
        )
        _time.sleep(0.05)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    art = str(tmp_path / "bm25_art")
    ckpt = str(tmp_path / "bckpt")

    def run():
        q = index_maintenance.start_bm25_maintenance_stream(
            stream, artifact_path=art, checkpoint_dir=ckpt,
            op_col="op", seq_col="seq", available_now=True,
        )
        assert q.awaitTermination(120)
        q.stop()

    run()
    # final corpus after the replay: 1->"?", 2->"merge spark merge",
    # 5->"spark spark dedup"; 3 and 4 deleted
    final = spark.createDataFrame(
        [(1, "?"), (2, "merge spark merge"), (5, "spark spark dedup")],
        "doc_id long, text string",
    )
    stats, n = invindex.load_bm25_stats(spark, art)
    assert n == 3 and stats.count() == 3  # rows == corpus size
    terms = ["spark", "dedup"]

    def canon(df):
        return sorted(map(tuple, df.select("doc_id", "score").collect()))

    assert canon(
        invindex.bm25_from_stats(stats, terms, n_docs=n)
    ) == canon(invindex.bm25_scores(final, terms))
    # zero-token doc 1 contributes to N but never to candidates
    assert {r.doc_id for r in stats.collect()} == {1, 2, 5}
    # replay the last batch — identity
    commits = sorted(
        c for c in _os.listdir(ckpt + "/commits") if not c.startswith(".")
    )
    _os.remove(ckpt + "/commits/" + commits[-1])
    crc = ckpt + "/commits/." + commits[-1] + ".crc"
    if _os.path.exists(crc):
        _os.remove(crc)
    run()
    stats2, n2 = invindex.load_bm25_stats(spark, art)
    assert n2 == 3
    assert canon(
        invindex.bm25_from_stats(stats2, terms, n_docs=n2)
    ) == canon(invindex.bm25_scores(final, terms))
    # duplicate in-batch ids with NO seq column refuse by name
    with _pytest.raises(ValueError, match="no seq_col"):
        index_maintenance.fold_bm25_batch(
            None,
            spark.createDataFrame(
                [(7, "a", "U"), (7, "b", "U")],
                "doc_id long, text string, op string",
            ),
            op_col="op",
        )
    # a NULL op is neither upsert nor delete — refuse, don't silently
    # drop the doc from the index
    with _pytest.raises(ValueError, match="NULL 'op'"):
        index_maintenance.fold_bm25_batch(
            None,
            spark.createDataFrame(
                [(7, "a", None)], "doc_id long, text string, op string"
            ),
            op_col="op",
        )
    # a custom id_col keeps the artifact schema on doc_id from the
    # FIRST fold (regression: the first-batch path skipped the rename)
    first = index_maintenance.fold_bm25_batch(
        None,
        spark.createDataFrame([(8, "hello world")], "did long, text string"),
        id_col="did",
    )
    assert first.columns == ["doc_id", "dl", "tf_map"]
    # a batch-path artifact (no keep-empty rows: stamp N > rows) is
    # refused by the maintainer instead of silently re-deriving N
    batch_art = str(tmp_path / "batch_art")
    invindex.save_bm25_stats(
        invindex.build_bm25_stats(
            spark.createDataFrame(
                [(1, "x y"), (2, "!!!")], "doc_id long, text string"
            )
        ),
        batch_art, n_docs=2,
    )
    more = str(tmp_path / "moresrc")
    _os.makedirs(more)
    spark.createDataFrame(
        [(9, "z", "U", 1)], schema
    ).coalesce(1).write.parquet(f"{more}/b0.parquet")
    q = index_maintenance.start_bm25_maintenance_stream(
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(more),
        artifact_path=batch_art,
        checkpoint_dir=str(tmp_path / "bckpt2"),
        op_col="op", seq_col="seq", available_now=True,
    )
    with _pytest.raises(Exception, match="keep_empty_docs"):
        q.awaitTermination(120)
        raise AssertionError("maintenance adopted a batch-path artifact")
    q.stop()


def test_search_maintenance_stream_folds_both_artifacts(spark, tmp_path):
    """The combined maintainer folds BOTH search artifacts per
    micro-batch: after an upsert/delete replay the posting table
    equals a fresh build_postings over the final corpus (removed
    docs' old tokens recovered from the pre-fold stats tf_map — no
    old text in the stream) and the stats table serves fresh BM25;
    redelivering the last batch is the identity for both."""
    import os as _os
    import time as _time

    from database_activity_monitoring_dam_system_spark.operators import (
        invindex,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        index_maintenance,
    )

    batches = [
        [(1, "alpha beta gamma", "U", 1), (2, "beta beta delta", "U", 2),
         (3, "gamma solo", "U", 3)],
        # change 2 (loses delta, gains alpha), delete 3 (its gamma
        # posting must shrink, its solo posting must vanish), add 4
        [(2, "beta alpha", "U", 4), (3, "", "D", 5),
         (4, "delta epsilon", "U", 6)],
    ]
    schema = "doc_id long, text string, op string, seq long"
    src = str(tmp_path / "ssrc")
    _os.makedirs(src)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/b{i}.parquet"
        )
        _time.sleep(0.05)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    bm25_art = str(tmp_path / "s_bm25")
    post_art = str(tmp_path / "s_post")
    ckpt = str(tmp_path / "sckpt")

    def run():
        q = index_maintenance.start_search_maintenance_stream(
            stream(), bm25_path=bm25_art, postings_path=post_art,
            checkpoint_dir=ckpt, op_col="op", seq_col="seq",
            available_now=True,
        )
        assert q.awaitTermination(120)
        q.stop()

    run()
    final = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta alpha"), (4, "delta epsilon")],
        "doc_id long, text string",
    )

    def canon_post(df):
        return sorted(
            (r.token, tuple(r.postings), r.df) for r in df.collect()
        )

    streamed_post = invindex.load_postings(
        spark, post_art, expect_docs=3
    )
    fresh_post = invindex.build_postings(final)
    assert canon_post(streamed_post) == canon_post(fresh_post)
    # doc 3's tokens really exercised the stats-derived removal:
    # gamma shrank to [1], solo vanished entirely
    posts = {r.token: list(r.postings) for r in streamed_post.collect()}
    assert posts["gamma"] == [1] and "solo" not in posts
    # conjunctive search serves from the streamed artifact
    assert {r.doc_id for r in invindex.search_all_terms(
        streamed_post, ["alpha", "beta"]
    ).collect()} == {1, 2}
    stats, n = invindex.load_bm25_stats(spark, bm25_art, expect_docs=3)

    def canon(df):
        return sorted(map(tuple, df.select("doc_id", "score").collect()))

    assert canon(
        invindex.bm25_from_stats(stats, ["alpha", "delta"], n_docs=n)
    ) == canon(invindex.bm25_scores(final, ["alpha", "delta"]))
    # replay the last batch — identity for BOTH artifacts
    commits = sorted(
        c for c in _os.listdir(ckpt + "/commits") if not c.startswith(".")
    )
    _os.remove(ckpt + "/commits/" + commits[-1])
    crc = ckpt + "/commits/." + commits[-1] + ".crc"
    if _os.path.exists(crc):
        _os.remove(crc)
    run()
    assert canon_post(
        invindex.load_postings(spark, post_art, expect_docs=3)
    ) == canon_post(fresh_post)
    stats2, n2 = invindex.load_bm25_stats(spark, bm25_art, expect_docs=3)
    assert canon(
        invindex.bm25_from_stats(stats2, ["alpha", "delta"], n_docs=n2)
    ) == canon(invindex.bm25_scores(final, ["alpha", "delta"]))
    # THE retry window the except-both-sides patch exists for:
    # postings saved, stats NOT — the retried patch re-runs with
    # PRE-fold stats against POST-fold postings and must be the
    # identity (a changed doc's newly-added token is already in the
    # postings but absent from rm; except-rm-only would duplicate it)
    import pytest as _pytest

    pre_stats = invindex.build_bm25_stats(
        spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "beta beta delta"),
             (3, "gamma solo")],
            "doc_id long, text string",
        ),
        keep_empty_docs=True,
    )
    pre_post = invindex.build_postings(
        spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "beta beta delta"),
             (3, "gamma solo")],
            "doc_id long, text string",
        )
    )
    replay_batch = spark.createDataFrame(
        batches[1], "doc_id long, text string, op string, seq long"
    )
    once = index_maintenance.fold_postings_batch(
        pre_post, pre_stats, replay_batch, op_col="op", seq_col="seq"
    )
    twice = index_maintenance.fold_postings_batch(
        once, pre_stats, replay_batch, op_col="op", seq_col="seq"
    )
    assert canon_post(twice) == canon_post(once) == canon_post(fresh_post)
    # mixed artifact presence refuses: stats without postings would
    # orphan deletes / miss corpus — stream dies with the named error
    lone = str(tmp_path / "lone_bm25")
    invindex.save_bm25_stats(
        invindex.build_bm25_stats(final, keep_empty_docs=True),
        lone, n_docs=3,
    )
    q = index_maintenance.start_search_maintenance_stream(
        stream(), bm25_path=lone,
        postings_path=str(tmp_path / "nope_post"),
        checkpoint_dir=str(tmp_path / "sckpt2"),
        op_col="op", seq_col="seq", available_now=True,
    )
    with _pytest.raises(Exception, match="maintained together"):
        q.awaitTermination(120)
        raise AssertionError("lone-artifact stream did not refuse")
    q.stop()
    # a df-capped posting table refuses (pruned tokens can't be
    # repaired; the patch would strip the refusal stamps)
    capped = str(tmp_path / "capped_post")
    invindex.save_postings(
        invindex.build_postings(final, max_df=2), capped, n_docs=3
    )
    q = index_maintenance.start_search_maintenance_stream(
        stream(), bm25_path=lone, postings_path=capped,
        checkpoint_dir=str(tmp_path / "sckpt3"),
        op_col="op", seq_col="seq", available_now=True,
    )
    with _pytest.raises(Exception, match="df caps"):
        q.awaitTermination(120)
        raise AssertionError("capped-artifact stream did not refuse")
    q.stop()


def test_robust_volume_anomaly_stream_matches_batch(spark, tmp_path):
    """The robust (median+MAD) arbitration served from the SAME
    streamed hourly counts: volume_anomaly_stream with
    flags_fn=robust_volume_flags emits exactly the batch
    robust_volume_anomalies rows once the watermark finalizes each
    bucket — including the degenerate-MAD fallback path."""
    import datetime as real_dt
    import os as _os
    import time as _time

    from database_activity_monitoring_dam_system_spark.operators import anomaly
    from database_activity_monitoring_dam_system_spark.streaming import (
        anomaly_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # u1: med 2, MAD 1 → threshold 2 + 4.4478 ≈ 6.45; u2: MAD 0 →
    # fallback 1 → threshold 3 + 4.4478 ≈ 7.45
    baseline = spark.createDataFrame(
        [(1, 2.0, 1.0), (2, 3.0, 0.0)],
        "user_id long, med_queries double, mad_queries double",
    )

    def ev(uid, hh, mm):
        return (uid, real_dt.datetime(2024, 3, 1, hh, mm))

    batches = [
        [ev(1, 10, m) for m in range(0, 16, 4)],          # u1 hour-10: 4 so far
        [ev(1, 10, m) for m in range(16, 28, 4)]           # ...7 total > 6.45
        + [ev(2, 10, m) for m in range(0, 28, 4)],         # u2: 7 < 7.45
        [ev(99, 14, 0), ev(99, 15, 0)],                    # watermark pusher
    ]
    schema = "user_id long, access_timestamp timestamp"
    src = str(tmp_path / "rvsrc")
    _os.makedirs(src)
    all_rows = []
    for i, rows in enumerate(batches):
        all_rows.extend(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/b{i}.parquet"
        )
        _time.sleep(0.05)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    flagged = anomaly_stream.volume_anomaly_stream(
        stream,
        baseline,
        watermark_delay="5 minutes",
        flags_fn=anomaly.robust_volume_flags,
    )
    out = str(tmp_path / "rvout")
    q = (
        flagged.writeStream.foreachBatch(
            lambda b, bid: b.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "rvckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(out)
    want = anomaly.robust_volume_anomalies(
        spark.createDataFrame(all_rows, schema), baseline
    )

    def canon(df):
        return sorted(
            map(tuple, df.select(
                "user_id", "hour_bucket", "cnt", "med_queries", "mad_queries"
            ).collect())
        )

    assert canon(got) == canon(want)
    assert {r.user_id for r in got.collect()} == {1}  # u2 under fallback gate


def test_containment_maintenance_stream_matches_batch(spark, tmp_path):
    """Two CDC micro-batches (bootstrap, then change+delete+add)
    folded through the pair maintainer: the served pair table equals
    a fresh containment_prefix_pairs over the final corpus, the
    digest stamp binds pairs to the exact snapshot, and a lone
    artifact or mismatched threshold refuses by name."""
    import os as _os
    import time as _time

    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import dedup
    from database_activity_monitoring_dam_system_spark.streaming import (
        pair_maintenance,
    )

    core = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    wrap = "hdr " + core + " ftr one two"
    core2 = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    b1 = [
        (1, core, "U", 1), (2, wrap, "U", 2),
        (3, core2, "U", 3), (5, "x1 " + core + " x2 x3", "U", 4),
    ]
    b2 = [
        (5, None, "D", 5),                              # delete
        (3, "changed words entirely now", "U", 6),      # change
        (6, "pre " + core + " post five six", "U", 7),  # add superset of 1
    ]
    schema = "doc_id long, text string, op string, seq long"
    src = str(tmp_path / "csrc")
    _os.makedirs(src)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/b{i}.parquet"
        )
        _time.sleep(0.05)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    pairs_path = str(tmp_path / "pairs")
    corpus_path = str(tmp_path / "corpus")
    t, sh = 0.8, 1
    q = pair_maintenance.start_containment_maintenance_stream(
        stream,
        pairs_path=pairs_path,
        corpus_path=corpus_path,
        checkpoint_dir=str(tmp_path / "cckpt"),
        threshold=t, shingle=sh,
        op_col="op", seq_col="seq",
        available_now=True,
    )
    assert q.awaitTermination(180)
    q.stop()

    final_corpus = spark.read.parquet(corpus_path)
    served = dedup.load_containment_pairs(
        spark, pairs_path, threshold=t, shingle=sh,
        corpus_digest=dedup.corpus_digest(final_corpus),
    )
    fresh = dedup.containment_prefix_pairs(
        final_corpus, threshold=t, shingle=sh
    )
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(served) == canon(fresh)
    got = {(r["doc_a"], r["doc_b"]) for r in served.collect()}
    assert (1, 6) in got            # pair minted in batch 2
    assert not any(5 in p for p in got)  # deleted doc's pairs gone
    # corpus state: 3 changed, 5 gone, 6 present
    texts = {r["doc_id"]: r["text"] for r in final_corpus.collect()}
    assert set(texts) == {1, 2, 3, 6}
    assert texts[3] == "changed words entirely now"

    # refusal: wrong threshold stamp
    with _pytest.raises(ValueError, match="_threshold"):
        dedup.load_containment_pairs(
            spark, pairs_path, threshold=0.9, shingle=sh
        )
    # refusal: digest mismatch (pairs vs a different snapshot)
    with _pytest.raises(ValueError, match="_corpus_digest"):
        dedup.load_containment_pairs(
            spark, pairs_path, threshold=t, shingle=sh,
            corpus_digest="0:0:0",
        )


def test_containment_maintenance_refuses_lone_artifact(spark, tmp_path):
    """A pair table without its corpus snapshot (or vice versa) is a
    partial deployment — the maintainer refuses by name instead of
    folding against a missing diff base."""
    import os as _os
    import shutil as _shutil
    import time as _time

    from database_activity_monitoring_dam_system_spark.streaming import (
        pair_maintenance,
    )

    schema = "doc_id long, text string, op string, seq long"
    src = str(tmp_path / "lsrc")
    _os.makedirs(src)
    spark.createDataFrame(
        [(1, "a b c", "U", 1)], schema
    ).coalesce(1).write.parquet(f"{src}/b0.parquet")
    _time.sleep(0.05)
    pairs_path = str(tmp_path / "lpairs")
    corpus_path = str(tmp_path / "lcorpus")

    def run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = pair_maintenance.start_containment_maintenance_stream(
            stream, pairs_path=pairs_path, corpus_path=corpus_path,
            checkpoint_dir=str(tmp_path / ck), threshold=0.8, shingle=1,
            op_col="op", seq_col="seq", available_now=True,
        )
        ok = q.awaitTermination(120)
        q.stop()
        return ok

    assert run("ck1")
    _shutil.rmtree(corpus_path)  # simulate the torn/partial state
    try:
        run("ck2")
        raise AssertionError("expected the lone-artifact refusal")
    except Exception as e:  # StreamingQueryException wraps the ValueError
        assert "maintained together" in str(e)


def test_containment_maintenance_self_heals_torn_commit(spark, tmp_path):
    """Crash-window recovery: a staged corpus whose digest matches the
    pair table's identity sidecar is the missing half of a torn commit
    — the next run promotes it and replays to the same final state; a
    staged corpus that does NOT match is a pre-save orphan and is
    deleted, leaving the consistent artifacts untouched."""
    import os as _os
    import shutil as _shutil
    import time as _time

    from database_activity_monitoring_dam_system_spark.operators import dedup
    from database_activity_monitoring_dam_system_spark.streaming import (
        pair_maintenance,
    )

    core = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b1 = [(1, core, "U", 1), (2, "hdr " + core + " ftr", "U", 2)]
    b2 = [(3, "pre " + core + " post", "U", 3), (2, None, "D", 4)]
    schema = "doc_id long, text string, op string, seq long"
    src = str(tmp_path / "hsrc")
    _os.makedirs(src)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/b{i}.parquet"
        )
        _time.sleep(0.05)
    pairs_path = str(tmp_path / "hpairs")
    corpus_path = str(tmp_path / "hcorpus")
    staging_path = corpus_path + ".staging"
    t, sh = 0.8, 1

    def run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = pair_maintenance.start_containment_maintenance_stream(
            stream, pairs_path=pairs_path, corpus_path=corpus_path,
            checkpoint_dir=str(tmp_path / ck), threshold=t, shingle=sh,
            op_col="op", seq_col="seq", available_now=True,
        )
        assert q.awaitTermination(180)
        q.stop()

    run("hck1")  # clean end state
    final_corpus_rows = sorted(
        map(tuple, spark.read.parquet(corpus_path).collect())
    )
    served = dedup.load_containment_pairs(
        spark, pairs_path, threshold=t, shingle=sh,
        corpus_digest=dedup.corpus_digest(spark.read.parquet(corpus_path)),
    )
    final_pairs = sorted(map(tuple, served.collect()))

    # ---- simulate the torn commit: pairs saved (final), promote lost.
    # corpus reverts to the post-b1 snapshot; the final corpus sits in
    # staging exactly as the crashed promote left it.
    post_b1 = dedup.containment_prefix_pairs  # noqa: F841 (doc anchor)
    _shutil.move(corpus_path, staging_path)
    spark.createDataFrame(
        [(1, core), (2, "hdr " + core + " ftr")], "doc_id long, text string"
    ).write.parquet(corpus_path)
    # the torn state refuses a direct serve (digest mismatch)...
    try:
        dedup.load_containment_pairs(
            spark, pairs_path, threshold=t, shingle=sh,
            corpus_digest=dedup.corpus_digest(
                spark.read.parquet(corpus_path)
            ),
        )
        raise AssertionError("expected the digest refusal on torn state")
    except ValueError as e:
        assert "_corpus_digest" in str(e)
    # ...but the maintainer heals it: recovery promotes the staged
    # corpus (identity matches), then replays both batches idempotently
    run("hck2")
    assert not _os.path.exists(staging_path)
    assert sorted(
        map(tuple, spark.read.parquet(corpus_path).collect())
    ) == final_corpus_rows
    served2 = dedup.load_containment_pairs(
        spark, pairs_path, threshold=t, shingle=sh,
        corpus_digest=dedup.corpus_digest(spark.read.parquet(corpus_path)),
    )
    assert sorted(map(tuple, served2.collect())) == final_pairs

    # ---- pre-save orphan: staging holds a corpus the pair identity
    # does NOT bind — recovery deletes it and the artifacts survive
    spark.createDataFrame(
        [(9, "unrelated text entirely")], "doc_id long, text string"
    ).write.parquet(staging_path)
    run("hck3")
    assert not _os.path.exists(staging_path)
    assert sorted(
        map(tuple, spark.read.parquet(corpus_path).collect())
    ) == final_corpus_rows


def test_empty_pair_table_identity_sidecar(spark, tmp_path):
    """A zero-pair table is a real state — but only the _identity
    sidecar makes it verifiable: with it, the digest gate works; an
    empty pre-sidecar artifact (no rows, no sidecar) refuses instead
    of vacuously passing."""
    import shutil as _shutil

    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "a b c"), (2, "x y z")], "doc_id long, text string"
    )
    digest = dedup.corpus_digest(corpus)
    empty = dedup.containment_prefix_pairs(corpus, threshold=0.9, shingle=1)
    assert empty.count() == 0
    path = str(tmp_path / "epairs")
    dedup.save_containment_pairs(
        empty, path, threshold=0.9, shingle=1, corpus_digest=digest
    )
    # sidecar present: verifies, and catches a wrong digest
    assert dedup.load_containment_pairs(
        spark, path, threshold=0.9, shingle=1, corpus_digest=digest
    ).count() == 0
    with _pytest.raises(ValueError, match="_corpus_digest"):
        dedup.load_containment_pairs(
            spark, path, threshold=0.9, shingle=1, corpus_digest="0:0:0"
        )
    # sidecar gone (pre-sidecar artifact): the empty table can no
    # longer prove its bound corpus — refuse
    _shutil.rmtree(path + "/_identity")
    with _pytest.raises(ValueError, match="_identity sidecar"):
        dedup.load_containment_pairs(
            spark, path, threshold=0.9, shingle=1, corpus_digest=digest
        )


def test_journal_stream_serves_time_travel(spark, tmp_path):
    """The streamed journal (per-batch fragments) is a faithful
    history table: snapshot_as_of over it reconstructs every cut
    exactly as the in-memory journal does, and scd2_intervals renders
    the same validity spans — time travel served from a
    stream-maintained artifact."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from database_activity_monitoring_dam_system_spark.operators import cdc
    from database_activity_monitoring_dam_system_spark.streaming import (
        cdc_stream,
    )

    schema = "k long, val string, seq long, op string"
    b1 = [(1, "a2", 40, "U"), (2, "b2", 50, "U"), (4, "d", 60, "U")]
    b2 = [(1, None, 70, "D"), (2, "b3", 80, "U"), (4, "d2", 90, "U")]
    src = str(tmp_path / "jsrc")
    _os.makedirs(src)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/b{i}.parquet"
        )
        _time.sleep(0.05)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    jpath = str(tmp_path / "journal")
    q = cdc_stream.start_journal_stream(
        stream, journal_path=jpath,
        checkpoint_dir=str(tmp_path / "jckpt"), available_now=True,
    )
    assert q.awaitTermination(120)
    q.stop()

    streamed = spark.read.parquet(jpath).drop("_batch_id")
    in_mem = spark.createDataFrame(b1 + b2, schema)
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, val string, seq long",
    )
    canon = lambda df: sorted(
        (r["k"], r["val"], r["seq"]) for r in df.collect()
    )
    for cut in (39, 40, 70, 90):
        got = cdc.snapshot_as_of(
            base, streamed, key_cols=["k"], seq_col="seq", as_of=cut
        )
        want = cdc.snapshot_as_of(
            base, in_mem, key_cols=["k"], seq_col="seq", as_of=cut
        )
        assert canon(got) == canon(want), cut
    # SCD2 over the streamed journal matches too
    c2 = lambda df: sorted(map(tuple, df.select(
        "k", "seq", "valid_to", "is_current").collect()))
    assert c2(cdc.scd2_intervals(streamed, key_cols=["k"], seq_col="seq")) \
        == c2(cdc.scd2_intervals(in_mem, key_cols=["k"], seq_col="seq"))


def test_containment_sketch_maintenance_stream_matches_batch(spark, tmp_path):
    """mode='sketch': the maintainer keeps the BANDED estimator's pair
    table crawl-fresh — served table ≡ fresh containment_sketch_pairs
    over the final corpus — and the sketch identity stamps refuse a
    fold/load under different sketch parameters or the exact family's
    loader (no _mode stamp expected there → missing-stamp refusal in
    the other direction)."""
    import os as _os
    import time as _time

    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import dedup
    from database_activity_monitoring_dam_system_spark.streaming import (
        pair_maintenance,
    )

    core = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b1 = [
        (1, core, "U", 1), (2, "hdr " + core + " ftr one two", "U", 2),
        (3, "lorem ipsum dolor sit amet consectetur", "U", 3),
        (5, "x1 " + core + " x2 x3", "U", 4),
    ]
    b2 = [
        (5, None, "D", 5),
        (3, "changed words entirely now", "U", 6),
        (6, "pre " + core + " post five six", "U", 7),
    ]
    schema = "doc_id long, text string, op string, seq long"
    src = str(tmp_path / "csrc")
    _os.makedirs(src)
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/b{i}.parquet"
        )
        _time.sleep(0.05)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    pairs_path = str(tmp_path / "pairs")
    corpus_path = str(tmp_path / "corpus")
    t, sh, k, fam = 0.8, 1, 8, "md5"
    q = pair_maintenance.start_containment_maintenance_stream(
        stream,
        pairs_path=pairs_path,
        corpus_path=corpus_path,
        checkpoint_dir=str(tmp_path / "cckpt"),
        threshold=t, shingle=sh,
        op_col="op", seq_col="seq",
        available_now=True,
        mode="sketch", k=k, hash_family=fam,
    )
    assert q.awaitTermination(180)
    q.stop()

    stamps = {"_mode": "sketch", "_k": k, "_hash_family": fam, "_max_df": -1}
    final_corpus = spark.read.parquet(corpus_path)
    served = dedup.load_containment_pairs(
        spark, pairs_path, threshold=t, shingle=sh,
        corpus_digest=dedup.corpus_digest(final_corpus),
        extra_stamps=stamps,
    )
    fresh = dedup.containment_sketch_pairs(
        final_corpus, threshold=t, shingle=sh, k=k, hash_family=fam
    )
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(served) == canon(fresh)
    got = {(r["doc_a"], r["doc_b"]) for r in served.collect()}
    assert (1, 6) in got and not any(5 in p for p in got)

    # refusal: different sketch k
    with _pytest.raises(ValueError, match="_k"):
        dedup.load_containment_pairs(
            spark, pairs_path, threshold=t, shingle=sh,
            extra_stamps={**stamps, "_k": 16},
        )
    # refusal: unknown mode rejected up front
    with _pytest.raises(ValueError, match="unknown mode"):
        pair_maintenance.start_containment_maintenance_stream(
            stream, pairs_path=pairs_path, corpus_path=corpus_path,
            checkpoint_dir=str(tmp_path / "x"), mode="approx",
        )


def test_ivf_pq_res_stream_matches_batch(spark, tmp_path):
    """Streaming residual-IVF-PQ serving ≡ the batch operator: queries
    arriving over two micro-batches against a persisted stamped code
    table return exactly ivf_pq_topk_residual's answers, and a code
    table stamped under DIFFERENT codebooks refuses at stream start,
    not per batch."""
    import pytest as _pytest

    from database_activity_monitoring_dam_system_spark.operators import similarity
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        load_table,
    )
    from database_activity_monitoring_dam_system_spark.streaming import (
        ann_serving,
    )

    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = similarity.ivf_centroids(emb, n_centroids=8, refine_iters=1)
    books = similarity.pq_train_residual(
        emb, cents, m=4, ksub=8, iters=1, dim=64
    )
    codes_path = str(tmp_path / "codes")
    similarity.stamp_index(
        similarity.ivf_pq_encode_residual(
            emb, centroids=cents, codebooks=books, dim=64
        ),
        codebooks=books, centroids=cents,
    ).write.parquet(codes_path)
    codes = spark.read.parquet(codes_path)

    qdir = tmp_path / "queries"
    qdir.mkdir()
    q_all = emb.filter(F.col("vec_id").isin([0, 1, 2, 3])).toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq_

    for i, ids in enumerate([[0, 1], [2, 3]]):
        part = q_all[q_all.vec_id.isin(ids)]
        pq_.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            str(qdir / f"q{i}.parquet"),
        )

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qdir))
    )
    q = ann_serving.start_ivf_pq_res_stream(
        stream,
        codes,
        cents,
        books,
        out_path=str(tmp_path / "results"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=5, n_probe=3,
        available_now=True,
    )
    q.awaitTermination(120)

    got = (
        spark.read.parquet(str(tmp_path / "results"))
        .select("query_id", "neighbor_id", "rank", "adc_dist")
        .collect()
    )
    want = similarity.ivf_pq_topk_residual(
        emb, [0, 1, 2, 3], k=5, n_probe=3, dim=64,
        centroids=cents, codebooks=books, encoded=codes,
        n_centroids=8,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == 20  # 4 queries × k

    wrong_books = similarity.pq_train(emb, m=4, ksub=8, iters=1, dim=64)
    with _pytest.raises(ValueError, match="different codebooks"):
        ann_serving.start_ivf_pq_res_stream(
            stream, codes, cents, wrong_books,
            out_path=str(tmp_path / "r2"),
            checkpoint_dir=str(tmp_path / "c2"),
        )
