"""Lakehouse-maintenance and search query family: mergeable quantile
rollups, timeline densification, inverted-index build / conjunctive
search / BM25 ranking, CDC merge-upsert, Z-order clustering keys, and
event-transition matrices.

These extend the continuous-aggregate / table-maintenance surface
(operators/rollup.py, streaming/rollup_stream.py, operators/cdc.py,
operators/zorder.py, operators/invindex.py) with full DuckDB oracles.
No reference analogue — the reference recomputes dashboards from raw
MySQL tables per request (/root/reference/app.py:1090-1105) and has no
index/upsert maintenance story; this family is the 100 TB upgrade of
that pattern.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cdc, invindex, journeys, rollup, validate, zorder
from ..sources.testdata import load_table
from .spec import QuerySpec
from ..ckpt import register as _ckpt_register

# shared histogram geometry for the quantile gates: events.value sits
# in [0, ~500); 200 bins over [0, 500) = 2.5-unit resolution
_Q_LO, _Q_HI, _Q_BINS = 0.0, 500.0, 200
_Q_LO_M, _Q_SPAN = int(_Q_LO * 1000), int(_Q_HI * 1000) - int(_Q_LO * 1000)


def _q_rollup_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile rollup: minute-grain fixed-bin histogram
    partials merge to day-grain p50/p90/p99 without re-touching raw
    events. The oracle histograms raw events DIRECTLY at day grain,
    so the hash pins the merge law (bin counts are sums; the grid and
    all thresholds are integer-exact)."""
    events = load_table(spark, sf_dir, "events")
    kw = dict(group_cols=["event_type"], lo=_Q_LO, hi=_Q_HI, bins=_Q_BINS)
    minute = rollup.value_quantile_partials(events, grain="minute", **kw)
    day = rollup.rollup_quantiles(
        minute, to_grain="day", percents=(50, 90, 99), **kw
    )
    return day.select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("time_bucket"),
        "event_type",
        "n_values",
        "p50_value",
        "p90_value",
        "p99_value",
    )


_ROLLUP_QUANTILES_SQL = f"""
WITH m AS (
  SELECT date_trunc('day', ts) AS b, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS millis
  FROM events
),
h AS (
  SELECT b, event_type,
         least({_Q_BINS - 1}, greatest(0,
           (millis - {_Q_LO_M}) * {_Q_BINS} // {_Q_SPAN})) AS bin,
         count(*)::BIGINT AS n
  FROM m WHERE millis IS NOT NULL GROUP BY 1, 2, 3
),
c AS (
  SELECT b, event_type, bin,
         CAST(sum(n) OVER (PARTITION BY b, event_type
                           ORDER BY bin) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY b, event_type) AS BIGINT) AS total
  FROM h
),
q AS (
  SELECT b, event_type,
         CAST(max(total) AS BIGINT) AS n_values,
         min(CASE WHEN cum >= (total * 50 + 99) // 100 THEN bin END) AS b50,
         min(CASE WHEN cum >= (total * 90 + 99) // 100 THEN bin END) AS b90,
         min(CASE WHEN cum >= (total * 99 + 99) // 100 THEN bin END) AS b99
  FROM c GROUP BY 1, 2
)
SELECT strftime(b, '%Y-%m-%d') AS time_bucket, event_type, n_values,
       round(({_Q_LO_M} + b50 * {_Q_SPAN} // {_Q_BINS}) / 1000.0, 3)
         AS p50_value,
       round(({_Q_LO_M} + b90 * {_Q_SPAN} // {_Q_BINS}) / 1000.0, 3)
         AS p90_value,
       round(({_Q_LO_M} + b99 * {_Q_SPAN} // {_Q_BINS}) / 1000.0, 3)
         AS p99_value
FROM q
"""


def _q_rollup_quantiles_interp(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interpolated quantile serving over the SAME minute partials as
    `rollup_value_quantiles`: weighted-multiset linear interpolation
    between bin edges — |estimate − true quantile| ≤ one bin width,
    vs the grid estimator's one-sided lower edge. Rank math is
    integer-exact (div/mod — no float floor), the single float
    interpolation expression is written with identical text in the
    oracle, so even the interpolated path is a full hash gate."""
    events = load_table(spark, sf_dir, "events")
    kw = dict(group_cols=["event_type"], lo=_Q_LO, hi=_Q_HI, bins=_Q_BINS)
    minute = rollup.value_quantile_partials(events, grain="minute", **kw)
    day = rollup.rollup_quantiles_interp(
        minute, to_grain="day", percents=(50, 90, 99), **kw
    )
    return day.select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("time_bucket"),
        "event_type",
        "n_values",
        "p50_interp",
        "p90_interp",
        "p99_interp",
    )


def _interp_expr(p: int) -> str:
    """One percentile's oracle-side interpolation — generated so the
    expression TEXT cannot drift from the Spark side's (the
    bm25_sql_expr discipline): edge(bl) + (edge(bh) − edge(bl)) ·
    frac/100, all-double with CAST-pinned literals."""
    vl = f"({_Q_LO_M} + bl{p} * {_Q_SPAN} // {_Q_BINS})"
    vh = f"({_Q_LO_M} + bh{p} * {_Q_SPAN} // {_Q_BINS})"
    return (
        f"round((CAST({vl} AS DOUBLE) + CAST({vh} - {vl} AS DOUBLE)"
        f" * CAST(f{p} AS DOUBLE) / CAST(100 AS DOUBLE))"
        f" / CAST(1000 AS DOUBLE), 6) AS p{p}_interp"
    )


_INTERP_RANKS = ",\n         ".join(
    f"min(CASE WHEN cum >= (((total - 1) * {p}) // 100) + 1 "
    f"THEN bin END) AS bl{p}, "
    f"min(CASE WHEN cum >= (((total - 1) * {p} + 99) // 100) + 1 "
    f"THEN bin END) AS bh{p}, "
    f"CAST(max(((total - 1) * {p}) % 100) AS BIGINT) AS f{p}"
    for p in (50, 90, 99)
)
_INTERP_OUTS = ",\n       ".join(_interp_expr(p) for p in (50, 90, 99))

_INTERP_QUANTILES_SQL = f"""
WITH m AS (
  SELECT date_trunc('day', ts) AS b, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS millis
  FROM events
),
h AS (
  SELECT b, event_type,
         least({_Q_BINS - 1}, greatest(0,
           (millis - {_Q_LO_M}) * {_Q_BINS} // {_Q_SPAN})) AS bin,
         count(*)::BIGINT AS n
  FROM m WHERE millis IS NOT NULL GROUP BY 1, 2, 3
),
c AS (
  SELECT b, event_type, bin,
         CAST(sum(n) OVER (PARTITION BY b, event_type
                           ORDER BY bin) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY b, event_type) AS BIGINT) AS total
  FROM h
),
q AS (
  SELECT b, event_type,
         CAST(max(total) AS BIGINT) AS n_values,
         {_INTERP_RANKS}
  FROM c GROUP BY 1, 2
)
SELECT strftime(b, '%Y-%m-%d') AS time_bucket, event_type, n_values,
       {_INTERP_OUTS}
FROM q
"""


def _q_quantiles_gk_timeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The no-partials quantile path: Greenwald-Khanna sketches
    (percentile_approx) straight over raw events at day grain —
    rank-bounded error at O(accuracy) state per group, no maintained
    state. Engine-internal sketch ⇒ rows-only oracle; the rank bound
    itself is test-asserted against the exact percentiles."""
    events = load_table(spark, sf_dir, "events")
    out = rollup.quantiles_gk(
        events,
        grain="day",
        group_cols=["event_type"],
        percents=(50, 90, 99),
        accuracy=10_000,
    )
    return out.select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("time_bucket"),
        "event_type",
        "n_values",
        "p50_gk",
        "p90_gk",
        "p99_gk",
    )


def _q_rollup_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/stddev served from mergeable moment partials: minute
    (n, Σx, Σx²) state folded to day — the third rollup state family
    (moments) beside histogram bins and HLL registers. The oracle
    recomputes the moments directly at day grain, so the hash pins
    the fold law AND the fixed float expressions (incl. the
    DECIMAL→DOUBLE rounding of Σx², identical in both engines)."""
    events = load_table(spark, sf_dir, "events")
    minute = rollup.variance_partials(
        events, grain="minute", group_cols=["event_type"]
    )
    day = rollup.rollup_variance(
        minute, to_grain="day", group_cols=["event_type"]
    )
    return day.select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("time_bucket"),
        "event_type",
        "n_values",
        "mean_value",
        "std_value",
    )


_ROLLUP_VARIANCE_SQL = """
WITH m AS (
  SELECT date_trunc('day', ts) AS b, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS mm
  FROM events
),
g AS (
  SELECT b, event_type, count(*)::BIGINT AS n_values,
         CAST(sum(mm) AS BIGINT) AS sum_millis,
         sum(CAST(mm AS HUGEINT) * mm) AS sq
  FROM m WHERE mm IS NOT NULL GROUP BY 1, 2
)
SELECT strftime(b, '%Y-%m-%d') AS time_bucket, event_type, n_values,
       round(CAST(sum_millis AS DOUBLE) / CAST(n_values AS DOUBLE)
             / CAST(1000 AS DOUBLE), 6) AS mean_value,
       round(sqrt(greatest(CAST(0 AS DOUBLE),
               CAST(sq AS DOUBLE) / CAST(n_values AS DOUBLE)
               - (CAST(sum_millis AS DOUBLE) / CAST(n_values AS DOUBLE))
               * (CAST(sum_millis AS DOUBLE) / CAST(n_values AS DOUBLE))))
             / CAST(1000 AS DOUBLE), 6) AS std_value
FROM g
"""


def _q_gapfill_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified hourly timeline: every hour between each event
    type's first and last bucket, zero-filled with an is_gap flag —
    the moving-average-safe dashboard feed. Composes AFTER the
    rollup reduction (grid explode + left join over partials-sized
    frames only)."""
    events = load_table(spark, sf_dir, "events")
    hour = rollup.time_partials(
        events, grain="hour", group_cols=["event_type"]
    ).select("bucket_ts", "event_type", "n_events", "sum_millis")
    filled = rollup.gapfill_buckets(
        hour, grain="hour", group_cols=["event_type"]
    )
    return filled.select(
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm").alias("time_bucket"),
        "event_type",
        "n_events",
        "sum_millis",
        "is_gap",
    )


# the densification CTE prefix both gapfill-family oracles share —
# one definition, no hand-synced copies (the checksum_token_sql /
# morton_terms discipline)
_GAPFILL_CTES = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS b, event_type,
         count(*)::BIGINT AS n_events,
         CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
           AS sum_millis
  FROM events GROUP BY 1, 2
),
s AS (SELECT event_type, min(b) AS b0, max(b) AS b1 FROM h GROUP BY 1),
g AS (
  SELECT event_type,
         unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS b
  FROM s
)
"""

_GAPFILL_SQL = f"""
{_GAPFILL_CTES}
SELECT strftime(g.b, '%Y-%m-%d %H:%M') AS time_bucket, g.event_type,
       coalesce(h.n_events, 0)::BIGINT AS n_events,
       coalesce(h.sum_millis, 0)::BIGINT AS sum_millis,
       (h.n_events IS NULL) AS is_gap
FROM g LEFT JOIN h ON h.b = g.b AND h.event_type = g.event_type
"""


_SEARCH_TERMS = ("dup", "merge", "spark")  # 'dup' df ≈ 5% → selective


def _q_timeline_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-bucket moving average over the GAP-FILLED hourly
    timeline — the composition gap filling exists for: a ROWS-frame
    window over a sparse timeline silently averages over whatever
    buckets happen to exist (3 'adjacent' rows can span days); over
    the densified grid the frame is exactly 3 hours. Counts stay
    integers until one rounded division."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hour = rollup.time_partials(
        events, grain="hour", group_cols=["event_type"]
    ).select("bucket_ts", "event_type", "n_events")
    filled = rollup.gapfill_buckets(
        hour, grain="hour", group_cols=["event_type"]
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-2, 0)
    )
    return filled.select(
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm").alias(
            "time_bucket"
        ),
        "event_type",
        "n_events",
        F.sum("n_events").over(w).alias("window_sum"),
        F.count("*").over(w).alias("window_n"),
        F.round(
            F.sum("n_events").over(w) / F.count("*").over(w), 6
        ).alias("moving_avg"),
    )


_MOVING_AVG_SQL = f"""
{_GAPFILL_CTES.rstrip()},
f AS (
  SELECT g.b, g.event_type,
         coalesce(h.n_events, 0)::BIGINT AS n_events
  FROM g LEFT JOIN h ON h.b = g.b AND h.event_type = g.event_type
)
SELECT strftime(b, '%Y-%m-%d %H:%M') AS time_bucket, event_type,
       n_events,
       CAST(sum(n_events) OVER w AS BIGINT) AS window_sum,
       CAST(count(*) OVER w AS BIGINT) AS window_n,
       round(CAST(sum(n_events) OVER w AS BIGINT)
             / CAST(count(*) OVER w AS BIGINT), 6) AS moving_avg
FROM f
WINDOW w AS (PARTITION BY event_type ORDER BY b
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def _q_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token → document frequency + md5 of the
    sorted posting list (the md5 pins every id and its order without
    hashing megabyte-long CSV columns through the driver). min_df=2
    exercises the df-bounds pruning."""
    docs = load_table(spark, sf_dir, "documents")
    postings = invindex.build_postings(docs, min_df=2)
    return postings.select(
        "token",
        "df",
        F.md5(
            F.array_join(
                F.transform("postings", lambda x: x.cast("string")), ","
            )
        ).alias("postings_md5"),
    )


_POSTINGS_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(token)
  WHERE t.token != ''
),
p AS (
  SELECT token, count(*)::BIGINT AS df,
         md5(array_to_string(list_sort(list(doc_id)), ',')) AS postings_md5
  FROM toks GROUP BY token
)
SELECT token, df, postings_md5 FROM p WHERE df >= 2
"""


def synth_old_snapshot(docs: DataFrame) -> DataFrame:
    """The ONE synthesized old-corpus snapshot every incremental-
    maintenance gate folds forward from, exercising all change
    classes against the real corpus: docs ≡ 3 mod 10 absent (they
    become 'added'), docs ≡ 7 mod 10 carrying an extra token
    ('changed' — the token must vanish from merged artifacts), and
    ephemeral high-id rows not in the real corpus ('removed').
    Shared (incremental_postings, incremental_minhash_bands) so the
    two gates cannot drift to different delta-coverage stories."""
    return (
        docs.filter(F.col("doc_id") % 10 != 3)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 7,
                F.concat(F.col("text"), F.lit(" vanishingtoken")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 1).select(
                (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                F.concat(
                    F.lit("ephemeral snapshot rows "), F.col("text")
                ).alias("text"),
            )
        )
    )


def shared_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE crawl-diff verdict table every incremental-maintenance
    gate folds from: corpus_diff(synth_old_snapshot(docs), docs)
    restricted to non-unchanged ids. A crawl pipeline diffs the
    snapshot once and feeds every artifact maintainer; under serving
    mode this is a _shared materialized view (delta-bounded — ~30 %
    of ids by the snapshot's construction), cold runs recompute it
    per gate exactly as before."""
    from ..operators.dedup import corpus_diff
    from .dam import _shared

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = synth_old_snapshot(docs)
    return _shared(
        "snapshot_diff_verdicts", spark, sf_dir,
        lambda: corpus_diff(old, docs, normalize=False)
        .filter(F.col("verdict") != "unchanged")
        .select("doc_id", "verdict"),
    )


def _q_incremental_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance ≡ fresh rebuild, md5-pinned: an
    OLD corpus snapshot is synthesized with every change class —
    docs ≡ 3 mod 10 absent (added), docs ≡ 7 mod 10 carrying an
    extra token (changed: the token must vanish from the merged
    index), and ephemeral high-id rows not in the real corpus
    (removed). The index built over that snapshot is folded forward
    with update_postings; the oracle builds the NEW corpus's index
    from scratch — matching hashes prove the delta surgery
    (array_except / append / empty-drop / new-token insert) is
    lossless."""
    from .dam import _shared

    docs = load_table(spark, sf_dir, "documents")
    old = synth_old_snapshot(docs)
    # the OLD posting table is the maintained artifact (save_postings
    # is its disk form); serving mode builds it once per corpus
    # snapshot, cold/correctness runs rebuild it inline
    base_idx = _shared(
        "postings_old_index", spark, sf_dir,
        lambda: invindex.build_postings(old),
    )
    merged = invindex.update_postings(
        base_idx, old, docs,
        diff=(
            shared_snapshot_diff(spark, sf_dir)
            if os.environ.get("SPARK_DAM_SHARE_FRAMES") == "1"
            else None
        ),
    )
    return merged.select(
        "token",
        "df",
        F.md5(
            F.array_join(
                F.transform("postings", lambda x: x.cast("string")), ","
            )
        ).alias("postings_md5"),
    )


# fresh build over the new corpus — incremental must be identical
_INCR_POSTINGS_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(token)
  WHERE t.token != ''
)
SELECT token, count(*)::BIGINT AS df,
       md5(array_to_string(list_sort(list(doc_id)), ',')) AS postings_md5
FROM toks GROUP BY token
"""


def _q_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive search answered from the index alone: build the
    posting table once, look up the three query tokens, intersect by
    count — the corpus is never re-scanned at query time. The oracle
    recomputes containment per doc, so the hash proves the index
    path ≡ the brute-force scan it replaces."""
    docs = load_table(spark, sf_dir, "documents")
    postings = invindex.build_postings(docs)
    return invindex.search_all_terms(postings, list(_SEARCH_TERMS))


_INDEX_SEARCH_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(token)
  WHERE t.token != ''
)
SELECT doc_id FROM toks
WHERE token IN {_SEARCH_TERMS!r}
GROUP BY doc_id HAVING count(*) = {len(_SEARCH_TERMS)}
"""


def _q_search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context snippets for the conjunctive hits: first-
    occurrence position + 40-char window per (hit, term) — the
    results-page rendering pass, index-bounded (hits × terms rows,
    never the corpus). Integer position math, substring windows —
    byte-exact oracle."""
    docs = load_table(spark, sf_dir, "documents")
    postings = invindex.build_postings(docs)
    snips = invindex.search_snippets(
        docs, postings, list(_SEARCH_TERMS), width=40
    )
    return snips.select(
        "doc_id", "term", F.col("pos").cast("int").alias("pos"),
        "snippet",
    )


_SNIPPETS_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(token)
  WHERE t.token != ''
),
hits AS (
  SELECT doc_id FROM toks
  WHERE token IN {_SEARCH_TERMS!r}
  GROUP BY doc_id HAVING count(*) = {len(_SEARCH_TERMS)}
),
d AS (
  SELECT documents.doc_id, lower(text) AS lt
  FROM documents JOIN hits ON documents.doc_id = hits.doc_id
)
SELECT doc_id, t.term,
       strpos(lt, t.term)::INTEGER AS pos,
       substr(lt, greatest(strpos(lt, t.term) - 20, 1), 40) AS snippet
FROM d, (VALUES {", ".join(f"('{t}')" for t in sorted(_SEARCH_TERMS))})
       AS t(term)
"""


def _q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-upsert parity: a per-user snapshot (latest EVEN event)
    has a changelog of every ODD event applied (ids ending in 5 are
    deletes). Stale changes — odd seq below the snapshot's — must
    lose, fresh ones win, fresh deletes remove: the oracle arbitrates
    the same full-outer way, so the hash pins the whole merge
    (winner choice, stale guard, delete semantics, insert-of-new-key)
    bit-for-bit."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("millis"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    base = (
        e.filter(F.col("event_id") % 2 == 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id", "event_type", "millis",
            F.col("event_id").alias("seq"),
        )
    )
    changes = e.filter(F.col("event_id") % 2 == 1).select(
        "user_id",
        "event_type",
        "millis",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_id") % 10 == 5, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    return cdc.apply_changes(
        base, changes, key_cols=["user_id"], seq_col="seq"
    )


_CDC_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS millis
  FROM events
),
base AS (
  SELECT user_id, event_type, millis, event_id AS seq FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY event_id DESC) AS rn
    FROM e WHERE event_id % 2 = 0
  ) WHERE rn = 1
),
chg AS (
  SELECT user_id, event_type, millis, event_id AS seq,
         CASE WHEN event_id % 10 = 5 THEN 'D' ELSE 'U' END AS op
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY event_id DESC) AS rn
    FROM e WHERE event_id % 2 = 1
  ) WHERE rn = 1
),
arb AS (
  SELECT coalesce(b.user_id, c.user_id) AS user_id,
         (c.seq IS NOT NULL AND (b.seq IS NULL OR c.seq > b.seq))
           AS chg_wins,
         b.event_type AS b_et, b.millis AS b_m, b.seq AS b_s,
         c.event_type AS c_et, c.millis AS c_m, c.seq AS c_s, c.op
  FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
)
SELECT user_id,
       CASE WHEN chg_wins THEN c_et ELSE b_et END AS event_type,
       CASE WHEN chg_wins THEN c_m ELSE b_m END AS millis,
       CASE WHEN chg_wins THEN c_s ELSE b_s END AS seq
FROM arb
WHERE NOT (chg_wins AND op = 'D')
"""


def _q_cdc_tombstone_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The out-of-order replay the bare seq guard cannot survive,
    fixed by the delete journal: a delete batch (every user_id ≡ 3
    mod 7, sequenced above the whole changelog) is applied and its
    tombstones extracted; then a STALE changelog segment (the odd
    events, pre-delete sequences) is redelivered. Without the journal
    every stale update would re-insert its dead key; with it the keys
    stay dead — except users ≡ 3 mod 14, whose redelivered changes
    are sequenced ABOVE the tombstone and legitimately resurrect
    (the one path a journal must NOT block). The oracle recomputes
    delete, journal arbitration, and merge relationally, so the hash
    pins both the stays-dead and the resurrection semantics."""
    import datetime as dtm

    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("millis"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    # checkpointed: the snapshot feeds the delete batch, the delete
    # fold AND (via both) the final merge — without it each consumer
    # re-runs the events scan + snapshot window (the before-plan
    # carried 40 scans of the events table)
    base = (
        e.filter(F.col("event_id") % 2 == 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id", "event_type", "millis",
            F.col("event_id").alias("seq"),
        )
        .localCheckpoint(eager=False).transform(_ckpt_register)
    )
    # sequence offsets DERIVE from the data's own max event id — a
    # fixed constant stops dominating event_id at some scale factor
    # and the delete would silently start LOSING in the engine while
    # the oracle still drops the row (caught in review at the sf10
    # horizon). Tombstones sit at 2·mx + uid; a resurrection seq adds
    # event_id on top, beating its own tombstone by ≥ 1 at any scale.
    mx = int(e.agg(F.max("event_id")).first()[0])
    dels = base.filter(F.col("user_id") % 7 == 3).select(
        "user_id",
        "event_type",
        "millis",
        (F.col("user_id") + F.lit(2 * mx)).alias("seq"),
        F.lit("D").alias("op"),
    ).localCheckpoint(eager=False).transform(_ckpt_register)  # delete fold + tombstone extract
    base2 = cdc.apply_changes(
        base, dels, key_cols=["user_id"], seq_col="seq"
    )
    journal = cdc.extract_tombstones(
        dels,
        key_cols=["user_id"],
        seq_col="seq",
        deleted_at=dtm.datetime(2024, 1, 1, tzinfo=dtm.timezone.utc),
    )
    stale = e.filter(F.col("event_id") % 2 == 1).select(
        "user_id",
        "event_type",
        "millis",
        F.when(
            F.col("user_id") % 14 == 3,
            F.col("event_id") + F.col("user_id") + F.lit(2 * mx),
        )
        .otherwise(F.col("event_id"))
        .alias("seq"),
        F.when(F.col("event_id") % 10 == 5, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    return cdc.apply_changes(
        base2,
        stale,
        key_cols=["user_id"],
        seq_col="seq",
        tombstones=journal,
    )


_CDC_TOMBSTONE_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS millis
  FROM events
),
base AS (
  SELECT user_id, event_type, millis, event_id AS seq FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY event_id DESC) AS rn
    FROM e WHERE event_id % 2 = 0
  ) WHERE rn = 1
),
mxe AS (
  SELECT max(event_id) AS mx FROM e
),
dels AS (
  SELECT user_id, (2 * (SELECT mx FROM mxe)) + user_id AS tomb_seq
  FROM base WHERE user_id % 7 = 3
),
base2 AS (
  SELECT * FROM base WHERE user_id % 7 != 3
),
chg AS (
  SELECT user_id, event_type, millis,
         CASE WHEN user_id % 14 = 3
              THEN event_id + user_id + (2 * (SELECT mx FROM mxe))
              ELSE event_id END AS seq,
         CASE WHEN event_id % 10 = 5 THEN 'D' ELSE 'U' END AS op
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY event_id DESC) AS rn
    FROM e WHERE event_id % 2 = 1
  ) WHERE rn = 1
),
chg2 AS (
  SELECT c.* FROM chg c LEFT JOIN dels d ON c.user_id = d.user_id
  WHERE d.user_id IS NULL OR c.seq > d.tomb_seq
),
arb AS (
  SELECT coalesce(b.user_id, c.user_id) AS user_id,
         (c.seq IS NOT NULL AND (b.seq IS NULL OR c.seq > b.seq))
           AS chg_wins,
         b.event_type AS b_et, b.millis AS b_m, b.seq AS b_s,
         c.event_type AS c_et, c.millis AS c_m, c.seq AS c_s, c.op
  FROM base2 b FULL OUTER JOIN chg2 c ON b.user_id = c.user_id
)
SELECT user_id,
       CASE WHEN chg_wins THEN c_et ELSE b_et END AS event_type,
       CASE WHEN chg_wins THEN c_m ELSE b_m END AS millis,
       CASE WHEN chg_wins THEN c_s ELSE b_s END AS seq
FROM arb
WHERE NOT (chg_wins AND op = 'D')
"""


def _q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel parity: the cdc_apply scenario replayed only UP TO
    a mid-journal cut (60% of the max event id, data-derived so the
    cut scales with the corpus) — changes after the cut, including
    deletes, must be invisible; changes at or before it arbitrate
    exactly as the live merge would. The oracle recomputes the slice
    + arbitration relationally, so the hash pins the inclusive cut
    AND the replay semantics together."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("millis"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    base = (
        e.filter(F.col("event_id") % 2 == 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id", "event_type", "millis",
            F.col("event_id").alias("seq"),
        )
    )
    changes = e.filter(F.col("event_id") % 2 == 1).select(
        "user_id",
        "event_type",
        "millis",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_id") % 10 == 5, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    mx = int(e.agg(F.max("event_id")).first()[0])
    cut = (3 * mx) // 5
    return cdc.snapshot_as_of(
        base, changes, key_cols=["user_id"], seq_col="seq", as_of=cut
    )


_TIME_TRAVEL_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS millis
  FROM events
),
base AS (
  SELECT user_id, event_type, millis, event_id AS seq FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY event_id DESC) AS rn
    FROM e WHERE event_id % 2 = 0
  ) WHERE rn = 1
),
cut AS (
  SELECT (3 * max(event_id)) // 5 AS c FROM e
),
chg AS (
  SELECT user_id, event_type, millis, event_id AS seq,
         CASE WHEN event_id % 10 = 5 THEN 'D' ELSE 'U' END AS op
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY event_id DESC) AS rn
    FROM e
    WHERE event_id % 2 = 1 AND event_id <= (SELECT c FROM cut)
  ) WHERE rn = 1
),
arb AS (
  SELECT coalesce(b.user_id, c.user_id) AS user_id,
         (c.seq IS NOT NULL AND (b.seq IS NULL OR c.seq > b.seq))
           AS chg_wins,
         b.event_type AS b_et, b.millis AS b_m, b.seq AS b_s,
         c.event_type AS c_et, c.millis AS c_m, c.seq AS c_s, c.op
  FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
)
SELECT user_id,
       CASE WHEN chg_wins THEN c_et ELSE b_et END AS event_type,
       CASE WHEN chg_wins THEN c_m ELSE b_m END AS millis,
       CASE WHEN chg_wins THEN c_s ELSE b_s END AS seq
FROM arb
WHERE NOT (chg_wins AND op = 'D')
"""


def _q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 parity: the odd-event changelog rendered as
    validity intervals — valid_from = each change's own sequence,
    valid_to = the key's NEXT change (deletes close the preceding
    interval, then drop out; NULL valid_to = current). The oracle
    recomputes the lead over all changes including deletes, so the
    hash pins the delete-closes-interval rule, not just the happy
    path."""
    events = load_table(spark, sf_dir, "events")
    changes = events.select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("millis"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_id") % 10 == 5, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    ).filter(F.col("seq") % 2 == 1)
    return cdc.scd2_intervals(
        changes, key_cols=["user_id"], seq_col="seq"
    ).select(
        "user_id",
        F.col("seq").alias("valid_from"),
        "valid_to",
        "is_current",
        "event_type",
        "millis",
    )


_SCD2_SQL = """
WITH chg AS (
  SELECT user_id, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS millis,
         event_id AS seq,
         CASE WHEN event_id % 10 = 5 THEN 'D' ELSE 'U' END AS op
  FROM events WHERE event_id % 2 = 1
)
SELECT user_id, seq AS valid_from, valid_to,
       (valid_to IS NULL) AS is_current, event_type, millis
FROM (
  SELECT user_id, event_type, millis, seq, op,
         lead(seq) OVER (PARTITION BY user_id ORDER BY seq)
           AS valid_to
  FROM chg
)
WHERE op != 'D'
"""


def _q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table digest over the events rows (exact
    integer projection — doubles and timestamps stringify
    engine-specifically, so the value column enters as exact millis).
    The oracle computes the digest from scratch: matching hashes
    prove the whole (row hash, 48-bit parse, commutative reduce)
    chain."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("millis"),
    )
    return validate.table_checksum(e)


# token text generated by the implementation's own twin — the oracle
# can't drift from table_checksum's encoding (sorted column order!)
_CHECKSUM_TOKENS = ",\n           ".join(
    validate.checksum_token_sql(c)
    for c in (
        "event_id::VARCHAR",
        "event_type",
        "millis::VARCHAR",
        "user_id::VARCHAR",
    )
)

_CHECKSUM_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS millis
  FROM events
),
h AS (
  SELECT ('0x' || substr(md5(concat_ws('|',
           {_CHECKSUM_TOKENS})), 1, 12))::BIGINT AS hh
  FROM e
)
SELECT count(*)::BIGINT AS n_rows,
       CAST(CAST(sum(hh) AS DECIMAL(38,0)) AS VARCHAR) AS sum_h48,
       max(hh) AS max_h48
FROM h
"""


def _q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions between consecutive events per
    user: one user-key window shuffle, bounded types² rollup, one
    rounded division — the journey-analytics matrix."""
    events = load_table(spark, sf_dir, "events")
    return journeys.transition_counts(events)


_TRANSITIONS_SQL = """
WITH p AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       CAST(sum(n_transitions) OVER (PARTITION BY from_type)
            AS BIGINT) AS from_total,
       round(n_transitions /
             CAST(sum(n_transitions) OVER (PARTITION BY from_type)
                  AS BIGINT), 6) AS probability
FROM c
"""


def _q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance ranking over the query terms (disjunctive
    candidates). Every score input is an exact integer and the
    per-term expressions sum in fixed term order, so the hash pins
    the full ranking math — idf, length norm, saturation — across
    engines."""
    docs = load_table(spark, sf_dir, "documents")
    return invindex.bm25_scores(docs, list(_SEARCH_TERMS))


def _q_bm25_artifact_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The artifact-SERVED BM25 ranking: build the doc-keyed stats
    table (doc_id, dl, tf map — the persistable forward index) and
    score from it alone, never re-touching corpus text. Shares
    _bm25_score_parts with bm25_scores, so this gate pins that the
    serving artifact reproduces the from-corpus ranking hash-exactly
    against the SQL oracle — the incremental-refresh path
    (update_bm25_artifact) folds deltas into the same table."""
    from .dam import _shared

    docs = load_table(spark, sf_dir, "documents")
    # the stats table IS the serving artifact (save_bm25_stats is its
    # disk form): serving mode materializes it once per corpus
    # snapshot and every query scores from the persisted frame;
    # cold/correctness runs rebuild it inline
    stats = _shared(
        "bm25_stats", spark, sf_dir,
        lambda: invindex.build_bm25_stats(docs),
    )
    return invindex.bm25_from_stats(
        stats, list(_SEARCH_TERMS), n_docs=docs.count()
    )


def _bm25_oracle() -> str:
    terms = _SEARCH_TERMS
    df_cols = ",\n         ".join(
        f"count(DISTINCT CASE WHEN token = '{t}' THEN doc_id END)"
        f"::BIGINT AS df_{i}"
        for i, t in enumerate(terms)
    )
    tf_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN token = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS _tf_{i}"
        for i, t in enumerate(terms)
    )
    any_term = " + ".join(f"_tf_{i}" for i in range(len(terms)))
    return f"""
WITH toks AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(token)
  WHERE t.token != ''
),
consts AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
         count(*)::BIGINT AS sum_dl
  FROM toks
),
dfs AS (
  SELECT {df_cols}
  FROM toks
),
tf AS (
  SELECT doc_id, count(*)::BIGINT AS dl,
         {tf_cols}
  FROM toks GROUP BY doc_id
)
SELECT doc_id,
       round({invindex.bm25_sql_expr(list(terms))}, 6) AS score
FROM tf, consts, dfs
WHERE {any_term} > 0
"""


# fixed grid for the z-order gate: x = event_id mod 1024 (exact 10-bit
# range), y = value millis over the [0, 500) working range
_Z = dict(x_lo=0, x_hi=1023, y_lo=0, y_hi=499_999, bits=10)


def _q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton clustering keys per row — pure bit-algebra projection
    (the write-side re-layout is write_zordered; this gate pins the
    key itself, the part both engines must agree on bit-for-bit)."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        (F.col("event_id") % 1024).alias("x"),
        F.floor(F.col("value") * 1000).cast("long").alias("y"),
    )
    return e.select(
        "event_id",
        zorder.zorder_key("x", "y", **_Z).cast("long").alias("zkey"),
    )


_ZORDER_SQL = f"""
WITH e AS (
  SELECT event_id, event_id % 1024 AS x,
         CAST(floor(value * 1000) AS BIGINT) AS y
  FROM events
)
SELECT event_id,
       CAST({zorder.zorder_sql("x", "y", duck=True, **_Z)} AS BIGINT)
         AS zkey
FROM e
"""


# 3-D grid: 10 bits/dim = 30-bit key; user × time-of-day × value —
# the three predicates a security dashboard combines
_Z3 = [
    ("u", 0, 1023),
    ("h", 0, 86_399),
    ("v", 0, 499_999),
]


def _q_zorder3_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-dimensional Morton keys (user × second-of-day × value):
    the k-D generalization — bit i of dim j at position i·k+j — so
    one sort key bounds every file's footprint in all THREE predicate
    dimensions. Still a pure integer projection; the oracle is the
    same generated expression text."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        (F.col("user_id") % 1024).alias("u"),
        (F.unix_timestamp("ts") % 86_400).alias("h"),
        F.floor(F.col("value") * 1000).cast("long").alias("v"),
    )
    return e.select(
        "event_id",
        zorder.zorder_nd_key(_Z3, bits=10).cast("long").alias("zkey"),
    )


_ZORDER3_SQL = f"""
WITH e AS (
  SELECT event_id, user_id % 1024 AS u,
         CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS h,
         CAST(floor(value * 1000) AS BIGINT) AS v
  FROM events
)
SELECT event_id,
       CAST({zorder.zorder_nd_sql(_Z3, bits=10, duck=True)} AS BIGINT)
         AS zkey
FROM e
"""


def _q_zorder_rank_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof Morton keys: histogram-rank grid coords over the
    EXPONENTIALLY-distributed value column (the case the fixed grid
    measurably loses) interleaved with event time — deterministic
    integer arithmetic end to end, no global sort (the row_number
    formulation plans as Exchange SinglePartition)."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        F.floor(F.col("value") * 1000).cast("long").alias("x"),
        F.unix_timestamp("ts").alias("y"),
    )
    keyed = zorder.zorder_rank_key(e, "x", "y", bits=10)
    return keyed.select(
        "event_id", F.col("zkey").cast("long").alias("zkey")
    )


def _zorder_rank_oracle() -> str:
    z = zorder.morton_terms(10, duck=True, x="xg", y="yg")
    return f"""
WITH e AS (
  SELECT event_id, CAST(floor(value * 1000) AS BIGINT) AS x,
         CAST(floor(epoch(ts)) AS BIGINT) AS y
  FROM events
),
n AS (SELECT count(*)::BIGINT AS n FROM e),
bx AS (SELECT min(x) AS lo, max(x) AS hi FROM e),
byy AS (SELECT min(y) AS lo, max(y) AS hi FROM e),
eb AS (
  SELECT e.event_id,
         least(4095, greatest(0,
           (e.x - bx.lo) * 4096 // (bx.hi - bx.lo + 1))) AS xbin,
         least(4095, greatest(0,
           (e.y - byy.lo) * 4096 // (byy.hi - byy.lo + 1))) AS ybin
  FROM e, bx, byy
),
cx AS (
  SELECT xbin,
         CAST((sum(count(*)) OVER (ORDER BY xbin) - count(*))
              * 1024 // (SELECT n FROM n) AS BIGINT) AS xg
  FROM eb GROUP BY xbin
),
cy AS (
  SELECT ybin,
         CAST((sum(count(*)) OVER (ORDER BY ybin) - count(*))
              * 1024 // (SELECT n FROM n) AS BIGINT) AS yg
  FROM eb GROUP BY ybin
)
SELECT eb.event_id, CAST({z} AS BIGINT) AS zkey
FROM eb JOIN cx USING (xbin) JOIN cy USING (ybin)
"""


QUERIES: dict[str, QuerySpec] = {
    "rollup_value_quantiles": QuerySpec(
        _q_rollup_value_quantiles, _ROLLUP_QUANTILES_SQL,
        "mergeable quantile rollup: minute fixed-bin histogram "
        "partials merged to day p50/p90/p99 ≡ direct day histogram — "
        "integer-exact grid, thresholds, and bin edges",
    ),
    "rollup_quantiles_interp": QuerySpec(
        _q_rollup_quantiles_interp, _INTERP_QUANTILES_SQL,
        "interpolated quantile serving over the same histogram "
        "partials: weighted-multiset linear interpolation between "
        "bin edges (error ≤ one bin width) — integer rank math, one "
        "text-identical float expression, full hash oracle",
    ),
    "quantiles_gk_timeline": QuerySpec(
        _q_quantiles_gk_timeline, None,
        "Greenwald-Khanna quantile sketch (percentile_approx) over "
        "raw events at day grain — the no-partials, rank-bounded "
        "path; engine-internal sketch, rows-only oracle with the "
        "rank bound test-asserted",
        expect_columns=(
            "time_bucket", "event_type", "n_values",
            "p50_gk", "p90_gk", "p99_gk",
        ),
        expect_rows=(1, None),
        rows_oracle=(
            "SELECT count(*) FROM (SELECT DISTINCT date_trunc('day', ts),"
            " event_type FROM events WHERE value IS NOT NULL)"
        ),
    ),
    "rollup_variance_stats": QuerySpec(
        _q_rollup_variance, _ROLLUP_VARIANCE_SQL,
        "mean/stddev from mergeable moment partials (n, Σx, Σx² — "
        "DECIMAL accumulator internal): minute state folds to day "
        "exactly; one fixed float expression per statistic",
    ),
    "gapfill_timeline": QuerySpec(
        _q_gapfill_timeline, _GAPFILL_SQL,
        "densified hourly timeline: per-type bucket grid via "
        "sequence() explode over partials-sized spans, zero-filled "
        "with is_gap flags — raw events touched once",
    ),
    "timeline_moving_avg": QuerySpec(
        _q_timeline_moving_avg, _MOVING_AVG_SQL,
        "trailing 3-hour moving average over the gap-filled timeline "
        "— the window math densification exists for (a sparse ROWS "
        "frame averages across arbitrary gaps)",
    ),
    "inverted_postings": QuerySpec(
        _q_inverted_postings, _POSTINGS_SQL,
        "inverted-index build: token → df + md5-pinned sorted "
        "posting list, one corpus pass, df-bounds stop-list pruning",
    ),
    "incremental_postings": QuerySpec(
        _q_incremental_postings, _INCR_POSTINGS_SQL,
        "incremental inverted-index maintenance: per-token array "
        "surgery over the added/changed/removed delta ≡ fresh "
        "rebuild of the new corpus, md5-pinned — the corpus is never "
        "re-tokenized and the index never re-exploded",
    ),
    "index_search": QuerySpec(
        _q_index_search, _INDEX_SEARCH_SQL,
        "conjunctive term search answered from the posting table "
        "alone (token lookup + count intersection) ≡ brute-force "
        "per-doc containment — the LIKE-scan upgrade",
    ),
    "search_snippets": QuerySpec(
        _q_search_snippets, _SNIPPETS_SQL,
        "keyword-in-context snippets for index hits: first-occurrence "
        "position + fixed window per (hit, term) — results-page pass "
        "bounded by hits x terms, never the corpus",
    ),
    "cdc_apply": QuerySpec(
        _q_cdc_apply, _CDC_SQL,
        "CDC merge-upsert: latest-change arbitration with a stale-"
        "replay seq guard, deletes, and new-key inserts — snapshot "
        "never shuffles, all wide work is changelog-sized",
    ),
    "cdc_tombstone_replay": QuerySpec(
        _q_cdc_tombstone_replay, _CDC_TOMBSTONE_SQL,
        "delete-journal CDC arbitration: a stale pre-delete segment "
        "redelivered out of order cannot re-insert dead keys, while "
        "changes sequenced above the tombstone still resurrect them",
    ),
    "snapshot_time_travel": QuerySpec(
        _q_snapshot_time_travel, _TIME_TRAVEL_SQL,
        "CDC time travel: snapshot_as_of slices the journal at a "
        "data-derived cut and replays through the live merge's own "
        "arbitration — point-in-time audit on plain parquet",
    ),
    "scd2_history": QuerySpec(
        _q_scd2_history, _SCD2_SQL,
        "SCD Type 2 view of the changelog: one window turns changes "
        "into validity intervals; deletes close the preceding span "
        "and vanish — serves any as-of point query as a BETWEEN",
    ),
    "table_checksum": QuerySpec(
        _q_table_checksum, _CHECKSUM_SQL,
        "order-independent table digest (count + sum/max of 48-bit "
        "row hashes): replication verification without sorting or "
        "shipping rows — merges shard-by-shard",
    ),
    "event_transitions": QuerySpec(
        _q_event_transitions, _TRANSITIONS_SQL,
        "first-order Markov transition matrix of consecutive events "
        "per user: deterministic (ts, id) sequencing, types²-bounded "
        "rollup, one rounded division",
    ),
    "bm25_search": QuerySpec(
        _q_bm25_search, _bm25_oracle(),
        "BM25-ranked search over the query terms: integer tf/df/dl "
        "inputs, fixed-order per-term expression sum — relevance "
        "ranking with cross-engine float parity",
    ),
    "bm25_artifact_search": QuerySpec(
        _q_bm25_artifact_search, _bm25_oracle(),
        "BM25 served from the doc-keyed stats artifact (dl + tf map "
        "rows, the incrementally-maintained forward index) — same "
        "ranking hash as the from-corpus scorer, corpus text never "
        "touched at query time",
    ),
    "zorder_keys": QuerySpec(
        _q_zorder_keys, _ZORDER_SQL,
        "Morton (Z-order) clustering keys: bit-interleaved 2-D grid "
        "coords — the multi-dimension file-clustering sort key, pure "
        "integer projection",
    ),
    "zorder3_keys": QuerySpec(
        _q_zorder3_keys, _ZORDER3_SQL,
        "3-D Morton clustering keys (user x second-of-day x value): "
        "round-robin bit interleave generalized to k dimensions "
        "under the 63-bit key budget — pure integer projection",
    ),
    "zorder_rank_keys": QuerySpec(
        _q_zorder_rank_keys, _zorder_rank_oracle(),
        "skew-proof Morton keys: rank-scaled grid coordinates "
        "(deterministic (value, id) ranking) interleaved — the "
        "quantile-transform fix for skewed clustering dimensions",
    ),
}
