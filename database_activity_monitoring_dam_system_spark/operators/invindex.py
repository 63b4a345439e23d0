"""Inverted index over a document corpus: token → sorted posting list
(doc ids) + document frequency, and conjunctive term search answered
from the INDEX alone (the corpus is never re-scanned per query).

Why this matters at 100 TB: the reference answers text search with a
per-request LIKE scan over the whole activity table
(/root/reference/app.py:269-285, the `%query%` filter) — O(corpus)
per query. An inverted index pays one corpus pass at build time; a
conjunctive query then touches only the queried tokens' posting rows
(index-partition-pruned when the index is written partitioned/bucketed
by token) and intersects them with one posting-sized aggregate.

Skew is the build-side hazard: stopword tokens have posting lists the
size of the corpus. ``max_df`` drops them (they carry no selectivity —
the classic stop-list argument made executable); the remaining lists
are bounded, so the collect_list per token is too. Search never
explodes a hot list either — candidates are bounded by the RAREST
queried term (the intersection is ≤ min posting length).

Tokenization is textops._norm_tokens — the one lowercased [a-z0-9]
word stream every text-family oracle reproduces bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import _norm_tokens
from ..ckpt import register as _ckpt_register
from ..ckpt import unpersist as _ckpt_unpersist


def build_postings(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """One corpus pass → (token, df, postings) with ``postings`` the
    SORTED array of containing doc ids (distinct per doc; sorted so
    the index is deterministic and mergeable by concatenation-free
    re-sort). ``min_df``/``max_df`` bound the df range — max_df is
    the stop-list cap that keeps posting lists (and the groupBy's
    per-key state) bounded at corpus scale.

    A CAPPED index carries ``_min_df``/``_max_df`` stamp columns
    (the ``_n_docs`` discipline; -1 = no max cap): a pruned term is
    indistinguishable from an absent one in the posting table, so a
    conjunctive search over a capped index would silently return an
    EMPTY result for a query containing a stop-listed term even
    though every doc contains it. :func:`search_all_terms` reads the
    stamps and refuses such queries instead. Uncapped builds stay
    stamp-free (schema unchanged — absence IS absence there)."""
    tokens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_norm_tokens(text_col))).alias("token"),
    )
    postings = tokens.groupBy("token").agg(
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
        F.count("*").alias("df"),
    )
    if min_df > 1:
        postings = postings.filter(F.col("df") >= min_df)
    if max_df is not None:
        postings = postings.filter(F.col("df") <= max_df)
    if min_df > 1 or max_df is not None:
        postings = postings.withColumns(
            {
                "_min_df": F.lit(int(min_df)),
                "_max_df": F.lit(-1 if max_df is None else int(max_df)),
            }
        )
    return postings


def search_all_terms(
    postings: DataFrame, terms: list[str]
) -> DataFrame:
    """Docs containing ALL of ``terms``, answered from the index
    alone: filter the posting table to the queried tokens (a
    token-key lookup — partition-pruned if the index is stored
    partitioned by token), explode only those lists, and keep doc
    ids seen ``len(terms)`` times. Output: one ``doc_id`` column,
    exact conjunctive semantics under the index's tokenization.

    Over a df-CAPPED index (``_min_df``/``_max_df`` stamps present)
    a queried term missing from the posting table is ambiguous —
    genuinely in no doc, or pruned by the caps — and treating it as
    absent breaks the brute-force-containment contract (a query
    containing a stop-listed term would return empty even though
    every doc contains it). Such queries raise ValueError naming the
    missing terms; the lookup that detects them is bounded by
    ``len(terms)`` rows."""
    if not terms:
        raise ValueError("search_all_terms: need at least one term")
    uniq = sorted(set(terms))
    if "_min_df" in postings.columns or "_max_df" in postings.columns:
        present = {
            r["token"]
            for r in postings.filter(F.col("token").isin(uniq))
            .select("token")
            .collect()
        }
        missing = sorted(set(uniq) - present)
        if missing:
            raise ValueError(
                "search_all_terms: index was built with df caps "
                f"and terms {missing} are not in it — pruned terms "
                "are indistinguishable from absent ones; rebuild "
                "without caps or drop those terms"
            )
    return (
        postings.filter(F.col("token").isin(uniq))
        .select(F.explode("postings").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("_hits"))
        .filter(F.col("_hits") == len(uniq))
        .select("doc_id")
    )


def search_docs(
    docs: DataFrame,
    postings: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """The full rows of the matching docs: index-derived candidate
    ids semi-join the corpus — a broadcast semi join whenever the
    candidate set is small (which is the point of querying by the
    rarest terms first)."""
    hits = search_all_terms(postings, terms).withColumnRenamed(
        "doc_id", id_col
    )
    return docs.join(F.broadcast(hits), on=id_col, how="left_semi")


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    persisted_out: list | None = None,
) -> DataFrame:
    """BM25-ranked disjunctive search: every doc containing at least
    one query term, scored by Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b
    + b·dl·N/Σdl)) — the index family upgraded from boolean
    containment to real relevance ranking.

    ``persisted_out``: pass a list to receive the persisted per-doc
    tf/dl frame so a long-lived serving driver can ``.unpersist()``
    it after consuming the scores — each call pins a doc-count-sized
    cache in executor storage otherwise, freed only by
    nondeterministic GC (the pq_update_codes convention). The
    materialization is ``.persist()``, NOT localCheckpoint:
    Dataset.unpersist() only releases CacheManager entries, so a
    checkpoint-based handle would be a no-op escape hatch.

    Shape at scale: the corpus is TOKENIZED ONCE — one explode +
    per-doc aggregate produces (dl, tf per term) rows, which are
    persisted (cache populated by the constants aggregate's own
    action; doc-count-sized, a few ints
    per doc) so the corpus constants (Σdl, per-term df — derived as
    counts over that frame) and the candidate scoring both read the
    materialized frame instead of re-running the tokenize lineage
    (a naive formulation re-tokenized the corpus three times per
    query — measured in the plan). N alone comes from a footer-cheap
    count over the raw table (zero-token docs have no tf row).

    Cross-engine float parity (the gate's hash): every input to the
    score is an exact integer (tf, df, dl, N, Σdl); each per-term
    score is ONE fixed arithmetic expression over those integers, and
    the final score sums the per-term scores in the FIXED order of
    ``terms`` (a float sum over a data-dependent row order would not
    hash) — then one round(…, 6). The idf factor is computed
    DRIVER-SIDE with Python's libm ``log`` and embedded as a literal:
    JVM ``ln`` differs from libm by 1 ulp on some inputs, which the
    idf×saturation product amplifies into 6th-decimal flips (measured
    on ~10 of 500 sf0.001 docs), while Python and DuckDB share the
    same libm on the same host."""
    if not terms:
        raise ValueError("bm25_scores: need at least one term")
    if len(set(terms)) != len(terms):
        raise ValueError("bm25_scores: terms must be distinct")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_norm_tokens(text_col)).alias("token"),
    )
    # the ONE tokenize pass: per-doc lengths + per-term frequencies,
    # materialized so constants and scoring don't re-run the lineage
    tf_full = toks.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(
                F.when(F.col("token") == t, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ],
    ).persist()
    if persisted_out is not None:
        persisted_out.append(tf_full)
    n_docs = docs.count()  # zero-token docs have no tf row
    consts = tf_full.agg(
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).first()
    sum_dl = consts["sum_dl"]
    df_rows = {
        t: int(consts[f"df_{i}"] or 0) for i, t in enumerate(terms)
    }
    tf = tf_full.filter(
        sum(
            (F.col(f"_tf_{i}") for i in range(1, len(terms))),
            F.col("_tf_0"),
        )
        > 0
    )
    parts = _bm25_score_parts(
        terms, n_docs=n_docs, sum_dl=sum_dl, df_rows=df_rows, k1=k1, b=b
    )
    if not parts:
        return tf.select("doc_id").withColumn(
            "score", F.lit(0.0)
        ).limit(0)
    score = F.round(F.expr(" + ".join(parts)), 6)
    return tf.select("doc_id", score.alias("score"))


def _bm25_score_parts(
    terms: list[str],
    *,
    n_docs: int,
    sum_dl: int,
    df_rows: dict[str, int],
    k1: float,
    b: float,
) -> list[str]:
    """The ONE per-term BM25 score expression (SQL text over columns
    ``_tf_{i}`` and ``dl``), shared by the from-corpus scorer
    (:func:`bm25_scores`) and the from-artifact scorer
    (:func:`bm25_from_stats`) — one template, so artifact ≡ fresh is
    bit-exact by construction. Fixed term order, every float constant
    through CAST(… AS DOUBLE) (a bare decimal literal parses as
    DECIMAL in both engines with different propagation rules — ~1e-8
    divergences measured), idf computed driver-side with Python's
    libm log (JVM ln is 1 ulp off on some inputs and the
    idf×saturation product amplifies it into 6th-decimal flips)."""
    import math

    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    parts = []
    for i, t in enumerate(terms):
        dfi = int(df_rows.get(t, 0))
        if dfi == 0:
            continue  # absent term contributes exactly 0
        idf = math.log(
            (float(n_docs) - dfi + 0.5) / (dfi + 0.5)
        )
        parts.append(
            f"({d(idf)}"
            f" * (_tf_{i} * {d(k1 + 1.0)})"
            f" / (_tf_{i} + {d(k1)} * ({d(1.0 - b)} + {d(b)} * dl *"
            f" {d(float(n_docs))} / {d(float(sum_dl))})))"
        )
    return parts


def bm25_sql_expr(
    terms: list[str], *, k1: float = 1.2, b: float = 0.75
) -> str:
    """The oracle-side BM25 score as DuckDB SQL text over columns
    ``_tf_{i}``/``dl`` and scalars ``n_docs``/``sum_dl``/``df_{i}``
    (provided by the oracle's own CTEs) — generated from the SAME
    arithmetic template as :func:`bm25_scores` so both engines
    evaluate the identical expression tree. CAST pins every operand
    to DOUBLE exactly where the Spark side holds a double literal."""
    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    parts = []
    for i in range(len(terms)):
        parts.append(
            f"(ln((CAST(n_docs AS DOUBLE) - df_{i} + {d(0.5)})"
            f" / (df_{i} + {d(0.5)}))"
            f" * (_tf_{i} * {d(k1 + 1.0)})"
            f" / (_tf_{i} + {d(k1)} * ({d(1.0 - b)} + {d(b)} * dl *"
            f" CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))))"
        )
    return " + ".join(parts)


def save_postings(
    postings: DataFrame,
    path: str,
    *,
    n_docs: int,
    buckets: int = 0,
) -> None:
    """Persist a posting table — the index artifact of the search
    path, built once per corpus snapshot and served until the next
    rebuild. Every row carries the corpus's document count as the
    staleness fingerprint :func:`load_postings` checks (the
    save_ivf_index discipline: a stale index silently answers for
    the OLD corpus otherwise).

    ``buckets`` > 0 writes the table bucketed-by-convention: one
    repartition on the token key + sortWithinPartitions, so a term
    lookup at serving time touches one file's worth of rows instead
    of scanning every posting (plain-parquet approximation of a
    token-keyed index layout; exact file pruning needs the query
    engine's min/max stats, which the in-file token sort gives).
    The bucket count is stamped on the artifact (``_buckets``) so
    incremental updates re-save with the SAME layout by default —
    an update that silently dropped the bucketing would leave every
    term lookup scanning all posting files with no error."""
    out = postings.withColumn(
        "_n_docs", F.lit(int(n_docs))
    ).withColumn("_buckets", F.lit(int(buckets)))
    if buckets > 0:
        out = out.repartition(buckets, "token").sortWithinPartitions(
            "token"
        )
    out.write.mode("overwrite").parquet(path)


def load_postings(
    spark: SparkSession, path: str, *, expect_docs: int | None = None
) -> DataFrame:
    """Load a persisted posting table for serving. With
    ``expect_docs``, refuse an artifact stamped with a different
    corpus document count — the regenerated-corpus staleness trap."""
    df = spark.read.parquet(path)
    if expect_docs is not None and "_n_docs" in df.columns:
        stamped = df.select("_n_docs").first()
        if stamped is not None and stamped["_n_docs"] != expect_docs:
            raise ValueError(
                f"load_postings: index at {path!r} was built over "
                f"{stamped['_n_docs']} docs, corpus now has "
                f"{expect_docs} — rebuild the index"
            )
    return df.drop("_n_docs", "_buckets")


def update_postings(
    postings: DataFrame,
    old_docs: DataFrame,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    diff: DataFrame | None = None,
) -> DataFrame:
    """Incrementally fold a corpus snapshot change into an existing
    UNCAPPED posting table: the pq_update_codes carry pattern applied
    to the index. The result is row-identical to a fresh
    :func:`build_postings` over ``new_docs`` (gate-pinned), at
    delta-proportional cost.

    How the delta stays bounded: which posting rows mention a removed
    or changed doc is answerable WITHOUT scanning the index — they
    are exactly the tokens of those docs' OLD text. So the removal
    side tokenizes old text of ``removed ∪ changed`` docs, the
    insertion side tokenizes new text of ``added ∪ changed`` docs
    (verdicts from dedup.corpus_diff on RAW fingerprints — any byte
    change retokenizes), and the merge is per-token ARRAY surgery
    (array_except + concat + re-sort) over one equi-join of the
    index against the two broadcast delta frames — the corpus is
    never re-tokenized and the index never re-exploded. Tokens whose
    lists empty out drop; tokens seen first in the delta append.

    Refuses a CAPPED index (``_min_df``/``_max_df`` stamps): a token
    pruned by max_df at build time has no posting list to repair —
    after deletions it may fall back under the cap, and the merged
    index would silently disagree with a fresh capped build. BM25
    serving needs no extra carry: its constants (N, Σdl, df) derive
    from the corpus at query time, not from this artifact."""
    if "_min_df" in postings.columns or "_max_df" in postings.columns:
        raise ValueError(
            "update_postings: index was built with df caps — pruned "
            "tokens cannot be repaired incrementally; rebuild fresh"
        )
    from .dedup import corpus_diff

    # the diff's full-outer join is consumed by BOTH delta sides and
    # Spark re-runs a shared subtree per consumer — materialize the
    # (delta-bounded) verdict ids once; unchanged docs never leave
    # the join. ``diff``: optionally a PRECOMPUTED non-unchanged
    # verdict table (the crawl pipeline diffs the snapshot once and
    # feeds every artifact maintainer — see update_containment_pairs).
    if diff is None:
        diff = (
            corpus_diff(
                old_docs, new_docs, id_col=id_col, text_col=text_col,
                normalize=False,
            )
            .filter(F.col("verdict") != "unchanged")
            .select(id_col, "verdict")
            .localCheckpoint(eager=True)
            .transform(_ckpt_register)
        )
    gone_ids = diff.filter(
        F.col("verdict").isin("removed", "changed")
    ).select(F.col(id_col))
    new_ids = diff.filter(
        F.col("verdict").isin("added", "changed")
    ).select(F.col(id_col))

    def _token_pairs(docs: DataFrame, ids: DataFrame) -> DataFrame:
        return docs.join(F.broadcast(ids), on=id_col, how="left_semi").select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(_norm_tokens(text_col))
            ).alias("token"),
        )

    rm = (
        _token_pairs(old_docs, gone_ids)
        .groupBy("token")
        .agg(F.collect_set("doc_id").alias("_rm_ids"))
    )
    ad = (
        _token_pairs(new_docs, new_ids)
        .groupBy("token")
        .agg(F.collect_set("doc_id").alias("_add_ids"))
    )
    return patch_postings(postings, rm, ad)


def patch_postings(
    postings: DataFrame, rm: DataFrame, ad: DataFrame
) -> DataFrame:
    """The ONE per-token array-surgery merge (shared by the batch
    fold above and the streaming maintainer): ``rm`` = (token,
    _rm_ids array) to delete from lists, ``ad`` = (token, _add_ids
    array) to append — tokens whose lists empty out drop, tokens seen
    first in the delta append. Both delta frames are delta-bounded
    and broadcast; the index never re-explodes."""
    # ad is consumed twice (the patch join AND the new-token anti
    # join) — materialize so its lineage runs once
    ad = ad.localCheckpoint(eager=True).transform(_ckpt_register)
    empty = F.array().cast(postings.schema["postings"].dataType)
    patched = (
        postings.join(F.broadcast(rm), on="token", how="left")
        .join(F.broadcast(ad), on="token", how="left")
        .select(
            "token",
            # except BOTH delta sides before re-adding: an id being
            # added is first removed if already present, making
            # re-application of the same patch the identity — the
            # streaming maintainer's batch-retry contract (for a
            # fresh id the extra except is a no-op, so the batch
            # fold is unchanged)
            F.sort_array(
                F.concat(
                    F.array_except(
                        "postings",
                        F.concat(
                            F.coalesce("_rm_ids", empty),
                            F.coalesce("_add_ids", empty),
                        ),
                    ),
                    F.coalesce("_add_ids", empty),
                )
            ).alias("postings"),
        )
    )
    fresh_tokens = (
        ad.join(postings.select("token"), on="token", how="left_anti")
        .select("token", F.sort_array("_add_ids").alias("postings"))
    )
    return (
        patched.unionByName(fresh_tokens)
        .withColumn("df", F.size("postings").cast("long"))
        .filter(F.col("df") > 0)
    )


def update_postings_artifact(
    spark: SparkSession,
    path: str,
    old_docs: DataFrame,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int,
    buckets: int | None = None,
) -> None:
    """The persisted-artifact form of :func:`update_postings`: load
    the index at ``path`` (stamp-checked against the OLD corpus's
    document count — refusing an artifact that already drifted),
    fold the snapshot delta in, and re-save stamped with the NEW
    count (``n_docs``). ``buckets=None`` (the default) re-saves with
    the artifact's OWN stamped bucket layout — an incremental update
    must not silently flatten a token-bucketed serving index; pass
    an explicit count only to deliberately re-layout. The merged
    frame is localCheckpoint-ed before the overwrite severs the
    self-read (the merge_upsert_partitioned discipline); the index
    is vocab-bounded, orders of magnitude under the corpus."""
    if buckets is None:
        raw = spark.read.parquet(path)
        buckets = (
            int(raw.select("_buckets").first()["_buckets"])
            if "_buckets" in raw.columns
            else 0
        )
    expect_old = old_docs.count()
    idx = load_postings(spark, path, expect_docs=expect_old)
    merged = update_postings(
        idx, old_docs, new_docs, id_col=id_col, text_col=text_col
    ).localCheckpoint(eager=True)
    save_postings(merged, path, n_docs=n_docs, buckets=buckets)
    _ckpt_unpersist(merged)  # fully consumed by the save above


def search_snippets(
    docs: DataFrame,
    postings: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 40,
) -> DataFrame:
    """Keyword-in-context snippets for conjunctive search hits: for
    each matching doc and each query term, the character position of
    the term's FIRST occurrence (1-based, in the lowercased text) and
    the surrounding ``width``-char window — what a results page
    renders under each hit.

    Candidates come from the index (search_all_terms), so the
    per-term locate/substring projection runs over hit rows only —
    at 100 TB the snippet pass touches len(hits)·len(terms) rows, not
    the corpus. Position math is deterministic integer arithmetic
    (locate + greatest + substring), directly oracle-able via
    DuckDB's strpos/substr with the same 1-based convention."""
    hits = search_docs(docs, postings, terms, id_col=id_col)
    lowered = F.lower(F.col(text_col))
    rows = []
    for t in sorted(set(terms)):
        pos = F.locate(t, lowered)
        start = F.greatest(pos - F.lit(width // 2), F.lit(1))
        rows.append(
            hits.select(
                F.col(id_col).alias("doc_id"),
                F.lit(t).alias("term"),
                pos.alias("pos"),
                F.substring(lowered, start, F.lit(width)).alias(
                    "snippet"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    # locate() = 0 would mean a hit doc without the term — impossible
    # for conjunctive hits under the same tokenization, except where
    # the term occurs only as a sub-token; keep the row (pos pins it)
    return out


def build_bm25_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_empty_docs: bool = False,
) -> DataFrame:
    """The BM25 serving artifact's content: one row per non-empty doc
    — (doc_id, dl, tf map<token,count>) — i.e. the forward index
    bm25_scores derives inline, made persistent. DOC-keyed (not
    token-keyed like the posting table) deliberately: the incremental
    fold then is a plain id anti-join + delta append — no per-token
    array surgery — and ANY future query term serves from one
    ``element_at`` on the map, so the artifact is query-agnostic.

    Size ∝ Σ per-doc distinct tokens — the corpus's token stream
    deduplicated per doc, orders of magnitude under raw text and
    columnar-compressed; partitions inherit the doc distribution
    (no hot keys: the map is per-doc-vocab bounded).

    ``keep_empty_docs=True`` emits a (dl=0, empty map) row for
    zero-token docs too, making the artifact's ROW COUNT equal the
    corpus document count N — the property the streaming maintainer
    needs to derive the N stamp from the artifact alone (the default
    drops them, matching bm25_scores' tf frame, where N comes from a
    separate corpus count)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_norm_tokens(text_col)).alias("token"),
    )
    per_term = toks.groupBy("doc_id", "token").agg(
        F.count("*").alias("tf")
    )
    stats = per_term.groupBy("doc_id").agg(
        F.sum("tf").alias("dl"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("token", "tf")))
        ).alias("tf_map"),
    )
    if not keep_empty_docs:
        return stats
    ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return (
        ids.join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dl", F.lit(0).cast("long")).alias("dl"),
            F.coalesce(
                "tf_map",
                F.map_from_entries(
                    F.array().cast("array<struct<token:string,tf:long>>")
                ),
            ).alias("tf_map"),
        )
    )


_BM25_STAMP = "_n_docs"


def save_bm25_stats(
    stats: DataFrame, path: str, *, n_docs: int
) -> None:
    """Persist the BM25 stats artifact stamped with the corpus
    document count — N is a SCORE INPUT (idf and length norm), not
    derivable from the stats rows (zero-token docs have no row), so
    the stamp is both the staleness fingerprint and the serving
    constant."""
    stats.withColumn(_BM25_STAMP, F.lit(int(n_docs))).write.mode(
        "overwrite"
    ).parquet(path)


def load_bm25_stats(
    spark: SparkSession, path: str, *, expect_docs: int | None = None
) -> tuple[DataFrame, int]:
    """Load (stats frame, stamped corpus count) for serving. With
    ``expect_docs``, refuse a stamp mismatch (regenerated-corpus
    staleness) — and refuse a zero-row artifact outright: its stamp
    cannot be read, and N=unknown cannot serve a score."""
    df = spark.read.parquet(path)
    row = df.select(_BM25_STAMP).first()
    if row is None:
        raise ValueError(
            f"load_bm25_stats: artifact at {path!r} has no rows — "
            "its corpus-count stamp is unreadable; rebuild with "
            "save_bm25_stats"
        )
    stamped = int(row[_BM25_STAMP])
    if expect_docs is not None and stamped != expect_docs:
        raise ValueError(
            f"load_bm25_stats: artifact at {path!r} was built over "
            f"{stamped} docs, corpus now has {expect_docs} — fold "
            "the delta with update_bm25_artifact or rebuild"
        )
    return df.drop(_BM25_STAMP), stamped


def bm25_from_stats(
    stats: DataFrame,
    terms: list[str],
    *,
    n_docs: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score a disjunctive query from the stats artifact alone — the
    corpus is never touched, let alone re-tokenized (the per-call
    rebuild was bm25_scores' documented serving gap). Bit-exact to
    :func:`bm25_scores` over the same corpus: the per-term tf columns
    come from the SAME integers (map lookups instead of conditional
    sums) and the score is the SAME _bm25_score_parts expression
    (idf/Σdl/N constants included), so equality is by construction,
    pinned by test.

    Two bounded passes over the artifact: one agg for (Σdl, per-term
    df), one scoring scan — both column-pruned parquet reads."""
    if not terms:
        raise ValueError("bm25_from_stats: need at least one term")
    if len(set(terms)) != len(terms):
        raise ValueError("bm25_from_stats: terms must be distinct")
    tf_cols = [
        F.coalesce(
            F.element_at("tf_map", F.lit(t)), F.lit(0)
        ).cast("long").alias(f"_tf_{i}")
        for i, t in enumerate(terms)
    ]
    proj = stats.select("doc_id", "dl", *tf_cols)
    consts = proj.agg(
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).first()
    sum_dl = consts["sum_dl"]
    df_rows = {
        t: int(consts[f"df_{i}"] or 0) for i, t in enumerate(terms)
    }
    cand = proj.filter(
        sum(
            (F.col(f"_tf_{i}") for i in range(1, len(terms))),
            F.col("_tf_0"),
        )
        > 0
    )
    parts = _bm25_score_parts(
        terms, n_docs=n_docs, sum_dl=sum_dl, df_rows=df_rows, k1=k1, b=b
    )
    if not parts:
        return cand.select("doc_id").withColumn(
            "score", F.lit(0.0)
        ).limit(0)
    score = F.round(F.expr(" + ".join(parts)), 6)
    return cand.select("doc_id", score.alias("score"))


def update_bm25_stats(
    stats: DataFrame,
    old_docs: DataFrame,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fold a corpus snapshot change into the stats frame —
    row-identical to a fresh :func:`build_bm25_stats` over
    ``new_docs`` at delta-proportional tokenize cost: rows of
    removed ∪ changed docs anti-join away by id (doc-keyed — no
    token work to find them), added ∪ changed docs are freshly
    tokenized (the only hashing done), and the union is the new
    artifact. Same diff verdicts (raw fingerprints — any byte change
    retokenizes) as update_postings."""
    from .dedup import corpus_diff

    diff = (
        corpus_diff(
            old_docs, new_docs, id_col=id_col, text_col=text_col,
            normalize=False,
        )
        .filter(F.col("verdict") != "unchanged")
        .select(id_col, "verdict")
        .localCheckpoint(eager=True)
        .transform(_ckpt_register)
    )
    gone = diff.filter(
        F.col("verdict").isin("removed", "changed")
    ).select(F.col(id_col).alias("doc_id"))
    fresh = diff.filter(
        F.col("verdict").isin("added", "changed")
    ).select(F.col(id_col))
    kept = stats.join(F.broadcast(gone), on="doc_id", how="left_anti")
    delta = build_bm25_stats(
        new_docs.join(F.broadcast(fresh), on=id_col, how="left_semi"),
        id_col=id_col,
        text_col=text_col,
    )
    return kept.unionByName(delta)


def update_bm25_artifact(
    spark: SparkSession,
    path: str,
    old_docs: DataFrame,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persisted-artifact form: load stamp-checked against the OLD
    corpus count (refusing an artifact that already drifted), fold
    the delta, re-save stamped with the NEW count. Both counts are
    derived HERE from the frames in hand — N is a direct score input
    (idf, length norm), so a caller-supplied miscount would silently
    skew every served score until some later stamp check refused the
    artifact wholesale. localCheckpoint severs the self-read before
    the overwrite (the update_postings_artifact discipline)."""
    expect_old = old_docs.count()
    stats, _ = load_bm25_stats(spark, path, expect_docs=expect_old)
    merged = update_bm25_stats(
        stats, old_docs, new_docs, id_col=id_col, text_col=text_col
    ).localCheckpoint(eager=True)
    save_bm25_stats(merged, path, n_docs=new_docs.count())
    _ckpt_unpersist(merged)  # fully consumed by the save above
