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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import _norm_tokens


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
    per-key state) bounded at corpus scale."""
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
    return postings


def search_all_terms(
    postings: DataFrame, terms: list[str]
) -> DataFrame:
    """Docs containing ALL of ``terms``, answered from the index
    alone: filter the posting table to the queried tokens (a
    token-key lookup — partition-pruned if the index is stored
    partitioned by token), explode only those lists, and keep doc
    ids seen ``len(terms)`` times. Output: one ``doc_id`` column,
    exact conjunctive semantics under the index's tokenization."""
    if not terms:
        raise ValueError("search_all_terms: need at least one term")
    uniq = sorted(set(terms))
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
