"""Text analysis for training-data pipelines: token stats, quality
scoring, language-ID heuristics, fingerprinting.

All built-in expressions (split / regexp / aggregate) — per-document
math is single-pass projections, corpus rollups are hash aggregates.
Ratio arithmetic is a single integer division so the DuckDB oracle
reproduces it bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword profiles for the n-gram/stopword
# heuristic. Real pipelines plug fuller profiles in; the operator shape
# (profile → ratio scores → argmax) is what matters at scale.
STOPWORD_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "zu"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": (),  # no-space scripts need char-n-gram profiles instead
}

_WS = r"\s+"


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), _WS)


def token_stats(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc token counts: whitespace tokens, distinct tokens, a
    BPE-ish subword estimate (ceil(chars/4) — the usual ~4 chars/token
    heuristic), and mean token length."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    return docs.select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.ceil(n_chars / F.lit(4.0)).cast("bigint").alias("est_bpe_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col(text_col), _WS, "")) / n_tokens, 4
        ).alias("mean_token_len"),
    )


def stopword_ratio(text_col: str, stopwords: tuple[str, ...]) -> Column:
    """Fraction of tokens that are profile stopwords (0 for empty
    profiles)."""
    if not stopwords:
        return F.lit(0.0)
    toks = _tokens(text_col)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*stopwords))
    )
    return hits / F.size(toks)


def quality_scores(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality components + a bucketed verdict, mirroring the
    length/punctuation/stopword heuristics used to filter web corpora.
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    sw_ratio = stopword_ratio(text_col, STOPWORD_PROFILES["en"])
    punct_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", "")) / n_chars
    )
    verdict = (
        F.when(n_tokens < 10, "too_short")
        .when(punct_ratio > 0.3, "too_noisy")
        .when(sw_ratio < 0.01, "low_fluency")
        .otherwise("keep")
    )
    return docs.select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_chars.cast("bigint").alias("n_chars_measured"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        verdict.alias("verdict"),
    )


def language_guess(text_col: str = "text") -> Column:
    """Stopword-profile argmax language guess.

    Scores each profile by stopword-hit ratio and picks the best; a
    sub-threshold best score yields 'und' (undetermined). With the
    synthetic corpus every doc is English-ish — the OPERATOR (profile →
    score → argmax) is what's exercised; real profiles drop in."""
    scored: list[tuple[Column, str]] = []
    for lang, words in STOPWORD_PROFILES.items():
        if words:
            scored.append((stopword_ratio(text_col, words), lang))
    best = None
    for ratio, lang in scored:
        if best is None:
            best = (ratio, F.lit(lang))
        else:
            best_ratio, best_lang = best
            cond = ratio > best_ratio
            best = (
                F.when(cond, ratio).otherwise(best_ratio),
                F.when(cond, lang).otherwise(best_lang),
            )
    best_ratio, best_lang = best
    return F.when(best_ratio >= 0.01, best_lang).otherwise("und")


def lang_id(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.col("lang").alias("labeled_lang"),
        language_guess(text_col).alias("guessed_lang"),
    )


def lang_agreement(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Corpus rollup: label × guess confusion counts."""
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            language_guess(text_col).alias("guessed_lang"),
        )
        .groupBy("labeled_lang", "guessed_lang")
        .agg(F.count("*").alias("cnt"))
    )


def rolling_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 5,
) -> DataFrame:
    """Document fingerprinting: per-doc set of window-shingle hashes
    (xxhash64 of each `window`-token shingle), as an array — the
    substrate for containment / winnowing-style matching."""
    toks = _tokens(text_col)
    n = F.size(toks)
    idxs = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    shingle_hash = F.transform(
        idxs,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    return docs.select(
        F.col(id_col),
        F.array_distinct(shingle_hash).alias("shingle_hashes"),
        n.alias("n_tokens"),
    )
