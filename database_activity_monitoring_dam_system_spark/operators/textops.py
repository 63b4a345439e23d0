"""Text analysis for training-data pipelines: token stats, quality
scoring, language-ID heuristics, fingerprinting.

All built-in expressions (split / regexp / aggregate) — per-document
math is single-pass projections, corpus rollups are hash aggregates.
Ratio arithmetic is a single integer division so the DuckDB oracle
reproduces it bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..ckpt import register as _ckpt_register
from .dedup import _reserve_working_col

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


def _lower_ws_tokens(text_col: str) -> Column:
    """Lowercased whitespace tokens with empties dropped — the ONE
    tokenization shared by the hashing/BPE/drift/NB family (their
    oracles all assume it; changing it here changes all five in
    lockstep)."""
    return F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), _WS),
        lambda t: t != "",
    )


def _md5_bucket_sql(dim: int) -> str:
    """Spark-SQL snippet hashing a ``tok`` column into [0, dim) via
    the first two md5 hex digits — 256 raw values, so ``dim`` must
    not exceed 256 (callers validate) and divisors of 256 avoid
    modulo bias."""
    return (
        "CAST(conv(substring(md5(tok), 1, 2), 16, 10) AS INT) % "
        + str(dim)
    )


def _check_bucket_dim(dim: int) -> None:
    if not 1 <= dim <= 256:
        raise ValueError(
            f"dim must be in [1, 256] (two md5 hex digits give 256 raw "
            f"buckets; dim={dim} would leave buckets permanently empty)"
        )


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


def quality_signal_cols(text_col: str = "text") -> dict[str, Column]:
    """The raw quality-signal expressions (unrounded ratios), shared by
    the batch operator and the streaming corpus filter so both paths
    are the same Column tree by construction."""
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
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "stopword_ratio": sw_ratio,
        "punct_ratio": punct_ratio,
        "verdict": verdict,
    }


def quality_scores(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality components + a bucketed verdict, mirroring the
    length/punctuation/stopword heuristics used to filter web corpora.
    """
    c = quality_signal_cols(text_col)
    return docs.select(
        F.col(id_col),
        c["n_tokens"].cast("bigint").alias("n_tokens"),
        c["n_chars"].cast("bigint").alias("n_chars_measured"),
        F.round(c["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(c["punct_ratio"], 4).alias("punct_ratio"),
        c["verdict"].alias("verdict"),
    )


# The Gopher/MassiveText document-filter stopword list (Rae et al.
# 2021, "Scaling Language Models", table A1 rules): a doc must contain
# at least two DISTINCT words from this list to pass the fluency rule.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def _gopher_verdict(nw, mean_word_len, symbol_ratio, frac_alpha, n_stop):
    """The one rule-order definition, parameterized by the five
    measure Columns — shared by the materializing operator (which
    feeds it named mid-columns) and the inline keep predicate (which
    feeds it raw expressions), so the battery cannot drift between
    the two forms."""
    return (
        F.when((nw < 50) | (nw > 100000), "bad_word_count")
        .when((mean_word_len < 3) | (mean_word_len > 10), "bad_mean_word_len")
        .when(symbol_ratio > 0.1, "too_symbolic")
        .when(frac_alpha < 0.8, "low_alpha")
        .when(n_stop < 2, "no_stopwords")
        .otherwise("keep")
    )


def _gopher_measure_cols(
    text_col: str, stopwords: tuple[str, ...]
) -> dict[str, Column]:
    """Raw integer measure expressions behind the Gopher battery
    (pre-division, pre-naming): n_words, sum_len, n_sym, n_alpha,
    n_stop."""
    toks = _tokens(text_col)
    txt = F.col(text_col)
    # Non-overlapping greedy occurrence counts via replace-length
    # arithmetic — same semantics in DuckDB's replace(), so the
    # integer counts match exactly.
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    # Both ellipsis spellings the published filter targets: ASCII
    # "..." (3 chars per occurrence) and the single U+2026 character.
    n_ellipsis = (
        F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))
    ) / 3 + (
        F.length(txt) - F.length(F.replace(txt, F.lit("…"), F.lit("")))
    )
    # An empty stoplist means the stopword rule can never pass —
    # n_stop is the literal 0 (vacuous fail), not a crash.
    n_stop: Column = F.lit(0)
    for w in stopwords:
        n_stop = n_stop + F.when(F.array_contains(toks, w), 1).otherwise(0)
    return {
        "n_words": F.size(toks),
        "sum_len": F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ),
        "n_sym": n_hash + n_ellipsis,
        "n_alpha": F.size(
            F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
        ),
        "n_stop": n_stop,
    }


def gopher_verdict_col(
    text_col: str = "text",
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> Column:
    """The battery as ONE string verdict Column for inline use (the
    streaming corpus filter's staged-verdict chain). Same rule
    definition as :func:`gopher_rules` by construction
    (:func:`_gopher_verdict`). In a SELECT the named output is
    evaluated once per row; inside a FILTER predicate the shared
    subtrees (the token split, the length fold) are re-evaluated per
    reference — measured +29 % on a full corpus scan at sf1 — so
    prefer selecting the verdict/flag when the frame is about to be
    materialized anyway (pipeline.py's step-2 note has the numbers)."""
    m = _gopher_measure_cols(text_col, stopwords)
    nw = m["n_words"]
    return _gopher_verdict(
        nw,
        m["sum_len"] / nw,
        m["n_sym"] / nw,
        m["n_alpha"] / nw,
        m["n_stop"],
    )


def gopher_keep_col(
    text_col: str = "text",
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> Column:
    """The battery as ONE boolean Column (verdict == keep) for inline
    filter predicates — the corpus pipeline's optional gate."""
    return gopher_verdict_col(text_col, stopwords) == "keep"


def gopher_rules(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> DataFrame:
    """The Gopher/MassiveText word-level quality-rule battery — the
    published doc-filter set complementing :func:`quality_scores`'
    length/punct/stopword-ratio heuristics:

    - word count in [50, 100 000]
    - mean word length in [3, 10]
    - symbol-to-word ratio (``#`` or ``...`` occurrences) ≤ 0.1
    - ≥ 80 % of words contain an alphabetic character
    - ≥ 2 distinct ``stopwords`` (default :data:`GOPHER_STOPWORDS`;
      pass a corpus/language-appropriate list — the published rule is
      English-specific and a vocabulary that lacks the canonical
      eight fails every document vacuously)

    ``verdict`` is the FIRST failing rule in the order above (or
    ``keep``) — the cheap-to-expensive short-circuit order a
    production filter runs them in.

    Plan shape: one zero-shuffle projection; every measure is a JVM
    higher-order fold / length-arithmetic over the whitespace tokens
    (no explode, no Python). Float parity: integer-exact counts until
    ONE division per ratio, identical expression text in the oracle.

    Output: (id, n_words, mean_word_len r6, symbol_word_ratio r6,
    frac_alpha_words r6, n_stop_distinct, verdict).
    """
    m = _gopher_measure_cols(text_col, stopwords)
    # Two-stage select (the repetition_mid_cols pattern): the token
    # split/folds are named once here so CollapseProject can't inline
    # each per referencing ratio/verdict expression downstream.
    mid = docs.select(
        F.col(id_col),
        m["n_words"].alias("_nw"),
        m["sum_len"].alias("_sumlen"),
        m["n_sym"].alias("_nsym"),
        m["n_alpha"].alias("_nalpha"),
        m["n_stop"].alias("_nstop"),
    )
    nw = F.col("_nw")
    mean_word_len = F.col("_sumlen") / nw
    symbol_ratio = F.col("_nsym") / nw
    frac_alpha = F.col("_nalpha") / nw
    verdict = _gopher_verdict(
        nw, mean_word_len, symbol_ratio, frac_alpha, F.col("_nstop")
    )
    return mid.select(
        F.col(id_col),
        nw.cast("bigint").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        F.round(frac_alpha, 6).alias("frac_alpha_words"),
        F.col("_nstop").cast("bigint").alias("n_stop_distinct"),
        verdict.alias("verdict"),
    )


def repetition_mid_cols(
    text_col: str = "text", toks_col: Column | None = None
) -> dict[str, Column]:
    """The repetition fold expressions (first stage): n-gram arrays
    sorted and folded with ``F.aggregate`` (JVM higher-order function,
    no Python) — equal grams become adjacent runs, the top bigram is
    the first longest run (sorted order ⇒ lexicographically-smallest
    tie-break), duplicated-trigram chars accumulate as runs pass
    length 2.  Shared by the batch operator and the streaming corpus
    filter; materialize these under the names ``n_chars``,
    ``n_tokens``, ``n_distinct``, ``_t2``, ``_d3`` in one select, then
    apply :func:`repetition_final_cols` in a second select so the
    non-cheap folds are named once (CollapseProject would otherwise
    inline them per referencing expression).

    ``toks_col``: pass a MATERIALIZED token-array column to keep the
    gram-transform lambdas from re-splitting the text per position —
    HOF lambdas are interpreted with no subexpression elimination, so
    the inline default re-tokenizes once per gram, O(tokens²) per doc
    (see dedup._shingles). Callers that materialize anyway (the batch
    operator, the streaming filter) project the split under a name
    and pass it here."""
    toks = toks_col if toks_col is not None else _tokens(text_col)
    sz = F.size(toks)

    def grams(nn: int) -> Column:
        # positional (overlapping, NON-distinct) n-grams; short docs
        # yield an empty array — sequence() would count DOWN for
        # sz < nn, so the branch is guarded
        return F.when(
            sz >= nn,
            F.transform(
                F.sequence(F.lit(0), sz - nn),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, nn)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def _run(acc: Column, x: Column) -> Column:
        return F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(
            F.lit(1)
        )

    def top_fold(arr: Column) -> Column:
        """(bestcnt, bestgram) of the mode; first max in sorted order
        wins ties → lexicographically smallest gram."""

        def step(acc: Column, x: Column) -> Column:
            new_run = _run(acc, x)
            better = new_run > acc["bestcnt"]
            return F.struct(
                x.alias("prev"),
                new_run.alias("run"),
                F.when(better, new_run).otherwise(acc["bestcnt"]).alias("bestcnt"),
                F.when(better, x).otherwise(acc["bestgram"]).alias("bestgram"),
            )

        init = F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("bestcnt"),
            F.lit("").alias("bestgram"),
        )
        return F.aggregate(F.array_sort(arr), init, step)

    def dup_fold(arr: Column) -> Column:
        """Chars covered by grams whose run length reaches ≥2: +2·len
        when a run hits 2, +len for each further repeat."""

        def step(acc: Column, x: Column) -> Column:
            new_run = _run(acc, x)
            add = (
                F.when(new_run == 2, F.length(x) * 2)
                .when(new_run > 2, F.length(x))
                .otherwise(F.lit(0))
            )
            return F.struct(
                x.alias("prev"),
                new_run.alias("run"),
                (acc["dup"] + add.cast("long")).alias("dup"),
            )

        init = F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).cast("long").alias("dup"),
        )
        return F.aggregate(F.array_sort(arr), init, step)

    return {
        "n_chars": F.length(F.col(text_col)),
        "n_tokens": sz.cast("bigint"),
        "n_distinct": F.size(F.array_distinct(toks)),
        "_t2": top_fold(grams(2)),
        "_d3": dup_fold(grams(3)),
    }


def repetition_final_cols(
    *,
    top_bigram_max: float = 0.08,
    dup_trigram_max: float = 0.60,
    prefix: str = "",
) -> dict[str, Column]:
    """Second-stage expressions over the materialized
    :func:`repetition_mid_cols` names.

    ``prefix`` renames the expected intermediate columns (e.g.
    ``_cf_n_chars``) so callers embedding the mid stage into a frame
    that ALREADY has an ``n_chars``/``n_tokens`` column (the
    documents table does) can avoid ambiguous references."""
    n_chars = F.col(f"{prefix}n_chars")
    t2, d3 = F.col(f"{prefix}_t2"), F.col(f"{prefix}_d3")
    top_frac = F.round(
        (t2["bestcnt"] * F.length(t2["bestgram"])) / n_chars, 4
    )
    dup_frac = F.round(F.least(F.lit(1.0), d3["dup"] / n_chars), 4)
    verdict = (
        F.when(top_frac > top_bigram_max, "bigram_loop")
        .when(dup_frac > dup_trigram_max, "trigram_dup")
        .otherwise("keep")
    )
    return {
        "repeated_token_frac": F.round(
            F.lit(1.0)
            - F.col(f"{prefix}n_distinct") / F.col(f"{prefix}n_tokens"),
            4,
        ),
        "top_bigram": t2["bestgram"],
        "top_bigram_frac": top_frac,
        "dup_trigram_frac": dup_frac,
        "verdict": verdict,
    }


def repetition_signals(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_bigram_max: float = 0.08,
    dup_trigram_max: float = 0.60,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1 —
    the word-n-gram family; the line-based family degenerates on
    single-line docs): per doc,

    * ``repeated_token_frac`` — 1 − distinct/total tokens;
    * ``top_bigram_frac`` — chars covered by the most frequent token
      bigram (count × bigram length / doc chars; ties broken by the
      lexicographically smallest bigram, so the output is
      deterministic). Overlapping occurrences ("a a a") double-count
      the shared token — the standard implementation shortcut;
    * ``dup_trigram_frac`` — chars covered by trigrams occurring more
      than once, capped at 1.0 (same shortcut);
    * ``verdict`` — first-match filter decision at the given caps.

    Plan shape: a PURE PROJECTION — the signals are all per-doc, so no
    cross-row aggregation exists to shuffle for.  Zero shuffles, zero
    joins — scan-parallel at any corpus size; per-row cost is
    O(k log k) for docs of k tokens (see repetition_mid_cols).
    """
    _reserve_working_col(docs, "_w", "repetition_signals")
    m = repetition_mid_cols(text_col, toks_col=F.col("_w"))
    mid = docs.withColumn("_w", _tokens(text_col)).select(
        F.col(id_col).alias("doc_id"),
        m["n_chars"].alias("n_chars"),
        m["n_tokens"].alias("n_tokens"),
        m["n_distinct"].alias("n_distinct"),
        m["_t2"].alias("_t2"),
        m["_d3"].alias("_d3"),
    )
    f = repetition_final_cols(
        top_bigram_max=top_bigram_max, dup_trigram_max=dup_trigram_max
    )
    return mid.select(
        F.col("doc_id"),
        F.col("n_tokens"),
        f["repeated_token_frac"].alias("repeated_token_frac"),
        f["top_bigram"].alias("top_bigram"),
        f["top_bigram_frac"].alias("top_bigram_frac"),
        f["dup_trigram_frac"].alias("dup_trigram_frac"),
        f["verdict"].alias("verdict"),
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


def winnow_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS algorithm): md5 each k-token shingle, slide a window of
    ``window`` consecutive shingle hashes, keep the minimum of each
    window, emit the distinct (doc, fingerprint) set.

    Guarantee: any token run shared by two docs of length
    ≥ window + k - 1 produces at least one shared fingerprint; output
    density is ~2/(window+1) of the shingle count. Hashes are md5 hex
    STRINGS compared lexically — deterministic and reproducible in the
    DuckDB oracle bit-for-bit (no engine-specific hash).

    Docs with fewer than ``window`` shingles keep their global-min
    hash as a single fingerprint (the pos-0 window is always emitted).

    Scale: the explode is per-doc linear; the rolling min is a bounded
    ROWS frame after one shuffle on the doc key; distinct adds a
    (doc, fingerprint) hash agg with map-side combine. The substrate
    stays linear in corpus size — frequency capping in
    fingerprint_overlap_pairs is what keeps the PAIR stage linear.
    """
    # split once under a name: the transform lambda is interpreted
    # per element with no subexpression elimination, so an inline
    # _tokens() would re-split the whole text at every shingle
    # position — O(tokens²) per doc (see dedup._shingles)
    toks = F.col("_w")
    n = F.size(toks)
    idxs = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    hashes = F.transform(
        idxs, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )
    _reserve_working_col(docs, "_w", "winnow_fingerprints")
    exploded = docs.withColumn("_w", _tokens(text_col)).select(
        F.col(id_col).alias("doc_id"), F.posexplode(hashes).alias("pos", "h")
    )
    doc_w = Window.partitionBy("doc_id")
    roll = doc_w.orderBy("pos").rowsBetween(Window.currentRow, window - 1)
    return (
        exploded.withColumn("fingerprint", F.min("h").over(roll))
        .withColumn("_nsh", F.count("*").over(doc_w))
        .filter(F.col("pos") <= F.greatest(F.col("_nsh") - window, F.lit(0)))
        .select("doc_id", "fingerprint")
        .distinct()
    )


_WORD = r"[^a-z0-9]+"


def _norm_tokens(text_col: str) -> Column:
    """Lowercased alphanumeric word stream (split on any non-[a-z0-9]
    run, empties dropped) — the tokenization both engines reproduce
    bit-identically, unlike locale-sensitive analyzers."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), _WORD), lambda t: t != ""
    )


def heavy_hitters(
    docs: DataFrame,
    *,
    k: int = 10,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Top-k most frequent tokens per group — the corpus-profiling op
    behind stopword-list induction and boilerplate discovery.

    Scale: the explode is per-doc linear and the (group, token) count
    is one shuffle with map-side combine; the ranking window runs over
    the already-aggregated count table (|distinct tokens| ≪ corpus), so
    the expensive stage never sees a window. Exact counts — for
    heavy-tail corpora where even the count table is huge, cap the
    candidate set with a min-count filter before ranking (same lever as
    fingerprint max_df).
    """
    counts = (
        docs.select(
            F.col(group_col), F.explode(_norm_tokens(text_col)).alias("token")
        )
        .groupBy(group_col, "token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k TF-IDF terms (keyword extraction / topic
    fingerprinting). tf = in-doc count, idf = ln(N/df) (unsmoothed),
    ranked by the ROUNDED score (4 dp) then token — rounding before
    ranking removes ulp-level cross-engine ambiguity in the tie order.

    Scale: two hash aggregates — (doc, token) and token df — plus a
    broadcast of the scalar corpus size; the rank window partitions by
    doc over ≤ |doc vocabulary| rows. No stage touches corpus² data.
    """
    toks = docs.select(
        F.col(id_col), F.explode(_norm_tokens(text_col)).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("token").agg(
        F.countDistinct(id_col).alias("df")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_counts, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "tfidf", "rank")
    )


def bigram_logprob_scores(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc mean bigram log-probability under an add-one-smoothed
    corpus bigram LM — the classic KenLM-style fluency filter shape
    (docs whose word transitions are improbable under the corpus score
    low): score(d) = avg over bigrams (w1,w2) of
    ln((C(w1,w2)+1) / (C(w1)+V)).

    Self-trained on the scored corpus in the same pass: one explode
    for unigram counts, one for bigrams, then the doc's bigrams join
    the count tables. Docs with <2 tokens have no bigrams and drop
    out, identically in both engines. Rounded to 4 dp AFTER the mean
    so the DuckDB oracle agrees despite summation-order ulps (same
    policy as anomaly_baseline). At heavy-tail scale, cap the bigram
    table with a min-count filter before the join (same lever as
    fingerprint max_df).

    Scale shape (reworked after a 13× super-linear sf1 probe): the
    count-table joins run at DISTINCT (doc, bigram) granularity —
    (doc_id, bg, n) from one map-side-combined aggregate — never at
    bigram-OCCURRENCE granularity, so the two string-keyed shuffles
    move the deduplicated bigram stream (repetitive docs collapse)
    and the mean is recovered exactly as Σ n·logp / Σ n (each
    occurrence of a bigram has the SAME logp, so the weighted form
    is the occurrence mean). The oracle mirrors the weighted form.
    """
    # same expression trees as the train/apply split (bigram_lm_train /
    # bigram_lm_score) — sharing _doc_bigrams/_doc_bigram_counts is
    # what KEEPS the self-scoring-equivalence contract true under
    # future edits
    base = docs.select(
        F.col(id_col), _norm_tokens(text_col).alias("_toks")
    ).select(
        F.col(id_col),
        "_toks",
        _doc_bigrams(text_col, F.col("_toks")).alias("_bgs"),
    )
    uni = (
        base.select(F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c1"))
    )
    vocab = uni.agg(F.count("*").alias("vocab"))
    db = _doc_bigram_counts(base, id_col)
    bic = db.groupBy("bg").agg(F.sum("n").alias("cbg"))
    scored = (
        db.join(bic, "bg")
        .join(
            uni,
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)) == uni["token"],
        )
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_logp",
            F.log((F.col("cbg") + 1.0) / (F.col("c1") + F.col("vocab"))),
        )
    )
    return _weighted_logp_mean(scored, id_col)


def _doc_bigram_counts(base: DataFrame, id_col: str) -> DataFrame:
    """(doc_id, bg, n) — each doc's DISTINCT bigrams with occurrence
    counts, from a frame carrying ``_bgs``. The one granularity every
    bigram-LM join runs at: the explode is immediately reduced by a
    map-side-combined aggregate, so downstream shuffles move the
    deduplicated bigram stream, not one row per occurrence."""
    return (
        base.select(F.col(id_col), F.explode("_bgs").alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count("*").alias("n"))
    )


def _weighted_logp_mean(scored: DataFrame, id_col: str) -> DataFrame:
    """Per-doc (n_bigrams, avg_logp) from (doc_id, n, _logp) rows at
    distinct-bigram granularity: Σn·logp / Σn IS the occurrence mean
    (every occurrence of a bigram shares one logp), rounded to 4 dp
    after the division — the summation-order-ulp policy unchanged."""
    return scored.groupBy(id_col).agg(
        F.sum("n").alias("n_bigrams"),
        F.round(
            F.sum(F.col("n") * F.col("_logp")) / F.sum("n"), 4
        ).alias("avg_logp"),
    )


def _doc_bigrams(text_col: str, toks_col: Column | None = None) -> Column:
    """Positional bigram array. ``toks_col``: pass the normalized
    token array as a MATERIALIZED column — the transform lambda is
    interpreted per element, so the inline default re-splits the text
    per bigram position, O(tokens²)/doc (see dedup._shingles)."""
    toks = toks_col if toks_col is not None else _norm_tokens(text_col)
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i - 1), F.element_at(toks, i)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigram_lm_train(
    ref_docs: DataFrame, *, text_col: str = "text", min_count: int = 1
) -> dict:
    """Train the add-one-smoothed bigram LM on a REFERENCE corpus:
    returns ``{"unigrams", "bigrams", "vocab"}`` count frames for
    :func:`bigram_lm_score` — the train/apply split
    :func:`bigram_logprob_scores` collapses into one pass when model
    corpus and scored corpus coincide.

    This is the real KenLM filter pattern: train once on a trusted
    reference (e.g. Wikipedia), score every crawl batch against it.
    ``min_count`` prunes the bigram table before it ever reaches a
    join — the heavy-tail lever at 100 TB (a trillion-token reference
    has a bigram tail that dwarfs the useful mass).
    """
    base = ref_docs.select(
        _norm_tokens(text_col).alias("_toks")
    ).select(
        "_toks", _doc_bigrams(text_col, F.col("_toks")).alias("_bgs")
    )
    uni = (
        base.select(F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c1"))
    )
    bic = (
        base.select(F.explode("_bgs").alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("cbg"))
        .filter(F.col("cbg") >= min_count)
    )
    return {"unigrams": uni, "bigrams": bic, "vocab": uni.agg(F.count("*").alias("vocab"))}


def bigram_lm_score(
    docs: DataFrame,
    model: dict,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a trained bigram LM (see
    :func:`bigram_lm_train`): mean over the doc's bigrams of
    ``ln((C(w1,w2)+1) / (C(w1)+V))`` with counts from the MODEL
    corpus — bigrams and unigrams unseen at training count 0 (the
    smoothing floor ``ln(1/V)``-ish), which is exactly the
    out-of-domain penalty the filter exists to apply.

    Same output schema as bigram_logprob_scores; scoring the training
    corpus itself reproduces it exactly (every count present → the
    left joins behave as inner). The model-count joins shuffle the
    doc bigram stream on bg / w1 at DISTINCT (doc, bigram)
    granularity (the bigram_logprob_scores rework — occurrence rows
    never shuffle); at serving scale a pruned model (min_count)
    usually broadcasts instead.
    """
    db = _doc_bigram_counts(
        docs.select(
            F.col(id_col), _norm_tokens(text_col).alias("_toks")
        ).select(
            F.col(id_col),
            _doc_bigrams(text_col, F.col("_toks")).alias("_bgs"),
        ),
        id_col,
    )
    scored = (
        db.join(model["bigrams"], "bg", "left")
        .withColumn("cbg", F.coalesce(F.col("cbg"), F.lit(0)))
        .join(
            model["unigrams"],
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
            == model["unigrams"]["token"],
            "left",
        )
        .withColumn("c1", F.coalesce(F.col("c1"), F.lit(0)))
        .crossJoin(F.broadcast(model["vocab"]))
        .withColumn(
            "_logp",
            F.log((F.col("cbg") + 1.0) / (F.col("c1") + F.col("vocab"))),
        )
    )
    return _weighted_logp_mean(scored, id_col)


# PII patterns chosen for identical semantics under Java regex (Spark)
# and RE2 (DuckDB): ASCII classes, \b word boundaries, no backrefs,
# inline (?i) where letters appear (addresses are case-insensitive —
# a lowercase-only email pattern would leak Mixed.Case@Example.COM).
PII_PATTERNS: dict[str, str] = {
    "email": r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def pii_scrub(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "scrubbed",
) -> DataFrame:
    """Redact emails/IPv4s/phone numbers and count what was removed —
    the standard pre-training scrub pass.

    Order matters: each category is counted on the text as already
    scrubbed by the previous categories, so a digit run inside an
    email (user1.2.3.4@host.example.com) is redacted once, as an
    email, never re-counted as an IP or phone. Pure projection
    (regexp_count + regexp_replace), zero shuffle, codegen-friendly.
    """
    stage = F.col(text_col)
    count_cols = []
    for name, pat in PII_PATTERNS.items():
        # count on the PREVIOUS stage's text, then scrub: each match is
        # counted under exactly one category
        count_cols.append(
            F.regexp_count(stage, F.lit(pat)).cast("bigint").alias(f"n_{name}s")
        )
        stage = F.regexp_replace(stage, pat, f"<{name.upper()}>")
    return docs.select(F.col(id_col), *count_cols, stage.alias(out_col))


def k_anonymity_report(
    df,
    *,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Privacy audit companion to :func:`pii_scrub`: the
    k-anonymity check over a quasi-identifier set — every
    equivalence class (distinct quasi-identifier combination) with
    FEWER than ``k`` members is a re-identification risk (Sweeney's
    criterion: a release is k-anonymous iff no class is smaller than
    k), reported with its size so the caller can suppress or
    generalize exactly those rows. NULL is a class value like any
    other (two rows both missing a column are indistinguishable —
    they generalize each other).

    One hash aggregate on the quasi columns + the < k filter: output
    is bounded by the number of RISKY classes, not rows — the audit
    a 100 TB release pipeline runs before every export."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("class_size"))
        .filter(F.col("class_size") < k)
    )


# html_extract_text's staged pipeline — every pattern is RE2-portable
# (no backrefs, no lookaround) so the DuckDB oracle can state the
# identical chain; (?is) case-insensitive dot-all prefixes work in
# both Java regex and RE2.
_HTML_STRIP_STAGES: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b[^>]*>.*?</script>", " "),   # executable noise
    (r"(?is)<style\b[^>]*>.*?</style>", " "),     # presentation noise
    (r"(?s)<!--.*?-->", " "),                     # comments
    (r"(?is)</?(p|div|br|li|tr|h[1-6])\b[^>]*>", "\n"),  # block breaks
    (r"(?s)<[^>]*>", " "),                        # every remaining tag
)
_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: earlier would double-decode &amp;lt;
)


def html_extract_text(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "html",
    out_col: str = "text",
) -> DataFrame:
    """Boilerplate-stripping text extraction from raw HTML — the
    first stage of a crawl→corpus pipeline (everything downstream:
    quality, dedup, langid, packing assumes THIS ran). Staged
    regexp_replace chain: script/style/comment blocks vanish
    wholesale (their CONTENT is not text), block-level tags become
    newlines (so 'one</p><p>two' doesn't fuse into 'onetwo'),
    remaining tags become spaces, the five standard entities decode
    (&amp; last — decoding it first would double-decode '&amp;lt;'),
    and whitespace collapses per line with blank lines dropped.

    Pure projection, zero shuffle, codegen-friendly — the same scale
    shape as pii_scrub. Honest boundary: this is the deterministic
    tag-strip baseline (what a 100 TB first pass can afford), not a
    readability/per-site extractor; nested <script> inside strings
    and malformed markup degrade to extra whitespace, never to
    dropped text."""
    stage = F.col(text_col)
    for pat, repl in _HTML_STRIP_STAGES:
        stage = F.regexp_replace(stage, pat, repl)
    for ent, ch in _HTML_ENTITIES:
        stage = F.replace(stage, F.lit(ent), F.lit(ch))
    # collapse runs of spaces/tabs, then trim each line, drop empties
    stage = F.regexp_replace(stage, r"[ \t]+", " ")
    stage = F.regexp_replace(stage, r" ?\n ?", "\n")
    stage = F.regexp_replace(stage, r"\n{2,}", "\n")
    # trim() strips spaces only — boundary newlines need the anchors
    stage = F.trim(F.regexp_replace(stage, r"^\n+|\n+$", ""))
    return docs.select(
        F.col(id_col),
        stage.alias(out_col),
        F.length(stage).alias("n_chars"),
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    min_hits: int = 2,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share
    winnowing fingerprints with an evaluation set — the standard
    pre-training hygiene pass (a doc containing an eval item's text
    would leak the benchmark into training).

    Winnowing gives the n-gram-overlap guarantee cheaply: any shared
    token run of length ≥ window + k − 1 produces at least one shared
    fingerprint, so ``min_hits`` shared fingerprints ≈ a substantive
    shared passage, not a stray k-gram.

    Scale shape: the corpus side is one linear fingerprint projection
    + per-doc count; the BENCHMARK side is small by nature (eval sets
    are thousands of items, not billions), so its distinct fingerprint
    set broadcasts and the membership probe is a broadcast semi-join —
    no corpus shuffle keyed on fingerprint, no pair blowup. Output:
    one row per corpus doc with the contaminated-fingerprint count,
    fraction, and verdict.
    """
    # checkpointed: the hit probe and the per-doc size aggregate both
    # read the corpus fingerprint table — one winnow pass, not two
    corpus_fp = winnow_fingerprints(
        docs, id_col=id_col, text_col=text_col, k=k, window=window
    ).localCheckpoint(eager=False).transform(_ckpt_register)
    bench_fp = winnow_fingerprints(
        benchmark, id_col=id_col, text_col=text_col, k=k, window=window
    ).select("fingerprint").distinct()
    hits = (
        corpus_fp.join(F.broadcast(bench_fp), "fingerprint", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("contaminated_fp"))
    )
    sizes = corpus_fp.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    out = sizes.join(hits, "doc_id", "left")
    contaminated = F.coalesce(F.col("contaminated_fp"), F.lit(0))
    return out.select(
        "doc_id",
        F.col("n_fp"),
        contaminated.cast("bigint").alias("contaminated_fp"),
        F.round(contaminated / F.col("n_fp"), 4).alias("contaminated_frac"),
        F.when(contaminated >= min_hits, "contaminated")
        .otherwise("clean")
        .alias("verdict"),
    )


def vocab_top_n(
    docs: DataFrame,
    *,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """The reference vocabulary a tokenizer ships with: the ``top_n``
    most frequent normalized tokens of a reference corpus (count
    desc, token asc tiebreak — deterministic). One map-side-combined
    count shuffle + a rank over the AGGREGATED vocab only; output is
    ≤ top_n rows regardless of corpus size."""
    counts = (
        docs.select(F.explode(_norm_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counts.withColumn("vocab_rank", F.row_number().over(w))
        .filter(F.col("vocab_rank") <= top_n)
        .select("token", "cnt", "vocab_rank")
    )


def oov_stats(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc out-of-vocabulary rate against a reference vocabulary
    — the tokenizer-coverage QA a pipeline runs before committing to
    a vocab (high OOV → the tokenizer fragments this slice into
    bytes/unknowns; a training mix wants to know WHICH sources pay
    that cost).

    Scale shape: vocab is tokenizer-sized (10⁴-10⁵ rows) → broadcast
    left join per exploded token, then one per-doc count — the corpus
    is never shuffled on the token key. Docs with no tokens report
    NULL oov_rate (nothing to cover, distinct from perfect coverage).

    Output: (id, n_tokens, n_oov, oov_rate round 6).
    """
    toks = docs.select(
        F.col(id_col), F.explode(_norm_tokens(text_col)).alias("token")
    )
    flagged = toks.join(
        F.broadcast(vocab.select("token", F.lit(1).alias("_in"))),
        "token",
        "left",
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    # left join back so tokenless docs still appear (NULL stats)
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
            F.round(
                F.col("n_oov") / F.nullif(F.col("n_tokens"), F.lit(0)), 6
            ).alias("oov_rate"),
        )
    )


def encoding_signals(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encoding-damage QA signals — the mojibake/corruption screen a
    crawl pipeline runs before any text op trusts the bytes:

    * ``n_replacement`` — U+FFFD replacement characters (a decoder
      already gave up on those bytes);
    * ``n_control``     — C0 control chars except tab/newline/CR, plus
      DEL (binary-in-text witness);
    * ``n_c1``          — C1 block U+0080–U+009F (the classic
      cp1252-bytes-decoded-as-latin1 artifact);
    * ``n_mojibake``    — double-encoding pair signatures ('Ã' +
      latin-1 tail, 'â€' curly-quote wrecks): UTF-8 bytes decoded as
      latin-1/cp1252;
    * ``bad_ratio``     — damaged chars / total chars;
    * ``verdict``       — first-failing-rule (the Gopher-battery
      discipline): replacement → control → mojibake → ok.

    All counts are replace-length / match-count integer arithmetic
    over built-in regexps — a zero-shuffle projection, exact on any
    engine (the same recipe as the Gopher battery), so the gate
    hash-pins every count. 100 TB: runs in the scan, no state.
    """
    t = F.col(text_col)
    n_chars = F.length(t)

    def _char_count(pattern: str) -> Column:
        return n_chars - F.length(F.regexp_replace(t, pattern, ""))

    n_repl = _char_count("\ufffd")
    n_ctrl = _char_count("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")
    n_c1 = _char_count("[\\u0080-\\u009F]")
    n_moji = F.regexp_count(t, F.lit("Ã[\\u00A0-\\u00FF]|â€"))
    bad = n_repl + n_ctrl + n_c1 + n_moji
    return docs.select(
        id_col,
        n_chars.cast("bigint").alias("n_chars"),
        n_repl.cast("bigint").alias("n_replacement"),
        n_ctrl.cast("bigint").alias("n_control"),
        n_c1.cast("bigint").alias("n_c1"),
        n_moji.cast("bigint").alias("n_mojibake"),
        F.round(bad / F.nullif(n_chars, F.lit(0)), 6).alias("bad_ratio"),
        F.when(n_repl > 0, "replacement")
        .when(n_ctrl > 0, "control")
        .when((n_c1 > 0) | (n_moji > 0), "mojibake")
        .otherwise("ok")
        .alias("verdict"),
    )


def bloom_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    k_hash: int = 3,
    m_bits: int = 65536,
    min_hits: int = 2,
) -> DataFrame:
    """:func:`contamination_flags` with the eval-set fingerprint table
    compressed into a fixed-size Bloom bitmap (sketches.bloom_bitmap)
    instead of broadcast as a distinct-fingerprint table.

    Why: the exact path broadcasts one 32-char string per distinct
    eval fingerprint — fine for thousands of eval items, but a
    full benchmark SUITE (or a deny-list of previously-leaked
    passages) can reach 10^8 fingerprints ≈ gigabytes, past broadcast
    limits. The bitmap is m_bits/8 bytes REGARDLESS of eval size and
    merges across eval shards by nibble-OR, so the 100 TB posture is:
    build one bitmap per eval source, OR them, probe the corpus with
    a pure zero-join projection.

    The trade is one-sided error: ``maybe_fp`` over-counts with
    probability ≈ (1 − e^(−k_hash·n/m_bits))^k_hash per fingerprint
    (never under-counts), so verdicts here are a SUPERSET of the
    exact path's — safe for decontamination, where a false positive
    drops a clean doc but a false negative leaks the benchmark.

    Positions come from the fingerprints' own md5 hex
    (``already_hex``), so the DuckDB oracle reproduces the bitmap and
    every probe bit-for-bit.
    """
    from . import sketches

    corpus_fp = winnow_fingerprints(
        docs, id_col=id_col, text_col=text_col, k=k, window=window
    )
    bench_fp = winnow_fingerprints(
        benchmark, id_col=id_col, text_col=text_col, k=k, window=window
    ).select("fingerprint").distinct()
    # Collected once (m/8 bytes) and embedded as a literal: a
    # crossJoin would copy the bitmap string into EVERY corpus
    # fingerprint row (measured ~2× the whole gate's cost at sf0.1).
    # bloom_bitmap_str returns the hex string directly — one
    # positions job, no single-row frame round-trip.
    bitmap = sketches.bloom_bitmap_str(
        bench_fp, "fingerprint", k=k_hash, m_bits=m_bits,
        already_hex=True,
    )
    probed = corpus_fp.withColumn(
        "_maybe",
        sketches.bloom_member_col(
            F.col("fingerprint"), bitmap,
            k=k_hash, m_bits=m_bits, already_hex=True,
        ),
    )
    per_doc = probed.groupBy(id_col).agg(
        F.count("*").alias("n_fp"),
        F.sum(F.col("_maybe").cast("bigint")).alias("maybe_fp"),
    )
    return per_doc.select(
        id_col,
        "n_fp",
        "maybe_fp",
        F.round(F.col("maybe_fp") / F.col("n_fp"), 4).alias("maybe_frac"),
        F.when(F.col("maybe_fp") >= min_hits, "maybe_contaminated")
        .otherwise("clean")
        .alias("verdict"),
    )


def fingerprint_overlap_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    max_df: int | None = 100,
    min_overlap: int = 2,
    shuffle_target_rows: int | None = None,
) -> DataFrame:
    """Winnowing-based near-duplicate/containment pairs: join docs on
    shared fingerprints, score each pair by shared-fingerprint count
    and containment = shared / min(|fp_a|, |fp_b|).

    ``max_df`` drops fingerprints appearing in more than that many
    docs before pairing — boilerplate k-grams (licence headers,
    navigation chrome) are exactly the hot keys that would otherwise
    make the self-join quadratic; with the cap, candidate pairs are
    bounded by max_df²·F (F = distinct capped fingerprints), linear
    in corpus for fixed max_df. This is the standard scale lever for
    MOSS-style matching.

    The fingerprint-keyed self-join sizes its shuffle to the
    estimated fingerprint volume (Σ max(len−k+1, 0) × 2/(window+1) —
    winnowing keeps ~2/(w+1) of positions; one column-pruned
    pre-pass via ``dedup.data_proportional_partitions``) whenever the
    estimate exceeds the session default — the executable
    data-proportional knob of the round-12 verdict; plans at gate
    scale are untouched.
    """
    from .dedup import _reserve_working_col, WINDOW_TARGET_ROWS, data_proportional_partitions

    fp = winnow_fingerprints(
        docs, id_col=id_col, text_col=text_col, k=k, window=window
    )
    t = F.col(text_col)
    n_wide = data_proportional_partitions(
        docs.filter(t.isNotNull()),
        F.greatest(F.length(t) - k + 1, F.lit(0))
        * F.lit(2.0) / F.lit(window + 1.0),
        target_rows=(
            WINDOW_TARGET_ROWS
            if shuffle_target_rows is None
            else shuffle_target_rows
        ),
    )
    if n_wide is not None:
        fp = fp.repartition(n_wide, "fingerprint")
    # the (doc, fingerprint) table feeds the df cap, the per-doc
    # sizes, and BOTH sides of the pair self-join — checkpoint so the
    # winnow chain (explode → rolling-min window → distinct) runs
    # once, not once per consumer (5 copies in the physical plan
    # before, visible as 16 Window nodes)
    fp = fp.localCheckpoint(eager=False).transform(_ckpt_register)
    if max_df is not None:
        df_counts = fp.groupBy("fingerprint").agg(
            F.count("*").alias("_df")
        )
        fp = (
            fp.join(df_counts, "fingerprint")
            .filter(F.col("_df") <= max_df)
            .drop("_df")
            .localCheckpoint(eager=False).transform(_ckpt_register)  # sizes + two join sides
        )
    sizes = fp.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a, b = fp.alias("a"), fp.alias("b")
    pairs = (
        a.join(b, "fingerprint")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared_fp"))
        .filter(F.col("shared_fp") >= min_overlap)
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("_na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("_nb")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fp",
            F.round(
                F.col("shared_fp") / F.least("_na", "_nb"), 6
            ).alias("containment"),
        )
    )


def corpus_card(
    docs: DataFrame,
    *,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus "data card": the health rollup a training
    pipeline publishes alongside its shards (the corpus analogue of
    the reference's compliance report, app.py:933-1004 — same
    one-pass, no-N+1 aggregation discipline).

    Per source: document and estimated-token census, what fraction the
    quality gate keeps (integer permille — oracle-exact), language
    count, and the Shannon entropy of the language mix in bits
    (rounded to 4 dp AFTER the sum, the cross-engine float policy
    every log-based gate here uses). Entropy ~0 flags single-language
    sources; high entropy flags mixed crawls that need per-language
    routing.

    Two hash aggregates, both low-cardinality keys: (source, lang)
    then source — the standard two-level rollup for distribution
    stats; nothing touches the corpus twice.
    """
    sig = quality_signal_cols(text_col)
    per_lang = (
        docs.select(
            F.col(source_col).alias("source"),
            F.col(lang_col).alias("lang"),
            F.ceil(F.length(F.col(text_col)) / F.lit(4.0))
            .cast("bigint")
            .alias("_est"),
            (sig["verdict"] == "keep").cast("int").alias("_keep"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("_n"),
            F.sum("_est").alias("_tok"),
            F.sum("_keep").alias("_kept"),
        )
    )
    n_total = F.sum("_n")
    p = F.col("_n") / F.sum("_n").over(Window.partitionBy("source"))
    return (
        per_lang.withColumn("_p", p)
        .groupBy("source")
        .agg(
            n_total.alias("n_docs"),
            F.sum("_tok").alias("est_tokens"),
            F.expr("sum(_kept) * 1000 div sum(_n)").alias("keep_permille"),
            F.count("*").alias("n_langs"),
            F.round(
                -F.sum(F.col("_p") * F.log2("_p")), 4
            ).alias("lang_entropy_bits"),
        )
    )


def hash_embeddings(
    docs: DataFrame,
    *,
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashing-trick document embeddings — the feature-hashing
    vectorizer (Weinberger et al., ICML 2009; sklearn's
    HashingVectorizer): each lowercased whitespace token hashes to a
    bucket (first two md5 hex digits mod ``dim``) with a ±1 sign
    (third digit's high bit), per-document signed counts are
    L2-normalized. No vocabulary, no fitting, no state — the property
    that makes it THE streaming/distributed featurizer: any executor
    embeds any document independently, and the embedding of a corpus
    is a pure projection + one hash aggregation (same plan shape as
    SimHash's 64-sum agg).

    This bridges the text table into embedding space: the ANN /
    near-dup / outlier operators run on real documents through it
    (hash_embeddings → cosine_topk/pq_topk/kmeans_outliers), not just
    on a precomputed embedding column.

    All arithmetic before the final normalization is exact integer
    (signed counts, integer sum-of-squares), so the embedding is
    bit-reproducible in any engine with md5 — the DuckDB oracle
    re-derives it verbatim.

    Output: (id, n_tokens, norm double, embedding array<double>
    L2-normalized; NULL embedding when every bucket cancelled to
    norm 0).
    """
    _check_bucket_dim(dim)
    toks = docs.select(
        F.col(id_col),
        F.explode(_lower_ws_tokens(text_col)).alias("tok"),
    )
    hashed = toks.selectExpr(
        id_col,
        f"{_md5_bucket_sql(dim)} AS bucket",
        "CASE WHEN CAST(conv(substring(md5(tok), 3, 1), 16, 10) AS INT) "
        ">= 8 THEN -1 ELSE 1 END AS sign",
    )
    # each bucket sum as ONE parsed expr string — the Column-builder
    # form costs ~15 py4j round-trips per bucket of pure driver-side
    # construction per gate call (see nb_hashed_classify); same tree
    counts = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        *[
            F.expr(
                "CAST(sum(CASE WHEN (bucket = "
                f"{i}) THEN sign ELSE 0 END) AS BIGINT) AS c{i}"
            )
            for i in range(dim)
        ],
    )
    norm2 = " + ".join(f"c{i} * c{i}" for i in range(dim))
    return counts.selectExpr(
        id_col,
        "n_tokens",
        f"sqrt(CAST({norm2} AS DOUBLE)) AS norm",
        f"CASE WHEN {norm2} > 0 THEN array("
        + ", ".join(
            f"CAST(c{i} AS DOUBLE) / sqrt(CAST({norm2} AS DOUBLE))"
            for i in range(dim)
        )
        + ") END AS embedding",
    )


def bpe_learn(
    docs: DataFrame,
    *,
    n_merges: int = 200,
    min_word_count: int = 1,
    max_words: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn a byte-pair-encoding merge table (Sennrich et al., ACL
    2016) with the split that scales: the ONLY corpus-sized pass is a
    distributed word-frequency aggregation (explode → groupBy word),
    and the merge loop then runs driver-side over the compact
    (word, count) vocabulary — exactly how production tokenizers
    train (the vocab table is bounded by ``max_words``, not by corpus
    size, so a 100 TB corpus and a 100 GB corpus hand the driver the
    same-sized problem).

    Determinism: words are capped top-``max_words`` by (count DESC,
    word ASC); each merge picks the (count DESC, pair ASC) best
    adjacent symbol pair; every step is a pure function of the word
    frequencies. Returns merges in learned order (rank = position).
    """
    wf_rows = (
        docs.select(
            F.explode(_lower_ws_tokens(text_col)).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_word_count)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + ("</w>",): r["cnt"] for r in wf_rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing repeats; further merges are memorization
        merges.append(best)
        merged: dict[tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + cnt
        vocab = merged
    return merges


def bpe_encode_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    """Greedy ranked BPE apply for one word: repeatedly merge every
    occurrence of the LOWEST-RANK adjacent pair present (the
    Sennrich/HF apply rule — mirrors the learner, so a word seen in
    training re-segments identically)."""
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(sym, sym[1:]):
            r = rank.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        out = []
        i = 0
        while i < len(sym):
            if (
                i + 1 < len(sym)
                and sym[i] == best_pair[0]
                and sym[i + 1] == best_pair[1]
            ):
                out.append(sym[i] + sym[i + 1])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document REAL BPE token counts under a learned merge table
    — replaces the chars/4 heuristic wherever the token budget
    matters (packing, epoch planning, mixture weights).

    Arrow-batched mapInPandas with the merge-rank dict captured in
    the closure (broadcast with the task — a merge table is KBs) and
    a per-batch word→len memo: Zipf does the rest, most words in a
    batch are repeats. Output: (id, n_words, n_bpe_tokens,
    avg_tokens_per_word round 4) for docs with ≥1 token.
    """
    import pandas as pd

    from pyspark.sql import types as T

    rank = {pair: i for i, pair in enumerate(merges)}
    src = docs.select(
        F.col(id_col),
        _lower_ws_tokens(text_col).alias("_words"),
    ).filter(F.size("_words") > 0)
    # the id column keeps the CALLER's name and type (string doc ids
    # from the JSONL readers pass through untouched)
    id_field = src.schema[id_col]
    schema = T.StructType([
        id_field,
        T.StructField("n_words", T.LongType(), True),
        T.StructField("n_bpe_tokens", T.LongType(), True),
        T.StructField("avg_tokens_per_word", T.DoubleType(), True),
    ])

    def batches(parts):
        cache: dict[str, int] = {}

        def word_len(w: str) -> int:
            n = cache.get(w)
            if n is None:
                n = len(bpe_encode_word(w, rank))
                cache[w] = n
            return n

        for pdf in parts:
            rows = []
            for mid, words in zip(pdf[id_col], pdf["_words"]):
                total = sum(word_len(w) for w in words)
                rows.append((
                    mid,
                    len(words),
                    total,
                    round(total / len(words), 4),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_words", "n_bpe_tokens",
                    "avg_tokens_per_word",
                ],
            )

    return src.mapInPandas(batches, schema=schema)


def vocab_drift(
    old: DataFrame,
    new: DataFrame,
    *,
    top_n: int = 500,
    smoothing: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Token-distribution drift between two corpus snapshots — the
    crawl-QA companion to :func:`~..operators.dedup.corpus_diff`:
    where corpus_diff says WHICH documents changed, vocab_drift says
    what the change DID to the language (a scraper picking up nav
    boilerplate, a domain shift, a language mix swing all show up as
    mass moving between tokens before any model ever trains on it).

    Construction: each side's lowercased whitespace tokens are
    counted; the comparison vocabulary is the UNION of each side's
    top-``top_n`` tokens (rank by count DESC, token ASC —
    deterministic); add-``smoothing`` probabilities over that shared
    vocabulary give per-token KL(new ‖ old) contributions. Restricting
    to the top-N union is what scales: the full vocabulary is
    unbounded heavy-tail, the drift signal lives in the head, and the
    output is ≤ 2·top_n rows regardless of corpus size.

    Shuffle shape: one token-keyed aggregation per side (map-side
    combined), two rank windows over the AGGREGATED vocab only, one
    full-outer equi-join of two ≤top_n frames. All counts integer-
    exact; probabilities and log terms are fixed-order double
    expressions (oracle-reproducible).

    Output per vocab token: (token, c_old, c_new, p_old, p_new,
    kl_term = p_new·ln(p_new/p_old), verdict ∈
    {new, vanished, shifted} by presence in the raw counts).
    """

    def side_counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(_lower_ws_tokens(text_col)).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    oc = side_counts(old, "c_old")
    nc = side_counts(new, "c_new")

    def top(df: DataFrame, c: str) -> DataFrame:
        # TakeOrderedAndProject (per-partition top-N, driver merge) —
        # same deterministic set as a global rank window with the
        # (count DESC, token ASC) tie rule, without funnelling the
        # whole vocabulary through one task
        return (
            df.orderBy(F.desc(c), F.asc("token"))
            .limit(top_n)
            .select("token")
        )

    vocab = top(oc, "c_old").union(top(nc, "c_new")).distinct()
    joined = (
        vocab.join(oc, "token", "left")
        .join(nc, "token", "left")
        .select(
            "token",
            F.coalesce("c_old", F.lit(0)).alias("c_old"),
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
        )
    )
    # totals over the restricted vocab (single-row frames, broadcast)
    totals = joined.agg(
        F.sum("c_old").alias("t_old"),
        F.sum("c_new").alias("t_new"),
        F.count(F.lit(1)).alias("v"),
    )
    s = float(smoothing)
    p_old = (F.col("c_old") + s) / (F.col("t_old") + s * F.col("v"))
    p_new = (F.col("c_new") + s) / (F.col("t_new") + s * F.col("v"))
    verdict = (
        F.when(F.col("c_old") == 0, "new")
        .when(F.col("c_new") == 0, "vanished")
        .otherwise("shifted")
    )
    return (
        joined.crossJoin(F.broadcast(totals))
        .select(
            "token",
            "c_old",
            "c_new",
            F.round(p_old, 8).alias("p_old"),
            F.round(p_new, 8).alias("p_new"),
            F.round(p_new * F.log(p_new / p_old), 8).alias("kl_term"),
            verdict.alias("verdict"),
        )
    )


def nb_hashed_classify(
    train_docs: DataFrame,
    score_docs: DataFrame,
    *,
    label_col: str = "lang",
    dim: int = 32,
    smoothing: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed multinomial Naive Bayes — the model-based document
    classifier/filter pattern (CCNet's fastText quality filter, domain
    routers) in its fully-relational form: token features are the same
    md5 buckets as :func:`hash_embeddings`, training is per-(label,
    bucket) INTEGER counting, and scoring is a fixed-order expression
    over the pivoted count columns — so train AND score are one
    declarative plan with no driver-side model object, and the whole
    classifier (training included) is oracle-reproducible.

    score(doc, l) = ln((d_l + s) / (D + s·k))
                  + Σᵢ cᵢ · ln((mₗᵢ + s) / (Mₗ + s·dim))

    with d_l = docs of label l, D = total train docs, k = labels,
    mₗᵢ = label-l tokens in bucket i, Mₗ = label-l tokens, cᵢ = the
    scored doc's bucket counts. All counts integers; every float op
    sits in one fixed left-to-right expression — no float fold over
    rows anywhere.

    Shuffle shape: one (label) agg over the train tokens + one (label)
    doc-count agg (both k-row outputs, broadcast), one (doc) agg over
    the score tokens, a crossJoin of N docs × k label rows, one
    ranking window. At 100 TB the model side is k·(dim+2) integers —
    nothing to persist, nothing to drift.

    Output: (id, pred_label, score round 6, margin round 6 — NULL
    when k = 1) for score docs with ≥1 token.
    """
    _check_bucket_dim(dim)
    bucket = _md5_bucket_sql(dim)

    def toks(df: DataFrame, *cols) -> DataFrame:
        return df.select(
            *cols,
            F.explode(_lower_ws_tokens(text_col)).alias("tok"),
        ).selectExpr(*[str(c) for c in cols], f"{bucket} AS bucket")

    train = train_docs.filter(F.col(label_col).isNotNull())
    # each pivot column as ONE parsed expr string — the
    # Column-builder form costs ~15 py4j round-trips per bucket
    # (measured ~1 s of driver-side construction per gate call at
    # dim=32; the _lit_array/_dot_literal_sql tax), identical tree
    pivot = (
        toks(train, label_col)
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m_tot"),
            *[
                F.expr(
                    "CAST(sum(CASE WHEN (bucket = "
                    f"{i}) THEN 1 ELSE 0 END) AS BIGINT) AS m{i}"
                )
                for i in range(dim)
            ],
        )
    )
    doc_counts_by_label = train.groupBy(label_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("d_l")
    )
    model = pivot.join(doc_counts_by_label, label_col)
    globals_ = model.agg(
        F.sum("d_l").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    model = model.crossJoin(F.broadcast(globals_))

    scored_counts = (
        toks(score_docs, id_col)
        .groupBy(id_col)
        .agg(
            *[
                F.expr(
                    "CAST(sum(CASE WHEN (bucket = "
                    f"{i}) THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
                )
                for i in range(dim)
            ],
        )
    )
    s = float(smoothing)
    score_sql = f"ln((d_l + {s!r}D) / (n_docs + {s!r}D * k))" + "".join(
        f" + c{i} * ln((m{i} + {s!r}D) / (m_tot + {s!r}D * {dim}))"
        for i in range(dim)
    )
    paired = scored_counts.crossJoin(F.broadcast(model)).withColumn(
        "_score", F.expr(score_sql)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_score"), F.asc(label_col)
    )
    return (
        paired.withColumn("_rn", F.row_number().over(w))
        .withColumn("_next", F.lead("_score").over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col(label_col).alias("pred_label"),
            F.round("_score", 6).alias("score"),
            F.round(F.col("_score") - F.col("_next"), 6).alias("margin"),
        )
    )


def relative_quality_filter(
    docs: DataFrame,
    *,
    keep_frac: float = 0.7,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum RELATIVE quality thresholding: rank documents
    within each stratum (language/source) by a continuous quality
    score and keep the top ``keep_frac`` of EACH stratum — the
    language-fair alternative to one global cutoff, which
    systematically deletes low-resource languages whose absolute
    scores sit below the high-resource mode (the CCNet per-language
    perplexity-bucket rationale).

    Score: ``stopword_ratio − punct_ratio`` (fluency signal minus
    noise signal, both already shared with the quality gate); ties →
    lowest id, so the cut is deterministic. Keep count =
    ``ceil(keep_frac · n_stratum)`` — exact integer arithmetic after
    one float multiply evaluated identically by any IEEE engine.

    Shuffle shape: one projection for the score, ONE rank window per
    stratum (count via the companion window, no extra join), output
    carries the kept flag rather than dropping rows — callers filter,
    audits see both sides.

    Output: (id, strata, q_score round 6, q_rank, n_stratum, kept).
    """
    c = quality_signal_cols(text_col)
    scored = docs.select(
        F.col(id_col),
        F.col(strata_col),
        (c["stopword_ratio"] - c["punct_ratio"]).alias("_q"),
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.desc("_q"), F.asc(id_col)
    )
    wc = Window.partitionBy(strata_col)
    return (
        scored.withColumn("q_rank", F.row_number().over(w))
        .withColumn("n_stratum", F.count(F.lit(1)).over(wc))
        .select(
            id_col,
            strata_col,
            F.round("_q", 6).alias("q_score"),
            F.col("q_rank").cast("bigint").alias("q_rank"),
            F.col("n_stratum").cast("bigint").alias("n_stratum"),
            (
                F.col("q_rank")
                <= F.ceil(F.lit(float(keep_frac)) * F.col("n_stratum"))
            ).alias("kept"),
        )
    )


def compression_signals(
    docs: DataFrame,
    *,
    level: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document zlib compression ratio — the cheapest
    whole-document repetition detector in the quality-filtering
    toolbox: highly compressible text is boilerplate, template spam,
    or keyword stuffing (the signal complements the n-gram repetition
    caps, which see LOCAL repeats; DEFLATE's 32 KB window sees
    document-scale structure). Low ratios flag near-random content
    (minified blobs, encoded payloads) from the other tail.

    Arrow-batched mapInPandas over UTF-8 bytes with stdlib zlib —
    deterministic for a fixed zlib build and level, but the byte
    stream is codec-version-specific, so this is a rows-only gate
    (schema + exact row count pinned; semantics pytest-pinned), like
    the xxhash64 sketch family.

    Output: (id, n_bytes, n_compressed, ratio round 4 =
    compressed/raw — LOWER means MORE compressible).
    """
    import pandas as pd
    import zlib

    from pyspark.sql import types as T

    src = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.col(text_col).alias("_t")
    )
    id_field = src.schema[id_col]
    schema = T.StructType([
        id_field,
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("n_compressed", T.LongType(), True),
        T.StructField("ratio", T.DoubleType(), True),
    ])

    def batches(parts):
        for pdf in parts:
            rows = []
            for mid, text in zip(pdf[id_col], pdf["_t"]):
                raw = text.encode("utf-8")
                comp = zlib.compress(raw, level)
                rows.append((
                    mid,
                    len(raw),
                    len(comp),
                    round(len(comp) / len(raw), 4) if raw else None,
                ))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_bytes", "n_compressed", "ratio"]
            )

    return src.mapInPandas(batches, schema=schema)
