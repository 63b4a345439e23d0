"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is non-reproducible across runs,
engines, and partitionings — a training pipeline wants the SAME corpus
subset every rebuild. These operators sample by content hash instead:
a row is kept iff the first 8 hex chars of ``md5(salt || key)`` fall
below a per-stratum threshold. md5 hex is fixed-width lowercase, so
LEXICAL order on the prefix equals numeric order — the comparison is a
plain string predicate, bit-identical in any engine with md5 (which is
what makes the DuckDB oracle exact; cf. reference fingerprinting,
dam_agent.py md5 usage).

Everything here is a pure projection/filter (zero shuffle) except the
per-stratum cap, which shuffles once on the stratum key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PREFIX_LEN = 8
_SPACE = 16 ** _PREFIX_LEN


def rate_threshold(rate: float) -> str:
    """Hex threshold such that P[md5-prefix < threshold] == rate (to
    1/16^8 resolution). Thresholds are compared LEXICALLY char by
    char, so the all-pass sentinel must sort above every hex digit in
    its FIRST character — 'g' does; '100000000' would not ('9' > '1').
    Equal-width hex strings order identically to their numeric value.
    """
    if rate >= 1.0:
        return "g"
    n = int(rate * _SPACE)
    return format(n, f"0{_PREFIX_LEN}x")


def _bucket(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, _PREFIX_LEN)


def hash_sample(
    df: DataFrame,
    *,
    key_col: str,
    rates: dict[str, float] | None = None,
    strata_col: str | None = None,
    default_rate: float = 0.1,
    salt: str = "s1",
) -> DataFrame:
    """Keep each row iff its hash bucket clears the (stratum's) rate.

    With ``strata_col`` + ``rates``, each stratum gets its own
    threshold (un-listed strata fall back to ``default_rate``) — the
    standard language/source re-balancing move. Deterministic: same
    salt → same subset, independent of partitioning or engine.

    Scale: a pure filter projection — no shuffle, pushes down past
    column pruning; changing the mix is a re-filter of the scan, not
    a reshuffle.
    """
    if (strata_col is None) != (not rates):
        raise ValueError(
            "strata_col and rates must be provided together; got "
            f"strata_col={strata_col!r}, rates={rates!r} — a lone rates "
            "dict would be silently ignored"
        )
    bucket = _bucket(F.col(key_col), salt)
    if strata_col is None:
        return df.filter(bucket < F.lit(rate_threshold(default_rate)))
    thr = F.lit(rate_threshold(default_rate))
    for stratum, rate in rates.items():
        # a NULL stratum is a real stratum (groupBy keeps it); a plain
        # == would null out and silently fall through to default_rate
        pred = (
            F.col(strata_col).isNull()
            if stratum is None
            else F.col(strata_col) == stratum
        )
        thr = F.when(pred, F.lit(rate_threshold(rate))).otherwise(thr)
    return df.filter(bucket < thr)


def stratified_cap(
    df: DataFrame,
    *,
    strata_cols: list[str],
    cap: int,
    key_col: str,
    salt: str = "c1",
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, chosen deterministically
    by hash order (hash asc, key asc tiebreak) — an unbiased, stable
    per-source quota, unlike LIMIT which is partition-order dependent.

    One shuffle on the stratum key; per-stratum top-N is a bounded
    sort. Skewed mega-strata at 100 TB: rank by the hash PREFIX first
    (cheap pre-filter at ~cap/stratum_size quantile) before the exact
    window — not needed at test scale.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        _bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def temperature_rates(
    counts: dict[str, int], *, alpha: float = 0.5
) -> dict[str, float]:
    """Per-stratum keep-rates for temperature-based rebalancing
    (the multilingual-LM standard: sample stratum l with probability
    ∝ (n_l/N)^α, α = 1/T < 1 flattening the distribution). Expressed
    as per-ROW keep rates normalized so the rarest stratum keeps
    everything: rate_l = (n_l / n_min)^(α−1) — monotonically
    downsampling the head, rate 1 at the tail. Rounded to 6 dp so the
    injected thresholds survive cross-engine pow() ulp differences.
    """
    if not counts:
        return {}
    n_min = min(counts.values())
    return {
        s: round((n / n_min) ** (alpha - 1.0), 6) for s, n in counts.items()
    }


def weighted_sample(
    df: DataFrame,
    *,
    key_col: str,
    weight_col: str,
    n: int,
    strata_col: str | None = None,
    salt: str = "w1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis, IPL 2006 — the exponential-race / A-ES
    scheme): each row gets key = −ln(u)/w with u a uniform drawn from
    its content hash, and the n SMALLEST keys win — exactly a
    weighted draw without replacement, so a row's selection
    probability is proportional to its weight (quality score, token
    count, dedup cluster size…). The standard use: pick a
    quality-weighted training subset reproducibly.

    Determinism (the whole point, as with :func:`hash_sample`):
    u = (int(md5(salt‖key)[:8], 16) + 1) / 2^32 — exact dyadic
    rational, identical in any engine with md5; the only
    transcendental step is one ln() whose cross-engine ulp
    differences cannot reorder rows (ties require identical (u, w),
    which yield IDENTICAL keys; those break by key_col asc).

    Rows with NULL or non-positive weight are dropped — zero weight
    means zero selection probability, and −ln(u)/w would otherwise
    inject engine-specific ±Infinity ordering.

    Scale shape: the key is a zero-shuffle projection. With
    ``strata_col`` the top-n is one rank window per stratum (one
    shuffle on the stratum key). Globally (strata_col=None) there is
    NO single-reducer global sort: the n-th smallest key is found via
    TakeOrderedAndProject (orderBy+limit), broadcast back as a
    threshold filter, and only the ≤n surviving rows see the rank
    window — the same prune that keeps top-k-by-revenue scale-safe.

    Output: input columns + ``es_key`` (round 6) + ``rank``.
    """
    w = F.col(weight_col).cast("double")
    # same salted md5-prefix bucket as hash_sample/stratified_cap —
    # one derivation, one determinism contract
    u = (
        F.conv(_bucket(F.col(key_col), salt), 16, 10).cast("long")
        + F.lit(1)
    ) / F.lit(float(_SPACE))
    keyed = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "_es_key", -F.log(u) / w
    )
    if strata_col is not None:
        win = Window.partitionBy(strata_col).orderBy(
            F.asc("_es_key"), F.asc(key_col)
        )
        ranked = keyed.withColumn("rank", F.row_number().over(win))
    else:
        kth = (
            keyed.select("_es_key")
            .orderBy(F.asc("_es_key"))
            .limit(n)
            .agg(F.max("_es_key").alias("_thr"))
        )
        survivors = keyed.join(F.broadcast(kth)).filter(
            F.col("_es_key") <= F.col("_thr")
        ).drop("_thr")
        win = Window.orderBy(F.asc("_es_key"), F.asc(key_col))
        ranked = survivors.withColumn("rank", F.row_number().over(win))
    return (
        ranked.filter(F.col("rank") <= n)
        .withColumn("es_key", F.round("_es_key", 6))
        .drop("_es_key")
    )


def temperature_mix(
    df: DataFrame,
    *,
    key_col: str,
    strata_col: str,
    alpha: float = 0.5,
    salt: str = "t1",
) -> DataFrame:
    """Temperature-rebalanced corpus: count strata (one tiny shuffle,
    k rows collected — same driver-traffic shape as k-means centroids),
    derive per-stratum keep rates, hash-filter. The filter itself is a
    pure zero-shuffle projection, so re-mixing at a different
    temperature is a re-filter of the scan, not a reshuffle; the
    sampled subset is deterministic across runs, engines, and
    partitionings (content-hash thresholds, not RNG).

    Output carries the applied ``mix_rate`` per row so downstream
    accounting (tokens per language after rebalancing) needs no
    side-channel.
    """
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }
    if not counts:
        # empty input: no strata to rebalance — empty result with the
        # declared schema (hash_sample would reject an empty rates
        # dict alongside strata_col)
        return df.withColumn("mix_rate", F.lit(1.0))
    rates = temperature_rates(counts, alpha=alpha)
    sampled = hash_sample(
        df,
        key_col=key_col,
        rates=rates,
        strata_col=strata_col,
        default_rate=1.0,
        salt=salt,
    )
    rate_col = F.lit(1.0)
    for stratum, rate in rates.items():
        pred = (
            F.col(strata_col).isNull()
            if stratum is None
            else F.col(strata_col) == stratum
        )
        rate_col = F.when(pred, F.lit(rate)).otherwise(rate_col)
    return sampled.withColumn("mix_rate", rate_col)


def epoch_plan(
    docs: DataFrame,
    targets: dict[str | None, int],
    *,
    max_epochs_permille: int = 4000,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Epoch (repeat) planning for corpus mixing: given a target token
    budget per stratum, how many times must each stratum's corpus be
    repeated per training epoch to hit it?

    ``epochs_permille = min(target·1000 div available,
    max_epochs_permille)`` — integer permille so the plan is pure
    integer math (oracle-exact) and sub-1.0 repeats (downsampling) and
    >1.0 repeats (upsampling low-resource strata) share one scale. The
    cap bounds repetition of tiny strata: repeating a small corpus
    beyond ~4 epochs degrades models faster than it adds tokens
    (Muennighoff et al. 2023's data-constrained scaling result), so
    the default cap is 4.0 epochs. Available tokens use the same
    ceil(chars/4) BPE estimate as token_stats.

    Strata absent from ``targets`` (including the NULL stratum unless
    explicitly keyed) get target 0 — reported with epochs 0, not
    dropped, so the plan is a complete census of the corpus.

    Output: (stratum, available_tokens, target_tokens,
    epochs_permille, capped). One hash aggregate.
    """
    tgt = F.lit(None).cast("bigint")
    for lang_key, budget in sorted(
        ((k, v) for k, v in targets.items() if k is not None),
        key=lambda kv: kv[0],
    ):
        tgt = F.when(F.col(strata_col) == lang_key, F.lit(budget)).otherwise(tgt)
    if None in targets:
        tgt = F.when(
            F.col(strata_col).isNull(), F.lit(targets[None])
        ).otherwise(tgt)
    tgt = F.coalesce(tgt, F.lit(0))
    est_tokens = F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("bigint")
    raw = F.expr("target_tokens * 1000 div available_tokens")
    # A stratum with zero (or all-NULL) available tokens can't be
    # repeated toward any budget: div-by-zero yields NULL and least()
    # SKIPS NULLs, which would silently report a full-cap repeat plan
    # for an unsatisfiable stratum — so the empty case pins to
    # (0, false) explicitly.
    has_tokens = F.col("available_tokens") > 0
    return (
        docs.groupBy(F.col(strata_col).alias("stratum"))
        .agg(
            F.coalesce(F.sum(est_tokens), F.lit(0)).alias("available_tokens"),
            F.max(tgt).alias("target_tokens"),
        )
        .select(
            "stratum",
            "available_tokens",
            "target_tokens",
            F.when(
                has_tokens, F.least(raw, F.lit(max_epochs_permille))
            )
            .otherwise(F.lit(0))
            .alias("epochs_permille"),
            F.when(has_tokens, raw > max_epochs_permille)
            .otherwise(F.lit(False))
            .alias("capped"),
        )
    )


def cluster_safe_splits(
    docs: DataFrame,
    clusters: DataFrame,
    *,
    fracs: tuple[float, float] = (0.9, 0.05),
    salt: str = "split",
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a hash of
    the NEAR-DUP CLUSTER key, not the document id — every member of a
    duplicate cluster lands in the same split, so a near-copy of a
    training document can never leak into eval (the classic
    contamination bug a per-doc split invites; Lee et al. 2022 measure
    exactly this train-test overlap in real corpora).

    ``clusters`` is the duplicate_clusters output — ALWAYS named
    (doc_id, cluster_id) regardless of ``id_col``, which renames only
    the ``docs`` side; documents absent from it are singletons and
    key on their own id (COALESCE after a left join — the cluster map
    only carries clustered docs). ``fracs`` = (train, val); test
    takes the remainder. Thresholds are the md5-prefix machinery of
    :func:`hash_sample` — deterministic, engine-independent,
    partitioning-independent.

    IMPORTANT THRESHOLD SEMANTICS: protection only extends down to
    the similarity level the cluster map was built at. If the map
    comes from the dedup stage, best-copy dedup leaves one member per
    cluster and the split adds nothing — build the SPLIT map at a
    LOOSER threshold than dedup (keep 0.8-similar docs together even
    though only 0.9-similar ones deduplicate), which is what
    run_corpus_pipeline(split_fracs=…) does.

    Shuffle shape: one left equi-join against the cluster map (the
    dedup index a serving deployment already materializes), then a
    pure projection. Output: (id, split_key, split).
    """
    if (
        not 0 <= fracs[0] <= 1
        or not 0 <= fracs[1] <= 1
        or fracs[0] + fracs[1] > 1
    ):
        raise ValueError(
            f"fracs must be non-negative with sum <= 1, got {fracs} — "
            "a typo here silently ships a corpus with no held-out data"
        )
    t_train = rate_threshold(fracs[0])
    t_val = rate_threshold(fracs[0] + fracs[1])
    keyed = docs.select(F.col(id_col)).join(
        clusters.select(
            F.col("doc_id").alias(id_col),
            F.col("cluster_id").alias("_cl"),
        ),
        id_col,
        "left",
    ).select(
        F.col(id_col),
        F.coalesce(F.col("_cl"), F.col(id_col)).alias("split_key"),
    )
    bucket = _bucket(F.col("split_key"), salt)
    return keyed.select(
        id_col,
        "split_key",
        F.when(bucket < F.lit(t_train), "train")
        .when(bucket < F.lit(t_val), "val")
        .otherwise("test")
        .alias("split"),
    )


def curriculum_phases(
    docs: DataFrame,
    score: Column,
    *,
    n_phases: int = 4,
    id_col: str = "doc_id",
    ascending: bool = True,
) -> DataFrame:
    """Curriculum phase assignment: rank documents by a difficulty /
    quality score and cut the ranking into ``n_phases`` equal-count
    buckets — the data-side half of curriculum learning (train on
    phase 0 first, feed later phases in as training progresses).

    Phase = ``((rank − 1) · n_phases) div N`` — INTEGER division over
    a deterministic (score, id) ranking, so the cut points are
    engine-reproducible exactly (a float quotient that lands exactly
    on an integer boundary could floor off-by-one; integer div
    cannot). With
    ``ascending=True`` phase 0 holds the LOWEST scores (score =
    difficulty → easy-first); flip for score = quality.

    Shuffle shape: one global rank — a single-partition sort of
    (score, id) pairs only (two columns, not the documents; the rank
    joins back by id if callers need the full rows). For corpora
    where even that is too hot, pre-bucket by score range and rank
    within buckets; at the scales this repo measures the two-column
    sort is trivial.

    Output: (id, curriculum_score round 6, phase_rank, phase).
    """
    if n_phases < 1:
        raise ValueError("n_phases must be >= 1")
    order = [F.asc("_cs") if ascending else F.desc("_cs"), F.asc(id_col)]
    w = Window.orderBy(*order)
    wc = Window.partitionBy()
    return (
        docs.select(F.col(id_col), score.alias("_cs"))
        .withColumn("phase_rank", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .select(
            id_col,
            F.round("_cs", 6).alias("curriculum_score"),
            F.col("phase_rank").cast("bigint").alias("phase_rank"),
            F.expr(
                # BIGINT before the multiply: row_number() is 32-bit and
                # rank*n_phases would wrap past ~2^31/n_phases documents.
                f"CAST(((CAST(phase_rank AS BIGINT) - 1) * {n_phases})"
                " DIV _n AS INT)"
            ).alias("phase"),
        )
    )
