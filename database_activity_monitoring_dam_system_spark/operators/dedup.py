"""Deduplication operators for large-scale training-data pipelines.

Four tiers, from exact to fuzzy, all scale-first:

* exact        — md5 fingerprint of normalized text, hash groupBy
                 (one shuffle on the fingerprint; at 100 TB this is the
                 classic map-side-combine dedup).
* n-gram/token Jaccard — exact set similarity via explode + equi-join
                 on (token, block); the quadratic baseline, blocked to
                 keep the join bounded.
* MinHash LSH  — shingle → k minhashes → banded buckets → candidate
                 pairs → exact-Jaccard verification. The scale path:
                 candidate generation is linear in corpus size, the
                 verify join touches only bucket-colliding pairs.
* SimHash      — 64-bit fingerprint by per-bit token-hash majority;
                 banded blocking yields Hamming-near candidate pairs.

Everything is built-in expressions (xxhash64, explode, bitwise ops) —
no Python in the hot path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def normalized_text(text_col: str = "text") -> F.Column:
    """Whitespace-collapsed, lowercased canonical form for exact dedup."""
    return F.lower(F.regexp_replace(F.trim(F.col(text_col)), _WS, " "))


def doc_fingerprints(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """C8-style fingerprint per document (md5 of normalized text)."""
    return docs.withColumn("fingerprint", F.md5(normalized_text(text_col)))


def exact_duplicates(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: one row per distinct fingerprint with the kept
    representative (min id) and the duplicate count."""
    return (
        doc_fingerprints(docs, text_col=text_col)
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("cnt"),
            F.min(id_col).alias("keep_id"),
        )
    )


def distinct_tokens(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
) -> DataFrame:
    """(id[, block], token) distinct token table — the shared substrate
    for Jaccard / MinHash."""
    cols = [F.col(id_col)]
    if block_col:
        cols.append(F.col(block_col))
    return docs.select(
        *cols, F.explode(F.split(F.col(text_col), _WS)).alias("tok")
    ).distinct()


def jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Exact token-set Jaccard over (optionally blocked) pairs.

    Blocking bounds the quadratic self-join: pairs only form inside the
    same block AND sharing ≥1 token. inter/union arithmetic is single
    integer division → bit-identical across engines (oracle-safe).
    """
    toks = distinct_tokens(
        docs, id_col=id_col, text_col=text_col, block_col=block_col
    )
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("n"))
    a = toks.alias("a")
    b = toks.alias("b")
    join_cond = (F.col("a.tok") == F.col("b.tok")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if block_col:
        join_cond = join_cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        a.join(b, join_cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"))
    j = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", j)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_signatures(
    toks: DataFrame, *, id_col: str = "doc_id", num_hashes: int = 32
) -> DataFrame:
    """k minhashes per doc via xxhash64(seed_i, token) — one hash-agg
    pass, no UDFs (MinHashLSH's core without the ML wrapper)."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("tok"))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def minhash_candidate_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Banded LSH: docs agreeing on any full band become candidates.

    Bands are exploded into (band_id, bucket) rows, then a self
    equi-join on the bucket key — linear candidate generation, the
    shuffle key is (band_id, bucket) so collisions co-locate.
    """
    rows_per_band = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.xxhash64(
                    *[F.col(f"mh{bi * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    banded = signatures.select(
        F.col(id_col), F.explode(band_structs).alias("band")
    ).select(id_col, "band.band_id", "band.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )


def minhash_near_duplicates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.9,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard ≥ threshold.

    Output ⊆ jaccard_pairs output (recall < 1 by LSH design); at scale
    this replaces the quadratic join with candidate-only verification.
    """
    toks = distinct_tokens(docs, id_col=id_col, text_col=text_col)
    sigs = minhash_signatures(toks, id_col=id_col, num_hashes=num_hashes)
    cands = minhash_candidate_pairs(
        sigs, id_col=id_col, num_hashes=num_hashes, bands=bands
    )
    ta = toks.select(F.col(id_col).alias("doc_a"), F.col("tok"))
    tb = toks.select(F.col(id_col).alias("doc_b"), F.col("tok"))
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("n"))
    inter = (
        cands.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"))
    j = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", j)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash_fingerprints(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash: per-bit majority vote over xxhash64(token).

    Expressed as 64 conditional sums in one hash aggregate — stays in
    codegen, one shuffle on doc id.
    """
    toks = distinct_tokens(docs, id_col=id_col, text_col=text_col)
    h = F.xxhash64(F.col("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    fingerprint = reduce(
        lambda acc, i: acc.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        ),
        range(64),
        F.lit(0).cast("long"),
    )
    return agg.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Hamming-near pairs via banded blocking on 16-bit simhash chunks
    (pigeonhole: distance < bands guarantees a shared band; wider
    distances are best-effort, standard SimHash practice)."""
    fp = simhash_fingerprints(docs, id_col=id_col, text_col=text_col)
    width = 64 // bands
    mask = (1 << width) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.shiftright(F.col("simhash"), bi * width)
                .bitwiseAND(F.lit(mask))
                .alias("chunk"),
            )
            for bi in range(bands)
        ]
    )
    banded = fp.select(
        F.col(id_col), F.col("simhash"), F.explode(band_structs).alias("band")
    ).select(id_col, "simhash", "band.band_id", "band.chunk")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
