"""Sequence assembly for training-data pipelines: token-window
chunking, offset-based sequence packing, and shard manifests.

These are the steps between "filtered corpus" and "training shards":
split long documents into model-context-sized windows, pack many short
documents into fixed token budgets, and assign rows to output shards
deterministically. No reference analogue (the DAM reference stops at
analytics); these extend the SURVEY.md §7 P6 surface the brief asks
for.

All three are pure built-in-expression dataflows:

* chunking is a projection + ``explode(sequence(...))`` — no shuffle,
  output partitioning inherits the scan;
* packing is ONE window aggregation per shard (running token total),
  so the only shuffle is the per-shard hash exchange — never a global
  sort. Shard count bounds the window partition size at 100 TB;
* shard manifests are a single hash aggregate over an md5-derived
  shard key (the same key a ``df.repartitionByRange(shard_id)``
  writer would use, so the manifest IS the writer's layout preview).

Determinism: every derived value is integer arithmetic or md5 — the
DuckDB oracles reproduce them bit-exactly (no float folds anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_WS = r"\s+"


def _tokens(text_col: str) -> Column:
    # Same tokenizer as textops: whitespace split of trimmed text, so
    # chunk token counts agree with token_stats.n_tokens.
    return F.split(F.trim(F.col(text_col)), _WS)


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token windows per document.

    A document with n tokens yields ``1 + ceil((n - chunk_size) /
    stride)`` chunks (one chunk if n <= chunk_size); chunk i covers
    tokens ``[i*stride, i*stride + chunk_size)``. The final chunk may
    be short (no padding — packing handles budget fill downstream).

    Output: (doc_id, chunk_idx, start_tok, chunk_tokens,
    chunk_fingerprint) — the fingerprint is md5 of the space-rejoined
    window, so chunk CONTENT is pinned without shipping the text.

    ``stride > chunk_size`` is sampling mode (gaps between windows are
    intentionally skipped); there the ceil window count can place the
    final start past the document, so empty windows are filtered out
    (found by test_properties' model check — with stride <= chunk_size
    no empty window can arise and the filter is a no-op).

    Scale: projection + generator, zero shuffles; the explode fan-out
    is bounded by n/stride per row, so output partitioning inherits
    the scan and AQE sizes the downstream exchange.
    """
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = _tokens(text_col)
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_size)) / F.lit(float(stride))).cast("bigint") + 1
    )
    start = F.col("chunk_idx") * stride
    window = F.slice(F.col("_toks"), start + 1, chunk_size)
    return (
        docs.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            start.alias("start_tok"),
            F.size(window).cast("bigint").alias("chunk_tokens"),
            F.md5(F.array_join(window, " ")).alias("chunk_fingerprint"),
        )
        .filter(F.col("chunk_tokens") > 0)
    )


def pack_offsets(
    docs: DataFrame,
    *,
    budget: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Offset-based sequence packing: assign each document to the pack
    its running token offset starts in.

    Documents are ordered by id within ``doc_id % n_shards`` shards;
    ``pack_id = floor(tokens_before / budget)`` — i.e. the stream of
    tokens is cut every ``budget`` tokens and a document belongs to
    the pack where it STARTS (a document may straddle a boundary; the
    trainer's loader handles the carry, exactly as fixed-stride
    pretraining loaders do). This is the deterministic, single-window
    formulation of greedy packing: no first-fit state, no driver loop,
    and byte-identical results at any parallelism.

    Output: (doc_id, shard_id, pack_id, n_tokens, offset_in_pack).

    Scale: one hash exchange on shard_id, then a running sum inside
    each shard — n_shards is chosen so a shard's token stream fits an
    executor's window buffer (at 100 TB: thousands of shards, each a
    few GB). Never a global orderBy.
    """
    return _pack_columns(
        docs,
        budget=budget,
        n_shards=n_shards,
        id_col=id_col,
        tokens_col=tokens_col,
        text_col=text_col,
    ).select(
        F.col(id_col), "shard_id", "pack_id", "n_tokens", "offset_in_pack"
    )


def _pack_columns(
    docs: DataFrame,
    *,
    budget: int,
    n_shards: int,
    id_col: str,
    tokens_col: str | None,
    text_col: str,
) -> DataFrame:
    """``docs`` plus the assignment columns (shard_id, pack_id,
    n_tokens, offset_in_pack), the FULL input row carried through —
    :func:`pack_offsets` projects this down to the assignment (and
    Catalyst prunes the payload out of its window exchange), while
    :func:`write_packed_shards` keeps everything so the written shards
    hold the documents themselves, not just metadata."""
    if tokens_col is None:
        n_tokens = F.size(_tokens(text_col)).cast("bigint")
    else:
        n_tokens = F.col(tokens_col).cast("bigint")
    w = (
        Window.partitionBy("shard_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    return (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("shard_id", (F.col(id_col) % n_shards).cast("bigint"))
        .withColumn("_before", before)
        .withColumn("pack_id", F.expr(f"_before div {budget}"))
        .withColumn("offset_in_pack", F.col("_before") % budget)
        .drop("_before")
    )


def pack_manifest(
    docs: DataFrame,
    *,
    budget: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-pack manifest over :func:`pack_offsets`: how many documents
    landed in each (shard, pack), their token mass, and the fill ratio
    against the budget (can exceed 1.0 when a straddling document
    starts near the boundary — the loader's carry consumes the
    overhang from the next pack's budget).

    Output: (shard_id, pack_id, n_docs, pack_tokens, first_doc,
    fill_permille) — fill is reported as integer permille
    (pack_tokens * 1000 div budget) so the oracle comparison is pure
    integer math.
    """
    assigned = pack_offsets(
        docs,
        budget=budget,
        n_shards=n_shards,
        id_col=id_col,
        tokens_col=tokens_col,
        text_col=text_col,
    )
    return assigned.groupBy("shard_id", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min(id_col).alias("first_doc"),
        F.expr(f"sum(n_tokens) * 1000 div {budget}").alias("fill_permille"),
    )


def shard_manifest(
    docs: DataFrame,
    *,
    n_shards: int = 16,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    label_col: str | None = "lang",
) -> DataFrame:
    """Deterministic output-shard assignment preview.

    ``shard_id = int(md5(doc_id)[:4], 16) % n_shards`` — an md5-mixed
    key, so adjacent ids spread across shards (unlike ``id % n``,
    which preserves any id-correlated skew). This is the key a
    100 TB writer uses as ``df.repartition(n_shards, shard_id)
    .write.partitionBy(...)`` — the manifest aggregates what each
    output file would contain, which is how you validate balance
    BEFORE paying for the write.

    Output: (shard_id, n_docs, total_size, n_langs, min_doc, max_doc);
    ``label_col=None`` (for frames without a label column, e.g.
    chunk_documents output) reports n_langs = 0. One hash aggregate;
    map-side combine makes the exchange carry n_shards rows per task
    regardless of corpus size.
    """
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % n_shards
    )
    n_labels = (
        F.countDistinct(label_col)
        if label_col is not None
        else F.lit(0).cast("bigint")
    )
    return (
        docs.withColumn("shard_id", shard)
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(size_col)).cast("bigint").alias("total_size"),
            n_labels.alias("n_langs"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
    )


def write_packed_shards(
    docs: DataFrame,
    out_dir: str,
    *,
    budget: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Materialize the packed corpus as training shards on disk:
    ``out_dir/shard_id=K/`` holds shard K's DOCUMENTS (every input
    column) plus their pack assignment, in (pack_id, doc_id) order —
    so a sequential reader streams pack contents exactly as the
    offset-cut semantics define them, with the payload in hand (a
    metadata-only manifest would need a second corpus join at load
    time; use :func:`pack_offsets` when that IS what you want).

    One repartition on shard_id (the write's only shuffle — the same
    exchange the window already needed) + sortWithinPartitions, then a
    partitionBy write: at 100 TB each shard directory is one loader's
    input, written by one task, ordered on disk. Re-running with the
    same inputs rewrites byte-identical shards (everything upstream is
    deterministic), which is what makes packed data cachable across
    training runs.
    """
    assigned = _pack_columns(
        docs,
        budget=budget,
        n_shards=n_shards,
        id_col=id_col,
        tokens_col=tokens_col,
        text_col=text_col,
    )
    (
        assigned.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "pack_id", id_col)
        .write.mode(mode)
        .partitionBy("shard_id")
        .parquet(out_dir)
    )


def read_packed_shards(spark, path: str) -> DataFrame:
    """Reload a :func:`write_packed_shards` directory as the assigned
    row-level frame (documents + shard_id/pack_id/n_tokens/
    offset_in_pack) — the inverse of the write.

    ``shard_id`` comes back from the ``shard_id=K`` directory names
    (Spark's partition-column inference types it INT), so it is
    restored to the bigint the writer assigned — round-tripping must
    not drift the schema.  Reading stays partition-pruned: a loader
    that wants one shard filters on shard_id and Spark lists only
    that directory.
    """
    raw = spark.read.parquet(path)
    return raw.withColumn("shard_id", F.col("shard_id").cast("bigint"))


def pack_sequences(
    packed: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Reconstruct the training-loader view from packed rows:
    one row per (shard_id, pack_id) with the documents in EXACT pack
    order — the order the offset-cut semantics define and the writer
    laid down on disk.

    ``seq`` is an array of structs ``(offset_in_pack, doc_id,
    n_tokens, *payload_cols)`` sorted by in-pack offset (doc id breaks
    the tie a zero-token document creates); ``pack_tokens``/``n_docs``
    restate the manifest so conservation is checkable without a
    second pass.  One hash aggregate on the (shard, pack) key — at
    100 TB each group is ≤ budget tokens of metadata, so collect_list
    is bounded by construction, and a loader typically runs this
    per-shard after partition-pruned reads rather than corpus-wide.
    """
    seq_struct = F.struct(
        F.col("offset_in_pack"),
        F.col(id_col),
        F.col("n_tokens"),
        *[F.col(c) for c in payload_cols],
    )
    return (
        packed.groupBy("shard_id", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.array_sort(F.collect_list(seq_struct)).alias("seq"),
        )
    )
