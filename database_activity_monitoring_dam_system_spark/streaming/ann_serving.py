"""Streaming ANN serving — PQ ADC search as a query stream.

The serving posture for embedding search at corpus scale: the INDEX
(PQ codebooks + the encoded-corpus code table) is built once per
corpus snapshot (`similarity.pq_train` / `pq_encode`, persisted via
`save_pq_index` and a plain parquet write of the codes), and QUERIES
arrive continuously. Each micro-batch of query vectors is projected
to sub-slices, broadcast against the static code table, and ADC
top-k'd — the batch operator applied per trigger, so streaming and
batch answers are identical by construction (asserted in
test_streaming).

Why foreachBatch rather than a stream-static join: the ranking is a
per-query row_number window, which Structured Streaming only allows
inside a batch context. foreachBatch is AT-LEAST-ONCE, so the sink
partitions on the batch id with dynamic partition overwrite — a
replayed batch overwrites its own ``_batch_id=N`` partition instead
of appending duplicate result rows (the same idempotency contract as
the document ingest sink, sources/documents.py).

100 TB shape: the code table is the only corpus-sized input and it is
m bytes per vector; the per-batch work is one broadcast of the batch's
queries + a scan of the codes — no shuffle of the corpus, ever. With
an IVF quantizer alongside (ivf_pq_topk), the scan drops to the probed
lists; this module keeps the exhaustive-ADC form, which is the
recall-1-of-ADC baseline a deployment starts from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import similarity


def start_pq_ann_stream(
    query_stream: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    out_path: str,
    checkpoint_dir: str,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = False,
):
    """Serve a stream of query vectors against a static encoded corpus.

    ``query_stream``: streaming DataFrame with (id_col, vec_col).
    ``codes``: static (neighbor_id, code0..code{m-1}) — load the
    persisted encode artifact with ``spark.read.parquet``.
    Results land under ``out_path`` partitioned by ``_batch_id``,
    schema (query_id, neighbor_id, rank, adc_dist).
    """

    def score_batch(batch: DataFrame, batch_id: int) -> None:
        queries = similarity.pq_prepare_queries(
            batch, codebooks, dim=dim, id_col=id_col, vec_col=vec_col
        )
        topk = similarity.pq_score_queries(
            codes, queries, codebooks, k=k, exclude_self=False
        )
        (
            topk.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    writer = query_stream.writeStream.foreachBatch(score_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_ivf_pq_res_stream(
    query_stream: DataFrame,
    codes: DataFrame,
    centroids: list[tuple],
    codebooks: list[list[list[float]]],
    *,
    out_path: str,
    checkpoint_dir: str,
    k: int = 10,
    n_probe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = False,
):
    """Serve a query-vector stream against a static RESIDUAL IVF-PQ
    index — the probe-pruned upgrade of :func:`start_pq_ann_stream`:
    per micro-batch, each query picks its n_probe inverted lists,
    residualizes against each probed centroid
    (similarity.ivf_pq_res_prepare_probe — the SAME probe definition
    the batch operator uses), and ADC-ranks only the probed lists'
    codes. The per-batch corpus touch drops from the full code table
    to ~n_probe/C of it.

    ``codes``: static (id_col, cent_id, code0..code{m-1}) — load the
    persisted ivf_pq_encode_residual artifact; a stamped table is
    verified against BOTH artifacts before the stream starts (wrong
    pairing refuses at start, not per batch). Results land under
    ``out_path`` partitioned by ``_batch_id`` (same at-least-once
    overwrite idempotency as the PQ stream), schema
    (query_id, neighbor_id, rank, adc_dist)."""
    codes = similarity.verify_index_stamp(
        codes, codebooks=codebooks, centroids=centroids,
        caller="start_ivf_pq_res_stream",
    )
    corpus = codes.withColumnRenamed(id_col, "neighbor_id")

    def score_batch(batch: DataFrame, batch_id: int) -> None:
        probe = similarity.ivf_pq_res_prepare_probe(
            batch, centroids, codebooks,
            n_probe=n_probe, dim=dim, id_col=id_col, vec_col=vec_col,
        )
        cands = corpus.join(F.broadcast(probe), "cent_id").filter(
            F.col("neighbor_id") != F.col("query_id")
        )
        topk = similarity.adc_rank(cands, codebooks, k=k)
        (
            topk.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    writer = query_stream.writeStream.foreachBatch(score_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
