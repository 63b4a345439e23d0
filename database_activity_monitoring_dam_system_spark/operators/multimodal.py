"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the engine treats media as
``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions via
``mapInPandas`` so the heavy per-item work is vectorized per batch and
never round-trips row-at-a-time.

The actual codec step is STUBBED (image/audio libs aren't in this
container): ``decode_stub=True`` produces a deterministic fake feature
vector from the payload bytes; ``decode_stub=False`` raises
NotImplementedError where a real decoder (PIL/librosa/ffmpeg) would
plug in. Everything Spark-side — schema, batching, partitioning, UDF
signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def synth_media(docs: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic media fixture: payload = md5 bytes of the text,
    metadata derived from doc stats. Stands in for a real binary source
    (S3 blobs / tar shards) with an identical schema."""
    payload = F.unhex(F.md5(F.col(text_col)))
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/x-fixture").alias("mime"),
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, *, decode_stub: bool = True, feature_dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas keeps the per-batch loop in pandas/numpy (vectorizable)
    and inherits the input partitioning — no shuffle; at scale tune
    batch size via spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg; "
                    "run with decode_stub=True in this environment"
                )
            feats = []
            n_bytes = []
            for buf in pdf["payload"]:
                if buf is None:
                    feats.append(None)
                    n_bytes.append(None)
                    continue
                arr = np.frombuffer(buf, dtype=np.uint8)
                n_bytes.append(int(arr.size))
                take = arr[:feature_dim].astype(np.float64)
                if take.size < feature_dim:
                    take = np.pad(take, (0, feature_dim - take.size))
                feats.append((take / 255.0).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.array(n_bytes, dtype="Int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
