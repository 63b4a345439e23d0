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


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])


def sample_frames(
    media: DataFrame,
    *,
    n_frames: int = 4,
    frame_bytes: int = 4,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling over binary video payloads — the flatMap-shaped
    multimodal op (one input row → n_frames output rows), Arrow-batched
    via mapInPandas, inheriting the input partitioning (no shuffle).

    Stub decode: frame i is the payload's i-th ``frame_bytes`` slice
    (short payloads yield fewer frames) — deterministic, so the full
    pipeline carries a DuckDB oracle; ``decode_stub=False`` raises
    where ffmpeg-style keyframe extraction would plug in.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg/av; "
                    "run with decode_stub=True in this environment"
                )
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                if buf is None:
                    continue
                raw = bytes(buf)
                for i in range(n_frames):
                    seg = raw[i * frame_bytes:(i + 1) * frame_bytes]
                    if not seg:
                        break
                    rows.append((int(mid), i, seg, len(seg)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame", "n_bytes"]
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def resize_media(
    media: DataFrame,
    *,
    width: int,
    height: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize over binary image payloads: same MEDIA_SCHEMA out as in,
    payload replaced by the resized image and the metadata struct
    updated to the new dimensions — so resize stages compose with any
    other media op. Arrow-batched, partition-inheriting, no shuffle.

    Stub decode: the 'resized' payload cycles the source bytes to
    exactly width·height bytes (deterministic → DuckDB-oracle-able);
    ``decode_stub=False`` raises where a PIL/affine resample would
    plug in.
    """
    target = width * height

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires PIL; "
                    "run with decode_stub=True in this environment"
                )
            payloads, metas = [], []
            for buf, meta in zip(pdf["payload"], pdf["meta"]):
                if buf is None:
                    payloads.append(None)
                    metas.append(meta)
                    continue
                raw = bytes(buf)
                reps = -(-target // len(raw))  # ceil
                payloads.append((raw * reps)[:target])
                metas.append(
                    {
                        "mime": meta["mime"] if meta is not None else None,
                        "width": width,
                        "height": height,
                        "n_bytes": target,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


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
