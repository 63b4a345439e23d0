"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the engine treats media as
``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions via
``mapInPandas`` so the heavy per-item work is vectorized per batch and
never round-trips row-at-a-time.

Decode is REAL for four modalities:

- PNG images — pure-stdlib codec (imagecodec.py: zlib inflate +
  numpy-vectorized scanline unfiltering) behind ``decode_stub=False``
  in extract_features / resize_media / decode_image_features, with
  PIL used instead when installed (the import-try seam in
  ``imagecodec.decode_image`` — PIL also widens JPEG coverage).
- JPEG images, baseline (SOF0) AND progressive (SOF2) — pure-numpy
  codec (jpegcodec.py: Huffman entropy decode, spectral-selection +
  successive-approximation scan accumulation, einsum-batched IDCT,
  4:4:4/4:2:2/4:2:0 chroma, DRI/RSTn), dispatched by
  ``imagecodec.decode_image`` for ``image/jpeg`` payloads when PIL
  is absent.
- WAV audio — stdlib ``wave`` 16-bit PCM round-trip
  (synth_wav_media / decode_audio_features).
- Y4M video — pure-stdlib YUV4MPEG2 parse (videocodec.py) behind
  ``decode_stub=False`` in sample_frames (synth_y4m_media /
  frame_pixel_stats).

Codecs the sandbox genuinely cannot host (arithmetic-coded or
12-bit JPEG, compressed audio/video without ffmpeg/av) raise
ValueError/NotImplementedError at the mime/magic or SOF-marker
check; ``decode_stub=True`` keeps the deterministic byte-level fake
for plumbing tests.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import imagecodec, jpegcodec, videocodec

# The mapInPandas closures below reference the codec modules; the
# driver may import this package from a path local-mode workers don't
# share, so ship the (stdlib/numpy-only, package-free) modules INSIDE
# the pickled closures instead of by reference.  jpegcodec must be
# registered too: imagecodec.decode_image dispatches to it through a
# module-level alias, which would otherwise pickle by reference.
try:
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(imagecodec)
    _cloudpickle.register_pickle_by_value(jpegcodec)
    _cloudpickle.register_pickle_by_value(videocodec)
except (ImportError, AttributeError):  # older cloudpickle: fall back
    pass

_decode_image = imagecodec.decode_image

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


def synth_png_media(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text", width: int = 8,
                    height: int = 8, interlace: bool = False) -> DataFrame:
    """Deterministic REAL-image fixture: an 8×8 RGB PNG per document
    whose pixel bytes are ``md5(text)`` digest bytes tiled to
    width·height·3 — so a DuckDB oracle can pin the decoded channel
    statistics arithmetically (hex-pair bytes of md5) without being
    able to decode PNG itself.  Encoded with Paeth filtering so the
    decode gate exercises genuine unfiltering, not a copy.
    ``interlace=True`` writes the Adam7 7-pass layout instead — same
    pixels, so the SAME oracle pins the de-interlacing path (gate
    png_interlaced_decode_features).

    Arrow-batched mapInPandas, inherits partitioning, no shuffle —
    the same shape a tar-shard/S3 image source would have.
    """
    n = width * height * 3

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            ids, payloads, metas = [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                digest = hashlib.md5(
                    ("" if text is None else text).encode("utf-8")
                ).digest()
                pixels = (digest * (-(-n // len(digest))))[:n]
                png = imagecodec.encode_png(
                    width, height, pixels, channels=3, filter_type=4,
                    interlace=interlace,
                )
                ids.append(int(mid))
                payloads.append(png)
                metas.append(
                    {
                        "mime": "image/png",
                        "width": width,
                        "height": height,
                        "n_bytes": len(png),
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    # pass ONLY the columns the closure reads — Spark cannot see
    # inside mapInPandas, so an unpruned frame ships (and reads)
    # every document column through the Arrow boundary
    return docs.select(id_col, text_col).mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


IMAGE_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("r_sum", T.LongType(), True),
    T.StructField("g_sum", T.LongType(), True),
    T.StructField("b_sum", T.LongType(), True),
    T.StructField("r_mean", T.DoubleType(), True),
    T.StructField("g_mean", T.DoubleType(), True),
    T.StructField("b_mean", T.DoubleType(), True),
    T.StructField("r_min", T.IntegerType(), True),
    T.StructField("r_max", T.IntegerType(), True),
    T.StructField("g_min", T.IntegerType(), True),
    T.StructField("g_max", T.IntegerType(), True),
    T.StructField("b_min", T.IntegerType(), True),
    T.StructField("b_max", T.IntegerType(), True),
])


def decode_image_features(media: DataFrame) -> DataFrame:
    """REAL image decode → per-channel statistics: inflate + unfilter
    each PNG payload and reduce the recovered pixels to width/height/
    channels plus per-channel sum/mean/min/max.  Means divide by the
    pixel count, unrounded — counts are powers of two in the fixtures,
    so the doubles are exact and cross-engine hash-stable.

    Arrow-batched mapInPandas; no shuffle. This is the gate proving
    bytes actually get decoded (the oracle derives the same stats from
    the md5 definition of the synthetic pixels — a hash match means
    the encode → Paeth-unfilter → stats path is byte-exact).
    """

    # plain list captured by value — the closure must not reference
    # module globals (workers may not have this package importable)
    cols = list(IMAGE_STATS_SCHEMA.fieldNames())

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, buf, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                if buf is None:
                    rows.append((int(mid),) + (None,) * (len(cols) - 1))
                    continue
                mime = meta["mime"] if meta is not None else None
                w, h, ch, pixels = _decode_image(bytes(buf), mime)
                arr = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, ch)
                sums = arr.sum(axis=0, dtype=np.int64)
                mins = arr.min(axis=0)
                maxs = arr.max(axis=0)
                cnt = arr.shape[0]

                # greyscale (1) / grey+alpha (2) images have fewer
                # channels than the fixed 3-channel stats schema —
                # absent channels report NULL, not an IndexError
                def chan(vals, c, cast):
                    return cast(vals[c]) if c < ch else None

                rows.append((
                    int(mid), w, h, ch,
                    chan(sums, 0, int), chan(sums, 1, int),
                    chan(sums, 2, int),
                    chan(sums, 0, lambda v: float(v / cnt)),
                    chan(sums, 1, lambda v: float(v / cnt)),
                    chan(sums, 2, lambda v: float(v / cnt)),
                    chan(mins, 0, int), chan(maxs, 0, int),
                    chan(mins, 1, int), chan(maxs, 1, int),
                    chan(mins, 2, int), chan(maxs, 2, int),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, schema=IMAGE_STATS_SCHEMA)


def synth_jpeg_media(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Deterministic REAL-JPEG fixture: a 32×32 greyscale baseline
    JPEG per document whose sixteen 8×8 blocks are each FLAT at one
    ``md5(text)`` digest byte.  At quality 100 a flat block has a
    single DC coefficient 8·(c−128) that quantizes losslessly at step
    1 and inverts to the same constant, so the decode round-trips
    **exactly** — which is what lets a DuckDB oracle pin the decoded
    channel statistics arithmetically (hex pairs of md5) without being
    able to decode JPEG itself.  Encoded with restart interval 2 so
    the decode gate also exercises DRI/RSTn resynchronization, not
    just the straight-line Huffman path.

    Arrow-batched mapInPandas, inherits partitioning, no shuffle —
    the same shape a tar-shard/S3 image source would have.
    """

    # closure references the codec fn as a captured global (same
    # pattern as synth_png_media) — a runtime package import inside
    # the worker fails when the driver's sys.path isn't propagated
    encode = jpegcodec.encode_jpeg

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, payloads, metas = [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                digest = hashlib.md5(
                    ("" if text is None else text).encode("utf-8")
                ).digest()
                blocks = np.frombuffer(digest, dtype=np.uint8).reshape(4, 4)
                img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
                jpg = encode(
                    32, 32, img.tobytes(), channels=1, quality=100,
                    restart_interval=2,
                )
                ids.append(int(mid))
                payloads.append(jpg)
                metas.append(
                    {
                        "mime": "image/jpeg",
                        "width": 32,
                        "height": 32,
                        "n_bytes": len(jpg),
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    # pass ONLY the columns the closure reads — Spark cannot see
    # inside mapInPandas, so an unpruned frame ships (and reads)
    # every document column through the Arrow boundary
    return docs.select(id_col, text_col).mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


def synth_jpeg_progressive_media(docs: DataFrame, *,
                                 id_col: str = "doc_id",
                                 text_col: str = "text") -> DataFrame:
    """Deterministic PROGRESSIVE-JPEG (SOF2) fixture: the
    synth_jpeg_media image (32×32 greyscale, sixteen flat 8×8 blocks
    from the md5 digest) encoded with the progressive scan script —
    spectral selection, DC/AC successive approximation, EOB runs,
    per-scan restarts.  The progressive encoder emits the SAME
    quantized coefficients as the baseline one, so the flat-block
    quality-100 lossless identity carries over unchanged and the
    SAME arithmetic DuckDB oracle pins the multi-scan decode
    byte-exactly."""
    encode = jpegcodec.encode_jpeg_progressive

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, payloads, metas = [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                digest = hashlib.md5(
                    ("" if text is None else text).encode("utf-8")
                ).digest()
                blocks = np.frombuffer(digest, dtype=np.uint8).reshape(4, 4)
                img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
                jpg = encode(
                    32, 32, img.tobytes(), channels=1, quality=100,
                    restart_interval=2,
                )
                ids.append(int(mid))
                payloads.append(jpg)
                metas.append(
                    {
                        "mime": "image/jpeg",
                        "width": 32,
                        "height": 32,
                        "n_bytes": len(jpg),
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    # pass ONLY the columns the closure reads — Spark cannot see
    # inside mapInPandas, so an unpruned frame ships (and reads)
    # every document column through the Arrow boundary
    return docs.select(id_col, text_col).mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


def synth_jpeg_color_media(docs: DataFrame, *, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Deterministic COLOR-JPEG fixture: a 32×32 RGB baseline JPEG at
    4:2:0 chroma subsampling per document — the dominant real-world
    image shape (3-component interleaved MCUs: 4 luma + 2 chroma
    blocks each, separate chroma quant/Huffman tables, upsampling,
    YCbCr→RGB).  Pixels are GREY-valued (r=g=b=digest byte per 8×8
    luma block, the synth_jpeg_media tiling): grey input keeps every
    chroma plane flat at 128, so all chroma coefficients quantize to
    exactly 0 and the luma DC path is the proven-lossless flat-block
    one — the full 4:2:0 color pipeline round-trips EXACTLY at
    quality 100 (verified for all 256 grey values in
    test_extensions), which is what lets the DuckDB oracle pin the
    decoded r/g/b statistics arithmetically.  Non-grey chroma values
    are inherently lossy and stay pytest-PSNR-pinned
    (test_jpeg_color_roundtrip_psnr_and_subsampling).

    Encoded with restart interval 2: resync runs through the
    3-component MCU structure, not the greyscale one."""
    encode = jpegcodec.encode_jpeg

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, payloads, metas = [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                digest = hashlib.md5(
                    ("" if text is None else text).encode("utf-8")
                ).digest()
                blocks = np.frombuffer(digest, dtype=np.uint8).reshape(4, 4)
                grey = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
                rgb = np.stack([grey] * 3, axis=-1)
                jpg = encode(
                    32, 32, rgb.tobytes(), channels=3, quality=100,
                    subsampling="420", restart_interval=2,
                )
                ids.append(int(mid))
                payloads.append(jpg)
                metas.append(
                    {
                        "mime": "image/jpeg",
                        "width": 32,
                        "height": 32,
                        "n_bytes": len(jpg),
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    # pass ONLY the columns the closure reads — Spark cannot see
    # inside mapInPandas, so an unpruned frame ships (and reads)
    # every document column through the Arrow boundary
    return docs.select(id_col, text_col).mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


def synth_wav_media(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text", n_frames: int = 32,
                    channels: int = 2,
                    framerate: int = 8000) -> DataFrame:
    """Deterministic REAL-audio fixture: a 16-bit PCM RIFF/WAV per
    document (stdlib ``wave`` writer) whose sample stream is
    ``md5(text)`` digest bytes tiled to ``n_frames·channels·2`` bytes
    and read as little-endian int16 — so a DuckDB oracle can pin the
    decoded per-channel statistics arithmetically from the md5 hex
    without parsing WAV.  Mirrors :func:`synth_png_media`: the
    image seam pattern applied to audio.

    Arrow-batched mapInPandas, inherits partitioning, no shuffle.
    """
    nbytes = n_frames * channels * 2

    def batches(it: Iterator) -> Iterator:
        import hashlib
        import io
        import wave

        import pandas as pd

        for pdf in it:
            ids, payloads, metas = [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                digest = hashlib.md5(
                    ("" if text is None else text).encode("utf-8")
                ).digest()
                pcm = (digest * (-(-nbytes // len(digest))))[:nbytes]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(channels)
                    w.setsampwidth(2)
                    w.setframerate(framerate)
                    w.writeframes(pcm)
                wav = buf.getvalue()
                ids.append(int(mid))
                payloads.append(wav)
                metas.append(
                    {
                        "mime": "audio/wav",
                        "width": None,
                        "height": None,
                        "n_bytes": len(wav),
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    # pass ONLY the columns the closure reads — Spark cannot see
    # inside mapInPandas, so an unpruned frame ships (and reads)
    # every document column through the Arrow boundary
    return docs.select(id_col, text_col).mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


def synth_adpcm_media(docs: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text",
                      framerate: int = 8000) -> DataFrame:
    """Deterministic COMPRESSED-audio fixture: a mono IMA ADPCM WAV
    (format tag 0x0011) per document — ONE block whose header seeds
    predictor 0 / step index 0 and whose 16 data bytes ARE the
    ``md5(text)`` digest (32 nibbles → 33 decoded samples counting
    the header sample).  Unlike the PCM fixture, the oracle cannot
    read the samples out of the hex directly: it must REPLAY the IMA
    step/index recurrence over the nibbles (a recursive CTE) — so a
    hash match pins the actual compressed-codec arithmetic, not just
    container parsing.

    Arrow-batched mapInPandas, inherits partitioning, no shuffle.
    """
    from . import adpcm as _adpcm

    def batches(it: Iterator) -> Iterator:
        import hashlib
        import struct as _struct

        import pandas as pd

        block_frames = 33  # 1 header sample + 32 nibbles
        block_align = 4 + 16
        fmt = _struct.pack(
            "<HHIIHHHH",
            _adpcm.WAVE_FORMAT_IMA_ADPCM, 1, framerate,
            framerate * block_align // block_frames,
            block_align, 4, 2, block_frames,
        )
        fact = _struct.pack("<I", block_frames)
        for pdf in it:
            ids, payloads, metas = [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                digest = hashlib.md5(
                    ("" if text is None else text).encode("utf-8")
                ).digest()
                data = _struct.pack("<hBB", 0, 0, 0) + digest
                riff = (
                    b"WAVEfmt " + _struct.pack("<I", len(fmt)) + fmt
                    + b"fact" + _struct.pack("<I", len(fact)) + fact
                    + b"data" + _struct.pack("<I", len(data)) + data
                )
                wav = b"RIFF" + _struct.pack("<I", len(riff)) + riff
                ids.append(int(mid))
                payloads.append(wav)
                metas.append(
                    {
                        "mime": "audio/wav",
                        "width": None,
                        "height": None,
                        "n_bytes": len(wav),
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    # pass ONLY the columns the closure reads — Spark cannot see
    # inside mapInPandas, so an unpruned frame ships (and reads)
    # every document column through the Arrow boundary
    return docs.select(id_col, text_col).mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


AUDIO_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("c0_min", T.IntegerType(), True),
    T.StructField("c0_max", T.IntegerType(), True),
    T.StructField("c0_sum", T.LongType(), True),
    T.StructField("c0_sumsq", T.LongType(), True),
    T.StructField("c1_min", T.IntegerType(), True),
    T.StructField("c1_max", T.IntegerType(), True),
    T.StructField("c1_sum", T.LongType(), True),
    T.StructField("c1_sumsq", T.LongType(), True),
])


def decode_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode → per-channel statistics: parse each RIFF/WAV
    payload with the stdlib ``wave`` reader, de-interleave the 16-bit
    PCM frames, and reduce to sample-rate/frame-count plus per-channel
    min/max/sum/sum-of-squares.  Everything is exact integer math
    (sum-of-squares is the RMS numerator, kept unrooted so the oracle
    comparison never touches floats).

    Mono payloads report NULL for the second channel (the image
    operator's absent-channel convention); sample widths other than
    16-bit raise at the codec boundary — the same honest seam as
    non-PNG images.  COMPRESSED audio: IMA ADPCM (format tag 0x0011)
    decodes for real through operators/adpcm.py when the stdlib
    ``wave`` reader rejects the format tag; other compressed formats
    (MP3/AAC — perceptual codecs with no exact integer spec) keep
    raising at the same seam.  Arrow-batched mapInPandas; no shuffle.
    """
    cols = list(AUDIO_STATS_SCHEMA.fieldNames())

    def batches(it: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        from . import adpcm as _adpcm

        for pdf in it:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                if buf is None:
                    rows.append((int(mid),) + (None,) * (len(cols) - 1))
                    continue
                try:
                    with wave.open(io.BytesIO(bytes(buf)), "rb") as w:
                        ch = w.getnchannels()
                        width = w.getsampwidth()
                        if width != 2:
                            raise NotImplementedError(
                                f"sample width {width * 8} bit "
                                "unsupported (16-bit PCM only)"
                            )
                        rate = w.getframerate()
                        nf = w.getnframes()
                        pcm = w.readframes(nf)
                except wave.Error:
                    # stdlib wave reads PCM only — route compressed
                    # WAVs to the real IMA ADPCM decoder (other tags
                    # raise NotImplementedError there: the honest seam)
                    ch, rate, nf, pcm = _adpcm.decode_ima_wav(
                        bytes(buf)
                    )
                arr = (
                    np.frombuffer(pcm, dtype="<i2")
                    .reshape(-1, ch)
                    .astype(np.int64)
                )

                def chan(c, reducer):
                    # zero-frame WAVs are legal RIFF; reducing an
                    # empty lane would raise, so emit NULL stats
                    if c >= ch or arr.shape[0] == 0:
                        return None
                    return int(reducer(arr[:, c]))

                rows.append((
                    int(mid), ch, rate, nf,
                    chan(0, np.min), chan(0, np.max),
                    chan(0, np.sum), chan(0, lambda v: np.sum(v * v)),
                    chan(1, np.min), chan(1, np.max),
                    chan(1, np.sum), chan(1, lambda v: np.sum(v * v)),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, schema=AUDIO_STATS_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])


def synth_y4m_media(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text", n_frames: int = 8,
                    width: int = 6, height: int = 4) -> DataFrame:
    """Deterministic REAL-video fixture: a YUV4MPEG2 stream per
    document (videocodec.encode_y4m, Cmono — one grayscale plane per
    frame) whose concatenated pixel stream is ``md5(text)`` digest
    bytes tiled to ``n_frames·width·height`` bytes.  With the default
    6×4 plane (24 bytes, not a multiple of the 16-byte digest) the
    tiling rotates across frames, so every frame is distinct and a
    DuckDB oracle pins per-frame pixel statistics arithmetically from
    the md5 hex — :func:`synth_png_media`'s seam pattern applied to
    video.

    Arrow-batched mapInPandas, inherits partitioning, no shuffle.
    """
    fsize = width * height
    total = n_frames * fsize

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            ids, payloads, metas = [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                digest = hashlib.md5(
                    ("" if text is None else text).encode("utf-8")
                ).digest()
                stream = (digest * (-(-total // len(digest))))[:total]
                frames = [
                    stream[f * fsize:(f + 1) * fsize]
                    for f in range(n_frames)
                ]
                y4m = videocodec.encode_y4m(
                    frames, width=width, height=height, colorspace="mono"
                )
                ids.append(int(mid))
                payloads.append(y4m)
                metas.append({
                    "mime": "video/x-yuv4mpeg",
                    "width": width,
                    "height": height,
                    "n_bytes": len(y4m),
                })
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    # pass ONLY the columns the closure reads — Spark cannot see
    # inside mapInPandas, so an unpruned frame ships (and reads)
    # every document column through the Arrow boundary
    return docs.select(id_col, text_col).mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


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
    (short payloads yield fewer frames) — deterministic plumbing fake.

    ``decode_stub=False`` is the REAL path for YUV4MPEG2 payloads
    (magic-sniffed): videocodec parses the container and ``n_frames``
    source frames are sampled uniformly over the stream
    (``videocodec.sample_indices`` — floor(k·total/n), the integer
    rule a SQL oracle reproduces), each emitted with its SOURCE frame
    index and raw plane bytes.  Compressed codecs raise
    NotImplementedError at the magic boundary, where PyAV/ffmpeg would
    plug in — the imagecodec/wave seam pattern applied to video.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                if buf is None:
                    continue
                raw = bytes(buf)
                if decode_stub:
                    for i in range(n_frames):
                        seg = raw[i * frame_bytes:(i + 1) * frame_bytes]
                        if not seg:
                            break
                        rows.append((int(mid), i, seg, len(seg)))
                    continue
                if not raw.startswith(videocodec.Y4M_MAGIC):
                    raise NotImplementedError(
                        "real frame sampling supports uncompressed "
                        "YUV4MPEG2 only in this environment; compressed "
                        "codecs need ffmpeg/av (plug in at this seam)"
                    )
                _, frames = videocodec.decode_y4m(raw)
                for i in videocodec.sample_indices(len(frames), n_frames):
                    rows.append((int(mid), i, frames[i], len(frames[i])))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame", "n_bytes"]
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


FRAME_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("p_min", T.IntegerType(), True),
    T.StructField("p_max", T.IntegerType(), True),
    T.StructField("p_sum", T.LongType(), True),
    T.StructField("p_sumsq", T.LongType(), True),
])


def frame_pixel_stats(frames: DataFrame) -> DataFrame:
    """Per-frame pixel statistics over sampled plane bytes: min / max /
    sum / sum-of-squares of the grayscale plane, exact integer math
    (the audio operator's unrooted-RMS convention), so a DuckDB oracle
    can compare without float folds.  Arrow-batched mapInPandas over
    whatever partitioning :func:`sample_frames` emitted — no shuffle.
    """
    cols = list(FRAME_STATS_SCHEMA.fieldNames())

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, idx, buf in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["frame"]
            ):
                if buf is None:
                    rows.append((int(mid), int(idx)) + (None,) * 5)
                    continue
                arr = np.frombuffer(bytes(buf), dtype=np.uint8).astype(
                    np.int64
                )
                rows.append((
                    int(mid), int(idx), len(arr),
                    int(arr.min()), int(arr.max()),
                    int(arr.sum()), int((arr * arr).sum()),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return frames.mapInPandas(batches, schema=FRAME_STATS_SCHEMA)


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
    exactly width·height bytes (deterministic → DuckDB-oracle-able).
    ``decode_stub=False`` is the REAL path for PNG payloads: stdlib
    decode → nearest-neighbour resample → re-encode (PIL when
    installed); other mimes raise at the codec boundary.
    """
    target = width * height

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payloads, metas = [], []
            for buf, meta in zip(pdf["payload"], pdf["meta"]):
                if buf is None:
                    payloads.append(None)
                    metas.append(meta)
                    continue
                raw = bytes(buf)
                if decode_stub:
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
                    continue
                mime = meta["mime"] if meta is not None else None
                w, h, ch, pixels = _decode_image(raw, mime)
                resized = imagecodec.resize_nearest(
                    pixels, w, h, ch, width, height
                )
                png = imagecodec.encode_png(
                    width, height, resized, channels=ch
                )
                payloads.append(png)
                metas.append(
                    {
                        "mime": mime,
                        "width": width,
                        "height": height,
                        "n_bytes": len(png),
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

    ``decode_stub=True`` featurizes the raw payload bytes (plumbing
    mode); ``decode_stub=False`` REALLY decodes image payloads
    (stdlib PNG codec / PIL when installed) and featurizes the
    recovered pixels — ``n_bytes`` then counts decoded pixel bytes.

    mapInPandas keeps the per-batch loop in pandas/numpy (vectorizable)
    and inherits the input partitioning — no shuffle; at scale tune
    batch size via spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats = []
            n_bytes = []
            # stub mode featurizes raw payload bytes and never reads
            # meta — don't require the column there (plumbing frames
            # may carry payload only)
            metas = pdf["meta"] if "meta" in pdf.columns else [None] * len(pdf)
            for buf, meta in zip(pdf["payload"], metas):
                if buf is None:
                    feats.append(None)
                    n_bytes.append(None)
                    continue
                if decode_stub:
                    arr = np.frombuffer(buf, dtype=np.uint8)
                else:
                    mime = meta["mime"] if meta is not None else None
                    _, _, _, pixels = _decode_image(bytes(buf), mime)
                    arr = np.frombuffer(pixels, dtype=np.uint8)
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
