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
fixture-shaped parser.  At 100 TB the per-image work stays inside the
Arrow-batched ``mapInPandas`` operators in multimodal.py (this module
is plain per-item Python the way PIL would be); a production cluster
would swap in PIL/turbojpeg via the same optional-dependency seam
(the import-try in ``decode_image``) without touching the Spark
plumbing.
"""

from __future__ import annotations

import struct
import zlib

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


def _filter_scanline(
    ftype: int, raw: bytes, prior: bytes, bpp: int
) -> bytes:
    if ftype == 0:
        return raw
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


def _unfilter_scanline(
    ftype: int, filt: bytes, prior: bytes, bpp: int
) -> bytes:
    if ftype == 0:
        return filt
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


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    filter_type: int = 0,
) -> bytes:
    """Encode row-major 8-bit pixel bytes as a PNG (no interlace).

    ``filter_type`` applies one filter to every scanline — enough to
    exercise the decoder's unfiltering paths in tests; real encoders
    pick per-line.
    """
    if channels not in _CHANNELS_COLOR:
        raise ValueError(f"channels must be one of {sorted(_CHANNELS_COLOR)}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"expected {stride * height} pixel bytes, got {len(pixels)}"
        )
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

    Supports 8-bit depth, colour types 0/2/4/6, no interlace; IDAT may
    span multiple chunks; ancillary chunks are skipped.
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
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
            if interlace:
                raise ValueError("interlaced PNG not supported")
            channels = _COLOR_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    body = zlib.decompress(bytes(idat))
    stride = width * channels
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


def decode_image(raw: bytes, mime: str | None) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixel bytes) for a supported image
    payload.

    Decoder selection: PIL when installed handles every image/* mime
    it knows (JPEG/GIF/WebP/... — and the same pixels as the stdlib
    path for this PNG class); without PIL, PNG falls back to the
    stdlib decoder and other image formats raise. Audio/video always
    raise here — that is the genuine codec boundary (ffmpeg's job,
    not an image codec's)."""
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
    raise NotImplementedError(
        f"no decoder for mime {mime!r} in this environment "
        "(PNG via stdlib; other images need PIL; audio/video need ffmpeg)"
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
