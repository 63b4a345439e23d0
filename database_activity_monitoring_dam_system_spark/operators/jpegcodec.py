"""Pure-numpy baseline JPEG codec for the multimodal decode path.

A real 100 TB image corpus is overwhelmingly JPEG, so the engine's
image-decode boundary has to handle it with the same "real code, not
a stub" discipline as the PNG/WAV/Y4M codecs (imagecodec.py,
multimodal.py).  The sandbox has no PIL/turbojpeg, but baseline
sequential JPEG is fully specified by ITU-T T.81: Huffman entropy
coding + dequantize + 8×8 inverse DCT + chroma upsample + YCbCr→RGB,
all implementable with numpy alone.  This module is that
implementation — bytes in, pixels out, deterministically, on any
executor with a Python runtime.

Scope: **baseline DCT (SOF0), 8-bit samples**, 1-component
(greyscale) or 3-component (JFIF YCbCr) images, any sampling factors
in {1, 2} (covers 4:4:4, 4:2:2 and the ubiquitous 4:2:0), restart
intervals (DRI/RSTn) honored, multi-chunk DQT/DHT segments, and
ancillary APPn/COM markers skipped.  Progressive (SOF2), arithmetic
coding, 12-bit, and >2 sampling factors raise ``ValueError`` with the
reason — those remain the PIL/turbojpeg seam in
``imagecodec.decode_image`` (tried first when installed).

The encoder exists for fixture generation and round-trip testing:
standard Annex K quantization + Huffman tables, quality scaling per
the common IJG mapping, 4:4:4 or 4:2:0.  Two decode-correctness
anchors keep the encoder/decoder pair honest (same-author round-trip
alone could hide a shared bug):

- the IDCT is tested against a direct O(N^4) DCT-III evaluation of
  the T.81 definition, independently of the matrix-factored fast
  path (tests/test_multimodal.py);
- the ``jpeg_decode_features`` driver gate is FULL-ORACLE: a
  greyscale quality-100 fixture built from constant 8×8 blocks
  round-trips *exactly* (a flat block has only a DC coefficient,
  8·(c−128), which quantizes losslessly at step 1 and inverts to
  the same constant), so DuckDB derives the decoded channel stats
  arithmetically from the md5 definition of the block values —
  a hash match proves Huffman decode → dequantize → IDCT is exact.

At 100 TB the per-image work stays inside the Arrow-batched
``mapInPandas`` operators in multimodal.py — decode parallelism is
partition parallelism, and swapping this codec for turbojpeg on a
production cluster touches only ``imagecodec.decode_image``'s
optional-dependency seam, never the Spark plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# spec constants (ITU-T T.81 Annex K — public standard tables)
# ---------------------------------------------------------------------------

# zigzag scan: ZIGZAG[k] = row-major index of the k-th zigzag position
ZIGZAG = tuple(
    sorted(
        range(64),
        key=lambda i: (
            (i // 8 + i % 8),
            (i // 8) if (i // 8 + i % 8) % 2 else -(i // 8),
        ),
    )
)

# Annex K.1 luminance / K.2 chrominance quantization tables (row-major)
QUANT_LUMA = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)
QUANT_CHROMA = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)

# Annex K.3 Huffman specs: (BITS[1..16] code-length counts, HUFFVAL)
DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_LUMA_VALS = tuple(range(12))
DC_CHROMA_BITS = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
DC_CHROMA_VALS = tuple(range(12))
AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)
AC_CHROMA_BITS = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
AC_CHROMA_VALS = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix M: forward S = M·b·Mᵀ, inverse
    b = Mᵀ·S·M (T.81 A.3.3 with the 1/4·C(u)C(v) factors folded into
    the orthonormal scaling)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


_DCT_M = _dct_matrix()


def quality_quant_table(base: tuple, quality: int) -> np.ndarray:
    """Annex-K table scaled by the common IJG quality mapping:
    scale = 5000/q (q<50) else 200−2q; entries clamped to [1, 255].
    quality=100 → every step is 1 (lossless quantization)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (np.asarray(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _build_codes(bits, vals) -> dict:
    """symbol -> (code, length) per the T.81 C.2 canonical assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits, vals) -> dict:
    """(length, code) -> symbol, the inverse of ``_build_codes``."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, vals).items()
    }


# ---------------------------------------------------------------------------
# bit I/O (with 0xFF byte stuffing per F.1.2.3)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # stuff
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (F.1.2.3)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at any real
    marker, and surfaces RSTn for restart handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # set when a non-RST marker ends the scan

    def _load_byte(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:  # stuffed literal 0xFF
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: consumed by sync_restart
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._load_byte():
            raise ValueError("unexpected end of entropy-coded data")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, expected: int) -> None:
        """Byte-align, consume the RSTn marker, check its sequence."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if (
            self.pos + 1 >= len(d)
            or d[self.pos] != 0xFF
            or not 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        if d[self.pos + 1] - 0xD0 != expected & 7:
            raise ValueError("restart marker out of sequence")
        self.pos += 2


def _extend(v: int, ssss: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the ssss received bits to the signed
    coefficient value."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """(ssss, raw bits) for a signed value — inverse of EXTEND."""
    ssss = abs(v).bit_length()
    return ssss, (v if v >= 0 else v + (1 << ssss) - 1)


# ---------------------------------------------------------------------------
# color transforms (JFIF / CCIR 601)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _pad_replicate(plane: np.ndarray, rows: int, cols: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, rows - h), (0, cols - w)), mode="edge")


def _plane_to_qblocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(padded) plane -> (blocks_y, blocks_x, 64) zigzagged quantized
    int32 coefficients.  One einsum DCT over every block at once."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = (
        plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coeffs = np.einsum("ux,abxy,vy->abuv", _DCT_M, blocks, _DCT_M)
    flat = coeffs.reshape(by, bx, 64)[:, :, list(ZIGZAG)]
    q = qtab[list(ZIGZAG)].astype(np.float64)
    return np.round(flat / q).astype(np.int32)


def _encode_block(
    writer: _BitWriter, zz: np.ndarray, pred: int, dc_codes: dict,
    ac_codes: dict,
) -> int:
    diff = int(zz[0]) - pred
    ssss, raw = _magnitude(diff)
    code, length = dc_codes[ssss]
    writer.write(code, length)
    if ssss:
        writer.write(raw, ssss)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, length = ac_codes[0x00]  # EOB
                writer.write(code, length)
                break
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        ssss, raw = _magnitude(v)
        code, length = ac_codes[run * 16 + ssss]
        writer.write(code, length)
        writer.write(raw, ssss)
        run = 0
    return int(zz[0])


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode row-major 8-bit pixels as a baseline JFIF JPEG.

    ``channels`` 1 (greyscale) or 3 (RGB → YCbCr); ``subsampling``
    '444' or '420' (ignored for greyscale).  Annex-K tables scaled by
    ``quality``; single interleaved scan.  ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (resets
    DC predictors — exercises the decoder's restart path).
    """
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    )
    q_luma = quality_quant_table(QUANT_LUMA, quality)
    if channels == 1:
        planes = [arr[:, :, 0]]
        samp = [(1, 1)]
        qtabs = [q_luma]
        qids = [0]
    else:
        ycc = _rgb_to_ycbcr(arr)
        q_chroma = quality_quant_table(QUANT_CHROMA, quality)
        qtabs = [q_luma, q_chroma, q_chroma]
        qids = [0, 1, 1]
        if subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
            planes = [ycc[:, :, c] for c in range(3)]
        else:
            samp = [(2, 2), (1, 1), (1, 1)]
            # 2×2 box-average chroma (pad odd dims by edge replication)
            ph = height + (height & 1)
            pw = width + (width & 1)
            cb = _pad_replicate(ycc[:, :, 1], ph, pw).astype(np.float64)
            cr = _pad_replicate(ycc[:, :, 2], ph, pw).astype(np.float64)
            cb = np.round(
                cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            ).astype(np.uint8)
            cr = np.round(
                cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            ).astype(np.uint8)
            planes = [ycc[:, :, 0], cb, cr]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    qblocks = []
    for plane, (h, v), qtab in zip(planes, samp, qtabs):
        padded = _pad_replicate(plane, mcus_y * v * 8, mcus_x * h * 8)
        qblocks.append(_plane_to_qblocks(padded, qtab))

    dc_specs = [(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_specs = [(AC_LUMA_BITS, AC_LUMA_VALS)]
    huff_ids = [(0, 0)]
    if channels == 3:
        dc_specs.append((DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_specs.append((AC_CHROMA_BITS, AC_CHROMA_VALS))
        huff_ids += [(1, 1), (1, 1)]
    dc_codes = [_build_codes(*s) for s in dc_specs]
    ac_codes = [_build_codes(*s) for s in ac_specs]

    writer = _BitWriter()
    preds = [0] * channels
    mcu_count = 0
    rst_seq = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst_seq & 7)])
                rst_seq += 1
                preds = [0] * channels
            mcu_count += 1
            for ci in range(channels):
                h, v = samp[ci]
                dci, aci = huff_ids[ci]
                for bv in range(v):
                    for bh in range(h):
                        zz = qblocks[ci][my * v + bv, mx * h + bh]
                        preds[ci] = _encode_block(
                            writer, zz, preds[ci],
                            dc_codes[dci], ac_codes[aci],
                        )
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    # DQT
    for tq in sorted(set(qids)):
        tab = qtabs[qids.index(tq)]
        payload = bytes([tq]) + bytes(
            int(tab[z]) for z in ZIGZAG
        )
        out += b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload
    # SOF0
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        h, v = samp[ci]
        sof += bytes([ci + 1, (h << 4) | v, qids[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT (one segment per table)
    huff_specs = [(0x00, dc_specs[0]), (0x10, ac_specs[0])]
    if channels == 3:
        huff_specs += [(0x01, dc_specs[1]), (0x11, ac_specs[1])]
    for tc_th, (bits, vals) in huff_specs:
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([channels])
    for ci in range(channels):
        dci, aci = huff_ids[ci]
        sos += bytes([ci + 1, (dci << 4) | aci])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG → (width, height, channels, row-major
    pixel bytes).  channels is 1 (greyscale) or 3 (RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    frame = None  # (height, width, [(cid, h, v, tq)])
    restart_interval = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG: 0xFF at end of stream")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: segment length cut off")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError(
                f"truncated JPEG segment (marker 0x{marker:02x}: "
                f"declared {seglen} bytes, {len(data) - pos} remain)"
            )
        payload = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            off = 0
            while off < len(payload):
                if off + 65 > len(payload):
                    raise ValueError("truncated JPEG DQT table")
                pq, tq = payload[off] >> 4, payload[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization not supported")
                zz = np.frombuffer(
                    payload[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int32)
                tab = np.empty(64, dtype=np.int32)
                tab[list(ZIGZAG)] = zz
                qtabs[tq] = tab
                off += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            off = 0
            while off < len(payload):
                if off + 17 > len(payload):
                    raise ValueError("truncated JPEG DHT table")
                tc, th = payload[off] >> 4, payload[off] & 0x0F
                bits = tuple(payload[off + 1 : off + 17])
                n = sum(bits)
                if off + 17 + n > len(payload):
                    raise ValueError("truncated JPEG DHT table")
                vals = tuple(payload[off + 17 : off + 17 + n])
                huff[(tc, th)] = _build_decode(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(payload) < 6:
                raise ValueError("truncated JPEG SOF0 header")
            precision, height, width, ncomp = struct.unpack_from(
                ">BHHB", payload
            )
            if len(payload) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG SOF0 component list")
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                h, v = hv >> 4, hv & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    raise ValueError(
                        f"sampling factors {h}x{v} not supported"
                    )
                comps.append((cid, h, v, tq))
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component images not supported")
            frame = (height, width, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline (SOF0) supported"
            )
        elif marker == 0xDD:  # DRI
            if len(payload) < 2:
                raise ValueError("truncated JPEG DRI segment")
            (restart_interval,) = struct.unpack_from(">H", payload)
        elif marker == 0xDA:  # SOS
            if not payload or len(payload) < 1 + 2 * payload[0]:
                raise ValueError("truncated JPEG SOS header")
            ns = payload[0]
            scan = []
            for si in range(ns):
                cs, tt = payload[1 + 2 * si], payload[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0x0F))
            break  # entropy-coded data follows at `pos`
        # else: APPn / COM / others skipped
    if frame is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    height, width, comps = frame
    hmax = max(h for _, h, v, _ in comps)
    vmax = max(v for _, h, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    by_cid = {cid: (h, v, tq) for cid, h, v, tq in comps}
    order = []  # (comp index in `comps`, h, v, dc map, ac map, qtab)
    for cs, td, ta in scan:
        h, v, tq = by_cid[cs]
        order.append(
            (
                [c[0] for c in comps].index(cs),
                h,
                v,
                huff[(0, td)],
                huff[(1, ta)],
                qtabs[tq],
            )
        )

    # coefficient planes (zigzag-order int32) per component
    coefs = [
        np.zeros((mcus_y * v, mcus_x * h, 64), dtype=np.int32)
        for _, h, v, _ in comps
    ]
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    rst_seq = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                reader.sync_restart(rst_seq)
                rst_seq += 1
                preds = [0] * len(comps)
            for ci, h, v, dc_map, ac_map, _ in order:
                for bv in range(v):
                    for bh in range(h):
                        zz = _decode_block(reader, dc_map, ac_map)
                        zz[0] += preds[ci]
                        preds[ci] = zz[0]
                        coefs[ci][my * v + bv, mx * h + bh] = zz
            mcu_count += 1

    planes = []
    for (ci, h, v, _, _, qtab) in order:
        zzq = qtab[list(ZIGZAG)]
        flat = coefs[ci].astype(np.float64) * zzq
        by, bx = flat.shape[0], flat.shape[1]
        blocks = np.empty((by, bx, 64))
        blocks[:, :, list(ZIGZAG)] = flat
        blocks = blocks.reshape(by, bx, 8, 8)
        spatial = np.einsum("ux,abuv,vy->abxy", _DCT_M, blocks, _DCT_M)
        plane = (
            spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        )
        plane = np.clip(np.round(plane), 0, 255).astype(np.uint8)
        # upsample to full resolution, crop to frame dims
        plane = np.repeat(np.repeat(plane, vmax // v, 0), hmax // h, 1)
        planes.append(plane[:height, :width])

    if len(comps) == 1:
        return width, height, 1, planes[0].tobytes()
    rgb = _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    return width, height, 3, rgb.tobytes()


def _decode_block(reader: _BitReader, dc_map: dict, ac_map: dict):
    """One 8×8 block → zigzag-order coefficient vector (DC is the
    DIFF, caller adds the predictor)."""
    zz = np.zeros(64, dtype=np.int32)
    ssss = _read_symbol(reader, dc_map)
    zz[0] = _extend(reader.receive(ssss), ssss)
    k = 1
    while k < 64:
        rs = _read_symbol(reader, ac_map)
        run, ssss = rs >> 4, rs & 0x0F
        if ssss == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.receive(ssss), ssss)
        k += 1
    return zz


def _read_symbol(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy-coded data")
