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

Scope: **baseline DCT (SOF0) and progressive DCT (SOF2), 8-bit
samples**, 1-component (greyscale) or 3-component (JFIF YCbCr)
images, any sampling factors in {1, 2} (covers 4:4:4, 4:2:2 and the
ubiquitous 4:2:0), restart intervals (DRI/RSTn) honored, multi-chunk
DQT/DHT segments, and ancillary APPn/COM markers skipped.
Progressive decode implements the full T.81 G.2 scan model —
spectral selection, successive approximation (DC and AC first +
refinement passes), EOB runs, per-scan restarts — accumulating into
the same coefficient planes the baseline path fills at once.
Arithmetic coding, 12-bit, hierarchical (SOF3+), and >2 sampling
factors raise ``ValueError`` with the reason — those remain the
PIL/turbojpeg seam in ``imagecodec.decode_image`` (tried first when
installed).  A progressive ENCODER (``encode_jpeg_progressive``)
exists for fixture generation: it emits the SAME quantized
coefficients as the baseline encoder under a fixed
DC→AC-bands→refinements scan script, so
``decode(progressive(x)) == decode(baseline(x))`` EXACTLY — the
equality oracle the progressive tests pin.

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


def _prepare_qblocks(
    width: int,
    height: int,
    pixels: bytes,
    channels: int,
    quality: int,
    subsampling: str,
):
    """Shared encoder front half: pixels → per-component quantized
    zigzag block grids.  Returns (qblocks, samp, qtabs, qids,
    mcus_x, mcus_y); both the baseline and the progressive encoder
    emit the SAME coefficients — only the entropy-coding scan
    organization differs, which is what makes
    decode(progressive) ≡ decode(baseline) an exact test oracle."""
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
    return qblocks, samp, qtabs, qids, mcus_x, mcus_y


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
    qblocks, samp, qtabs, qids, mcus_x, mcus_y = _prepare_qblocks(
        width, height, pixels, channels, quality, subsampling
    )

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
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG →
    (width, height, channels, row-major pixel bytes).  channels is 1
    (greyscale) or 3 (RGB).  Progressive scans — spectral selection
    and successive approximation, DC and AC first/refinement passes,
    EOB runs, per-scan restart markers — accumulate into the same
    coefficient planes the baseline path fills in one scan; the
    dequantize → IDCT → upsample → color tail is shared."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    frame = None  # (height, width, [(cid, h, v, tq)])
    progressive = False
    coefs = None  # per-component zigzag coefficient planes
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if len(payload) < 6:
                raise ValueError("truncated JPEG SOF header")
            precision, height, width, ncomp = struct.unpack_from(
                ">BHHB", payload
            )
            if len(payload) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG SOF component list")
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
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline (SOF0) and "
                "progressive (SOF2) supported"
            )
        elif marker == 0xDD:  # DRI
            if len(payload) < 2:
                raise ValueError("truncated JPEG DRI segment")
            (restart_interval,) = struct.unpack_from(">H", payload)
        elif marker == 0xDA:  # SOS
            if not payload or len(payload) < 1 + 2 * payload[0] + (
                3 if progressive else 0
            ):
                raise ValueError("truncated JPEG SOS header")
            ns = payload[0]
            scan = []
            for si in range(ns):
                cs, tt = payload[1 + 2 * si], payload[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0x0F))
            if not progressive:
                break  # entropy-coded data follows at `pos`
            # progressive: decode this scan into the shared
            # coefficient planes, then keep walking headers (DHT /
            # DRI / further SOS segments follow)
            if frame is None:
                raise ValueError("SOS before SOF2")
            if coefs is None:
                _h, _w, _comps = frame
                _hmax = max(h for _, h, v, _ in _comps)
                _vmax = max(v for _, h, v, _ in _comps)
                _mx = -(-_w // (8 * _hmax))
                _my = -(-_h // (8 * _vmax))
                coefs = [
                    np.zeros((_my * v, _mx * h, 64), dtype=np.int32)
                    for _, h, v, _ in _comps
                ]
            ss = payload[1 + 2 * ns]
            se = payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            pos = _decode_prog_scan(
                data, pos, scan, ss, se, ahal >> 4, ahal & 0x0F,
                frame, huff, coefs, restart_interval,
            )
            scan = None
        # else: APPn / COM / others skipped
    if frame is None:
        raise ValueError("missing SOF")
    if progressive:
        if coefs is None:
            raise ValueError("progressive JPEG with no scan data")
    elif scan is None:
        raise ValueError("missing SOF0 or SOS")
    height, width, comps = frame
    hmax = max(h for _, h, v, _ in comps)
    vmax = max(v for _, h, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    if not progressive:
        by_cid = {cid: (h, v, tq) for cid, h, v, tq in comps}
        order = []  # (comp idx in `comps`, h, v, dc map, ac map)
        for cs, td, ta in scan:
            h, v, tq = by_cid[cs]
            order.append(
                (
                    [c[0] for c in comps].index(cs),
                    h,
                    v,
                    huff[(0, td)],
                    huff[(1, ta)],
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
                for ci, h, v, dc_map, ac_map in order:
                    for bv in range(v):
                        for bh in range(h):
                            zz = _decode_block(reader, dc_map, ac_map)
                            zz[0] += preds[ci]
                            preds[ci] = zz[0]
                            coefs[ci][my * v + bv, mx * h + bh] = zz
                mcu_count += 1

    planes = []
    for ci, (_, h, v, tq) in enumerate(comps):
        if tq not in qtabs:
            raise ValueError(f"missing quantization table {tq}")
        zzq = qtabs[tq][list(ZIGZAG)]
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


# ---------------------------------------------------------------------------
# progressive (SOF2) encoder — spectral selection + successive approximation
# ---------------------------------------------------------------------------


def _flat_table(symbols: list[int]) -> tuple[tuple, tuple]:
    """Fixed-length canonical Huffman spec over ``symbols``: every
    code gets length L = the smallest L with 2^L > n, so the all-ones
    code of the maximum length is never assigned (the T.81 encoder
    convention that keeps entropy data free of false markers beyond
    byte stuffing).  Compression is irrelevant for the test fixtures
    this encoder exists to produce; determinism and legality are."""
    n = len(symbols)
    length = max(2, n.bit_length())
    if (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return tuple(bits), tuple(sorted(symbols))


# every AC symbol a progressive scan can emit: run/size for s=1..10,
# ZRL, EOB0, and the EOBn run-length symbols (r<<4, r=1..14)
_PROG_AC_SYMBOLS = sorted(
    {0x00, 0xF0}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(1, 15)}
)
_PROG_DC_SYMBOLS = list(range(12))


class _ProgACWriter:
    """AC-scan emission state: end-of-band run accumulation plus the
    refinement correction-bit buffer (G.1.2.2 / G.1.2.3).  Buffered
    bits drain after every emitted symbol's immediate bits — the
    exact positional interleave the decoder's skip-walk consumes."""

    def __init__(self, writer: _BitWriter, ac_codes: dict):
        self.w = writer
        self.ac = ac_codes
        self.eobrun = 0
        # two buffers with DIFFERENT stream positions: ``pending``
        # holds the current block's correction bits since its last
        # emitted symbol (drained right after the NEXT symbol's
        # immediate bits — the decoder's skip-walk reads them there);
        # ``run_bits`` holds whole EOB-run blocks' bits, emitted with
        # the EOBn symbol (the decoder's per-block remaining-loop
        # reads them there).  Conflating the two emits the current
        # block's bits one symbol early.
        self.pending: list[int] = []
        self.run_bits: list[int] = []

    def symbol(self, sym: int) -> None:
        code, length = self.ac[sym]
        self.w.write(code, length)

    def drain(self) -> None:
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []

    def flush_eobrun(self) -> None:
        if self.eobrun == 0:
            return
        r = self.eobrun.bit_length() - 1
        self.symbol(r << 4)
        if r:
            self.w.write(self.eobrun - (1 << r), r)
        self.eobrun = 0
        for b in self.run_bits:
            self.w.write(b, 1)
        self.run_bits = []

    def end_block(self, had_tail: bool) -> None:
        if had_tail:
            self.eobrun += 1
            self.run_bits += self.pending
            self.pending = []
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()
        else:
            # every coefficient of the block was emitted/drained
            assert not self.pending


def _enc_ac_first_block(
    ac: _ProgACWriter, zz: np.ndarray, ss: int, se: int, al: int
) -> None:
    """One block of a first AC scan (Ah=0): run/size over the
    point-transformed band, EOBs folded into the shared run."""
    r = 0
    emitted = False
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (abs(v) >> al) * (1 if v >= 0 else -1)  # magnitude shift
        if t == 0:
            r += 1
            continue
        ac.flush_eobrun()
        while r > 15:
            ac.symbol(0xF0)
            r -= 16
        ssss, raw = _magnitude(t)
        ac.symbol((r << 4) | ssss)
        ac.w.write(raw, ssss)
        r = 0
        emitted = True
    ac.end_block(had_tail=r > 0 or not emitted)


def _enc_ac_refine_block(
    ac: _ProgACWriter, zz: np.ndarray, ss: int, se: int, al: int
) -> None:
    """One block of an AC refinement scan (Ah=Al+1): newly-nonzero
    coefficients get run/1 + sign, history-nonzero ones append their
    bit-Al correction to the buffer, zero-history zeroes extend the
    run; trailing content folds into the EOB run (G.1.2.3)."""
    mags = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    last_new = -1
    for i, m in enumerate(mags):
        if m == 1:
            last_new = i
    r = 0
    for i, m in enumerate(mags):
        if m == 0:
            r += 1
            continue
        if m > 1:
            # history-nonzero: correction bit, run unaffected
            while r > 15 and i <= last_new:
                ac.flush_eobrun()
                ac.symbol(0xF0)
                r -= 16
                ac.drain()
            ac.pending.append(m & 1)
            continue
        # newly nonzero (magnitude exactly 1 at this precision)
        ac.flush_eobrun()
        while r > 15:
            ac.symbol(0xF0)
            r -= 16
            ac.drain()
        ac.symbol((r << 4) | 1)
        ac.w.write(1 if int(zz[ss + i]) > 0 else 0, 1)
        ac.drain()
        r = 0
    ac.end_block(had_tail=r > 0 or bool(ac.pending))


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode row-major 8-bit pixels as a PROGRESSIVE (SOF2) JFIF
    JPEG — spectral selection AND successive approximation, the scan
    organization real web images use.  The quantized coefficients
    are byte-identical to :func:`encode_jpeg`'s (shared
    ``_prepare_qblocks`` front half), so a decoder must reproduce
    the baseline decode EXACTLY — the equality oracle the tests pin.

    Scan script (exercises every progressive decode path): DC first
    at Al=1 (interleaved), per-component AC first scans split into
    two spectral bands at Al=1, per-component AC refinement to Al=0
    (correction bits + EOB-run bit buffering), then the DC
    refinement bit scan.  ``restart_interval`` applies per scan
    (MCUs for the DC scans, blocks for the AC scans) and resets
    predictors and EOB runs, like the baseline path.
    """
    qblocks, samp, qtabs, qids, mcus_x, mcus_y = _prepare_qblocks(
        width, height, pixels, channels, quality, subsampling
    )
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    dc_spec = _flat_table(_PROG_DC_SYMBOLS)
    ac_spec = _flat_table(_PROG_AC_SYMBOLS)
    dc_codes = _build_codes(*dc_spec)
    ac_codes = _build_codes(*ac_spec)

    def comp_blocks(ci: int) -> tuple[int, int]:
        h, v = samp[ci]
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        return -(-ch // 8), -(-cw // 8)

    def dc_scan(al: int, refine: bool) -> bytes:
        w = _BitWriter()
        preds = [0] * channels
        mcu_count = 0
        rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and (
                    mcu_count % restart_interval == 0
                ):
                    w.flush()
                    w.out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    preds = [0] * channels
                mcu_count += 1
                for ci in range(channels):
                    h, v = samp[ci]
                    for bv in range(v):
                        for bh in range(h):
                            dc = int(
                                qblocks[ci][my * v + bv, mx * h + bh, 0]
                            )
                            if refine:
                                w.write((dc >> al) & 1, 1)
                            else:
                                t = dc >> al  # arithmetic shift (G.1.2.1)
                                diff = t - preds[ci]
                                preds[ci] = t
                                ssss, raw = _magnitude(diff)
                                code, length = dc_codes[ssss]
                                w.write(code, length)
                                if ssss:
                                    w.write(raw, ssss)
        w.flush()
        return bytes(w.out)

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        w = _BitWriter()
        ac = _ProgACWriter(w, ac_codes)
        bh_n, bw_n = comp_blocks(ci)
        block_count = 0
        rst = 0
        enc = _enc_ac_refine_block if ah else _enc_ac_first_block
        for by in range(bh_n):
            for bx in range(bw_n):
                if restart_interval and block_count and (
                    block_count % restart_interval == 0
                ):
                    ac.flush_eobrun()
                    w.flush()
                    w.out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                block_count += 1
                enc(ac, qblocks[ci][by, bx], ss, se, al)
        ac.flush_eobrun()
        w.flush()
        return bytes(w.out)

    # scan script: (comps, Ss, Se, Ah, Al)
    all_comps = list(range(channels))
    script: list[tuple] = [(all_comps, 0, 0, 0, 1)]  # DC first, Al=1
    script.append(([0], 1, 5, 0, 1))
    script.append(([0], 6, 63, 0, 1))
    for ci in range(1, channels):
        script.append(([ci], 1, 63, 0, 1))
    for ci in range(channels):
        script.append(([ci], 1, 63, 1, 0))  # AC refine → full precision
    script.append((all_comps, 0, 0, 1, 0))  # DC refine bit scan

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for tq in sorted(set(qids)):
        tab = qtabs[qids.index(tq)]
        payload = bytes([tq]) + bytes(int(tab[z]) for z in ZIGZAG)
        out += b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        h, v = samp[ci]
        sof += bytes([ci + 1, (h << 4) | v, qids[ci]])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    for tc_th, (bits, vals) in ((0x00, dc_spec), (0x10, ac_spec)):
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for comps_in_scan, ss, se, ah, al in script:
        sos = bytes([len(comps_in_scan)])
        for ci in comps_in_scan:
            sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        if ss == 0:
            out += dc_scan(al, refine=ah > 0)
        else:
            (ci,) = comps_in_scan
            out += ac_scan(ci, ss, se, ah, al)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive (SOF2) scan decoding — T.81 G.2
# ---------------------------------------------------------------------------


def _decode_prog_scan(
    data: bytes,
    pos: int,
    scan: list,
    ss: int,
    se: int,
    ah: int,
    al: int,
    frame: tuple,
    huff: dict,
    coefs: list,
    restart_interval: int,
) -> int:
    """Decode one progressive scan's entropy data into the shared
    per-component coefficient planes; returns the stream position of
    the next marker.  DC scans (Ss=Se=0) may be interleaved (MCU
    order); AC scans are single-component in that component's own
    block-raster order, over its UNPADDED block grid (T.81 A.2.2 —
    the grid excludes MCU padding blocks)."""
    height, width, comps = frame
    cids = [c[0] for c in comps]
    hmax = max(h for _, h, v, _ in comps)
    vmax = max(v for _, h, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    reader = _BitReader(data, pos)

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC progressive scan must have Se=0")
        members = []  # (comp idx, h, v, dc map or None)
        for cs, td, _ta in scan:
            ci = cids.index(cs)
            _, h, v, _ = comps[ci]
            dc_map = huff.get((0, td))
            if ah == 0 and dc_map is None:
                raise ValueError(f"missing DC Huffman table {td}")
            members.append((ci, h, v, dc_map))
        preds = {ci: 0 for ci, _, _, _ in members}
        if len(members) == 1:
            # single-component DC scan: non-interleaved block raster
            ci, h, v, dc_map = members[0]
            bh_n = -(-(-(-height * v // vmax)) // 8)
            bw_n = -(-(-(-width * h // hmax)) // 8)
            units = [
                (ci, by, bx, dc_map)
                for by in range(bh_n)
                for bx in range(bw_n)
            ]
            groups = [[u] for u in units]
        else:
            groups = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    g = []
                    for ci, h, v, dc_map in members:
                        for bv in range(v):
                            for bh in range(h):
                                g.append(
                                    (ci, my * v + bv, mx * h + bh, dc_map)
                                )
                    groups.append(g)
        count = 0
        rst = 0
        for g in groups:
            if restart_interval and count and (
                count % restart_interval == 0
            ):
                reader.sync_restart(rst)
                rst += 1
                preds = {k: 0 for k in preds}
            count += 1
            for ci, by, bx, dc_map in g:
                blk = coefs[ci][by, bx]
                if ah == 0:
                    ssss = _read_symbol(reader, dc_map)
                    diff = _extend(reader.receive(ssss), ssss)
                    preds[ci] += diff
                    blk[0] = preds[ci] << al
                else:  # refinement: one raw bit per block
                    if reader.read_bit():
                        blk[0] = int(blk[0]) | (1 << al)
        return reader.pos

    # AC scan: exactly one component, non-interleaved
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not 1 <= ss <= se <= 63:
        raise ValueError(f"invalid spectral band {ss}..{se}")
    cs, _td, ta = scan[0]
    ci = cids.index(cs)
    _, h, v, _ = comps[ci]
    ac_map = huff.get((1, ta))
    if ac_map is None:
        raise ValueError(f"missing AC Huffman table {ta}")
    bh_n = -(-(-(-height * v // vmax)) // 8)
    bw_n = -(-(-(-width * h // hmax)) // 8)
    decode = _ac_refine_block_decode if ah else _ac_first_block_decode
    eobrun = 0
    count = 0
    rst = 0
    for by in range(bh_n):
        for bx in range(bw_n):
            if restart_interval and count and (
                count % restart_interval == 0
            ):
                reader.sync_restart(rst)
                rst += 1
                eobrun = 0
            count += 1
            eobrun = decode(
                reader, coefs[ci][by, bx], ac_map, ss, se, al, eobrun
            )
    return reader.pos


def _ac_first_block_decode(
    reader: _BitReader, blk, ac_map: dict, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """One block of a first AC scan (G.2.2): run/size with EOB-run
    symbols; coefficients land point-transformed (<< Al)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(reader, ac_map)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_block_decode(
    reader: _BitReader, blk, ac_map: dict, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """One block of an AC refinement scan (G.2.3 / the libjpeg
    decode_mcu_AC_refine walk): newly-nonzero coefficients arrive as
    run/1 + sign, history-nonzero coefficients consume a correction
    bit wherever the walk passes them — including for every block
    covered by an EOB run."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(reader, ac_map)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions below
            elif s == 1:
                val = p1 if reader.read_bit() else -p1
            else:
                raise ValueError(
                    "refinement scan symbol with magnitude > 1"
                )
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if reader.read_bit() and (abs(c) & p1) == 0:
                        blk[k] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("refinement run past band end")
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if reader.read_bit() and (abs(c) & p1) == 0:
                    blk[k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun
