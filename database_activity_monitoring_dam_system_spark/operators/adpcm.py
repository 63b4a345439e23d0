"""Pure-stdlib IMA ADPCM (DVI4) WAV codec — the first COMPRESSED
audio format behind the engine's decode boundary.

IMA/DVI ADPCM (WAV format tag 0x0011) is fully specified integer
arithmetic (IMA "Recommended Practices for Enhancing Digital Audio
Compatibility", 1992; the reference step/index tables every decoder
ships): 4 bits per sample, a per-block header carrying the int16
predictor seed and step-table index, then nibbles — each one updates
the predictor by a step-scaled delta and walks the step index.  That
makes it the rare compressed codec whose decode is BYTE-EXACTLY
reproducible in ANSI SQL (a recursive CTE over the nibble sequence),
so the driver's DuckDB oracle can pin a genuine compressed-audio
decode — unlike DCT codecs, where only constructed fixtures are
exact.

Scope: mono/stereo 4-bit IMA ADPCM in RIFF/WAV containers (the
``wave`` stdlib module only reads PCM, so the RIFF walk here is its
ADPCM sibling).  Encoder included — fixtures and round-trip tests
need one; it is the standard greedy quantizer (decode-in-the-loop,
so encode→decode drift never accumulates).

At 100 TB the per-payload work stays inside the Arrow-batched
``mapInPandas`` operators in multimodal.py, same as PNG/JPEG/WAV;
a production cluster would swap in ffmpeg at the same seam for the
codecs that remain out of scope (MP3/AAC/Opus — perceptual codecs
with no exact integer spec).
"""

from __future__ import annotations

import struct

STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)

INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

WAVE_FORMAT_IMA_ADPCM = 0x0011


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_idx(i: int) -> int:
    return 0 if i < 0 else (88 if i > 88 else i)


def decode_nibble(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA step: (new predictor, new step index) after decoding a
    4-bit code against the current state — the exact integer
    recurrence the SQL oracle unrolls."""
    step = STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = _clamp16(pred - diff if nibble & 8 else pred + diff)
    return pred, _clamp_idx(index + INDEX_TABLE[nibble])


def decode_block(
    block: bytes, channels: int
) -> list[list[int]]:
    """Decode one IMA ADPCM block → per-channel int16 sample lists.

    Block layout (Microsoft WAV mapping): per channel a 4-byte header
    (int16 predictor — emitted as the first sample — uint8 step
    index, reserved byte), then data interleaved in 4-byte
    per-channel words: each 4-byte word carries 8 nibbles for ONE
    channel, channels round-robin word by word; within a byte the
    LOW nibble decodes first."""
    if len(block) < 4 * channels:
        raise ValueError("ADPCM block shorter than its headers")
    preds, idxs, out = [], [], []
    for c in range(channels):
        pred, idx, _res = struct.unpack_from("<hBB", block, c * 4)
        if idx > 88:
            raise ValueError(f"ADPCM step index {idx} out of range")
        preds.append(pred)
        idxs.append(idx)
        out.append([pred])
    data = block[4 * channels:]
    if len(data) % (4 * channels):
        raise ValueError("ADPCM block data not word-aligned")
    for word0 in range(0, len(data), 4 * channels):
        for c in range(channels):
            for b in data[word0 + 4 * c:word0 + 4 * c + 4]:
                for nib in (b & 0x0F, b >> 4):
                    preds[c], idxs[c] = decode_nibble(
                        nib, preds[c], idxs[c]
                    )
                    out[c].append(preds[c])
    return out


def encode_block(
    samples: list[list[int]], index: list[int] | None = None
) -> bytes:
    """Encode per-channel int16 samples as one IMA ADPCM block.

    ``samples[c][0]`` seeds the header predictor verbatim (it round-
    trips exactly); the remaining samples quantize greedily with the
    decoder in the loop.  Every channel must carry 1 + 8·w samples
    for the same integer w ≥ 0.  The header step index defaults to
    the table entry nearest each channel's first delta (the standard
    attack heuristic — starting at step 7 against a loud signal takes
    dozens of samples to ramp)."""
    channels = len(samples)
    n = len(samples[0])
    if any(len(s) != n for s in samples):
        raise ValueError("channels must carry equal sample counts")
    if n < 1 or (n - 1) % 8:
        raise ValueError("per-channel samples must be 1 + 8*w")
    if index is not None:
        idxs = list(index)
    else:
        idxs = []
        for s in samples:
            d0 = abs(int(s[1]) - int(s[0])) if len(s) > 1 else 0
            idxs.append(
                min(
                    range(len(STEP_TABLE)),
                    key=lambda i: abs(STEP_TABLE[i] - d0),
                )
            )
    preds = [int(s[0]) for s in samples]
    head = b"".join(
        struct.pack("<hBB", preds[c], idxs[c], 0)
        for c in range(channels)
    )
    nibs: list[list[int]] = [[] for _ in range(channels)]
    for c in range(channels):
        for target in samples[c][1:]:
            step = STEP_TABLE[idxs[c]]
            delta = int(target) - preds[c]
            nib = 8 if delta < 0 else 0
            if delta < 0:
                delta = -delta
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            preds[c], idxs[c] = decode_nibble(nib, preds[c], idxs[c])
            nibs[c].append(nib)
    body = bytearray()
    per_chan = len(nibs[0])
    for w in range(0, per_chan, 8):
        for c in range(channels):
            chunk = nibs[c][w:w + 8]
            for k in range(0, 8, 2):
                body.append(chunk[k] | (chunk[k + 1] << 4))
    return head + bytes(body)


def _frames_per_block(block_align: int, channels: int) -> int:
    return (block_align - 4 * channels) // channels * 2 + 1


def encode_ima_wav(
    samples: list[list[int]],
    *,
    sample_rate: int = 8000,
    block_frames: int | None = None,
) -> bytes:
    """RIFF/WAV container around IMA ADPCM blocks (format tag 0x0011,
    the fact chunk carrying the true frame count, as the WAV mapping
    requires).  All channels' sample lists must divide evenly into
    blocks of ``block_frames`` (default: everything in one block)."""
    channels = len(samples)
    n = len(samples[0])
    if block_frames is None:
        block_frames = n
    if (block_frames - 1) % 8:
        raise ValueError("block_frames must be 1 + 8*w")
    if n % block_frames:
        raise ValueError("sample count must divide into whole blocks")
    block_align = 4 * channels + (block_frames - 1) // 2 * channels
    data = b"".join(
        encode_block(
            [s[b:b + block_frames] for s in samples]
        )
        for b in range(0, n, block_frames)
    )
    byte_rate = sample_rate * block_align // block_frames
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM, channels, sample_rate, byte_rate,
        block_align, 4, 2, block_frames,
    )
    fact = struct.pack("<I", n)
    riff = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_ima_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse + decode an IMA ADPCM WAV → (channels, sample_rate,
    n_frames, little-endian int16 PCM bytes, frame-interleaved).

    Raises ValueError on non-RIFF input and NotImplementedError on
    format tags other than 0x0011 — the same honest seam contract as
    the image decoders."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    n_frames = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            (n_frames,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            payload = body
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, _br, block_align = struct.unpack_from(
        "<HHIIH", fmt, 0
    )
    if tag != WAVE_FORMAT_IMA_ADPCM:
        raise NotImplementedError(
            f"WAV format tag 0x{tag:04x} unsupported here (IMA ADPCM "
            "0x0011 only; PCM goes through the stdlib wave reader)"
        )
    frames: list[bytes] = []
    total = 0
    fpb = _frames_per_block(block_align, channels)
    for b in range(0, len(payload), block_align):
        block = payload[b:b + block_align]
        if len(block) < 4 * channels:
            break
        chans = decode_block(block, channels)
        take = len(chans[0])
        if n_frames is not None:
            take = min(take, n_frames - total)
        for f in range(take):
            for c in range(channels):
                frames.append(struct.pack("<h", chans[c][f]))
        total += take
    if n_frames is not None and total > n_frames:
        total = n_frames
    del fpb
    return channels, rate, total, b"".join(frames[:total * channels])
