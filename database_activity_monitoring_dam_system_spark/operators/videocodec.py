"""Pure-stdlib YUV4MPEG2 (Y4M) video codec — the real-decode seam for
the multimodal frame-sampling operator.

Y4M is the standard uncompressed video interchange container (mjpegtools
/ ffmpeg `-f yuv4mpegpipe`): an ASCII stream header, then per frame an
ASCII ``FRAME`` marker followed by the raw planar pixel bytes.  Because
frames are stored uncompressed, decode needs no entropy coder — which
makes it the one video format this sandbox can genuinely round-trip,
exactly as PNG is for images (imagecodec.py) and RIFF/WAV for audio
(multimodal.synth_wav_media).  Compressed codecs (H.264 & co.) still
raise NotImplementedError at the mime/magic boundary; PyAV/ffmpeg would
plug in at the same seam in production.

No reference analogue (the reference is a Flask+MySQL DAM app); this is
part of the §7 LLM-pipeline extension surface — multimodal columns with
real decode paths where the environment permits.
"""

from __future__ import annotations

Y4M_MAGIC = b"YUV4MPEG2"

# Frame payload size per colorspace, as a function of (width, height).
# 4:2:0 variants carry Y (w*h) + 2 chroma planes at quarter resolution.
_FRAME_SIZES = {
    "mono": lambda w, h: w * h,
    "420": lambda w, h: w * h * 3 // 2,
    "420jpeg": lambda w, h: w * h * 3 // 2,
    "420mpeg2": lambda w, h: w * h * 3 // 2,
    "420paldv": lambda w, h: w * h * 3 // 2,
    "422": lambda w, h: w * h * 2,
    "444": lambda w, h: w * h * 3,
}


def frame_size(width: int, height: int, colorspace: str) -> int:
    """Bytes per frame for a colorspace tag (the `C` header token)."""
    try:
        return _FRAME_SIZES[colorspace](width, height)
    except KeyError:
        raise NotImplementedError(
            f"Y4M colorspace C{colorspace} unsupported "
            f"(one of {sorted(_FRAME_SIZES)})"
        ) from None


def encode_y4m(
    frames: list[bytes],
    *,
    width: int,
    height: int,
    colorspace: str = "mono",
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Write a YUV4MPEG2 stream: one stream header, then FRAME marker +
    raw plane bytes per frame.  Every frame must be exactly
    ``frame_size(width, height, colorspace)`` bytes."""
    fsize = frame_size(width, height, colorspace)
    for i, f in enumerate(frames):
        if len(f) != fsize:
            raise ValueError(
                f"frame {i}: {len(f)} bytes, expected {fsize} "
                f"({width}x{height} C{colorspace})"
            )
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} "
        f"Ip A1:1 C{colorspace}\n"
    ).encode("ascii")
    return header + b"".join(b"FRAME\n" + f for f in frames)


def decode_y4m(payload: bytes) -> tuple[dict, list[bytes]]:
    """Parse a YUV4MPEG2 stream → (params, frames).

    params: width, height, colorspace, fps_num, fps_den, n_frames.
    frames: the raw plane bytes of every frame, in stream order.
    Truncated streams and unknown colorspaces raise (the corrupt-input
    honesty contract shared with imagecodec.decode_png).
    """
    if not payload.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream (bad magic)")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M stream header")
    tokens = payload[:nl].decode("ascii", errors="replace").split(" ")
    width = height = None
    colorspace = "420jpeg"  # spec default when C is absent
    fps_num, fps_den = 25, 1
    for tok in tokens[1:]:
        if not tok:
            continue
        tag, val = tok[0], tok[1:]
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "C":
            colorspace = val
        elif tag == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        # I (interlacing), A (aspect), X (extensions): irrelevant to
        # the plane math — accepted and ignored.
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    fsize = frame_size(width, height, colorspace)

    frames: list[bytes] = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated FRAME header")
        start = fnl + 1
        if start + fsize > n:
            raise ValueError(
                f"truncated frame {len(frames)}: "
                f"{n - start} of {fsize} bytes"
            )
        frames.append(payload[start:start + fsize])
        pos = start + fsize
    params = {
        "width": width,
        "height": height,
        "colorspace": colorspace,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "n_frames": len(frames),
    }
    return params, frames


def sample_indices(total: int, n: int) -> list[int]:
    """Uniform temporal sampling: n source-frame indices spread evenly
    over [0, total) — floor(k*total/n), deduplicated, ascending.  The
    standard keyframe-ish sampling rule, kept integer-exact so a SQL
    oracle can reproduce it."""
    if total <= 0 or n <= 0:
        return []
    if n >= total:
        return list(range(total))
    # total > n makes floor(k·total/n) strictly increasing in k
    return [k * total // n for k in range(n)]
