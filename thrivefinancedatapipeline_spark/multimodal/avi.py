"""Minimal stdlib AVI (RIFF) container codec for MJPEG video.

Completes the video story the same way png.py/gif.py/wav.py did for
images and audio: a REAL container format parsed with nothing but
`struct`, wrapping the REAL baseline JPEG codec (multimodal.jpeg) for
per-frame pixels. `frame_sample_avi` in binary_ops can then do actual
keyframe-style sampling over actual video bytes instead of the
byte-slicing stand-in.

Reference parity note: the reference pipeline
(kushalroy79/thriveFinanceDataPipeline) has no media path at all —
this module belongs to the LLM-training-data extension surface the
brief asks for (video decode / frame-sample plumbing).

Scope (deliberate, mirrors the other codecs' "baseline profile"):
- writer emits RIFF/'AVI ' + LIST hdrl (avih, one 'vids' stream with
  MJPG strh/strf) + LIST movi of '00dc' chunks + idx1;
- reader is chunk-walking and tolerant: it finds the movi LIST and
  returns the '00dc'/'00db' payload bytes in order, so any
  single-video-stream MJPEG AVI parses, not just our own;
- the CONTAINER is byte-transparent (frame bytes in == frame bytes
  out, hypothesis-pinned); lossy-ness lives only in the JPEG layer.

Error surface: `ValueError("corrupt AVI container")` for anything
truncated/out-of-spec (the GIF lesson from round 4's ADVICE — one
error type, not stray KeyError/IndexError).
"""

from __future__ import annotations

import struct

_AVIH = struct.Struct("<14I")
_STRH_HEAD = struct.Struct("<4s4sI2H8I4H")
_BMIH = struct.Struct("<I2i2H2I2i2I")


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(formtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", formtype + body)


def encode_avi_mjpeg(
    jpeg_frames: list, width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap pre-encoded JPEG frame payloads in a minimal valid AVI.

    The frame bytes are stored verbatim in '00dc' chunks — the
    container never re-encodes, so container round-trips are exact.
    """
    if fps <= 0:
        raise ValueError("fps must be positive")
    n = len(jpeg_frames)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)
    avih = _chunk(
        b"avih",
        _AVIH.pack(
            1_000_000 // fps,  # dwMicroSecPerFrame
            max_bytes * fps,   # dwMaxBytesPerSec
            0,                 # dwPaddingGranularity
            0x10,              # dwFlags: AVIF_HASINDEX
            n, 0, 1,           # totalframes, initialframes, streams
            max_bytes,         # dwSuggestedBufferSize
            width, height,
            0, 0, 0, 0,        # dwReserved[4]
        ),
    )
    strh = _chunk(
        b"strh",
        _STRH_HEAD.pack(
            b"vids", b"MJPG", 0, 0, 0, 0,
            1, fps,            # dwScale / dwRate -> fps
            0, n,              # dwStart, dwLength (frames)
            max_bytes,         # dwSuggestedBufferSize
            0xFFFFFFFF,        # dwQuality (default)
            0,                 # dwSampleSize (0: varying)
            0, 0, width, height,  # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        _BMIH.pack(
            40, width, height, 1, 24,
            struct.unpack("<I", b"MJPG")[0],
            width * height * 3, 0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_items = []
    idx_entries = []
    offset = 4  # idx1 offsets are relative to the 'movi' fourcc
    for f in jpeg_frames:
        movi_items.append(_chunk(b"00dc", bytes(f)))
        idx_entries.append(
            b"00dc" + struct.pack("<3I", 0x10, offset, len(f))
        )
        offset += 8 + len(f) + (len(f) % 2)
    movi = _list(b"movi", b"".join(movi_items))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, start: int, end: int, out: list) -> None:
    """Collect (fourcc, payload) for every '00dc'/'00db' chunk inside
    [start, end), recursing into LIST chunks."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("corrupt AVI container")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        body_end = body_start + size
        if body_end > end:
            raise ValueError("corrupt AVI container")
        if fourcc == b"LIST":
            if size < 4:
                raise ValueError("corrupt AVI container")
            _walk(data, body_start + 4, body_end, out)
        elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
            out.append(bytes(data[body_start:body_end]))
        pos = body_end + (size % 2)


def avi_frame_chunks(data: bytes, max_frames: int | None = None) -> list:
    """Return the raw per-frame payload bytes ('00dc'/'00db' chunks)
    of a single-video-stream AVI, in stream order. No JPEG decode —
    this is the byte-transparent container layer."""
    data = bytes(data)
    if not is_avi(data):
        raise ValueError("corrupt AVI container")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    frames: list = []
    _walk(data, 12, end, frames)
    if max_frames is not None:
        frames = frames[:max_frames]
    return frames


def decode_avi_frames(data: bytes, max_frames: int | None = None) -> list:
    """Decode an MJPEG AVI into a list of frame dicts
    ({width, height, pixels}) via the stdlib baseline JPEG decoder."""
    from . import jpeg

    return [
        jpeg.decode_jpeg(f) for f in avi_frame_chunks(data, max_frames)
    ]
