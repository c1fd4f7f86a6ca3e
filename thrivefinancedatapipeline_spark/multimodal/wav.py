"""WAV/PCM codec on the Python stdlib only.

Third real container format next to PNG (`multimodal/png.py`) and GIF
(`multimodal/gif.py`): RIFF/WAVE PCM needs nothing beyond the stdlib
`wave` module plus struct unpacking of the sample words, so the
multimodal audio path can decode REAL bytes in this container —
compressed audio (mp3/aac/opus) keeps the explicit NotImplementedError
gate, same policy as non-baseline PNG and interlaced GIF.

The encoder synthesizes valid 16-bit mono PCM deterministically for
tests and the attestation query; decode returns the exact integer
sample values, so energy (sum of squares) is bit-reproducible and
SQL-computable for the oracle.

r7: G.711 COMPANDED AUDIO (WAVE format tags 7 = mu-law, 6 = A-law —
the telephony/speech-dataset formats) decodes FOR REAL: both laws are
FORMULA-specified (segment/exponent/mantissa expansion, no lookup
tables to transcribe), the stdlib `wave` module refuses them so the
RIFF fmt/data chunks are parsed directly, and the decoded linear
maxima land on the published 32124 (mu) / 32256 (A) figures. The
companion encoders choose the nearest-decoded code (deterministic
tie-break), giving exhaustive code->linear->code round-trip pins.
Truly compressed audio (mp3/aac/opus) keeps the gate.
"""

from __future__ import annotations

import io
import struct
import wave

WAV_MAGIC = b"RIFF"


def is_wav(data: bytes) -> bool:
    return data[:4] == WAV_MAGIC and data[8:12] == b"WAVE"


def encode_wav(
    samples: list[int], sample_rate: int = 16_000, sampwidth: int = 2
) -> bytes:
    """Valid mono PCM WAV from signed integer samples — 16-bit by
    default; 24-bit (the studio/archival interchange width, r11) and
    32-bit packed little-endian signed."""
    if sampwidth not in (2, 3, 4):
        raise NotImplementedError(
            f"sampwidth={sampwidth} PCM encode not supported"
        )
    # one error surface for out-of-range samples across all widths
    # (r11 ADVICE: struct.error at 16/32-bit vs OverflowError at
    # 24-bit was an inconsistent contract for the same misuse)
    lo, hi = -(1 << (8 * sampwidth - 1)), (1 << (8 * sampwidth - 1)) - 1
    for v in samples:
        if not (lo <= v <= hi):
            raise ValueError(
                f"sample {v} out of range for {8 * sampwidth}-bit PCM"
            )
    if sampwidth == 2:
        raw = struct.pack(f"<{len(samples)}h", *samples)
    elif sampwidth == 3:
        raw = b"".join(
            v.to_bytes(3, "little", signed=True) for v in samples
        )
    else:
        raw = struct.pack(f"<{len(samples)}i", *samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(raw)
    return buf.getvalue()


def decode_wav(data: bytes) -> dict:
    """PCM WAV → {'n_channels', 'sampwidth', 'framerate', 'n_frames',
    'samples'} with samples as a flat list of signed ints (channel-
    interleaved, exactly as stored)."""
    if not is_wav(data):
        raise ValueError("not a WAV")
    tag = wav_format_tag(data)
    if tag in (6, 7):  # G.711 A-law / mu-law — stdlib wave refuses
        return _decode_g711(data, tag)
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            nch, sw, rate, nframes = (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
                w.getnframes(),
            )
            if w.getcomptype() != "NONE":
                raise NotImplementedError(
                    "compressed audio needs a native codec"
                )
            raw = w.readframes(nframes)
    except (wave.Error, EOFError, struct.error) as e:
        # wave raises EOFError on truncated chunk headers — normalize
        # every corrupt-payload path to the documented ValueError
        raise ValueError(f"corrupt WAV stream: {e}") from e
    n = nch * nframes
    if sw == 2:
        if len(raw) < 2 * n:
            raise ValueError("WAV sample data truncated")
        samples = list(struct.unpack(f"<{n}h", raw[: 2 * n]))
    elif sw == 1:
        # 8-bit PCM is unsigned per the WAV spec
        if len(raw) < n:
            raise ValueError("WAV sample data truncated")
        samples = list(raw[:n])
    elif sw == 3:
        # 24-bit signed little-endian (r11)
        if len(raw) < 3 * n:
            raise ValueError("WAV sample data truncated")
        samples = [
            int.from_bytes(raw[3 * i : 3 * i + 3], "little", signed=True)
            for i in range(n)
        ]
    elif sw == 4:
        if len(raw) < 4 * n:
            raise ValueError("WAV sample data truncated")
        samples = list(struct.unpack(f"<{n}i", raw[: 4 * n]))
    else:
        raise NotImplementedError(f"sampwidth={sw} PCM not supported")
    return {
        "n_channels": nch,
        "sampwidth": sw,
        "framerate": rate,
        "n_frames": nframes,
        "samples": samples,
    }


# ---------------------------------------------------------------------------
# G.711 companded audio (r7): WAVE format tags 7 (mu-law) / 6 (A-law).
# ---------------------------------------------------------------------------

def mulaw_decode_byte(b: int) -> int:
    """One G.711 mu-law code -> linear 16-bit sample (bias 0x84
    segment expansion; max amplitude 32124 per the spec)."""
    b = ~b & 0xFF
    sign = b & 0x80
    exp = (b >> 4) & 7
    man = b & 0x0F
    s = (((man << 3) + 0x84) << exp) - 0x84
    return -s if sign else s


def alaw_decode_byte(b: int) -> int:
    """One G.711 A-law code -> linear sample (0x55 toggle, segment
    expansion; sign bit 1 = POSITIVE in A-law; max 32256)."""
    b ^= 0x55
    sign = b & 0x80
    exp = (b >> 4) & 7
    man = b & 0x0F
    if exp == 0:
        s = (man << 4) + 8
    else:
        s = ((man << 4) + 0x108) << (exp - 1)
    return s if sign else -s


def _g711_encode_table(decode_fn) -> list:
    """(value, code) pairs sorted by decoded value — the encoder
    picks the nearest decoded level (ties toward the smaller code),
    which is exactly the quantizer the decode formula defines."""
    pairs = sorted(
        (decode_fn(c), c) for c in range(256)
    )
    return pairs


_MULAW_LEVELS = _g711_encode_table(mulaw_decode_byte)
_ALAW_LEVELS = _g711_encode_table(alaw_decode_byte)


def _g711_encode_sample(x: int, levels: list) -> int:
    import bisect

    i = bisect.bisect_left(levels, (x,))
    cands = []
    if i < len(levels):
        cands.append(levels[i])
    if i > 0:
        cands.append(levels[i - 1])
    return min(cands, key=lambda vc: (abs(vc[0] - x), vc[1]))[1]


def mulaw_encode_sample(x: int) -> int:
    return _g711_encode_sample(x, _MULAW_LEVELS)


def alaw_encode_sample(x: int) -> int:
    return _g711_encode_sample(x, _ALAW_LEVELS)


def _riff_chunks(data: bytes) -> list:
    """[(chunk_id, payload)] from a RIFF/WAVE stream (even-padded
    chunk sizes per RIFF)."""
    if not is_wav(data):
        raise ValueError("not a WAV")
    out = []
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("corrupt WAV stream: chunk truncated")
        out.append((cid, body))
        pos += 8 + size + (size & 1)
    return out


def wav_format_tag(data: bytes) -> int:
    """The WAVE fmt chunk's format tag (1 = PCM, 6 = A-law,
    7 = mu-law, ...)."""
    for cid, body in _riff_chunks(data):
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("corrupt WAV stream: fmt too short")
            return struct.unpack_from("<H", body, 0)[0]
    raise ValueError("corrupt WAV stream: no fmt chunk")


def _decode_g711(data: bytes, tag: int) -> dict:
    fmt = None
    payload = None
    for cid, body in _riff_chunks(data):
        if cid == b"fmt " and fmt is None:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data" and payload is None:
            payload = body
    if fmt is None or payload is None:
        raise ValueError("corrupt WAV stream: missing fmt/data")
    _tag, nch, rate, _br, _align, bits = fmt
    if bits != 8:
        raise ValueError(f"G.711 WAV must be 8 bits/sample, got {bits}")
    if nch < 1:
        raise ValueError("corrupt WAV stream: zero channels")
    dec = mulaw_decode_byte if tag == 7 else alaw_decode_byte
    samples = [dec(b) for b in payload]
    return {
        "n_channels": nch,
        "sampwidth": 1,
        "framerate": rate,
        "n_frames": len(payload) // nch,
        "samples": samples,
        "encoding": "mulaw" if tag == 7 else "alaw",
    }


def encode_wav_g711(
    samples: list[int], sample_rate: int = 8_000, law: str = "mulaw"
) -> bytes:
    """Valid mono G.711 WAV (format tag 7/6) from linear samples —
    each companded to the nearest decodable level."""
    if law == "mulaw":
        tag, enc = 7, mulaw_encode_sample
    elif law == "alaw":
        tag, enc = 6, alaw_encode_sample
    else:
        raise ValueError("law must be 'mulaw' or 'alaw'")
    payload = bytes(enc(int(x)) for x in samples)
    fmt = struct.pack(
        "<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
