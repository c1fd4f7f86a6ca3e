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
    """Valid mono PCM WAV from integer samples (16-bit signed)."""
    if sampwidth != 2:
        raise NotImplementedError("only 16-bit PCM encode supported")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(data: bytes) -> dict:
    """PCM WAV → {'n_channels', 'sampwidth', 'framerate', 'n_frames',
    'samples'} with samples as a flat list of signed ints (channel-
    interleaved, exactly as stored)."""
    if not is_wav(data):
        raise ValueError("not a WAV")
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
    else:
        raise NotImplementedError(f"sampwidth={sw} PCM not supported")
    return {
        "n_channels": nch,
        "sampwidth": sw,
        "framerate": rate,
        "n_frames": nframes,
        "samples": samples,
    }
