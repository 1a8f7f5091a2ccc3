"""Pure-stdlib WAV (RIFF/PCM16) codec — the audio twin of png_codec.py.

Gives the multimodal tier a REAL audio decode path with zero external
dependencies: struct-level RIFF chunk parsing (fmt validation, chunk
walking, little-endian PCM16 samples) and the matching encoder. Used by
the Arrow `mapInPandas` audio operators in operators/multimodal.py; the
catalog query replays the decoded-sample statistics from the source
bytes in DuckDB, so the codec itself sits under a hash-exact
differential check (same proof structure as multimodal_png_decode).
"""

from __future__ import annotations

import struct


def encode_wav(
    samples: list[int], *, sample_rate: int = 8000
) -> bytes:
    """Mono PCM16 WAV: RIFF header + fmt chunk + data chunk."""
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} out of int16 range")
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse a mono PCM16 WAV; returns (sample_rate, samples).
    Walks RIFF chunks (tolerating extra chunks in any order), validates
    the fmt contract, and rejects truncated or non-PCM payloads."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_len,) = struct.unpack_from("<I", payload, 4)
    if riff_len + 8 != len(payload):
        raise ValueError("RIFF length mismatch")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only mono PCM16 supported")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(data) % 2:
        raise ValueError("odd PCM16 data length")
    return rate, list(struct.unpack(f"<{len(data) // 2}h", data))
