"""Pure-Python WAV (RIFF PCM-16 mono) codec for the multimodal audio
operators — implemented from the PUBLIC format specification, no
codec libraries, the audio twin of functions/imaging.py: a canonical
RIFF header ('RIFF' size 'WAVE'), a 16-byte 'fmt ' chunk (PCM tag 1,
mono, 16-bit), and a 'data' chunk of little-endian int16 samples.
The decoder WALKS chunks rather than assuming fixed offsets, so a
writer that inserts a LIST/INFO chunk still parses.

The deterministic test waveform for ``doc_id`` (``sample_array``) is
what lets a cross-engine oracle exist: sample i =
(doc_id*31 + i*17) % 4096 − 2048 — integer arithmetic both engines
reproduce exactly, so the DuckDB oracle recomputes sample sums and
sums of squares analytically while Spark derives them from REAL
decoded bytes: a wrong endianness, chunk offset, or sample width in
the decoder breaks the hash.
"""

from __future__ import annotations

import struct

import numpy as np

#: sample-count and rate spreads stay small so the SQL oracle's
#: per-sample list stays bounded: n in [256, 319]
N_BASE, N_SPREAD = 256, 64
RATES = (8000, 12000, 16000, 20000)


def sample_array(doc_id: int) -> np.ndarray:
    """Deterministic int16 mono waveform for ``doc_id``."""
    n = N_BASE + doc_id % N_SPREAD
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 31 + i * 17) % 4096 - 2048).astype(np.int16)


def sample_rate(doc_id: int) -> int:
    return RATES[doc_id % 4]


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Canonical 44-byte-header RIFF/WAVE, PCM-16 mono, little-endian
    [public WAV/RIFF spec]."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF/WAVE PCM-16 mono back to (samples, rate), walking
    chunks (fmt may be followed by non-data chunks) and honoring the
    declared data-chunk size, not the buffer length."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) != size:
            # honor the DECLARED chunk size: a stream cut mid-chunk is
            # corruption, not a shorter recording
            raise ValueError("truncated chunk: declared size exceeds stream")
        if cid == b"fmt ":
            tag, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if tag != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM-16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return samples, rate


def decimate(samples: np.ndarray, k: int) -> np.ndarray:
    """Every k-th sample from index 0 — the exact-integer stand-in
    for resampling (a real low-pass polyphase kernel drops in here;
    decimation keeps the oracle integer-exact)."""
    return samples[::k]
