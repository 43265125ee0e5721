"""Pure-Python Y4M (YUV4MPEG2) codec for the multimodal video
operators — implemented from the PUBLIC format specification, no
codec libraries; completes the real-codec sweep across the media
family (BMP/PPM images, RIFF/WAV audio, now Y4M video).

Y4M is the simplest real video container: a single ASCII stream
header (``YUV4MPEG2 W<w> H<h> F<num>:<den> Ip A1:1 C444``), then one
``FRAME`` marker line per frame followed by the raw planes — at C444
chroma, exactly w*h bytes each of Y, U and V. The decoder parses the
tagged header fields and walks frame markers (tolerating per-frame
parameters after ``FRAME``, which the spec allows).

The deterministic test clip for ``doc_id`` (``frame_planes``) mirrors
the imaging formula with a frame term: plane p of frame f at (x, y)
= (doc_id*31 + f*19 + x*7 + y*13 + p*101) % 256 — integer math both
engines reproduce exactly, so the DuckDB oracle recomputes per-frame
plane means analytically while Spark reads them from REAL container
bytes: a frame-marker misparse, plane-order swap, or stride error
breaks the hash.
"""

from __future__ import annotations

import numpy as np

#: small dims keep the oracle's per-pixel lists bounded:
#: w in [4, 9], h in [4, 8], frames in [2, 5] → ≤ 1,080 bytes of
#: planes per clip (single-digit dims also fix the header length)
W_BASE, W_SPREAD = 4, 6
H_BASE, H_SPREAD = 4, 5
F_BASE, F_SPREAD = 2, 4


def clip_shape(doc_id: int) -> tuple[int, int, int]:
    """(n_frames, h, w) of the deterministic clip for ``doc_id``."""
    return (
        F_BASE + doc_id % F_SPREAD,
        H_BASE + doc_id % H_SPREAD,
        W_BASE + doc_id % W_SPREAD,
    )


def frame_planes(doc_id: int, frame: int) -> np.ndarray:
    """Deterministic (3, h, w) uint8 Y/U/V planes for one frame."""
    _, h, w = clip_shape(doc_id)
    y, x = np.mgrid[0:h, 0:w]
    p = np.arange(3)[:, None, None]
    return (
        (doc_id * 31 + frame * 19 + x * 7 + y * 13 + p * 101) % 256
    ).astype(np.uint8)


def encode_y4m(doc_id: int) -> bytes:
    """YUV4MPEG2 stream: tagged ASCII header, then FRAME-marked raw
    C444 planes [public Y4M spec]."""
    nf, h, w = clip_shape(doc_id)
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()]
    for f in range(nf):
        out.append(b"FRAME\n")
        out.append(frame_planes(doc_id, f).tobytes())
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[list[np.ndarray], int, int]:
    """Parse a C444 Y4M stream back to ([frame (3, h, w)], w, h),
    walking FRAME markers (per-frame parameters after the marker are
    legal and skipped)."""
    nl = data.index(b"\n")
    header = data[:nl].decode()
    fields = header.split(" ")
    if fields[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    chroma = None
    for tag in fields[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("C"):
            chroma = tag
            if tag != "C444":
                raise ValueError("only C444 chroma supported")
    if w is None or h is None:
        raise ValueError("missing W/H header tags")
    # Per the Y4M spec a stream with NO C tag defaults to 4:2:0
    # (1.5*w*h bytes per frame) — silently reading it as C444 would
    # misparse the plane layout, so reject it like the WAV decoder
    # rejects unsupported encodings.
    if chroma is None:
        raise ValueError("missing C tag (4:2:0 default unsupported)")
    frames, pos, plane = [], nl + 1, w * h
    while pos < len(data):
        marker_end = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        pos = marker_end + 1
        raw = np.frombuffer(data[pos : pos + 3 * plane], dtype=np.uint8)
        if raw.size != 3 * plane:
            raise ValueError("truncated frame planes")
        frames.append(raw.reshape(3, h, w))
        pos += 3 * plane
    return frames, w, h
