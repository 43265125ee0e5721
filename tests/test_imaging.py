"""Pure-Python image codecs (functions/imaging.py): spec conformance
the oracle hash can't isolate — roundtrips across every fixture shape,
BMP row padding / bottom-up flip / BGR order, top-down BMP parsing,
PPM header comments, unsupported-format refusal, and the
nearest-neighbor sampling grid."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from clj_kinesis_to_firehose_spark.functions.imaging import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    pixel_array,
    resize_nearest,
)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 12, 13, 77, 142, 499])
def test_bmp_and_ppm_roundtrip_every_shape(doc_id):
    a = pixel_array(doc_id)
    assert np.array_equal(decode_bmp(encode_bmp(a)), a)
    assert np.array_equal(decode_ppm(encode_ppm(a)), a)
    assert np.array_equal(decode_image(encode_bmp(a)), a)
    assert np.array_equal(decode_image(encode_ppm(a)), a)


def test_bmp_rows_are_bottom_up_padded_bgr():
    # decode a hand-assembled 2x2 BMP: bytes on the wire are bottom row
    # first, BGR, each 6-byte row padded to 8
    px = {  # (x, y) -> RGB
        (0, 0): (1, 2, 3), (1, 0): (4, 5, 6),
        (0, 1): (7, 8, 9), (1, 1): (10, 11, 12),
    }
    row1 = bytes([9, 8, 7, 12, 11, 10]) + b"\x00\x00"  # y=1 first (bottom-up)
    row0 = bytes([3, 2, 1, 6, 5, 4]) + b"\x00\x00"
    body = row1 + row0
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body), 0, 0, 0, 0)
    arr = decode_bmp(hdr + info + body)
    for (x, y), rgb in px.items():
        assert tuple(arr[y, x]) == rgb


def test_bmp_negative_height_is_top_down():
    a = pixel_array(9)
    h, w = a.shape[:2]
    # encode_bmp(a[::-1]) puts a's rows top-down on the wire; marking
    # the height negative must make the decoder read them as-is
    data = bytearray(encode_bmp(a[::-1]))
    struct.pack_into("<i", data, 22, -h)
    assert np.array_equal(decode_bmp(bytes(data)), a)


def test_ppm_header_comments_and_whitespace():
    a = pixel_array(5)
    h, w = a.shape[:2]
    data = (
        f"P6\n# generated\n  {w}\t{h}\n# maxval next\n255\n".encode()
        + a.tobytes()
    )
    assert np.array_equal(decode_ppm(data), a)


def test_unsupported_payloads_are_refused():
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG....")
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n1 2 3")  # ASCII PPM: not supported
    a = pixel_array(3)
    data = bytearray(encode_bmp(a))
    struct.pack_into("<H", data, 28, 8)  # bpp=8
    with pytest.raises(ValueError):
        decode_bmp(bytes(data))


def test_resize_nearest_grid_is_exact_integer_sampling():
    a = pixel_array(142)
    h, w = a.shape[:2]
    out = resize_nearest(a, 16)
    oh, ow = out.shape[:2]
    assert max(ow, oh) == 16
    for oy in range(oh):
        for ox in range(ow):
            assert np.array_equal(
                out[oy, ox], a[(oy * h) // oh, (ox * w) // ow]
            )


def test_resize_preserves_aspect_direction():
    a = pixel_array(1)  # w != h for doc 1
    h, w = a.shape[:2]
    out = resize_nearest(a, 16)
    oh, ow = out.shape[:2]
    assert (w >= h) == (ow >= oh)


# ---------------------------------------------------- property tests

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_holds_for_arbitrary_images(w, h, seed):
    # every (w, h) including the padding-relevant w%4 classes, content
    # decoupled from the deterministic fixture formula
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(a)), a)
    assert np.array_equal(decode_ppm(encode_ppm(a)), a)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    box=st.integers(1, 64),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_dims_and_sampling_are_lawful(w, h, box, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = resize_nearest(a, box)
    oh, ow = out.shape[:2]
    # longest edge hits the box (unless clamped to 1), aspect ordering
    # preserved, and every output pixel exists in the source
    assert max(ow, oh) == max(1, box)
    assert (w >= h) == (ow >= oh) or min(ow, oh) == 1
    vals = {tuple(px) for row in a for px in row}
    assert all(tuple(px) in vals for row in out for px in row)


@settings(max_examples=100, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200))
def test_decoder_rejects_junk_with_valueerror_never_crashes(junk):
    # header fuzz: arbitrary bytes either raise ValueError (or the
    # struct/index errors a malformed-but-magic'd header produces,
    # wrapped as ValueError by callers' contract) — never hang or
    # return garbage silently for non-magic input
    if junk[:2] not in (b"BM", b"P6"):
        with pytest.raises(ValueError):
            decode_image(junk)
