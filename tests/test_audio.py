"""WAV codec properties (functions/audio.py): byte-exact round-trip
over Hypothesis-generated waveforms, chunk-walk robustness against
inserted non-data chunks, and malformed-stream rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clj_kinesis_to_firehose_spark.functions.audio import (
    decimate,
    decode_wav,
    encode_wav,
    sample_array,
    sample_rate,
)


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=600
    ),
    st.sampled_from([8000, 11025, 16000, 22050, 44100]),
)
@settings(max_examples=200, deadline=None)
def test_roundtrip_identity(samples, rate):
    arr = np.array(samples, dtype=np.int16)
    got, got_rate = decode_wav(encode_wav(arr, rate))
    assert got_rate == rate
    assert np.array_equal(got, arr)


def test_header_is_canonical_44_bytes():
    arr = sample_array(7)
    data = encode_wav(arr, sample_rate(7))
    assert len(data) == 44 + 2 * len(arr)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def test_chunk_walk_skips_foreign_chunks():
    # a LIST/INFO chunk between fmt and data is valid RIFF; the
    # decoder must skip it, including the odd-size pad byte
    arr = sample_array(3)
    rate = sample_rate(3)
    data = encode_wav(arr, rate)
    fmt_end = 12 + 8 + 16
    foreign = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    patched = data[:fmt_end] + foreign + data[fmt_end:]
    riff_size = struct.pack("<I", len(patched) - 8)
    patched = patched[:4] + riff_size + patched[8:]
    got, got_rate = decode_wav(patched)
    assert got_rate == rate and np.array_equal(got, arr)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: b"RIFX" + d[4:],  # wrong magic
        lambda d: d[:20] + struct.pack("<H", 3) + d[22:],  # float tag
        lambda d: d[:44],  # data chunk header only... truncated stream
    ],
)
def test_malformed_streams_rejected_or_safe(mutate):
    data = encode_wav(sample_array(1), 8000)
    bad = mutate(data)
    try:
        samples, rate = decode_wav(bad)
    except ValueError:
        return  # rejection is the expected path
    # a decode that "succeeds" must at least be self-consistent
    assert rate > 0 and len(samples) >= 0


@given(st.integers(min_value=0, max_value=10_000), st.integers(2, 5))
@settings(max_examples=100, deadline=None)
def test_decimation_length_law(doc_id, k):
    arr = sample_array(doc_id)
    out = decimate(arr, k)
    assert len(out) == (len(arr) - 1) // k + 1
    assert np.array_equal(out, arr[::k])


# --------------------------------------------------------------- Y4M


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=150, deadline=None)
def test_y4m_roundtrip_identity(doc_id):
    from clj_kinesis_to_firehose_spark.functions.video import (
        clip_shape,
        decode_y4m,
        encode_y4m,
        frame_planes,
    )

    nf, h, w = clip_shape(doc_id)
    frames, got_w, got_h = decode_y4m(encode_y4m(doc_id))
    assert (got_w, got_h, len(frames)) == (w, h, nf)
    for f, planes in enumerate(frames):
        assert np.array_equal(planes, frame_planes(doc_id, f))


def test_y4m_frame_params_are_skipped():
    # per-frame parameters after the FRAME marker are legal Y4M; the
    # chunk walk must honor the marker's own newline, not offset 5
    from clj_kinesis_to_firehose_spark.functions.video import (
        decode_y4m,
        encode_y4m,
        frame_planes,
    )

    data = encode_y4m(3)
    patched = data.replace(b"FRAME\n", b"FRAME Xcustom\n", 1)
    frames, _, _ = decode_y4m(patched)
    assert np.array_equal(frames[0], frame_planes(3, 0))


def test_y4m_malformed_rejected():
    import pytest as _pytest

    from clj_kinesis_to_firehose_spark.functions.video import (
        decode_y4m,
        encode_y4m,
    )

    data = encode_y4m(1)
    with _pytest.raises(ValueError):
        decode_y4m(b"MPEG4YUV2" + data[9:])
    with _pytest.raises(ValueError):
        decode_y4m(data.replace(b"C444", b"C420"))
    with _pytest.raises(ValueError):
        decode_y4m(data[:-5])  # truncated final frame
