"""Avro reader/writer schema resolution (sources/avro_schema.py) —
the spec rules a rolling producer deploy exercises: name matching
across reorder, reader aliases for renames, defaults for added
fields, decode-and-skip for removed fields, numeric/string
promotions, null-union handling, and loud failure on unresolvable
pairs or corrupt bytes."""

from __future__ import annotations

import pytest

from clj_kinesis_to_firehose_spark.sources.avro_schema import (
    SchemaResolutionError,
    avro_decode,
    avro_encode,
    resolve,
)


def _rec(*fields):
    return {"type": "record", "name": "T", "fields": list(fields)}


def _roundtrip(writer, reader, record):
    return avro_decode(avro_encode(writer, record), resolve(writer, reader), reader)


def test_identity_roundtrip_all_primitives():
    w = _rec(
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "y", "type": "bytes"},
    )
    rec = {"b": True, "i": -7, "l": 1 << 40, "f": 0.5, "d": 3.25,
           "s": "héllo", "y": b"\x00\xff"}
    assert _roundtrip(w, w, rec) == rec


def test_field_reorder_resolves_by_name():
    w = _rec({"name": "a", "type": "long"}, {"name": "b", "type": "string"})
    r = _rec({"name": "b", "type": "string"}, {"name": "a", "type": "long"})
    out = _roundtrip(w, r, {"a": 42, "b": "x"})
    assert out == {"b": "x", "a": 42}
    assert list(out) == ["b", "a"]  # reader field order


def test_reader_alias_absorbs_rename():
    w = _rec({"name": "kind", "type": "string"})
    r = _rec({"name": "event_type", "type": "string", "aliases": ["kind"]})
    assert _roundtrip(w, r, {"kind": "click"}) == {"event_type": "click"}


def test_added_field_fills_default_and_missing_default_errors():
    w = _rec({"name": "a", "type": "long"})
    r_ok = _rec({"name": "a", "type": "long"},
                {"name": "ver", "type": "int", "default": 2})
    assert _roundtrip(w, r_ok, {"a": 1}) == {"a": 1, "ver": 2}
    r_bad = _rec({"name": "a", "type": "long"}, {"name": "ver", "type": "int"})
    with pytest.raises(SchemaResolutionError, match="no default"):
        resolve(w, r_bad)


def test_removed_field_is_skipped():
    w = _rec({"name": "a", "type": "long"},
             {"name": "legacy", "type": "string"},
             {"name": "b", "type": "double"})
    r = _rec({"name": "a", "type": "long"}, {"name": "b", "type": "double"})
    assert _roundtrip(w, r, {"a": 9, "legacy": "zzz", "b": 1.5}) == {
        "a": 9, "b": 1.5}


@pytest.mark.parametrize(
    "wt,rt,val,expect",
    [
        ("int", "long", -3, -3),
        ("int", "float", 12, 12.0),
        ("int", "double", 12, 12.0),
        ("long", "double", 1 << 40, float(1 << 40)),
        ("float", "double", 0.25, 0.25),
        ("string", "bytes", "ab", b"ab"),
        ("bytes", "string", b"ab", "ab"),
    ],
)
def test_promotions(wt, rt, val, expect):
    w = _rec({"name": "x", "type": wt})
    r = _rec({"name": "x", "type": rt})
    out = _roundtrip(w, r, {"x": val})
    assert out == {"x": expect}
    assert type(out["x"]) is type(expect)


def test_narrowing_is_rejected_at_plan_time():
    w = _rec({"name": "x", "type": "long"})
    r = _rec({"name": "x", "type": "int"})
    with pytest.raises(SchemaResolutionError, match="does not resolve"):
        resolve(w, r)


def test_nonunion_writer_into_union_reader():
    w = _rec({"name": "x", "type": "double"})
    r = _rec({"name": "x", "type": ["null", "double"], "default": None})
    assert _roundtrip(w, r, {"x": 2.5}) == {"x": 2.5}


def test_union_writer_into_nonunion_reader():
    w = _rec({"name": "x", "type": ["null", "string"]})
    r = _rec({"name": "x", "type": "string"})
    # non-null branch collapses cleanly
    assert _roundtrip(w, r, {"x": "ok"}) == {"x": "ok"}
    # a null value cannot land in the non-null reader: decode-time error
    blob = avro_encode(w, {"x": None})
    with pytest.raises(ValueError):
        avro_decode(blob, resolve(w, r), r)


def test_union_roundtrip_preserves_null():
    w = _rec({"name": "x", "type": ["null", "long"]})
    assert _roundtrip(w, w, {"x": None}) == {"x": None}
    assert _roundtrip(w, w, {"x": 5}) == {"x": 5}


def test_trailing_and_truncated_bytes_fail_loud():
    w = _rec({"name": "a", "type": "long"})
    plan = resolve(w, w)
    blob = avro_encode(w, {"a": 1})
    with pytest.raises(ValueError, match="trailing"):
        avro_decode(blob + b"\x00", plan, w)
    w2 = _rec({"name": "a", "type": "long"}, {"name": "s", "type": "string"})
    blob2 = avro_encode(w2, {"a": 1, "s": "hello"})
    with pytest.raises(ValueError):
        avro_decode(blob2[:-3], resolve(w2, w2), w2)


def test_registry_framing_roundtrip_and_corruption():
    from clj_kinesis_to_firehose_spark.sources.avro_schema import (
        frame_registry,
        unframe_registry,
    )

    framed = frame_registry(7, b"payload")
    assert unframe_registry(framed) == (7, b"payload")
    with pytest.raises(ValueError, match="magic"):
        unframe_registry(b"\x01" + framed[1:])
    with pytest.raises(ValueError, match="shorter"):
        unframe_registry(b"\x00\x00")
    with pytest.raises(ValueError, match="u32"):
        frame_registry(1 << 32, b"")


def test_registry_decoder_resolves_per_record_writer():
    from clj_kinesis_to_firehose_spark.sources.avro_schema import (
        RegistryDecoder,
        frame_registry,
    )

    v1 = _rec({"name": "a", "type": "long"})
    v2 = _rec({"name": "a", "type": "long"},
              {"name": "ver", "type": "int", "default": 2})
    reader = v2
    dec = RegistryDecoder({1: v1, 2: v2}, reader)
    b1 = frame_registry(1, avro_encode(v1, {"a": 10}))
    b2 = frame_registry(2, avro_encode(v2, {"a": 11, "ver": 2}))
    assert dec.decode(b1) == (1, {"a": 10, "ver": 2})
    assert dec.decode(b2) == (2, {"a": 11, "ver": 2})
    # plans cached once per distinct id
    assert set(dec._plans) == {1, 2}
    dec.decode(b1)
    assert set(dec._plans) == {1, 2}
    with pytest.raises(SchemaResolutionError, match="unknown schema id"):
        dec.decode(frame_registry(9, b""))


def test_writer_default_fills_encode_side():
    w = _rec({"name": "a", "type": "long"},
             {"name": "ver", "type": "int", "default": 7})
    assert _roundtrip(w, w, {"a": 1}) == {"a": 1, "ver": 7}
