"""Property-based Avro schema-resolution tests (Hypothesis): for ANY
writer schema, ANY reader derived from it through the spec's supported
evolutions — field drops (decode-and-skip), added-with-default fields,
alias renames, promotions along the spec table, field reorders, and
nullable-union wraps — decoding a writer-encoded record through the
compiled plan must yield exactly the reader's view. The example-based
tests (test_avro_resolution.py) pin the named spec behaviors; this
harness sweeps their compositions."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from clj_kinesis_to_firehose_spark.sources.avro_schema import (
    PROMOTIONS,
    avro_decode,
    avro_encode,
    resolve,
)

_PRIMS = ["boolean", "int", "long", "float", "double", "bytes", "string"]


def _value_for(typ, draw):
    if typ == "boolean":
        return draw(st.booleans())
    if typ == "int":
        return draw(st.integers(-(2**31), 2**31 - 1))
    if typ == "long":
        return draw(st.integers(-(2**50), 2**50))
    if typ in ("float", "double"):
        # halves are exact in float32, so float->double promotion is
        # value-preserving and the equality check stays bit-exact
        return draw(st.integers(-10_000, 10_000)) / 2.0
    if typ == "bytes":
        # ASCII-only payloads keep the bytes<->string promotion edges
        # well-defined (the spec reinterprets the raw bytes as UTF-8;
        # invalid sequences are a producer bug, not a resolution case)
        return draw(st.text(alphabet="abcdefgh ", max_size=12)).encode()
    return draw(st.text(alphabet="abcdefgh ", max_size=12))


def _promoted(value, wt, rt):
    if wt == rt or value is None:
        return value
    if rt in ("float", "double") or rt == "long":
        return float(value) if rt in ("float", "double") else int(value)
    if wt == "string" and rt == "bytes":
        return value.encode("utf-8")
    if wt == "bytes" and rt == "string":
        return value.decode("utf-8")
    return value


@st.composite
def _schema_pair_and_record(draw):
    n = draw(st.integers(1, 6))
    writer_fields, record = [], {}
    for i in range(n):
        typ = draw(st.sampled_from(_PRIMS))
        nullable = draw(st.booleans())
        name = f"f{i}"
        ftype = ["null", typ] if nullable else typ
        writer_fields.append({"name": name, "type": ftype})
        if nullable and draw(st.booleans()):
            record[name] = None
        else:
            record[name] = _value_for(typ, draw)

    reader_fields, expected = [], {}
    for f in writer_fields:
        keep = draw(st.booleans())
        if not keep:
            continue  # writer-only: decode-and-skip
        name, ftype = f["name"], f["type"]
        base = ftype[1] if isinstance(ftype, list) else ftype
        rf = {"name": name, "type": ftype}
        # rename via reader alias
        if draw(st.booleans()):
            rf = {**rf, "name": f"renamed_{name}", "aliases": [name]}
        # promotion along a spec edge (on the non-null branch)
        promos = sorted(PROMOTIONS.get(base, ()))
        if promos and draw(st.booleans()):
            rt = draw(st.sampled_from(promos))
            rf["type"] = ["null", rt] if isinstance(ftype, list) else rt
            expected[rf["name"]] = _promoted(record[name], base, rt)
        else:
            expected[rf["name"]] = record[name]
        reader_fields.append(rf)
    # reader-only fields with defaults
    for j in range(draw(st.integers(0, 2))):
        typ = draw(st.sampled_from(_PRIMS))
        dflt = _value_for(typ, draw)
        if typ == "bytes":
            # Avro JSON defaults for bytes are ISO-8859-1 strings; keep
            # the harness in the plainly-typed lane
            typ, dflt = "string", "dflt"
        reader_fields.append({"name": f"new{j}", "type": typ, "default": dflt})
        expected[f"new{j}"] = dflt
    # reorder the reader: resolution is by name, never by position
    order = draw(st.permutations(range(len(reader_fields))))
    reader_fields = [reader_fields[i] for i in order]

    writer = {"type": "record", "name": "R", "fields": writer_fields}
    reader = {"type": "record", "name": "R", "fields": reader_fields}
    return writer, reader, record, expected


@settings(max_examples=150, deadline=None)
@given(data=_schema_pair_and_record())
def test_any_supported_evolution_resolves_exactly(data):
    writer, reader, record, expected = data
    blob = avro_encode(writer, record)
    plan = resolve(writer, reader)
    assert avro_decode(blob, plan, reader) == expected


@settings(max_examples=80, deadline=None)
@given(data=_schema_pair_and_record())
def test_identity_resolution_is_lossless(data):
    writer, _, record, _ = data
    plan = resolve(writer, writer)
    assert avro_decode(avro_encode(writer, record), plan, writer) == record
