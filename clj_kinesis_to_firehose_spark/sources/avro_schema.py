"""Avro reader/writer schema resolution (public Avro 1.x spec).

The fixed-schema codec in ``sources/kinesis.py`` decodes one wire
layout; real Kinesis streams evolve — producers add fields, rename
them, and widen numeric types, and a consumer holding an older (or
newer) reader schema must still decode every record. The Avro spec's
"Schema Resolution" section defines exactly how: fields are matched
by NAME (writer order only dictates the byte layout), reader-side
aliases absorb renames, writer-only fields are decoded-and-skipped,
reader-only fields take their declared default (error if none), and
numeric/string types promote along fixed edges.

This module implements those rules for record schemas over the
primitive types Kinesis event traffic uses (null, boolean, int, long,
float, double, bytes, string, and 2-branch null unions). Resolution
is computed ONCE per (writer, reader) pair into a flat decode plan;
per-record decoding just walks the plan — the shape that lets an
Arrow-batched pandas UDF amortize resolution over the whole batch.

Everything here derives from the published Avro specification; no
avro package exists in this container, and a production deployment
with spark-avro loaded would swap this for ``from_avro`` with the
same reader schema — the resolution semantics are identical by spec.
"""

from __future__ import annotations

import struct
from typing import Any

from clj_kinesis_to_firehose_spark.sources.kinesis import (
    _avro_long,
    _avro_read_long,
)

PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

#: writer type -> reader types it may promote to (Avro spec table)
PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


class SchemaResolutionError(ValueError):
    """Writer and reader schemas cannot be resolved per the Avro spec."""


def _type_of(field_type: Any) -> Any:
    """Normalize a field type: a primitive name string, or a 2-branch
    ``["null", prim]`` union (the common nullable-field idiom)."""
    if isinstance(field_type, str):
        if field_type not in PRIMITIVES:
            raise SchemaResolutionError(f"unsupported Avro type {field_type!r}")
        return field_type
    if isinstance(field_type, list):
        if (
            len(field_type) != 2
            or "null" not in field_type
            or not all(isinstance(b, str) and b in PRIMITIVES for b in field_type)
        ):
            raise SchemaResolutionError(
                f"only 2-branch null unions are supported, got {field_type!r}"
            )
        return tuple(field_type)
    raise SchemaResolutionError(f"unsupported Avro type {field_type!r}")


def _encode_prim(typ: str, value: Any) -> bytes:
    if typ == "null":
        if value is not None:
            raise ValueError("null type with non-null value")
        return b""
    if typ == "boolean":
        return b"\x01" if value else b"\x00"
    if typ in ("int", "long"):
        return _avro_long(int(value))
    if typ == "float":
        return struct.pack("<f", float(value))
    if typ == "double":
        return struct.pack("<d", float(value))
    if typ == "bytes":
        b = bytes(value)
        return _avro_long(len(b)) + b
    if typ == "string":
        b = str(value).encode("utf-8")
        return _avro_long(len(b)) + b
    raise SchemaResolutionError(f"unsupported Avro type {typ!r}")


def _decode_prim(typ: str, buf: bytes, pos: int) -> tuple[Any, int]:
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] != 0, pos + 1
    if typ in ("int", "long"):
        return _avro_read_long(buf, pos)
    if typ == "float":
        (v,) = struct.unpack_from("<f", buf, pos)
        return v, pos + 4
    if typ == "double":
        (v,) = struct.unpack_from("<d", buf, pos)
        return v, pos + 8
    if typ in ("bytes", "string"):
        ln, pos = _avro_read_long(buf, pos)
        if ln < 0 or pos + ln > len(buf):
            raise ValueError("truncated Avro bytes/string")
        raw = buf[pos : pos + ln]
        return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + ln
    raise SchemaResolutionError(f"unsupported Avro type {typ!r}")


def _encode_typed(ftype: Any, value: Any) -> bytes:
    t = _type_of(ftype)
    if isinstance(t, tuple):  # null union: branch index (zigzag long) + value
        branch = t.index("null") if value is None else 1 - t.index("null")
        return _avro_long(branch) + _encode_prim(t[branch], value)
    return _encode_prim(t, value)


def _decode_typed(ftype: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    t = _type_of(ftype)
    if isinstance(t, tuple):
        branch, pos = _avro_read_long(buf, pos)
        if branch not in (0, 1):
            raise ValueError(f"union branch {branch} out of range")
        return _decode_prim(t[branch], buf, pos)
    return _decode_prim(t, buf, pos)


def avro_encode(schema: dict, record: dict) -> bytes:
    """Encode ``record`` under ``schema`` (a record schema dict) per
    the Avro binary spec: field values in schema order, no framing."""
    out = bytearray()
    for field in schema["fields"]:
        name = field["name"]
        if name in record:
            value = record[name]
        elif "default" in field:
            value = field["default"]
        else:
            raise ValueError(f"record missing field {name!r} with no default")
        out += _encode_typed(field["type"], value)
    return bytes(out)


def _promote(value: Any, wt: Any, rt: Any) -> Any:
    """Apply a writer->reader primitive promotion to a decoded value."""
    if isinstance(wt, tuple) or isinstance(rt, tuple):
        # per spec, unions resolve branch-wise: the null branch needs a
        # nullable reader AT READ TIME (a never-null union writer still
        # resolves to a non-null reader), other branches promote as
        # primitives
        if value is None:
            if not isinstance(rt, tuple):
                raise ValueError(
                    f"null value cannot resolve to non-null reader {rt!r}"
                )
            return None
        (wbranch,) = set(wt) - {"null"} if isinstance(wt, tuple) else {wt}
        (rbranch,) = set(rt) - {"null"} if isinstance(rt, tuple) else {rt}
        return _promote(value, wbranch, rbranch)
    if wt == rt:
        return value
    if rt in PROMOTIONS.get(wt, ()):
        if rt in ("float", "double"):
            return float(value)
        if rt == "long":
            return int(value)
        if rt == "bytes":
            return value.encode("utf-8") if isinstance(value, str) else bytes(value)
        if rt == "string":
            return value.decode("utf-8") if isinstance(value, bytes) else str(value)
    raise SchemaResolutionError(f"writer type {wt!r} does not resolve to reader {rt!r}")


def resolve(writer: dict, reader: dict) -> list[tuple]:
    """Build the decode plan for (writer schema, reader schema).

    Returns a list of steps executed in WRITER field order (the wire
    layout), followed by default-fill steps for reader-only fields:

    - ``("read", writer_type, reader_name, reader_type)`` — decode the
      wire value, promote writer_type -> reader_type, assign.
    - ``("skip", writer_type)`` — decode and discard (writer-only field).
    - ``("default", reader_name, value)`` — reader-only field filled
      from its declared default.

    Matching is by name; a reader field also matches a writer field
    named by any of its ``aliases`` (the spec's rename mechanism).
    A reader-only field with no default raises SchemaResolutionError
    — resolution fails up front, not mid-stream.
    """
    by_name: dict[str, dict] = {}
    for rf in reader["fields"]:
        by_name[rf["name"]] = rf
        for alias in rf.get("aliases", ()):
            by_name.setdefault(alias, rf)

    plan: list[tuple] = []
    matched: set[str] = set()
    for wf in writer["fields"]:
        rf = by_name.get(wf["name"])
        if rf is None or rf["name"] in matched:
            plan.append(("skip", wf["type"]))
            continue
        wt, rt = _type_of(wf["type"]), _type_of(rf["type"])
        _promote_check(wt, rt, wf["name"])
        matched.add(rf["name"])
        plan.append(("read", wf["type"], rf["name"], rf["type"]))
    for rf in reader["fields"]:
        if rf["name"] in matched:
            continue
        if "default" not in rf:
            raise SchemaResolutionError(
                f"reader field {rf['name']!r} absent from writer and has no default"
            )
        plan.append(("default", rf["name"], rf["default"]))
    return plan


def _promote_check(wt: Any, rt: Any, fname: str) -> None:
    """Validate the writer->reader type edge at plan-build time. A
    union writer against a non-union reader is legal here — per spec
    the null branch only errors at read time if a null actually
    arrives (the deploy-window case: v2 made a field nullable but the
    producer never sends null yet)."""
    wb = (set(wt) - {"null"}).pop() if isinstance(wt, tuple) else wt
    rb = (set(rt) - {"null"}).pop() if isinstance(rt, tuple) else rt
    if wb != rb and rb not in PROMOTIONS.get(wb, ()):
        raise SchemaResolutionError(
            f"field {fname!r}: writer type {wt!r} does not resolve to reader {rt!r}"
        )


def avro_decode(blob: bytes, plan: list[tuple], reader: dict) -> dict:
    """Decode one binary record through a plan from :func:`resolve`.
    Raises ValueError on truncated or trailing bytes (corrupt or
    foreign payloads fail loudly, same contract as the fixed codec)."""
    out: dict[str, Any] = {}
    pos = 0
    try:
        for step in plan:
            if step[0] == "read":
                _, wtype, rname, rtype = step
                value, pos = _decode_typed(wtype, blob, pos)
                out[rname] = _promote(value, _type_of(wtype), _type_of(rtype))
            elif step[0] == "skip":
                _, pos = _decode_typed(step[1], blob, pos)
            else:  # default
                out[step[1]] = step[2]
    except (IndexError, struct.error) as e:
        raise ValueError("truncated Avro record") from e
    if pos != len(blob):
        raise ValueError(f"{len(blob) - pos} trailing bytes after Avro record")
    # emit in reader field order, as a resolved decoder must
    return {rf["name"]: out[rf["name"]] for rf in reader["fields"]}


# ------------------------------------------------- registry framing
# Schema-registry wire framing (public Confluent wire format [PK]):
# one 0x00 magic byte + 4-byte big-endian schema id + Avro binary.
# This is how a real stream carries PER-RECORD writer identity — one
# Kinesis shard interleaves records from producers on different
# schema versions during a deploy, and the consumer resolves each
# record's writer schema (by id) against its single reader schema.
# (AWS Glue Schema Registry frames differently — version byte +
# compression byte + 16-byte UUID [PK] — but the resolution semantics
# downstream of the frame are identical; the magic+id form is the
# ecosystem's lingua franca and what this engine models.)

REGISTRY_MAGIC = 0x00


def frame_registry(schema_id: int, payload: bytes) -> bytes:
    """Wrap an Avro-binary payload in registry wire framing."""
    if not 0 <= schema_id <= 0xFFFFFFFF:
        raise ValueError(f"schema id {schema_id} out of u32 range")
    return bytes([REGISTRY_MAGIC]) + schema_id.to_bytes(4, "big") + payload


def unframe_registry(blob: bytes) -> tuple[int, bytes]:
    """Split registry framing into (schema_id, payload); a foreign or
    truncated frame fails loudly."""
    if len(blob) < 5:
        raise ValueError("registry frame shorter than magic + schema id")
    if blob[0] != REGISTRY_MAGIC:
        raise ValueError(f"bad registry magic byte {blob[0]:#x}")
    return int.from_bytes(blob[1:5], "big"), bytes(blob[5:])


class RegistryDecoder:
    """Per-record schema resolution against a writer-schema registry:
    decode plans are built once per schema id on first sight and
    cached, so a million-record Arrow batch pays resolution cost
    proportional to the number of DISTINCT writer versions (a handful),
    not the record count."""

    def __init__(self, registry: dict[int, dict], reader: dict):
        self.registry = registry
        self.reader = reader
        self._plans: dict[int, list[tuple]] = {}

    def decode(self, blob: bytes) -> tuple[int, dict]:
        """Returns (writer schema id, resolved record)."""
        sid, payload = unframe_registry(blob)
        plan = self._plans.get(sid)
        if plan is None:
            writer = self.registry.get(sid)
            if writer is None:
                raise SchemaResolutionError(f"unknown schema id {sid}")
            plan = self._plans[sid] = resolve(writer, self.reader)
        return sid, avro_decode(payload, plan, self.reader)


__all__ = [
    "SchemaResolutionError",
    "RegistryDecoder",
    "avro_encode",
    "avro_decode",
    "resolve",
    "frame_registry",
    "unframe_registry",
    "PROMOTIONS",
]
