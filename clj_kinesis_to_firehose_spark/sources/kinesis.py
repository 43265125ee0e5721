"""Production Kinesis source configuration (SURVEY.md §7.5).

No Kinesis connector jar and no network exist in this environment, so
this module is the documented config-level swap point, not a tested
path: everything downstream of ``load()`` is connector-agnostic, so
moving from the file replay double to real Kinesis changes ONLY the
reader construction below.

Connector options follow the public spark-sql-kinesis /
Amazon-Kinesis-Connector option surface (public docs); pick the
connector artifact that matches the Spark distribution at deploy time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: envelope columns a Kinesis source delivers (fixed by the AWS API):
#: data (binary payload), streamName, partitionKey, sequenceNumber,
#: approximateArrivalTimestamp, shardId
KINESIS_FORMAT = "aws-kinesis"


class KinesisConnectorUnavailable(RuntimeError):
    pass


#: JSON event payload carried in the envelope's ``data`` blob (ts =
#: epoch nanos, as the producer serializes it on the wire)
EVENT_PAYLOAD_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def decode_kinesis_envelope(envelope: DataFrame) -> DataFrame:
    """Decode the Kinesis record envelope (schema fixed by the public
    AWS API: data, streamName, partitionKey, sequenceNumber,
    approximateArrivalTimestamp, shardId) into the engine's events
    schema + arrival_ts. Shared by the production reader below and the
    unit test, which builds the envelope DataFrame by hand — the only
    part of this module that needs no connector jar."""
    return (
        envelope.select(
            F.from_json(
                F.col("data").cast("string"), EVENT_PAYLOAD_SCHEMA
            ).alias("e"),
            F.col("approximateArrivalTimestamp").alias("arrival_ts"),
        )
        .select("e.*", "arrival_ts")
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )


def read_kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str,
    starting_position: str = "LATEST",
    consumer_type: str = "GetRecords",
) -> DataFrame:
    """Build the production event stream: Kinesis envelope → decoded
    JSON events with the same schema the replay double produces, so
    every downstream pipeline in ``streaming/pipelines.py`` runs
    unchanged.

    Raises KinesisConnectorUnavailable offline (no connector jar in
    this container) — see sources/streams.py for the tested double.
    """
    try:
        reader = (
            spark.readStream.format(KINESIS_FORMAT)
            .option("streamName", stream_name)
            .option("region", region)
            .option("startingPosition", starting_position)
            .option("consumerType", consumer_type)
        )
        envelope = reader.load()
    except Exception as exc:  # connector jar absent offline
        raise KinesisConnectorUnavailable(
            "no Kinesis connector available in this environment; use "
            "sources.streams.read_event_stream (file replay double)"
        ) from exc
    return decode_kinesis_envelope(envelope)


# --------------------------------------------------------------- KPL
# KPL record aggregation (public AWS wire format: the Kinesis Producer
# Library packs many user records into one Kinesis record as
#   magic 0xF3899AC2 | protobuf(AggregatedRecord) | md5(protobuf)
# with AggregatedRecord { repeated string partition_key_table = 1;
# repeated Record records = 3 } and Record { uint64 partition_key_index
# = 1; bytes data = 3 }. Both codec halves are implemented here from
# the published spec with a minimal varint coder — no protobuf
# dependency — so the engine can deaggregate real KPL traffic and the
# tests can synthesize it.

KPL_MAGIC = b"\xf3\x89\x9a\xc2"


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def kpl_aggregate(records: list[tuple[str, bytes]]) -> bytes:
    """Pack (partition_key, data) user records into one KPL aggregated
    blob. Keys are table-deduplicated in first-seen order, exactly as
    the KPL does."""
    import hashlib

    key_index: dict[str, int] = {}
    body = bytearray()
    recs = bytearray()
    for pk, data in records:
        if pk not in key_index:
            key_index[pk] = len(key_index)
            kb = pk.encode()
            body += b"\x0a" + _varint(len(kb)) + kb  # field 1: key table
        rec = bytearray()
        rec += b"\x08" + _varint(key_index[pk])  # field 1: key index
        rec += b"\x1a" + _varint(len(data)) + data  # field 3: data
        recs += b"\x1a" + _varint(len(rec)) + bytes(rec)  # field 3: record
    payload = bytes(body + recs)
    return KPL_MAGIC + payload + hashlib.md5(payload).digest()


def kpl_deaggregate(blob: bytes) -> list[tuple[str, bytes]]:
    """Unpack a KPL aggregated blob into (partition_key, data) user
    records, verifying magic and md5 trailer — a corrupt or foreign
    record fails loudly instead of decoding garbage."""
    import hashlib

    if blob[:4] != KPL_MAGIC:
        raise ValueError("not a KPL aggregated record (bad magic)")
    payload, digest = blob[4:-16], blob[-16:]
    if hashlib.md5(payload).digest() != digest:
        raise ValueError("KPL aggregated record failed md5 checksum")
    keys: list[str] = []
    pending: list[tuple[int, bytes]] = []
    recs: list[tuple[str, bytes]] = []
    pos = 0
    while pos < len(payload):
        tag = payload[pos]
        pos += 1
        ln, pos = _read_varint(payload, pos)
        field = bytes(payload[pos : pos + ln])
        pos += ln
        if tag == 0x0A:  # partition_key_table entry
            keys.append(field.decode())
        elif tag == 0x12:  # explicit_hash_key_table entry — valid KPL,
            pass  # not needed for deaggregation; skip
        elif tag == 0x1A:  # Record submessage
            rpos = 0
            key_idx = 0
            data = b""
            while rpos < len(field):
                rtag = field[rpos]
                rpos += 1
                wire = rtag & 7
                if rtag == 0x08:
                    key_idx, rpos = _read_varint(field, rpos)
                elif wire == 2:  # length-delimited: data (0x1a),
                    # explicit hash key (0x12), repeated Tag tags (0x22)
                    rlen, rpos = _read_varint(field, rpos)
                    if rtag == 0x1A:
                        data = bytes(field[rpos : rpos + rlen])
                    rpos += rlen
                elif wire == 0:  # unknown varint field — skip
                    _, rpos = _read_varint(field, rpos)
                else:
                    raise ValueError(
                        f"unsupported KPL record wire type {wire} (tag {rtag:#x})"
                    )
            # key table entries may legally arrive after the Record in
            # protobuf field order — resolve indices only after the
            # whole payload is walked
            pending.append((key_idx, data))
        else:
            raise ValueError(f"unexpected KPL field tag {tag:#x}")
    for key_idx, data in pending:
        if key_idx >= len(keys):
            raise ValueError(
                f"KPL record references partition key index {key_idx} "
                f"outside key table of size {len(keys)}"
            )
        recs.append((keys[key_idx], data))
    return recs
