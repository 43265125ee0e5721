"""Wire-schema evolution operators (Avro reader/writer resolution).

A long-lived Kinesis stream never carries one frozen payload schema:
producers roll out v2 (new fields, renames) while consumers still
hold v1, and vice versa during the deploy window. The Avro spec's
schema-resolution rules (sources/avro_schema.py) make both directions
deterministic; this module exercises them end-to-end through the
engine as a registered query with an exact oracle — evolution must be
INVISIBLE to the analytics downstream, and the oracle (the untouched
events table) is exactly that statement.

Scale shape: both halves are stateless Arrow-batched pandas UDFs over
the event scan — zero shuffles, and the resolution plan is computed
once per (writer, reader) pair and closed over by the UDF, so per-row
work is a flat plan walk.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources.loader import load_table

#: v1 payload schema — the original producer wire format.
EVENT_SCHEMA_V1 = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "ts", "type": "long"},
        {"name": "user_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
        {"name": "props", "type": "string"},
    ],
}

#: v2 payload schema — a realistic evolution of v1: a new leading
#: ``schema_ver`` field (readers of old data take the default), the
#: ``event_type`` field renamed to ``kind`` (the alias points back at
#: the old name, per spec), ``value`` widened to a nullable union,
#: and the field order shuffled (resolution is by name, not position).
EVENT_SCHEMA_V2 = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "schema_ver", "type": "int", "default": 2},
        {"name": "event_id", "type": "long"},
        {"name": "kind", "type": "string", "aliases": ["event_type"]},
        {"name": "user_id", "type": "long"},
        {"name": "ts", "type": "long"},
        {"name": "value", "type": ["null", "double"], "default": None},
        {"name": "props", "type": "string"},
    ],
}

#: the v1 consumer's reader schema during the v2 rollout: same shape
#: v1 always had, plus the spec's rename mechanism — an alias on the
#: reader field naming the writer's new name. ``schema_ver`` is absent
#: on purpose: an old consumer skips fields it never knew about.
EVENT_SCHEMA_V1_COMPAT = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "ts", "type": "long"},
        {"name": "user_id", "type": "long"},
        {"name": "event_type", "type": "string", "aliases": ["kind"]},
        {"name": "value", "type": "double"},
        {"name": "props", "type": "string"},
    ],
}


@register(
    "kinesis_avro_evolution",
    oracle="""
    SELECT 'v1w_v2r' AS direction, event_id, user_id, event_type,
           value, props, ts, CAST(2 AS BIGINT) AS schema_ver
    FROM events
    UNION ALL
    SELECT 'v2w_v1r' AS direction, event_id, user_id, event_type,
           value, props, ts, CAST(NULL AS BIGINT) AS schema_ver
    FROM events
    """,
)
def kinesis_avro_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both halves of a rolling schema deploy, end-to-end:

    - ``v1w_v2r``: old data (v1 writer) read by the NEW consumer (v2
      reader) — ``kind`` resolves from ``event_type`` via its alias,
      ``schema_ver`` fills from its default (2), ``value`` promotes
      into the nullable union, field reorder is absorbed by
      name-matching.
    - ``v2w_v1r``: new data (v2 writer) read by the OLD consumer (v1
      reader + rename alias) — ``schema_ver`` is decoded-and-skipped,
      ``event_type`` resolves from ``kind``, the union ``value``
      collapses back to plain double.

    EXACT oracle: evolution must be invisible — both directions must
    reproduce the events table bit-for-bit (schema_ver is the one
    reader-visible difference: the v2 reader surfaces the default, the
    v1 reader never sees the field at all, hence NULL).
    """
    from clj_kinesis_to_firehose_spark.sources.avro_schema import (
        avro_decode,
        avro_encode,
        resolve,
    )

    fwd_plan = resolve(EVENT_SCHEMA_V1, EVENT_SCHEMA_V2)
    bwd_plan = resolve(EVENT_SCHEMA_V2, EVENT_SCHEMA_V1_COMPAT)

    @F.pandas_udf("binary")
    def _enc_v1(
        event_id: pd.Series, ts_ns: pd.Series, user_id: pd.Series,
        event_type: pd.Series, value: pd.Series, props: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [
                avro_encode(
                    EVENT_SCHEMA_V1,
                    {
                        "event_id": int(i), "ts": int(t), "user_id": int(u),
                        "event_type": e, "value": float(v), "props": p,
                    },
                )
                for i, t, u, e, v, p in zip(
                    event_id, ts_ns, user_id, event_type, value, props
                )
            ]
        )

    @F.pandas_udf("binary")
    def _enc_v2(
        event_id: pd.Series, ts_ns: pd.Series, user_id: pd.Series,
        event_type: pd.Series, value: pd.Series, props: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [
                avro_encode(
                    EVENT_SCHEMA_V2,
                    {
                        "schema_ver": 2, "event_id": int(i), "kind": e,
                        "user_id": int(u), "ts": int(t), "value": float(v),
                        "props": p,
                    },
                )
                for i, t, u, e, v, p in zip(
                    event_id, ts_ns, user_id, event_type, value, props
                )
            ]
        )

    @F.pandas_udf(
        "schema_ver long, event_id long, kind string, user_id long, "
        "ts long, value double, props string"
    )
    def _dec_fwd(blobs: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [avro_decode(bytes(b), fwd_plan, EVENT_SCHEMA_V2) for b in blobs]
        )

    @F.pandas_udf(
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    def _dec_bwd(blobs: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [avro_decode(bytes(b), bwd_plan, EVENT_SCHEMA_V1_COMPAT) for b in blobs]
        )

    ev = load_table(spark, sf_dir, "events")
    wire_cols = [
        F.col("event_id"),
        F.expr("unix_micros(ts) * 1000"),  # wire carries epoch nanos
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    ]

    fwd = (
        ev.select(_dec_fwd(_enc_v1(*wire_cols)).alias("e"))
        .select(
            F.lit("v1w_v2r").alias("direction"),
            F.col("e.event_id").alias("event_id"),
            F.col("e.user_id").alias("user_id"),
            F.col("e.kind").alias("event_type"),
            F.col("e.value").alias("value"),
            F.col("e.props").alias("props"),
            F.expr("timestamp_micros(e.ts div 1000)").alias("ts"),
            F.col("e.schema_ver").alias("schema_ver"),
        )
    )
    bwd = (
        ev.select(_dec_bwd(_enc_v2(*wire_cols)).alias("e"))
        .select(
            F.lit("v2w_v1r").alias("direction"),
            F.col("e.event_id").alias("event_id"),
            F.col("e.user_id").alias("user_id"),
            F.col("e.event_type").alias("event_type"),
            F.col("e.value").alias("value"),
            F.col("e.props").alias("props"),
            F.expr("timestamp_micros(e.ts div 1000)").alias("ts"),
            F.lit(None).cast("long").alias("schema_ver"),
        )
    )
    return fwd.unionAll(bwd)


@register(
    "kinesis_avro_registry_mixed",
    oracle="""
    SELECT event_id,
           CAST(1 + event_id % 2 AS BIGINT) AS writer_id,
           user_id, event_type, value, props, ts
    FROM events
    """,
)
def kinesis_avro_registry_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One stream, interleaved writer versions — the mid-deploy wire
    reality: producers on v1 and v2 share a shard, each record framed
    with its registry schema id (magic byte + 4-byte big-endian id,
    the public registry wire format). The consumer holds ONE v2 reader
    and a :class:`RegistryDecoder` that resolves each record's writer
    schema by id, building the (writer, reader) decode plan once per
    DISTINCT version — per-record cost is a cached plan walk, so an
    Arrow batch with a million records and two writer versions does
    resolution twice, not a million times.

    Records alternate writers on event_id parity (even → v1, odd →
    v2). EXACT oracle: the decoded stream must reproduce the events
    table regardless of which writer produced each record, and the
    surfaced writer_id must be exactly the frame's id (1 + event_id%2).
    """
    from clj_kinesis_to_firehose_spark.sources.avro_schema import (
        RegistryDecoder,
        avro_encode,
        frame_registry,
    )

    REGISTRY = {1: EVENT_SCHEMA_V1, 2: EVENT_SCHEMA_V2}

    @F.pandas_udf("binary")
    def _enc_mixed(
        event_id: pd.Series, ts_ns: pd.Series, user_id: pd.Series,
        event_type: pd.Series, value: pd.Series, props: pd.Series,
    ) -> pd.Series:
        out = []
        for i, t, u, e, v, p in zip(
            event_id, ts_ns, user_id, event_type, value, props
        ):
            if int(i) % 2 == 0:  # v1 producer
                payload = avro_encode(
                    EVENT_SCHEMA_V1,
                    {
                        "event_id": int(i), "ts": int(t), "user_id": int(u),
                        "event_type": e, "value": float(v), "props": p,
                    },
                )
                out.append(frame_registry(1, payload))
            else:  # v2 producer
                payload = avro_encode(
                    EVENT_SCHEMA_V2,
                    {
                        "schema_ver": 2, "event_id": int(i), "kind": e,
                        "user_id": int(u), "ts": int(t), "value": float(v),
                        "props": p,
                    },
                )
                out.append(frame_registry(2, payload))
        return pd.Series(out)

    @F.pandas_udf(
        "writer_id long, schema_ver long, event_id long, kind string, "
        "user_id long, ts long, value double, props string"
    )
    def _dec_mixed(blobs: pd.Series) -> pd.DataFrame:
        dec = RegistryDecoder(REGISTRY, EVENT_SCHEMA_V2)
        rows = []
        for b in blobs:
            sid, rec = dec.decode(bytes(b))
            rows.append({"writer_id": sid, **rec})
        return pd.DataFrame(rows)

    ev = load_table(spark, sf_dir, "events")
    wire_cols = [
        F.col("event_id"),
        F.expr("unix_micros(ts) * 1000"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    ]
    return ev.select(_dec_mixed(_enc_mixed(*wire_cols)).alias("e")).select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.writer_id").alias("writer_id"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.kind").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
        F.expr("timestamp_micros(e.ts div 1000)").alias("ts"),
    )
