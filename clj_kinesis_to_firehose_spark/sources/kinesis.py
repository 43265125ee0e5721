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
