"""Registry entries for the streaming operators (SURVEY.md §2 A4-A7,
I4-I7). All weak (streaming semantics are not DuckDB-expressible)
except where a post-replay result coincides with a batch answer —
those get exact oracles since the replay is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.streaming import pipelines


@register(
    "stream_source_file",
    oracle="""
    SELECT event_type, COUNT(*) AS n_records, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def stream_source_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    # replaying the full fixture through micro-batches must converge to
    # the batch aggregate — so the streaming source gets an EXACT oracle
    return pipelines.stream_file_source(spark, sf_dir)


@register("stream_source_rate")
def stream_source_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipelines.stream_rate_source(spark, sf_dir)


@register("stream_tumbling_watermark")
def stream_tumbling_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weak: append-mode emission depends on watermark advancement
    # across micro-batches (late-data drop asserted in tests)
    return pipelines.stream_tumbling_watermark(spark, sf_dir)


@register(
    "stream_dedup",
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events GROUP BY event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # replay injects 200 duplicate event_ids; watermark-scoped
    # dropDuplicates restores the exact distinct counts
    return pipelines.stream_dedup(spark, sf_dir)


@register(
    "stream_stateful_counter",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # running applyInPandasWithState totals converge to the batch
    # aggregate once the replay drains
    return pipelines.stream_stateful_counter(spark, sf_dir)


@register("stream_foreachbatch_sink")
def stream_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weak: delivery-side audit (counts of newline-terminated JSON
    # records landed per stream); batch invariants are property-tested
    return pipelines.stream_firehose_pipeline(spark, sf_dir)
