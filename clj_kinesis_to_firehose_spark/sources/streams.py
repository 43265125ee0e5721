"""Streaming sources (SURVEY.md §2 A4/A5): the file-source replay
double for Kinesis, and the rate source for synthetic smoke.

No Kinesis connector exists offline (SURVEY.md §7.5); in production
the swap is config-level — ``format("aws-kinesis")`` (EFO connector)
with the same downstream plan — because everything after ``load()``
is connector-agnostic DataFrame code.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.session import ensure_configs

#: events schema as the replay slices carry it — the loader's
#: normalized form (ts already a µs timestamp), so the stream source
#: is fixture-revision-agnostic (see sources/loader.py docstring)
EVENTS_RAW_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


#: sentinel event_id for the watermark-flush row (see flush_sentinel)
FLUSH_SENTINEL_ID = -1


def write_replay_slices(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    dup_event_ids: int = 0,
    flush_sentinel: bool = False,
) -> str:
    """Materialize the events fixture as N parquet files in a fresh
    directory — a Kinesis shard-drop replay double: the file stream
    source picks slices up as separate micro-batches
    (maxFilesPerTrigger=1).

    Slices are TIME-ordered (ntile over ts): each micro-batch advances
    event time monotonically, as a replayed Kinesis shard would — if
    slices interleaved the full time range, the first batch would drag
    the watermark to max(ts)-delay and every later slice would be
    dropped as late by stateful operators.

    ``dup_event_ids``: re-append the LAST K rows (latest ts) as a
    trailing slice, emulating Kinesis at-least-once redelivery close to
    the head of the stream — within the watermark, so dedup state (not
    late-row dropping) is what has to remove them.

    ``flush_sentinel``: append one synthetic far-future row
    (event_id = FLUSH_SENTINEL_ID, ts = max(ts) + 2 days) as the final
    slice. Its micro-batch advances the watermark past every real
    window, so append-mode windowed aggregations EMIT all real windows
    — their post-replay result then equals the batch aggregate and
    gets an exact oracle — while the sentinel's own window (the only
    one the final watermark never passes) stays withheld, so no
    filtering is needed. Watermark-driven state eviction still runs
    for real.

    Micro-batch order: Spark's file source processes discovered files
    in modification-time order; slice mtimes are stamped explicitly
    (base + slice-index seconds) so ordering never depends on write
    timing.
    """
    from pyspark.sql.window import Window

    from clj_kinesis_to_firehose_spark.sources.loader import load_table

    ensure_configs(spark)
    replay_dir = tempfile.mkdtemp(prefix="kf_replay_")
    raw = load_table(spark, sf_dir, "events")  # ts normalized to timestamp
    slices = raw.withColumn(
        "__slice", F.ntile(n_slices).over(Window.orderBy("ts", "event_id")) - 1
    )
    for i in range(n_slices):
        (
            slices.filter(F.col("__slice") == i)
            .drop("__slice")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(replay_dir, f"slice={i}"))
        )
    if dup_event_ids:
        (
            raw.orderBy(F.desc("ts"), F.desc("event_id"))
            .limit(dup_event_ids)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(replay_dir, f"slice={n_slices}"))
        )
    if flush_sentinel:
        sentinel = raw.orderBy(F.desc("ts")).limit(1).select(
            F.lit(FLUSH_SENTINEL_ID).cast("long").alias("event_id"),
            F.expr("ts + INTERVAL 2 DAYS").alias("ts"),
            F.lit(FLUSH_SENTINEL_ID).cast("long").alias("user_id"),
            F.lit("__flush__").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        sentinel.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(replay_dir, f"slice={n_slices + 1}")
        )
    _stamp_slice_order(replay_dir)
    return replay_dir


def _stamp_slice_order(replay_dir: str) -> None:
    """Give every slice directory's files explicit, strictly-increasing
    modification times (base + index seconds) so the file stream source
    replays slices in index order regardless of how fast they were
    written."""
    base = 1_700_000_000  # arbitrary fixed epoch base; only order matters
    for name in sorted(os.listdir(replay_dir)):
        if not name.startswith("slice="):
            continue
        idx = int(name.split("=", 1)[1])
        d = os.path.join(replay_dir, name)
        for fname in os.listdir(d):
            t = base + idx
            os.utime(os.path.join(d, fname), (t, t))


def read_event_stream(spark: SparkSession, replay_dir: str) -> DataFrame:
    """File-source event stream over loader-normalized replay slices —
    the streaming twin of ``sources.loader.load_table('events')``."""
    ensure_configs(spark)
    return (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(replay_dir)
    )


def read_rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
