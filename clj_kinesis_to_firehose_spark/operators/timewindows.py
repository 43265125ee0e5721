"""Event-time window operators, batch form (SURVEY.md §2 I1-I3).

These are the DuckDB-checkable twins of the streaming operators in
``streaming/`` — Spark's ``window()`` / ``session_window()`` work
identically on batch DataFrames, so the exact same grouping logic is
verified here and reused under ``readStream`` with watermarks (I4+).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "window_tumbling",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS wstart, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY DATE_TRUNC('hour', ts), event_type
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("wstart"), "event_type", "n_events", "sum_value"
        )
    )


@register(
    "window_sliding",
    oracle="""
    SELECT wstart, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM (
        SELECT value,
               MAKE_TIMESTAMP((EPOCH_US(ts) // 1800000000) * 1800000000) AS wstart
        FROM events
        UNION ALL
        SELECT value,
               MAKE_TIMESTAMP((EPOCH_US(ts) // 1800000000) * 1800000000 - 1800000000)
                 AS wstart
        FROM events
    )
    GROUP BY wstart
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1-hour window sliding every 30 min: each event lands in exactly
    # two windows — the one starting at its floor-to-30min mark and the
    # one 30 min earlier. The oracle materializes that expansion as a
    # UNION ALL of the two alignments.
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("wstart"), "n_events", "sum_value")
    )


@register(
    "window_session",
    oracle="""
    WITH marks AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                     OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marks
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 10 MINUTE AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap.

    Spark's session_window closes a session at last_event + gap
    (end-exclusive), so an event arriving exactly at the gap boundary
    starts a NEW session — hence ``>= INTERVAL 10 MINUTE`` in the
    oracle's gaps-and-islands reconstruction.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "calendar_spine_monthly",
    oracle="""
    WITH spine AS (
      SELECT UNNEST(GENERATE_SERIES(TIMESTAMP '1995-01-01',
                                    TIMESTAMP '2001-08-01',
                                    INTERVAL 1 MONTH)) AS m),
    rev AS (
      SELECT DATE_TRUNC('month', o_orderdate) AS m,
             ROUND(SUM(o_totalprice), 2) AS revenue,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1)
    SELECT CAST(CAST(spine.m AS DATE) AS VARCHAR) AS month,
           COALESCE(revenue, 0.0) AS revenue,
           COALESCE(n_orders, 0) AS n_orders
    FROM spine LEFT JOIN rev ON spine.m = rev.m
    """,
)
def calendar_spine_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free monthly rollup against a generated calendar spine
    (sequence + explode): months with zero orders still appear with
    revenue 0. The spine is O(months) — trivially broadcast; the fact
    aggregates once and the left join is spine⋈(80 rows), so the plan
    is scale-independent past the first aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("2001-08-01").cast("timestamp"),
                F.expr("interval 1 month"),
            )
        ).alias("m")
    )
    rev = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    return spine.join(rev, "m", "left").select(
        F.col("m").cast("date").cast("string").alias("month"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


@register(
    "window_session_dynamic_gap",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type = 'purchase' THEN INTERVAL 30 MINUTE
                    ELSE INTERVAL 10 MINUTE END AS gap
        FROM events
    ), marks AS (
        SELECT *, CASE WHEN MAX(ts + gap) OVER w IS NULL
                        OR ts >= MAX(ts + gap) OVER w
                  THEN 1 ELSE 0 END AS is_new
        FROM g
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), numbered AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS sid
        FROM marks
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts + gap) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM numbered GROUP BY user_id, sid
    """,
)
def window_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows whose inactivity gap depends on the EVENT: a
    purchase holds the session open 30 minutes, anything else 10 — the
    engagement-modeling semantics ("a conversion keeps the visit
    alive") a fixed-gap sessionizer can't express. Uses Spark's native
    dynamic-gap ``session_window`` (a gap COLUMN, evaluated per row).

    Cross-engine contract, verified empirically: Spark merges the
    per-event intervals [ts, ts+gap) and a session's end is
    MAX(ts+gap) over its events, with an event landing exactly on the
    running end starting a NEW session (end-exclusive) — exactly the
    running-max gaps-and-islands reconstruction in the oracle. Same
    single user_id shuffle as the fixed-gap form; at 100 TB the gap
    column is free (scan-side expression, no extra pass)."""
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", "30 minutes").otherwise(
        "10 minutes"
    )
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
