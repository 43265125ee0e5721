"""Window-function operators (SURVEY.md §2 E1-E7).

Every ORDER BY carries a unique tiebreak key so rank/lag/frame
results are deterministic across engines (SURVEY.md §5.3 rule 3).

Scale notes: all windows partition by a real key (user_id, order key,
nation) — state per partition is bounded and Spark's window exec
sorts within partitions after one hash shuffle. No global
(unpartitioned) window appears outside F2, which is documented there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "win_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("order_seq")
    )


@register(
    "win_rank_dense",
    oracle="""
    SELECT p_size, p_partkey,
           RANK() OVER (PARTITION BY p_size ORDER BY p_retailprice) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_size ORDER BY p_retailprice) AS price_dense_rank
    FROM part
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_size").orderBy("p_retailprice")
    return part.select(
        "p_size",
        "p_partkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value, 1)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
    FROM events
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


@register(
    "win_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM events
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg3"),
    )


@register(
    "win_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS bal_quartile
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # global quartiles are inherently single-partition; at 100 TB the
    # scalable form is approx percentile cutoffs + a join, or ntile
    # within a partition key — this op is the spec-faithful small-dim form
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey", "c_acctbal", F.ntile(4).over(w).alias("bal_quartile")
    )


@register(
    "win_percent_rank_cume",
    oracle="""
    SELECT c_custkey,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal, c_custkey), 6)
             AS bal_pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal, c_custkey), 6)
             AS bal_cume_dist
    FROM customer
    """,
)
def win_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY EPOCH_US(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS first_in_hour,
           LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY EPOCH_US(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS last_in_hour
    FROM events
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RANGE frame over event-time: a true sliding 1-hour lookback per
    # row. Ordering is by microsecond epoch (unique per user in
    # practice), so first/last are deterministic.
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("value").over(w).alias("first_in_hour"),
        F.last("value").over(w).alias("last_in_hour"),
    )


@register(
    "win_time_range_sum",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY EPOCH_US(ts)
                                  RANGE BETWEEN 3600000000 PRECEDING
                                  AND CURRENT ROW), 2) AS trailing_1h_value
    FROM events
    """,
)
def win_time_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour sum of value per user — a RANGE frame over
    event time (integer µs), the time-interval window Spark expresses
    with rangeBetween on a numeric ordering column.

    RANGE semantics make same-instant rows frame-equivalent on both
    engines, so no tie-break is needed; one shuffle on user_id, and
    the frame state at scale is bounded by events-per-user-per-hour,
    not partition size.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("trailing_1h_value"),
    )


@register(
    "win_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 2) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / nth_value(2) over the customer's order history.

    Both engines default to RANGE UNBOUNDED PRECEDING..CURRENT ROW;
    the (o_orderdate, o_orderkey) tiebreak makes rows peer-distinct so
    the frame boundary is identical. nth_value is NULL until the
    partition has seen 2 rows — same on both sides.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


@register(
    "win_lag_ignore_nulls",
    oracle="""
    SELECT event_id,
           LAST_VALUE(pv IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'purchase' THEN value END AS pv
          FROM events) t
    """,
)
def win_lag_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-skipping offset window: each event carries the value of the
    user's most recent PRIOR purchase (non-purchase rows are NULL and
    skipped). PySpark's lag() has no ignoreNulls, so the idiomatic form
    is last(ignorenulls=True) over an unbounded-to-(-1) frame — the
    same single shuffle on user_id as any per-user window."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    return events.select(
        "event_id",
        F.last(pv, ignorenulls=True).over(w).alias("prev_purchase"),
    )
