"""Interval algebra, existence-mark joins, ratio-to-report windows,
and the Arrow-native batch-map API — relational niches not covered by
the earlier operator batches.

Interval coalescing (gaps-and-islands) is the classic pattern behind
uptime/downtime reports, ad-break stitching, and sessionization with
explicit interval endpoints; its scale story is one shuffle keyed on
the entity (user), with both analytic windows sharing that single
sort. The existence-mark join is the EXISTS-as-a-column shape: the
probe side is key-deduplicated BEFORE the join so the shuffle carries
one row per key instead of the raw fact table. ``mapInArrow`` rounds
out the UDF family (K1-K5 cover row/pandas/grouped/cogrouped/UDTF):
zero-copy Arrow batches with no pandas conversion on either side —
the cheapest possible Python hop when the logic is columnar already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.operators.analytics_ext import (
    ACTIVE_TTL_S as INTERVAL_TTL_S,
)
from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "intervals_merge_overlapping",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id, ts,
             ts + INTERVAL {INTERVAL_TTL_S} SECOND AS te
      FROM events
    ), flagged AS (
      SELECT user_id, ts, te,
             CASE WHEN MAX(te) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR ts > MAX(te) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  )
             THEN 1 ELSE 0 END AS ni,
             event_id
      FROM iv
    ), isl AS (
      SELECT user_id, ts, te,
             SUM(ni) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS island
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS island_start, MAX(te) AS island_end,
           COUNT(*) AS n_events
    FROM isl GROUP BY user_id, island
    """,
)
def intervals_merge_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce overlapping activity intervals per user
    (gaps-and-islands): each event opens [ts, ts+TTL); an interval
    whose start exceeds the running max end of everything before it
    begins a new island; islands are numbered by a running sum of
    those flags and aggregated to (start, end, n_events).

    Scale: ONE shuffle on user_id — the max-end window, the island-id
    window, and the final groupBy all share the (user_id; ts,
    event_id) sort, so Spark plans a single Exchange + Sort with the
    aggregation partial on top. Per-user data is tiny; a pathological
    single hot user would need the sessionize salting treatment
    (composites.py), not a different algorithm. Tie policy (same ts):
    event_id breaks the order identically in both engines, and the
    running MAX is order-insensitive within a tie group anyway.
    """
    ttl = F.expr(f"INTERVAL {INTERVAL_TTL_S} SECONDS")
    iv = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", (F.col("ts") + ttl).alias("te"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_max_end = F.max("te").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "ni",
        F.when(
            prev_max_end.isNull() | (F.col("ts") > prev_max_end), 1
        ).otherwise(0),
    )
    isl = flagged.withColumn(
        "island", F.sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return isl.groupBy("user_id", "island").agg(
        F.min("ts").alias("island_start"),
        F.max("te").alias("island_end"),
        F.count("*").alias("n_events"),
    ).drop("island")


@register(
    "intervals_gaps",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    )
    SELECT user_id,
           prev_ts + INTERVAL {INTERVAL_TTL_S} SECOND AS gap_start,
           ts AS gap_end,
           DATE_DIFF('microsecond', prev_ts + INTERVAL {INTERVAL_TTL_S} SECOND, ts)
             AS gap_us
    FROM ordered
    WHERE prev_ts IS NOT NULL
      AND ts > prev_ts + INTERVAL {INTERVAL_TTL_S} SECOND
    """,
)
def intervals_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse of interval coalescing: per-user idle gaps — spans
    where the previous activity interval expired before the next event
    arrived. With constant-TTL intervals ordered by ts, the running
    max end preceding a row IS lag(ts)+TTL, so one LAG suffices and
    the emitted gaps are exactly the complement of
    :func:`intervals_merge_overlapping`'s islands.

    Gap width is computed in integer microseconds (unix_micros /
    DATE_DIFF microsecond) — no float time arithmetic to drift.
    Single user_id shuffle, same scale shape as the merge op.
    """
    ttl = F.expr(f"INTERVAL {INTERVAL_TTL_S} SECONDS")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts")
        .withColumn("prev_ts", F.lag("ts").over(w))
    )
    gap_start = F.col("prev_ts") + ttl
    return (
        ordered.filter(
            F.col("prev_ts").isNotNull() & (F.col("ts") > gap_start)
        )
        .select(
            "user_id",
            gap_start.alias("gap_start"),
            F.col("ts").alias("gap_end"),
            (F.unix_micros(F.col("ts")) - F.unix_micros(gap_start)).alias(
                "gap_us"
            ),
        )
    )


@register(
    "join_existence_mark",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             AS has_orders
    FROM customer c
    """,
)
def join_existence_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a projected column (the optimizer literature's "mark
    join"): every customer row survives, annotated with whether any
    order references it — unlike semi/anti joins (C5/C6) which FILTER
    rows, this shape keeps them.

    Spark has no mark-join physical operator, so the scalable rewrite
    is: key-deduplicate the probe side FIRST (map-side partial
    distinct — the shuffle carries one row per distinct o_custkey, not
    1.5M raw orders per 100k customers), then LEFT JOIN and test the
    probe key for null. Cardinality is provably preserved (the probe
    side is unique on the join key), which is the property a naive
    left-join-EXISTS rewrite gets wrong.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    okeys = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    )
    return (
        c.join(okeys, c.c_custkey == okeys.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.col("o_custkey").isNotNull().alias("has_orders"),
        )
    )


@register(
    "win_ratio_to_report",
    oracle="""
    WITH nat AS (
      SELECT n.n_regionkey, n.n_name,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS nat_rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey, n.n_name
    )
    SELECT n_regionkey, n_name,
           CAST(ROUND(nat_rev, 2) AS DOUBLE) AS nation_rev,
           CAST(nat_rev AS DOUBLE)
             / CAST(SUM(nat_rev) OVER (PARTITION BY n_regionkey) AS DOUBLE)
             AS region_share
    FROM nat
    """,
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's order
    revenue — the aggregate-then-window shape (SUM per nation, then
    SUM OVER the region partition as the denominator).

    Determinism discipline: both engines sum in DECIMAL(18,4) (exact,
    order-independent), and the share is ONE double division of
    bit-identical operands — no float accumulation anywhere. Scale:
    the orders→customer join shuffles on custkey once, nation is
    broadcast, and the window runs over 25 post-aggregate rows —
    the denominator costs nothing because the heavy reduction already
    happened.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("nat_rev")
        )
    )
    w = Window.partitionBy("n_regionkey")
    return nat.select(
        "n_regionkey",
        "n_name",
        F.round(F.col("nat_rev"), 2).cast("double").alias("nation_rev"),
        (
            F.col("nat_rev").cast("double")
            / F.sum("nat_rev").over(w).cast("double")
        ).alias("region_share"),
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-native batch map (``mapInArrow``), completing the
    Python-execution family (K1-K5 = row UDF, pandas scalar, grouped
    agg, grouped map, UDTF): the function receives pyarrow
    RecordBatches zero-copy and returns them without any pandas
    round-trip — the lowest-overhead Python hop Spark offers, right
    for logic that is already columnar (here: vectorized
    ``pyarrow.compute`` arithmetic).

    Per-row IEEE multiply is order-independent, so the result is
    bit-exact against the SQL oracle with no rounding discipline
    needed. Scale: narrow projected input (4 columns reach the scan),
    no shuffle at all — a pure map stage that pipelines with the scan.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )

    def revenue_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            rev = pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), rev],
                ["l_orderkey", "l_linenumber", "revenue"],
            )

    return li.mapInArrow(
        revenue_batches,
        "l_orderkey long, l_linenumber int, revenue double",
    )
