"""Join operators (SURVEY.md §2 C1-C10).

Scale rationale per join (the 100 TB contract, SURVEY §7.7):

* O(1) dimension joins (region 5 rows, nation 25) are **broadcast**
  with explicit ``F.broadcast`` hints — their size is a constant of
  the schema, so the hint is safe at any scale.
* Θ(sf) lookup sides (customer/supplier/part — linear in the fact)
  carry **no hint**: Spark never demotes an explicit hint, so hinting
  them OOMs at the 100 TB design point. Unhinted, the static planner
  broadcasts while parquet stats fit under
  ``autoBroadcastJoinThreshold`` and AQE re-decides per-stage at
  runtime (audited in tests/test_plans.py).
* Fact-fact joins (lineitem⋈orders) shuffle on the join key; both
  sides hash-partition on ``l_orderkey``/``o_orderkey`` which is
  near-uniform (no skew salt needed); AQE handles residual skew.
* The as-of join (C9) deliberately avoids a per-row subquery (O(n²))
  and instead sorts once per user partition — a single shuffle +
  sort, streaming-friendly and linear in partition size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           COALESCE(o_totalprice, 0.0) AS totalprice_filled
    FROM customer LEFT JOIN (
        SELECT * FROM orders WHERE o_orderstatus = 'F'
    ) o ON c_custkey = o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.coalesce("o_totalprice", F.lit(0.0)).alias("totalprice_filled"),
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_nationkey < 13) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixtures have no NULLs (FIXTURES.md); both filters manufacture
    # unmatched rows on each side so the outer semantics are exercised
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 13)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "full"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000.0
    )
    return customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000.0
    )
    return customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_theta_range",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_late_ship,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # equi key + range conjunct: Catalyst plans the equi part as the join
    # key (shuffle/SMJ) and evaluates the range predicate inside the join
    # — no O(n²) theta explosion at scale.
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = lineitem.join(
        orders,
        (lineitem.l_orderkey == orders.o_orderkey)
        & (lineitem.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_late_ship"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "join_star_multiway",
    oracle="""
    SELECT n_name, r_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name, r_name
    """,
)
def join_star_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q5 shape): revenue by nation over a 2-year window.

    Plan shape at scale: date filter pushes down to the orders scan;
    lineitem⋈orders is the one real shuffle; customer/nation/region are
    broadcast so the fact tables never reshuffle for dimension lookups.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "join_asof",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT p.value FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.ts < e.ts
            ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS last_purchase_value
    FROM events e
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every event, the value of the same user's latest
    strictly-prior purchase.

    Spark has no native as-of join; the correlated-subquery shape the
    oracle uses would be O(probe × build) at scale. Instead: union-tag
    build rows (purchases) under the probe rows, sort each user
    partition once by (ts, is_build, event_id), and carry the last
    non-null purchase value over a frame ending 1 row before current.
    Sorting probes *before* builds on ties makes the "strictly prior"
    semantics fall out of the frame bound; one shuffle, linear scan.
    """
    events = load_table(spark, sf_dir, "events")
    probe = events.select(
        "event_id", "user_id", "ts",
        F.lit(0).alias("is_build"),
        F.lit(None).cast("double").alias("pvalue"),
    )
    build = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("is_build"),
        F.col("value").alias("pvalue"),
    )
    tagged = probe.unionByName(build)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_build", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.withColumn(
            "last_purchase_value", F.last("pvalue", ignorenulls=True).over(w)
        )
        .filter(F.col("is_build") == 0)
        .select("event_id", "user_id", "ts", "last_purchase_value")
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH cand AS (
        SELECT e.event_id, e.user_id, e.ts,
            (SELECT EPOCH_US(e.ts) - EPOCH_US(p.ts) FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
               AND p.ts <= e.ts
             ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS b_dt,
            (SELECT p.event_id FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
               AND p.ts <= e.ts
             ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS b_id,
            (SELECT EPOCH_US(p.ts) - EPOCH_US(e.ts) FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
               AND p.ts > e.ts
             ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS f_dt,
            (SELECT p.event_id FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
               AND p.ts > e.ts
             ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS f_id
        FROM events e WHERE e.event_type = 'click'
    )
    SELECT event_id, user_id, ts,
           CASE WHEN f_dt IS NULL OR (b_dt IS NOT NULL AND b_dt <= f_dt)
                THEN b_id ELSE f_id END AS nearest_purchase_id,
           CASE WHEN f_dt IS NULL OR (b_dt IS NOT NULL AND b_dt <= f_dt)
                THEN b_dt ELSE f_dt END AS delta_us
    FROM cand
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: for every click, the same user's
    purchase closest in time in EITHER direction (|Δt| minimized;
    equal-distance ties break toward the earlier/backward candidate —
    the `direction="nearest"` mode time-series engines offer beside
    backward/forward).

    The oracle's four correlated subqueries are O(probe × build); the
    Spark plan is the union-tag trick with ONE partitioning and ONE
    sort serving BOTH directions: order by (ts, builds-before-probes,
    id), the backward candidate is last-non-null over the preceding
    frame (same-instant purchases included → Δ=0), the forward
    candidate first-non-null over the following frame (strictly
    later), then a scalar CASE picks the smaller microsecond distance.
    Single shuffle on user_id, linear per partition."""
    events = load_table(spark, sf_dir, "events")
    probe = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(0).alias("is_build"),
        F.lit(None).cast("struct<ts:timestamp,event_id:bigint>").alias("p"),
    )
    build = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("is_build"),
        F.struct(F.col("ts"), F.col("event_id")).alias("p"),
    )
    tagged = probe.unionByName(build)
    order = [F.col("ts").asc(), F.desc("is_build"), F.col("event_id").asc()]
    wb = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    picked = (
        tagged.withColumn("b", F.last("p", ignorenulls=True).over(wb))
        .withColumn("f", F.first("p", ignorenulls=True).over(wf))
        .filter(F.col("is_build") == 0)
        .withColumn("b_dt", F.unix_micros("ts") - F.unix_micros("b.ts"))
        .withColumn("f_dt", F.unix_micros("f.ts") - F.unix_micros("ts"))
    )
    take_b = F.col("f_dt").isNull() | (
        F.col("b_dt").isNotNull() & (F.col("b_dt") <= F.col("f_dt"))
    )
    return picked.select(
        "event_id", "user_id", "ts",
        F.when(take_b, F.col("b.event_id"))
        .otherwise(F.col("f.event_id"))
        .alias("nearest_purchase_id"),
        F.when(take_b, F.col("b_dt")).otherwise(F.col("f_dt")).alias("delta_us"),
    )


@register(
    "join_skew_salted",
    oracle="""
    WITH hot AS (
        SELECT user_id % 10 AS hot_key, COUNT(*) AS key_rows,
               ROUND(AVG(value), 4) AS key_avg
        FROM events GROUP BY user_id % 10
    )
    SELECT e.event_id, h.hot_key, h.key_rows,
           ROUND(e.value - h.key_avg, 4) AS value_dev
    FROM events e JOIN hot h ON e.user_id % 10 = h.hot_key
    WHERE e.event_id < 4000
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join: fact rows salted across SALT_BUCKETS
    sub-keys, the (small) build side exploded once per salt value, so
    one hot key spreads over many partitions instead of pinning a
    single reducer.

    The 10-way key here makes every key hot by construction. Salting
    changes only the partitioning — results are identical to the plain
    join the oracle runs. (AQE's skew-join split handles moderate skew
    automatically; explicit salting is the deterministic fallback when
    a single key exceeds what one executor can hold.)
    """
    SALT_BUCKETS = 8
    events = load_table(spark, sf_dir, "events").withColumn(
        "hot_key", F.col("user_id") % 10
    )
    hot = events.groupBy("hot_key").agg(
        F.count("*").alias("key_rows"), F.round(F.avg("value"), 4).alias("key_avg")
    )
    salted_fact = events.filter(F.col("event_id") < 4000).withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS)).cast("int")
    )
    salted_build = hot.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1)))
    )
    return salted_fact.join(salted_build, ["hot_key", "salt"]).select(
        "event_id",
        "hot_key",
        "key_rows",
        F.round(F.col("value") - F.col("key_avg"), 4).alias("value_dev"),
    )


@register(
    "join_cross",
    oracle="""
    SELECT n_name, r_name AS candidate_region
    FROM nation CROSS JOIN region
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cartesian product of two tiny dims (25×5); also the building block
    # the brute-force similarity search (J3) composes with a fact table
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.crossJoin(F.broadcast(region)).select(
        "n_name", F.col("r_name").alias("candidate_region")
    )


@register(
    "join_range_bucketed",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_matches,
           ROUND(AVG(l_extendedprice), 2) AS avg_price
    FROM lineitem JOIN part
      ON l_extendedprice BETWEEN p_retailprice - 50 AND p_retailprice + 50
    GROUP BY p_brand
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (interval-overlap predicate) executed as an equi-join
    on integer buckets plus a refining filter — the standard rewrite
    that keeps a pure-inequality join off the nested-loop path.

    Each part lands in bucket floor(price/W); each lineitem's match
    interval [v-50, v+50] spans at most ceil(2·50/W)+1 = 2 buckets at
    W=100, so the fact side replicates ≤2× (array_distinct keeps the
    pair space duplicate-free when both endpoints share a bucket).
    Catalyst then plans a hash join on the bucket key instead of
    BroadcastNestedLoopJoin, which is the difference between O(n·m)
    compares and O(n+m) hashing at 100 TB — pick W ≈ the interval
    width so replication stays ≤2× while buckets stay selective.
    """
    W = 100.0
    HALF = 50.0
    part = load_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_retailprice",
        F.floor(F.col("p_retailprice") / W).alias("bucket"),
    )
    from clj_kinesis_to_firehose_spark.sources import fan_out

    # r16 (guide §2.5): the probe side streams the bucket hash join
    # from the scan's own partitioning — a single-file fixture scan
    # arrives as ~3 partitions, capping the refine-filter's
    # parallelism (the ~15 distinct bucket keys make the shuffle side
    # no better). fan_out spreads the probe; no-op on real layouts.
    line = (
        fan_out(spark, load_table(spark, sf_dir, "lineitem").select("l_extendedprice"))
        .select(
            "l_extendedprice",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor((F.col("l_extendedprice") - HALF) / W),
                        F.floor((F.col("l_extendedprice") + HALF) / W),
                    )
                )
            ).alias("bucket"),
        )
    )
    return (
        line.join(part, "bucket")
        .filter(
            F.col("l_extendedprice").between(
                F.col("p_retailprice") - HALF, F.col("p_retailprice") + HALF
            )
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_matches"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        )
    )


@register(
    "join_asof_forward",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT p.value FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.ts > e.ts
            ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS next_purchase_value
    FROM events e
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every event, the value of the same
    user's earliest strictly-later purchase — the mirror of join_asof,
    same union-tag + single-sort plan, frame flipped to FOLLOWING.

    Builds sort *before* probes on ts ties (desc(is_build)), so the
    1-row-forward frame start excludes same-instant purchases and the
    "strictly later" semantics fall out of the sort order; still one
    shuffle on user_id and a linear scan per partition.
    """
    events = load_table(spark, sf_dir, "events")
    probe = events.select(
        "event_id", "user_id", "ts",
        F.lit(0).alias("is_build"),
        F.lit(None).cast("double").alias("pvalue"),
    )
    build = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("is_build"),
        F.col("value").alias("pvalue"),
    )
    tagged = probe.unionByName(build)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_build"), "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        tagged.withColumn(
            "next_purchase_value", F.first("pvalue", ignorenulls=True).over(w)
        )
        .filter(F.col("is_build") == 0)
        .select("event_id", "user_id", "ts", "next_purchase_value")
    )


#: bloom geometry: 2^20 bits (128 KiB bitmap), 5 hash functions —
#: FP rate < 1e-4 at ~10k inserted keys, and still < 1% at 200k
BLOOM_M = 1 << 20
BLOOM_K = 5


def _bloom_positions(key: F.Column) -> F.Column:
    """k bit positions for a key: xxhash64(key, salt_j) mod m, computed
    JVM-side so the build and probe sides hash identically."""
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(j)), F.lit(BLOOM_M)) for j in range(BLOOM_K)]
    )


@register(
    "join_bloom_prefilter", executes_on_build=True,
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN
          (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pre-filter: build a bloom filter over the
    keys of a filtered dimension (high-balance customers), drop fact
    rows (orders) that cannot match BEFORE any shuffle, then finish
    with the real broadcast semi-join — so the checked output is the
    EXACT semi-join (bloom pass ∧ real match) and the oracle is plain
    SQL. The bloom stage's no-false-negative + small-FP-rate property
    is asserted separately in tests/test_weak_ops.py against
    :func:`bloom_pass_orders`.

    This is THE technique for 100 TB fact-dim joins where the dim
    predicate is selective: the filter is ~128 KiB broadcast to every
    scan task, and false positives only cost a little extra work in
    the real join that follows. Spark's internal runtime-filter bloom
    (bloom_filter_agg) isn't SQL-exposed, so the filter is hand-rolled:
    bit positions come from JVM-side xxhash64 on BOTH sides (build
    distributed, distinct positions collected once — bounded by k·|dim|),
    and the probe is an Arrow-vectorized pandas UDF indexing the
    broadcast numpy bitmap.
    """
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select("c_custkey")
    )
    return bloom_pass_orders(spark, sf_dir).join(
        rich,
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    )


def bloom_pass_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bloom-prefilter stage alone (orders rows whose key passes the
    dim bloom filter, false positives included) — the surface the
    FP-rate/no-false-negative behavioral test exercises."""
    orders = load_table(spark, sf_dir, "orders")
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select("c_custkey")
    )
    pos_rows = (
        rich.select(F.explode(_bloom_positions(F.col("c_custkey"))).alias("p"))
        .distinct()
        .collect()
    )
    bitmap = np.zeros(BLOOM_M, dtype=bool)
    bitmap[[r["p"] for r in pos_rows]] = True
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def bloom_contains(pos: pd.Series) -> pd.Series:
        bm = bc.value
        mat = np.stack(pos.to_numpy())  # (batch, k) bit positions
        return pd.Series(bm[mat].all(axis=1))

    return (
        orders.withColumn("_pos", _bloom_positions(F.col("o_custkey")))
        .filter(bloom_contains(F.col("_pos")))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "join_bucketed_colocated", executes_on_build="conditional",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lineitems,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈fact join via bucketed tables — the
    "pre-partition once, join many times for free" pattern that at
    100 TB amortizes ONE layout write across every subsequent join on
    the same key.

    Both sides are written with ``bucketBy(8, orderkey)`` +
    ``sortBy`` into external tables; a sort-merge join of two tables
    bucketed identically on the join key needs NO Exchange on either
    side (asserted in tests/test_plans.py) — bucket i of lineitem
    joins bucket i of orders in place. The merge hint pins SMJ so the
    demonstration can't silently degrade to a broadcast. Output is
    revenue per order priority, exact against the plain-join oracle
    (bucketing is pure physical layout; results must be identical).

    Layout reuse: the bucketed files live at a stable per-sf_dir path
    and are written AT MOST ONCE per fixture — later invocations (and
    later sessions) register an external bucketed table over the
    existing files instead of rewriting, so disk usage is bounded and
    the amortize-one-write story is actually exercised. Table names
    carry the application id so two sessions sharing a metastore never
    race on DROP/CREATE of the same name."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"kf_bucketed_{tag}")
    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    names: dict[str, str] = {}
    for short, df, key in (
        ("lineitem", li, "l_orderkey"),
        ("orders", orders, "o_orderkey"),
    ):
        name = f"kf_bucketed_{short}_{tag}_{app}"
        names[short] = name
        path = os.path.join(base, short)
        if spark.catalog.tableExists(name):
            continue  # this session already registered it
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            # files already bucketed by a previous session: register an
            # external bucketed table over them, no rewrite
            cols = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
            )
            spark.sql(
                f"CREATE TABLE {name} ({cols}) USING PARQUET "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO 8 BUCKETS "
                f"LOCATION '{path}'"
            )
        else:
            (
                df.write.mode("overwrite")
                .option("path", path)
                .bucketBy(8, key)
                .sortBy(key)
                .format("parquet")
                .saveAsTable(name)
            )
    lb = spark.table(names["lineitem"]).hint("merge")
    ob = spark.table(names["orders"])
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@register(
    "join_asof_tolerance",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT p.value FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.ts < e.ts
              AND p.ts >= e.ts - INTERVAL 6 HOUR
            ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS recent_purchase_value
    FROM events e
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: the latest strictly-prior
    purchase by the same user, but only if it happened within the last
    6 hours — the `merge_asof(tolerance=...)` semantics that real
    feature pipelines need ("most recent reading, unless it's stale").

    Same single-shuffle union-tag shape as join_asof (one sort per
    user partition, no correlated subquery); the tolerance is a pure
    post-window column guard: the carried build timestamp rides along
    with the carried value, and the value is nulled when the gap
    exceeds the bound. Cost is identical to the unbounded as-of; at
    100 TB the window state per user is still one row."""
    events = load_table(spark, sf_dir, "events")
    probe = events.select(
        "event_id", "user_id", "ts",
        F.lit(0).alias("is_build"),
        F.lit(None).cast("double").alias("pvalue"),
        F.lit(None).cast("timestamp").alias("pts"),
    )
    build = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("is_build"),
        F.col("value").alias("pvalue"),
        F.col("ts").alias("pts"),
    )
    tagged = probe.unionByName(build)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_build", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fresh = F.col("last_pts") >= F.expr("ts - INTERVAL 6 HOURS")
    return (
        tagged.withColumn("last_pvalue", F.last("pvalue", ignorenulls=True).over(w))
        .withColumn("last_pts", F.last("pts", ignorenulls=True).over(w))
        .filter(F.col("is_build") == 0)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(fresh, F.col("last_pvalue")).alias("recent_purchase_value"),
        )
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH activity AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               MIN(ts) AS a_start, MAX(ts) AS a_end
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), incidents AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               MIN(ts) AS i_start, MAX(ts) AS i_end
        FROM events WHERE event_type IN ('error', 'purchase')
        GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT a.user_id, i.event_type, CAST(a.day AS VARCHAR) AS day,
           CAST((EPOCH_US(LEAST(a.a_end, i.i_end))
                 - EPOCH_US(GREATEST(a.a_start, i.i_start))) AS BIGINT)
             AS overlap_us
    FROM activity a JOIN incidents i
      ON a.day = i.day
     AND a.a_start <= i.i_end AND i.i_start <= a.a_end
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join — the range-join variant where
    BOTH sides are time spans (user activity windows × incident
    windows), with the overlap duration per pair. join_range_bucketed
    covers point-in-range; this covers span-meets-span.

    The scale mechanism is the same bucketed-equi-key trick: both
    interval sets carry a day bucket, the join is a hash join on that
    key, and the overlap inequality is a post-join filter over
    bucket-bounded pairs — never a BroadcastNestedLoopJoin over raw
    inequalities. Intervals here are within-day by construction; a
    general interval set explodes each interval to every bucket it
    touches first (≤ span/bucket copies), same as the range join.
    Days travel as strings for cross-engine hashing; the overlap
    width is exact integer microseconds."""
    events = load_table(spark, sf_dir, "events")
    activity = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min("ts").alias("a_start"), F.max("ts").alias("a_end"))
    incidents = (
        events.filter(F.col("event_type").isin("error", "purchase"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.min("ts").alias("i_start"), F.max("ts").alias("i_end"))
    )
    joined = activity.join(incidents, "day").filter(
        (F.col("a_start") <= F.col("i_end")) & (F.col("i_start") <= F.col("a_end"))
    )
    overlap = F.unix_micros(F.least("a_end", "i_end")) - F.unix_micros(
        F.greatest("a_start", "i_start")
    )
    return joined.select(
        "user_id",
        "event_type",
        F.col("day").cast("string").alias("day"),
        overlap.alias("overlap_us"),
    )


@register(
    "join_cardinality_preflight",
    oracle="""
    WITH lh AS (
      SELECT o_custkey AS k, COUNT(*) AS fl FROM orders GROUP BY o_custkey
    ), rh AS (
      SELECT c_custkey AS k, COUNT(*) AS fr FROM customer GROUP BY c_custkey
    ), m AS (
      SELECT lh.k, lh.fl, rh.fr, lh.fl * rh.fr AS fanout
      FROM lh JOIN rh USING (k)
    )
    SELECT (SELECT CAST(SUM(fl) AS BIGINT) FROM lh) AS n_left,
           (SELECT CAST(SUM(fr) AS BIGINT) FROM rh) AS n_right,
           CAST(COUNT(*) AS BIGINT) AS n_matching_keys,
           CAST(SUM(fanout) AS BIGINT) AS exact_join_rows,
           CAST(MAX(fanout) AS BIGINT) AS max_key_fanout,
           CAST(MAX(fl) AS BIGINT) AS max_left_freq,
           CAST(MAX(fr) AS BIGINT) AS max_right_freq,
           -- a single key producing >1% of the whole output is the
           -- practical skew alarm AQE's skew-join thresholds exist for
           CASE WHEN MAX(fanout) * 100 > SUM(fanout) THEN TRUE
                ELSE FALSE END AS skew_flag
    FROM m
    """,
)
def join_cardinality_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT equi-join output-cardinality pre-flight — the
    dedup_band_bucket_stats pattern applied to relational joins:
    |A ⋈_k B| = Σ_k f_A(k)·f_B(k), computed from the two per-side key
    histograms WITHOUT running the join. Before committing a 100 TB
    join you price it: the two histogram aggregates are map-side-
    partial + one shuffle each at DISTINCT-KEY cardinality, the
    histogram join is key-cardinality-sized (usually broadcastable),
    and the answer is exact — not a sampled estimate — so a template
    flood / hot-key blowup shows up as `exact_join_rows` and
    `max_key_fanout` BEFORE any executor materializes a single output
    row. `skew_flag` trips when one key alone carries >1% of the
    output — the condition AQE skew-split mitigates for the WORK but
    cannot mitigate for the OUTPUT (you want to know in advance).

    orders⋈customer on custkey is the demonstration pair; the rule is
    key-agnostic."""
    lh = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("fl"))
    )
    rh = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_custkey").alias("k"))
        .agg(F.count("*").alias("fr"))
    )
    m = lh.join(rh, "k").withColumn("fanout", F.col("fl") * F.col("fr"))
    n_left = lh.agg(F.sum("fl").cast("long").alias("n_left"))
    n_right = rh.agg(F.sum("fr").cast("long").alias("n_right"))
    return (
        m.agg(
            F.count("*").cast("long").alias("n_matching_keys"),
            F.sum("fanout").cast("long").alias("exact_join_rows"),
            F.max("fanout").cast("long").alias("max_key_fanout"),
            F.max("fl").cast("long").alias("max_left_freq"),
            F.max("fr").cast("long").alias("max_right_freq"),
            # coalesce: on an empty key intersection MAX/SUM aggregate
            # to NULL and the comparison would too, while the oracle's
            # CASE ... ELSE FALSE yields FALSE — pin the no-rows answer
            # to FALSE in both engines (r14 ADVICE)
            F.coalesce(
                F.max("fanout") * 100 > F.sum("fanout"), F.lit(False)
            ).alias("skew_flag"),
        )
        .crossJoin(F.broadcast(n_left))
        .crossJoin(F.broadcast(n_right))
        .select(
            "n_left",
            "n_right",
            "n_matching_keys",
            "exact_join_rows",
            "max_key_fanout",
            "max_left_freq",
            "max_right_freq",
            "skew_flag",
        )
    )

#: per-key fanout above which :func:`join_preflight_gated` refuses to
#: materialize a key's output and dead-letters it instead — the
#: BAND_BUCKET_CAP philosophy applied to relational joins. Organic
#: fixture fanouts are two orders of magnitude below it (max ~45 at
#: sf0.1); only an adversarial hot key (template flood, crawler trap)
#: crosses it, and such a key's output is Θ(fanout) no matter how AQE
#: splits the WORK — the only scale-safe answer is to not emit it.
JOIN_FANOUT_CAP = 2_000


@register(
    "join_preflight_gated",
    oracle=f"""
    WITH lh AS (
      SELECT o_custkey AS k, COUNT(*) AS fl FROM orders GROUP BY o_custkey
    ), rh AS (
      SELECT c_custkey AS k, COUNT(*) AS fr FROM customer GROUP BY c_custkey
    ), m AS (
      SELECT lh.k, lh.fl, rh.fr, lh.fl * rh.fr AS fanout
      FROM lh JOIN rh USING (k)
    ), dead AS (
      SELECT k, fanout FROM m WHERE fanout > {JOIN_FANOUT_CAP}
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys_matching,
             CAST(SUM(CASE WHEN fanout > {JOIN_FANOUT_CAP}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_dead,
             CAST(COALESCE(SUM(CASE WHEN fanout <= {JOIN_FANOUT_CAP}
                                    THEN fanout END), 0) AS BIGINT)
               AS rows_predicted,
             CAST(COALESCE(SUM(CASE WHEN fanout > {JOIN_FANOUT_CAP}
                                    THEN fanout END), 0) AS BIGINT)
               AS rows_dead_lettered
      FROM m
    ), executed AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows_joined
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_custkey NOT IN (SELECT k FROM dead)
    )
    SELECT s.n_keys_matching, s.n_keys_dead, e.rows_joined,
           s.rows_predicted, s.rows_dead_lettered,
           CASE WHEN s.n_keys_dead > 0 THEN 'degraded'
                ELSE 'clean' END AS decision
    FROM stats s CROSS JOIN executed e
    """,
)
def join_preflight_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`join_cardinality_preflight` turned from telemetry into
    CONTROL (r14 verdict #6 — the sql_bucket_gate pattern applied to
    relational joins): the two key histograms price every key's
    fanout BEFORE the join, keys above JOIN_FANOUT_CAP are
    dead-lettered (their output would be Θ(fanout) regardless of AQE's
    work-splitting), and the join executes ONLY over the surviving
    keys — via a broadcast anti-join against the dead-key set, which
    is small BY CONSTRUCTION (hot keys are few; the allowed set would
    be key-cardinality-sized, so the guard broadcasts the complement).
    The output row carries both the histogram PREDICTION for the gated
    join and the EXECUTED row count — equal by the fanout identity,
    which the oracle re-proves and the planted-hot-key pytest pins —
    plus the decision column a pipeline branches on ('clean' =
    everything joined; 'degraded' = dead-letter queue needs a look).

    Scale: two map-side-partial histogram aggregates, one
    key-cardinality histogram join, one broadcast anti-join on the
    fact side — the fact table is scanned twice and never shuffled on
    the key unless the histogram join itself needs it; the executed
    join inherits whatever strategy AQE picks knowing the flood keys
    are already gone."""
    lh = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("fl"))
    )
    rh = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_custkey").alias("k"))
        .agg(F.count("*").alias("fr"))
    )
    m = lh.join(rh, "k").withColumn("fanout", F.col("fl") * F.col("fr"))
    over = F.col("fanout") > JOIN_FANOUT_CAP
    stats = m.agg(
        F.count("*").cast("long").alias("n_keys_matching"),
        F.sum(over.cast("long")).cast("long").alias("n_keys_dead"),
        F.coalesce(
            F.sum(F.when(~over, F.col("fanout"))), F.lit(0)
        ).cast("long").alias("rows_predicted"),
        F.coalesce(
            F.sum(F.when(over, F.col("fanout"))), F.lit(0)
        ).cast("long").alias("rows_dead_lettered"),
    )
    dead_keys = m.filter(over).select("k")
    executed = (
        load_table(spark, sf_dir, "orders")
        .join(F.broadcast(dead_keys), F.col("o_custkey") == F.col("k"), "left_anti")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .agg(F.count("*").cast("long").alias("rows_joined"))
    )
    return stats.crossJoin(F.broadcast(executed)).select(
        "n_keys_matching",
        "n_keys_dead",
        "rows_joined",
        "rows_predicted",
        "rows_dead_lettered",
        F.when(F.col("n_keys_dead") > 0, F.lit("degraded"))
        .otherwise(F.lit("clean"))
        .alias("decision"),
    )
