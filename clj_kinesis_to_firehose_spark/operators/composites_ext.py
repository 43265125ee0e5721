"""TPC-H analog composites, part 2 — the seven shapes composites.py
deferred (Q2/Q4/Q9/Q11/Q12/Q20/Q21) plus Q6/Q13/Q19, completing the
22-query benchmark surface.

The fixture schema has no partsupp and no l_shipmode / l_commitdate /
l_receiptdate (FIXTURES.md), so each analog re-anchors its original's
plan shape on available columns:

- Q2  min-cost supplier  → lineitem unit price (l_extendedprice /
  l_quantity) stands in for ps_supplycost; correlated per-part MIN over
  one region's suppliers.
- Q4  order priority     → "commit missed" becomes "a lineitem shipped
  >60 days after order date" (EXISTS semi join).
- Q9  product profit     → cost side uses p_retailprice * l_quantity in
  place of ps_supplycost * l_quantity.
- Q11 important stock    → part value from lineitem revenue per part for
  one nation's suppliers, HAVING > scalar fraction of the total.
- Q12 ship modes         → mode is a derived ship-delay bucket
  (datediff(l_shipdate, o_orderdate)) instead of l_shipmode.
- Q20 part promotion     → "excess stock" becomes "shipped > 50 units of
  one part family in a year" (nested agg → semi join).
- Q21 waiting suppliers  → "failed commit on a multi-supplier order"
  becomes "was the last (or tied-last) shipper on a multi-supplier
  finished order" via per-(order, supplier) max-shipdate aggregates.

Scale notes (100 TB contract, SCALE.md): O(1) dimensions
(nation/region) carry explicit broadcast hints; Θ(sf) sides
(supplier/part and per-partkey rollups like Q2's min_cost) are
UNHINTED — the planner/AQE broadcasts them while they fit and falls
back to a shuffled join past the threshold, which a hard hint would
forbid. The lineitem fact is scanned once per query with
filters/projections pushed into the parquet scan; Q21's self-join family is expressed as
two fact aggregations (pair-level then order-level) instead of three
correlated fact scans, so the fact shuffles on l_orderkey once and the
order-level rollup (|orders| rows) broadcasts back. Rounding discipline
per SURVEY.md §5.3: every float aggregate feeding a hash is rounded in
BOTH engines; threshold compares (Q11) round both sides first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


def _revenue():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             ROUND(MIN(l_extendedprice / l_quantity), 4) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), regional AS (
      SELECT c.l_partkey, c.unit_cost, s_suppkey, s_name, s_acctbal, n_name
      FROM costs c
      JOIN supplier ON c.l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    )
    SELECT ROUND(s_acctbal, 2) AS acctbal, s_name, n_name, p_partkey, unit_cost
    FROM part JOIN regional ON p_partkey = l_partkey
    WHERE p_type = 'SMALL' AND p_size < 15
      AND unit_cost = (SELECT MIN(r2.unit_cost) FROM regional r2
                       WHERE r2.l_partkey = p_partkey)
    ORDER BY acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the ASIA supplier(s)
    offering the minimum unit price. The correlated MIN decorrelates
    into a per-part aggregate over the region-filtered pair costs,
    joined back by (partkey, unit_cost) — one fact rollup, no
    re-scan. Unit cost is rounded to 4 dp BEFORE the min so a float
    tie cannot split across engines."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supplier = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
                "unit_cost"
            )
        )
    )
    regional = costs.join(
        supplier, costs.l_suppkey == supplier.s_suppkey
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") < 15)
    )
    # r16 (guide §2.4, the r15 window-over-join-back pattern): the
    # groupBy+join-back formulation built the regional subtree — fact
    # rollup included — TWICE (the committed before-plan carries two
    # lineitem scans and two pair-cost aggregates). MIN over a
    # per-part window is the identical relation (ties kept either
    # way) on ONE build, and the window's partitioning is the
    # join-back's own key.
    from pyspark.sql.window import Window

    min_w = Window.partitionBy("l_partkey")
    return (
        regional.withColumn("min_cost", F.min("unit_cost").over(min_w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(part, regional.l_partkey == part.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "unit_cost",
        )
        .orderBy(F.desc("acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter with at least one
    late-shipping lineitem (>60 days after order date — the fixture's
    analog of commitdate < receiptdate), counted per priority. The
    EXISTS is a left-semi join with a non-equi conjunct; lineitem
    never surfaces in the output so the semi join keeps the probe
    side at |orders| rows."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue change from hypothetically eliminating
    small discounts — a pure scan-filter-aggregate. All four predicates
    push into the parquet scan (no join, no shuffle beyond the final
    1-row reduce); the canonical test that filter pushdown reaches the
    row-group level."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return lineitem.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
      SELECT n_name,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY n_name, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on one part family per supplier nation
    and order year, with 0.6 * p_retailprice * l_quantity standing in
    for ps_supplycost * l_quantity. The p_name LIKE filter prunes the
    broadcast part side before the fact join; orders joins only to
    supply the year."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supp = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    amount = _revenue() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(supp, lineitem.l_suppkey == supp.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH vals AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS pv_dec
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey,
           CAST(ROUND(pv_dec, 2) AS DOUBLE) AS part_value
    FROM vals
    WHERE pv_dec > (SELECT SUM(pv_dec) * CAST(0.001 AS DECIMAL(6,3)) FROM vals)
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue through three nations'
    suppliers exceeds a scalar fraction of the total (lineitem revenue
    standing in for ps_supplycost * ps_availqty). The fraction
    threshold is a 1-row aggregate broadcast against the same rollup —
    the fact aggregates once. Summation happens in DECIMAL(18,4)
    (per-term double→decimal cast is deterministic; decimal addition
    is exact and order-independent), so neither the per-part values
    nor the threshold compare can drift with partial-agg order — the
    double round(…, 2) variant flaked on a half-cent boundary."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    vals = (
        load_table(spark, sf_dir, "lineitem")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_revenue().cast("decimal(18,4)")).alias("pv_dec"))
    )
    threshold = vals.agg(
        (F.sum("pv_dec") * F.lit(0.001).cast("decimal(6,3)")).alias("cutoff")
    )
    return (
        vals.join(F.broadcast(threshold))
        .filter(F.col("pv_dec") > F.col("cutoff"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("pv_dec", 2).cast("double").alias("part_value"),
        )
    )


@register(
    "tpch_q12_ship_delay_modes",
    oracle="""
    SELECT ship_bucket,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM (
      SELECT CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
                  WHEN DATE_DIFF('day', o_orderdate, l_shipdate) <= 90 THEN 'REGULAR'
                  ELSE 'SLOW' END AS ship_bucket,
             o_orderpriority
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipped
    GROUP BY ship_bucket
    """,
)
def tpch_q12_ship_delay_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix per shipping mode, with mode
    derived from the order→ship delay (FAST ≤30d, REGULAR ≤90d, SLOW)
    since the fixture has no l_shipmode. Single fact⋈orders join;
    the CASE pivot happens map-side inside the partial aggregate so
    only (3 buckets × 2 counters) rows shuffle."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "FAST").when(delay <= 90, "REGULAR").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_cust_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    excluding one priority class (the fixture's stand-in for the
    o_comment NOT LIKE filter). The join-side filter lives in the
    LEFT JOIN condition — customers with zero qualifying orders must
    survive with c_count = 0, which COUNT(o_orderkey) (null-skipping)
    preserves. Two-level aggregation: the second rollup input is only
    |customer| rows."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    branches. Catalyst cannot push the mixed-table disjunction below
    the join, but it DOES push the derivable per-table envelopes
    (brand IN (...) on part; quantity BETWEEN min..max on lineitem) —
    the plan-shape this query exists to exercise. Part broadcasts;
    the residual OR evaluates post-join in codegen."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    joined = lineitem.join(part, lineitem.l_partkey == part.p_partkey)
    b = F.col("p_brand")
    s = F.col("p_size")
    q = F.col("l_quantity")
    branch = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 21))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 30))
        | ((b == "Brand#4") & s.between(1, 35) & q.between(20, 40))
    )
    return joined.filter(branch).agg(
        F.round(F.sum(_revenue()), 2).alias("revenue")
    )


@register(
    "tpch_q20_promotion_suppliers",
    oracle="""
    SELECT s_name, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 30)
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who moved more than a
    threshold quantity of one part family in a year ("has excess
    stock" analog). Nested aggregate at (supplier, part) grain →
    qualifying supplier keys → left-semi join into the nation-filtered
    supplier scan. The IN-subquery side reduces to distinct suppkeys
    before the semi join, so the probe build is tiny and broadcasts."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qualifying = (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return supplier.join(
        qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", F.round("s_acctbal", 2).alias("acctbal"))


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: on finished multi-supplier orders, the
    supplier whose shipment was latest ("everyone else was waiting on
    them" — the fixture analog of the missed-commit predicate).

    The SQL's EXISTS / NOT EXISTS pair would be two extra fact scans;
    here both collapse into one rollup chain: per-(order, supplier)
    max shipdate → per-order [distinct-supplier count, max, count at
    max, second max]. A row l1 survives iff its order has ≥2 suppliers
    and l1.l_shipdate >= the max shipdate among OTHER suppliers (= the
    order max, or the second max when l1's supplier uniquely holds the
    max). The fact shuffles once on l_orderkey; the order-level rollup
    (|orders| rows, 4 columns) broadcasts back onto the filtered l1
    rows. Timestamp compares are exact (ms precision), so the
    tied-last case is engine-stable."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    pair = lineitem.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_max")
    )
    w = Window.partitionBy("l_orderkey")
    pair_rank = (
        pair.withColumn("m1", F.max("supp_max").over(w))
        .withColumn("n_supp", F.count("*").over(w))
        .withColumn(
            "cnt_at_m1",
            F.sum(F.when(F.col("supp_max") == F.col("m1"), 1).otherwise(0)).over(w),
        )
        .withColumn(
            "m2",
            F.max(
                F.when(F.col("supp_max") < F.col("m1"), F.col("supp_max"))
            ).over(w),
        )
        .filter(F.col("n_supp") >= 2)
        .withColumn(
            "other_max",
            F.when(
                (F.col("supp_max") == F.col("m1")) & (F.col("cnt_at_m1") == 1),
                F.col("m2"),
            ).otherwise(F.col("m1")),
        )
        .select(
            F.col("l_orderkey").alias("pr_okey"),
            F.col("l_suppkey").alias("pr_skey"),
            "other_max",
        )
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    return (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            pair_rank,
            (F.col("l_orderkey") == F.col("pr_okey"))
            & (F.col("l_suppkey") == F.col("pr_skey")),
        )
        .filter(F.col("l_shipdate") >= F.col("other_max"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
