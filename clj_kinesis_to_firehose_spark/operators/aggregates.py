"""Aggregation operators (SURVEY.md §2 D1-D11).

Scale notes: every aggregate here is a hash aggregate with map-side
partial aggregation (Spark plans partial+final automatically), so the
shuffle carries one row per (partition × group), not per input row.
Group-key cardinalities are small (flags, priorities, nations) —
no skew handling needed; high-cardinality grouping (per-user) appears
in the window/streaming operators instead.

Cross-engine determinism (SURVEY.md §5.3): every floating aggregate is
rounded identically in the Spark expression and the oracle SQL;
statistics run on small-magnitude columns (quantity/discount) so a
4-decimal round fully absorbs summation-order float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.operators.llm_dedup import portable_hash60
from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@register(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: two group keys, six aggregates, one scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@register("agg_approx_distinct")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct users per event type (weak: Spark's HLL sketch is not
    bit-compatible with DuckDB's — pytest asserts ±5% of exact instead).

    At 100 TB this is the operator that replaces COUNT(DISTINCT): one
    pass, fixed sketch memory, no exact-distinct shuffle explosion.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               GROUPING_ID(l_returnflag, l_linestatus) AS gid,
               COUNT(*) AS n_items
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12 AND SUM(o_totalprice) > 1500000.0
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.sum("o_totalprice").alias("_raw_spend"),
        )
        .filter((F.col("n_orders") >= 12) & (F.col("_raw_spend") > 1500000.0))
        .drop("_raw_spend")
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
           ROUND(VAR_SAMP(l_discount), 6) AS var_disc,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # statistics on small-magnitude columns only: rounding can absorb
    # float drift for |x|~50 at 4 dp, but never for variance of ~1e5
    # price magnitudes (SURVEY.md §5.3)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS median_price,
           ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark `percentile` is the exact interpolating aggregate — same
    # linear-interpolation definition as DuckDB QUANTILE_CONT
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@register(
    "agg_bitwise",
    oracle="""
    SELECT event_type,
           BIT_AND(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS k_and,
           BIT_OR(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS k_or,
           BIT_XOR(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS k_xor
    FROM events GROUP BY event_type
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bitwise aggregates over the JSON payload field — order-insensitive
    # by algebra, so exact across engines with no rounding discipline
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return ev.groupBy("event_type").agg(
        F.bit_and("k").alias("k_and"),
        F.bit_or("k").alias("k_or"),
        F.bit_xor("k").alias("k_xor"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ARRAY_TO_STRING(LIST(CAST(l_quantity AS BIGINT) ORDER BY CAST(l_quantity AS BIGINT)), ',')
             AS qty_list
    FROM lineitem
    WHERE l_orderkey < 40
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-group sorted value list; serialized to a canonical string so
    # the cross-engine hash compares text, not list physical types
    # (quantities are integral doubles — exact as BIGINT)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 40)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.col("l_quantity").cast("long"))), ","
        ).alias("qty_list")
    )


#: histogram bin width for agg_approx_quantile (o_totalprice units).
#: ~1000 bins over the price range — bounded sketch state, and the
#: within-bin interpolation error (< one bin) is far inside the 1%
#: accuracy bound pinned in tests/test_weak_ops.py.
QUANTILE_BIN_WIDTH = 500.0


@register(
    "agg_approx_quantile",
    oracle="""
    WITH h AS (
      SELECT o_orderstatus AS st,
             CAST(floor(o_totalprice / 500.0) AS BIGINT) AS bin,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1, 2
    ), c AS (
      SELECT st, bin, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY st ORDER BY bin) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY st) AS BIGINT) AS n
      FROM h
    ), t AS (
      SELECT st, bin, cnt, cum,
             CAST(ceil(0.50 * n) AS BIGINT) AS t50,
             CAST(ceil(0.90 * n) AS BIGINT) AS t90,
             CAST(ceil(0.99 * n) AS BIGINT) AS t99
      FROM c
    )
    SELECT st AS o_orderstatus,
           ROUND(MIN(CASE WHEN cum >= t50 AND cum - cnt < t50
                 THEN bin * 500 + 500.0 * (t50 - cum + cnt) / cnt END), 2)
             AS p50_approx,
           ROUND(MIN(CASE WHEN cum >= t90 AND cum - cnt < t90
                 THEN bin * 500 + 500.0 * (t90 - cum + cnt) / cnt END), 2)
             AS p90_approx,
           ROUND(MIN(CASE WHEN cum >= t99 AND cum - cnt < t99
                 THEN bin * 500 + 500.0 * (t99 - cum + cnt) / cnt END), 2)
             AS p99_approx
    FROM t GROUP BY st
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of o_totalprice per o_orderstatus via a
    fixed-bin integer histogram sketch with an EXACT cross-engine
    oracle — the same portability upgrade HLL and CMS got
    (agg_hll_portable): where percentile_approx's Greenwald-Khanna
    sketch is merge-order-dependent and engine-specific, a histogram
    of integer counts is deterministic, so DuckDB rebuilds it
    bit-for-bit and the interpolation is one double division of
    bit-identical integer operands.

    Built TWO-LEVEL like the other portable sketches — monthly partial
    histograms, then an integer merge per status — the 100 TB
    incremental pattern: persist ~1000 small counts per (month,
    group) and ANY rollup window is a count-sum, never a re-scan.
    Estimator: target rank t_q = ceil(q*n); the first bin whose
    running count reaches t_q localizes the quantile and a linear
    interpolation inside the bin refines it (error < one bin width;
    the 1% bound vs the exact interpolating percentile stays pinned
    in tests/test_weak_ops.py). Fixed-size state per partition, one
    merge per key, no full sort."""
    orders = load_table(spark, sf_dir, "orders")
    W = QUANTILE_BIN_WIDTH
    monthly = (
        orders.select(
            F.col("o_orderstatus").alias("st"),
            F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
            F.floor(F.col("o_totalprice") / F.lit(W)).alias("bin"),
        )
        .groupBy("mon", "st", "bin")
        .agg(F.count(F.lit(1)).alias("cnt_partial"))
    )
    hist = monthly.groupBy("st", "bin").agg(
        F.sum("cnt_partial").alias("cnt")
    )
    wcum = (
        Window.partitionBy("st")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("st")
    c = hist.select(
        "st",
        "bin",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )

    def est(t):
        # exactly one bin straddles the target rank: the first whose
        # running count reaches t (cum >= t) having started below it
        # (cum - cnt < t); MIN just collapses the other bins' NULLs.
        # NOTE: the oracle SQL above necessarily hard-codes the bin
        # width — change QUANTILE_BIN_WIDTH only in lockstep with it.
        return F.min(
            F.when(
                (F.col("cum") >= t) & (F.col("cum") - F.col("cnt") < t),
                F.col("bin") * F.lit(W)
                + F.lit(float(W)) * (t - F.col("cum") + F.col("cnt")) / F.col("cnt"),
            )
        )

    t50 = F.ceil(F.lit(0.50) * F.col("n")).cast("long")
    t90 = F.ceil(F.lit(0.90) * F.col("n")).cast("long")
    t99 = F.ceil(F.lit(0.99) * F.col("n")).cast("long")
    targeted = c.select(
        "st", "bin", "cnt", "cum",
        t50.alias("t50"), t90.alias("t90"), t99.alias("t99"),
    )
    return targeted.groupBy(F.col("st").alias("o_orderstatus")).agg(
        F.round(est(F.col("t50")), 2).alias("p50_approx"),
        F.round(est(F.col("t90")), 2).alias("p90_approx"),
        F.round(est(F.col("t99")), 2).alias("p99_approx"),
    )


@register("agg_hll_sketch")
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct-count sketches (Apache DataSketches):
    per-(day, event_type) partial sketches, then hll_union_agg rolls
    them up to per-event_type totals without touching raw rows again.

    This two-level shape is THE incremental pattern at 100 TB: daily
    partials persist beside the data, and any rollup window is a
    union of fixed-size sketches instead of a re-scan. Weak oracle
    (sketch binaries are engine-specific); the behavioral test bounds
    the estimate against exact countDistinct.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
    )
    return daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
        F.count("*").alias("n_partials"),
    )


@register(
    "agg_hll_portable",
    oracle="""
    WITH h AS (
      SELECT event_type,
             (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT) AS hv
      FROM events
    ), b AS (
      SELECT event_type, hv % 64 AS bucket, hv // 64 AS rest FROM h
    ), r AS (
      SELECT event_type, bucket,
             MAX(CASE WHEN rest = 0 THEN 54
                      ELSE LEAST(55 - length(format('{:b}', rest)), 54) END) AS reg
      FROM b GROUP BY event_type, bucket
    ), s AS (
      SELECT event_type,
             SUM((1::BIGINT << (54 - reg))) AS s_present,
             COUNT(*) AS n_present
      FROM r GROUP BY event_type
    )
    SELECT event_type,
           ROUND(5.2314966193040286e+19
                 / CAST(s_present + (64 - n_present) * 18014398509481984
                        AS DOUBLE), 2) AS approx_ids,
           CAST(n_present AS BIGINT) AS n_buckets_used
    FROM s
    """,
)
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog with an EXACT cross-engine oracle — the sketch
    itself is reproduced bit-for-bit in DuckDB via the portable md5
    hash (the same trick that upgraded the MinHash family), unlike
    agg_hll_sketch whose DataSketches binaries are engine-specific.

    m=64 registers: bucket = low 6 hash bits, rho = leading-zero rank
    of the remaining 54 bits (integer-exact via binary-string length,
    capped at 54). The register table is built TWO-LEVEL — daily
    partial registers, then a max-merge per event_type — the 100 TB
    incremental pattern: persisting 64 small ints per (day, group)
    replaces any re-scan, and ANY rollup window is a max-merge of
    fixed-size registers. Every aggregation is integer (max, bit-shift
    sums in int64), so the raw-regime estimate is ONE double division
    of bit-identical operands — no float accumulation, no libm calls
    (the small-range ln correction is deliberately out of contract:
    event_id cardinality per group is far above 2.5m at every fixture
    SF, and ln() is not bit-portable across engines).

    Estimator: E = alpha_64 * m^2 / sum(2^-reg); the numerator is the
    precomputed double literal alpha_64*64*64*2^54 = 5.2314966193040286e19,
    embedded identically in both engines. +-13 pct at m=64 (sigma =
    1.04/sqrt(m)), bounded against exact countDistinct in pytest."""
    ev = load_table(spark, sf_dir, "events")
    hv = portable_hash60(F.col("event_id").cast("string"))
    hashed = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        hv.bitwiseAND(F.lit(63)).alias("bucket"),
        F.shiftright(hv, 6).alias("rest"),
    )
    rho = F.when(F.col("rest") == 0, F.lit(54)).otherwise(
        F.least(F.lit(55) - F.length(F.bin(F.col("rest"))), F.lit(54))
    )
    daily = hashed.groupBy("day", "event_type", "bucket").agg(
        F.max(rho).alias("reg")
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.max("reg").alias("reg")
    )
    s = merged.groupBy("event_type").agg(
        # python shiftleft() wants a literal bit count; the SQL form
        # takes an expression
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 54 - reg)")).alias(
            "s_present"
        ),
        F.count("*").alias("n_present"),
    )
    return s.select(
        "event_type",
        F.round(
            F.lit(5.2314966193040286e19)
            / (
                F.col("s_present")
                + (F.lit(64) - F.col("n_present")) * F.lit(18014398509481984)
            ).cast("double"),
            2,
        ).alias("approx_ids"),
        F.col("n_present").cast("long").alias("n_buckets_used"),
    )


@register(
    "agg_filtered",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           COUNT(*) FILTER (WHERE l_quantity >= 25.0) AS n_bulk,
           ROUND(SUM(l_quantity) FILTER (WHERE l_tax < 0.04), 2) AS qty_lowtax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates (SQL FILTER clause): several differently-
    conditioned aggregates in ONE scan + ONE hash aggregate, instead
    of N self-joined subqueries — at 100 TB the difference between one
    pass and four. Spark expresses FILTER as count/sum over CASE
    (identical plan); the oracle uses the ANSI FILTER syntax.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.count(F.when(F.col("l_quantity") >= 25.0, 1)).alias("n_bulk"),
        F.round(
            F.sum(F.when(F.col("l_tax") < 0.04, F.col("l_quantity"))), 2
        ).alias("qty_lowtax"),
    )


@register(
    "agg_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
             AS sum_price_exact,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR)
             AS sum_qty_exact
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-decimal aggregation: sums in DECIMAL instead of DOUBLE,
    so the result is identical regardless of partial-aggregation
    order — the money-column discipline at any scale (no §5.3
    rounding needed; the VARCHAR projection is only for the
    cross-engine hash). Same one-shuffle hash-agg plan as agg_groupby.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("string")
        .alias("sum_price_exact"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("string")
        .alias("sum_qty_exact"),
    )


@register(
    "agg_min_by_max_by",
    oracle="""
    WITH ext AS (
      SELECT l_returnflag,
             MIN(l_extendedprice) AS mn,
             MAX(l_extendedprice) AS mx
      FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           MIN(CASE WHEN l_extendedprice = mn THEN l_orderkey END) AS cheapest_order,
           MAX(CASE WHEN l_extendedprice = mx THEN l_orderkey END) AS priciest_order
    FROM lineitem l JOIN ext ON l.l_returnflag = ext.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) aggregates: the order key carrying
    the extreme extended price per return flag. Ties on the price are
    broken by the order key via a struct ordering key on the Spark side
    (lexicographic struct compare); the oracle decorrelates into
    extreme-value join + MIN/MAX over the tied keys — same winner, and
    the double equality is safe because no arithmetic touches the
    values (SURVEY.md §5.3)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.min_by(
            "l_orderkey", F.struct("l_extendedprice", "l_orderkey")
        ).alias("cheapest_order"),
        F.max_by(
            "l_orderkey", F.struct("l_extendedprice", "l_orderkey")
        ).alias("priciest_order"),
    )


@register(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 4) AS covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (slope/intercept/R²/covariance) of
    price vs quantity per return flag. All four are algebraic
    (sum/sum-of-products sketches), so Spark partial-aggregates them
    map-side — one tiny shuffle regardless of fact size."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("covar"),
    )


@register(
    "agg_bool",
    oracle="""
    SELECT o_orderstatus,
           BOOL_AND(o_totalprice > 1000)    AS all_over_1k,
           BOOL_OR(o_totalprice > 400000)   AS any_over_400k,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_over_100k
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any) plus a filtered count per order
    status — the COUNT(*) FILTER form maps to count_if. All algebraic,
    partial-aggregated map-side."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_over_100k"),
    )


@register(
    "agg_weighted_percentile",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               SUM(o_totalprice) OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_totalprice, o_orderkey) AS cum_w,
               SUM(o_totalprice) OVER (PARTITION BY o_orderpriority) AS tot_w
        FROM orders
    )
    SELECT o_orderpriority,
           ROUND(MIN(o_totalprice), 4) AS weighted_median
    FROM ranked
    WHERE ROUND(cum_w, 4) >= ROUND(tot_w / 2, 4)
    GROUP BY o_orderpriority
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median per group (weight = the value itself here;
    any weight column works): the smallest value whose running weight
    share reaches 50% — "the order price below which half the revenue
    sits", the inventory-style percentile plain `percentile` can't
    express.

    One window pass over each group's sort (running weight + group
    total share the same partition sort) and a min-aggregate over the
    qualifying suffix. The (value, key) tie-break makes the cumulative
    sum deterministic across engines. At 100 TB this is one shuffle on
    the group key; for a global weighted median swap the partition for
    a range-partitioned sort or go approximate."""
    orders = load_table(spark, sf_dir, "orders")
    wsort = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wall = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.sum("o_totalprice").over(wsort).alias("cum_w"),
        F.sum("o_totalprice").over(wall).alias("tot_w"),
    )
    return (
        # round both sides before comparing: the two engines may
        # associate the running-sum additions differently, and a row at
        # the exact 50% boundary must not flip between them (§5.3)
        ranked.filter(F.round(F.col("cum_w"), 4) >= F.round(F.col("tot_w") / 2, 4))
        .groupBy("o_orderpriority")
        .agg(F.round(F.min("o_totalprice"), 4).alias("weighted_median"))
    )


@register(
    "agg_cms_portable",
    oracle="""
    WITH et AS (SELECT DISTINCT event_type FROM events),
    js AS (SELECT UNNEST(RANGE(4)) AS j),
    sketch AS (
      SELECT event_type, j,
             (('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) % 256 AS bucket,
             COUNT(*) AS cnt
      FROM events, js GROUP BY 1, 2, 3
    ),
    probes AS (SELECT UNNEST(RANGE(1, 21)) AS user_id),
    pb AS (
      SELECT p.user_id, j.j,
             (('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':'
                || CAST(p.user_id AS VARCHAR)), 1, 15))::BIGINT) % 256 AS bucket
      FROM probes p, js j
    )
    SELECT e.event_type, pb.user_id,
           CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est_count
    FROM et e CROSS JOIN pb
    LEFT JOIN sketch s ON s.event_type = e.event_type
                      AND s.j = pb.j AND s.bucket = pb.bucket
    GROUP BY 1, 2
    """,
)
def agg_cms_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch with an EXACT cross-engine oracle: d=4 hash
    rows x w=256 buckets, bucket = portable md5 hash of (row-seed :
    key) — all-integer counts, so DuckDB rebuilds the identical sketch
    and the identical min-over-rows estimates (Spark's built-in
    count_min_sketch aggregate can't carry an oracle: its sketch
    binary is engine-specific). Probing is fully distributed: the
    probe x row bucket table broadcasts against the sketch — no
    sketch binary ever reaches the driver.

    Scale note: the d-row explode costs d x the scan's shuffle input;
    the built-in count_min_sketch aggregate avoids that via map-side
    partial sketch merge and stays the 100 TB default — THIS op (and
    agg_cms_heavyhitters, which thresholds the same structure into a
    heavy-hitter shortlist) trades the explode for bit-exact
    checkability (and its sketch table is still only
    |groups| * d * w counters)."""
    ev = load_table(spark, sf_dir, "events")
    d, w = 4, 256
    js = F.array(*[F.lit(j) for j in range(d)])

    def bucket(j_col, key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", j_col, key_col.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % w
        )

    rows = ev.select(
        "event_type", "user_id", F.explode(js).alias("j")
    )
    sketch = (
        rows.withColumn("bucket", bucket(F.col("j"), F.col("user_id")))
        .groupBy("event_type", "j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    probes = spark.createDataFrame(
        [(u, j) for u in range(1, 21) for j in range(d)],
        "user_id long, j int",
    ).withColumn("bucket", bucket(F.col("j"), F.col("user_id")))
    ets = ev.select("event_type").distinct()
    return (
        ets.crossJoin(F.broadcast(probes))
        .join(
            sketch,
            ["event_type", "j", "bucket"],
            "left",
        )
        .groupBy("event_type", "user_id")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count")
        )
    )


@register(
    "agg_cms_heavyhitters",
    oracle="""
    WITH js AS (SELECT UNNEST(RANGE(4)) AS j),
    sketch AS (
      SELECT event_type, j,
             (('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) % 256 AS bucket,
             COUNT(*) AS cnt
      FROM events, js GROUP BY 1, 2, 3
    ),
    cand AS (
      SELECT DISTINCT e.event_type, e.user_id, j.j,
             (('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':'
                || CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT) % 256 AS bucket
      FROM events e, js j
    ),
    est AS (
      SELECT c.event_type, c.user_id,
             CAST(MIN(s.cnt) AS BIGINT) AS est_count
      FROM cand c
      JOIN sketch s ON s.event_type = c.event_type
                   AND s.j = c.j AND s.bucket = c.bucket
      GROUP BY 1, 2
    ),
    tot AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1)
    SELECT est.event_type, est.user_id, est.est_count
    FROM est JOIN tot ON tot.event_type = est.event_type
    WHERE est.est_count * 100 >= tot.n
    """,
)
def agg_cms_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy-hitter shortlist with an EXACT cross-engine
    oracle (weak→exact upgrade, r08 — the r07 verdict #6 pattern):
    the same portable md5 sketch as agg_cms_portable (d=4 rows x
    w=256 integer buckets), probed at every OBSERVED key and
    thresholded at φ=1% of the key's group size. CMS never
    undercounts, so the shortlist is a deterministic superset of the
    true φ-heavy hitters — the classic sketch-then-verify shape —
    and because every counter is an integer built from a portable
    hash, DuckDB rebuilds the identical sketch, the identical
    min-over-rows estimates, and the identical shortlist.

    The integer comparison ``est*100 >= n`` (not est >= 0.01*n) keeps
    the threshold decision float-free on both engines. Scale: the
    sketch is |groups|·d·w counters however many distinct keys exist;
    candidate probing is one distinct + broadcast-joinable lookup
    against it, and the d-row explode is the price of bit-exact
    checkability (the built-in ``count_min_sketch`` aggregate, which
    merges map-side without the explode, remains the 100 TB default —
    its engine-specific binary is why it can't carry the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    d, w = 4, 256
    js = F.array(*[F.lit(j) for j in range(d)])

    def bucket(j_col, key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", j_col, key_col.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % w
        )

    rows = ev.select("event_type", "user_id", F.explode(js).alias("j"))
    # lazy pin (r15, guide §2.4/§5): the estimate join and the derived
    # totals both consume the sketch; pinned it is the |groups|·d·w
    # counter table itself. The remaining two corpus passes (sketch
    # build, candidate probe) are the sketch-then-verify shape's cost.
    sketch = (
        rows.withColumn("bucket", bucket(F.col("j"), F.col("user_id")))
        .groupBy("event_type", "j", "bucket")
        .agg(F.count("*").alias("cnt"))
    ).localCheckpoint(eager=False)
    cand = rows.withColumn(
        "bucket", bucket(F.col("j"), F.col("user_id"))
    ).distinct()
    est = (
        cand.join(sketch, ["event_type", "j", "bucket"])
        .groupBy("event_type", "user_id")
        .agg(F.min("cnt").cast("long").alias("est_count"))
    )
    # group totals derived from the pinned sketch instead of a third
    # corpus scan (r15): every event lands in exactly ONE bucket per
    # depth row, so Σcnt over the j=0 slice IS the group's row count.
    totals = (
        sketch.filter(F.col("j") == 0)
        .groupBy("event_type")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )
    # |event_types| rows — a bounded aggregate, broadcast by rule
    return (
        est.join(F.broadcast(totals), "event_type")
        .filter(F.col("est_count") * 100 >= F.col("n"))
        .select("event_type", "user_id", "est_count")
    )
