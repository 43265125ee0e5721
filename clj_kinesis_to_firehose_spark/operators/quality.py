"""Data-quality / profiling operators.

A 100 TB training-data pipeline runs these gates before and after
every transform stage: column profiles, referential checks, row-level
rule violations, outlier detection, calendar gap-filling, stratified
sampling, and embedding quantization. The reference bridge validates
records before delivery (malformed → dead-letter); these operators
are that validation surface generalized to the star schema.

Scale notes: every profile/rule op is ONE scan + ONE aggregate (no
per-rule self-joins); referential checks are anti joins that
broadcast the small side; the z-score outlier uses a window over the
group key (single shuffle) instead of an agg + re-join (two).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "dq_profile_columns",
    oracle="""
    WITH a AS (
      SELECT COUNT(*) AS n,
             COUNT(o_totalprice) AS nn_tp, COUNT(DISTINCT o_totalprice) AS nd_tp,
             ROUND(MIN(o_totalprice), 2) AS min_tp, ROUND(MAX(o_totalprice), 2) AS max_tp,
             COUNT(o_custkey) AS nn_ck, COUNT(DISTINCT o_custkey) AS nd_ck,
             CAST(MIN(o_custkey) AS DOUBLE) AS min_ck, CAST(MAX(o_custkey) AS DOUBLE) AS max_ck,
             COUNT(o_orderstatus) AS nn_st, COUNT(DISTINCT o_orderstatus) AS nd_st
      FROM orders)
    SELECT 'o_totalprice' AS col_name, n AS n_rows, nn_tp AS n_nonnull,
           nd_tp AS n_distinct, min_tp AS min_v, max_tp AS max_v FROM a
    UNION ALL
    SELECT 'o_custkey', n, nn_ck, nd_ck, min_ck, max_ck FROM a
    UNION ALL
    SELECT 'o_orderstatus', n, nn_st, nd_st, NULL, NULL FROM a
    """,
)
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form column profile (rows, non-null, distinct, min/max)
    for three orders columns in ONE scan: all metrics come out of a
    single aggregate, then `stack` reshapes the 1-row wide result to
    (column × metric) rows driver-side — no per-column re-scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    a = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_totalprice").alias("nn_tp"),
        F.countDistinct("o_totalprice").alias("nd_tp"),
        F.round(F.min("o_totalprice"), 2).alias("min_tp"),
        F.round(F.max("o_totalprice"), 2).alias("max_tp"),
        F.count("o_custkey").alias("nn_ck"),
        F.countDistinct("o_custkey").alias("nd_ck"),
        F.min("o_custkey").cast("double").alias("min_ck"),
        F.max("o_custkey").cast("double").alias("max_ck"),
        F.count("o_orderstatus").alias("nn_st"),
        F.countDistinct("o_orderstatus").alias("nd_st"),
    )
    return a.select(
        F.expr(
            """stack(3,
               'o_totalprice', n, nn_tp, nd_tp, min_tp, max_tp,
               'o_custkey',    n, nn_ck, nd_ck, min_ck, max_ck,
               'o_orderstatus', n, nn_st, nd_st, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
               AS (col_name, n_rows, n_nonnull, n_distinct, min_v, max_v)"""
        )
    )


@register(
    "dq_referential_orphans",
    oracle="""
    SELECT 'orders->customer' AS fk, COUNT(*) AS n_orphans FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem->orders', COUNT(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'customer->nation', COUNT(*) FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    """,
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for three FK edges
    via left-anti joins. The dimension sides are UNHINTED: nation is
    O(1) but customer and the orders key set grow with the fact, so a
    hard broadcast hint would OOM at 100 TB. The planner/AQE
    broadcasts each anti-join build side while it fits (scan +
    broadcast-anti, no fact shuffle) and degrades to a shuffled anti
    join past the threshold.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")

    def orphans(fact: DataFrame, dim: DataFrame, cond, label: str) -> DataFrame:
        return (
            fact.join(dim, cond, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        orphans(orders, customer, orders.o_custkey == customer.c_custkey, "orders->customer")
        .unionByName(
            orphans(lineitem, orders, lineitem.l_orderkey == orders.o_orderkey, "lineitem->orders")
        )
        .unionByName(
            orphans(customer, nation, customer.c_nationkey == nation.n_nationkey, "customer->nation")
        )
    )


@register(
    "dq_rule_violations",
    oracle="""
    WITH v AS (
      SELECT
        SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS qty_range,
        SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS discount_range,
        SUM(CASE WHEN l_tax < 0.0 OR l_tax > 0.08 THEN 1 ELSE 0 END) AS tax_range,
        SUM(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS nonpositive_price
      FROM lineitem)
    SELECT 'qty_range' AS rule, CAST(qty_range AS BIGINT) AS n_violations FROM v
    UNION ALL SELECT 'discount_range', CAST(discount_range AS BIGINT) FROM v
    UNION ALL SELECT 'tax_range', CAST(tax_range AS BIGINT) FROM v
    UNION ALL SELECT 'nonpositive_price', CAST(nonpositive_price AS BIGINT) FROM v
    """,
)
def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level rule audit over lineitem: four domain rules counted
    in ONE scan (conditional sums), reshaped long with `stack`. The
    dead-letter router (route_dead_letter) is the streaming analog;
    this is the batch gate a pipeline runs before training ingestion.
    """
    li = load_table(spark, sf_dir, "lineitem")

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    a = li.agg(
        viol((F.col("l_quantity") < 1.0) | (F.col("l_quantity") > 50.0)).alias("qty_range"),
        viol((F.col("l_discount") < 0.0) | (F.col("l_discount") > 0.1)).alias("discount_range"),
        viol((F.col("l_tax") < 0.0) | (F.col("l_tax") > 0.08)).alias("tax_range"),
        viol(F.col("l_extendedprice") <= 0.0).alias("nonpositive_price"),
    )
    return a.select(
        F.expr(
            """stack(4,
               'qty_range', qty_range,
               'discount_range', discount_range,
               'tax_range', tax_range,
               'nonpositive_price', nonpositive_price)
               AS (rule, n_violations)"""
        )
    )


@register(
    "outlier_zscore",
    oracle="""
    WITH z AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             ROUND((l_quantity - AVG(l_quantity) OVER (PARTITION BY l_returnflag))
                   / STDDEV_SAMP(l_quantity) OVER (PARTITION BY l_returnflag),
                   4) AS z
      FROM lineitem)
    SELECT l_orderkey, l_linenumber, z FROM z WHERE ABS(z) > 1.6
    """,
)
def outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier flagging within each l_returnflag group, as a
    window (ONE shuffle) rather than aggregate + re-join (two). The
    filter compares the ROUNDED z (§5.3: never filter on a raw float
    derived from cross-engine aggregation); quantity is small-
    magnitude so 4 dp absorbs summation-order drift.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag")
    z = F.round(
        (F.col("l_quantity") - F.avg("l_quantity").over(w))
        / F.stddev_samp("l_quantity").over(w),
        4,
    )
    return (
        li.select("l_orderkey", "l_linenumber", z.alias("z"))
        .filter(F.abs(F.col("z")) > 1.6)
    )


@register(
    "ts_gap_fill",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY 1),
    cal AS (
      SELECT b.event_type, CAST(UNNEST(GENERATE_SERIES(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM b)
    SELECT cal.event_type, CAST(cal.day AS VARCHAR) AS day,
           COALESCE(d.n, 0) AS n_events
    FROM cal LEFT JOIN d USING (event_type, day)
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: per-event_type daily counts with
    missing days zero-filled via sequence(min_day, max_day) + explode,
    left-joined back to observed counts.

    The calendar side is tiny (types × days) and broadcast; the only
    fact shuffle is the daily pre-aggregate, which also bounds the
    explode to one row per (type, day) — safe at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    cal = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    return (
        F.broadcast(cal)
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
    )


@register(
    "sample_stratified",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents)
    SELECT doc_id, lang FROM r WHERE rn % 10 = 1
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: every 10th document per lang
    stratum (ordered by doc_id) — equal sampling rate per class with
    a reproducible, engine-independent selection. One shuffle on the
    stratum key; at 100 TB swap row_number for a hash-mod on doc_id
    to make it shuffle-free (documented trade: hash-mod is not
    exactly proportional per stratum).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") % 10 == 1)
        .select("doc_id", "lang")
    )


@register(
    "embedding_quantize",
    oracle="""
    SELECT vec_id,
           CAST(LIST_SUM(LIST_TRANSFORM(embedding,
                x -> CAST(FLOOR(CAST(x AS DOUBLE) * 64.0) AS BIGINT))) AS BIGINT) AS q_sum,
           CAST(LIST_MIN(LIST_TRANSFORM(embedding,
                x -> CAST(FLOOR(CAST(x AS DOUBLE) * 64.0) AS BIGINT))) AS BIGINT) AS q_min,
           CAST(LIST_MAX(LIST_TRANSFORM(embedding,
                x -> CAST(FLOOR(CAST(x AS DOUBLE) * 64.0) AS BIGINT))) AS BIGINT) AS q_max
    FROM embeddings
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar quantization of embeddings (floor(x·64) → int): the
    compression step before ANN index build at scale. Uses floor on
    IEEE-exact doubles (no half-way rounding, which differs across
    engines); summarized to per-vector int stats so the oracle hash
    is float-free. All element work is codegen'd transform/aggregate —
    no Python, no explode.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * F.lit(64.0)).cast("long")
    )
    return emb.select(
        "vec_id",
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
    )


@register(
    "outlier_winsorize",
    oracle="""
    WITH p AS (
      SELECT l_returnflag,
             QUANTILE_CONT(l_quantity, 0.05) AS lo,
             QUANTILE_CONT(l_quantity, 0.95) AS hi
      FROM lineitem GROUP BY 1)
    SELECT l.l_orderkey, l.l_linenumber,
           ROUND(LEAST(GREATEST(l.l_quantity, p.lo), p.hi), 2) AS qty_winsorized
    FROM lineitem l JOIN p USING (l_returnflag)
    """,
)
def outlier_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp each value to its group's [p5, p95] band —
    the outlier treatment that keeps rows (unlike filtering) while
    bounding influence, standard before computing training statistics.

    Group percentiles are a tiny aggregate (one row per returnflag)
    broadcast back onto the fact scan: the fact table is never
    shuffled. Spark's exact interpolating percentile matches DuckDB
    QUANTILE_CONT (established by agg_percentile).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.05)).alias("lo"),
        F.percentile("l_quantity", F.lit(0.95)).alias("hi"),
    )
    return (
        li.join(F.broadcast(p), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.least(F.greatest(F.col("l_quantity"), F.col("lo")), F.col("hi")), 2
            ).alias("qty_winsorized"),
        )
    )


@register(
    "outlier_mad",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, MEDIAN(l_quantity) AS med
      FROM lineitem GROUP BY 1),
    d AS (
      SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
             l.l_quantity, m.med
      FROM lineitem l JOIN m USING (l_returnflag)),
    s AS (
      SELECT l_returnflag, MEDIAN(ABS(l_quantity - med)) AS mad
      FROM d GROUP BY 1)
    SELECT d.l_orderkey, d.l_linenumber,
           ROUND((d.l_quantity - d.med) / s.mad, 4) AS robust_z
    FROM d JOIN s USING (l_returnflag)
    WHERE ABS(ROUND((d.l_quantity - d.med) / s.mad, 4)) > 2.0
    """,
)
def outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers via median absolute deviation: |x − median| /
    MAD > 2 within each group. Unlike z-scores, a contaminated tail
    cannot drag the threshold (median and MAD have 50% breakdown).

    Two tiny per-group aggregates (median, then MAD) each broadcast
    onto the fact scan; the filter compares the ROUNDED score (§5.3).
    Spark MEDIAN == DuckDB MEDIAN (both exact interpolating).
    """
    li = load_table(spark, sf_dir, "lineitem")
    # lazy pin (r15): the MAD aggregate and the final score join each
    # re-derived the group-median subtree (an extra fact scan per
    # consumer); the pinned relation is |groups| rows. The two
    # remaining fact passes (median, then MAD of residuals) are the
    # algorithm's dependent order statistics — inherent.
    m = li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med")
    ).localCheckpoint(eager=False)
    d = li.join(F.broadcast(m), "l_returnflag").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "med"
    )
    s = d.groupBy("l_returnflag").agg(
        F.median(F.abs(F.col("l_quantity") - F.col("med"))).alias("mad")
    )
    z = F.round((F.col("l_quantity") - F.col("med")) / F.col("mad"), 4)
    return (
        d.join(F.broadcast(s), "l_returnflag")
        .select("l_orderkey", "l_linenumber", z.alias("robust_z"))
        .filter(F.abs(F.col("robust_z")) > 2.0)
    )


@register(
    "ts_interpolate_linear",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    obs AS (SELECT * FROM d WHERE DAY(day) % 3 = 0),
    b AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY 1),
    cal AS (
      SELECT b.event_type,
             CAST(UNNEST(GENERATE_SERIES(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM b),
    j AS (
      SELECT cal.event_type, cal.day, obs.n
      FROM cal LEFT JOIN obs USING (event_type, day)),
    f AS (
      SELECT event_type, day, n,
        LAST_VALUE(n IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        FIRST_VALUE(n IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j)
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           n IS NOT NULL AS is_observed,
           ROUND(CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
                 ELSE pv + (nv - pv) *
                      (CAST(DATEDIFF('day', pd, day) AS DOUBLE)
                       / DATEDIFF('day', pd, nd)) END, 4) AS value
    FROM f
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across time-series gaps — the numeric
    companion to ts_gap_fill's zero-fill: a sparse sensor-style series
    (only every observation day whose day-of-month % 3 == 0 is kept,
    so gaps exist by construction) is densified over the calendar and
    each missing day gets prev + (next-prev) * elapsed-fraction.

    One pass: calendar explode (bounded: types × days) left-joined to
    observations, then four IGNORE NULLS window fields (previous/next
    observed value and day) over the per-type day sort — a single
    window shuffle on event_type; the interpolation itself is
    map-side arithmetic. The same expression tree runs in both
    engines, so doubles match bit-for-bit (no aggregation-order
    drift: the formula is a scalar expression, not a float fold)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    obs = daily.filter(F.dayofmonth("day") % 3 == 0)
    cal = (
        obs.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("event_type", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    j = F.broadcast(cal).join(obs, ["event_type", "day"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("n").isNotNull(), F.col("day"))
    f = j.select(
        "event_type",
        "day",
        "n",
        F.last("n", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("n", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    frac = F.datediff("day", "pd").cast("double") / F.datediff("nd", "pd")
    value = F.when(
        F.col("n").isNotNull(), F.col("n").cast("double")
    ).otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    return f.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        F.col("n").isNotNull().alias("is_observed"),
        F.round(value, 4).alias("value"),
    )
