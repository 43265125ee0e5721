"""Event-analytics and corpus operators, batch 2: interval-concurrency
sweep-line, marketing attribution, exact heavy hitters, degree-oriented
triangle counting, and stratified deterministic sampling.

Each operator states its 100 TB shuffle story in the docstring; the
common themes are (a) integer/decimal arithmetic wherever a threshold
or hash feeds the oracle compare (no float drift), (b) aggregates
before joins so only reduced relations shuffle, and (c) the classic
scale rewrites — two-pass running sums instead of one global window,
degree orientation instead of raw wedge enumeration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table

#: active-interval TTL for the concurrency sweep-line (seconds)
ACTIVE_TTL_S = 300


@register(
    "concurrent_active_peak",
    oracle="""
    WITH endpoints AS (
      SELECT ts AS t, 1 AS delta, event_id AS eid FROM events
      UNION ALL
      SELECT ts + INTERVAL 300 SECOND, -1, event_id FROM events
    ), rs AS (
      SELECT DATE_TRUNC('hour', t) AS hr,
             SUM(delta) OVER (ORDER BY t, delta, eid
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS conc
      FROM endpoints
    )
    SELECT hr, CAST(MAX(conc) AS BIGINT) AS peak_active FROM rs GROUP BY hr
    """,
)
def concurrent_active_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity per hour via an interval sweep-line:
    each event opens an active interval [ts, ts+300s); +1/-1 endpoint
    deltas, running sum, max per hour.

    The oracle uses one global running sum; a single unpartitioned
    window does not scale, so the engine computes the identical result
    in two passes: (1) within-hour running sums (shuffle keyed on the
    hour bucket), (2) a cumulative offset over the per-hour delta
    totals — thousands of rows at any data size, evaluated in one tiny
    window. peak(h) = offset(<h) + max(within-hour running sum), which
    equals the global form because the global order (t, delta, eid) is
    hour-contiguous. Tie policy: delta ascending closes intervals
    before opening new ones at the same instant, identical both
    engines. All-integer arithmetic — nothing to round.
    """
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        F.col("ts").alias("t"), F.lit(1).alias("delta"), F.col("event_id").alias("eid")
    )
    ends = ev.select(
        (F.col("ts") + F.expr(f"INTERVAL {ACTIVE_TTL_S} SECONDS")).alias("t"),
        F.lit(-1).alias("delta"),
        F.col("event_id").alias("eid"),
    )
    endpoints = starts.unionByName(ends).withColumn("hr", F.date_trunc("hour", "t"))
    within = Window.partitionBy("hr").orderBy("t", "delta", "eid").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = endpoints.withColumn("rs_within", F.sum("delta").over(within))
    # ONE pass over the endpoint stream (r15, guide §2.4): the hour's
    # delta total IS the running sum at the hour's LAST ordering
    # position (the window frame covers the whole hour by its end), so
    # max_by over the same (t, delta, eid) ordering key reads it from
    # the ranked relation the peak aggregate already consumes — the
    # separate groupBy that re-derived the scan→union→endpoints
    # pipeline (2 extra fact scans in the plan) is gone, and the
    # groupBy reuses the window's hash(hr) partitioning (no second
    # exchange).
    per_hour = ranked.groupBy("hr").agg(
        F.max("rs_within").alias("peak_within"),
        F.max_by("rs_within", F.struct("t", "delta", "eid")).alias("hr_delta"),
    )
    offset_w = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, -1)
    return per_hour.select(
        "hr",
        "peak_within",
        F.coalesce(F.sum("hr_delta").over(offset_w), F.lit(0)).alias("offset"),
    ).select("hr", (F.col("offset") + F.col("peak_within")).alias("peak_active"))


@register(
    "attribution_last_touch",
    oracle="""
    WITH touched AS (
      SELECT event_type, value,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT COALESCE(touch, 'organic') AS touch_channel,
           COUNT(*) AS n_purchases,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS attributed_value
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY COALESCE(touch, 'organic')
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent strictly-prior non-purchase event type; purchases with no
    prior touch are 'organic'. Revenue sums run in DECIMAL so partial
    aggregation order cannot drift the hash.

    One shuffle on user_id for the window (high-cardinality, evenly
    distributed), then a 5-row channel rollup. The strictly-prior
    frame (UNBOUNDED PRECEDING .. 1 PRECEDING with last+ignorenulls)
    is the same mechanism as the as-of join (joins.py::join_asof) —
    attribution IS an as-of join collapsed into a window."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("organic")).alias("touch_channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("attributed_value"),
        )
    )


@register(
    "heavy_hitters_exact",
    oracle="""
    WITH tok AS (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ), counts AS (
      SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
    ), total AS (
      SELECT SUM(cnt) AS n FROM counts
    )
    SELECT token, cnt
    FROM counts, total
    WHERE cnt * 1000 > n
    """,
)
def heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: tokens whose corpus frequency exceeds
    1/1000 of all tokens (the exact answer a Misra-Gries / count-min
    pass approximates). The threshold compare is pure integer
    arithmetic (cnt * 1000 > total) — no division, no float, no
    rounding discipline needed.

    Scale shape: explode → one hash-agg shuffle on token (map-side
    partials absorb the Zipf head), then a broadcast of the 1-row
    total. The token dictionary, not the corpus, is what shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("n"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * 1000 > F.col("n"))
        .select("token", "cnt")
    )


@register(
    "graph_triangle_count", executes_on_build=True,
    oracle="""
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges
      ) GROUP BY node
    ), oriented AS (
      SELECT CASE WHEN (da.d, e.pa) < (db.d, e.pb) THEN e.pa ELSE e.pb END AS src,
             CASE WHEN (da.d, e.pa) < (db.d, e.pb) THEN e.pb ELSE e.pa END AS dst
      FROM edges e
      JOIN deg da ON e.pa = da.node
      JOIN deg db ON e.pb = db.node
    )
    SELECT COUNT(*) AS n_triangles
    FROM oriented o1
    JOIN oriented o2 ON o1.src = o2.src AND o1.dst < o2.dst
    JOIN edges t ON t.pa = o1.dst AND t.pb = o2.dst
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the part co-purchase graph (edge = two parts
    in one order), using degree orientation: every edge points from
    its (degree, key)-smaller endpoint, so each triangle is counted
    exactly once at its lowest-ordered vertex AND wedge enumeration is
    bounded by sum(out_deg²) = O(m·sqrt(m)) instead of sum(deg²) —
    the difference between feasible and not on a skewed graph at
    100 TB (a celebrity node's wedges never materialize).

    Shuffles: pair-distinct on l_orderkey, degree agg, wedge self-join
    on src, and the closing edge hash-join — all equi-joins on
    well-distributed keys; no nested loop anywhere."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    # r16 (guide §2.4, same-session A/B 1.9 → 0.85 s on the edge
    # build): the merge hint makes both self-join sides require the
    # identical hashpartitioning(l_orderkey) exchange over the same
    # scan, so runtime reuse computes it once — the
    # basket_copurchase_pairs rewrite applied to the edge enumeration.
    b = li.hint("merge").alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
        # edges feed degree counting, orientation, and triangle closing;
        # materialize once (the persisted edge list of a real graph
        # pipeline) instead of re-running the pair self-join per consumer
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionByName(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    da = deg.alias("da")
    db = deg.alias("db")
    e = edges.alias("e")
    lower_first = (F.col("da.d") < F.col("db.d")) | (
        (F.col("da.d") == F.col("db.d")) & (F.col("e.pa") < F.col("e.pb"))
    )
    oriented = (
        e.join(da, F.col("e.pa") == F.col("da.node"))
        .join(db, F.col("e.pb") == F.col("db.node"))
        .select(
            F.when(lower_first, F.col("e.pa")).otherwise(F.col("e.pb")).alias("src"),
            F.when(lower_first, F.col("e.pb")).otherwise(F.col("e.pa")).alias("dst"),
        )
        .localCheckpoint(eager=True)  # both wedge sides read this
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src")) & (F.col("o1.dst") < F.col("o2.dst")),
    ).select(F.col("o1.dst").alias("wa"), F.col("o2.dst").alias("wb"))
    # inner join, not semi: wedges sharing (wa, wb) are distinct
    # triangles (different apex) and must each count.
    # r16 (guide §3.1, interleaved A/B: SMJ 5.24/3.95 s, shuffled-hash
    # 2.32/2.17 s, broadcast 4.45/3.92 s): the wedge stream is the
    # Σout_deg² side — orders of magnitude larger than the edge list —
    # and SMJ's sort of it dominated the close. A shuffled-hash join
    # building on the EDGE side streams the wedges unsorted; the
    # edge-side per-partition hash table is |E|/P, the same memory
    # class as the sort buffers it replaces.
    closed = wedges.join(
        edges.hint("shuffle_hash"),
        (F.col("wa") == F.col("pa")) & (F.col("wb") == F.col("pb")),
    )
    return closed.agg(F.count("*").alias("n_triangles"))


@register(
    "sample_stratified_hash",
    oracle="""
    SELECT doc_id, lang
    FROM (SELECT doc_id, lang,
                 CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS UBIGINT) % 100 AS b
          FROM documents) t
    WHERE b < CASE WHEN lang = 'en' THEN 10 ELSE 25 END
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: 10% of English documents,
    25% of every other language (down-sample the dominant stratum,
    keep more of the tails — the corpus-mixture knob of a training
    pipeline). Membership is decided by md5(doc_id) bucket, so the
    sample is reproducible across engines, clusters, partitionings,
    and reruns, and new documents never reshuffle old members —
    unlike RNG sampling, which cannot be oracle-checked at all.

    Pure map-side filter on the scan: zero shuffles at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    rate = F.when(F.col("lang") == "en", 10).otherwise(25)
    return docs.filter(bucket < rate).select("doc_id", "lang")


@register(
    "event_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS hr, COUNT(*) AS n_events
      FROM events GROUP BY event_type, hr
    ), stats AS (
      SELECT event_type,
             AVG(n_events) AS mu,
             STDDEV_SAMP(n_events) AS sd
      FROM hourly GROUP BY event_type
    ), scored AS (
      SELECT h.event_type, hr, n_events,
             ROUND((n_events - mu) / sd, 4) AS z
      FROM hourly h JOIN stats s ON h.event_type = s.event_type
      WHERE sd > 0
    )
    SELECT event_type, hr, n_events, z,
           (z > 3.0 OR z < -3.0) AS is_anomaly
    FROM scored
    """,
)
def event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: z-score of each (event_type, hour)
    count against that type's own hourly distribution; |z| > 3 flags
    the anomaly. The monitoring query a pipeline operator runs over
    delivered event volumes to catch producer outages and floods.

    Two tiny aggregations over the hourly rollup (thousands of rows at
    any corpus size — the raw fact reduces in the first groupBy, which
    is the only full-data shuffle). The anomaly flag is derived from
    the ROUNDED z on both engines, so the boolean can only disagree
    where the hash would already disagree (§5.3: stats rounded 4 dp,
    same discipline as agg_stats)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n_events"))
    stats = hourly.groupBy(F.col("event_type").alias("s_type")).agg(
        F.avg("n_events").alias("mu"),
        F.stddev_samp("n_events").alias("sd"),
    )
    scored = (
        hourly.join(F.broadcast(stats), hourly.event_type == F.col("s_type"))
        .filter(F.col("sd") > 0)
        .withColumn("z", F.round((F.col("n_events") - F.col("mu")) / F.col("sd"), 4))
    )
    return scored.select(
        "event_type",
        "hr",
        "n_events",
        "z",
        ((F.col("z") > 3.0) | (F.col("z") < -3.0)).alias("is_anomaly"),
    )


@register(
    "basket_association_lift", executes_on_build=True,
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets
    ), item AS (
      SELECT l_partkey, COUNT(*) AS n_item FROM baskets GROUP BY l_partkey
    ), pair AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_pair
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY p1, p2
    )
    SELECT p1, p2, n_pair,
           CAST(ROUND(CAST(n_pair AS DECIMAL(18,9)) * n_orders
                      / (i1.n_item * i2.n_item), 6) AS DOUBLE) AS lift,
           CAST(ROUND(CAST(n_pair AS DECIMAL(18,9)) / i1.n_item, 6) AS DOUBLE)
             AS confidence
    FROM pair
    JOIN item i1 ON p1 = i1.l_partkey
    JOIN item i2 ON p2 = i2.l_partkey
    CROSS JOIN n
    WHERE n_pair >= 3
    ORDER BY lift DESC, p1, p2
    LIMIT 25
    """,
)
def basket_association_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: lift and confidence
    for part pairs with support ≥ 3 — the classic market-basket model
    (lift = P(a,b) / (P(a)·P(b))) on top of the co-purchase counts.

    Three aggregates off ONE distinct-basket rollup: item supports
    (|parts| rows — unhinted, planner-broadcast while it fits), pair
    supports (co-partitioned
    self-join on l_orderkey, the only basket-scale shuffle), and the
    1-row order count. Division happens once per surviving pair in
    DECIMAL and rounds at 6 dp on both engines; the support floor and
    top-k tie-break keep the result set deterministic (§5.3)."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        # four consumers (order count, item supports, both pair sides);
        # materialize the basket rollup once — at scale this is the
        # persisted distinct-basket table every rule pass reads
        .localCheckpoint(eager=True)
    )
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    item = baskets.groupBy(F.col("l_partkey").alias("ip")).agg(
        F.count("*").alias("n_item")
    )
    a = baskets.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p1"))
    b = baskets.select(F.col("l_orderkey").alias("k2"), F.col("l_partkey").alias("p2"))
    pair = (
        a.join(b, (F.col("k") == F.col("k2")) & (F.col("p1") < F.col("p2")))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    i1 = item.alias("i1")
    i2 = item.alias("i2")
    return (
        pair.join(i1, F.col("p1") == F.col("i1.ip"))
        .join(i2, F.col("p2") == F.col("i2.ip"))
        .join(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "n_pair",
            F.round(
                F.col("n_pair").cast("decimal(18,9)")
                * F.col("n_orders")
                / (F.col("i1.n_item") * F.col("i2.n_item")),
                6,
            )
            .cast("double")
            .alias("lift"),
            F.round(
                F.col("n_pair").cast("decimal(18,9)") / F.col("i1.n_item"), 6
            )
            .cast("double")
            .alias("confidence"),
        )
        .orderBy(F.desc("lift"), "p1", "p2")
        .limit(25)
    )


@register(
    "ts_resample_ohlc",
    oracle="""
    WITH w AS (
        SELECT user_id, DATE_TRUNC('hour', ts) AS bucket, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, DATE_TRUNC('hour', ts)
                   ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, DATE_TRUNC('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT user_id, bucket,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_ticks
    FROM w GROUP BY user_id, bucket
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (the classic tick→bar resample of every
    time-series store): per (series, hour bucket) the first/max/min/
    last value with (ts, event_id) as the deterministic tick order.
    Values pass through with NO arithmetic, so doubles hash exactly.

    Scale shape: the open/close row-number windows partition by the
    SAME keys the final groupBy uses, so Catalyst reuses one hash
    partitioning for both (single shuffle, ReusedExchange); high/low/
    count are ordinary partial-aggregated hash aggs on top. At 100 TB
    this is one pass over the tick stream per bar width."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "bucket", F.date_trunc("hour", "ts")
    )
    wa = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("user_id", "bucket")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count("*").alias("n_ticks"),
        )
    )
