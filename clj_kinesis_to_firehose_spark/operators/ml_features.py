"""Feature-engineering operators for ML training pipelines: leave-one-
out target encoding, the feature-hashing trick, deterministic global
shuffle order, inverse-frequency class weights, and a lateral top-n
join.

These are the transformations that sit between a curated corpus and a
training run. All are exact-oracle-checked: categorical encodings sum
in DECIMAL (order-independent), hash features use md5 (standardized
across engines, same parity trick as sample_hash_split), and the
shuffle order is a rank over a hash — reproducible on any cluster,
which is precisely why hash-order shuffling beats RNG shuffling for
training reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "feature_target_encode_loo",
    oracle="""
    WITH g AS (
      SELECT event_type,
             SUM(CAST(value AS DECIMAL(18,4))) AS s,
             COUNT(*) AS n
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           CAST(ROUND((g.s - CAST(e.value AS DECIMAL(18,4)))
                      / (g.n - 1), 6) AS DOUBLE) AS te_loo
    FROM events e JOIN g ON e.event_type = g.event_type
    WHERE g.n > 1
    """,
)
def feature_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each event's categorical
    `event_type` becomes the mean `value` of all OTHER events of that
    type — the standard leakage-free encoding for gradient-boosted /
    linear models. Computed as (group_sum - own_value) / (n - 1) from
    a per-category rollup joined back, never a per-row window over the
    raw fact: the rollup is |categories| rows and broadcasts, so the
    fact is scanned once and nothing reshuffles at 100 TB. Sums run in
    DECIMAL; only the final division is rounded (6 dp both engines)."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(F.col("event_type").alias("g_type")).agg(
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
        F.count("*").alias("n"),
    )
    return (
        ev.join(F.broadcast(g), ev.event_type == F.col("g_type"))
        .filter(F.col("n") > 1)
        .select(
            "event_id",
            "event_type",
            F.round(
                (F.col("s") - F.col("value").cast("decimal(18,4)"))
                / (F.col("n") - 1),
                6,
            )
            .cast("double")
            .alias("te_loo"),
        )
    )


@register(
    "feature_hashing_sparse",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(('0x' || SUBSTR(MD5(token), 1, 8)) AS UBIGINT) % 1024
             AS feature,
           COUNT(*) AS weight
    FROM tok
    GROUP BY doc_id, feature
    """,
)
def feature_hashing_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: tokens map to a fixed 1024-dim feature space
    via md5, emitting sparse (doc, feature, weight) triples — the
    vocabulary-free vectorizer for corpus-scale linear models. No
    dictionary build, no broadcast vocabulary, no OOV handling: the
    feature id is a pure function of the token, so the mapping is
    identical on every executor, engine, and rerun. One explode + one
    hash-agg on (doc_id, feature); output is bounded by tokens, and
    the doc_id filter prunes at the scan (probe subset keeps the
    oracle compact — the full-corpus form is the same plan)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    feature = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long") % 1024
    )
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", feature.alias("feature"))
        .agg(F.count("*").alias("weight"))
    )


@register(
    "corpus_shuffle_order",
    oracle="""
    SELECT doc_id,
           ROW_NUMBER() OVER (
             ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS shuffle_pos
    FROM documents
    """,
)
def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: rank
    documents by md5(doc_id). Statistically indistinguishable from a
    random permutation, but reproducible across engines, clusters,
    partitionings, and restarts — an interrupted training run can
    resume mid-epoch at an exact position, which RNG shuffles cannot
    guarantee. The global rank is a sort on a 16-byte key + tiny
    tiebreak; at 100 TB the same ordering is realized as a range-
    partitioned sort (Spark's orderBy already is one) and consumed
    partition-sequentially, never collected."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return docs.select("doc_id", F.row_number().over(w).alias("shuffle_pos"))


@register(
    "class_weight_balance",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    t AS (SELECT SUM(n) AS total, COUNT(*) AS k FROM c)
    SELECT lang, n AS n_docs,
           CAST(ROUND(CAST(total AS DECIMAL(18,6))
                      / (CAST(k AS DECIMAL(18,6)) * n), 6) AS DOUBLE)
             AS class_weight
    FROM c, t
    """,
)
def class_weight_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's 'balanced' formula:
    total / (k * n_class)) per language — the loss-reweighting table
    for training on an imbalanced corpus. Two tiny aggregates (one
    per-class, one 1-row total) and a broadcast; the corpus itself is
    touched once. All inputs are exact integers; the single division
    is performed in DECIMAL and rounded identically in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("total"), F.count("*").alias("k"))
    return c.join(F.broadcast(t)).select(
        "lang",
        F.col("n").alias("n_docs"),
        F.round(
            F.col("total").cast("decimal(18,6)")
            / (F.col("k").cast("decimal(18,6)") * F.col("n")),
            6,
        )
        .cast("double")
        .alias("class_weight"),
    )


@register(
    "join_lateral_topn",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer,
    LATERAL (SELECT o_orderkey, o_totalprice
             FROM orders
             WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 2) best
    WHERE c_nationkey = 3
    """,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each nation-3 customer paired with
    their top-2 orders by price. Spark SQL supports LATERAL natively
    (4.x), but a per-customer correlated limit would execute as a
    nested loop — so the engine form is the decorrelated equivalent:
    semi-filtered orders → row_number window partitioned by o_custkey
    → rank ≤ 2 → join back to the pruned customer dim. The customer
    side is Θ(sf) (a 1/25 nation slice), so it carries NO broadcast
    hint — the planner/AQE broadcasts it while it fits and shuffles
    past the threshold. One shuffle on o_custkey regardless of data
    size; ties broken by o_orderkey so the top-2 SET is deterministic
    (§5.3)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 3)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    top2 = (
        orders.join(
            cust.select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_semi",
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
    )
    return top2.join(
        cust, top2.o_custkey == cust.c_custkey
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "feature_point_in_time_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT p.value FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.ts <= e.ts
            ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS feat_last_purchase,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.ts <= e.ts) AS feat_purchase_version
    FROM events e WHERE e.event_type = 'click'
    """,
)
def feature_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join: each training example (a
    click) is annotated with the feature version that was VALID AT THE
    EXAMPLE'S TIMESTAMP — the last purchase value at-or-before the
    click, plus the SCD2-style version counter — never a later one.
    This is the feature-store join that prevents label leakage; a
    plain latest-value join silently trains on the future.

    Plan shape: the union-tag as-of machinery (one shuffle on user_id,
    one window sort shared by the carried value AND the running
    version count) — NOT the per-row correlated subquery the oracle
    uses; Spark executes the whole dimension lookup as a single
    linear pass per user partition, which is the shape that holds at
    100 TB of training examples."""
    events = load_table(spark, sf_dir, "events")
    probe = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(0).alias("is_build"),
        F.lit(None).cast("double").alias("pvalue"),
    )
    build = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("is_build"),
        F.col("value").alias("pvalue"),
    )
    # at-or-before: build rows sort BEFORE probes at equal ts (desc on
    # is_build), so a same-instant purchase is visible to the click
    tagged = probe.unionByName(build)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_build"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "is_build",
        F.last("pvalue", ignorenulls=True).over(w).alias("feat_last_purchase"),
        F.sum("is_build").over(w).cast("long").alias("feat_purchase_version"),
    )
    return carried.filter(F.col("is_build") == 0).select(
        "event_id", "user_id", "ts", "feat_last_purchase", "feat_purchase_version"
    )
