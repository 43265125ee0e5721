"""Relational surface extensions beyond the core SURVEY §2 inventory:
subquery forms (exercising Catalyst's decorrelation), pivot/unpivot
reshaping, deterministic sampling, ordered string aggregation.

These round out "a user of the reference could run every query they
run today" — the SQL-entry-point shapes (scalar/IN/EXISTS subqueries)
arrive via ``spark.sql`` so the engine demonstrably handles raw SQL
as well as the DataFrame DSL.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


def _temp_view(df: DataFrame, prefix: str) -> str:
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    df.createOrReplaceTempView(name)
    return name


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice / (SELECT AVG(o_totalprice) FROM orders), 6)
             AS price_ratio
    FROM orders WHERE o_orderkey < 2000
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # uncorrelated scalar subquery — Catalyst plans it as a one-row
    # broadcast, evaluated once regardless of outer cardinality
    v = _temp_view(load_table(spark, sf_dir, "orders"), "sq_orders")
    return spark.sql(
        f"""
        SELECT o_orderkey,
               ROUND(o_totalprice / (SELECT AVG(o_totalprice) FROM {v}), 6)
                 AS price_ratio
        FROM {v} WHERE o_orderkey < 2000
        """
    )


@register(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IN-subquery → left-semi join after Catalyst rewrite (same plan as
    # join_semi; declared at the SQL surface to prove the entry point)
    ov = _temp_view(load_table(spark, sf_dir, "orders"), "sq_in_orders")
    cv = _temp_view(load_table(spark, sf_dir, "customer"), "sq_in_cust")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM {ov}
        WHERE o_custkey IN (SELECT c_custkey FROM {cv} WHERE c_acctbal > 9000.0)
        """
    )


@register(
    "subquery_exists_correlated",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > c.c_acctbal * 20.0)
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    # correlated EXISTS with a cross-table predicate — Catalyst
    # decorrelates into a semi join with a non-trivial condition
    ov = _temp_view(load_table(spark, sf_dir, "orders"), "sq_ex_orders")
    cv = _temp_view(load_table(spark, sf_dir, "customer"), "sq_ex_cust")
    return spark.sql(
        f"""
        SELECT c_custkey, c_name, c_acctbal
        FROM {cv} c
        WHERE EXISTS (SELECT 1 FROM {ov} o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT'
                        AND o.o_totalprice > c.c_acctbal * 20.0)
        """
    )


@register(
    "pivot_wide",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pivot with an explicit value list — at scale the list must be
    # provided (inference would scan once just to find the columns)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_F"),
            F.col("O").alias("qty_O"),
        )
    )


@register(
    "unpivot_long",
    oracle="""
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS metric_value
    FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS metric_value
    FROM part
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").withColumn(
        "size_d", F.col("p_size").cast("double")
    ).withColumnRenamed("p_retailprice", "retailprice").withColumnRenamed(
        "size_d", "size"
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )


@register(
    "sample_systematic",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 20 = 7
    """,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic 5% systematic sample keyed on the primary key —
    # cross-engine reproducible, unlike TABLESAMPLE/rand(); at scale
    # this is also partition-prunable when the table is bucketed by key
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 20 == 7).select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "string_agg_sorted",
    oracle="""
    SELECT c_nationkey,
           STRING_AGG(c_name, '|' ORDER BY c_name) AS member_names
    FROM customer WHERE c_custkey < 300
    GROUP BY c_nationkey
    """,
)
def string_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordered string aggregation — canonical sorted join so the value
    # is deterministic under any partitioning
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return cust.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("member_names")
    )


@register(
    "merge_upsert",
    oracle="""
    WITH updates AS (
        -- +100.0 and *0.5 are exact in IEEE double arithmetic, so the
        -- merged values are bit-identical across engines with no rounding
        SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000 AS o_orderkey,
               o_totalprice * 0.5 AS o_totalprice
        FROM orders WHERE o_orderkey % 1000 = 0
    )
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
           CASE WHEN b.o_orderkey IS NULL THEN 'inserted'
                WHEN u.o_orderkey IS NULL THEN 'unchanged'
                ELSE 'updated' END AS merge_action
    FROM orders b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (SCD1 upsert) semantics in pure DataFrame ops: a batch of
    updates + inserts applied to a base table via full outer join and
    column-wise COALESCE preferring the update side.

    This is the batch-maintenance primitive behind every warehouse
    MERGE INTO; without a transactional table format it is exactly a
    key-partitioned full outer join — one shuffle on the merge key for
    each side, update side usually far smaller (AQE broadcasts it).
    The update/insert sets here derive deterministically from the base
    so the oracle can rebuild them.
    """
    base = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = (
        base.filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", (F.col("o_totalprice") + 100.0).alias("o_totalprice"))
        .unionByName(
            base.filter(F.col("o_orderkey") % 1000 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                (F.col("o_totalprice") * 0.5).alias("o_totalprice"),
            )
        )
    )
    b = base.alias("b")
    u = updates.alias("u")
    return b.join(u, F.col("b.o_orderkey") == F.col("u.o_orderkey"), "full").select(
        F.coalesce(F.col("u.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("u.o_totalprice"), F.col("b.o_totalprice")).alias(
            "o_totalprice"
        ),
        F.when(F.col("b.o_orderkey").isNull(), "inserted")
        .when(F.col("u.o_orderkey").isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_action"),
    )


@register(
    "scd2_history",
    oracle="""
    SELECT user_id, value AS purchase_value, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS version
    FROM events WHERE event_type = 'purchase'
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history derivation: each
    user's purchase stream becomes versioned rows with
    [valid_from, valid_to) intervals — valid_to NULL marks the current
    version. One shuffle on user_id; lead + row_number share the sort.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.col("value").alias("purchase_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
    )


@register(
    "join_lateral_topk",
    oracle="""
    SELECT n.n_name, c.c_custkey, ROUND(c.c_acctbal, 2) AS c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) c
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: the top-2
    customers per nation, expressed at the SQL surface the way a
    reference user would write it.

    Catalyst decorrelates the lateral into a window (rank ≤ k) over a
    single shuffle — same physical shape as topk_per_group — so the
    SQL convenience costs nothing at scale.
    """
    nv = _temp_view(load_table(spark, sf_dir, "nation"), "lat_nation")
    cv = _temp_view(load_table(spark, sf_dir, "customer"), "lat_cust")
    return spark.sql(
        f"""
        SELECT n.n_name, c.c_custkey, ROUND(c.c_acctbal, 2) AS c_acctbal
        FROM {nv} n, LATERAL (
          SELECT c_custkey, c_acctbal FROM {cv}
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) c
        """
    )


_SQL_API_QUERY = """
    WITH cust AS (
      SELECT c_custkey, n_regionkey
      FROM customer JOIN nation ON c_nationkey = n_nationkey)
    SELECT r_name,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    JOIN cust   ON o_custkey = c_custkey
    JOIN region ON cust.n_regionkey = r_regionkey
    GROUP BY r_name
"""


@register("sql_api_query", oracle=_SQL_API_QUERY)
def sql_api_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() entry point: tables registered as temp views,
    the query submitted as ANSI SQL text (identical to the oracle
    string — one source of truth). Same Catalyst plan as the DataFrame
    form; declared so users coming from a SQL-first tool can see the
    engine's SQL front door is first-class."""
    for t in ("customer", "nation", "orders", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_API_QUERY)
