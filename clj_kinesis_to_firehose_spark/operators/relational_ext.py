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
