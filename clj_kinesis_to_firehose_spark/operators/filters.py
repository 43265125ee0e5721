"""Projection / filter / predicate operators (SURVEY.md §2 B1-B6).

All predicates are plain Catalyst expressions so they push down to the
parquet scan (``PushedFilters`` in the physical plan) — at 100 TB these
filters run inside the vectorized reader against row-group statistics,
not in a post-scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "project_select",
    oracle="""
    SELECT p_partkey, p_name AS part_name,
           ROUND(p_retailprice * 1.1, 2) AS uplifted_price
    FROM part
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_name").alias("part_name"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("uplifted_price"),
    )


@register(
    "filter_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity > 30.0 AND l_discount <= 0.05
      AND NOT (l_returnflag = 'A' OR l_linestatus != 'F')
    """,
)
def filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30.0)
        & (F.col("l_discount") <= 0.05)
        & ~((F.col("l_returnflag") == "A") | (F.col("l_linestatus") != "F"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register(
    "filter_in_between",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 50000.0 AND 150000.0
    """,
)
def filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000.0, 150000.0)
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@register(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE 'small%' OR p_name LIKE '%bolt%'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").like("small%") | F.col("p_name").like("%bolt%")
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "filter_null_safe",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           (o.o_orderkey IS NULL) AS no_big_order,
           (c.c_mktsegment IS NOT DISTINCT FROM o.o_orderpriority) AS odd_eq
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
      ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey IS NULL OR o.o_totalprice IS NOT NULL
    """,
)
def filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixtures carry no NULLs (FIXTURES.md) — the outer join manufactures
    # them; exercises isNull / isNotNull / null-safe equality on the result
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
    return joined.filter(
        F.col("o_orderkey").isNull() | F.col("o_totalprice").isNotNull()
    ).select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.col("o_orderkey").isNull().alias("no_big_order"),
        F.col("c_mktsegment").eqNullSafe(F.col("o_orderpriority")).alias("odd_eq"),
    )


@register(
    "project_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_day,
           CAST(ROUND(o_totalprice, 0) AS BIGINT) AS price_rounded
    FROM orders
    WHERE o_totalprice < 150000.0
    """,
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # decimal and date casts are stringified on both sides so the value
    # hash compares canonical text, not engine-specific physical types.
    # double→int differs across engines (Spark truncates, DuckDB rounds),
    # so the long cast goes through an explicit half-up round on our side.
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") < 150000.0)
    return orders.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_day"),
        F.round("o_totalprice", 0).cast("long").alias("price_rounded"),
    )
