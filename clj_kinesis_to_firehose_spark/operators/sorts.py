"""Sort / limit / top-k operators (SURVEY.md §2 F1-F3).

Scale notes: F1 compiles to TakeOrderedAndProject (per-partition
top-k + driver merge of k·partitions rows — never a global sort);
F3 is the per-group form via ranked windows (one shuffle on the
group key). F2 is the only true global sort and exists to exercise
multi-key null ordering semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "sort_limit_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # o_orderkey tiebreak makes the top-10 SET deterministic (the
    # driver's hash is order-insensitive, ties are what matter)
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10).select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )


@register(
    "sort_multi_nulls",
    oracle="""
    SELECT c_custkey, seg_nullable, sort_pos FROM (
        SELECT c_custkey,
               NULLIF(c_mktsegment, 'BUILDING') AS seg_nullable,
               ROW_NUMBER() OVER (ORDER BY NULLIF(c_mktsegment, 'BUILDING') DESC NULLS LAST,
                                  c_acctbal DESC, c_custkey) AS sort_pos
        FROM customer
    ) WHERE c_custkey < 600
    """,
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordering is value-checked by materializing the global position as
    # row_number (a plain ORDER BY would hash order-insensitively)
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "seg_nullable", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    )
    w = Window.orderBy(
        F.col("seg_nullable").desc_nulls_last(), F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        cust.select("c_custkey", "seg_nullable", F.row_number().over(w).alias("sort_pos"))
        .filter(F.col("c_custkey") < 600)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, price_rank FROM (
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_extendedprice DESC, l_linenumber) AS price_rank
        FROM lineitem
    ) WHERE price_rank <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
    )
