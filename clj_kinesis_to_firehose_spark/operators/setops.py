"""Set operators (SURVEY.md §2 G1-G4).

Spark's set ops match ANSI bag/set semantics directly: unionByName =
UNION ALL, union+distinct = UNION, intersect = INTERSECT (distinct),
exceptAll = EXCEPT ALL. Distinct variants shuffle on the full row —
fine for the projected narrow columns used here; at scale prefer the
bag forms plus explicit aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


def _high_balance(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000.0)
        .select("c_nationkey", "c_mktsegment")
    )


def _building_segment(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_nationkey", "c_mktsegment")
    )


_HIGH_SQL = "SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 7000.0"
_BUILDING_SQL = (
    "SELECT c_nationkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'"
)


@register("set_union_all", oracle=f"{_HIGH_SQL} UNION ALL {_BUILDING_SQL}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_balance(spark, sf_dir).unionByName(_building_segment(spark, sf_dir))


@register("set_union_distinct", oracle=f"{_HIGH_SQL} UNION {_BUILDING_SQL}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _high_balance(spark, sf_dir).union(_building_segment(spark, sf_dir)).distinct()
    )


@register("set_intersect", oracle=f"{_HIGH_SQL} INTERSECT {_BUILDING_SQL}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_balance(spark, sf_dir).intersect(_building_segment(spark, sf_dir))


@register("set_except", oracle=f"{_HIGH_SQL} EXCEPT ALL {_BUILDING_SQL}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_balance(spark, sf_dir).exceptAll(_building_segment(spark, sf_dir))


@register(
    "set_union_by_name",
    oracle="""
    SELECT k, bal, seg, price FROM (
      SELECT c_custkey AS k, c_acctbal AS bal, c_mktsegment AS seg
      FROM customer
      UNION ALL BY NAME
      SELECT o_custkey AS k, o_totalprice AS price
      FROM orders)
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolved bag union: two projections with partially
    overlapping columns unioned BY NAME, missing columns null-filled
    (unionByName allowMissingColumns ↔ UNION ALL BY NAME). Pure
    narrow concat — no shuffle."""
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_totalprice").alias("price"),
    )
    return customer.unionByName(orders, allowMissingColumns=True).select(
        "k", "bal", "seg", "price"
    )


@register(
    "set_intersect_except_all",
    oracle="""
    SELECT 'intersect_all' AS op, l_returnflag, l_linestatus, COUNT(*) AS n
    FROM (
      SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 45
      INTERSECT ALL
      SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_discount > 0.05)
    GROUP BY l_returnflag, l_linestatus
    UNION ALL
    SELECT 'except_all' AS op, l_returnflag, l_linestatus, COUNT(*) AS n
    FROM (
      SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 45
      EXCEPT ALL
      SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_discount > 0.05)
    GROUP BY l_returnflag, l_linestatus
    """,
)
def set_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicity
    min() and difference over duplicate rows, vs the distinct forms in
    set_intersect/set_except. Spark plans both as an aggregate of
    per-side counts — one shuffle on the row value, no join."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 45).select("l_returnflag", "l_linestatus")
    b = li.filter(F.col("l_discount") > 0.05).select("l_returnflag", "l_linestatus")
    inter = (
        a.intersectAll(b)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "l_returnflag", "l_linestatus", "n")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "l_returnflag", "l_linestatus", "n")
    )
    return inter.unionByName(exc)
