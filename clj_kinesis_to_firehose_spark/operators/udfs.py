"""UDF / UDAF / UDTF surface (SURVEY.md §2 K1-K5).

These exist to prove the extension surface, with the standard scale
caveats baked in: K1 is the row-at-a-time form (demonstrated on a
filtered slice — it is the slow path and documented as such); K2-K4
are Arrow-batched pandas forms (the 100 TB-appropriate Python escape
hatch); K5 is the table-function form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "udf_python",
    oracle="""
    SELECT event_id,
           CASE WHEN LENGTH(props) >= 10 THEN 'large'
                WHEN LENGTH(props) >= 9 THEN 'medium'
                ELSE 'small' END AS payload_class
    FROM events WHERE event_id < 2000
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    # row-scalar Python UDF (payload-size classifier). Deliberately the
    # slow path — per-row Python round trips — kept on a bounded slice;
    # the same logic as a SQL CASE so the oracle is exact.
    @F.udf(returnType=StringType())
    def classify(props: str) -> str:
        n = len(props)
        if n >= 10:
            return "large"
        if n >= 9:
            return "medium"
        return "small"

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select("event_id", classify("props").alias("payload_class"))


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id,
           ROUND(LN(value + 1.0) * 100.0, 6) AS value_score
    FROM events
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # vectorized Arrow-batched scalar UDF: numpy evaluates whole
    # columns per batch — the correct shape for Python math at scale
    import numpy as np

    @F.pandas_udf(DoubleType())
    def value_score(v: pd.Series) -> pd.Series:
        return pd.Series(np.round(np.log(v.to_numpy() + 1.0) * 100.0, 6))

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", value_score("value").alias("value_score"))


@register(
    "udaf_grouped_agg",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value * CAST(user_id + 1 AS DOUBLE))
                 / SUM(CAST(user_id + 1 AS DOUBLE)), 6) AS weighted_mean_value
    FROM events GROUP BY event_type
    """,
)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # grouped-aggregate pandas UDF (weighted mean). numpy dot keeps the
    # whole group vectorized; Spark plans partial aggregation around it
    import numpy as np

    @F.pandas_udf(DoubleType())
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        wv = w.to_numpy()
        return float(np.round(np.dot(v.to_numpy(), wv) / wv.sum(), 6))

    ev = load_table(spark, sf_dir, "events").withColumn(
        "weight", (F.col("user_id") + 1).cast("double")
    )
    return ev.groupBy("event_type").agg(
        weighted_mean("value", "weight").alias("weighted_mean_value")
    )


_ZSCORE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("zscore", DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # per-group normalization; ddof=1 matches SQL STDDEV_SAMP
    v = pdf["value"]
    sd = v.std(ddof=1)
    z = (v - v.mean()) / sd if sd > 0 else v * 0.0
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "zscore": z.round(6),
        }
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                 / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 6) AS zscore
    FROM events
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    # applyInPandas grouped-map: whole group as one pandas frame per
    # call — shuffle on the group key, then embarrassingly parallel
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").applyInPandas(_zscore_group, _ZSCORE_SCHEMA)


@register(
    "udtf_python",
    oracle="""
    SELECT doc_id,
           UNNEST(STRING_SPLIT(text, ' ')) AS token,
           CAST(GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS BIGINT) AS pos
    FROM documents WHERE doc_id < 60
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one output row per token with its 1-based position.

    Implemented with mapInPandas (Arrow-batched row expansion) rather
    than the lateral-join @udtf form so the fan-out stays vectorized
    per batch; semantics are identical to a table function applied per
    input row.
    """
    out_schema = "doc_id long, token string, pos long"

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            lens = toks.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(lens).astype("int64"),
                    "token": [t for row in toks for t in row],
                    "pos": [p + 1 for row in toks for p in range(len(row))],
                }
            )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return docs.select("doc_id", "text").mapInPandas(tokenize, schema=out_schema)


_COGROUP_SCHEMA = (
    "c_custkey long, c_acctbal double, n_orders long, "
    "total_spent double, max_order double"
)


def _customer_order_stats(key, cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
    if cust.empty:
        return pd.DataFrame(
            columns=["c_custkey", "c_acctbal", "n_orders", "total_spent", "max_order"]
        )
    return pd.DataFrame(
        [
            {
                "c_custkey": key[0],
                "c_acctbal": float(cust["c_acctbal"].iloc[0]),
                "n_orders": len(orders),
                # raw sums here; the deterministic HALF_UP rounding is
                # applied JVM-side after the cogroup (python round() is
                # half-even and would diverge from SQL ROUND)
                "total_spent": float(orders["o_totalprice"].sum()) if len(orders) else 0.0,
                "max_order": float(orders["o_totalprice"].max()) if len(orders) else 0.0,
            }
        ]
    )


@register(
    "udf_cogrouped_map",
    oracle="""
    SELECT c_custkey, c_acctbal,
           COUNT(o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0.0), 2) AS total_spent,
           ROUND(COALESCE(MAX(o_totalprice), 0.0), 2) AS max_order
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_acctbal
    """,
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas UDF (K surface): customer and orders are
    co-partitioned on the customer key, and each (customer-group,
    order-group) pair arrives as two aligned pandas frames over Arrow.
    The per-pair python is arbitrary (here: order-book stats); the
    cogroup itself is one shuffle of each side on the key — the same
    cost as the equivalent join+agg, with full imperative freedom
    inside the group."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    out = (
        customer.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(_customer_order_stats, schema=_COGROUP_SCHEMA)
    )
    return out.select(
        "c_custkey",
        "c_acctbal",
        "n_orders",
        F.round("total_spent", 2).alias("total_spent"),
        F.round("max_order", 2).alias("max_order"),
    )
