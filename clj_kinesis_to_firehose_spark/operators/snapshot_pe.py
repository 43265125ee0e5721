"""Partition-spec evolution over the snapshot table layer — the
Iceberg capability [PK] where a table's partitioning CHANGES without
rewriting history: old files keep their original layout, new files
land under the new spec, and one read plans across both.

Why it matters at 100 TB: repartitioning a petabyte table to chase a
query pattern is a full rewrite; spec evolution is a metadata-only
commit (O(0) data I/O — every parent manifest segment carries by
reference) and the read side prunes each file with the best metadata
THAT file has: exact partition values for new-spec files (works for
strings, where numeric zone maps are blind), min/max stats or a
conservative open for pre-evolution files, and a residual filter
keeping the answer exact either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table
from clj_kinesis_to_firehose_spark.storage import SnapshotTable
from clj_kinesis_to_firehose_spark.storage.snapshots import fresh_table_dir


@register(
    "snapshot_partition_evolution", executes_on_build=True,
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_price,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def snapshot_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle: create unpartitioned from the even order keys
    (spec 0) -> evolve the default spec to partition on
    ``o_orderstatus`` (metadata-only commit) -> append the odd keys,
    which land hive-partitioned with exact per-file partition values
    -> one equality read spans both layouts. The oracle recomputes
    the status slice from the base table, so the hash proves the
    mixed-spec read loses and invents nothing; the file-skip
    accounting is asserted in tests/test_partition_evolution.py."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    t = SnapshotTable(
        spark,
        fresh_table_dir(sf_dir, "partition_evolution", spark),
        key="o_orderkey",
    )
    t.create(orders.filter(F.col("o_orderkey") % 2 == 0), n_files=4)
    t.evolve_partition_spec(["o_orderstatus"])
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1), n_files=2)
    return t.read_partition_pruned({"o_orderstatus": "F"}).agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
