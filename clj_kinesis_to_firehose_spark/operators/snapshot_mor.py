"""Registered queries for MERGE-ON-READ deletes on the snapshot table
layer (storage/snapshots.py delete_where_mor / materialize_deletes) —
the Iceberg-v2 deletion-vector pattern [PK]: a delete commits a small
key-only DELETE FILE scoped to the data files that may hold the
matched keys, readers anti-join the vector against exactly those
files, and maintenance folds vectors back into plain files.

Each op's oracle recomputes the POST-OPERATION TABLE STATE in DuckDB
from the base fixture (the snapshot_ops.py discipline) — the driver's
hash check therefore proves the vectors suppress exactly the deleted
rows at read time, that a rewrite materializes rather than resurrects,
and that a re-inserted key escapes its stale vector's scope.

Scale story (SCALE.md has the measured numbers): a 1-row delete in a
1 GB file costs ~1 GB under copy-on-write and ~a few KB under MoR;
the read-side price is one broadcast-sized anti-join per vectored
file group, retired by the next maintenance pass.

This module registers LAST (registry._OPERATOR_MODULES) so the r08
driver window adjudicates the standing backlog before these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.operators.snapshot_ops import (
    _MERGED_SQL,
    _merged_table,
)
from clj_kinesis_to_firehose_spark.registry import register


@register(
    "snapshot_delete_mor", executes_on_build=True,
    oracle=f"""
    WITH {_MERGED_SQL}
    SELECT o_orderkey, o_totalprice FROM merged
    WHERE NOT (o_totalprice < 50000.0)
    """,
)
def snapshot_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE WHERE, merge-on-read: the same post-delete table state as
    snapshot_delete_where (same oracle — byte-equal answers are the
    point), but the commit writes a key-only delete file instead of
    rewriting every matching data file. The checked output is the
    table read back THROUGH the vectors."""
    t = _merged_table(spark, sf_dir, "delete_mor")
    t.delete_where_mor("o_totalprice < 50000.0")
    return t.read()


@register(
    "snapshot_mor_materialize", executes_on_build=True,
    oracle=f"""
    WITH {_MERGED_SQL}
    SELECT o_orderkey, o_totalprice FROM merged
    WHERE NOT (o_totalprice < 50000.0)
    """,
)
def snapshot_mor_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoR maintenance roundtrip: vector-delete, then fold the vectors
    back into plain data files (materialize_deletes rewrites ONLY the
    vectored files; clean files carry by reference) — the table state
    must be unchanged by materialization, and the committed version
    must carry zero vectors (asserted here; the oracle checks the
    state)."""
    t = _merged_table(spark, sf_dir, "mor_materialize")
    t.delete_where_mor("o_totalprice < 50000.0")
    v = t.materialize_deletes()
    if t._read_manifest(v)["deletes"]:  # explicit: holds under -O too
        raise AssertionError("materialize_deletes left active vectors")
    return t.read()


@register(
    "snapshot_mor_reinsert", executes_on_build=True,
    oracle=f"""
    WITH {_MERGED_SQL}
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 40 = 0 AND o_totalprice < 50000.0
                THEN -1.0 ELSE o_totalprice END AS o_totalprice
    FROM merged
    WHERE NOT (o_totalprice < 50000.0)
       OR o_orderkey % 40 = 0
    """,
)
def snapshot_mor_reinsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stale-vector trap: MoR-delete the cheap rows, then re-insert
    a deterministic subset of the DELETED keys (every 40th) with a
    sentinel price via a normal merge. The re-inserted rows live in
    the merge's new files — outside every vector's ``applies_to`` —
    so they must be visible even though their keys sit in an active
    delete file. Oracle: merged state minus the deletes, plus the
    re-inserted keys at the sentinel (a deleted-and-reinserted key's
    price is -1.0; an every-40th key that was never deleted keeps its
    merged price)."""
    t = _merged_table(spark, sf_dir, "mor_reinsert")
    t.delete_where_mor("o_totalprice < 50000.0")
    reinsert = (
        t.read(2)  # merged pre-delete state: derive the deleted subset
        .filter(
            (F.col("o_orderkey") % 40 == 0)
            & (F.col("o_totalprice") < 50000.0)
        )
        .select("o_orderkey", F.lit(-1.0).alias("o_totalprice"))
    )
    t.merge_upsert(reinsert)
    return t.read()


@register(
    "snapshot_mor_changes_feed", executes_on_build=True,
    oracle=f"""
    WITH {_MERGED_SQL}
    SELECT o_orderkey, o_totalprice, 'delete' AS change_type
    FROM merged WHERE o_totalprice < 50000.0
    """,
)
def snapshot_mor_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed across a merge-on-read delete: the commit
    touches NO data file (only a vector landed), yet the CDF between
    the versions must surface exactly the vectored rows as deletes
    with their pre-image values — the carried-file-visibility case
    the file-diff shortcut alone would miss (changes() folds files
    whose APPLICABLE VECTOR SET changed into both diff sides, so
    unchanged rows cancel and newly-vectored rows surface). Oracle:
    the merged rows the predicate matched, labeled 'delete'."""
    t = _merged_table(spark, sf_dir, "mor_changes_feed")
    v2 = t.latest_version()
    v3 = t.delete_where_mor("o_totalprice < 50000.0")
    return t.changes(v2, v3).select(
        "o_orderkey", "o_totalprice", "change_type"
    )


@register(
    "snapshot_merge_upsert_mor", executes_on_build=True,
    oracle=f"""
    WITH {_MERGED_SQL}
    SELECT o_orderkey, o_totalprice FROM merged
    """,
)
def snapshot_merge_upsert_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row MERGE, merge-on-read: the SAME post-merge table state
    as snapshot_merge_upsert (same oracle, same deterministic batch —
    the fixture's updates carry complete rows, where blind replace and
    COW merge coincide by construction), but committed as one delete
    vector over the update keys plus one append file: no data file
    read or rewritten, commit cost O(batch). The Kinesis-CDC
    "latest full record wins" write path at high churn."""
    from clj_kinesis_to_firehose_spark.operators.snapshot_ops import (
        _base_orders,
        _updates,
    )
    from clj_kinesis_to_firehose_spark.storage import SnapshotTable
    from clj_kinesis_to_firehose_spark.storage.snapshots import fresh_table_dir

    t = SnapshotTable(
        spark, fresh_table_dir(sf_dir, "merge_upsert_mor", spark),
        key="o_orderkey",
    )
    base = _base_orders(spark, sf_dir)
    t.create(base, n_files=8)
    t.merge_upsert_mor(_updates(base))
    return t.read()
