"""Partition-spec evolution (storage/snapshots.py
evolve_partition_spec / append / read_partition_pruned) — the Iceberg
partition-evolution contract [PK]:

* evolving the spec is metadata-only: no data file is rewritten and
  every parent manifest segment carries by reference;
* appends after evolution land with exact per-file partition values,
  so equality reads prune STRING columns driver-side (numeric zone
  maps never could);
* pre-evolution files are read conservatively and the residual filter
  keeps every answer exact across the mixed layout;
* MoR delete vectors compose with spec evolution at read time.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.storage import SnapshotTable


def _mk_evolved(spark, tmp_path, n=1200):
    """id-keyed table: even ids unpartitioned (spec 0), then evolve to
    partition on the 3-value string ``grp`` and append the odd ids."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id")
    df = spark.range(n).select(
        "id",
        (F.col("id") * 2.0).alias("val"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
    )
    t.create(df.filter(F.col("id") % 2 == 0), n_files=4)
    t.evolve_partition_spec(["grp"])
    t.append(df.filter(F.col("id") % 2 == 1), n_files=2)
    return t, df


def test_evolve_append_read_is_exact(spark, tmp_path):
    t, df = _mk_evolved(spark, tmp_path)
    assert t.read().count() == df.count()
    got = {
        (r["id"], r["val"], r["grp"])
        for r in t.read_partition_pruned({"grp": "g1"}).collect()
    }
    exp = {
        (r["id"], r["val"], r["grp"])
        for r in df.filter(F.col("grp") == "g1").collect()
    }
    assert got == exp


def test_evolution_commit_is_metadata_only(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id")
    t.create(
        spark.range(500).select("id", (F.col("id") % 5).cast("string").alias("g")),
        n_files=4,
    )
    before = t._read_manifest(None)
    v = t.evolve_partition_spec(["g"])
    after = t._read_manifest(v)
    # same data files, untouched paths, and every parent segment
    # carried by reference (no re-serialization)
    assert [f["path"] for f in after["files"]] == [
        f["path"] for f in before["files"]
    ]
    assert {s["path"] for s in after["segments"]} == {
        s["path"] for s in before["segments"]
    }
    assert after["default_spec_id"] == 1
    assert t.current_spec()["cols"] == ["g"]


def test_new_spec_files_prune_old_files_conservative(spark, tmp_path):
    t, df = _mk_evolved(spark, tmp_path)
    m = t._read_manifest(None)
    old = [f for f in m["files"] if f.get("partition") is None]
    new = [f for f in m["files"] if f.get("partition") is not None]
    assert old and new
    # every new-spec file records exactly the evolved column
    assert all(set(f["partition"]) == {"grp"} for f in new)
    opened = t.partition_files_matching({"grp": "g1"})
    matching_new = sum(1 for f in new if f["partition"]["grp"] == "g1")
    # conservative on old files + exact on new files, nothing else
    assert opened == len(old) + matching_new
    assert opened < len(m["files"])


def test_spec_lineage_survives_later_commits(spark, tmp_path):
    t, df = _mk_evolved(spark, tmp_path)
    # an unrelated COW delete must carry specs and per-file lineage
    t.delete_where("id = 2")
    assert t.current_spec()["cols"] == ["grp"]
    m = t._read_manifest(None)
    assert any(f.get("partition") is not None for f in m["files"])
    got = {r["id"] for r in t.read_partition_pruned({"grp": "g2"}).collect()}
    exp = {
        r["id"]
        for r in df.filter((F.col("grp") == "g2") & (F.col("id") != 2)).collect()
    }
    assert got == exp


def test_mor_delete_composes_with_partition_read(spark, tmp_path):
    t, df = _mk_evolved(spark, tmp_path)
    t.delete_where_mor("grp = 'g0' AND id < 100")
    got = {r["id"] for r in t.read_partition_pruned({"grp": "g0"}).collect()}
    exp = {
        r["id"]
        for r in df.filter((F.col("grp") == "g0") & (F.col("id") >= 100)).collect()
    }
    assert got == exp


def test_partitioned_files_self_contained(spark, tmp_path):
    """partitionBy drops the writer column, so the layout duplicates
    it — every appended parquet file must still hold the ORIGINAL
    partition column for explicit-path reads."""
    t, _ = _mk_evolved(spark, tmp_path, n=300)
    m = t._read_manifest(None)
    new = [f for f in m["files"] if f.get("partition") is not None]
    df = t.spark.read.parquet(new[0]["path"])
    assert "grp" in df.columns
    vals = {r["grp"] for r in df.select("grp").distinct().collect()}
    assert vals == {new[0]["partition"]["grp"]}
