"""Merge-on-read deletes (storage/snapshots.py delete_where_mor /
materialize_deletes) — the Iceberg-v2 deletion-vector contract:

* a MoR delete commits O(matched keys) bytes and rewrites NO data file;
* reads at every entry point (read / pruned / point-lookup / staged /
  branch / CDF) honor the vectors, scoped strictly per file;
* a later rewrite of a scoped file MATERIALIZES its vectors, and a
  re-inserted key is never suppressed by a stale vector;
* maintenance folds all vectors back into plain files;
* vacuum treats active delete files as live and sweeps orphaned ones.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.storage import SnapshotTable


def _mk(spark, tmp_path, n=1000, n_files=8):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id")
    df = spark.range(n).select(F.col("id"), (F.col("id") * 2.0).alias("val"))
    t.create(df, n_files=n_files)
    return t


def _ids(t, version=None):
    return {r["id"] for r in t.read(version).select("id").collect()}


def test_mor_delete_rewrites_no_data_file(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1_files = {f["path"] for f in t._read_manifest(1)["files"]}
    t.delete_where_mor("id % 100 = 7")
    m2 = t._read_manifest(2)
    assert {f["path"] for f in m2["files"]} == v1_files, "no data file rewritten"
    assert len(m2["deletes"]) == 1
    d = m2["deletes"][0]
    assert d["n_keys"] == 10
    got = _ids(t)
    assert len(got) == 990 and 7 not in got and 107 not in got and 8 in got
    # snapshot isolation: v1 still sees every row
    assert len(_ids(t, 1)) == 1000


def test_mor_vector_scoping_is_per_file(spark, tmp_path):
    # the vector's applies_to is the stats-pruned candidate set, a
    # strict subset of the table on a narrow key range
    t = _mk(spark, tmp_path)
    t.delete_where_mor("id = 3")
    m = t._read_manifest(2)
    [d] = m["deletes"]
    assert len(d["applies_to"]) == 1, "narrow delete scopes to one file"
    assert 3 not in _ids(t) and len(_ids(t)) == 999


def test_mor_deleted_key_reinsert_is_visible(spark, tmp_path):
    # re-insert after a MoR delete: the new row lives in a file outside
    # the old vector's scope and must NOT be suppressed
    t = _mk(spark, tmp_path)
    t.delete_where_mor("id = 42")
    assert 42 not in _ids(t)
    t.merge_upsert(spark.createDataFrame([(42, -42.0)], "id long, val double"))
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[42] == -42.0 and len(got) == 1000


def test_rewrite_materializes_vectors(spark, tmp_path):
    # a COW merge touching a vectored file must apply the vector to its
    # base read (no resurrection) and drop the file from applies_to
    t = _mk(spark, tmp_path)
    t.delete_where_mor("id = 3")  # same file range as id=5
    t.merge_upsert(spark.createDataFrame([(5, -5.0)], "id long, val double"))
    m3 = t._read_manifest(3)
    scoped = {p for d in m3["deletes"] for p in d["applies_to"]}
    v3_paths = {f["path"] for f in m3["files"]}
    assert scoped <= v3_paths  # invariant: vectors only scope live files
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert 3 not in got and got[5] == -5.0 and len(got) == 999


def test_cow_delete_on_vectored_file_does_not_resurrect(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_mor("id = 10")
    t.delete_where("id = 11")  # same file; rewrite applies the vector
    got = _ids(t)
    assert 10 not in got and 11 not in got and len(got) == 998


def test_materialize_deletes_folds_vectors_away(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_mor("id % 100 = 7")
    untouched_before = {
        f["path"]
        for f in t._read_manifest(2)["files"]
        if f["path"]
        not in {p for d in t._read_manifest(2)["deletes"] for p in d["applies_to"]}
    }
    v = t.materialize_deletes()
    m = t._read_manifest(v)
    assert m["deletes"] == []
    assert untouched_before <= {f["path"] for f in m["files"]}
    assert len(_ids(t)) == 990 and 7 not in _ids(t)
    # idle maintenance is a true no-op
    assert t.materialize_deletes() == v


def test_pruned_and_point_reads_honor_vectors(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), key="id", bloom_cols=("tag",)
    )
    df = spark.range(400).select(
        F.col("id"),
        (F.col("id") * 2.0).alias("val"),
        F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias("tag"),
    )
    t.create(df, n_files=4)
    t.delete_where_mor("id >= 100 AND id < 110")
    pr = {r["id"] for r in t.read_pruned(90, 120).collect()}
    assert pr == set(range(90, 100)) | set(range(110, 121))
    pv = {r["id"] for r in t.read_pruned_on("val", 190.0, 230.0).collect()}
    assert pv == {95, 96, 97, 98, 99} | set(range(110, 116))
    pl = {r["id"] for r in t.read_point_lookup("tag", "t3").collect()}
    assert 101 not in pl and 108 not in pl and 3 in pl


def test_cdf_surfaces_mor_deletes_and_cancels_unchanged(spark, tmp_path):
    t = _mk(spark, tmp_path, n=200, n_files=2)
    t.delete_where_mor("id = 50")
    feed = t.changes(1, 2).collect()
    assert {(r["id"], r["change_type"]) for r in feed} == {(50, "delete")}
    # a later plain merge over the other file: CDF between 2 and 3 must
    # not re-surface the MoR delete
    t.merge_upsert(spark.createDataFrame([(150, 0.5)], "id long, val double"))
    feed2 = {(r["id"], r["change_type"]) for r in t.changes(2, 3).collect()}
    assert (50, "delete") not in feed2
    assert (150, "update_postimage") in feed2


def test_branch_and_staged_reads_honor_vectors(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_mor("id = 9")
    b = t.create_branch("dev")
    assert 9 not in {r["id"] for r in b.read().collect()}
    sid = t.stage_merge(
        spark.createDataFrame([(1, -1.0)], "id long, val double"), "aud1"
    )
    staged = {r["id"]: r["val"] for r in t.read_staged(sid).collect()}
    assert 9 not in staged and staged[1] == -1.0
    v = t.publish_staged(sid)
    assert 9 not in _ids(t, v)


def test_rollback_carries_vectors(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_mor("id = 9")  # v2
    t.merge_upsert(
        spark.createDataFrame([(500, 0.0)], "id long, val double")
    )  # v3
    v = t.rollback(2)
    assert 9 not in _ids(t, v) and len(_ids(t, v)) == 999


def test_vacuum_keeps_active_delete_files_and_sweeps_orphans(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_mor("id = 7")  # v2: delete file is live
    [d] = t._read_manifest(2)["deletes"]
    t.vacuum(retain_last=2)
    assert os.path.exists(d["path"])
    assert 7 not in _ids(t)
    # materialize (v3) then advance (v4): the vector file goes orphan
    # once every manifest referencing it expires
    t.materialize_deletes()
    t.merge_upsert(spark.createDataFrame([(1, 0.0)], "id long, val double"))
    t.vacuum(retain_last=2)
    assert not os.path.exists(d["path"])
    assert 7 not in _ids(t)


def test_mor_delete_matching_nothing_still_commits(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100)
    v = t.delete_where_mor("id > 100000")
    assert v == 2
    assert t._read_manifest(2)["deletes"] == []
    assert len(_ids(t)) == 100


def test_mor_write_amplification_is_o_keys(spark, tmp_path):
    # the headline: bytes committed by a 1-key MoR delete are the tiny
    # key file, while COW rewrites the whole containing data file
    t = _mk(spark, tmp_path, n=10000, n_files=4)
    t.delete_where_mor("id = 1234")
    m = t._read_manifest(2)
    [d] = m["deletes"]
    delete_bytes = os.path.getsize(d["path"])
    data_bytes = min(os.path.getsize(f["path"]) for f in m["files"])
    assert delete_bytes < data_bytes / 5, (
        f"MoR delete wrote {delete_bytes}B vs smallest data file {data_bytes}B"
    )


def test_stacked_vectors_on_one_file_compose(spark, tmp_path):
    # two MoR deletes whose vectors both scope the same data file: the
    # read must apply their UNION, and a later materialization folds
    # both away at once
    t = _mk(spark, tmp_path)
    t.delete_where_mor("id = 3")
    t.delete_where_mor("id = 5")  # same 0-124 range file
    m = t._read_manifest(3)
    assert len(m["deletes"]) == 2
    got = _ids(t)
    assert 3 not in got and 5 not in got and len(got) == 998
    v = t.materialize_deletes()
    assert t._read_manifest(v)["deletes"] == []
    assert len(_ids(t)) == 998


def test_mor_upsert_rewrites_no_file_and_replaces_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1_files = {f["path"] for f in t._read_manifest(1)["files"]}
    batch = spark.createDataFrame(
        [(3, -3.0), (5000, 1.5)], "id long, val double"
    )
    t.merge_upsert_mor(batch)
    m2 = t._read_manifest(2)
    assert v1_files <= {f["path"] for f in m2["files"]}, "no v1 file rewritten"
    assert len(m2["files"]) == len(v1_files) + 1  # one append file
    assert len(m2["deletes"]) == 1
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[3] == -3.0 and got[5000] == 1.5 and len(got) == 1001
    assert got[4] == 8.0  # untouched row intact


def test_mor_upsert_tombstones_delete_without_appending(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100)
    batch = spark.createDataFrame(
        [(1, 9.9, False), (2, None, True)],
        "id long, val double, _del boolean",
    )
    t.merge_upsert_mor(batch, tombstone_col="_del")
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[1] == 9.9 and 2 not in got and len(got) == 99
    assert "_del" not in t.read().columns


def test_repeated_mor_upserts_compose_last_writer_wins(spark, tmp_path):
    t = _mk(spark, tmp_path, n=200, n_files=2)
    for i, v in enumerate([10.0, 20.0, 30.0]):
        t.merge_upsert_mor(
            spark.createDataFrame([(7, v)], "id long, val double")
        )
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[7] == 30.0 and len(got) == 200
    # a later vector scopes the earlier APPEND file too (it carries
    # key stats like any entry), so stale copies are suppressed
    v = t.materialize_deletes()
    assert t._read_manifest(v)["deletes"] == []
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[7] == 30.0 and len(got) == 200
