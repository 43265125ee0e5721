"""Snapshot table layer (storage/snapshots.py): the storage-contract
properties the registered queries can't show — stats-based file
pruning, optimistic-commit conflicts, old-version immutability,
compaction layout collapse."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.storage import CommitConflictError, SnapshotTable


def _mk(spark, tmp_path, n=1000, n_files=8):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id")
    df = spark.range(n).select(
        F.col("id"), (F.col("id") * 2.0).alias("val")
    )
    t.create(df, n_files=n_files)
    return t


def test_create_read_roundtrip(spark, tmp_path):
    t = _mk(spark, tmp_path)
    got = t.read().orderBy("id").collect()
    assert len(got) == 1000
    assert got[7]["val"] == 14.0
    assert t.history() == [
        {"version": 1, "op": "create", "n_files": 8, "n_rows": 1000}
    ]


def test_merge_prunes_untouched_files(spark, tmp_path):
    """A narrow-key-range update must rewrite ONE of the 8 range-
    clustered files; the other 7 entries carry over by path identity —
    the property that makes merge cost track the touched range, not
    the table size."""
    t = _mk(spark, tmp_path)
    v1_files = {f["path"] for f in t._read_manifest(1)["files"]}
    updates = spark.createDataFrame([(3, -1.0), (5, -2.0)], "id long, val double")
    t.merge_upsert(updates)
    v2 = t._read_manifest(2)["files"]
    carried = {f["path"] for f in v2} & v1_files
    assert len(carried) == 7, "narrow merge should carry 7 of 8 files untouched"
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[3] == -1.0 and got[5] == -2.0 and got[4] == 8.0
    assert len(got) == 1000


def test_merge_inserts_new_keys(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100)
    updates = spark.createDataFrame(
        [(50, 0.5), (5000, 1.5)], "id long, val double"
    )
    t.merge_upsert(updates)
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert len(got) == 101
    assert got[50] == 0.5 and got[5000] == 1.5


def test_time_travel_isolated_from_later_commits(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100)
    t.merge_upsert(spark.createDataFrame([(1, 9.9)], "id long, val double"))
    t.delete_where("id >= 90")
    v1 = {r["id"]: r["val"] for r in t.read(version=1).collect()}
    assert len(v1) == 100 and v1[1] == 2.0, "v1 must be bit-identical pre-merge"
    latest = {r["id"] for r in t.read().collect()}
    assert len(latest) == 90 and 95 not in latest


def test_delete_rewrites_only_matching_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1_files = {f["path"] for f in t._read_manifest(1)["files"]}
    # ids 0..124 live in the first range-clustered file only
    t.delete_where("id < 100")
    v2 = t._read_manifest(2)["files"]
    carried = {f["path"] for f in v2} & v1_files
    assert len(carried) == 7
    assert t.read().count() == 900


def test_delete_no_match_is_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1_files = {f["path"] for f in t._read_manifest(1)["files"]}
    t.delete_where("id > 999999")
    v2_files = {f["path"] for f in t._read_manifest(2)["files"]}
    assert v2_files == v1_files, "no-match delete must not rewrite any file"


def test_compact_collapses_files_and_preserves_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, n_files=8)
    t.compact(n_files=2)
    m = t._read_manifest(2)
    assert m["op"] == "compact" and len(m["files"]) == 2
    assert t.read().count() == 1000
    # old layout still fully readable
    assert t.read(version=1).count() == 1000
    assert len(t._read_manifest(1)["files"]) == 8


def test_commit_conflict_detected(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, n_files=1)
    # a concurrent writer publishes v2 first
    other = SnapshotTable(spark, t.path, key="id")
    other.compact(n_files=1)
    with pytest.raises(CommitConflictError):
        t._publish(2, {"version": 2, "op": "merge", "key": "id", "files": [],
                       "parent": 1})


def test_create_twice_refused(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, n_files=1)
    with pytest.raises(CommitConflictError):
        t.create(spark.range(5).select("id", F.lit(0.0).alias("val")))


def test_changes_feed_excludes_rewrite_copies(spark, tmp_path):
    """A merge rewriting a 125-row file for a 2-key update must feed
    exactly 2 changes — the 123 bit-identical rewrite copies cancel."""
    t = _mk(spark, tmp_path)
    updates = spark.createDataFrame(
        [(3, -1.0), (5000, 7.0)], "id long, val double"
    )
    t.merge_upsert(updates)
    ch = {(r["id"], r["change_type"]): r["val"] for r in t.changes(1, 2).collect()}
    assert ch == {(3, "update_postimage"): -1.0, (5000, "insert"): 7.0}


def test_changes_feed_tags_deletes_with_preimage(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, n_files=2)
    t.delete_where("id < 10")
    ch = t.changes(1, 2).collect()
    assert len(ch) == 10
    assert all(r["change_type"] == "delete" for r in ch)
    assert {r["id"] for r in ch} == set(range(10))
    assert {r["val"] for r in ch} == {float(2 * i) for i in range(10)}


def test_changes_feed_preimages_pair_with_postimages(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_upsert(
        spark.createDataFrame([(3, -1.0), (5000, 7.0)], "id long, val double")
    )
    ch = t.changes(1, 2, include_preimages=True).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["change_type"], {})[r["id"]] = r["val"]
    # the updated key emits BOTH images; the insert and the unchanged
    # rewrite copies emit none
    assert by_type["update_preimage"] == {3: 6.0}
    assert by_type["update_postimage"] == {3: -1.0}
    assert by_type["insert"] == {5000: 7.0}
    assert "delete" not in by_type


def test_changes_feed_spans_multiple_versions(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, n_files=2)
    t.merge_upsert(spark.createDataFrame([(1, 9.0)], "id long, val double"))
    t.merge_upsert(spark.createDataFrame([(1, 11.0)], "id long, val double"))
    ch = {r["change_type"]: r["val"] for r in t.changes(1, 3).collect()}
    # cumulative feed collapses to the net change with the final value
    assert ch == {"update_postimage": 11.0}


def test_rollback_is_metadata_only_and_preserves_history(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, n_files=2)
    v1_files = [f["path"] for f in t._read_manifest(1)["files"]]
    t.merge_upsert(spark.createDataFrame([(1, -5.0)], "id long, val double"))
    t.rollback(1)
    m3 = t._read_manifest(3)
    assert m3["op"] == "rollback"
    assert [f["path"] for f in m3["files"]] == v1_files, "rollback = v1 file list"
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[1] == 2.0 and len(got) == 100
    # bad version stays inspectable
    assert t._read_manifest(2)["op"] == "merge"
    assert {r["id"]: r["val"] for r in t.read(version=2).collect()}[1] == -5.0


def test_schema_evolution_nulls_untouched_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, n_files=2)
    t.merge_upsert(
        spark.createDataFrame([(1, 9.0, "gold")], "id long, val double, tier string")
    )
    rows = {r["id"]: (r["val"], r["tier"]) for r in t.read().collect()}
    assert rows[1] == (9.0, "gold")
    assert rows[2] == (4.0, None), "old rows read the new column as null"
    assert len(rows) == 100
    # a later merge WITHOUT the new column must not erase it
    t.merge_upsert(spark.createDataFrame([(1, 10.0)], "id long, val double"))
    rows = {r["id"]: (r["val"], r["tier"]) for r in t.read().collect()}
    assert rows[1] == (10.0, "gold"), "missing-column merge preserves prior value"


def test_merge_retry_survives_concurrent_writer(spark, tmp_path):
    """Two writers, one table: writer B lands a commit between writer
    A's read and publish; A's retry must re-plan against B's version so
    BOTH changes survive."""
    t = _mk(spark, tmp_path, n=100, n_files=2)
    a = SnapshotTable(spark, t.path, key="id")

    # simulate the interleave: A's first publish loses because B commits
    # version 2 first
    original_publish = a._publish
    interleaved = {"done": False}

    def racing_publish(version, manifest):
        if not interleaved["done"]:
            interleaved["done"] = True
            other = SnapshotTable(spark, t.path, key="id")
            other.merge_upsert(
                spark.createDataFrame([(7, 70.0)], "id long, val double")
            )
        return original_publish(version, manifest)

    a._publish = racing_publish
    a.merge_upsert_with_retry(
        spark.createDataFrame([(3, 30.0)], "id long, val double")
    )
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[7] == 70.0, "concurrent writer's change lost"
    assert got[3] == 30.0, "retrying writer's change lost"
    assert len(got) == 100


def test_merge_retry_gives_up_after_max(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, n_files=1)
    a = SnapshotTable(spark, t.path, key="id")

    def always_conflict(version, manifest):
        raise CommitConflictError("simulated contention")

    a._publish = always_conflict
    with pytest.raises(CommitConflictError):
        a.merge_upsert_with_retry(
            spark.createDataFrame([(1, 1.0)], "id long, val double"),
            max_retries=2,
        )


def test_vacuum_removes_expired_and_orphans_keeps_live(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, n_files=2)
    t.merge_upsert(spark.createDataFrame([(1, 9.0)], "id long, val double"))
    t.compact(n_files=1)  # v3; v1's replaced files now expired
    # plant an orphan (losing optimistic-commit attempt's data file)
    orphan = os.path.join(t.path, "data", "commit-000099")
    os.makedirs(orphan)
    spark.range(5).coalesce(1).write.mode("overwrite").parquet(orphan)

    stats = t.vacuum(retain_last=2)
    assert stats["removed_files"] > 0
    assert stats["retained_versions"] == [2, 3]
    # latest + retained versions still fully readable
    assert t.read().count() == 100
    assert t.read(version=2).count() == 100
    # expired version gone, physically and from history
    with pytest.raises(FileNotFoundError):
        t.read(version=1)
    assert [h["version"] for h in t.history()] == [2, 3]
    assert not os.path.exists(orphan)


def test_vacuum_spares_staged_snapshots(spark, tmp_path):
    """A vacuum racing a write-audit-publish must not delete the
    staged (not-yet-committed) data files — they're live roots."""
    t = _mk(spark, tmp_path, n=100, n_files=2)
    t.stage_merge(
        spark.createDataFrame([(1, 9.0)], "id long, val double"), staged_id="s1"
    )
    t.merge_upsert(spark.createDataFrame([(2, 7.0)], "id long, val double"))
    t.compact(n_files=1)
    t.vacuum(retain_last=1)
    # the staged snapshot survived the vacuum intact and fully readable
    staged = {r["id"]: r["val"] for r in t.read_staged("s1").collect()}
    assert staged[1] == 9.0 and len(staged) == 100


def test_vacuum_always_retains_latest(spark, tmp_path):
    t = _mk(spark, tmp_path, n=50, n_files=1)
    t.vacuum(retain_last=0)  # clamped to 1
    assert t.read().count() == 50


def test_read_pruned_skips_files(spark, tmp_path):
    t = _mk(spark, tmp_path)  # 1000 rows, 8 range-clustered files
    pruned = t.read_pruned(100, 200)
    opened = set(pruned.inputFiles())
    all_files = {f["path"] for f in t._read_manifest(1)["files"]}
    assert len(opened) < len(all_files), "zone-map pruning opened every file"
    assert len(opened) <= 2  # a 10% range on 8 range-clustered files
    got = sorted(r["id"] for r in pruned.collect())
    assert got == list(range(100, 201)), "residual filter must keep exactness"


def test_read_pruned_conservative_without_stats(spark, tmp_path):
    t = _mk(spark, tmp_path, n=50, n_files=1)
    m = t._read_manifest(1)
    m["files"][0]["min_key"] = None  # simulate a stats-less writer
    import json

    with open(t._manifest_path(1), "w") as fh:
        json.dump(m, fh)
    got = sorted(r["id"] for r in t.read_pruned(10, 20).collect())
    assert got == list(range(10, 21)), "stats-less file must still be read"


def test_bloom_lookup_skips_files_and_stays_exact(spark, tmp_path):
    # cat has 20 distinct values; each appears in ~all ranges of id, so
    # range clustering can't prune it — the bloom must
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id", bloom_cols=("cat",))
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 500).alias("cat"), (F.col("id") * 1.5).alias("val")
    )
    t.create(df, n_files=8)
    hit = t.read_point_lookup("cat", 123)
    got = sorted(r["id"] for r in hit.collect())
    assert got == [123, 623, 1123, 1623], "bloom pruning changed the answer"
    # 4 matching rows live in 4 of 8 range-clustered files; the bloom
    # (2000/8=250 values per file at m=16k) must rule out most others
    assert len(set(hit.inputFiles())) <= 6


def test_bloom_missing_value_reads_nothing_or_stays_exact(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id", bloom_cols=("cat",))
    df = spark.range(100).select("id", (F.col("id") % 10).alias("cat"))
    t.create(df, n_files=2)
    assert t.read_point_lookup("cat", 99).count() == 0


def test_bloom_survives_carry_through_merge(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id", bloom_cols=("cat",))
    df = spark.range(1000).select("id", (F.col("id") % 100).alias("cat"))
    t.create(df, n_files=8)
    t.merge_upsert(spark.createDataFrame([(3, 77)], "id long, cat long"))
    m = t._read_manifest(2)
    assert all(
        f.get("blooms", {}).get("cat") for f in m["files"]
    ), "carried or rewritten file lost its bloom"
    got = sorted(r["id"] for r in t.read_point_lookup("cat", 77).collect())
    assert 3 in got and 77 in got


def test_wap_staged_state_invisible_until_publish(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, n_files=2)
    t.stage_merge(
        spark.createDataFrame([(1, 9.0), (500, 5.0)], "id long, val double"),
        staged_id="s1",
    )
    # live table untouched while staged
    assert t.latest_version() == 1
    live = {r["id"]: r["val"] for r in t.read().collect()}
    assert live[1] == 2.0 and 500 not in live
    # staged state is the full merged table
    staged = {r["id"]: r["val"] for r in t.read_staged("s1").collect()}
    assert staged[1] == 9.0 and staged[500] == 5.0 and len(staged) == 101
    # publish promotes it metadata-only
    v = t.publish_staged("s1")
    assert v == 2
    now = {r["id"]: r["val"] for r in t.read().collect()}
    assert now == staged


def test_wap_discard_leaves_table_untouched(spark, tmp_path):
    t = _mk(spark, tmp_path, n=50, n_files=1)
    t.stage_merge(
        spark.createDataFrame([(1, -1.0)], "id long, val double"), staged_id="bad"
    )
    t.discard_staged("bad")
    assert t.latest_version() == 1
    assert {r["id"]: r["val"] for r in t.read().collect()}[1] == 2.0
    with pytest.raises(FileNotFoundError):
        t.read_staged("bad")


def test_wap_publish_refused_if_table_advanced(spark, tmp_path):
    t = _mk(spark, tmp_path, n=50, n_files=1)
    t.stage_merge(
        spark.createDataFrame([(1, 9.0)], "id long, val double"), staged_id="s1"
    )
    # concurrent commit moves the table past the staged parent
    t.merge_upsert(spark.createDataFrame([(2, 7.0)], "id long, val double"))
    with pytest.raises(CommitConflictError, match="re-stage"):
        t.publish_staged("s1")


def test_check_constraint_refuses_bad_batches(spark, tmp_path):
    from clj_kinesis_to_firehose_spark.storage.snapshots import (
        ConstraintViolationError,
    )

    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id", check="val >= 0")
    t.create(spark.range(10).select("id", (F.col("id") * 1.0).alias("val")))
    with pytest.raises(ConstraintViolationError, match="CHECK"):
        t.merge_upsert(spark.createDataFrame([(1, -3.0)], "id long, val double"))
    # the refused commit left no trace
    assert t.latest_version() == 1
    assert {r["id"]: r["val"] for r in t.read().collect()}[1] == 1.0
    # a clean batch still lands
    t.merge_upsert(spark.createDataFrame([(1, 3.0)], "id long, val double"))
    assert {r["id"]: r["val"] for r in t.read().collect()}[1] == 3.0


def test_null_key_always_refused(spark, tmp_path):
    from clj_kinesis_to_firehose_spark.storage.snapshots import (
        ConstraintViolationError,
    )

    t = _mk(spark, tmp_path, n=10, n_files=1)
    with pytest.raises(ConstraintViolationError, match="NOT NULL"):
        t.merge_upsert(
            spark.createDataFrame([(None, 1.0)], "id long, val double")
        )


def test_tombstone_rows_exempt_from_check(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id", check="val >= 0")
    t.create(spark.range(10).select("id", (F.col("id") * 1.0).alias("val")))
    # tombstone carries a null val — must not trip the CHECK
    batch = spark.createDataFrame(
        [(2, 5.0, False), (3, None, True)], "id long, val double, _del boolean"
    )
    t.merge_upsert(batch, tombstone_col="_del")
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[2] == 5.0 and 3 not in got


def test_data_files_immutable_across_commits(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, n_files=2)
    before = {
        f["path"]: os.path.getmtime(f["path"])
        for f in t._read_manifest(1)["files"]
    }
    t.merge_upsert(spark.createDataFrame([(1, 9.9)], "id long, val double"))
    t.compact(n_files=1)
    for p, mtime in before.items():
        assert os.path.exists(p) and os.path.getmtime(p) == mtime


def test_cdf_cancels_unchanged_rows_with_nulls(spark, tmp_path):
    """Rewritten-but-identical rows carrying NULLs must cancel in the
    change feed (null-SAFE row equality — plain `=` would surface
    every null-bearing carried row as a spurious update)."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="k")
    t.create(
        spark.createDataFrame(
            [(1, None), (2, "b"), (3, None)], "k long, v string"
        ),
        n_files=2,
    )
    t.merge_upsert(spark.createDataFrame([(2, "B")], "k long, v string"))
    feed = sorted(
        (r["k"], r["change_type"]) for r in t.changes(1, 2).collect()
    )
    assert feed == [(2, "update_postimage")]


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """A DELETE predicate that evaluates to NULL on a row (e.g. a NULL
    in a schema-evolved column) must NOT delete that row: only
    definitely-true matches go. Also exercises delete/changes reads
    across an add-column evolution boundary (mergeSchema)."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="k")
    t.create(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
        ),
        n_files=2,
    )
    t.merge_upsert(
        spark.createDataFrame([(2, "B", 99)], "k long, v string, score int")
    )
    t.delete_where("score > 50")
    assert sorted(r["k"] for r in t.read().collect()) == [1, 3, 4]
    feed = [(r["k"], r["change_type"]) for r in t.changes(1, 2).collect()]
    assert (2, "update_postimage") in feed
    # key 1 shares the rewritten file with key 2 but its row is
    # unchanged (null-filled new column) — it must not appear at all
    assert 1 not in [k for k, _ in feed]


def test_merge_explicit_null_update_lands(spark, tmp_path):
    """An update row that explicitly sets a column to NULL must null it
    out (SCD1 'update wins'), not silently keep the old value — the
    CDC shape `UPDATE ... SET val = NULL`."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id")
    t.create(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, val double")
    )
    t.merge_upsert(
        spark.createDataFrame([(1, None)], "id long, val double")
    )
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[1] is None and got[2] == 20.0


def test_tombstone_col_never_written_on_pure_insert_batch(spark, tmp_path):
    """A tombstone batch whose keys all fall OUTSIDE every file's key
    range (touched = empty) must still not leak the tombstone column
    into the table schema."""
    t = _mk(spark, tmp_path, n=100, n_files=2)  # keys 0..99
    batch = spark.createDataFrame(
        [(1000, 1.0, False), (2000, 2.0, False)],
        "id long, val double, _del boolean",
    )
    t.merge_upsert(batch, tombstone_col="_del")
    out = t.read()
    assert "_del" not in out.columns
    assert out.count() == 102


def test_losing_writer_cannot_clobber_winner_files(spark, tmp_path):
    """Adversarial commit race: writer B plans against parent N, writer
    A commits N+1 first, then B writes its data files and tries to
    commit — B must get CommitConflictError AND A's published files
    must survive B's write (per-attempt data directories)."""
    path = str(tmp_path / "tbl")
    a = SnapshotTable(spark, path, key="id")
    a.create(spark.createDataFrame([(i, float(i)) for i in range(50)],
                                   "id long, val double"), n_files=2)
    b = SnapshotTable(spark, path, key="id")
    # B plans its merge against parent=1
    b_parent, b_touched, b_carried, _b_deletes, b_merged = b._plan_cow_merge(
        spark.createDataFrame([(1, -1.0)], "id long, val double")
    )
    # A wins the race: commits version 2
    a.merge_upsert(spark.createDataFrame([(2, -2.0)], "id long, val double"))
    # B writes its files (stale parent) and must lose the publish
    b_files = b._write_data_files(b_merged, b_parent + 1, max(1, len(b_touched)))
    with pytest.raises(CommitConflictError):
        b._commit("merge", b_carried + b_files, b_parent)
    # A's version 2 is fully readable — B's overwrite touched nothing
    got = {r["id"]: r["val"] for r in a.read(version=2).collect()}
    assert got[2] == -2.0 and got[1] == 1.0 and len(got) == 50


def test_vacuum_on_empty_table_is_safe(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id")
    audit = t.vacuum(retain_last=2)
    assert audit["removed_manifests"] == 0 and audit["retained_versions"] == []


def test_wap_stage_merge_supports_tombstones(spark, tmp_path):
    """stage_merge shares the COW planner with merge_upsert, so WAP
    merges take tombstone deletes too."""
    t = _mk(spark, tmp_path, n=20, n_files=1)
    batch = spark.createDataFrame(
        [(1, 9.9, False), (2, None, True)], "id long, val double, _del boolean"
    )
    t.stage_merge(batch, staged_id="s1", tombstone_col="_del")
    staged = {r["id"]: r["val"] for r in t.read_staged("s1").collect()}
    assert staged[1] == 9.9 and 2 not in staged and "_del" not in t.read_staged("s1").columns
    t.publish_staged("s1")
    live = {r["id"]: r["val"] for r in t.read().collect()}
    assert live[1] == 9.9 and 2 not in live


def test_compact_small_leaves_big_files(spark, tmp_path):
    """OPTIMIZE semantics: only sub-threshold fragments are rewritten;
    right-sized files carry by path identity; totals are unchanged."""
    t = _mk(spark, tmp_path, n=1000, n_files=2)  # 2 big files (~500 rows)
    # two out-of-range insert batches each land as a tiny new file —
    # the steady-state fragmentation narrow merges produce
    t.merge_upsert(spark.createDataFrame([(5000, -1.0)], "id long, val double"))
    t.merge_upsert(spark.createDataFrame([(6000, -2.0)], "id long, val double"))
    before = t._read_manifest(t.latest_version())["files"]
    big_before = {f["path"] for f in before if f["rows"] >= 400}
    small_before = [f for f in before if f["rows"] < 400]
    assert big_before and len(small_before) >= 2
    t.compact_small(min_rows=400, n_files=1)
    after = t._read_manifest(t.latest_version())["files"]
    assert big_before <= {f["path"] for f in after}, "big files must carry"
    assert sum(f["rows"] for f in after) == 1002
    assert len(after) == len(big_before) + 1, "fragments fold into one file"
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[5000] == -1.0 and got[6000] == -2.0 and len(got) == 1002
    # fewer-than-two qualifying fragments → true no-op: no new version
    # (publishing an identical manifest would churn versions on every
    # maintenance pass and age real history out of count-based vacuum)
    files_now = {f["path"] for f in after}
    v_now = t.latest_version()
    assert t.compact_small(min_rows=1, n_files=1) == v_now
    assert t.latest_version() == v_now
    assert {f["path"] for f in t._read_manifest(t.latest_version())["files"]} == files_now


def test_tags_pin_versions_through_vacuum(spark, tmp_path):
    """A tagged version survives count-based vacuum (manifest + files);
    untagged expired versions are cleanly gone; tags are immutable."""
    t = _mk(spark, tmp_path, n=100, n_files=2)
    t.tag("audit")  # pins v1
    t.merge_upsert(spark.createDataFrame([(1, -1.0)], "id long, val double"))
    t.merge_upsert(spark.createDataFrame([(2, -2.0)], "id long, val double"))
    t.compact(n_files=1)  # v4
    audit = t.vacuum(retain_last=1)
    assert 1 in audit["retained_versions"] and 4 in audit["retained_versions"]
    # tagged v1 fully readable; untagged v2/v3 expired
    v1 = {r["id"]: r["val"] for r in t.read_tag("audit").collect()}
    assert len(v1) == 100 and v1[1] == 2.0
    assert not os.path.exists(t._manifest_path(2))
    assert not os.path.exists(t._manifest_path(3))
    assert t.tags() == {"audit": 1}
    with pytest.raises(CommitConflictError):
        t.tag("audit", 4)
    t.delete_tag("audit")
    assert t.tags() == {}


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """After cluster_zorder(key, val), a val-band read opens fewer
    files than the key-clustered layout (where val scatters across
    every file) AND key-range reads still prune."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id")
    df = spark.range(4000).select(
        "id", ((F.col("id") * 7919) % 1000).cast("double").alias("val")
    )
    t.create(df, n_files=8)  # key-clustered: val scatters everywhere
    before = t.files_overlapping("val", 100.0, 150.0)
    assert before == 8, "key clustering cannot prune a val band"
    t.cluster_zorder("val", n_files=8)
    after = t.files_overlapping("val", 100.0, 150.0)
    assert after < before, f"z-order must prune the val band ({after})"
    # key dimension still prunes on the z layout
    key_files = t.files_overlapping("id", 0, 400)
    assert key_files < 8, f"z-order must keep key pruning ({key_files})"
    # correctness: pruned read equals full-filter read
    got = sorted(
        r["id"] for r in t.read_pruned_on("val", 100.0, 150.0).collect()
    )
    want = sorted(r["id"] for r in df.filter("val BETWEEN 100 AND 150").collect())
    assert got == want


def test_latest_pointer_makes_discovery_o1(spark, tmp_path):
    """The _latest pointer (Delta _last_checkpoint analog) turns
    latest-version discovery into one read + one stat: after any
    commit the pointer is current, and read() never LISTS the manifest
    directory — at 10^5 commits the listing is the read-path
    bottleneck the layer otherwise avoids."""
    import json
    import os
    from unittest import mock

    t = _mk(spark, tmp_path)
    t.merge_upsert(spark.createDataFrame([(1, -1.0)], "id long, val double"))
    ptr = os.path.join(t._manifest_dir, "_latest")
    with open(ptr) as fh:
        assert json.load(fh)["version"] == t.latest_version() == 2

    real_listdir = os.listdir
    listed = []

    def spy(path="."):
        if os.path.abspath(str(path)) == os.path.abspath(t._manifest_dir):
            listed.append(path)
        return real_listdir(path)

    with mock.patch("os.listdir", side_effect=spy):
        assert t.read().count() == 1000
    assert not listed, "read() must not list the manifest directory"


def test_latest_pointer_lag_and_loss_are_safe(spark, tmp_path):
    """The pointer is a HINT: a lagging pointer (crashed writer) is
    healed by the forward probe, a missing pointer (pre-pointer table)
    falls back to the listing, and a stale-high pointer (manual
    manifest surgery) falls back rather than erroring."""
    import json
    import os

    t = _mk(spark, tmp_path)
    t.merge_upsert(spark.createDataFrame([(1, -1.0)], "id long, val double"))
    t.merge_upsert(spark.createDataFrame([(2, -2.0)], "id long, val double"))
    ptr = os.path.join(t._manifest_dir, "_latest")

    with open(ptr, "w") as fh:  # lag: points at v1, v2/v3 committed
        json.dump({"version": 1}, fh)
    assert t.latest_version() == 3

    os.unlink(ptr)  # loss: listing fallback
    assert t.latest_version() == 3

    with open(ptr, "w") as fh:  # stale-high: no such manifest
        json.dump({"version": 99}, fh)
    assert t.latest_version() == 3

    # next commit heals the pointer
    t.merge_upsert(spark.createDataFrame([(3, -3.0)], "id long, val double"))
    with open(ptr) as fh:
        assert json.load(fh)["version"] == 4


def test_latest_pointer_survives_vacuum_and_rollback(spark, tmp_path):
    import json
    import os

    t = _mk(spark, tmp_path)
    for i in range(4):
        t.merge_upsert(
            spark.createDataFrame([(i, float(-i))], "id long, val double")
        )
    t.rollback(2)
    t.vacuum(retain_last=2)
    ptr = os.path.join(t._manifest_dir, "_latest")
    with open(ptr) as fh:
        assert json.load(fh)["version"] == t.latest_version() == 6
    assert t.read().count() == 1000  # rollback target state, readable


def test_pointer_update_out_of_order_is_monotonic(spark, tmp_path):
    """Two optimistic writers: the slower one finishes its pointer
    update AFTER a later commit already advanced it — the stale update
    must not move the pointer backwards (readers would pay the probe
    but still resolve forward; the pointer itself should simply win
    monotonically)."""
    import json
    import os

    t = _mk(spark, tmp_path)
    t.merge_upsert(spark.createDataFrame([(1, -1.0)], "id long, val double"))  # v2
    t.merge_upsert(spark.createDataFrame([(2, -2.0)], "id long, val double"))  # v3
    ptr = os.path.join(t._manifest_dir, "_latest")
    with open(ptr) as fh:
        assert json.load(fh)["version"] == 3
    t._update_pointer(2)  # the slow writer's belated update
    with open(ptr) as fh:
        assert json.load(fh)["version"] == 3, "pointer must never move backwards"
    assert t.latest_version() == 3


def test_pointer_file_with_non_dict_json_falls_back(spark, tmp_path):
    """A _latest file holding non-dict JSON (foreign tool, manual
    surgery) must degrade to the listing fallback on read AND be
    overwritten by the next commit — not crash with TypeError."""
    import json
    import os

    t = _mk(spark, tmp_path)
    ptr = os.path.join(t._manifest_dir, "_latest")
    for garbage in ["5", "[5]", "null"]:
        with open(ptr, "w") as fh:
            fh.write(garbage)
        assert t.latest_version() == 1
    t.merge_upsert(spark.createDataFrame([(1, -1.0)], "id long, val double"))
    with open(ptr) as fh:
        assert json.load(fh)["version"] == 2


# ------------------------------------------------------------ branches


def _upd(spark, keys_mod=10, bump=1.0):
    return spark.range(1000).filter(F.col("id") % keys_mod == 0).select(
        F.col("id"), (F.col("id") * 2.0 + bump).alias("val")
    )


def test_branch_commits_isolated_from_main(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("audit")
    b.merge_upsert(_upd(spark))
    b.merge_upsert(_upd(spark, keys_mod=7, bump=2.0))
    # main frozen at v1, branch advanced to v3 (seed + 2 merges)
    assert t.latest_version() == 1
    assert b.latest_version() == 3
    assert t.read().filter("id = 10").collect()[0]["val"] == 20.0
    assert b.read().filter("id = 10").collect()[0]["val"] == 21.0


def test_fast_forward_lands_branch_state_on_main(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("audit")
    b.merge_upsert(_upd(spark))
    b.delete_where("val < 100.0")
    v = t.fast_forward("audit")
    assert v == 2
    main = {r["id"]: r["val"] for r in t.read().collect()}
    branch = {r["id"]: r["val"] for r in b.read().collect()}
    assert main == branch
    # everything below val 100 is gone (incl. merged id 10 at 21.0);
    # merged id 50 (val 101.0) and untouched id 51 (102.0) survive
    assert 10 not in main and 20 not in main
    assert main[50] == 101.0 and main[51] == 102.0
    # fast-forward is metadata-only: the commit reuses branch files
    assert t.history()[-1]["op"].startswith("fast_forward:audit@")


def test_fast_forward_refused_if_main_advanced(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("audit")
    b.merge_upsert(_upd(spark))
    t.merge_upsert(_upd(spark, keys_mod=13, bump=5.0))  # main moves on
    with pytest.raises(CommitConflictError):
        t.fast_forward("audit")


def test_vacuum_keeps_branch_files_live(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("audit")
    b.merge_upsert(_upd(spark))
    # churn main so count-based retention would expire v1 (the branch base)
    t.merge_upsert(_upd(spark, keys_mod=11, bump=3.0))
    t.merge_upsert(_upd(spark, keys_mod=17, bump=4.0))
    t.vacuum(retain_last=1)
    # branch must remain fully readable: its manifests root liveness
    assert b.read().count() == 1000
    assert b.read().filter("id = 10").collect()[0]["val"] == 21.0


def test_delete_branch_then_vacuum_sweeps_exclusive_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("audit")
    b.merge_upsert(_upd(spark))
    branch_files = {f["path"] for f in b._read_manifest()["files"]}
    main_files = {f["path"] for f in t._read_manifest()["files"]}
    exclusive = branch_files - main_files
    assert exclusive  # the merge rewrote at least one file
    t.delete_branch("audit")
    assert t.branches() == []
    t.vacuum(retain_last=2)
    assert not any(os.path.exists(p) for p in exclusive)
    assert t.read().count() == 1000  # main untouched


def test_branch_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("audit")
    with pytest.raises(CommitConflictError):
        b.vacuum()
    with pytest.raises(CommitConflictError):
        b.create_branch("nested")
    with pytest.raises(CommitConflictError):
        t.create_branch("audit")  # duplicate name
    with pytest.raises(FileNotFoundError):
        t.branch("nope")


def test_branch_tag_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("audit")
    with pytest.raises(CommitConflictError):
        b.tag("pinned")


def test_branch_staging_surface_refused(spark, tmp_path):
    """Staged snapshots record parents in the writer's own version
    numbering inside a SHARED staging dir — from a branch they could
    later publish onto main when per-lineage numbers coincide, so the
    whole WAP surface is refused on branch handles."""
    t = _mk(spark, tmp_path)
    b = t.create_branch("audit")
    upd = _upd(spark)
    for call in (
        lambda: b.stage_merge(upd, staged_id="x"),
        lambda: b.publish_staged("x"),
        lambda: b.read_staged("x"),
        lambda: b.discard_staged("x"),
        lambda: b.read_tag("any"),
        lambda: b.tags(),
        lambda: b.delete_tag("any"),
    ):
        with pytest.raises(CommitConflictError):
            call()
