"""Manifest-list splitting (storage/snapshots.py) — the commit-cost
contract at large file counts: entries live in immutable seg-*.json
segment files, a commit carries intact segments by reference and
re-serializes only changed ones, thin segments self-compact, and
vacuum sweeps unreferenced segments. Segment size is shrunk per-table
so a handful of files exercises the multi-segment paths."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.storage import SnapshotTable


def _mk(spark, tmp_path, n=1000, n_files=8, seg_target=4):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), key="id")
    # per-instance shrink: 8 files / target 4 = 2 segments at create
    t.SEGMENT_TARGET = seg_target
    t.SEGMENT_MIN_FILL = max(1, seg_target // 4)
    df = spark.range(n).select(F.col("id"), (F.col("id") * 2.0).alias("val"))
    t.create(df, n_files=n_files)
    return t


def _raw(t, v):
    with open(t._manifest_path(v)) as fh:
        return json.load(fh)


def _segs(t, v):
    return [s["path"] for s in _raw(t, v)["segments"]]


def test_commit_writes_segmented_manifest(spark, tmp_path):
    t = _mk(spark, tmp_path)
    raw = _raw(t, 1)
    assert "files" not in raw
    assert [s["n_files"] for s in raw["segments"]] == [4, 4]
    assert raw["n_files"] == 8 and raw["n_rows"] == 1000
    # resolution materializes the same 8 entries readers always saw
    m = t._read_manifest(1)
    assert len(m["files"]) == 8
    assert sum(f["rows"] for f in m["files"]) == 1000
    assert t.read().count() == 1000


def test_narrow_merge_reuses_intact_segment_by_reference(spark, tmp_path):
    """The scaling property itself: an upsert touching one file must
    carry the untouched segment FORWARD BY REFERENCE (same seg path in
    both manifest lists), re-serializing only the broken segment's
    survivors + the new file."""
    t = _mk(spark, tmp_path)
    updates = spark.createDataFrame([(3, -1.0)], "id long, val double")
    t.merge_upsert(updates)
    v1, v2 = set(_segs(t, 1)), set(_segs(t, 2))
    assert len(v1 & v2) >= 1, "no segment carried by reference"
    assert v2 - v1, "changed entries must land in a new segment"
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[3] == -1.0 and got[4] == 8.0 and len(got) == 1000


def test_thin_segments_fold_once_threshold_hit(spark, tmp_path):
    """Each narrow merge leaves a 1-entry segment; once SEGMENT_FOLD_AT
    of them accumulate a later commit folds them into right-sized
    segments instead of fragmenting forever."""
    t = _mk(spark, tmp_path, seg_target=4)
    t.SEGMENT_FOLD_AT = 3
    for i, key in enumerate((3, 200, 400, 600, 800), start=1):
        t.merge_upsert(
            spark.createDataFrame([(key, -float(i))], "id long, val double")
        )
    latest = t.latest_version()
    counts = [s["n_files"] for s in _raw(t, latest)["segments"]]
    assert len([c for c in counts if c == 1]) < t.SEGMENT_FOLD_AT, (
        f"fragmentation never folded: {counts}"
    )
    # data unaffected by manifest reshaping
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[3] == -1.0 and got[800] == -5.0 and len(got) == 1000


def test_vacuum_sweeps_unreferenced_segments(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for key in (3, 200):
        t.merge_upsert(
            spark.createDataFrame([(key, 0.0)], "id long, val double")
        )
    mdir = t._manifest_dir
    before = {n for n in os.listdir(mdir) if n.startswith("seg-")}
    rep = t.vacuum(retain_last=1)
    after = {n for n in os.listdir(mdir) if n.startswith("seg-")}
    assert rep["removed_segments"] >= 1
    assert after < before
    live = set(_segs(t, t.latest_version()))
    assert live <= after, "vacuum deleted a referenced segment"
    assert t.read().count() == 1000


def test_rollback_and_time_travel_on_segmented_manifests(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_upsert(spark.createDataFrame([(3, -1.0)], "id long, val double"))
    assert t.read(1).filter("id = 3").collect()[0]["val"] == 6.0
    t.rollback(1)
    assert t.read().filter("id = 3").collect()[0]["val"] == 6.0
    assert t.history()[-1]["op"] == "rollback"


def test_branch_namespace_isolated_from_main_segments(spark, tmp_path):
    """Branch manifests must never reference main's segment files:
    main vacuum expires its segments on its own schedule."""
    t = _mk(spark, tmp_path)
    b = t.create_branch("dev")
    braw = _raw(b, 1)
    assert "files" in braw  # inline seed
    assert not any("_segment" in f for f in braw["files"])
    b.merge_upsert(spark.createDataFrame([(3, -9.0)], "id long, val double"))
    # branch commit segments live under the branch dir
    b2 = _raw(b, 2)
    for s in b2["segments"]:
        assert os.path.exists(os.path.join(b._manifest_dir, s["path"]))
    assert b.read().filter("id = 3").collect()[0]["val"] == -9.0
    assert t.read().filter("id = 3").collect()[0]["val"] == 6.0


def test_inline_manifest_stays_readable(spark, tmp_path):
    """Back-compat: a pre-split manifest (inline "files") reads fine
    and the next commit upgrades it to segments."""
    t = _mk(spark, tmp_path, n=100, n_files=2)
    m = t._read_manifest(1)
    inline = {
        "version": 2, "op": "legacy", "key": "id", "parent": 1,
        "files": [
            {k: v for k, v in f.items() if k != "_segment"}
            for f in m["files"]
        ],
    }
    t._publish(2, inline)
    assert t.read(2).count() == 100
    t.merge_upsert(spark.createDataFrame([(3, -1.0)], "id long, val double"))
    assert "segments" in _raw(t, 3)
    assert t.read().count() == 100


def test_segment_reuse_invariant_is_enforced_by_digest(spark, tmp_path):
    # The reuse rule used to be "same entry COUNT as the parent summary
    # means same set"; the digest makes it enforced (ADVICE r07): a
    # content-modified entry that kept its .segment pointer must break
    # reuse and re-serialize, never publish stale segment contents.
    import dataclasses

    from clj_kinesis_to_firehose_spark.storage.snapshots import FileEntry

    def load(v):
        return [FileEntry.from_json(f) for f in t._read_manifest(v)["files"]]

    t = _mk(spark, tmp_path)
    entries = load(1)
    victim = next(e for e in entries if e.segment is not None)
    forged = [
        dataclasses.replace(e, rows=e.rows + 1) if e is victim else e
        for e in entries
    ]
    v2 = t._commit("forge", forged, parent=1)
    raw = _raw(t, v2)
    # every segment the forged entry could have ridden must be fresh or
    # digest-clean: reading back the manifest yields the FORGED rows
    loaded = {e.path: e.rows for e in load(v2)}
    assert loaded[victim.path] == victim.rows + 1
    for s in raw["segments"]:
        assert "entries_digest" in s


def test_vacuum_grace_period_spares_young_orphan_segments(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # fabricate a losing-committer orphan segment (referenced nowhere)
    orphan = os.path.join(t._manifest_dir, "seg-deadbeef.json")
    with open(orphan, "w") as fh:
        json.dump([], fh)
    rep = t.vacuum(retain_last=1, grace_sec=3600)
    assert os.path.exists(orphan)  # young → pending-commit protection
    assert rep["removed_segments"] == 0
    rep = t.vacuum(retain_last=1)  # sandbox default: no grace
    assert not os.path.exists(orphan)
