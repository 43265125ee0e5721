"""Streaming-semantics tests (SURVEY.md §5.2): late-data dropping
under watermarks, at-least-once dedup, end-to-end Firehose pipeline
with injected partial failures."""

from __future__ import annotations

import os
import tempfile
import time

import pytest

from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.sources.streams import EVENTS_RAW_SCHEMA
from clj_kinesis_to_firehose_spark.streaming import pipelines
from tests.conftest import SF_DIR


def _write_slice(spark, rows, path):
    df = spark.createDataFrame(rows, schema=EVENTS_RAW_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(path)
    time.sleep(1.05)  # file-source orders slices by modification time


NS = 1_000_000_000
T0 = 1_704_067_200 * NS  # 2024-01-01 00:00:00 UTC in nanos


def _ns_to_dt(ts_ns):
    # naive UTC datetime (session tz is UTC), truncated to µs like the
    # loader's nanos path
    import datetime

    return datetime.datetime(1970, 1, 1) + datetime.timedelta(
        microseconds=ts_ns // 1000
    )


def _ev(i, ts_ns, etype="click", user=1, value=1.0):
    return (i, _ns_to_dt(ts_ns), user, etype, value, '{"k": 1}')


@pytest.fixture(scope="module")
def late_replay_dir(spark):
    """Replay with an event arriving 2h late — far beyond the 15-minute
    watermark by the time its slice is processed."""
    d = tempfile.mkdtemp(prefix="kf_late_")
    # slice 0: hours 0-1 (closes window [0,1h) once watermark passes)
    _write_slice(
        spark,
        [_ev(0, T0 + 10 * 60 * NS), _ev(1, T0 + 70 * 60 * NS)],
        os.path.join(d, "s0"),
    )
    # slice 1: hour 4 → watermark jumps to ~3h55m, hour-0/1 windows emit
    _write_slice(spark, [_ev(2, T0 + 250 * 60 * NS)], os.path.join(d, "s1"))
    # slice 2: advance again — hour-0 state is evicted THIS batch (Spark
    # drops a late row only once its window was evicted in a PRIOR
    # batch: merge happens before eviction within a batch)
    _write_slice(spark, [_ev(4, T0 + 310 * 60 * NS)], os.path.join(d, "s2"))
    # slice 3: the LATE row back in hour 0 — beyond watermark, state
    # gone ⇒ dropped; plus a fresh row keeping the stream moving
    _write_slice(
        spark,
        [_ev(3, T0 + 20 * 60 * NS), _ev(5, T0 + 320 * 60 * NS)],
        os.path.join(d, "s3"),
    )
    return d


def test_watermark_drops_late_rows(spark, late_replay_dir):
    out = pipelines.stream_tumbling_watermark(
        spark, SF_DIR, replay_dir=late_replay_dir
    ).collect()
    counts = {(r["wstart"].hour, r["event_type"]): r["n_events"] for r in out}
    # window [00:00,01:00) closed with exactly 1 event: the late event 3
    # (also hour 0, arriving after the watermark passed) must NOT count
    assert counts.get((0, "click")) == 1, counts
    # hour-1 window emitted with its single on-time event
    assert counts.get((1, "click")) == 1, counts


def test_stream_dedup_removes_injected_duplicates(spark, oracle_con):
    res = {
        r["event_type"]: r["n_unique"]
        for r in pipelines.stream_dedup(spark, SF_DIR).collect()
    }
    exact = dict(
        oracle_con.execute(
            "SELECT event_type, COUNT(DISTINCT event_id) FROM events GROUP BY event_type"
        ).fetchall()
    )
    assert res == exact


def test_stateful_counter_matches_batch(spark, oracle_con):
    res = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in pipelines.stream_stateful_counter(spark, SF_DIR).collect()
    }
    exact = {
        u: (n, s)
        for u, n, s in oracle_con.execute(
            "SELECT user_id, COUNT(*), ROUND(SUM(value), 2) FROM events GROUP BY user_id"
        ).fetchall()
    }
    assert res == exact


def test_firehose_pipeline_with_partial_failures(spark, oracle_con):
    # inject a failure on every 5th record's first attempt; retry must
    # recover every record exactly once (idempotent batch naming)
    out_dir = tempfile.mkdtemp(prefix="kf_e2e_")
    res = pipelines.stream_firehose_pipeline(
        spark, SF_DIR, out_dir=out_dir, fail_first_attempt_every=5
    )
    got = {r["event_type"]: (r["n_delivered"], r["n_unique"]) for r in res.collect()}
    exact = {
        t: (n, n)
        for t, n in oracle_con.execute(
            "SELECT event_type, COUNT(*) FROM events WHERE event_type != 'error' GROUP BY event_type"
        ).fetchall()
    }
    assert got == exact
    assert "error" not in got  # routed/dropped by the bridge filter
    # every delivery file honors the record cap
    for f in os.listdir(out_dir):
        with open(os.path.join(out_dir, f), "rb") as fh:
            lines = fh.read().splitlines()
        assert len(lines) <= 500


def test_checkpoint_restart_delivers_exactly_once(spark):
    """Stop/restart against the same checkpoint: slices delivered before
    the stop must NOT be redelivered after restart (WAL offsets + the
    idempotent sink = exactly-once across restarts — the property the
    reference's at-least-once bridge cannot give)."""
    from clj_kinesis_to_firehose_spark.sources.streams import read_event_stream
    from clj_kinesis_to_firehose_spark.streaming.firehose_sink import (
        firehose_foreach_batch,
    )

    base = tempfile.mkdtemp(prefix="kf_restart_")
    replay = os.path.join(base, "replay")
    delivery = os.path.join(base, "delivery")
    chk = os.path.join(base, "chk")
    os.makedirs(delivery)

    def run_pipeline():
        q = (
            read_event_stream(spark, replay)
            .writeStream.foreachBatch(firehose_foreach_batch(delivery))
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # phase 1: two slices, first run
    _write_slice(spark, [_ev(i, T0 + i * 60 * NS) for i in range(10)],
                 os.path.join(replay, "s0"))
    _write_slice(spark, [_ev(i, T0 + i * 60 * NS) for i in range(10, 20)],
                 os.path.join(replay, "s1"))
    run_pipeline()
    first = spark.read.json(os.path.join(delivery, "*.jsonl"))
    assert first.count() == 20

    # phase 2: one more slice lands, restart from the same checkpoint
    _write_slice(spark, [_ev(i, T0 + i * 60 * NS) for i in range(20, 30)],
                 os.path.join(replay, "s2"))
    run_pipeline()
    final = spark.read.json(os.path.join(delivery, "*.jsonl"))
    assert final.count() == 30  # 20 old NOT redelivered + 10 new
    assert final.select("event_id").distinct().count() == 30


def test_backpressure_bounds_microbatches(spark):
    row = pipelines.stream_backpressure_trigger(spark, SF_DIR).collect()[0]
    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert row.total_rows == total  # nothing lost draining the backlog
    assert row.n_batches >= 4  # one slice per trigger, never a mega-batch
    # no batch may exceed one time-ordered slice (ntile => ceil split)
    assert row.max_batch_rows <= -(-total // 4)


def test_poison_record_does_not_wedge_stream(spark):
    """Liveness under a permanently-failing record: with the default
    dead-letter mode, the micro-batch COMPLETES (strict mode would
    raise, the checkpoint would replay the same batch, and the stream
    would wedge forever), the poison record lands under errors/, and
    delivered + dead reconciles with the source exactly."""
    from clj_kinesis_to_firehose_spark.sources.streams import read_event_stream
    from clj_kinesis_to_firehose_spark.streaming.firehose_sink import (
        LocalDirFirehoseClient,
        firehose_foreach_batch,
    )

    base = tempfile.mkdtemp(prefix="kf_poison_")
    replay = os.path.join(base, "replay")
    delivery = os.path.join(base, "delivery")
    chk = os.path.join(base, "chk")
    os.makedirs(delivery)
    rows = [_ev(i, T0 + i * 60 * NS) for i in range(19)]
    rows.append(_ev(99, T0 + 99 * 60 * NS, etype="poison"))
    _write_slice(spark, rows, os.path.join(replay, "s0"))

    def factory(out_dir, fail_first_attempt_every=0):
        return LocalDirFirehoseClient(
            out_dir, poison_marker=b'"event_type":"poison"'
        )

    q = (
        read_event_stream(spark, replay)
        .writeStream.foreachBatch(
            firehose_foreach_batch(delivery, client_factory=factory)
        )
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # completes — no wedge

    delivered = spark.read.json(os.path.join(delivery, "*.jsonl"))
    assert delivered.count() == 19
    assert delivered.filter(F.col("event_type") == "poison").count() == 0
    dead = spark.read.json(os.path.join(delivery, "errors", "*.jsonl"))
    assert dead.count() == 1
    assert dead.collect()[0]["event_id"] == 99
    # full reconciliation: every source record is accounted for exactly once
    ids = {r["event_id"] for r in delivered.collect()} | {99}
    assert ids == {i for i in range(19)} | {99}


def test_checkpoint_survives_reshard(spark):
    """Checkpoint continuity through a shard split+merge: the consumer
    drains the pre-merge shards, STOPS, the merged child's slices land,
    and a restart from the same checkpoint picks up exactly the new
    shard — nothing redelivered, nothing lost, per-shard sequence
    numbers still contiguous across the boundary."""
    import shutil

    from clj_kinesis_to_firehose_spark.sources.streams import (
        read_reshard_stream,
        write_reshard_replay,
    )

    replay = write_reshard_replay(spark, SF_DIR)
    held = tempfile.mkdtemp(prefix="kf_held_")
    for s in ["slice=5", "slice=6"]:  # epoch-3: post-merge arrivals
        shutil.move(os.path.join(replay, s), os.path.join(held, s))
    cap = os.path.join(tempfile.mkdtemp(prefix="kf_cap_"), "arrivals")
    chk = tempfile.mkdtemp(prefix="kf_chk_")

    def run():
        def capture(bdf, epoch_id):
            bdf.withColumn("batch_id", F.lit(int(epoch_id))).write.mode(
                "append"
            ).parquet(cap)

        q = (
            read_reshard_stream(spark, replay)
            .writeStream.foreachBatch(capture)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    phase1 = spark.read.parquet(cap)
    n1 = phase1.count()
    assert phase1.filter(F.col("shard_id") == "shard-2").count() == 0
    max_batch1 = phase1.agg(F.max("batch_id")).collect()[0][0]

    for s in ["slice=5", "slice=6"]:
        shutil.move(os.path.join(held, s), os.path.join(replay, s))
    run()
    arr = spark.read.parquet(cap)
    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert arr.count() == total, "reshard must not lose or redeliver"
    assert arr.select("event_id").distinct().count() == total
    # restart continued, not restarted: new arrivals carry later batches
    new = arr.filter(F.col("batch_id") > max_batch1)
    assert new.count() == total - n1
    assert {r["shard_id"] for r in new.select("shard_id").distinct().collect()} \
        <= {"shard-0", "shard-2"}
    # per-shard sequence numbers are contiguous across the boundary
    for shard in ["shard-0", "shard-2"]:
        seqs = sorted(
            r["seq"] for r in arr.filter(F.col("shard_id") == shard)
            .select("seq").collect()
        )
        assert seqs == list(range(1, len(seqs) + 1)), shard


def test_reshard_double_construction_invariants(spark):
    """The reshard replay's static shape (no streaming needed): the
    slices partition the source exactly, per-shard sequence numbers
    are 1..n contiguous across the shard's whole lifetime, epoch
    boundaries respect event-time order, and the shard-1 lineage's key
    set is exactly the union of its children's."""
    from clj_kinesis_to_firehose_spark.sources.streams import (
        RESHARD_RAW_SCHEMA,
        write_reshard_replay,
    )

    replay = write_reshard_replay(spark, SF_DIR)
    slices = {}
    for i in range(7):
        slices[i] = spark.read.schema(RESHARD_RAW_SCHEMA).parquet(
            os.path.join(replay, f"slice={i}")
        )
    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(df.count() for df in slices.values()) == total

    whole = slices[0]
    for i in range(1, 7):
        whole = whole.unionByName(slices[i])
    # seq contiguity per shard across its lifetime
    for shard in ["shard-0", "shard-1", "shard-1a", "shard-1b", "shard-2"]:
        seqs = sorted(
            r["seq"] for r in whole.filter(F.col("shard_id") == shard)
            .select("seq").collect()
        )
        assert seqs == list(range(1, len(seqs) + 1)), shard
    # epoch time ordering: max ts of epoch-1 slices <= min ts of epoch-3
    e1_max = max(
        slices[i].agg(F.max("ts")).collect()[0][0] for i in (0, 1)
    )
    e3_min = min(
        slices[i].agg(F.min("ts")).collect()[0][0] for i in (5, 6)
    )
    assert e1_max <= e3_min
    # routing honors the hash lineage: every key in the shard-1 family
    # (parent, split children, merged child) is a bucket-1 key, every
    # shard-0 key bucket-0, and the split children partition bucket 1
    from clj_kinesis_to_firehose_spark.sources.streams import _SHARD_BUCKET

    buckets = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", (F.expr(_SHARD_BUCKET).cast("long") % 2).alias("b2")
    ).distinct()
    bucket1 = {r["user_id"] for r in buckets.filter("b2 = 1").collect()}
    bucket0 = {r["user_id"] for r in buckets.filter("b2 = 0").collect()}
    keys = lambda i: {r["user_id"] for r in slices[i].select("user_id").distinct().collect()}  # noqa: E731
    lineage1 = keys(1) | keys(3) | keys(4) | keys(6)
    shard0_keys = keys(0) | keys(2) | keys(5)
    assert lineage1 <= bucket1, "shard-1 lineage must carry only bucket-1 keys"
    assert shard0_keys <= bucket0, "shard-0 must carry only bucket-0 keys"
    assert keys(3).isdisjoint(keys(4)), "split children cover disjoint hash ranges"
    assert shard0_keys.isdisjoint(lineage1)


def test_stateful_aggregation_state_survives_reshard(spark):
    """Streaming aggregation STATE continuity through the reshard: a
    per-user count accumulates over the pre-merge shards, the query
    stops, the merged child's slices land, and the restart resumes
    from checkpointed state — final counts must equal the batch
    answer, proving no state was lost or double-counted when the
    key→shard mapping changed under the aggregation."""
    import shutil
    import uuid

    from clj_kinesis_to_firehose_spark.sources.streams import (
        read_reshard_stream,
        write_reshard_replay,
    )

    replay = write_reshard_replay(spark, SF_DIR)
    held = tempfile.mkdtemp(prefix="kf_held2_")
    for s in ["slice=5", "slice=6"]:
        shutil.move(os.path.join(replay, s), os.path.join(held, s))
    chk = tempfile.mkdtemp(prefix="kf_chk_")

    def run():
        name = f"reshard_counts_{uuid.uuid4().hex[:8]}"
        q = (
            read_reshard_stream(spark, replay)
            .groupBy("user_id")
            .count()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["user_id"]: r["count"] for r in spark.table(name).collect()}

    partial = run()
    for s in ["slice=5", "slice=6"]:
        shutil.move(os.path.join(held, s), os.path.join(replay, s))
    final = run()

    batch = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert final == batch, "restarted state must converge to the batch answer"
    assert sum(partial.values()) < sum(final.values())


def test_stateful_counter_on_rocksdb_state_store(spark, oracle_con):
    """The 100 TB state backend: HDFSBackedStateStore keeps every key
    in executor heap — at large keyspaces the scalable provider is
    RocksDB (incremental checkpoints, state spills to local disk).
    The engine's stateful ops must run unchanged on it: same pipeline,
    same exact result as the batch aggregate, only the provider conf
    differs."""
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(key, None)
    spark.conf.set(key, rocks)
    try:
        res = {
            r["user_id"]: (r["n_events"], r["sum_value"])
            for r in pipelines.stream_stateful_counter(spark, SF_DIR).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    exact = {
        u: (n, s)
        for u, n, s in oracle_con.execute(
            "SELECT user_id, COUNT(*), ROUND(SUM(value), 2)"
            " FROM events GROUP BY user_id"
        ).fetchall()
    }
    assert res == exact


def test_python_datasource_stream_face_exact(spark, oracle_con):
    """The kinesis_replay Python DataSource's STREAM face: a
    checkpointed streaming query over the connector must deliver every
    replay record exactly once (count + per-type parity with the
    batch table)."""
    import tempfile
    import uuid

    from clj_kinesis_to_firehose_spark.sources.pyds import register_replay_source
    from clj_kinesis_to_firehose_spark.sources.streams import write_replay_slices

    register_replay_source(spark)
    replay = write_replay_slices(spark, SF_DIR, n_slices=4)
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", replay)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kf_chk_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_type"]: r["n"]
        for r in spark.table(name).groupBy("event_type").count()
        .withColumnRenamed("count", "n").collect()
    }
    exact = dict(
        oracle_con.execute(
            "SELECT event_type, COUNT(*) FROM events GROUP BY event_type"
        ).fetchall()
    )
    assert got == exact


def test_python_datasource_offsets_window_correctly(spark):
    """Offset semantics of the stream reader, unit-level: initial at
    slice 0, latest at the replay head, and partitions(start, end)
    fanning out exactly the uncommitted slice files — the contract a
    checkpoint recovery relies on."""
    from clj_kinesis_to_firehose_spark.sources.pyds import (
        KinesisReplayStreamReader,
    )
    from clj_kinesis_to_firehose_spark.sources.streams import write_replay_slices

    replay = write_replay_slices(spark, SF_DIR, n_slices=4)
    r = KinesisReplayStreamReader({"path": replay})
    assert r.initialOffset() == {"slice": 0}
    assert r.latestOffset() == {"slice": 4}
    all_parts = r.partitions({"slice": 0}, {"slice": 4})
    assert len(all_parts) == 4
    mid = r.partitions({"slice": 1}, {"slice": 3})
    assert len(mid) == 2
    assert [p.path for p in mid] == [p.path for p in all_parts[1:3]]
    assert r.partitions({"slice": 2}, {"slice": 2}) == []
    # every record is reachable through exactly one partition (the
    # happy path yields Arrow RecordBatches — count their rows)
    n = sum(b.num_rows for p in all_parts for b in r.read(p))
    assert n == 10000


@pytest.fixture(scope="module")
def pyds_delivery(spark):
    """ONE full kinesis_replay → firehose_delivery availableNow run,
    shared by the caps/idempotence and byte-format tests (identical
    replay + sink config — r16 scaffold sharing, r15 verdict #8).
    Returns (replay_dir, out_dir, delivered_lines) with the lines
    snapshotted HERE, before any test mutates the out dir."""
    import glob
    import tempfile

    from clj_kinesis_to_firehose_spark.sources.pyds import (
        register_delivery_sink,
        register_replay_source,
    )
    from clj_kinesis_to_firehose_spark.sources.streams import (
        write_replay_slices,
    )

    register_replay_source(spark)
    register_delivery_sink(spark)
    replay = write_replay_slices(spark, SF_DIR, n_slices=4)
    out = tempfile.mkdtemp(prefix="kf_pyds_deliv_")
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", replay)
        .load()
        .writeStream.format("firehose_delivery")
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kf_chk_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    lines = sorted(
        line
        for f in glob.glob(out + "/batch-*.jsonl")
        for line in open(f, "rb").read().splitlines()
    )
    return replay, out, lines


def test_python_datasource_writer_caps_and_idempotence(spark, pyds_delivery):
    """firehose_delivery writer: every delivered file honors the
    PutRecordBatch caps, the stage dir is swept after commit, and a
    REPLAYED micro-batch (same batchId) overwrites its own files
    instead of duplicating records — the exactly-once contract."""
    import glob
    import os

    from clj_kinesis_to_firehose_spark.sources.pyds import (
        FirehoseDeliveryStreamWriter,
    )

    _, out, _ = pyds_delivery
    files = sorted(glob.glob(out + "/batch-*.jsonl"))
    assert files
    total = 0
    for f in files:
        lines = open(f, "rb").readlines()
        assert len(lines) <= 500, f
        assert sum(len(ln) for ln in lines) <= 4 * 1024 * 1024, f
        assert all(ln.endswith(b"\n") for ln in lines), f
        total += len(lines)
    assert total == 10000
    assert os.listdir(out + "/_stage") == [], "stage not swept"

    # replay batch 0: same partition/chunk names → overwrite, not dup
    w = FirehoseDeliveryStreamWriter({"path": out})
    class _Msg:  # what a task would have returned
        pass
    staged = os.path.join(out, "_stage", "p0-c0-replay.jsonl")
    with open(staged, "wb") as fh:
        fh.write(b'{"event_id": 1}\n')
    m = _Msg(); m.partition_id = 0; m.staged = [staged]
    w.commit([m], batchId=0)
    files2 = sorted(glob.glob(out + "/batch-*.jsonl"))
    assert files2 == files, "replayed batch must not create new files"


def test_python_datasource_writer_bytes_are_format_pinned(
    spark, pyds_delivery
):
    """r16 Arrow writer face: the delivered JSON bytes must be
    byte-identical to the committed pickled-row rendering —
    json.dumps(row.asDict(), default=str) over rows whose timestamps
    are naive UTC wall clock. The reference lines are rendered here
    through exactly that expression from the batch reader's collected
    rows (the pickled-Row path), so this test pins the Arrow face to
    the old byte format line for line. (delivered_lines come from the
    shared fixture's snapshot, taken before any test mutates the out
    dir.)"""
    import json

    replay, _, delivered = pyds_delivery
    rows = (
        spark.read.format("kinesis_replay").option("path", replay).load()
    ).collect()
    expected = sorted(
        json.dumps(r.asDict(), default=str).encode() for r in rows
    )
    assert len(delivered) == len(expected)
    assert delivered == expected
