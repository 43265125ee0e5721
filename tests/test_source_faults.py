"""Consumer-fault double tests (round-6 verdict #4 / SURVEY §5.2):
the GetRecords retry loop behind the ``kinesis_replay`` source must
survive throttling, expired iterators, and mid-slice disconnects with
capped backoff and sequence-position resume — no duplicate, no drop —
and give up cleanly on a hard-down shard."""

from __future__ import annotations

import pytest

from clj_kinesis_to_firehose_spark.sources.faults import (
    ConsumeStats,
    ExpiredIteratorError,
    FaultInjectingSliceClient,
    MidSliceDisconnect,
    ProvisionedThroughputExceeded,
    _fault_plan,
    consume_slice,
)
from tests.conftest import SF_DIR

ROWS = [(i, f"row-{i}") for i in range(1234)]
PATH = "slice=0/part-0.parquet"  # only hashed for the schedule


def _client(**kw):
    kw.setdefault("page_size", 100)
    return FaultInjectingSliceClient(PATH, rows=list(ROWS), **kw)


def _run(client, **kw):
    stats = ConsumeStats()
    kw.setdefault("sleep", lambda s: None)
    out = list(consume_slice(PATH, client=client, stats=stats, **kw))
    return out, stats


def test_faulted_read_is_loss_free_and_ordered():
    out, stats = _run(_client())
    assert out == ROWS  # exact: same rows, same order, no dup/drop
    assert stats.records == len(ROWS)


def test_every_fault_kind_fires_and_is_survived():
    client = _client()
    _, stats = _run(client)
    assert client.faults_fired == {"throttle": 1, "expired": 1, "disconnect": 1}
    assert stats.throttled == 1
    assert stats.expired == 1
    assert stats.disconnects == 1
    # expired + disconnect re-acquire; initial acquire makes 3
    assert stats.iterators_acquired == 3


def test_backoff_is_exponential_and_capped():
    # schedule every call as a throttle for a while: backoff must
    # double from base and clip at the cap, and the sleep durations
    # recorded must be exactly what the loop slept
    client = _client()
    client._plan = {i: "throttle" for i in range(5)}
    slept = []
    stats = ConsumeStats()
    out = list(
        consume_slice(
            PATH,
            client=client,
            stats=stats,
            max_attempts=8,
            base_backoff=0.01,
            max_backoff=0.04,
            sleep=slept.append,
        )
    )
    assert out == ROWS
    assert slept[:5] == [0.01, 0.02, 0.04, 0.04, 0.04]  # doubled, then capped
    assert stats.backoffs == slept


def test_resume_is_after_last_sequence_not_trim_horizon():
    # expire the iterator mid-stream (after some pages succeeded):
    # the re-acquired iterator must start AFTER the last delivered
    # sequence number — restarting at 0 would duplicate records
    client = _client()
    client._plan = {5: "expired"}  # pages 0-4 succeed first
    acquired = []
    orig = client.get_shard_iterator

    def spy(after_sequence=-1):
        acquired.append(after_sequence)
        return orig(after_sequence)

    client.get_shard_iterator = spy
    out, _ = _run(client)
    assert out == ROWS
    assert acquired[0] == -1  # initial
    assert acquired[1] == 499  # 5 pages × 100 rows delivered, resume after row 499


def test_hard_down_shard_gives_up_after_max_attempts():
    client = _client()
    client._plan = {i: "disconnect" for i in range(100)}
    with pytest.raises(MidSliceDisconnect):
        _run(client, max_attempts=4)
    # budget counts CONSECUTIVE failures: 4 attempts then raise
    assert client.faults_fired["disconnect"] == 4


def test_scattered_faults_do_not_accumulate_toward_giveup():
    # one fault every other page, far more total faults than
    # max_attempts: successful pages reset the failure budget, so the
    # read still completes
    client = _client()
    client._plan = {i: "throttle" for i in range(0, 40, 2)}
    out, stats = _run(client, max_attempts=3)
    assert out == ROWS
    assert stats.throttled > 3  # more faults than the per-burst budget


def test_iterator_ttl_expires_stale_tokens():
    # a token older than the TTL raises even with an empty fault plan,
    # and the consumer recovers by re-acquiring at position
    client = _client(iterator_ttl_calls=3)
    client._plan = {}
    out, stats = _run(client)
    assert out == ROWS
    assert stats.expired > 0  # TTL-driven, not plan-driven
    assert client.faults_fired["expired"] == 0


def test_fault_plan_deterministic_and_complete():
    a = _fault_plan("x/part-1.parquet", 7)
    b = _fault_plan("x/part-1.parquet", 7)
    assert a == b  # same path → same schedule (reproducible reads)
    assert sorted(a.values()) == ["disconnect", "expired", "throttle"]
    assert _fault_plan("x/part-1.parquet", 0) == {}


def test_empty_slice_yields_nothing():
    client = FaultInjectingSliceClient(PATH, rows=[], page_size=100)
    out, stats = _run(client)
    assert out == []
    assert stats.records == 0


def test_datasource_faults_option_end_to_end(spark):
    """The registered query: faulted read equals the plain batch read
    of the same replay, bit-for-bit (groupBy'd), on the real fixture."""
    from clj_kinesis_to_firehose_spark import registry

    df = registry.queries()["stream_source_faults"](spark, SF_DIR)
    from clj_kinesis_to_firehose_spark.sources import load_table
    from pyspark.sql import functions as F

    expect = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("event_id").cast("long").alias("n_ids"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
    got = {tuple(r) for r in df.collect()}
    want = {tuple(r) for r in expect.collect()}
    assert got == want


def test_ttl_expiry_on_scheduled_slot_defers_the_fault():
    # A TTL expiry landing exactly on a call index that carries a
    # scheduled fault must re-home that fault to a later index, not
    # silently consume it — long slices (> iterator_ttl_calls pages)
    # must still see at least one fault of every kind (ADVICE r07).
    client = _client(iterator_ttl_calls=3)
    # force the only scheduled fault onto the call the TTL will kill:
    # born=0 iterator expires on its 4th get_records (call index 3)
    client._plan = {3: "disconnect"}
    it = client.get_shard_iterator()
    for _ in range(3):
        _, it = client.get_records(it)
    with pytest.raises(ExpiredIteratorError):
        client.get_records(it)
    # the fault was NOT consumed by the TTL raise — it moved forward
    assert "disconnect" in client._plan.values()
    assert client.faults_fired["disconnect"] == 0
    # and the full retry loop still fires + survives it
    out, stats = _run(client)
    assert out == ROWS
    assert client.faults_fired["disconnect"] == 1


def test_long_slice_past_ttl_still_fires_every_fault_kind():
    # End-to-end version of the deferral contract: a slice long enough
    # that TTL expiries occur organically still fires every kind.
    client = _client(iterator_ttl_calls=4)
    out, stats = _run(client)
    assert out == ROWS
    assert all(v >= 1 for v in client.faults_fired.values()), client.faults_fired
    assert stats.expired >= 1  # organic or scheduled TTLs were exercised
