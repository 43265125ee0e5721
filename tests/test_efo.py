"""Enhanced fan-out push double: churn accounting, exactly-once
delivery, and the registration lifecycle (sources/efo.py)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clj_kinesis_to_firehose_spark.sources.efo import (
    EfoShardPusher,
    EfoStats,
    ResourceInUse,
    consume_shard_efo,
)

ROWS = [(f"r{i}",) for i in range(57)]


def _consume(rows, page_size=10, events_per_subscription=3, **kw):
    pusher = EfoShardPusher(
        "fake/slice-00.parquet",
        page_size=page_size,
        events_per_subscription=events_per_subscription,
        rows=list(rows),
    )
    st = EfoStats()
    got = list(
        consume_shard_efo(
            "fake/slice-00.parquet",
            pusher=pusher,
            sleep=lambda _: None,
            stats=st,
            **kw,
        )
    )
    return got, st, pusher


def test_exactly_once_in_order():
    got, st, _ = _consume(ROWS)
    assert got == ROWS  # no loss, no dup, original order
    assert st.records == len(ROWS)


def test_full_churn_fired():
    got, st, pusher = _consume(ROWS)
    # 57 rows / page 10 = 6 pages, windows of 3 events -> several
    # subscriptions; exactly one drop and one rate-limit rejection
    assert st.subscriptions >= 3
    assert st.drops == 1
    assert st.resource_in_use == 1
    assert st.heartbeats >= 1
    assert pusher.subscribe_calls == st.subscriptions + st.resource_in_use


def test_registration_polls_until_active():
    _, st, pusher = _consume(ROWS)
    # first describe returns CREATING, second ACTIVE
    assert st.describe_polls == 2
    reg = pusher.register_stream_consumer("again")
    assert reg["status"] == "CREATING"
    assert pusher.describe_stream_consumer(reg["arn"])["status"] == "CREATING"
    assert pusher.describe_stream_consumer(reg["arn"])["status"] == "ACTIVE"


def test_heartbeats_do_not_advance_position():
    got, st, _ = _consume(ROWS, page_size=5, events_per_subscription=4)
    assert got == ROWS
    assert st.heartbeats >= 1
    # events = heartbeats + data pages (+ at most one empty terminal
    # event when a window reopens exactly at shard end)
    n_pages = -(-len(ROWS) // 5)
    assert st.events in (
        st.heartbeats + n_pages,
        st.heartbeats + n_pages + 1,
    )


def test_give_up_after_max_attempts():
    class AlwaysBusy(EfoShardPusher):
        def subscribe_to_shard(self, after_sequence=-1):
            self.subscribe_calls += 1
            raise ResourceInUse("always")

    pusher = AlwaysBusy("fake/slice-01.parquet", rows=list(ROWS))
    st = EfoStats()
    with pytest.raises(ResourceInUse):
        list(
            consume_shard_efo(
                "fake/slice-01.parquet",
                pusher=pusher,
                max_attempts=3,
                sleep=lambda _: None,
                stats=st,
            )
        )
    assert st.resource_in_use == 3


def test_single_page_slice_terminates():
    # tiny slice: <=1 page; the drop may not fire, but delivery and
    # termination must hold
    rows = [("only",)]
    got, st, _ = _consume(rows, page_size=10)
    assert got == rows
    assert st.drops in (0, 1)


def test_streaming_reader_efo_parity(spark):
    # the micro-batch path must run the same push-model churn and
    # still deliver exactly the batch rows
    from tests.conftest import SF_DIR

    from clj_kinesis_to_firehose_spark.sources.pyds import (
        register_replay_source,
    )
    from clj_kinesis_to_firehose_spark.sources.streams import (
        write_replay_slices,
    )

    register_replay_source(spark)
    replay = write_replay_slices(spark, SF_DIR, n_slices=2)
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", replay)
        .option("efo", "true")
        .load()
        .writeStream.format("memory")
        .queryName("efo_stream_parity")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS ids "
        "FROM efo_stream_parity"
    ).collect()[0]
    want = (
        spark.read.format("kinesis_replay").option("path", replay).load()
    ).count()
    assert got.n == want and got.ids == want


def test_streaming_reader_faults_parity(spark):
    # the faults gauntlet must also hold on the micro-batch path
    # (reader option added alongside efo) — same rows, no loss/dup
    from tests.conftest import SF_DIR

    from clj_kinesis_to_firehose_spark.sources.pyds import (
        register_replay_source,
    )
    from clj_kinesis_to_firehose_spark.sources.streams import (
        write_replay_slices,
    )

    register_replay_source(spark)
    replay = write_replay_slices(spark, SF_DIR, n_slices=2)
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", replay)
        .option("faults", "true")
        .load()
        .writeStream.format("memory")
        .queryName("faults_stream_parity")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS ids "
        "FROM faults_stream_parity"
    ).collect()[0]
    want = (
        spark.read.format("kinesis_replay").option("path", replay).load()
    ).count()
    assert got.n == want and got.ids == want


def test_deterministic_across_runs():
    a = _consume(ROWS)
    b = _consume(ROWS)
    assert a[0] == b[0]
    assert (a[1].subscriptions, a[1].heartbeats, a[1].events) == (
        b[1].subscriptions,
        b[1].heartbeats,
        b[1].events,
    )


@given(
    n_rows=st.integers(min_value=0, max_value=300),
    page_size=st.integers(min_value=1, max_value=50),
    window=st.integers(min_value=1, max_value=10),
    path_salt=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_exactly_once_under_arbitrary_geometry(
    n_rows, page_size, window, path_salt
):
    # the delivery invariant must hold for EVERY (slice size, page
    # size, window length, fault schedule) combination, not just the
    # fixture shapes — path_salt varies the md5-derived heartbeat/
    # drop schedule
    rows = [(f"r{i}",) for i in range(n_rows)]
    got, st_, _ = _consume_salted(rows, page_size, window, path_salt)
    assert got == rows
    assert st_.records == n_rows


def _consume_salted(rows, page_size, window, salt):
    pusher = EfoShardPusher(
        f"fake/slice-{salt}.parquet",
        page_size=page_size,
        events_per_subscription=window,
        rows=list(rows),
    )
    st_ = EfoStats()
    got = list(
        consume_shard_efo(
            f"fake/slice-{salt}.parquet",
            pusher=pusher,
            sleep=lambda _: None,
            stats=st_,
        )
    )
    return got, st_, pusher
