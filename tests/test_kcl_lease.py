"""KCL-style lease table + two-worker double (sources/kcl_lease.py):
fencing (a stale lease token cannot checkpoint), no double-delivery
and no loss across a mid-page lease handoff, checkpoint monotonicity,
and the deterministic scheduler's audit trail."""

from __future__ import annotations

from decimal import Decimal

import pytest

from clj_kinesis_to_firehose_spark.sources.kcl_lease import (
    LeaseLostError,
    LeaseTable,
    ShardSession,
    run_two_worker_replay,
)


def _rows(shard: int, n: int) -> list:
    # replay-row layout (event_id, ts, user_id, event_type, value, props)
    return [
        (shard * 10_000 + i, None, i % 7,
         ["click", "view", "purchase"][i % 3],
         round(0.01 * ((shard * 10_000 + i) % 997), 2), "{}")
        for i in range(n)
    ]


def _fold(rowlists):
    counts: dict = {}
    sums: dict = {}
    for rows in rowlists:
        for r in rows:
            counts[r[3]] = counts.get(r[3], 0) + 1
            sums[r[3]] = sums.get(r[3], Decimal(0)) + Decimal(str(r[4]))
    return counts, sums


def test_stale_token_is_fenced_and_checkpoint_is_monotonic():
    tab = LeaseTable(["s0"])
    c_a = tab.take("a", "s0")
    tab.checkpoint("a", "s0", c_a, 99)
    c_b = tab.take("b", "s0")
    with pytest.raises(LeaseLostError):
        tab.checkpoint("a", "s0", c_a, 199)  # stale counter
    tab.checkpoint("b", "s0", c_b, 150)
    with pytest.raises(ValueError):
        tab.checkpoint("b", "s0", c_b, 120)  # backwards
    assert ("fenced", "s0", "a", c_a) in tab.log


def test_handoff_is_loss_free_and_duplicate_free():
    shard_rows = {f"slice={i}": _rows(i, 950) for i in range(4)}
    shard_paths = {s: f"fake/{s}.parquet" for s in shard_rows}
    counts, sums, tab = run_two_worker_replay(
        shard_paths, shard_rows, steal_shard="slice=1",
        steal_after_pages=2, page_size=100,
    )
    want_counts, want_sums = _fold(shard_rows.values())
    assert dict(counts) == want_counts
    assert dict(sums) == want_sums  # Decimal-exact: no double, no drop
    # the steal really landed mid-flight: exactly one fenced checkpoint
    assert [e for e in tab.log if e[0] == "fenced"] == [
        ("fenced", "slice=1", "worker-a", 1)
    ]
    # worker-a committed exactly steal_after_pages pages before losing
    a_ckpts = [
        e for e in tab.log
        if e[0] == "checkpoint" and e[1] == "slice=1" and e[2] == "worker-a"
    ]
    assert len(a_ckpts) == 2
    # worker-b resumed FROM worker-a's last checkpoint, not from zero
    assert tab.checkpoint_of("slice=1") == 949
    assert tab.owner_of("slice=1") == "worker-b"


def test_discarded_in_flight_page_is_redelivered_once():
    rows = _rows(0, 500)
    tab = LeaseTable(["s"])
    counts: dict = {}
    sums: dict = {}
    from collections import defaultdict

    counts, sums = defaultdict(int), defaultdict(lambda: Decimal(0))
    c_a = tab.take("a", "s")
    sess_a = ShardSession(tab, "a", "s", "fake/s.parquet", rows, c_a, 100)
    assert sess_a.read_page()
    sess_a.commit_page(counts, sums)  # page 0 committed by a
    assert sess_a.read_page()  # page 1 in flight
    c_b = tab.take("b", "s")
    with pytest.raises(LeaseLostError):
        sess_a.commit_page(counts, sums)
    # page 1's rows are NOT in the fold
    assert sum(counts.values()) == 100
    sess_b = ShardSession(tab, "b", "s", "fake/s.parquet", rows, c_b, 100)
    while sess_b.read_page():
        sess_b.commit_page(counts, sums)
    want_counts, want_sums = _fold([rows])
    assert dict(counts) == want_counts and dict(sums) == want_sums


def test_resume_at_shard_end_is_a_noop():
    rows = _rows(2, 120)
    tab = LeaseTable(["s"])
    from collections import defaultdict

    counts, sums = defaultdict(int), defaultdict(lambda: Decimal(0))
    c = tab.take("a", "s")
    sess = ShardSession(tab, "a", "s", "fake/s.parquet", rows, c, 100)
    while sess.read_page():
        sess.commit_page(counts, sums)
    c2 = tab.take("b", "s")
    sess2 = ShardSession(tab, "b", "s", "fake/s.parquet", rows, c2, 100)
    assert not sess2.read_page()  # checkpoint already at shard end
    assert sum(counts.values()) == 120


def test_lease_handoff_composes_with_fault_gauntlet():
    # contention AND network faults together: the contested shard also
    # suffers a throttle, an expired iterator, and a mid-read
    # disconnect, scheduled around the steal window — delivery must
    # still be exactly-once
    shard_rows = {f"slice={i}": _rows(i, 950) for i in range(2)}
    shard_paths = {s: f"fake/{s}.parquet" for s in shard_rows}
    plans = {
        "slice=1": {0: "throttle", 3: "expired", 6: "disconnect"},
        "slice=0": {1: "disconnect", 4: "throttle"},
    }
    counts, sums, tab = run_two_worker_replay(
        shard_paths, shard_rows, steal_shard="slice=1",
        steal_after_pages=2, page_size=100, fault_plans=plans,
    )
    want_counts, want_sums = _fold(shard_rows.values())
    assert dict(counts) == want_counts
    assert dict(sums) == want_sums
    assert [e for e in tab.log if e[0] == "fenced"]


def test_fault_during_in_flight_page_does_not_duplicate():
    # an expired iterator AFTER a page was read but before the next
    # read: the session must re-acquire after its LAST READ sequence,
    # not the lease checkpoint, or its own uncommitted page would be
    # read (and later delivered) twice
    from collections import defaultdict

    rows = _rows(0, 400)
    tab = LeaseTable(["s"])
    counts, sums = defaultdict(int), defaultdict(lambda: Decimal(0))
    c = tab.take("a", "s")
    sess = ShardSession(
        tab, "a", "s", "fake/s.parquet", rows, c, 100,
        fault_plan={1: "expired", 2: "disconnect"},
    )
    while sess.read_page():
        sess.commit_page(counts, sums)
    want_counts, want_sums = _fold([rows])
    assert dict(counts) == want_counts and dict(sums) == want_sums
