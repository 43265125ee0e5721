"""KCL-style lease table and two-worker shard-consumption double —
the one consumer-side behavior the fault gauntlet (sources/faults.py)
doesn't model: multiple workers contending for shards, with lease
steal and CHECKPOINT FENCING [PK: the public Kinesis Client Library
semantics — a DynamoDB lease row per shard, a lease counter bumped on
every take/steal, and a checkpoint that fails when the caller's
counter is stale, which is how a worker discovers it lost the shard].

The protocol invariant this double proves end-to-end: **no record is
delivered twice across a lease handoff, and none is lost.** The
losing worker may hold an in-flight (read but uncheckpointed) page
when the steal lands; its checkpoint is rejected (fenced), it
discards the uncommitted work, and the stealing worker resumes from
the lease's checkpoint — re-reading exactly the page the loser never
committed. Deliver-then-checkpoint with visibility gated on the
checkpoint succeeding is what turns the at-least-once re-read into
exactly-once delivery.

Scale shape: the lease table is the control plane — a handful of
integers per shard, the only cross-worker state (in production a
conditional-write DynamoDB row; here an in-process dict behind the
same API). The data plane — page reads and the per-page fold — runs
entirely within each worker, so nothing here scales with record
count beyond the single pass every consumer pays. The deterministic
single-process scheduler stands in for concurrent workers the same
way the fault plan stands in for a flaky network: the interleaving
that matters (steal landing between a read and its checkpoint) is
scripted, not raced, so the test is exact.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from decimal import Decimal

from clj_kinesis_to_firehose_spark.sources.faults import (
    ExpiredIteratorError,
    FaultInjectingSliceClient,
    MidSliceDisconnect,
    ProvisionedThroughputExceeded,
)


class LeaseLostError(RuntimeError):
    """Checkpoint rejected: the lease was taken by another worker (the
    caller's lease counter is stale). The worker must discard any
    uncheckpointed work and stop processing the shard — KCL's
    shutdown-requested path."""


class LeaseTable:
    """One lease per shard: owner, fencing counter, checkpoint. The
    API mirrors the KCL lease operations that matter for correctness;
    every mutation is conditional the way the DynamoDB writes are."""

    def __init__(self, shard_ids):
        self._leases = {
            s: {"owner": None, "counter": 0, "checkpoint": -1}
            for s in shard_ids
        }
        #: audit log: (event, shard, worker, detail)
        self.log: list[tuple[str, str, str, int]] = []

    def take(self, worker: str, shard: str) -> int:
        """Acquire or STEAL the shard's lease; bumps the fencing
        counter. The previous owner is not notified — it discovers
        the loss at its next checkpoint, exactly as in KCL."""
        lease = self._leases[shard]
        lease["owner"] = worker
        lease["counter"] += 1
        self.log.append(("take", shard, worker, lease["counter"]))
        return lease["counter"]

    def checkpoint(self, worker: str, shard: str, counter: int, seq: int) -> None:
        """Conditional checkpoint: succeeds only while ``worker`` still
        holds the lease at ``counter`` (the fencing token)."""
        lease = self._leases[shard]
        if lease["owner"] != worker or lease["counter"] != counter:
            self.log.append(("fenced", shard, worker, counter))
            raise LeaseLostError(
                f"{worker} lost {shard}: lease counter {lease['counter']} "
                f"(now {lease['owner']}'s), stale token {counter}"
            )
        if seq < lease["checkpoint"]:
            raise ValueError(
                f"checkpoint moved backwards on {shard}: "
                f"{seq} < {lease['checkpoint']}"
            )
        lease["checkpoint"] = seq
        self.log.append(("checkpoint", shard, worker, seq))

    def checkpoint_of(self, shard: str) -> int:
        return self._leases[shard]["checkpoint"]

    def owner_of(self, shard: str) -> str | None:
        return self._leases[shard]["owner"]


@dataclass
class PageFold:
    """Per-page record-processor output: exact integer/decimal folds
    per event_type. Sums use Decimal so delivered value mass is
    bit-reproducible against a DECIMAL oracle — a double-delivered
    page cannot hide in float noise."""

    n: int = 0
    counts: dict = field(default_factory=lambda: defaultdict(int))
    sums: dict = field(default_factory=lambda: defaultdict(lambda: Decimal(0)))

    def add_row(self, row) -> None:
        # replay-slice row layout: (event_id, ts, user_id, event_type,
        # value, props) — see sources/pyds._COLS
        et, value = row[3], row[4]
        self.n += 1
        self.counts[et] += 1
        self.sums[et] += Decimal(str(value))

    def merge_into(self, counts, sums) -> None:
        for et, c in self.counts.items():
            counts[et] += c
        for et, s in self.sums.items():
            sums[et] += s


class ShardSession:
    """One worker's consumption of one shard: read a page, fold it,
    then commit (checkpoint → deliver). The fold is buffered between
    ``read_page`` and ``commit_page`` — the in-flight window a lease
    steal must fence."""

    def __init__(
        self,
        lease_table: LeaseTable,
        worker: str,
        shard: str,
        path: str,
        rows: list,
        counter: int,
        page_size: int = 200,
        fault_plan: dict | None = None,
        max_retries: int = 16,
    ):
        self.tab, self.worker, self.shard = lease_table, worker, shard
        self.counter = counter
        self.client = FaultInjectingSliceClient(
            path,
            page_size=page_size,
            rows=rows,
            # default {}: contention, not faults, is the double's
            # subject — pass a plan (or None for the full gauntlet) to
            # compose both (tests/test_kcl_lease.py does)
            fault_plan={} if fault_plan is None else fault_plan,
        )
        self.max_retries = max_retries
        self._read_seq = lease_table.checkpoint_of(shard)
        self.iterator = self.client.get_shard_iterator(
            after_sequence=self._read_seq
        )
        self._page: list | None = None
        self._page_last_seq = -1
        self.done = lease_table.checkpoint_of(shard) >= len(rows) - 1

    def read_page(self) -> bool:
        """Read (but do not commit) the next page, surviving the fault
        gauntlet like the single-worker loop (sources/faults.py
        consume_slice): throttle → retry the same iterator; expired
        iterator / disconnect → re-acquire AFTER the last sequence
        this session has read (NOT the lease checkpoint — an in-flight
        uncommitted page must not be re-read by its own worker).
        False at shard end."""
        if self.done or self.iterator is None:
            return False
        for _ in range(self.max_retries):
            try:
                page, self.iterator = self.client.get_records(self.iterator)
                break
            except ProvisionedThroughputExceeded:
                continue  # same iterator; backoff elided (scripted time)
            except (ExpiredIteratorError, MidSliceDisconnect):
                self.iterator = self.client.get_shard_iterator(
                    after_sequence=self._read_seq
                )
        else:
            raise RuntimeError(f"shard {self.shard}: retry budget exhausted")
        if not page:
            self.done = True
            return False
        self._page = page
        self._page_last_seq = page[-1][0]
        self._read_seq = self._page_last_seq
        if self.iterator is None:
            self.done = True  # closed-shard end reached WITH this page
        return True

    def commit_page(self, counts, sums) -> None:
        """Checkpoint the buffered page, then deliver its fold. A
        fenced checkpoint raises LeaseLostError and the page is
        DISCARDED — uncheckpointed work must never become visible
        (the stealing worker will re-read and deliver it)."""
        assert self._page is not None, "no page in flight"
        fold = PageFold()
        for _seq, row in self._page:
            fold.add_row(row)
        try:
            self.tab.checkpoint(
                self.worker, self.shard, self.counter, self._page_last_seq
            )
        except LeaseLostError:
            self._page = None  # fenced: drop the uncommitted fold
            self.done = True
            raise
        fold.merge_into(counts, sums)
        self._page = None


def run_two_worker_replay(
    shard_paths: dict[str, str],
    shard_rows: dict[str, list],
    steal_shard: str,
    steal_after_pages: int = 2,
    page_size: int = 200,
    fault_plans: dict | None = None,
):
    """Deterministic two-worker consumption of every shard with a
    scripted mid-shard lease steal on ``steal_shard``:

    1. worker-a takes the contested shard; the UNCONTESTED shards
       alternate worker-a / worker-b in sorted order (assignment is by
       position in the filtered list, not shard-name parity);
    2. worker-a commits ``steal_after_pages`` pages of ``steal_shard``,
       then reads one more page and — before checkpointing it —
       worker-b STEALS the lease;
    3. worker-a's checkpoint is fenced; it discards the in-flight fold;
    4. worker-b resumes from the lease checkpoint, re-reads exactly the
       discarded page, and drains the shard;
    5. every other shard drains under its original owner.

    Returns (counts, sums, lease_table): exact per-event_type record
    counts and Decimal value sums across all shards — equal to the
    source if and only if the handoff neither dropped nor
    double-delivered a record."""
    shards = sorted(shard_paths)
    tab = LeaseTable(shards)
    counts: dict = defaultdict(int)
    sums: dict = defaultdict(lambda: Decimal(0))

    assert steal_shard in shard_paths
    # phase 1-3: the contested shard
    c_a = tab.take("worker-a", steal_shard)
    fault_plans = fault_plans or {}
    sess_a = ShardSession(
        tab, "worker-a", steal_shard, shard_paths[steal_shard],
        shard_rows[steal_shard], c_a, page_size,
        fault_plan=fault_plans.get(steal_shard, {}),
    )
    for _ in range(steal_after_pages):
        if not sess_a.read_page():
            break
        sess_a.commit_page(counts, sums)
    in_flight = sess_a.read_page()  # read, NOT checkpointed
    c_b = tab.take("worker-b", steal_shard)  # the steal lands here
    if in_flight:
        try:
            sess_a.commit_page(counts, sums)
            raise AssertionError("stale lease token was not fenced")
        except LeaseLostError:
            pass  # worker-a discarded the uncommitted page
    # phase 4: worker-b resumes from the checkpoint
    sess_b = ShardSession(
        tab, "worker-b", steal_shard, shard_paths[steal_shard],
        shard_rows[steal_shard], c_b, page_size,
        fault_plan=fault_plans.get(steal_shard, {}),
    )
    while sess_b.read_page():
        sess_b.commit_page(counts, sums)
    # phase 5: uncontested shards drain under their assigned owners
    for i, shard in enumerate(s for s in shards if s != steal_shard):
        worker = "worker-a" if i % 2 == 0 else "worker-b"
        c = tab.take(worker, shard)
        sess = ShardSession(
            tab, worker, shard, shard_paths[shard],
            shard_rows[shard], c, page_size,
            fault_plan=fault_plans.get(shard, {}),
        )
        while sess.read_page():
            sess.commit_page(counts, sums)
    return counts, sums, tab
