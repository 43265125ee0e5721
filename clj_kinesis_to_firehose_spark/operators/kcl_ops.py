"""Registered query for the KCL-style two-worker lease double
(sources/kcl_lease.py): multi-worker shard consumption with lease
steal and checkpoint fencing, proven exactly-once against the events
oracle. Registers LAST (registry._OPERATOR_MODULES) so the standing
driver backlog adjudicates first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clj_kinesis_to_firehose_spark.registry import register


@register(
    "stream_kcl_lease_failover",
    # build executes only when the replay-slice memo is cold (worker
    # consumption is driver-side Python; the result is a LocalRelation)
    executes_on_build="conditional",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_records,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_value
    FROM events GROUP BY event_type
    """,
)
def stream_kcl_lease_failover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two workers consume the 4-shard replay under a KCL-style lease
    table; worker-b STEALS a shard from worker-a mid-read, landing the
    steal in the window between a page read and its checkpoint —
    worker-a's checkpoint is fenced (stale lease counter), it discards
    the uncommitted page, and worker-b re-reads it from the lease
    checkpoint. The oracle is the untouched events table: the handoff
    must be invisible — exact per-event_type record counts and value
    mass (Decimal-folded, so a double-delivered or dropped page cannot
    hide in float noise). The op additionally asserts the fencing
    actually fired (a run where the steal landed between pages would
    vacuously pass the aggregate check).

    Scale shape: leases are the control plane — a few integers per
    shard, the only cross-worker state (a conditional-write DynamoDB
    row in production). Each worker folds only its own shards' pages;
    the deterministic in-process scheduler scripts the one
    interleaving that matters instead of racing threads, so the
    exactly-once claim is checked, not sampled."""
    import glob
    import os

    from clj_kinesis_to_firehose_spark.sources.kcl_lease import (
        run_two_worker_replay,
    )
    from clj_kinesis_to_firehose_spark.sources.pyds import _read_rows
    from clj_kinesis_to_firehose_spark.sources.streams import (
        write_replay_slices,
    )

    replay = write_replay_slices(spark, sf_dir, n_slices=4)
    shard_paths: dict[str, str] = {}
    for d in sorted(glob.glob(os.path.join(replay, "slice=*"))):
        [pq] = glob.glob(os.path.join(d, "*.parquet"))
        shard_paths[os.path.basename(d)] = pq
    shard_rows = {s: list(_read_rows(p)) for s, p in shard_paths.items()}
    # adaptive paging: ~8 pages per shard at ANY fixture SF, so the
    # steal (after 3 committed pages) always lands mid-shard with an
    # uncommitted page in flight — never vacuously after shard end
    page_size = max(1, len(shard_rows["slice=1"]) // 8)
    counts, sums, tab = run_two_worker_replay(
        shard_paths, shard_rows, steal_shard="slice=1",
        steal_after_pages=3, page_size=page_size,
    )
    fenced = [e for e in tab.log if e[0] == "fenced"]
    if not fenced:
        # explicit raise, not a bare assert: the guard must hold under
        # python -O too — an inert steal would otherwise vacuously pass
        # the aggregate oracle
        raise AssertionError("lease steal never fenced a checkpoint — double inert")
    rows = [
        (et, counts[et], float(sums[et])) for et in sorted(counts)
    ]
    return spark.createDataFrame(
        rows, "event_type string, n_records long, sum_value double"
    )
