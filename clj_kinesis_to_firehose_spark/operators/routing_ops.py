"""Producer-side shard routing — Kinesis hash-RANGE semantics.

The consumer-side ops model shard lineage (stream_reshard_replay),
leases (stream_kcl_lease_failover), and delivery; what none of them
model is how records pick a shard in the first place. The real
contract [PK: Kinesis PutRecord(s) API docs]:

* every shard owns a CONTIGUOUS [StartingHashKey, EndingHashKey]
  range of the 2^128 md5 hash space (ranges are what split/merge
  actually bisect and union);
* a record routes to the shard whose range contains
  ``md5(partition_key)`` — NOT a modulo: after resharding, ranges are
  unequal, and throughput per shard is proportional to range width
  only while the key hash stays uniform;
* a KPL producer may override routing with an EXPLICIT HASH KEY
  (the ``explicit_hash_key_table`` the deaggregator at
  sources/kinesis.py already parses) — the record then routes by
  that value, letting producers pin related records to one shard
  regardless of partition key.

``kinesis_shard_routing`` implements the range-ownership model over
the repo's portable 60-bit hash space (same scale-down the reshard
replay documents: 2^60 instead of 2^128, bit-identical in both
engines) with a deliberately UNEQUAL post-reshard shard map, plus the
explicit-hash-key override for a deterministic subset of producers.
The DuckDB oracle rebuilds the identical map, so range containment —
not just distribution — is hash-checked.

Scale shape: the shard map is an 8-row constant — broadcast by
construction, the range join is a map-side interval lookup, and the
only shuffle is the final per-shard aggregation. At a real 100 TB
replay the shard map stays O(shards), never O(data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.operators.llm_dedup import portable_hash60
from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table

#: 2^56 — one sixteenth of the 60-bit hash space; shard ranges are
#: integer multiples so both engines compute boundaries exactly
_SIXTEENTH = 1 << 56

#: post-reshard shard map: UNEQUAL contiguous ranges (widths in
#: sixteenths: 1,3,2,1,4,2,1,2 — the shape a split/merge history
#: leaves behind). The oracle SQL hard-codes the same boundaries.
_CUM = [0, 1, 4, 6, 7, 11, 13, 14, 16]
SHARD_MAP = [
    (f"shardId-{i:03d}", _CUM[i] * _SIXTEENTH, _CUM[i + 1] * _SIXTEENTH)
    for i in range(8)
]


@register(
    "kinesis_shard_routing",
    oracle="""
    WITH rec AS (
      SELECT user_id, event_id,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT)
               AS pk_hash,
             CASE WHEN user_id % 11 = 0
                  THEN (event_id % 65536) * 17592186044416
                  ELSE NULL END AS ehk
      FROM events
    ), routed AS (
      SELECT user_id, COALESCE(ehk, pk_hash) AS hk,
             (ehk IS NOT NULL) AS is_explicit
      FROM rec
    ), shards AS (
      SELECT * FROM (VALUES
        ('shardId-000', CAST(0 AS BIGINT), 1 * 72057594037927936),
        ('shardId-001', 1 * 72057594037927936, 4 * 72057594037927936),
        ('shardId-002', 4 * 72057594037927936, 6 * 72057594037927936),
        ('shardId-003', 6 * 72057594037927936, 7 * 72057594037927936),
        ('shardId-004', 7 * 72057594037927936, 11 * 72057594037927936),
        ('shardId-005', 11 * 72057594037927936, 13 * 72057594037927936),
        ('shardId-006', 13 * 72057594037927936, 14 * 72057594037927936),
        ('shardId-007', 14 * 72057594037927936, 16 * 72057594037927936)
      ) AS t(shard_id, hk_start, hk_end)
    )
    SELECT s.shard_id, s.hk_start, s.hk_end,
           COUNT(*) AS n_records,
           COUNT(DISTINCT r.user_id) AS n_keys,
           CAST(SUM(CASE WHEN r.is_explicit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_explicit,
           MIN(r.hk) AS min_hk, MAX(r.hk) AS max_hk
    FROM routed r
    JOIN shards s ON r.hk >= s.hk_start AND r.hk < s.hk_end
    GROUP BY s.shard_id, s.hk_start, s.hk_end
    """,
)
def kinesis_shard_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # range-ownership routing: hk = md5(partition_key) unless the
    # producer set an explicit hash key (every 11th user's producer
    # does, spread over the space by event_id). The interval join
    # against the 8-row map broadcasts by construction — O(1) dim,
    # allowed a hint per SCALE.md's rule — and min/max per shard
    # prove containment, not just counts.
    ev = load_table(spark, sf_dir, "events")
    pk_hash = portable_hash60(F.col("user_id").cast("string"))
    ehk = F.when(
        F.col("user_id") % 11 == 0,
        (F.col("event_id") % 65536) * F.lit(1 << 44),
    )
    routed = ev.select(
        "user_id",
        F.coalesce(ehk, pk_hash).alias("hk"),
        ehk.isNotNull().alias("is_explicit"),
    )
    shards = spark.createDataFrame(
        SHARD_MAP, "shard_id string, hk_start long, hk_end long"
    )
    return (
        routed.join(
            F.broadcast(shards),
            (F.col("hk") >= F.col("hk_start"))
            & (F.col("hk") < F.col("hk_end")),
        )
        .groupBy("shard_id", "hk_start", "hk_end")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("user_id").alias("n_keys"),
            F.sum(F.col("is_explicit").cast("long")).alias("n_explicit"),
            F.min("hk").alias("min_hk"),
            F.max("hk").alias("max_hk"),
        )
    )


#: the stream after one split and one merge [PK: SplitShard bisects a
#: parent's range into two NEW child shards; MergeShards unions two
#: adjacent parents into one NEW child]: shardId-004 ([7,11)
#: sixteenths) splits at 9 into -008/-009, shardId-005+006 ([11,14))
#: merge into -010; every other range is untouched.
SHARD_MAP_V2 = [
    (sid, lo, hi)
    for sid, lo, hi in SHARD_MAP
    if sid not in ("shardId-004", "shardId-005", "shardId-006")
] + [
    ("shardId-008", 7 * _SIXTEENTH, 9 * _SIXTEENTH),
    ("shardId-009", 9 * _SIXTEENTH, 11 * _SIXTEENTH),
    ("shardId-010", 11 * _SIXTEENTH, 14 * _SIXTEENTH),
]


@register(
    "kinesis_reshard_range_migration",
    oracle="""
    WITH routed AS (
      SELECT user_id,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT)
               AS hk
      FROM events
    ), v1 AS (
      SELECT * FROM (VALUES
        ('shardId-000', CAST(0 AS BIGINT), 1 * 72057594037927936),
        ('shardId-001', 1 * 72057594037927936, 4 * 72057594037927936),
        ('shardId-002', 4 * 72057594037927936, 6 * 72057594037927936),
        ('shardId-003', 6 * 72057594037927936, 7 * 72057594037927936),
        ('shardId-004', 7 * 72057594037927936, 11 * 72057594037927936),
        ('shardId-005', 11 * 72057594037927936, 13 * 72057594037927936),
        ('shardId-006', 13 * 72057594037927936, 14 * 72057594037927936),
        ('shardId-007', 14 * 72057594037927936, 16 * 72057594037927936)
      ) AS t(shard_id, lo, hi)
    ), v2 AS (
      SELECT * FROM (VALUES
        ('shardId-000', CAST(0 AS BIGINT), 1 * 72057594037927936),
        ('shardId-001', 1 * 72057594037927936, 4 * 72057594037927936),
        ('shardId-002', 4 * 72057594037927936, 6 * 72057594037927936),
        ('shardId-003', 6 * 72057594037927936, 7 * 72057594037927936),
        ('shardId-007', 14 * 72057594037927936, 16 * 72057594037927936),
        ('shardId-008', 7 * 72057594037927936, 9 * 72057594037927936),
        ('shardId-009', 9 * 72057594037927936, 11 * 72057594037927936),
        ('shardId-010', 11 * 72057594037927936, 14 * 72057594037927936)
      ) AS t(shard_id, lo, hi)
    )
    SELECT a.shard_id AS shard_before, b.shard_id AS shard_after,
           COUNT(*) AS n_records,
           COUNT(DISTINCT r.user_id) AS n_keys
    FROM routed r
    JOIN v1 a ON r.hk >= a.lo AND r.hk < a.hi
    JOIN v2 b ON r.hk >= b.lo AND r.hk < b.hi
    GROUP BY a.shard_id, b.shard_id
    """,
)
def kinesis_reshard_range_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # resharding IS range surgery: after a split+merge, a record's
    # shard can change ONLY if its hash key lies in a bisected or
    # unioned range — the transition matrix must be identity outside
    # shardId-004/005/006 (pinned in tests/test_round8_ext.py), and
    # at 100 TB that locality is why a reshard doesn't re-route the
    # stream, it re-keys two ranges. Both maps broadcast (O(shards)).
    ev = load_table(spark, sf_dir, "events")
    routed = ev.select(
        "user_id",
        portable_hash60(F.col("user_id").cast("string")).alias("hk"),
    )
    v1 = spark.createDataFrame(SHARD_MAP, "shard_before string, lo1 long, hi1 long")
    v2 = spark.createDataFrame(
        SHARD_MAP_V2, "shard_after string, lo2 long, hi2 long"
    )
    return (
        routed.join(
            F.broadcast(v1),
            (F.col("hk") >= F.col("lo1")) & (F.col("hk") < F.col("hi1")),
        )
        .join(
            F.broadcast(v2),
            (F.col("hk") >= F.col("lo2")) & (F.col("hk") < F.col("hi2")),
        )
        .groupBy("shard_before", "shard_after")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("user_id").alias("n_keys"),
        )
    )
