"""Edge-case tests for the events TIMESTAMP(NANOS) shim — the one
piece of I/O the whole engine routes through (SURVEY.md §1.2)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_ns_shim_truncates_like_duckdb_on_edges(spark, oracle_con):
    # crafted nanos: zero, sub-µs remainders, end-of-range fixture-era
    # values; the shim (integer div 1000) must equal DuckDB's ns→µs
    # truncation exactly
    nanos = [
        0,
        999,            # < 1 µs → truncates to epoch
        1000,
        1_704_067_199_999_999_999,  # 2023-12-31 23:59:59.999999999
        1_704_067_200_000_000_001,  # 2024-01-01 00:00:00.000000001
        1_706_571_839_123_456_789,
    ]
    df = spark.createDataFrame([(n,) for n in nanos], "ts long").select(
        F.expr("timestamp_micros(ts div 1000)").alias("ts")
    )
    got = [r["ts"] for r in df.collect()]
    expected = [
        oracle_con.execute(
            "SELECT make_timestamp(CAST(? AS BIGINT) // 1000)", [n]
        ).fetchone()[0]
        for n in nanos
    ]
    assert got == expected


def test_events_loader_schema(spark):
    from clj_kinesis_to_firehose_spark.sources import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # a sanity row: value verified against DuckDB in scan_events_ns;
    # here just prove the column is a usable timestamp
    row = ev.filter(F.col("event_id") == 0).collect()[0]
    assert isinstance(row["ts"], datetime.datetime)


def test_fan_out_trusts_splittable_large_files(spark, tmp_path):
    """A single LARGE parquet file already splits at maxPartitionBytes —
    fan_out must not add a full-shuffle repartition for it; a single
    small file still fans out."""
    from clj_kinesis_to_firehose_spark.sources.loader import fan_out

    p = str(tmp_path / "one.parquet")
    spark.range(50_000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    df = spark.read.parquet(p)
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        assert fan_out(spark, df) is df, "splittable big file must not repartition"
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 40))
        assert fan_out(spark, df) is not df, "unsplittable small-file scan fans out"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_parse_byte_size_unit_suffixes():
    """Spark byte-size confs carry k/m/g suffixes ("128m" is 128 MiB,
    not 128 bytes — advisor finding, round 4); fan_out's split estimate
    must honor them or it silently never repartitions."""
    from clj_kinesis_to_firehose_spark.sources.loader import _parse_byte_size

    assert _parse_byte_size("134217728") == 128 * 1024 * 1024
    assert _parse_byte_size("134217728b") == 128 * 1024 * 1024
    assert _parse_byte_size("128m") == 128 * 1024 * 1024
    assert _parse_byte_size("128M") == 128 * 1024 * 1024
    assert _parse_byte_size("1g") == 1024 ** 3
    assert _parse_byte_size("512k") == 512 * 1024
    assert _parse_byte_size(" 64m ") == 64 * 1024 * 1024


def test_fan_out_honors_suffixed_max_partition_bytes(spark, tmp_path):
    """With maxPartitionBytes set via an "m" suffix, a small single
    file is UNsplittable at that size and must still fan out (the old
    digit-strip parse read "32m" as 32 bytes and skipped the
    repartition)."""
    from clj_kinesis_to_firehose_spark.sources.loader import fan_out

    p = str(tmp_path / "small.parquet")
    spark.range(1000).coalesce(1).write.mode("overwrite").parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    df = spark.read.parquet(p)
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "32m")
        assert fan_out(spark, df) is not df, "suffixed conf must parse as MiB"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_parse_byte_size_two_letter_suffixes():
    """Spark's byteStringAs also accepts two-letter forms ("32mb",
    "1gb") — they must parse as MiB/GiB, not fall back to the default
    through a ValueError (review finding, round 5)."""
    from clj_kinesis_to_firehose_spark.sources.loader import _parse_byte_size

    assert _parse_byte_size("32mb") == 32 * 1024 * 1024
    assert _parse_byte_size("1gb") == 1024 ** 3
    assert _parse_byte_size("512kb") == 512 * 1024
    assert _parse_byte_size("2tb") == 2 * 1024 ** 4
    assert _parse_byte_size("10B") == 10
