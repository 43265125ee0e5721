"""Fixture-schema canary: the exact oracles in this repo are authored
against these physical parquet schemas. When a driver revision
regenerates the fixtures with different types (it happened in round 3:
events.ts went TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and broke every
events query), this test fails FIRST with a message naming the drift —
instead of hundreds of cascading oracle errors."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

#: (table, column) → accepted pyarrow type strings. Multiple entries =
#: revisions the loader normalizes transparently (sources/loader.py).
EXPECTED = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {"n_nationkey": {"int32"}, "n_regionkey": {"int32"}},
    "customer": {"c_custkey": {"int64"}, "c_acctbal": {"double"}},
    "supplier": {"s_suppkey": {"int64"}, "s_acctbal": {"double"}},
    "part": {"p_partkey": {"int64"}, "p_size": {"int32"},
             "p_retailprice": {"double"}},
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_totalprice": {"double"},
        # date-typed revisions would change DuckDB DATE_TRUNC/casting
        # semantics vs Spark — re-audit oracles before widening this
        "o_orderdate": {"timestamp[us]", "timestamp[ns]"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        # loader normalizes all three of these revisions to TimestampType
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


def _write_events_variant(tmpdir: str, unit: str) -> str:
    """Synthesize a tiny events.parquet with ``ts`` in the given
    physical unit ('us' → TIMESTAMP_NTZ revision, 'ns' →
    TIMESTAMP(NANOS) revision, read as long nanos under the engine's
    nanosAsLong conf). Returns the directory usable as ``sf_dir``."""
    import pyarrow as pa

    # 1.7e18 ns epoch ≈ 2023-11; the +1500 ns tail on row 2 must
    # truncate (not round) to the same µs in both loader paths
    ns_values = [1_700_000_000_000_000_000, 1_700_000_000_000_001_500]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [v // 1000 if unit == "us" else v for v in ns_values],
                pa.timestamp(unit),
            ),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"a":1}', '{"b":2}']),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet", version="2.6")
    return tmpdir


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_loader_normalizes_both_ts_revisions(spark, tmp_path, unit):
    """Drill for the r02 incident: regenerated fixtures flipped
    events.ts between TIMESTAMP(NANOS) and TIMESTAMP(MICROS)/NTZ and
    crashed 17 ops mid-sweep. Exercise BOTH loader normalization paths
    (sources/loader.py::_normalize_ts) against synthesized files so the
    next fixture flip fails here before a driver sweep burns a round."""
    from clj_kinesis_to_firehose_spark.sources.loader import load_table

    sf_dir = _write_events_variant(str(tmp_path), unit)
    df = load_table(spark, sf_dir, "events")
    assert str(df.schema["ts"].dataType) == "TimestampType()", (
        f"{unit} revision: loader produced {df.schema['ts'].dataType}, "
        "oracles assume session-tz TimestampType"
    )
    rows = {r["event_id"]: r["ts"] for r in df.select("event_id", "ts").collect()}
    # both revisions must land on identical µs instants (ns truncates)
    assert rows[1].isoformat() == "2023-11-14T22:13:20"
    assert rows[2].isoformat() == "2023-11-14T22:13:20.000001"


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_matches_oracle_assumptions(table):
    schema = pq.read_schema(f"{SF_DIR}/{table}.parquet")
    actual = {f.name: str(f.type) for f in schema}
    drift = []
    for col, accepted in EXPECTED[table].items():
        if col not in actual:
            drift.append(f"{table}.{col}: MISSING (fixture columns: {sorted(actual)})")
        elif actual[col] not in accepted:
            drift.append(
                f"{table}.{col}: fixture has {actual[col]!r}, oracles were "
                f"authored against {sorted(accepted)} — driver regenerated "
                f"the fixtures; re-audit loader normalization and oracles"
            )
    assert not drift, "\n".join(drift)
