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
