from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clj_kinesis_to_firehose_spark.session import build_spark  # noqa: E402
from clj_kinesis_to_firehose_spark.sources import TABLES  # noqa: E402

# t2 correctness runs at sf0.01 (TESTDATA.md); tests use the same SF so a
# green pytest run predicts the driver's oracle gate.
SF_DIR = os.environ.get("KF_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # default 4 local cores (r16, r15 verdict #8): at sf0.01 the
    # suite's streaming block is micro-batch-machinery-bound, not
    # compute-bound — the three stream-stream-join oracles read 140 s
    # at 8 cores vs 103 s at 4 (26% of that block), while the
    # compute-heavy modules (round12 kernels + fixed-point properties)
    # measured identical (94.6 vs 93.0 s). Override via KF_TEST_CPUS.
    s = build_spark("kf-tests", cpus=int(os.environ.get("KF_TEST_CPUS", "4")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
