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
    s = build_spark("kf-tests", cpus=int(os.environ.get("KF_TEST_CPUS", "8")))
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
