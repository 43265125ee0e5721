"""Property tests for the fixed-point oracle toolkit: the floor-div
SQL rewrite and the portable 60-bit hash must agree with their Python
twins for EVERY input, not just fixture values — these two primitives
carry the exactness of the whole r14 ANN/kmeans/PQ family, so their
cross-engine laws get Hypothesis coverage of the sign/boundary space
pytest fixtures never reach."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from clj_kinesis_to_firehose_spark.functions import fdiv_sql

_CON = duckdb.connect()


@settings(max_examples=300, deadline=None)
@given(
    a=st.integers(min_value=-(10**15), max_value=10**15),
    b=st.integers(min_value=1, max_value=10**9),
)
def test_fdiv_sql_equals_python_floor_division(a, b):
    # DuckDB's native // truncates toward zero; the rewrite must floor
    # like Python's //, for either sign of the dividend
    got = _CON.execute(
        f"SELECT {fdiv_sql(str(a), str(b))}"
    ).fetchone()[0]
    assert got == a // b, (a, b, got)


@settings(max_examples=200, deadline=None)
@given(s=st.text(min_size=0, max_size=64))
def test_portable_hash60_sql_twin_matches_md5_definition(s):
    # SQL_HASH60's contract: first 15 md5 hex chars parsed base-16 —
    # replay the definition in pure Python against DuckDB's evaluation
    from clj_kinesis_to_firehose_spark.operators.llm_dedup import SQL_HASH60

    expect = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    got = _CON.execute(
        "SELECT " + SQL_HASH60.format(x="?"), [s]
    ).fetchone()[0]
    assert got == expect, s


@settings(max_examples=200, deadline=None)
@given(
    v=st.lists(
        st.floats(
            min_value=-1.0,
            max_value=1.0,
            allow_nan=False,
            width=32,
        ).filter(lambda x: abs(x) > 1e-6),
        min_size=2,
        max_size=64,
    )
)
def test_nq_quantization_sql_twin_matches_left_fold_definition(v):
    # the r15 graph-ANN exactness rests on nq = FLOOR(x/‖x‖·1e6) being
    # identical in Spark and DuckDB. Spark's F.aggregate is a strict
    # left fold over doubles; DuckDB's LIST_SUM must keep matching it
    # (if DuckDB ever switched to pairwise summation the quantization
    # could flip a unit on a boundary value). Replay the left fold in
    # pure Python as the definition and pin DuckDB to it.
    import math

    s = 0.0
    for x in v:
        s += x * x
    norm = math.sqrt(s)
    expect = [math.floor(x / norm * 1000000.0) for x in v]
    got = _CON.execute(
        """
        SELECT LIST_TRANSFORM(
          LIST_TRANSFORM(?::FLOAT[], x -> CAST(x AS DOUBLE)),
          x -> CAST(FLOOR(x / SQRT(LIST_SUM(LIST_TRANSFORM(
                 LIST_TRANSFORM(?::FLOAT[], y -> CAST(y AS DOUBLE)),
                 y -> y * y))) * 1000000.0) AS BIGINT))
        """,
        [v, v],
    ).fetchone()[0]
    assert got == expect, (v, got, expect)
