"""Repo-wide scale-smell lint: every registered batch query's physical
plan is checked for the two classes of operator that kill a 100 TB run —
unbounded cartesian products and row-at-a-time Python evaluation — with
an explicit allowlist for the ops whose contract *is* that shape.

Plans are built lazily (explain only, nothing executed), so this sweeps
all queries in seconds; ops that execute work at build time (streaming
replays, maintenance rewrites, persisted-index builds) declare it at
registration with ``executes_on_build=True`` and are skipped here —
the flag's accuracy is itself enforced by test_correctness's action
probe (a lazy flagged op or an unflagged executing op fails there), so
this skip set can be neither stale nor incomplete while the suite is
green."""

from __future__ import annotations

import pytest

from clj_kinesis_to_firehose_spark import registry
from clj_kinesis_to_firehose_spark.plans import audit
from tests.conftest import SF_DIR

QUERIES = registry.queries()

EXECUTES_ON_BUILD = registry.executes_on_build()

#: ops whose semantics are a deliberate bounded cross product. As of
#: this audit NO query plans a CartesianProduct node (every crossJoin
#: resolves to BroadcastNestedLoopJoin over a tiny broadcast side);
#: join_cross stays allowlisted because a cross product is its
#: contract, so a stats shift there is not a regression.
CARTESIAN_OK = {
    "join_cross",
}

#: ops whose contract IS the row-at-a-time Python surface (SURVEY §2
#: K1/K5). Arrow-batched crossings (ArrowEvalPython, FlatMapGroupsIn
#: Pandas, MapInPandas) are always allowed — only BatchEvalPython is
#: the smell.
PYTHON_OK = {
    "udf_python",
    "udtf_python",
}

_LINTABLE = sorted(set(QUERIES) - EXECUTES_ON_BUILD)


@pytest.mark.parametrize("name", _LINTABLE)
def test_no_scale_smells_in_plan(name, spark):
    plan = audit.formatted_plan(QUERIES[name](spark, SF_DIR))
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, (
            f"{name}: unexpected cartesian product\n{plan}"
        )
    if name not in PYTHON_OK:
        # BatchEvalPython = row-at-a-time python; ArrowEvalPython /
        # FlatMapGroupsInPandas etc. are the vectorized crossings
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF in hot path\n{plan}"
        )
