"""Operator registry — the bridge between operator modules and the
driver contract in ``__spark_entry__.py``.

Each operator module registers its queries with :func:`register`;
``queries()`` / ``oracle_sql()`` aggregate them. An operator with an
``oracle`` SQL string gets the driver's exact DuckDB hash-check; one
without gets the weaker rows-only check (SURVEY.md §2 "weak").
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

#: operator modules imported by :func:`_load_all`; append as categories land.
_OPERATOR_MODULES = [
    "scans",
    "filters",
    "joins",
    "aggregates",
    "windows",
    "sorts",
    "setops",
    "scalars",
    "relational_ext",
    "timewindows",
    "llm_dedup",
    "llm_similarity",
    "llm_clustering",
    "analytics",
    "llm_text",
    "multimodal",
    "udfs",
    "streaming_ops",
    "quality",
    "graph",
    "composites",
    "composites_ext",
    "analytics_ext",
    "ml_features",
]

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate operator registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


def _load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(f"clj_kinesis_to_firehose_spark.operators.{mod}")
    _loaded = True


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
