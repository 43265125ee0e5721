"""Physical-plan audit helpers (SURVEY.md §4): machine-checkable
assertions that the plans Catalyst produces are the plans we designed
for 100 TB — filters reaching the parquet scan, dimension joins
broadcast, codegen fused, no stray shuffles.

Used by tests/test_plans.py; also handy interactively:

    from clj_kinesis_to_firehose_spark.plans.audit import plan_report
    print(plan_report(df))
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.removeprefix("PushedFilters:").strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the column-pruning audit surface."""
    return [
        line.strip().removeprefix("ReadSchema:").strip()
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def _count_nodes(df: DataFrame, node: str) -> int:
    # formatted explain prints each node once in the tree ("+- Exchange
    # (5)") and once as a detail header ("(5) Exchange"); count detail
    # headers only. \b keeps plain Exchange from matching the inside of
    # BroadcastExchange.
    import re

    return len(re.findall(rf"\(\d+\) {node}\b", formatted_plan(df)))


def n_shuffles(df: DataFrame) -> int:
    """Shuffle exchanges only (BroadcastExchange is not a shuffle)."""
    return _count_nodes(df, "Exchange")


def n_broadcast_joins(df: DataFrame) -> int:
    return _count_nodes(df, "BroadcastHashJoin")


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True if the EXECUTED plan contains fused codegen stages.

    Under AQE the pre-execution plan is a bare AdaptiveSparkPlan with
    no codegen annotation — stages are planned (and fused) at runtime,
    so this runs the query (collect; call on small/test-scale frames
    only) and inspects the final adaptive plan.
    """
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    # fused stages print as "*(N) Operator" in the compact plan form
    return "WholeStageCodegen" in executed or "*(" in executed


def executed_plan(df: DataFrame) -> str:
    """Final ADAPTIVE plan string — runs the query (collect; call on
    test-scale frames only). Use for properties only AQE can decide,
    e.g. an unhinted join that should broadcast at runtime."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def n_broadcast_joins_executed(df: DataFrame) -> int:
    import re

    return len(re.findall(r"BroadcastHashJoin", executed_plan(df)))


def plan_report(df: DataFrame) -> str:
    return (
        f"shuffles(Exchange): {n_shuffles(df)}\n"
        f"broadcast joins:    {n_broadcast_joins(df)}\n"
        f"pushed filters:     {pushed_filters(df)}\n"
        f"read schemas:       {read_schemas(df)}\n"
        f"codegen:            {has_whole_stage_codegen(df)}\n"
    )
