#!/usr/bin/env python
"""Capture .explain('formatted') output for bench queries into
$PLANS_DIR/<query>_<suffix>.txt (optimization-round evidence;
PLANS_DIR defaults to plans/r16).

Usage: python tools/capture_plans.py before [query ...]
       python tools/capture_plans.py after  [query ...]

With no query names, captures every HEADLINE + EXTENDED bench query
that builds lazily (executes_on_build ops are skipped unless named
explicitly — building their DataFrame runs real jobs)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from clj_kinesis_to_firehose_spark import registry  # noqa: E402
from clj_kinesis_to_firehose_spark.session import build_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.environ.get("PLANS_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16")
    os.makedirs(outdir, exist_ok=True)
    spark = build_spark("kf-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()
    explicit = bool(names)
    if not names:
        names = [n for n in bench.HEADLINE + bench.EXTENDED
                 if n not in registry.executes_on_build()
                 or n in registry.conditionally_executing()]
    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not registered")
            continue
        if (not explicit and name in registry.executes_on_build()
                and name not in registry.conditionally_executing()):
            print(f"SKIP {name}: executes_on_build")
            continue
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"WROTE {path} ({len(plan.splitlines())} lines)")
        except Exception as e:  # capture everything it can
            print(f"ERROR {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
