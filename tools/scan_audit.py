#!/usr/bin/env python
"""Redundant-pass audit over every lazily-building registered query:
for each, count how many times the physical plan scans each source
parquet (a table scanned N>1 times is a candidate duplicated subtree
— guide §1 first-principles: how many passes are fundamentally
required?). Prints queries sorted by max duplicate-scan count.

Usage: python tools/scan_audit.py [min_scans]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clj_kinesis_to_firehose_spark import registry  # noqa: E402
from clj_kinesis_to_firehose_spark.session import build_spark  # noqa: E402


def main() -> int:
    min_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = build_spark("kf-scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()
    skip = registry.executes_on_build()
    rows = []
    for name in sorted(queries):
        if name in skip and name not in registry.conditionally_executing():
            continue
        try:
            jdf = queries[name](spark, sf_dir)._jdf
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}", file=sys.stderr)
            continue
        tables = Counter(
            m.rsplit("/", 1)[-1]
            for m in re.findall(r"Location: InMemoryFileIndex \[([^\]]+)", plan)
        )
        worst = max(tables.values(), default=0)
        if worst >= min_scans:
            rows.append((worst, name, dict(tables)))
    rows.sort(reverse=True)
    for worst, name, tables in rows:
        print(f"{worst}x {name} {tables}")
    print(f"AUDIT {len(rows)} queries with >= {min_scans} scans of one table")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
