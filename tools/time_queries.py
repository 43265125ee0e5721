#!/usr/bin/env python
"""Time individual registered queries with the bench's exact
methodology (build_spark session, cold memos per run, noop sink,
median of N) — the per-query measurement loop of guide §1, without
paying for the whole bench.

Usage: python tools/time_queries.py [-n RUNS] name [name...]

Prints per-run seconds and the median for each query, plus the box
canary so numbers can be compared across sessions/boxes the same way
BENCH JSON lines are (sec / canary_ratio).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clj_kinesis_to_firehose_spark import registry  # noqa: E402
from clj_kinesis_to_firehose_spark.session import build_spark  # noqa: E402

CANARY_REF_SEC = 0.343  # bench.py's r13 record-box anchor


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    if not args:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark("kf-time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    canary_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 600_000_000, 1, 32).selectExpr(
            "sum(id * (id % 7)) AS s"
        ).collect()
        canary_runs.append(round(time.perf_counter() - t0, 3))
    canary = statistics.median(canary_runs)
    ratio = round(canary / CANARY_REF_SEC, 3)
    print(f"canary {canary}s ratio {ratio} runs {canary_runs}", flush=True)
    queries = registry.queries()
    for name in args:
        fn = queries[name]
        runs = []
        for _ in range(n):
            registry.clear_memos()
            spark.sparkContext.setJobDescription(f"time: {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        med = statistics.median(runs)
        print(
            f"{name} median {med}s (normalized {round(med / ratio, 3)}) "
            f"runs {runs}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
