#!/usr/bin/env python
"""Time EVERY lazily-building registered query with the bench's
methodology (cold memos, noop sink), one pass in registration order,
and write a JSON ranking — the guide §1 measure-first step for a
whole-engine triage. One run per query keeps the sweep ~30 min; rank
candidates get confirmed with tools/time_queries.py -n 3 afterwards.

Usage: python tools/time_all.py out.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clj_kinesis_to_firehose_spark import registry  # noqa: E402
from clj_kinesis_to_firehose_spark.session import build_spark  # noqa: E402

CANARY_REF_SEC = 0.343  # bench.py's r13 record-box anchor


def _canary(spark) -> list[float]:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 600_000_000, 1, 32).selectExpr(
            "sum(id * (id % 7)) AS s"
        ).collect()
        runs.append(round(time.perf_counter() - t0, 3))
    return runs


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "plans/r16/time_all.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark("kf-time-all")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()
    skip = registry.executes_on_build()
    cond = registry.conditionally_executing()
    canary_pre = _canary(spark)
    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name in sorted(queries):
        if name in skip and name not in cond:
            continue
        registry.clear_memos()
        spark.sparkContext.setJobDescription(f"time-all: {name}")
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 - survey tool
            errs[name] = repr(exc)[:200]
        print(f"{name} {times.get(name, 'ERR')}", flush=True)
    canary_post = _canary(spark)
    spark.stop()
    rec = {
        "sf_dir": sf_dir,
        "n_runs_per_query": 1,
        "canary_pre_runs": canary_pre,
        "canary_post_runs": canary_post,
        "canary_ratio_pre": round(
            statistics.median(canary_pre) / CANARY_REF_SEC, 3
        ),
        "canary_ratio_post": round(
            statistics.median(canary_post) / CANARY_REF_SEC, 3
        ),
        "errors": errs,
        "times_desc": dict(
            sorted(times.items(), key=lambda kv: -kv[1])
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(f"WROTE {out_path} ({len(times)} queries, {len(errs)} errors)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
