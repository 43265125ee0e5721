#!/usr/bin/env python
"""Matched-canary A/B for a registered query whose code carries a
module-level variant switch (r15 verdict #1 / r16 work item #2): runs
variant A and variant B INTERLEAVED in one session — one discarded
warm-up per variant, then N kept runs each, alternating A,B,A,B so box
phase hits both equally — and writes the whole record as JSON.

Usage:
  python tools/ab_compare.py out.json QUERY MODULE ATTR A_VALUE B_VALUE [N]

A_VALUE/B_VALUE are eval()'d (e.g. "0", "1 << 60", "True", "False").
The module attribute is restored afterward. The timed action is the
bench's own methodology: cold memos, noop sink, wall-clock.
"""

from __future__ import annotations

import importlib
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
    out_path, qname, modname, attr, a_src, b_src = sys.argv[1:7]
    n = int(sys.argv[7]) if len(sys.argv) > 7 else 5
    a_val, b_val = eval(a_src), eval(b_src)  # noqa: S307 - operator CLI
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mod = importlib.import_module(modname)
    orig = getattr(mod, attr)
    spark = build_spark("kf-ab-compare")
    spark.sparkContext.setLogLevel("ERROR")
    fn = registry.queries()[qname]

    def one_run(val) -> float:
        setattr(mod, attr, val)
        registry.clear_memos()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    try:
        canary_pre = _canary(spark)
        spark.sparkContext.setJobDescription(f"ab:{qname}")
        warm = {"A": one_run(a_val), "B": one_run(b_val)}
        runs_a: list[float] = []
        runs_b: list[float] = []
        for _ in range(n):
            runs_a.append(one_run(a_val))
            runs_b.append(one_run(b_val))
        canary_post = _canary(spark)
    finally:
        setattr(mod, attr, orig)
        spark.stop()
    med_a, med_b = statistics.median(runs_a), statistics.median(runs_b)
    rec = {
        "query": qname,
        "switch": f"{modname}.{attr}",
        "A": a_src,
        "B": b_src,
        "n_kept_runs": n,
        "protocol": (
            "one session, one discarded warm-up per variant, then kept "
            "runs interleaved A,B,A,B (matched box phase); bench "
            "methodology per run (clear_memos, noop sink)"
        ),
        "warmup_discarded": warm,
        "runs_A": runs_a,
        "runs_B": runs_b,
        "median_A": med_a,
        "median_B": med_b,
        "ratio_B_over_A": round(med_b / med_a, 3) if med_a else None,
        "canary_pre_runs": canary_pre,
        "canary_post_runs": canary_post,
        "canary_ratio_pre": round(
            statistics.median(canary_pre) / CANARY_REF_SEC, 3
        ),
        "canary_ratio_post": round(
            statistics.median(canary_post) / CANARY_REF_SEC, 3
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
