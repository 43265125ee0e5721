"""Loop-body plan capture (r15 verdict #2 / r16 work item #4).

Driver-sequential loops (the kmeans fit, the scaled BPE merge loop,
the distributed BT MM loop) run their per-iteration jobs while the
registered query's DataFrame is still being BUILT, so those jobs'
plans never appear in the registered DF's own ``explain`` — the
before/after .txt evidence the optimization rounds commit is blind to
them. When ``$CAPTURE_ITER_PLANS`` names a directory, the loops call
:func:`capture_iter_plan` on one representative iteration's DataFrame
and the formatted plan lands there as ``<name>.txt``; unset (the
normal case, including the bench and the driver) the hook is a single
dict lookup and does nothing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def capture_iter_plan(df: DataFrame, name: str) -> None:
    """Write ``df``'s ``explain('formatted')`` to
    ``$CAPTURE_ITER_PLANS/<name>.txt`` when that env var is set."""
    out = os.environ.get("CAPTURE_ITER_PLANS")
    if not out:
        return
    try:
        spark = df.sparkSession
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, f"{name}.txt"), "w") as fh:
            fh.write(plan)
    except Exception:  # capture is best-effort evidence, never a failure
        pass
