#!/usr/bin/env python
"""Scale probe for the packing fold's bucket contract: times
``_packed_entries`` (the greedy JVM fold) and the FFD fold over
synthetic (doc_id, bucket, cost) relations of growing size, printing
rows/s per step. The claim under test is the SCALE.md one — per-bucket
work is constant, so wall-clock grows linearly with the corpus (the
bucket count), not quadratically and not single-reducer-bound.

Synthetic costs are a pure function of doc_id (portable-hash-free here
— the probe times the fold, not the tokenizer), so runs are
deterministic and need no fixture I/O.

Usage: python tools/pack_scale_probe.py [sizes...]   (default 1e5 1e6)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from clj_kinesis_to_firehose_spark.operators.curation_r15 import (
        PACK_BUCKET_SIZE,
        _ffd_fold,
        _packed_entries,
    )
    from clj_kinesis_to_firehose_spark.session import build_spark

    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = build_spark("pack-scale-probe", cpus=32)
    results = []
    for n in sizes:
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.expr(f"CAST(id div {PACK_BUCKET_SIZE} AS BIGINT)").alias(
                "bucket"
            ),
            (F.pmod(F.col("id") * 2654435761, F.lit(90)) + 10)
            .cast("long")
            .alias("cost"),
        )
        # greedy fold
        t0 = time.time()
        n_seq = (
            _packed_entries(docs)
            .groupBy("bucket", "e.seq")
            .count()
            .count()
        )
        dt_g = time.time() - t0
        # FFD fold over the same docs (cost-descending sort inside)
        folded = docs.groupBy("bucket").agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("cost")).alias("negcost"),
                        F.col("doc_id"),
                        F.col("cost"),
                    )
                )
            ).alias("arr")
        )
        t0 = time.time()
        n_seq_f = (
            folded.select("bucket", F.explode(_ffd_fold(F.col("arr"))).alias("e"))
            .groupBy("bucket", "e.seq")
            .count()
            .count()
        )
        dt_f = time.time() - t0
        results.append((n, dt_g, n / dt_g, n_seq, dt_f, n / dt_f, n_seq_f))
        print(
            f"n={n:>9,}  greedy {dt_g:6.2f}s ({n/dt_g:>12,.0f} rows/s, "
            f"{n_seq:,} seqs)   ffd {dt_f:6.2f}s ({n/dt_f:>12,.0f} rows/s, "
            f"{n_seq_f:,} seqs)"
        )
    if len(results) >= 2:
        (n1, g1, *_), (n2, g2, *_) = results[0], results[-1]
        print(
            f"scale {n2/n1:.0f}x -> greedy wall {g2/g1:.2f}x "
            f"(linear would be <= {n2/n1:.0f}x; sublinear = fixed costs amortize)"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
