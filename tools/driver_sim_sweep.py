#!/usr/bin/env python
"""Foreign-driver simulation sweep (the /verify recipe, scriptified):
builds a PLAIN SparkSession (no engine configs — the external driver
won't have them), loads ``__spark_entry__`` exactly as the driver
does, and runs EVERY registered query against its DuckDB oracle at
sf0.01, printing per-query MATCH/MISMATCH and a final summary line.

Usage: python tools/driver_sim_sweep.py [names...]
(no names = full sweep)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vhash(df) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    rows = sorted(df.astype(str).apply("|".join, axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:12]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    queries, oracles = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or sorted(queries)
    bad, errs = [], []
    t0 = time.time()
    for name in names:
        try:
            sp = queries[name](spark, sf).toPandas()
            if name in oracles:
                du = con.execute(oracles[name]).fetchdf()
                ok = vhash(sp) == vhash(du) and len(sp) == len(du)
                print(name, "MATCH" if ok else "MISMATCH", len(sp), len(du), flush=True)
                if not ok:
                    bad.append(name)
            else:
                print(name, "weak rows=", len(sp), flush=True)
        except Exception as e:  # a broken query must not end the sweep
            print(name, "ERROR", repr(e)[:200], flush=True)
            errs.append(name)
    print(
        f"SWEEP {len(names)} queries in {time.time() - t0:.0f}s — "
        f"mismatches: {bad} errors: {errs}"
    )
    spark.stop()
    return 1 if bad or errs else 0


if __name__ == "__main__":
    sys.exit(main())
