"""Shared column-expression helpers (the engine's "functions" layer).

Pure JVM-side column builders reused across operator families —
no UDFs, no actions, so every caller keeps whole-stage codegen and
pushdown. Operator modules re-export these for their local idiom
(``llm_dedup.shingles``, ``llm_similarity.cosine``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["cosine", "fdiv_sql", "shingles"]


def fdiv_sql(x: str, m: str) -> str:
    """Portable FLOOR division for oracle SQL: DuckDB's % truncates
    while Python's floors, but ((a % b) + b) % b is the non-negative
    remainder under either convention (b > 0), and after subtracting
    it the // is exact. Python-side twin: plain a // b.

    Both operands are CAST to BIGINT first: a Hypothesis sweep found
    that an INT32-typed input near the type boundary overflows
    DuckDB's subtraction (e.g. a=-1431655767, b=715827883 — the
    corrective subtraction lands on -2^31-1), so the helper widens
    unconditionally rather than trusting the caller's column type."""
    a = f"CAST({x} AS BIGINT)"
    b = f"CAST({m} AS BIGINT)"
    return f"(({a}) - ((({a}) % ({b})) + ({b})) % ({b})) // ({b})"


def cosine(a, b):
    """Cosine similarity between two array<double> columns — built-in
    zip_with/aggregate fold, JVM-side, no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def shingles(col, width: int = 3):
    """Token w-shingles as strings: sliding windows over the token array,
    built from pure column expressions (transform over an index range).
    Documents shorter than ``width`` tokens degrade to one whole-text
    shingle so they still participate in similarity."""
    toks = F.split(col, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - width, F.lit(0)))
    return F.when(
        n >= width,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, width))),
    ).otherwise(F.array(col))
