"""Similarity-search operators over the embedding corpus
(SURVEY.md §2 J3-J4): exact brute-force cosine top-k as the
correctness baseline, and an LSH-bucketed approximate variant as the
100 TB scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.functions import (  # shared helpers, re-exported for this module's callers
    cosine,
    fdiv_sql,
)
from clj_kinesis_to_firehose_spark.registry import (
    oracle,
    register,
    register_memo,
)
from clj_kinesis_to_firehose_spark.sources import fan_out, load_table

PROBE_IDS = [0, 1, 2, 3, 4]
TOP_K = 5

# Random-hyperplane LSH, multi-table: L independent tables of K
# hyperplane bits each. Collision prob per table for angle θ is
# (1-θ/π)^K; union over L tables. K=6/L=8 ⇒ ~99.8% recall at cosine
# 0.95 (near-dup regime) while scoring only ~L/2^K ≈ 12% of the
# corpus per probe. Seeds are constants so plans are reproducible.
LSH_BITS = 6
LSH_TABLES = 8
_HP_SEED = 42

#: fixed-point scales for the portable signature kernel (r14, r13
#: verdict #1): embeddings quantize to FLOOR(x·1e6) int64, hyperplane
#: coefficients are INTEGERS in [-1e6, 1e6] from the fixed LCG, so the
#: sign-bit dot products are exact integer arithmetic — identical in
#: numpy int64, Spark long, and DuckDB BIGINT (max |dot| ≤
#: 64·1.2e6·1e6 ≈ 7.7e13, far inside int64) — and the whole
#: signature → band → candidate → top-k pipeline oracles exactly.
#: The r13 float form computed the same hyperplanes as doubles; a dot
#: within one ulp of zero could then flip a sign bit across engines,
#: which is exactly the failure the fixed-point form removes.
LSH_Q = 1_000_000


def _lsh_coef() -> list[list[int]]:
    """Integer hyperplane coefficients, (L·K) planes × 64 dims, from
    the fixed LCG — pure Python ints, reproduced verbatim as VALUES
    literals in the oracle so both engines read the SAME constants."""
    vals = []
    state = _HP_SEED
    for _ in range(LSH_BITS * LSH_TABLES * 64):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        vals.append((state >> 11) % (2 * LSH_Q + 1) - LSH_Q)
    return [vals[i * 64 : (i + 1) * 64] for i in range(LSH_BITS * LSH_TABLES)]


@register(
    "sim_topk_exact",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ), probes AS (
        SELECT vec_id AS probe_id, e AS pe FROM v
        WHERE vec_id IN ({", ".join(str(i) for i in PROBE_IDS)})
    ), scored AS (
        SELECT probe_id, v.vec_id AS neighbor_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), i -> pe[i] * e[i]))
                     / (SQRT(LIST_SUM(LIST_TRANSFORM(pe, x -> x * x)))
                        * SQRT(LIST_SUM(LIST_TRANSFORM(e, x -> x * x)))), 6)
                 AS cosine
        FROM probes CROSS JOIN v
        WHERE v.vec_id != probe_id
    )
    SELECT probe_id, neighbor_id, cosine, nn_rank FROM (
        SELECT probe_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, neighbor_id) AS nn_rank
        FROM scored
    ) WHERE nn_rank <= {TOP_K}
    """,
)
def sim_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for a fixed probe set.

    The probe side is a handful of rows — broadcast — so the "cross
    join" is really a map-side fan-out over one scan of the corpus:
    linear, no shuffle until the per-probe top-k window. Ranking uses
    the ROUNDED similarity (then vec_id) so float noise below 1e-6
    cannot reorder the top-k set across engines.
    """
    emb = fan_out(
        spark, load_table(spark, sf_dir, "embeddings")
    ).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    probes = emb.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    scored = (
        F.broadcast(probes)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("pe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= TOP_K)
    )


def _signature_udf():
    """All per-table LSH signatures in one vectorized kernel: an Arrow
    batch of embeddings is quantized (FLOOR(x·1e6) → int64) and hit
    with one (rows × dim) @ (dim × L·K) INTEGER matmul, then sign-bits
    packed per table — numpy, one Python crossing per batch. Integer
    arithmetic is exact and order-free, so the signatures are
    bit-identical across numpy, Spark partitionings, and the DuckDB
    oracle (r14; the r13 float matmul was within-engine deterministic
    but not provably cross-engine). This is also the realistic shape
    at 100 TB where the coefficient matrix is a broadcast constant.
    """
    cq = np.array(_lsh_coef(), dtype="int64").T  # dim × (L·K)
    weights = np.array(
        [1 << k for k in range(LSH_BITS)] * LSH_TABLES, dtype="int64"
    )
    table_of = np.repeat(np.arange(LSH_TABLES), LSH_BITS)

    @F.pandas_udf("array<int>")
    def signatures(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy())  # rows × dim, float64
        xq = np.floor(mat * LSH_Q).astype("int64")
        bits = (xq @ cq) >= 0  # rows × (L·K), exact int64 dots
        weighted = bits * weights
        sigs = np.zeros((mat.shape[0], LSH_TABLES), dtype="int64")
        for t in range(LSH_TABLES):
            sigs[:, t] = weighted[:, table_of == t].sum(axis=1)
        return pd.Series(list(sigs.astype("int32")))

    return signatures


def _signature_int_udf():
    """:func:`_signature_udf`'s integer-domain twin: input is an
    ALREADY-QUANTIZED ``array<long>`` vector (the FLOOR(x·1e6) units
    the float kernel produces internally), so callers that synthesize
    vectors IN the quantized domain (sim_ann_calibration's planted
    variants) get signatures from the same hyperplanes and bit packing
    without a float round-trip — bit-equality with the production
    kernel on real embeddings is pinned in pytest."""
    cq = np.array(_lsh_coef(), dtype="int64").T  # dim × (L·K)
    weights = np.array(
        [1 << k for k in range(LSH_BITS)] * LSH_TABLES, dtype="int64"
    )
    table_of = np.repeat(np.arange(LSH_TABLES), LSH_BITS)

    @F.pandas_udf("array<int>")
    def signatures(eq: pd.Series) -> pd.Series:
        xq = np.vstack(eq.to_numpy()).astype("int64")
        bits = (xq @ cq) >= 0  # rows × (L·K), exact int64 dots
        weighted = bits * weights
        sigs = np.zeros((xq.shape[0], LSH_TABLES), dtype="int64")
        for t in range(LSH_TABLES):
            sigs[:, t] = weighted[:, table_of == t].sum(axis=1)
        return pd.Series(list(sigs.astype("int32")))

    return signatures


#: DuckDB CTE fragment: the hyperplane coefficient table as VALUES —
#: shared by the sim_ann_lsh and sim_ann_calibration oracles so both
#: read the SAME `_lsh_coef()` constants.
def sql_lsh_coef_values() -> str:
    C = _lsh_coef()
    return ",".join(
        f"({p},{d + 1},{C[p][d]})"
        for p in range(LSH_BITS * LSH_TABLES)
        for d in range(64)
    )


def _sql_ann_lsh() -> str:
    """The DuckDB twin of the WHOLE sim_ann_lsh pipeline: the integer
    coefficient table inlined as VALUES (the same `_lsh_coef()`
    constants the Spark kernel broadcasts), quantized integer dots →
    per-table sign-bit buckets → probe-vs-corpus bucket join →
    distinct pairs → exact rounded cosine → top-k. Verified equal to
    the numpy kernel bit-for-bit at prototype time (r14)."""
    lits = sql_lsh_coef_values()
    ids = ", ".join(str(i) for i in PROBE_IDS)
    return f"""
    WITH coef AS (SELECT * FROM (VALUES {lits}) t(p, d, c)),
    v AS MATERIALIZED (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e,
             LIST_TRANSFORM(embedding,
                            x -> CAST(FLOOR(CAST(x AS DOUBLE) * {LSH_Q})
                                      AS BIGINT)) AS eq
      FROM embeddings
    ),
    expl AS (SELECT vec_id, i AS d, eq[i] AS x
             FROM v, UNNEST(RANGE(1, 65)) t(i)),
    dots AS (SELECT e.vec_id, c.p, SUM(e.x * c.c) AS dot
             FROM expl e JOIN coef c ON c.d = e.d GROUP BY e.vec_id, c.p),
    sigs AS MATERIALIZED (
      SELECT vec_id, p // {LSH_BITS} AS table_id,
             CAST(SUM(CASE WHEN dot >= 0 THEN 1 << (p % {LSH_BITS})
                           ELSE 0 END) AS BIGINT) AS sig
      FROM dots GROUP BY vec_id, p // {LSH_BITS}
    ),
    probes AS (SELECT vec_id AS probe_id, table_id, sig FROM sigs
               WHERE vec_id IN ({ids})),
    cand AS (
      SELECT DISTINCT p.probe_id, s.vec_id AS neighbor_id
      FROM probes p JOIN sigs s
        ON p.table_id = s.table_id AND p.sig = s.sig
       AND s.vec_id != p.probe_id
    ),
    scored AS (
      SELECT c.probe_id, c.neighbor_id,
             ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
                                           i -> pv.e[i] * nv.e[i]))
                   / (SQRT(LIST_SUM(LIST_TRANSFORM(pv.e, x -> x * x)))
                      * SQRT(LIST_SUM(LIST_TRANSFORM(nv.e, x -> x * x)))),
                   6) AS cosine
      FROM cand c
      JOIN v pv ON pv.vec_id = c.probe_id
      JOIN v nv ON nv.vec_id = c.neighbor_id
    )
    SELECT probe_id, neighbor_id, cosine, nn_rank FROM (
      SELECT probe_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, neighbor_id)
               AS nn_rank
      FROM scored
    ) WHERE nn_rank <= {TOP_K}
    """


@register(
    "vector_normalize",
    oracle="""
    WITH v AS (
        SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    )
    SELECT vec_id,
           ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(e, x -> x * x))), 4) AS l2_norm,
           ROUND(e[1] / SQRT(LIST_SUM(LIST_TRANSFORM(e, x -> x * x))), 6)
             AS first_unit,
           ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(
                 LIST_TRANSFORM(e, x -> x / SQRT(LIST_SUM(LIST_TRANSFORM(e, y -> y * y)))),
                 x -> x * x))), 6) AS norm_after
    FROM v
    """,
)
def vector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization of the embedding column — the prep step every
    cosine pipeline wants (normalized vectors turn cosine into a plain
    dot product, halving the pairwise arithmetic at scale)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    norm = F.sqrt(F.aggregate("e", F.lit(0.0), lambda s, x: s + x * x))
    with_norm = emb.withColumn("l2_norm_raw", norm)
    unit = F.transform("e", lambda x: x / F.col("l2_norm_raw"))
    return with_norm.select(
        "vec_id",
        F.round("l2_norm_raw", 4).alias("l2_norm"),
        F.round(F.element_at("e", 1) / F.col("l2_norm_raw"), 6).alias("first_unit"),
        F.round(
            F.sqrt(F.aggregate(unit, F.lit(0.0), lambda s, x: s + x * x)), 6
        ).alias("norm_after"),
    )


@register("sim_ann_lsh", oracle=_sql_ann_lsh())
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via multi-table random-hyperplane LSH — EXACT
    oracle since r14 (r13 verdict #1): the hyperplanes are seeded
    INTEGER coefficients and the embeddings quantize to FLOOR(x·1e6)
    int64, so every sign-bit dot is exact integer arithmetic and the
    bucket keys cannot diverge between engines; the DuckDB oracle
    replays the identical signature → bucket-join → rounded-cosine →
    top-k pipeline from the same inlined constants. Pytest still pins
    the RECALL behavior (planted near-dups, corpus floor vs
    sim_topk_exact) — exactness proves the plan, recall proves the
    algorithm.

    Every vector gets L=8 bucket keys (6 sign-bits each). A probe is
    compared only against vectors sharing ≥1 bucket key — ~12% of the
    corpus here, and the fraction shrinks geometrically with K, which
    is the knob that makes 100 TB ANN tractable. Truly-near neighbors
    (cosine ≥ .9, the dedup regime) collide in some table with ~99.8%
    probability; far "neighbors" of random data are missed by design.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    # Nondeterministic marking (guide §4.4): the posexplode's implicit
    # `size(sigs) > 0` / join-key isnotnull filters were pushed BELOW
    # the projection, so the signature kernel ran TWICE per side —
    # once to test the filter, once for the real explode (r15 plan
    # capture: stacked ArrowEvalPython pairs). Marking it
    # nondeterministic forbids the duplication; the kernel itself is
    # pure, so results are unchanged.
    sig_udf = _signature_udf().asNondeterministic()

    def signed_of(df: DataFrame) -> DataFrame:
        return df.withColumn("sigs", sig_udf(F.col("e"))).select(
            "vec_id",
            "e",
            F.posexplode("sigs").alias("table_id", "sig"),
        )

    signed = signed_of(emb)
    # probe side: filter the BASE SCAN before the kernel (the IN
    # pushdown used to be the optimizer's job; nondeterminism blocks
    # filter movement through the UDF, so apply it in the plan) —
    # the probe branch's kernel sees exactly the probe rows.
    probes = signed_of(emb.filter(F.col("vec_id").isin(PROBE_IDS))).select(
        F.col("vec_id").alias("probe_id"),
        F.col("e").alias("pe"),
        F.col("table_id").alias("p_table"),
        F.col("sig").alias("p_sig"),
    )
    scored = (
        F.broadcast(probes)
        .join(
            signed,
            (F.col("p_table") == F.col("table_id")) & (F.col("p_sig") == F.col("sig")),
        )
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", F.col("vec_id").alias("neighbor_id"), "pe", "e")
        # a pair may collide in several tables — score once (pe/e are
        # functionally determined by the pair, so the surviving row is
        # unique regardless of which duplicate wins)
        .dropDuplicates(["probe_id", "neighbor_id"])
        .select(
            "probe_id",
            "neighbor_id",
            F.round(cosine(F.col("pe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= TOP_K)
    )


# sim_recall_eval lives in llm_graph_ann (r15; llm_clustering in
# r14): its exact oracle composes oracle("sim_ann_ivf") AND — since
# the graph family went exact — oracle("sim_ann_graph") AND the
# RRF-fused list, so the op must register after all three. (An
# interim LSH-only twin, sim_recall_eval_lsh, existed briefly in r14
# and was removed as a strict subset once the full grid went exact —
# review finding.)


@register(
    "embedding_quantize_int8",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ), expl AS (
        SELECT vec_id, i AS dim, e[i] AS x
        FROM v, UNNEST(RANGE(1, 65)) AS t(i)
    ), stats AS (
        SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM expl GROUP BY dim
    ), coded AS (
        SELECT vec_id, dim, x, mn, mx,
               CAST(LEAST(255, FLOOR((x - mn) / (mx - mn) * 256)) AS BIGINT)
                 AS code
        FROM expl JOIN stats USING (dim)
        WHERE vec_id IN ({", ".join(str(i) for i in PROBE_IDS)})
    )
    SELECT vec_id, dim, code,
           ROUND(ABS(x - (mn + (code + 0.5) * (mx - mn) / 256)), 6) AS qerr
    FROM coded
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding corpus: per-dimension
    [min, max] over the whole corpus → 256 uniform buckets → one byte
    per dimension instead of four — the 4× storage/bandwidth reduction
    that makes a 100 TB vector corpus scannable (codes live next to the
    doc; the 64×2 stats table is a broadcast constant). Output is the
    probe rows' codes plus per-value reconstruction error.

    Determinism: bucket assignment uses FLOOR (unambiguous on any
    double), never ROUND (half-way ties differ across engines); the
    stats are exact MIN/MAX, not moments; qerr rounds an identically-
    associated expression. One posexplode + one 64-row agg; the corpus
    is scanned once."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    expl = emb.select(
        "vec_id", F.posexplode("e").alias("pos", "x")
    ).withColumn("dim", F.col("pos") + 1)
    stats = expl.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    code = F.least(
        F.lit(255),
        F.floor((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 256),
    ).cast("long")
    coded = (
        expl.filter(F.col("vec_id").isin(PROBE_IDS))
        .join(F.broadcast(stats), "dim")
        .withColumn("code", code)
    )
    qerr = F.round(
        F.abs(
            F.col("x")
            - (F.col("mn") + (F.col("code") + 0.5) * (F.col("mx") - F.col("mn")) / 256)
        ),
        6,
    )
    return coded.select("vec_id", "dim", "code", qerr.alias("qerr"))


# Product quantization (Jégou et al. 2011, public paper): split the
# 64-dim vector into PQ_SUBSPACES contiguous subvectors, k-means each
# subspace to PQ_K centroids, store one byte-sized code per subspace.
# ADC (asymmetric distance computation) scores a probe against a coded
# vector with S table lookups instead of D multiplies. Codebook
# training is deterministic: fixed training slice, first-K init, fixed
# Lloyd iteration count.
PQ_SUBSPACES = 8
PQ_K = 16
PQ_TRAIN_IDS = 256  # training slice bound: vec_id < 256 (bounded collect)
PQ_SHORTLIST = 64
PQ_ITERS = 5

#: (applicationId, sf_dir) → trained codebooks; pure function of the
#: corpus, so one session trains once (cleared by bench's clear_memos)
_PQ_BOOKS_MEMO: dict = register_memo({})


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> list[np.ndarray]:
    """Train per-subspace FIXED-POINT codebooks on a bounded,
    deterministic slice (r14: integer Lloyd's — FLOOR(x·1e6) int64
    training vectors, exact integer distances, floor-div means, argmin
    ties to the lowest code — so the codebooks, and everything
    downstream of them, are bit-identical in numpy, Spark, and the
    DuckDB oracle's unrolled CTE replay).

    The collect is PQ_TRAIN_IDS×64 doubles (~128 KiB) regardless of
    corpus size — codebook training is a constant-size driver-side
    step, exactly like kmeans centroid pulls; encoding (the corpus-
    sized work) stays distributed. Memoized per (session, corpus):
    both sim_ann_pq and the recall grid ride the same books."""
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    hit = _PQ_BOOKS_MEMO.get(memo_key)
    if hit is not None:
        return hit
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < PQ_TRAIN_IDS)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    X = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * LSH_Q
    ).astype(np.int64)
    sub = X.shape[1] // PQ_SUBSPACES
    books: list[np.ndarray] = []
    for s in range(PQ_SUBSPACES):
        Xs = X[:, s * sub : (s + 1) * sub]
        C = Xs[:PQ_K].copy()  # deterministic first-K init
        for _ in range(PQ_ITERS):
            d = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(-1)  # exact int64
            assign = d.argmin(1)  # ties → lowest code, like the oracle
            for k in range(PQ_K):
                members = Xs[assign == k]
                if len(members):
                    # np int64 floor-divides like Python (empty keeps C[k])
                    C[k] = members.sum(0) // len(members)
        books.append(C)
    _PQ_BOOKS_MEMO[memo_key] = books
    return books


def _sql_ann_pq() -> str:
    """DuckDB twin of the WHOLE sim_ann_pq pipeline: all 8 subspace
    codebooks trained JOINTLY in one unrolled Lloyd's CTE chain (the
    subspace id is just a grouping column — the fits are independent),
    then corpus encoding, integer ADC lookup tables, the portable
    FLOOR(1e6·dot/(‖p‖·‖recon‖)) shortlist score, and the proven
    rounded-cosine rerank tail. Every quantity upstream of the two
    float divisions is exact int64; the divisions consume identical
    integers in both engines, so the doubles (and their FLOOR/ROUND)
    cannot diverge."""
    ids = ", ".join(str(i) for i in PROBE_IDS)
    sub = 64 // PQ_SUBSPACES
    steps = []
    prev = "pcent0"
    for t in range(1, PQ_ITERS + 1):
        steps.append(f""",
    pdist{t} AS MATERIALIZED (
      SELECT e.vec_id, e.s, c.cluster,
             SUM((e.x - c.cv) * (e.x - c.cv)) AS d2
      FROM texpl e JOIN {prev} c ON e.s = c.s AND e.d = c.d
      GROUP BY e.vec_id, e.s, c.cluster),
    pasg{t} AS (
      SELECT vec_id, s, cluster FROM pdist{t}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                 ORDER BY d2, cluster) = 1),
    pupd{t} AS (
      SELECT a.cluster, a.s, e.d, {fdiv_sql("SUM(e.x)", "COUNT(*)")} AS cv
      FROM pasg{t} a JOIN texpl e ON a.vec_id = e.vec_id AND a.s = e.s
      GROUP BY a.cluster, a.s, e.d),
    pcent{t} AS MATERIALIZED (
      SELECT c.cluster, c.s, c.d, COALESCE(u.cv, c.cv) AS cv
      FROM {prev} c LEFT JOIN pupd{t} u
        ON c.cluster = u.cluster AND c.s = u.s AND c.d = u.d)""")
        prev = f"pcent{t}"
    return f"""
    WITH v AS MATERIALIZED (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e,
             LIST_TRANSFORM(embedding,
                            x -> CAST(FLOOR(CAST(x AS DOUBLE) * {LSH_Q})
                                      AS BIGINT)) AS eq
      FROM embeddings),
    texpl AS MATERIALIZED (
      SELECT vec_id, s, d, eq[s * {sub} + d] AS x
      FROM v, UNNEST(RANGE({PQ_SUBSPACES})) ts(s),
              UNNEST(RANGE(1, {sub + 1})) td(d)
      WHERE vec_id < {PQ_TRAIN_IDS}),
    pinit AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster,
                     vec_id
              FROM v WHERE vec_id < {PQ_TRAIN_IDS}
              ORDER BY vec_id LIMIT {PQ_K}),
    pcent0 AS MATERIALIZED (
      SELECT i.cluster, t.s, t.d, t.x AS cv
      FROM pinit i JOIN texpl t USING (vec_id))
    {"".join(steps)},
    cexpl AS MATERIALIZED (
      SELECT vec_id, s, d, eq[s * {sub} + d] AS x
      FROM v, UNNEST(RANGE({PQ_SUBSPACES})) ts(s),
              UNNEST(RANGE(1, {sub + 1})) td(d)),
    codes AS MATERIALIZED (
      SELECT vec_id, s, cluster AS code FROM (
        SELECT e.vec_id, e.s, c.cluster,
               SUM((e.x - c.cv) * (e.x - c.cv)) AS d2
        FROM cexpl e JOIN {prev} c ON e.s = c.s AND e.d = c.d
        GROUP BY e.vec_id, e.s, c.cluster)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                 ORDER BY d2, cluster) = 1),
    cn AS (SELECT s, cluster, SUM(cv * cv) AS cn2 FROM {prev}
           GROUP BY s, cluster),
    lut AS MATERIALIZED (
      SELECT p.vec_id AS probe_id, c.s, c.cluster, SUM(p.x * c.cv) AS pdot
      FROM cexpl p JOIN {prev} c ON p.s = c.s AND p.d = c.d
      WHERE p.vec_id IN ({ids})
      GROUP BY p.vec_id, c.s, c.cluster),
    pn AS (
      SELECT vec_id AS probe_id,
             GREATEST(SQRT(CAST(SUM(x * x) AS DOUBLE)), 1e-12) AS pnorm
      FROM cexpl WHERE vec_id IN ({ids}) GROUP BY vec_id),
    adc AS (
      SELECT l.probe_id, k.vec_id,
             SUM(l.pdot) AS dot, SUM(cn.cn2) AS norm2
      FROM codes k
      JOIN lut l ON l.s = k.s AND l.cluster = k.code
      JOIN cn ON cn.s = k.s AND cn.cluster = k.code
      WHERE k.vec_id != l.probe_id
      GROUP BY l.probe_id, k.vec_id),
    shortlist AS (
      SELECT probe_id, vec_id FROM (
        SELECT a.probe_id, a.vec_id,
               CAST(FLOOR((1000000.0 * a.dot) /
                    (p.pnorm * GREATEST(SQRT(CAST(a.norm2 AS DOUBLE)),
                                        1e-12)))
                 AS BIGINT) AS adc_u
        FROM adc a JOIN pn p USING (probe_id))
      QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
                                 ORDER BY adc_u DESC, vec_id)
              <= {PQ_SHORTLIST}),
    rerank AS (
      SELECT sl.probe_id, sl.vec_id AS neighbor_id,
             ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
                                           i -> pv.e[i] * nv.e[i]))
                   / (SQRT(LIST_SUM(LIST_TRANSFORM(pv.e, x -> x * x)))
                      * SQRT(LIST_SUM(LIST_TRANSFORM(nv.e, x -> x * x)))),
                   6) AS cosine
      FROM shortlist sl
      JOIN v pv ON pv.vec_id = sl.probe_id
      JOIN v nv ON nv.vec_id = sl.vec_id)
    SELECT probe_id, neighbor_id, cosine, nn_rank FROM (
      SELECT probe_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, neighbor_id)
               AS nn_rank
      FROM rerank
    ) WHERE nn_rank <= {TOP_K}
    """


@register("sim_ann_pq", executes_on_build=True, oracle=_sql_ann_pq())
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via product quantization + exact rerank — EXACT
    oracle since r14: codebooks are fixed-point integer Lloyd's
    (:func:`_pq_codebooks`), encoding/ADC are exact int64 lookups, the
    shortlist score is FLOOR(1e6·dot/(‖p‖·‖recon‖)) of integers
    (identical doubles → identical floors in both engines), and the
    rerank tail is the proven rounded-cosine pattern. Pytest still
    pins planted-twin retrieval and a corpus recall floor vs
    sim_topk_exact — exactness proves the plan, recall the algorithm.

    Pipeline: (1) train subspace codebooks on a constant-size slice,
    (2) encode the corpus once with a vectorized numpy pandas_udf —
    8 bytes per vector, a 32× compression of the 64-float embedding,
    which is what lets a 100 TB vector corpus live in memory-speed
    storage; (3) score probes against codes with ADC lookup tables
    (8 adds per candidate, no float multiply against the raw vector);
    (4) shortlist top PQ_SHORTLIST per probe, then exact-cosine rerank
    the shortlist only — the standard two-stage retrieval shape, so
    full-precision vectors are touched for 64 rows per probe, not the
    corpus."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    books = _pq_codebooks(spark, sf_dir)  # list of (K, sub) int64
    sub = 64 // PQ_SUBSPACES
    # per-(subspace, code) reconstruction norm², shared by every probe
    cnorm2 = np.stack([(C**2).sum(1) for C in books])  # (S, K) int64

    @F.pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        X = np.array(col.tolist(), dtype=np.float64)
        Xq = np.floor(X * LSH_Q).astype(np.int64)
        codes = np.empty((len(X), PQ_SUBSPACES), dtype=np.int32)
        for s, C in enumerate(books):
            Xs = Xq[:, s * sub : (s + 1) * sub]
            codes[:, s] = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
        return pd.Series(list(codes))

    coded = fan_out(spark, emb).withColumn("codes", encode("e"))

    probe_rows = sorted(
        emb.filter(F.col("vec_id").isin(PROBE_IDS)).collect(),
        key=lambda r: r["vec_id"],
    )
    missing = set(PROBE_IDS) - {r["vec_id"] for r in probe_rows}
    if missing:  # a LUT KeyError inside the UDF would be opaque
        raise ValueError(f"probe vec_ids not in corpus: {sorted(missing)}")
    luts = {}
    pnorm = {}
    for r in probe_rows:
        pq = np.floor(np.array(r["e"], dtype=np.float64) * LSH_Q).astype(
            np.int64
        )
        # clamp: a zero probe (all-zero embedding) must degrade to
        # cosine 0, not NaN-corrupt the shortlist ranking
        pnorm[r["vec_id"]] = max(float(np.sqrt(float((pq**2).sum()))), 1e-12)
        luts[r["vec_id"]] = np.stack(
            [books[s] @ pq[s * sub : (s + 1) * sub] for s in range(PQ_SUBSPACES)]
        )  # (S, K) integer partial dots

    s_idx = np.arange(PQ_SUBSPACES)

    @F.pandas_udf("long")
    def adc(pid: pd.Series, codes: pd.Series) -> pd.Series:
        if len(pid) == 0:
            return pd.Series([], dtype="int64")
        C = np.array(codes.tolist(), dtype=np.int64)  # (n, S)
        out = np.empty(len(pid), dtype=np.int64)
        for p in pid.unique():
            mask = (pid == p).to_numpy()
            idx = C[mask]
            dots = luts[p][s_idx[None, :], idx].sum(1)  # exact int64
            # clamp: a degenerate all-origin codebook reconstruction
            # would otherwise yield 0-norm → NaN scores
            norms = np.maximum(np.sqrt(cnorm2[s_idx[None, :], idx].sum(1)), 1e-12)
            out[mask] = np.floor(
                (1000000.0 * dots) / (pnorm[p] * norms)
            ).astype(np.int64)
        return pd.Series(out)

    probes_df = spark.createDataFrame(
        [(int(i),) for i in PROBE_IDS], "probe_id long"
    )
    scored = (
        coded.crossJoin(F.broadcast(probes_df))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", adc("probe_id", "codes").alias("adc_u"))
    )
    w_short = Window.partitionBy("probe_id").orderBy(
        F.desc("adc_u"), F.asc("vec_id")
    )
    shortlist = (
        scored.withColumn("r", F.row_number().over(w_short))
        .filter(F.col("r") <= PQ_SHORTLIST)
        .select("probe_id", "vec_id")
    )
    # exact rerank on the shortlist only: probe vectors are a 5-row
    # broadcast, neighbor vectors come from one join against the corpus
    probes_full = emb.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    reranked = (
        shortlist.join(emb, "vec_id")
        .join(F.broadcast(probes_full), "probe_id")
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("pe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        reranked.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= TOP_K)
    )
