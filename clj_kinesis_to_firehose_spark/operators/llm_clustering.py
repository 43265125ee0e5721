"""Embedding clustering and IVF approximate nearest-neighbor search.

`embedding_kmeans` is distributed Lloyd's iteration: assignment is a
vectorized Arrow-batch matmul against a broadcast centroid matrix
(one Python crossing per batch), the centroid update is a
posexplode → (cluster, dim) hash-agg, and only the k×dim centroid
means (512 doubles here) ever return to the driver per iteration —
the same bounded-collect shape Spark MLlib's KMeans uses. At 100 TB
the fit runs on a sample and the final assignment is a single
map-only pass; nothing in the loop scales with corpus size except
the two aggregations.

`sim_ann_ivf` is the IVF index built from those centroids: probes
search only their `NPROBE` nearest cells, cutting scored candidates
to ~NPROBE/K of the corpus (vs the LSH variant's union-of-buckets
selectivity; IVF gives a hard candidate-fraction bound, which is the
property you provision memory against on a 1000-executor cluster).

Both are `weak` oracles (iterative float algorithms DuckDB SQL can't
express); tests/test_weak_ops.py asserts partition invariants,
inertia monotonicity, and ≥0.8 recall vs `sim_topk_exact`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.operators.llm_similarity import (
    PROBE_IDS,
    TOP_K,
    cosine,
)
from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import fan_out, load_table

K_CLUSTERS = 8
KMEANS_ITERS = 5
NPROBE = 2
DIM = 64


def _assign_udf(centroids: np.ndarray):
    """cluster = argmin_c ||x - c||² for an Arrow batch of embeddings,
    as one (rows × dim) @ (dim × k) matmul. Ties break to the lowest
    cluster id (np.argmin), deterministically."""
    cmat = centroids.T.copy()  # dim × k
    cnorm = (centroids**2).sum(axis=1)  # k

    @F.pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy())
        # ||x-c||² = ||x||² - 2 x·c + ||c||²; ||x||² is constant per row
        scores = -2.0 * (mat @ cmat) + cnorm
        return pd.Series(np.argmin(scores, axis=1).astype("int32"))

    return assign


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the pandas-UDF matmul kernels below parallelize per
    # partition; a single-file scan would serialize them on one core
    return fan_out(spark, load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )


def _fit_kmeans(
    spark: SparkSession, sf_dir: str
) -> tuple[np.ndarray, DataFrame, list[float]]:
    """Lloyd's iterations; returns (centroids, assignment df builder
    input, per-iteration inertia). Deterministic: init = the K lowest
    vec_ids, fixed iteration count, argmin tie-break by cluster id."""
    emb = _embeddings(spark, sf_dir)
    init_rows = emb.orderBy("vec_id").limit(K_CLUSTERS).collect()  # bounded: k rows
    centroids = np.array([r["e"] for r in init_rows], dtype="float64")

    inertia: list[float] = []
    assigned = None
    for _ in range(KMEANS_ITERS):
        assigned = emb.withColumn("cluster", _assign_udf(centroids)(F.col("e")))
        # centroid update: (cluster, dim) sums — k×dim rows back to driver
        sums = (
            assigned.select("cluster", F.posexplode("e").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                F.sum("val").alias("s"),
                F.sum(F.col("val") * F.col("val")).alias("ss"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new_c = centroids.copy()  # empty cluster keeps its old centroid
        iter_inertia = 0.0
        for r in sums:
            mu = r["s"] / r["n"]
            new_c[r["cluster"], r["pos"]] = mu
            # Σ||x−μ||² per (cluster,dim) = Σx² − n·μ² — inertia wrt the
            # UPDATED centroids, free from the same agg (Lloyd's decreases
            # it monotonically across iterations; the test asserts that)
            iter_inertia += r["ss"] - r["n"] * mu * mu
        inertia.append(iter_inertia)
        centroids = new_c
    # final assignment against the converged centroids
    assigned = emb.withColumn("cluster", _assign_udf(centroids)(F.col("e")))
    return centroids, assigned, inertia


@register("embedding_kmeans", executes_on_build=True)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embedding corpus (k=8, 5 Lloyd iterations,
    deterministic init). Returns per-cluster size and the rounded mean
    distance-to-centroid — the summary a corpus-balancing pipeline
    reads to decide IVF cell counts."""
    centroids, assigned, _ = _fit_kmeans(spark, sf_dir)
    cent_df = spark.createDataFrame(
        [(i, [float(v) for v in centroids[i]]) for i in range(K_CLUSTERS)],
        "cluster int, c array<double>",
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    return (
        assigned.join(F.broadcast(cent_df), "cluster")
        .withColumn("dist", dist)
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("dist"), 4).alias("avg_dist"),
        )
    )


@register("sim_ann_ivf", executes_on_build=True)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: kmeans cells + nprobe=2 probing, exact cosine within
    the probed cells, top-k per probe (rank by rounded cosine then
    neighbor_id, like sim_topk_exact)."""
    centroids, assigned, _ = _fit_kmeans(spark, sf_dir)
    cent_df = spark.createDataFrame(
        [(i, [float(v) for v in centroids[i]]) for i in range(K_CLUSTERS)],
        "cluster int, c array<double>",
    )
    probes = assigned.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    # probe → its NPROBE nearest cells (probes × k pairs — tiny)
    d2 = F.aggregate(
        F.zip_with("pe", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    wp = Window.partitionBy("probe_id").orderBy("d2", "cluster")
    probe_cells = (
        F.broadcast(probes)
        .crossJoin(F.broadcast(cent_df))
        .withColumn("d2", d2)
        .withColumn("cell_rank", F.row_number().over(wp))
        .filter(F.col("cell_rank") <= NPROBE)
        .select("probe_id", "pe", "cluster")
    )
    scored = (
        F.broadcast(probe_cells)
        .join(assigned, "cluster")  # candidates: only vectors in probed cells
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


def _pca_components(spark: SparkSession, sf_dir: str, n_comp: int = 2):
    """Top principal components via distributed partial Gram matrices:
    each Arrow batch contributes (count, Σx, XᵀX) — one numpy matmul —
    and only those fixed-size partials (≤ #partitions rows of
    64 + 64² doubles) reach the driver, where the d×d eigensolve is
    trivial. This is the Spark MLlib PCA shape: nothing on the driver
    scales with corpus size, only with dimension."""
    emb = _embeddings(spark, sf_dir)

    def gram_parts(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf["e"].to_numpy())
            yield pd.DataFrame(
                {
                    "n": [mat.shape[0]],
                    "s": [mat.sum(axis=0).tolist()],
                    "g": [(mat.T @ mat).ravel().tolist()],
                }
            )

    parts = emb.select("e").mapInPandas(
        gram_parts, "n long, s array<double>, g array<double>"
    ).collect()  # bounded: one row per Arrow batch
    n = sum(p["n"] for p in parts)
    s = np.sum([p["s"] for p in parts], axis=0)
    g = np.sum([p["g"] for p in parts], axis=0).reshape(DIM, DIM)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    comps = evecs[:, ::-1][:, :n_comp].T  # n_comp × dim, largest first
    # eigenvector sign is arbitrary — normalize so the
    # largest-magnitude coordinate is positive, for determinism
    for i in range(n_comp):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[::-1][:n_comp]


@register("embedding_pca_project", executes_on_build=True)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project the embedding corpus onto its top-2 principal
    components (weak: iterative float eigensolve has no SQL twin;
    the behavioral test checks variance ordering against the
    eigenvalues).

    Fit is one pass (partial Gram aggregation, see _pca_components);
    projection is a second map-only pass with the 2×64 component
    matrix closed over — the whole operator touches the corpus twice
    and shuffles never, which is what makes PCA-whitening viable as a
    pre-step for 100 TB embedding dedup/clustering pipelines.
    """
    mean, comps, _ = _pca_components(spark, sf_dir)
    cmat = comps.T.copy()  # dim × 2
    mu = mean.copy()

    @F.pandas_udf("array<double>")
    def project(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy()) - mu
        proj = mat @ cmat
        return pd.Series(list(proj))

    emb = _embeddings(spark, sf_dir)
    out = emb.withColumn("pc", project(F.col("e")))
    return out.select(
        "vec_id",
        F.round(F.element_at("pc", 1), 4).alias("pc1"),
        F.round(F.element_at("pc", 2), 4).alias("pc2"),
    )


#: nprobe settings swept by the IVF calibration grid. The last setting
#: equals K_CLUSTERS: probing every cell makes IVF identical to brute
#: force, so its recall row must read exactly 10000 — a built-in
#: sanity anchor for the whole sweep.
IVF_NPROBE_SWEEP = (1, 2, 4, 8)


@register("sim_ann_ivf_calibration", executes_on_build=True)
def sim_ann_ivf_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-vs-nprobe calibration for the IVF index — the
    dedup_lsh_calibration / sim_ann_calibration pattern applied to the
    THIRD ANN family: before provisioning a 100 TB retrieval tier you
    sweep the one knob that trades candidate volume for recall and
    read the curve. One kmeans fit, one exact ground-truth pass; per
    nprobe setting the probe→cell assignment is re-cut (a filter on
    the precomputed cell rank — the fit is NOT redone) and recall@k is
    measured against the exact top-k. The nprobe=K row probes every
    cell and must hit recall 10000 u4 exactly — brute-force
    equivalence as the sweep's internal control.

    Weak-by-design (kmeans centroid fit — iterative float, engine-
    specific reduction order); tests pin monotone recall in nprobe,
    the recall=1 anchor at nprobe=K, and candidate fractions growing
    with nprobe.

    Scale: ground truth is probe-bounded (|probes| x corpus scored
    once — the sim_topk_exact shape); each sweep setting scores only
    vectors in probed cells (~nprobe/K of the corpus, the hard bound
    IVF exists to give you). The sweep output is |settings| rows.
    """
    from clj_kinesis_to_firehose_spark.operators.llm_similarity import (
        sim_topk_exact,
    )

    centroids, assigned, _ = _fit_kmeans(spark, sf_dir)
    assigned = assigned.persist()
    n_corpus = assigned.count()
    cent_df = spark.createDataFrame(
        [(i, [float(v) for v in centroids[i]]) for i in range(K_CLUSTERS)],
        "cluster int, c array<double>",
    )
    truth = (
        sim_topk_exact(spark, sf_dir)
        .select("probe_id", "neighbor_id")
        .withColumn("is_true", F.lit(1))
    )

    probes = assigned.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    d2 = F.aggregate(
        F.zip_with("pe", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    wp = Window.partitionBy("probe_id").orderBy("d2", "cluster")
    ranked_cells = (
        F.broadcast(probes)
        .crossJoin(F.broadcast(cent_df))
        .withColumn("d2", d2)
        .withColumn("cell_rank", F.row_number().over(wp))
        .select("probe_id", "pe", "cluster", "cell_rank")
    )

    per_setting = []
    for nprobe in IVF_NPROBE_SWEEP:
        probe_cells = ranked_cells.filter(
            F.col("cell_rank") <= nprobe
        ).select("probe_id", "pe", "cluster")
        cand = (
            F.broadcast(probe_cells)
            .join(assigned, "cluster")
            .filter(F.col("vec_id") != F.col("probe_id"))
        )
        scored = cand.select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("pe"), F.col("e")), 6).alias("cosine"),
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        topk = scored.withColumn("nn_rank", F.row_number().over(w)).filter(
            F.col("nn_rank") <= TOP_K
        )
        per_setting.append(
            topk.join(truth, ["probe_id", "neighbor_id"], "left")
            .agg(
                F.lit(nprobe).alias("nprobe"),
                F.count("*").alias("n_retrieved"),
                F.sum(F.coalesce(F.col("is_true"), F.lit(0)))
                .cast("long")
                .alias("n_hits"),
            )
            .crossJoin(
                cand.agg(F.count("*").cast("long").alias("n_candidates"))
            )
        )
    out = per_setting[0]
    for df in per_setting[1:]:
        out = out.union(df)
    n_truth = len(PROBE_IDS) * TOP_K
    result = out.select(
        "nprobe",
        "n_retrieved",
        "n_hits",
        F.floor(F.lit(10000.0) * F.col("n_hits") / n_truth)
        .cast("long")
        .alias("recall_u4"),
        "n_candidates",
        F.floor(
            F.lit(10000.0)
            * F.col("n_candidates")
            / (len(PROBE_IDS) * n_corpus)
        )
        .cast("long")
        .alias("candidate_frac_u4"),
    )
    # materialize the |settings| rows, then release the cached
    # assignment so the op doesn't pin corpus-sized blocks for the
    # rest of the session (review finding; the repo convention is
    # try/finally around every persist)
    rows = result.collect()
    assigned.unpersist()
    return spark.createDataFrame(rows, result.schema)
