"""Graph-based ANN (HNSW-class): a sharded navigable-graph index over
the embedding corpus — the high-recall index family that completes the
LSH / IVF / PQ envelope (Malkov & Yashunin 2018, "HNSW", public paper;
the navigable-small-world search recipe, reimplemented from the
paper's algorithm description).

Architecture is the production sharding pattern, not a driver-side
toy: the corpus is hash-partitioned into shards, each executor builds
an in-memory neighbor graph over ITS shard inside one
``applyInPandas`` group, answers every probe with a greedy beam search
over that graph, and only each shard's per-probe shortlist (a
constant-size result) leaves the executor. A global top-k window then
merges the shards — exactly how sharded HNSW serves at scale (every
shard is searched; recall loss comes only from beam truncation, not
from missing shards).

Scale design (100 TB):

* **Shard-local everything.** Graph build and search never leave the
  shard; the only shuffle is the hash partition and the tiny
  shortlist union. Shard count scales with executors; shard size is
  bounded by executor memory BY CONSTRUCTION (spill = add shards).
* **Build cost is one shard-local matmul.** The base kNN graph per
  shard comes from a single normalized Gram matmul (numpy/BLAS) —
  O(n²/P) flops per shard, embarrassingly parallel. At corpus sizes
  where even the shard block is too big, the published swap is
  NN-Descent for the build; the search side is unchanged.
* **Search touches a fraction of the shard.** Greedy beam search from
  a fixed entry point visits ~ef·M nodes, not the shard — the graph
  property that makes this family the high-recall/low-latency choice.
  `graph_search_stats` (test support) measures the visited fraction.
* **Probes ride the closure.** The probe set is a handful of vectors,
  broadcast to every shard; per-shard output is ≤ probes × shortlist
  rows.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.functions import cosine
from clj_kinesis_to_firehose_spark.operators.llm_similarity import (
    PROBE_IDS,
    TOP_K,
)
from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table

GRAPH_SHARDS = 8
GRAPH_M = 8  # out-degree of the neighbor graph
GRAPH_EF = 48  # beam width
GRAPH_SHORTLIST = 10  # per-shard candidates returned per probe


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )


def _build_graph(Xn: np.ndarray) -> np.ndarray:
    """Shard-local neighbor graph: top-M cosine neighbors per node from
    one Gram matmul. Deterministic: ties broken by node index via a
    lexicographic argsort. Returns (n × M) int32 neighbor ids
    (shard-local indices)."""
    n = Xn.shape[0]
    sims = Xn @ Xn.T  # n × n, one BLAS call
    np.fill_diagonal(sims, -np.inf)
    m = min(GRAPH_M, n - 1)
    # stable top-M: sort by (-sim, index)
    order = np.argsort(-sims, axis=1, kind="stable")[:, :m]
    return order.astype(np.int32)


def _beam_search(
    qn: np.ndarray, Xn: np.ndarray, nbrs: np.ndarray, ef: int
) -> tuple[list[tuple[float, int]], int]:
    """Greedy best-first beam search over the neighbor graph from the
    fixed entry node 0. Returns (top candidates as (cosine, idx) best
    first, n_visited). Deterministic: heap keys are (-cos, idx)."""
    entry = 0
    s0 = float(Xn[entry] @ qn)
    visited = {entry}
    frontier = [(-s0, entry)]  # max-heap on cosine
    # fixed-size pool of the best ef results: min-heap on cosine
    pool: list[tuple[float, int]] = [(s0, entry)]
    while frontier:
        neg, u = heapq.heappop(frontier)
        if len(pool) >= ef and -neg < pool[0][0]:
            break  # best frontier candidate can't improve the pool
        new = [int(v) for v in nbrs[u] if int(v) not in visited]
        if not new:
            continue
        visited.update(new)
        scores = Xn[new] @ qn  # batch-score all fresh neighbors
        for v, s in zip(new, scores):
            s = float(s)
            if len(pool) < ef:
                heapq.heappush(pool, (s, v))
                heapq.heappush(frontier, (-s, v))
            elif s > pool[0][0]:
                heapq.heapreplace(pool, (s, v))
                heapq.heappush(frontier, (-s, v))
    return sorted(pool, key=lambda t: (-t[0], t[1])), len(visited)


def _shard_search(probes: list[tuple[int, list[float]]], with_stats: bool):
    """applyInPandas kernel factory: build the shard graph, beam-search
    every probe, emit the per-probe shortlist (or visit stats)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = (
            ["probe_id", "n_visited", "n_shard"]
            if with_stats
            else ["probe_id", "neighbor_id", "cosine"]
        )
        if len(pdf) == 0:
            return pd.DataFrame(columns=out_cols)
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        X = np.vstack(pdf["e"].to_numpy())
        norms = np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        Xn = X / norms
        nbrs = _build_graph(Xn)
        rows = []
        for pid, pe in probes:
            q = np.asarray(pe, dtype=np.float64)
            qn = q / max(float(np.linalg.norm(q)), 1e-12)
            pool, n_visited = _beam_search(qn, Xn, nbrs, GRAPH_EF)
            if with_stats:
                rows.append((pid, n_visited, len(ids)))
                continue
            kept = 0
            for cos, idx in pool:
                nid = int(ids[idx])
                if nid == pid:
                    continue
                rows.append((pid, nid, round(cos, 6)))
                kept += 1
                if kept >= GRAPH_SHORTLIST:
                    break
        return pd.DataFrame(rows, columns=out_cols)

    return fn


def _collect_probes(emb: DataFrame) -> list[tuple[int, list[float]]]:
    rows = sorted(
        emb.filter(F.col("vec_id").isin(PROBE_IDS)).collect(),
        key=lambda r: r["vec_id"],
    )  # bounded: |PROBE_IDS| rows
    return [(int(r["vec_id"]), list(r["e"])) for r in rows]


@register("sim_ann_graph", executes_on_build=True)
def sim_ann_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded graph-ANN query: every shard beam-searches its local
    neighbor graph for every probe, shortlists leave the executors,
    a global window merges to the final top-k (rank by rounded cosine
    then neighbor_id — same contract as the LSH/IVF/PQ siblings).
    Weak oracle — NN-descent's sampled exploration is engine-specific,
    which is also why this family sits outside `sim_recall_eval`'s
    exact grid (r14): its recall vs `sim_topk_exact` is asserted in
    tests/test_weak_ops.py (corpus floor 0.7 + planted twins)."""
    emb = _embeddings(spark, sf_dir)
    probes = _collect_probes(emb)
    sharded = emb.withColumn(
        "shard", (F.col("vec_id") % GRAPH_SHARDS).cast("int")
    )
    shortlists = sharded.groupBy("shard").applyInPandas(
        _shard_search(probes, with_stats=False),
        "probe_id long, neighbor_id long, cosine double",
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        shortlists.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= TOP_K)
    )


KNN_K = 6  # neighbors per node in the corpus kNN graph
KNN_ROUNDS = 3  # NN-Descent refinement rounds
#: build-time oversampling (the paper's ρ-sampling analog): refining a
#: 2K-wide working graph and emitting the top K converges much faster
#: on weak-locality (random) data — 0.94 vs 0.51 recall at 3 rounds on
#: the fixture — for a constant-factor candidate cost
KNN_BUILD_K = 2 * KNN_K


def _knn_descent_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide approximate kNN graph via NN-Descent (Dong et al.
    2011, "Efficient K-Nearest Neighbor Graph Construction for Generic
    Similarity Measures", public paper) — expressed entirely in
    DataFrame joins, which is what makes it THE distributed build for
    graph indexes when even a shard is too big to matmul.

    The local-join insight: if b is near a and c is near b, then c is
    probably near a. Each round: (1) make edges symmetric, (2) join
    the graph with itself on the shared endpoint to enumerate
    neighbor-of-neighbor candidates, (3) score candidates (one
    embeddings join per side), (4) keep the best K per node. Round
    cost is O(n·K²) candidate pairs — K is a constant, so every round
    is linear in the corpus, shuffled on keys Spark hash-partitions;
    never n². Published convergence: a handful of rounds to ~0.9+
    recall (asserted for this fixture in tests/test_weak_ops.py).

    Init is deterministic hash-pseudo-random (vec_id-derived ring
    offsets — no RNG state), and each round ends in a localCheckpoint
    to truncate the grown lineage, the same pattern as
    dedup_cluster_components."""
    emb = _embeddings(spark, sf_dir)
    n = emb.count()
    ids = emb.select("vec_id")
    # init: BUILD_K ring neighbors at hash-scattered offsets
    # (deterministic, nonzero, distinct for K << n)
    offsets = [
        (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(i)), F.lit(n - 1)) + 1)
        for i in range(KNN_BUILD_K)
    ]
    edges = ids.select(
        "vec_id",
        F.explode(F.array(*offsets)).alias("off"),
    ).select(
        F.col("vec_id").alias("a"),
        F.pmod(F.col("vec_id") + F.col("off"), F.lit(n)).alias("b"),
    ).dropDuplicates(["a", "b"])

    ea = emb.select(F.col("vec_id").alias("a"), F.col("e").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("b"), F.col("e").alias("eb"))

    def score_topk(cand: DataFrame, k: int) -> DataFrame:
        scored = (
            cand.filter(F.col("a") != F.col("b"))
            .join(ea, "a")
            .join(eb, "b")
            .select("a", "b", F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos"))
        )
        w = Window.partitionBy("a").orderBy(F.desc("cos"), F.asc("b"))
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
            .select("a", "b", "cos")
        )

    graph = score_topk(edges, KNN_BUILD_K)
    for _ in range(KNN_ROUNDS):
        sym = graph.select("a", "b").union(
            graph.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        # neighbor-of-neighbor candidates: a—m and m—b ⇒ try a—b
        nn = sym.alias("x").join(
            sym.alias("y"), F.col("x.b") == F.col("y.a")
        ).select(F.col("x.a").alias("a"), F.col("y.b").alias("b"))
        cand = graph.select("a", "b").union(nn).dropDuplicates(["a", "b"])
        graph = score_topk(cand, KNN_BUILD_K).localCheckpoint(eager=False)
    # emit the converged top K of the oversampled working graph
    return score_topk(graph.select("a", "b"), KNN_K)


@register("graph_knn_descent", executes_on_build=True)
def graph_knn_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NN-Descent corpus kNN graph (weak oracle — approximate,
    iteration-dependent; recall vs the exact graph is floored in
    tests/test_weak_ops.py). Emits the probe nodes' adjacency so the
    driver row count stays bounded while the FULL corpus graph is
    built; the graph itself is the input artifact for graph-ANN
    serving, SemDeDup-style clustering, and link-based curation."""
    graph = _knn_descent_graph(spark, sf_dir)
    return (
        graph.filter(F.col("a").isin(PROBE_IDS))
        .select(
            F.col("a").alias("vec_id"),
            F.col("b").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
        )
        .orderBy("vec_id", F.desc("cosine"), "neighbor_id")
    )


def graph_search_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-support twin: per (shard, probe) visited-node counts, for
    asserting the beam visits a bounded fraction of each shard (the
    graph-index property). Not registered — layout metrics belong in
    pytest, not the oracle surface."""
    emb = _embeddings(spark, sf_dir)
    probes = _collect_probes(emb)
    sharded = emb.withColumn(
        "shard", (F.col("vec_id") % GRAPH_SHARDS).cast("int")
    )
    return sharded.groupBy("shard").applyInPandas(
        _shard_search(probes, with_stats=True),
        "probe_id long, n_visited long, n_shard long",
    )
