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


@register("sim_ann_graph")
def sim_ann_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded graph-ANN query: every shard beam-searches its local
    neighbor graph for every probe, shortlists leave the executors,
    a global window merges to the final top-k (rank by rounded cosine
    then neighbor_id — same contract as the LSH/IVF/PQ siblings, so
    `sim_recall_eval` scores all four families uniformly). Weak
    oracle: recall vs `sim_topk_exact` is asserted in
    tests/test_weak_ops.py."""
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
