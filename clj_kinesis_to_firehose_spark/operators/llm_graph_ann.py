"""Graph-based ANN: a sharded navigable-graph index over the
embedding corpus — the high-recall index family that completes the
LSH / IVF / PQ envelope (Malkov & Yashunin 2018, "HNSW", public
paper; the navigable-graph search recipe, reimplemented from the
paper's algorithm description) — plus the distributed NN-Descent
graph build (Dong et al. 2011, public paper).

EXACT since r15 (r14 verdict #1 — the last algorithmic rows-only
pair): every score is an INTEGER dot product of quantized-normalized
vectors (``nq = FLOOR(x/‖x‖·1e6)`` int64, the sim_ann_lsh fixed-point
discipline), the NN-Descent init draws its ring offsets from the
portable 60-bit md5 hash instead of engine-private randomness, and
the graph search is a probe-guided fixed-hop beam (H bounded hops,
top-B frontier per hop) instead of a data-dependent-termination
best-first loop — a bounded-depth unrolling of the same greedy walk,
chosen because a FIXED hop count is what an unrolled-CTE oracle can
replay. Both ops' DuckDB oracles rebuild the identical graph and
replay the identical walk from the same constants; ranking keys are
integers, so no tie can resolve differently across engines.

Architecture is the production sharding pattern, not a driver-side
toy: the corpus is hash-partitioned into shards, each executor builds
an in-memory neighbor graph over ITS shard inside one
``applyInPandas`` group, answers every probe with the beam walk over
that graph, and only each shard's per-probe shortlist (a
constant-size result) leaves the executor. A global top-k window then
merges the shards — exactly how sharded graph-ANN serves at scale
(every shard is searched; recall loss comes only from beam
truncation, not from missing shards).

Scale design (100 TB):

* **Shard-local everything.** Graph build and search never leave the
  shard; the only shuffle is the hash partition and the tiny
  shortlist union. Shard count scales with executors; shard size is
  bounded by executor memory BY CONSTRUCTION (spill = add shards).
* **Build cost is one shard-local integer matmul** — O(n²/P) ops per
  shard, embarrassingly parallel. At corpus sizes where even the
  shard block is too big, the published swap is NN-Descent
  (:func:`graph_knn_descent` below) for the build; the search side
  is unchanged.
* **Search touches a bounded fraction of the shard.** The H-hop beam
  visits ≤ 1 + M + (H−1)·B·M nodes — a constant, not the shard
  (`graph_search_stats` measures the visited fraction in pytest).
* **Probes ride the closure.** The probe set is a handful of
  quantized vectors, broadcast to every shard; per-shard output is
  ≤ probes × shortlist rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.operators.llm_dedup import SQL_HASH60, portable_hash60
from clj_kinesis_to_firehose_spark.operators.llm_similarity import (
    PROBE_IDS,
    TOP_K,
)
from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table

GRAPH_SHARDS = 8
GRAPH_M = 8  # out-degree of the shard neighbor graph
BEAM_B = 8  # beam width: frontier nodes kept per hop
GRAPH_HOPS = 3  # fixed hop budget (what makes the walk unrollable)
GRAPH_SHORTLIST = 10  # per-shard candidates returned per probe
#: fixed-point scale for the quantized-normalized vectors: |nq_i| ≤ 1e6,
#: so a 64-dim integer dot is ≤ 6.4e13 — exact in int64/BIGINT/numpy.
NQ_Q = 1_000_000

#: 1-based probe-id list for SQL IN clauses
_SQL_PROBE_IDS = ", ".join(str(i) for i in PROBE_IDS)


def _nq_expr(e):
    """The quantized-normalized embedding — ``FLOOR(x_d / ‖x‖ · 1e6)``
    per dimension over a double-array column/expression ``e`` — the
    ONE Spark expression whose DuckDB twin is :func:`sql_nq_cte` (the
    float→int boundary lives in exactly one place per engine;
    everything downstream is integer). The dot of two nq vectors is
    the cosine in 1e-12 units (±quantization), so integer dots RANK
    like cosine. Zero-norm vectors are out of contract (none exist in
    any fixture; a production corpus would drop them at ingest)."""
    if isinstance(e, str):
        e = F.col(e)
    norm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda s, x: s + x * x))
    return F.transform(
        e, lambda x: F.floor(x / norm * F.lit(1000000.0)).cast("long")
    )


def _nq_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, nq array<long>) over the embeddings table."""
    e = F.transform("embedding", lambda x: x.cast("double"))
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _nq_expr(e).alias("nq")
    )


def sql_nq_cte(name: str = "v") -> str:
    """DuckDB twin of :func:`_nq_embeddings` — a CTE body exposing
    ``name``(vec_id, nq). The norm is SQRT(LIST_SUM(x²)) exactly as
    Spark's left-fold aggregate (the proven vector_normalize
    equivalence; fold-order law pinned in
    test_fixedpoint_properties). ``name`` lets composing oracles
    (dedup_semdedup_cells) avoid colliding with the kmeans prefix's
    own ``v``."""
    return f"""
    {name} AS MATERIALIZED (
      SELECT vec_id,
             LIST_TRANSFORM(
               LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)),
               x -> CAST(FLOOR(x / SQRT(LIST_SUM(LIST_TRANSFORM(
                      LIST_TRANSFORM(embedding, y -> CAST(y AS DOUBLE)),
                      y -> y * y))) * 1000000.0) AS BIGINT)) AS nq
      FROM embeddings)"""


_SQL_NQ_CTE = sql_nq_cte("v")

#: integer dot of two nq arrays (format with the two array exprs).
#: CAST pins the type to BIGINT — DuckDB's LIST_SUM widens integer
#: lists to HUGEINT, which would diverge from Spark's long schema.
_SQL_DOT = (
    "CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, 65), i -> {a}[i] * {b}[i]))"
    " AS BIGINT)"
)


def _idot() -> "F.Column":
    """Spark twin of :data:`_SQL_DOT` over columns na/nb — an integer
    zip-fold, order-free and exact."""
    return F.aggregate(
        F.zip_with("na", "nb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def _sql_graph_prelude() -> str:
    """Shared oracle prelude for every graph-walk consumer: the nq
    corpus, its shard split, each shard's top-M integer-dot graph
    (within-shard self-join), the probe vectors, and the per-shard
    entry node."""
    return f"""{sql_nq_cte("gv")},
    sv AS MATERIALIZED (
      SELECT vec_id, vec_id % {GRAPH_SHARDS} AS shard, nq FROM gv),
    edges AS MATERIALIZED (
      SELECT shard, a, b, dot FROM (
        SELECT a.shard, a.vec_id AS a, b.vec_id AS b,
               {_SQL_DOT.format(a="a.nq", b="b.nq")} AS dot,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_SQL_DOT.format(a="a.nq", b="b.nq")} DESC,
                          b.vec_id) AS r
        FROM sv a JOIN sv b
          ON a.shard = b.shard AND a.vec_id != b.vec_id)
      WHERE r <= {GRAPH_M}),
    gprobes AS (SELECT vec_id AS probe_id, nq AS pq FROM sv
                WHERE vec_id IN ({_SQL_PROBE_IDS})),
    gentry AS (SELECT shard, MIN(vec_id) AS node FROM sv GROUP BY shard)"""


def _sql_walk_chain(tag: str, hops: int, beam: int) -> str:
    """The unrolled H-hop beam walk over the prelude's CTEs, with all
    intermediate names suffixed by ``tag`` so several (hops, beam)
    settings can coexist in one statement. Exposes ``pool{tag}``
    (probe_id, shard, node, dot — every node the walk scored) and
    ``short{tag}`` (per-shard top-SHORTLIST, probe itself excluded)."""
    chains = []
    for h in range(1, hops + 1):
        p = h - 1
        chains.append(f""",
    cand{tag}{h} AS (
      SELECT DISTINCT f.probe_id, f.shard, ed.b AS node
      FROM f{tag}{p} f
      JOIN edges ed ON ed.shard = f.shard AND ed.a = f.node
      WHERE NOT EXISTS (SELECT 1 FROM vis{tag}{p} x
                        WHERE x.probe_id = f.probe_id
                          AND x.shard = f.shard AND x.node = ed.b)),
    sc{tag}{h} AS MATERIALIZED (
      SELECT c.probe_id, c.shard, c.node,
             {_SQL_DOT.format(a="p.pq", b="n.nq")} AS dot
      FROM cand{tag}{h} c
      JOIN gprobes p ON p.probe_id = c.probe_id
      JOIN sv n ON n.vec_id = c.node),
    f{tag}{h} AS (
      SELECT probe_id, shard, node FROM (
        SELECT probe_id, shard, node,
               ROW_NUMBER() OVER (PARTITION BY probe_id, shard
                                  ORDER BY dot DESC, node) AS r
        FROM sc{tag}{h}) WHERE r <= {beam}),
    vis{tag}{h} AS (
      SELECT probe_id, shard, node FROM vis{tag}{p}
      UNION ALL SELECT probe_id, shard, node FROM sc{tag}{h})""")
    pool_union = "\n      UNION ALL ".join(
        f"SELECT probe_id, shard, node, dot FROM sc{tag}{h}"
        for h in range(0, hops + 1)
    )
    return f""",
    f{tag}0 AS (SELECT p.probe_id, e.shard, e.node
                FROM gprobes p CROSS JOIN gentry e),
    sc{tag}0 AS (SELECT f.probe_id, f.shard, f.node,
                        {_SQL_DOT.format(a="p.pq", b="n.nq")} AS dot
                 FROM f{tag}0 f
                 JOIN gprobes p ON p.probe_id = f.probe_id
                 JOIN sv n ON n.vec_id = f.node),
    vis{tag}0 AS (SELECT probe_id, shard, node FROM f{tag}0)
    {"".join(chains)},
    pool{tag} AS ({pool_union}),
    short{tag} AS (
      SELECT probe_id, node AS neighbor_id, dot FROM (
        SELECT probe_id, shard, node, dot,
               ROW_NUMBER() OVER (PARTITION BY probe_id, shard
                                  ORDER BY dot DESC, node) AS r
        FROM pool{tag} WHERE node != probe_id)
      WHERE r <= {GRAPH_SHORTLIST})"""


def _sql_ann_graph() -> str:
    """Unrolled-CTE oracle for :func:`sim_ann_graph`: rebuild each
    shard's top-M integer-dot graph with a within-shard self-join,
    then replay the H-hop beam per (probe, shard) — candidates =
    neighbors of the frontier minus everything already visited, all
    candidates scored and pooled, frontier = hop's top-B — and merge
    the per-shard shortlists to the global top-k. Every ranking key is
    an integer; ties break on vec_id in both engines."""
    return f"""
    WITH {_sql_graph_prelude()}
    {_sql_walk_chain("", GRAPH_HOPS, BEAM_B)}
    SELECT probe_id, neighbor_id, cos_q12, nn_rank FROM (
      SELECT probe_id, neighbor_id, dot AS cos_q12,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY dot DESC, neighbor_id) AS nn_rank
      FROM short) WHERE nn_rank <= {TOP_K}
    """


def _shard_search(probes: list[tuple[int, list[int]]], with_stats: bool):
    """applyInPandas kernel factory over (vec_id, nq) groups: build
    the shard's top-M graph (one int64 matmul), replay the H-hop beam
    for every probe, emit the per-probe shortlist (or visit stats).
    Pure integer arithmetic throughout — bit-identical to the oracle's
    CTE replay under any partitioning. (The calibration sweep uses
    :func:`_shard_search_sweep`, which walks every (hops, beam)
    setting over one graph build.)"""
    hops, beam = GRAPH_HOPS, BEAM_B

    P = np.array([p for _, p in probes], dtype="int64")
    pids = [pid for pid, _ in probes]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = (
            ["probe_id", "n_visited", "n_shard"]
            if with_stats
            else ["probe_id", "neighbor_id", "cos_q12"]
        )
        if len(pdf) == 0:
            return pd.DataFrame(columns=out_cols)
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        N = np.vstack(pdf["nq"].to_numpy()).astype("int64")
        n = N.shape[0]
        dots = N @ N.T
        m = min(GRAPH_M, n - 1)
        # top-M by (dot DESC, vec_id ASC): stable argsort of -dots ties
        # to the lower index, and index order IS vec_id order. Exclude
        # self AFTER negation — negating int64.min wraps back to
        # int64.min, which would sort self FIRST instead of last.
        neg = -dots
        np.fill_diagonal(neg, np.iinfo(np.int64).max)
        nbrs = np.argsort(neg, axis=1, kind="stable")[:, :m]
        pdots = N @ P.T  # n × n_probes, exact
        rows = []
        for j, pid in enumerate(pids):
            entry = 0  # lowest vec_id in the shard
            visited = {entry}
            frontier = [entry]
            pool = [(int(pdots[entry, j]), entry)]
            for _ in range(hops):
                cand = sorted(
                    {int(v) for u in frontier for v in nbrs[u]} - visited
                )
                if not cand:
                    break
                visited.update(cand)
                scored = [(int(pdots[v, j]), v) for v in cand]
                pool.extend(scored)
                scored.sort(key=lambda t: (-t[0], t[1]))
                frontier = [v for _, v in scored[:beam]]
            if with_stats:
                rows.append((pid, len(visited), n))
                continue
            pool.sort(key=lambda t: (-t[0], t[1]))
            kept = 0
            for dot, idx in pool:
                nid = int(ids[idx])
                if nid == pid:
                    continue
                rows.append((pid, nid, dot))
                kept += 1
                if kept >= GRAPH_SHORTLIST:
                    break
        return pd.DataFrame(rows, columns=out_cols)

    return fn


def _shard_search_sweep(
    probes: list[tuple[int, list[int]]],
    sweep: list[tuple[int, int]],
):
    """The calibration twin of :func:`_shard_search`: ONE
    applyInPandas pass that builds the shard's top-M graph ONCE (the
    expensive int64 matmuls) and replays the walk for EVERY
    (hops, beam) setting over it — 2·|sweep| kernel passes collapsed
    to one, which is also what makes the docstring claim "one graph
    build serves every setting" literally true in the Spark plan.
    Emits shortlist rows (neighbor_id/cos_q12 set, n_visited NULL)
    plus one stats row per (setting, probe) with neighbor_id NULL and
    the walk's visited count — the NULL split keeps both relations in
    one schema so the single pass feeds both aggregates."""

    P = np.array([p for _, p in probes], dtype="int64")
    pids = [pid for pid, _ in probes]
    cols = ["hops", "beam", "probe_id", "neighbor_id", "cos_q12", "n_visited"]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        N = np.vstack(pdf["nq"].to_numpy()).astype("int64")
        n = N.shape[0]
        dots = N @ N.T
        m = min(GRAPH_M, n - 1)
        neg = -dots
        np.fill_diagonal(neg, np.iinfo(np.int64).max)
        nbrs = np.argsort(neg, axis=1, kind="stable")[:, :m]
        pdots = N @ P.T
        rows = []
        for hops, beam in sweep:
            for j, pid in enumerate(pids):
                entry = 0
                visited = {entry}
                frontier = [entry]
                pool = [(int(pdots[entry, j]), entry)]
                for _ in range(hops):
                    cand = sorted(
                        {int(v) for u in frontier for v in nbrs[u]} - visited
                    )
                    if not cand:
                        break
                    visited.update(cand)
                    scored = [(int(pdots[v, j]), v) for v in cand]
                    pool.extend(scored)
                    scored.sort(key=lambda t: (-t[0], t[1]))
                    frontier = [v for _, v in scored[:beam]]
                rows.append((hops, beam, pid, None, None, len(visited)))
                pool.sort(key=lambda t: (-t[0], t[1]))
                kept = 0
                for dot, idx in pool:
                    nid = int(ids[idx])
                    if nid == pid:
                        continue
                    rows.append((hops, beam, pid, nid, dot, None))
                    kept += 1
                    if kept >= GRAPH_SHORTLIST:
                        break
        return pd.DataFrame(rows, columns=cols)

    return fn


def _collect_probes(emb: DataFrame) -> list[tuple[int, list[int]]]:
    rows = sorted(
        emb.filter(F.col("vec_id").isin(PROBE_IDS)).collect(),
        key=lambda r: r["vec_id"],
    )  # bounded: |PROBE_IDS| rows
    return [(int(r["vec_id"]), [int(x) for x in r["nq"]]) for r in rows]


@register("sim_ann_graph", oracle=_sql_ann_graph(), executes_on_build=True)
def sim_ann_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded graph-ANN query, EXACT (r15): every shard beam-walks
    its local top-M integer-dot graph for every probe (H fixed hops,
    top-B frontier per hop), shortlists leave the executors, a global
    window merges to the final top-k — ranked by the integer cos_q12
    (the cosine in 1e-12 units) then neighbor_id, so the result is
    bit-reproducible and the DuckDB oracle replays the identical walk.
    Recall vs sim_topk_exact stays pinned in tests/test_weak_ops.py
    (planted twins + corpus floor) — exactness proves the plan, recall
    proves the algorithm."""
    emb = _nq_embeddings(spark, sf_dir)
    probes = _collect_probes(emb)
    sharded = emb.withColumn(
        "shard", (F.col("vec_id") % GRAPH_SHARDS).cast("int")
    )
    shortlists = sharded.groupBy("shard").applyInPandas(
        _shard_search(probes, with_stats=False),
        "probe_id long, neighbor_id long, cos_q12 long",
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_q12"), F.asc("neighbor_id")
    )
    return (
        shortlists.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= TOP_K)
    )


#: (hops, beam) settings swept by the graph calibration — the two
#: knobs that trade visited-node volume for recall
GRAPH_CAL_SWEEP = [(1, 8), (2, 8), (3, 4), (3, 8)]
_N_TRUTH = len(PROBE_IDS) * TOP_K


def _sql_graph_calibration() -> str:
    """One shared prelude (corpus, shard graphs, probes, entries),
    one unrolled walk chain PER (hops, beam) setting, the exact
    ground truth composed from the registered sim_topk_exact rule,
    and per-setting integer recall + visited-volume rows."""
    from clj_kinesis_to_firehose_spark.registry import oracle

    chains, selects = [], []
    for h, b in GRAPH_CAL_SWEEP:
        tag = f"h{h}b{b}"
        chains.append(_sql_walk_chain(tag, h, b))
        selects.append(f"""
      SELECT {h} AS hops, {b} AS beam,
             (SELECT COUNT(*) FROM top{tag}) AS n_retrieved,
             (SELECT COUNT(*) FROM top{tag} t
              JOIN truth x ON x.probe_id = t.probe_id
                          AND x.neighbor_id = t.neighbor_id) AS n_hits,
             (SELECT COUNT(*) FROM pool{tag}) AS n_visited""")
        chains.append(f""",
    top{tag} AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT probe_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY dot DESC, neighbor_id) AS r
        FROM short{tag}) WHERE r <= {TOP_K})""")
    return f"""
    WITH {_sql_graph_prelude()},
    truth AS (SELECT probe_id, neighbor_id
              FROM ({oracle("sim_topk_exact")}))
    {"".join(chains)}
    SELECT hops, beam, n_retrieved, n_hits,
           (10000 * n_hits) // {_N_TRUTH} AS recall_u4,
           n_visited,
           (10000 * n_visited) //
             ({len(PROBE_IDS)} * (SELECT COUNT(*) FROM gv)) AS visit_frac_u4
    FROM ({" UNION ALL ".join(selects)})
    """


@register(
    "sim_ann_graph_calibration",
    executes_on_build=True,
    oracle=_sql_graph_calibration(),
)
def sim_ann_graph_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-vs-(hops, beam) calibration for the graph index — the
    dedup_lsh / sim_ann / sim_ann_ivf calibration pattern applied to
    the FOURTH family, completing the symmetry: before provisioning a
    graph-serving tier you sweep the walk budget and read the curve —
    recall@k against the exact top-k on one axis, visited-node volume
    (the latency/compute cost the budget buys) on the other. One
    shard-graph build serves every setting; only the walk re-runs.
    EXACT oracle: the shared prelude plus one unrolled walk chain per
    setting, ground truth composed from the registered sim_topk_exact
    rule; recall/visit-fraction are integer floor-divisions of exact
    counts.

    Scale: each setting's walk visits ≤ 1 + M + (H−1)·B·M nodes per
    (probe, shard) — the sweep's cost axis is BY CONSTRUCTION
    corpus-size-independent; the output is |settings| rows."""
    from clj_kinesis_to_firehose_spark.operators.llm_similarity import (
        sim_topk_exact,
    )

    truth = sim_topk_exact(spark, sf_dir).select("probe_id", "neighbor_id")
    emb = _nq_embeddings(spark, sf_dir)
    probes = _collect_probes(emb)
    sharded = emb.withColumn(
        "shard", (F.col("vec_id") % GRAPH_SHARDS).cast("int")
    )
    n_corpus = emb.agg(F.count("*").cast("long").alias("n_corpus"))
    # ONE kernel pass for all settings (graph built once per shard),
    # persisted so the three consumers below don't re-run it; the
    # relation is |settings|·|probes|·|shards|·(SHORTLIST+1) rows.
    sweep = (
        sharded.groupBy("shard")
        .applyInPandas(
            _shard_search_sweep(probes, GRAPH_CAL_SWEEP),
            "hops int, beam int, probe_id long, neighbor_id long,"
            " cos_q12 long, n_visited long",
        )
        .persist()
    )
    short = sweep.filter(F.col("neighbor_id").isNotNull())
    w = Window.partitionBy("hops", "beam", "probe_id").orderBy(
        F.desc("cos_q12"), F.asc("neighbor_id")
    )
    topk = (
        short.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= TOP_K)
        .select("hops", "beam", "probe_id", "neighbor_id")
    )
    ret = topk.groupBy("hops", "beam").agg(
        F.count("*").cast("long").alias("n_retrieved")
    )
    hits = topk.join(truth, ["probe_id", "neighbor_id"]).groupBy(
        "hops", "beam"
    ).agg(F.count("*").cast("long").alias("n_hits"))
    vis = (
        sweep.filter(F.col("neighbor_id").isNull())
        .groupBy("hops", "beam")
        .agg(F.sum("n_visited").cast("long").alias("n_visited"))
    )
    return (
        ret.join(hits, ["hops", "beam"], "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0).cast("long")))
        .join(vis, ["hops", "beam"])
        .crossJoin(F.broadcast(n_corpus))
        .select(
            "hops",
            "beam",
            "n_retrieved",
            "n_hits",
            F.expr(f"(10000 * n_hits) div {_N_TRUTH}").alias("recall_u4"),
            "n_visited",
            F.expr(
                f"(10000 * n_visited) div ({len(PROBE_IDS)} * n_corpus)"
            ).alias("visit_frac_u4"),
        )
    )


KNN_K = 6  # neighbors per node in the corpus kNN graph
KNN_ROUNDS = 3  # NN-Descent refinement rounds
#: build-time oversampling (the paper's ρ-sampling analog): refining a
#: 2K-wide working graph and emitting the top K converges much faster
#: on weak-locality (random) data — 0.94 vs 0.51 recall at 3 rounds on
#: the fixture — for a constant-factor candidate cost
KNN_BUILD_K = 2 * KNN_K


def _sql_knn_descent(final_k: int, probe_filter: bool) -> str:
    """Unrolled-CTE oracle replaying :func:`_knn_descent_graph`:
    portable-hash ring init, then per round symmetrize → neighbor-of-
    neighbor candidates → integer-dot score → top-BUILD_K per node,
    then the final top-``final_k`` cut (optionally restricted to the
    probe nodes, which is sound because the per-node cut is
    independent across nodes)."""
    rounds = []
    for r in range(1, KNN_ROUNDS + 1):
        p = r - 1
        rounds.append(f""",
    s{r} AS (SELECT a, b FROM g{p}
             UNION ALL SELECT b AS a, a AS b FROM g{p}),
    c{r} AS (SELECT DISTINCT a, b FROM (
               SELECT a, b FROM g{p}
               UNION ALL
               SELECT x.a AS a, y.b AS b
               FROM s{r} x JOIN s{r} y ON x.b = y.a)
             WHERE a != b),
    g{r} AS MATERIALIZED (
      SELECT a, b, dot FROM (
        SELECT c.a, c.b, {_SQL_DOT.format(a="va.nq", b="vb.nq")} AS dot,
               ROW_NUMBER() OVER (
                 PARTITION BY c.a
                 ORDER BY {_SQL_DOT.format(a="va.nq", b="vb.nq")} DESC,
                          c.b) AS r
        FROM c{r} c JOIN v va ON va.vec_id = c.a
                    JOIN v vb ON vb.vec_id = c.b)
      WHERE r <= {KNN_BUILD_K})""")
    probe_where = (
        f"WHERE a IN ({_SQL_PROBE_IDS})" if probe_filter else ""
    )
    return f"""
    WITH {_SQL_NQ_CTE},
    cnt AS (SELECT COUNT(*) AS n FROM v),
    e0 AS (
      SELECT DISTINCT vec_id AS a,
             (vec_id + ({SQL_HASH60.format(
                 x="vec_id::VARCHAR || ':' || i::VARCHAR")}
                        % (c.n - 1) + 1)) % c.n AS b
      FROM v CROSS JOIN cnt c, UNNEST(RANGE(0, {KNN_BUILD_K})) t(i)),
    g0 AS MATERIALIZED (
      SELECT a, b, dot FROM (
        SELECT e.a, e.b, {_SQL_DOT.format(a="va.nq", b="vb.nq")} AS dot,
               ROW_NUMBER() OVER (
                 PARTITION BY e.a
                 ORDER BY {_SQL_DOT.format(a="va.nq", b="vb.nq")} DESC,
                          e.b) AS r
        FROM e0 e JOIN v va ON va.vec_id = e.a
                  JOIN v vb ON vb.vec_id = e.b)
      WHERE r <= {KNN_BUILD_K})
    {"".join(rounds)}
    SELECT vec_id, neighbor_id, cos_q12 FROM (
      SELECT a AS vec_id, b AS neighbor_id, dot AS cos_q12,
             ROW_NUMBER() OVER (PARTITION BY a
                                ORDER BY dot DESC, b) AS r
      FROM g{KNN_ROUNDS} {probe_where})
    WHERE r <= {final_k}
    """


def _knn_descent_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide approximate kNN graph via NN-Descent (Dong et al.
    2011, "Efficient K-Nearest Neighbor Graph Construction for Generic
    Similarity Measures", public paper) — expressed entirely in
    DataFrame joins, which is what makes it THE distributed build for
    graph indexes when even a shard is too big to matmul. EXACT since
    r15: init offsets come from the portable 60-bit hash (not
    xxhash64) and scores are integer nq dots, so the whole descent
    replays verbatim in the unrolled-CTE oracle.

    The local-join insight: if b is near a and c is near b, then c is
    probably near a. Each round: (1) make edges symmetric, (2) join
    the graph with itself on the shared endpoint to enumerate
    neighbor-of-neighbor candidates, (3) score candidates (one
    embeddings join per side), (4) keep the best BUILD_K per node.
    Round cost is O(n·K²) candidate pairs — K is a constant, so every
    round is linear in the corpus, shuffled on keys Spark
    hash-partitions; never n². Published convergence: a handful of
    rounds to ~0.9+ recall (asserted in tests/test_weak_ops.py).

    Init assumes the contiguous 0..n−1 vec_id space of the fixture
    corpus (ring offsets land on existing ids); each round ends in a
    localCheckpoint to truncate the grown lineage, the same pattern
    as dedup_cluster_components. Emits (a, b, dot)."""
    emb = _nq_embeddings(spark, sf_dir)
    n = emb.count()
    ids = emb.select("vec_id")
    # init: BUILD_K ring neighbors at portable-hash-scattered offsets
    # (deterministic, nonzero, distinct for K << n)
    offsets = [
        (
            portable_hash60(
                F.concat(F.col("vec_id").cast("string"), F.lit(f":{i}"))
            )
            % F.lit(n - 1)
            + 1
        )
        for i in range(KNN_BUILD_K)
    ]
    edges = ids.select(
        "vec_id",
        F.explode(F.array(*offsets)).alias("off"),
    ).select(
        F.col("vec_id").alias("a"),
        ((F.col("vec_id") + F.col("off")) % F.lit(n)).alias("b"),
    ).dropDuplicates(["a", "b"])

    ea = emb.select(F.col("vec_id").alias("a"), F.col("nq").alias("na"))
    eb = emb.select(F.col("vec_id").alias("b"), F.col("nq").alias("nb"))

    def score_topk(cand: DataFrame, k: int) -> DataFrame:
        # r16 (guide §2.5): the interpreted integer-dot fold runs per
        # CANDIDATE (n·K² per round) and AQE coalesced the tiny
        # candidate shuffle to a handful of tasks — blind to the
        # fold's CPU. Pre-partition the candidates by the top-K
        # window's own key at a PINNED width (REPARTITION_BY_NUM —
        # AQE can't re-serialize it): the scoring stage parallelizes,
        # and the window reuses the partitioning with no further
        # exchange. The embedding joins stay planner-chosen (they
        # auto-broadcast at fixture size and shuffle at corpus scale).
        scored = (
            cand.filter(F.col("a") != F.col("b"))
            .repartition(spark.sparkContext.defaultParallelism, "a")
            .join(ea, "a")
            .join(eb, "b")
            .select("a", "b", _idot().alias("dot"))
        )
        w = Window.partitionBy("a").orderBy(F.desc("dot"), F.asc("b"))
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
            .select("a", "b", "dot")
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
    # the converged top K of the oversampled working graph (the dots
    # are already final — a per-node window cut, no rescoring join)
    w = Window.partitionBy("a").orderBy(F.desc("dot"), F.asc("b"))
    return (
        graph.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= KNN_K)
        .select("a", "b", "dot")
    )


@register(
    "graph_knn_descent",
    oracle=_sql_knn_descent(KNN_K, probe_filter=True),
    executes_on_build=True,
)
def graph_knn_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NN-Descent corpus kNN graph — EXACT (r15): the descent is
    seeded by portable-hash ring offsets and scored in integer fixed
    point, so the DuckDB oracle replays every round verbatim; recall
    vs the exact graph stays floored in tests/test_weak_ops.py.
    Emits the probe nodes' adjacency so the driver row count stays
    bounded while the FULL corpus graph is built; the graph itself is
    the input artifact for graph-ANN serving, SemDeDup-style
    clustering, and link-based curation."""
    graph = _knn_descent_graph(spark, sf_dir)
    return (
        graph.filter(F.col("a").isin(PROBE_IDS))
        .select(
            F.col("a").alias("vec_id"),
            F.col("b").alias("neighbor_id"),
            F.col("dot").alias("cos_q12"),
        )
        .orderBy("vec_id", F.desc("cos_q12"), "neighbor_id")
    )


#: SemDeDup prune threshold in cos·1e12 units. 0.30 is the FIXTURE
#: regime (random unit vectors — within-cell cosines concentrate low);
#: a production run over real text embeddings sets this near the
#: paper's ~0.9. The knob changes selectivity, never the plan.
SEMDEDUP_TAU_Q12 = 300_000_000_000


def _sql_semdedup_cells() -> str:
    """Oracle composing the shared fixed-point kmeans prefix (kfinal =
    the exact cell assignment) with the nq fixed-point cosine: within
    each cell, integer-dot every (lower-id, higher-id) pair, keep
    pairs at/above τ, and emit each pruned vector's LOWEST-id keeper."""
    from clj_kinesis_to_firehose_spark.operators.llm_clustering import (
        _sql_kmeans_prefix,
    )

    dot = _SQL_DOT.format(a="na.nq", b="nb.nq")
    return f"""
    WITH {_sql_kmeans_prefix()},
    {sql_nq_cte("nv").strip()},
    qual AS (
      SELECT keeper, pruned, cq FROM (
        SELECT a.vec_id AS keeper, b.vec_id AS pruned, {dot} AS cq
        FROM kfinal a JOIN kfinal b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN nv na ON na.vec_id = a.vec_id
        JOIN nv nb ON nb.vec_id = b.vec_id)
      WHERE cq >= {SEMDEDUP_TAU_Q12})
    SELECT pruned_vec_id, keeper_vec_id, cos_q12 FROM (
      SELECT pruned AS pruned_vec_id, keeper AS keeper_vec_id,
             cq AS cos_q12,
             ROW_NUMBER() OVER (PARTITION BY pruned ORDER BY keeper) AS r
      FROM qual) WHERE r = 1
    """


@register(
    "dedup_semdedup_cells",
    executes_on_build="conditional",  # warm _KMEANS_FIT_MEMO skips the fit
    oracle=_sql_semdedup_cells(),
)
def dedup_semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the REAL kmeans cells (Abbas et al. 2023, public
    paper) — the composition `dedup_semantic_prune`'s docstring
    promised ("at 100 TB the assignment comes from embedding_kmeans")
    delivered as tested code, now that both halves are exact: the cell
    key is the fixed-point Lloyd's assignment (:func:`_fit_kmeans_fp`,
    shared memoized fit), the similarity is the fixed-point nq cosine,
    and each vector with a lower-id clustermate at cosine ≥ τ is
    pruned in favor of its LOWEST-id keeper. EXACT oracle: the shared
    unrolled kmeans prefix joined to the nq CTE.

    Scale: pairwise cosine runs ONLY inside a cell — pair cost is
    Σ n_cell², bounded by the cell-size distribution the kmeans report
    already monitors (and k is the knob); the equi-join on the cell
    key is an ordinary shuffle join AQE skew-splits. Nothing is ever
    corpus²."""
    from clj_kinesis_to_firehose_spark.operators.llm_clustering import (
        _fit_kmeans_fp,
    )

    _, assigned, _ = _fit_kmeans_fp(spark, sf_dir)
    # nq derives from the assignment's own double vectors — no join
    # back to the corpus (the assignment already carries `e`; the
    # expression is the oracle's nv CTE verbatim)
    emb = assigned.select("vec_id", "cluster", _nq_expr("e").alias("nq"))
    a = emb.select(
        F.col("vec_id").alias("keeper"), "cluster", F.col("nq").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("pruned"), "cluster", F.col("nq").alias("nb")
    )
    qual = (
        a.join(b, "cluster")
        .filter(F.col("keeper") < F.col("pruned"))
        .select("keeper", "pruned", _idot().alias("cos_q12"))
        .filter(F.col("cos_q12") >= SEMDEDUP_TAU_Q12)
    )
    w = Window.partitionBy("pruned").orderBy("keeper")
    return (
        qual.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            F.col("pruned").alias("pruned_vec_id"),
            F.col("keeper").alias("keeper_vec_id"),
            "cos_q12",
        )
    )


#: base/delta split for the incremental semantic admission — the SAME
#: md5-bucket convention as dedup_incremental_minhash/phash/url
#: (first 8 md5 hex chars % 100; < threshold ⇒ "already ingested")
INC_SEM_BASE_PCT = 80


def _sql_inc_semantic() -> str:
    from clj_kinesis_to_firehose_spark.operators.llm_clustering import (
        _sql_kmeans_prefix,
    )

    dot = _SQL_DOT.format(a="d.na", b="b.nb")
    return f"""
    WITH {_sql_kmeans_prefix()},
    {sql_nq_cte("nv").strip()},
    tagged AS (
      SELECT k.vec_id, k.cluster, n.nq,
             (('0x' || substr(md5(k.vec_id::VARCHAR), 1, 8))::BIGINT) % 100
               AS bkt
      FROM kfinal k JOIN nv n ON n.vec_id = k.vec_id),
    base AS (SELECT vec_id AS base_id, cluster, nq AS nb FROM tagged
             WHERE bkt < {INC_SEM_BASE_PCT}),
    delta AS (SELECT vec_id, cluster, nq AS na FROM tagged
              WHERE bkt >= {INC_SEM_BASE_PCT}),
    scored AS (
      SELECT d.vec_id, d.cluster, {dot} AS cq
      FROM delta d LEFT JOIN base b ON d.cluster = b.cluster),
    agg AS (SELECT vec_id, cluster, MAX(cq) AS best
            FROM scored GROUP BY vec_id, cluster)
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
           best AS best_base_cos_q12,
           CASE WHEN best >= {SEMDEDUP_TAU_Q12} THEN 'prune'
                ELSE 'admit' END AS verdict
    FROM agg
    """


@register(
    "dedup_incremental_semantic",
    executes_on_build="conditional",  # warm _KMEANS_FIT_MEMO skips the fit
    oracle=_sql_inc_semantic(),
)
def dedup_incremental_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SEMANTIC admission — the missing member of the
    dedup_incremental_{url,phash,minhash,spans} family, possible now
    that the cell index is exact: each ARRIVING vector (md5-bucket
    split, the family convention) is checked against the BASE vectors
    of its assigned kmeans cell only — never against the whole corpus
    and never base-vs-base — and pruned iff some base neighbor reaches
    the SemDeDup threshold. Output per arrival: its cell, the best
    base cosine (NULL when its cell has no base members — such
    arrivals are admitted; novelty is not a duplicate), and the
    admit/prune verdict an ingestion pipeline branches on. EXACT
    oracle: shared Lloyd's prefix + nq CTE + the same split predicate.

    Scale: per ingest batch the cost is |delta| × (cell base size) —
    the cell bound, same as the batch SemDeDup, but paid only on
    arrivals; the base side is the persisted index relation
    (vec_id, cluster, nq ≈ 0.5 KB/vector). Pair with
    sim_ann_ivf_incremental's growth census to know when the frozen
    cells need a refit."""
    from clj_kinesis_to_firehose_spark.operators.llm_clustering import (
        _fit_kmeans_fp,
    )

    _, assigned, _ = _fit_kmeans_fp(spark, sf_dir)
    bkt = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    # nq derives from the assignment's own double vectors — no join
    # back to the corpus
    tagged = assigned.select(
        "vec_id", "cluster", _nq_expr("e").alias("nq")
    ).withColumn("bkt", bkt)
    base = tagged.filter(F.col("bkt") < INC_SEM_BASE_PCT).select(
        F.col("vec_id").alias("base_id"), "cluster", F.col("nq").alias("nb")
    )
    delta = tagged.filter(F.col("bkt") >= INC_SEM_BASE_PCT).select(
        "vec_id", "cluster", F.col("nq").alias("na")
    )
    scored = delta.join(base, "cluster", "left").select(
        "vec_id", "cluster", _idot().alias("cq")
    )
    agg = scored.groupBy("vec_id", F.col("cluster").cast("long").alias("cluster")).agg(
        F.max("cq").alias("best_base_cos_q12")
    )
    return agg.select(
        "vec_id",
        "cluster",
        "best_base_cos_q12",
        F.when(
            F.col("best_base_cos_q12") >= SEMDEDUP_TAU_Q12, F.lit("prune")
        )
        .otherwise(F.lit("admit"))
        .alias("verdict"),
    )


#: reciprocal-rank-fusion damping constant (Cormack/Clarke/Buettcher
#: 2009, "Reciprocal Rank Fusion" — public paper; 60 is the paper's
#: recommended k) and the fixed-point scale that keeps the score an
#: exact integer in both engines
RRF_K = 60
RRF_SCALE = 10**12


def _sql_rank_fusion() -> str:
    """Pure-consumer oracle: fuses the registered LSH and IVF
    shortlist rules with integer fixed-point RRF — the contribution of
    a list that ranked the candidate r-th is RRF_SCALE // (RRF_K + r),
    absent-from-list contributes 0."""
    from clj_kinesis_to_firehose_spark.registry import oracle

    return f"""
    WITH lsh AS ({oracle("sim_ann_lsh")}),
    ivf AS ({oracle("sim_ann_ivf")}),
    merged AS (
      SELECT COALESCE(l.probe_id, i.probe_id) AS probe_id,
             COALESCE(l.neighbor_id, i.neighbor_id) AS neighbor_id,
             CAST(COALESCE(l.nn_rank, 0) AS BIGINT) AS r_lsh,
             CAST(COALESCE(i.nn_rank, 0) AS BIGINT) AS r_ivf
      FROM lsh l FULL JOIN ivf i
        ON i.probe_id = l.probe_id AND i.neighbor_id = l.neighbor_id),
    scored AS (
      SELECT probe_id, neighbor_id, r_lsh, r_ivf,
             (CASE WHEN r_lsh > 0
                   THEN {RRF_SCALE} // ({RRF_K} + r_lsh) ELSE 0 END)
           + (CASE WHEN r_ivf > 0
                   THEN {RRF_SCALE} // ({RRF_K} + r_ivf) ELSE 0 END)
               AS rrf_u12
      FROM merged)
    SELECT probe_id, neighbor_id, r_lsh, r_ivf, rrf_u12,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY probe_id ORDER BY rrf_u12 DESC, neighbor_id
      ) AS fused_rank FROM scored)
    WHERE fused_rank <= {TOP_K}
    """


@register(
    "sim_rank_fusion",
    executes_on_build="conditional",  # warm _KMEANS_FIT_MEMO (via the
    # composed sim_ann_ivf) and probe memo skip every build-time action
    oracle=_sql_rank_fusion(),
)
def sim_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval shortlist fusion: reciprocal-rank fusion of
    the LSH and IVF ANN shortlists — the serving-tier merge a
    production retrieval stack runs when two index families disagree
    (RRF needs only ranks, no score calibration across families,
    which is exactly why it is the standard fusion rule). Fixed-point
    throughout: each list contributes RRF_SCALE // (RRF_K + rank)
    (0 when the candidate is absent from that list), so the fused
    score is an exact integer and the oracle is a pure consumer of
    the two registered shortlist rules.

    Scale: both inputs are top-k-bounded per probe, so the full-outer
    merge, the score, and the per-probe window are all
    O(probes · k) — corpus size never appears; the expensive work
    lives in the composed (already bucketed) index ops."""
    from clj_kinesis_to_firehose_spark.operators.llm_clustering import (
        sim_ann_ivf,
    )
    from clj_kinesis_to_firehose_spark.operators.llm_similarity import (
        sim_ann_lsh,
    )

    lsh = sim_ann_lsh(spark, sf_dir).select(
        "probe_id", "neighbor_id", F.col("nn_rank").cast("long").alias("r_lsh")
    )
    ivf = sim_ann_ivf(spark, sf_dir).select(
        "probe_id", "neighbor_id", F.col("nn_rank").cast("long").alias("r_ivf")
    )
    zero = F.lit(0).cast("long")
    merged = lsh.join(ivf, ["probe_id", "neighbor_id"], "full_outer").select(
        "probe_id",
        "neighbor_id",
        F.coalesce("r_lsh", zero).alias("r_lsh"),
        F.coalesce("r_ivf", zero).alias("r_ivf"),
    )

    def contrib(c: str) -> "F.Column":
        return F.when(
            F.col(c) > 0, F.expr(f"{RRF_SCALE} div ({RRF_K} + {c})")
        ).otherwise(zero)

    scored = merged.withColumn(
        "rrf_u12", (contrib("r_lsh") + contrib("r_ivf")).cast("long")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("rrf_u12"), F.asc("neighbor_id")
    )
    return scored.withColumn(
        "fused_rank", F.row_number().over(w).cast("long")
    ).filter(F.col("fused_rank") <= TOP_K)



def _sql_recall_eval() -> str:
    """Pure-consumer oracle: composes the already-registered exact
    pipelines of ALL FOUR ANN families — plus the RRF-fused shortlist,
    the serving-tier merge — via the public accessor (never restated),
    computing FLOOR-integer recall@k per (method, probe) — the
    integer-rational rule. Lives here (not llm_clustering) since r15
    because composition requires registering after sim_ann_graph and
    sim_rank_fusion."""
    from clj_kinesis_to_firehose_spark.registry import oracle

    methods = ("lsh", "ivf", "pq", "graph", "rrf")
    unions = " UNION ALL ".join(
        f"SELECT '{m}' AS method, probe_id, neighbor_id FROM a_{m}"
        for m in methods
    )
    mvals = ", ".join(f"('{m}')" for m in methods)
    return f"""
    WITH exact AS ({oracle("sim_topk_exact")}),
    a_lsh AS ({oracle("sim_ann_lsh")}),
    a_ivf AS ({oracle("sim_ann_ivf")}),
    a_pq AS ({oracle("sim_ann_pq")}),
    a_graph AS ({oracle("sim_ann_graph")}),
    a_rrf AS ({oracle("sim_rank_fusion")}),
    kk AS (SELECT probe_id, COUNT(*) AS k FROM exact GROUP BY probe_id),
    uni AS ({unions}),
    hits AS (
      SELECT u.method, e.probe_id, COUNT(*) AS n_hits
      FROM exact e JOIN uni u
        ON u.probe_id = e.probe_id AND u.neighbor_id = e.neighbor_id
      GROUP BY u.method, e.probe_id)
    SELECT m.method, kk.probe_id, kk.k,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(FLOOR(10000.0 * COALESCE(h.n_hits, 0) / kk.k) AS BIGINT)
             AS recall_u4
    FROM kk CROSS JOIN (VALUES {mvals}) m(method)
    LEFT JOIN hits h ON h.method = m.method AND h.probe_id = kk.probe_id
    """


@register("sim_recall_eval", executes_on_build=True, oracle=_sql_recall_eval())
def sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of EVERY ANN family (LSH, IVF, PQ, and — since r15 —
    the sharded graph index) PLUS the RRF-fused LSH+IVF shortlist,
    against the exact brute-force top-k: all five pipelines are
    hash-exact end-to-end, so their recall evaluation is a pure
    consumer of six registered rules, with recall as
    FLOOR(1e4·hits/k). One row per (method, probe). The fused row is
    the number that justifies (or kills) running two index tiers in
    production. The graph family's r14 exclusion note is retired —
    its fixed-point conversion is exactly what let it join the grid
    without dragging the oracle down to rows-only.

    This is the eval loop a production ANN deployment runs on a
    held-out probe sample to tune K/L (LSH), nlist/nprobe (IVF), or
    M/B/H (graph) before committing the scale parameters — the same
    join works at any corpus size because both sides are
    top-k-bounded per probe."""
    from clj_kinesis_to_firehose_spark.operators.llm_clustering import (
        sim_ann_ivf,
    )
    from clj_kinesis_to_firehose_spark.operators.llm_similarity import (
        sim_ann_lsh,
        sim_ann_pq,
        sim_topk_exact,
    )

    exact = sim_topk_exact(spark, sf_dir).select("probe_id", "neighbor_id")
    k_per_probe = exact.groupBy("probe_id").agg(F.count("*").alias("k"))
    out = None
    for method, fn in (
        ("lsh", sim_ann_lsh),
        ("ivf", sim_ann_ivf),
        ("pq", sim_ann_pq),
        ("graph", sim_ann_graph),
        ("rrf", sim_rank_fusion),
    ):
        approx = fn(spark, sf_dir).select("probe_id", "neighbor_id")
        hits = (
            exact.join(approx, ["probe_id", "neighbor_id"])
            .groupBy("probe_id")
            .agg(F.count("*").alias("n_hits"))
        )
        per_probe = k_per_probe.join(hits, "probe_id", "left").select(
            F.lit(method).alias("method"),
            "probe_id",
            "k",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.floor(
                F.lit(10000.0) * F.coalesce("n_hits", F.lit(0)) / F.col("k")
            )
            .cast("long")
            .alias("recall_u4"),
        )
        out = per_probe if out is None else out.unionByName(per_probe)
    return out



def graph_search_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-support twin: per (shard, probe) visited-node counts, for
    asserting the beam visits a bounded fraction of each shard (the
    graph-index property). Not registered — layout metrics belong in
    pytest, not the oracle surface."""
    emb = _nq_embeddings(spark, sf_dir)
    probes = _collect_probes(emb)
    sharded = emb.withColumn(
        "shard", (F.col("vec_id") % GRAPH_SHARDS).cast("int")
    )
    return sharded.groupBy("shard").applyInPandas(
        _shard_search(probes, with_stats=True),
        "probe_id long, n_visited long, n_shard long",
    )
