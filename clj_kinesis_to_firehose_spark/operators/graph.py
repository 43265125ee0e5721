"""Graph operators over the star schema's implicit relationships.

The purchase graph (customer —bought-from→ supplier, through
orders⋈lineitem) gives a natural bipartite graph; PageRank over it is
the representative *iterative* distributed algorithm — the class the
oracle SQL can't express (recursive fixpoint with float damping), so
it ships weak with a behavioral conservation/convergence test.

Scale notes: the iterative loop is driver-CONTROLLED but data stays
distributed; each round is one join + one aggregate on the edge
relation, partitioned by src. `localCheckpoint` truncates lineage so
round N's plan doesn't replay rounds 1..N-1 (the standard Spark
iteration pattern; see also dedup_cluster_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table

#: damping factor + fixed iteration count (diameter of the bipartite
#: purchase graph is tiny; 8 rounds is well past convergence there)
DAMPING = 0.85
N_ITER = 8


def purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer→supplier edges via orders⋈lineitem, with
    both endpoint sets namespaced (c_/s_ prefixes) so the graph is
    properly bipartite."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c"), "o_custkey").alias("src"),
            F.concat(F.lit("s"), "l_suppkey").alias("dst"),
        )
        .distinct()
    )


@register(
    "graph_pagerank",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ), edges AS (
        SELECT src, dst FROM base
        UNION ALL
        SELECT dst AS src, src AS dst FROM base
    ), deg AS (
        SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
    ), pr AS (
        SELECT 0 AS it, src AS node, CAST(1.0 AS DOUBLE) AS rank FROM deg
        UNION ALL
        SELECT it + 1, dst AS node,
               CAST(0.15 AS DOUBLE)
                   + CAST(0.85 AS DOUBLE) * SUM(rank / deg) AS rank
        FROM pr
        JOIN edges ON pr.node = edges.src
        JOIN deg ON edges.src = deg.src
        WHERE it < 8
        GROUP BY it + 1, dst
    )
    SELECT node, ROUND(rank, 6) AS rank FROM pr WHERE it = 8
    ORDER BY rank DESC, node LIMIT 50
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected bipartite purchase graph (edges
    traversed both ways so mass flows customer↔supplier and no node
    is a sink). Returns the top-50 nodes by rounded rank.

    Per round: rank/degree contribution join + sum-by-dst aggregate —
    both shuffle only the edge relation on its join key. Total mass
    is conserved at n_nodes (behavioral test asserts this and
    convergence).

    EXACT oracle: DuckDB runs the identical 8 fixed Jacobi iterations
    as a recursive CTE (same damping, same init, same double
    arithmetic); ranks round to 6 dp, far above the ~1e-12 summation-
    order drift 8 iterations can accumulate, so the hashes agree. If a
    fixture revision ever lands a rank on a rounding boundary, demote
    back to weak rather than loosening the compare (SURVEY §5.3).
    """
    e = purchase_edges(spark, sf_dir)
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = out_deg.select(F.col("src").alias("node"))
    n_nodes = nodes.count()
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(N_ITER):
        contrib = (
            edges.join(out_deg, "src")
            .join(ranks, edges.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("inflow"))
            .select(
                "node",
                (F.lit(1.0 - DAMPING) + F.lit(DAMPING) * F.col("inflow")).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(50)
    )


@register(
    "graph_link_prediction_jaccard",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_suppkey < 40
    ), deg AS (
        SELECT cust, COUNT(*) AS d FROM edges GROUP BY cust
    ), common AS (
        SELECT a.cust AS cust_a, b.cust AS cust_b, COUNT(*) AS n_common
        FROM edges a JOIN edges b
          ON a.supp = b.supp AND a.cust < b.cust
        GROUP BY a.cust, b.cust
    )
    SELECT cust_a, cust_b, n_common,
           ROUND(n_common / CAST(d_a + d_b - n_common AS DOUBLE), 6)
             AS jaccard,
           rnk
    FROM (
        SELECT cust_a, cust_b, n_common, da.d AS d_a, db.d AS d_b,
               ROW_NUMBER() OVER (
                   ORDER BY ROUND(n_common / CAST(da.d + db.d - n_common
                                                  AS DOUBLE), 6) DESC,
                            cust_a, cust_b) AS rnk
        FROM common
        JOIN deg da ON common.cust_a = da.cust
        JOIN deg db ON common.cust_b = db.cust
        WHERE n_common >= 3
    ) WHERE rnk <= 25
    """,
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood Jaccard: customer pairs whose
    supplier neighborhoods overlap most — the classic common-neighbor
    recommender score (|N(a)∩N(b)| / |N(a)∪N(b)|), here over the
    bipartite purchase graph restricted to a supplier slice.

    Candidate-first, like every pair-producing op in this engine: the
    self-join runs on the SHARED-NEIGHBOR key (supp), so only pairs
    with ≥1 common supplier ever materialize, and the n_common ≥ 3
    floor prunes before the degree joins. Pair cost is Σ supplier-
    degree², bounded by the slice (full-graph runs shard by neighbor
    key the same way — at 100 TB add a hub-degree cap, the standard
    mitigation for celebrity nodes). Ranking on the rounded score with
    a pair tie-break keeps the top-25 cross-engine stable."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") < 40)
        .select("l_orderkey", "l_suppkey")
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    deg = edges.groupBy("cust").agg(F.count("*").alias("d"))
    a, b = edges.alias("a"), edges.alias("b")
    common = (
        a.join(b, (F.col("a.supp") == F.col("b.supp")) & (F.col("a.cust") < F.col("b.cust")))
        .groupBy(F.col("a.cust").alias("cust_a"), F.col("b.cust").alias("cust_b"))
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= 3)
    )
    da = deg.select(F.col("cust").alias("cust_a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("cust").alias("cust_b"), F.col("d").alias("d_b"))
    jac = F.round(
        F.col("n_common")
        / (F.col("d_a") + F.col("d_b") - F.col("n_common")).cast("double"),
        6,
    )
    scored = (
        common.join(F.broadcast(da), "cust_a")
        .join(F.broadcast(db), "cust_b")
        .select("cust_a", "cust_b", "n_common", jac.alias("jaccard"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("jaccard"), F.asc("cust_a"), F.asc("cust_b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 25)
    )
