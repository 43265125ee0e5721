"""Behavioral checks for operators whose oracle is weak (no
SQL-expressible DuckDB twin): HLL accuracy, MinHash/SimHash planted
near-duplicates, LSH recall vs the exact top-k baseline."""

from __future__ import annotations

import os
import tempfile

import pytest

from clj_kinesis_to_firehose_spark import registry
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def test_approx_distinct_within_5pct(spark, oracle_con):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["agg_approx_distinct"](spark, SF_DIR).collect()
    }
    exact = dict(
        oracle_con.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY event_type"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) / n <= 0.05, (et, approx[et], n)


@pytest.fixture(scope="module")
def planted_docs_dir(spark):
    """documents.parquet with planted near-duplicates: docs 9000-9009 are
    copies of 0-9 with one token changed; 9100 is an exact copy of 0."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50).collect()
    rows = [r.asDict() for r in base]
    for i in range(10):
        near = dict(rows[i])
        toks = near["text"].split(" ")
        toks[len(toks) // 2] = "zzmutatedzz"
        near.update(doc_id=9000 + i, text=" ".join(toks))
        rows.append(near)
    exact_copy = dict(rows[0])
    exact_copy["doc_id"] = 9100
    rows.append(exact_copy)
    alien = dict(rows[0])
    alien.update(
        doc_id=9200,
        text=" ".join(f"alien{i} xenon{i*7%13} quark{i*3%11}" for i in range(30)),
    )
    rows.append(alien)
    out = tempfile.mkdtemp(prefix="kf_planted_")
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def test_minhash_finds_planted_near_dups(spark, planted_docs_dir):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_near_minhash"](spark, planted_docs_dir).collect()
    }
    found = sum((i, 9000 + i) in pairs for i in range(10))
    assert (0, 9100) in pairs, "exact copy must always be a candidate pair"
    # banding is probabilistic per pair; one-token mutations have very
    # high jaccard, so nearly all must surface
    assert found >= 8, f"only {found}/10 planted near-dups found: {sorted(pairs)}"


def test_simhash_collides_on_near_dups(spark, planted_docs_dir):
    hashes = {
        r["doc_id"]: r["simhash"]
        for r in QUERIES["dedup_simhash"](spark, planted_docs_dir).collect()
    }
    assert hashes[0] == hashes[9100], "identical text must produce identical simhash"
    ham = bin(hashes[0] ^ hashes[9000]).count("1")
    assert ham <= 10, f"near-dup hamming distance too large: {ham}"
    # a doc with a fully disjoint vocabulary must be much farther than a
    # one-token mutation (fixture docs share one tiny vocabulary, so
    # ordinary pairs are legitimately close in simhash space)
    far = bin(hashes[0] ^ hashes[9200]).count("1")
    assert far > ham + 5, (far, ham)


@pytest.fixture(scope="module")
def planted_vecs_dir(spark):
    """embeddings.parquet where vec_ids 9000-9004 are near-duplicates of
    probes 0-4 (tiny deterministic perturbation ⇒ cosine ≈ 0.999)."""
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    rows = [r.asDict() for r in base]
    for i in range(5):
        near = dict(rows[i])
        emb = list(near["embedding"])
        emb[0] += 0.01
        emb[1] -= 0.01
        near.update(vec_id=9000 + i, embedding=emb)
        rows.append(near)
    out = tempfile.mkdtemp(prefix="kf_planted_vecs_")
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    return out


def test_lsh_finds_planted_near_dup_vectors(spark, planted_vecs_dir):
    # the dedup regime LSH is built for: each probe's planted twin
    # (cosine ≈ 0.999) must be retrieved as its top neighbor
    approx = QUERIES["sim_ann_lsh"](spark, planted_vecs_dir).collect()
    top = {
        r["probe_id"]: r["neighbor_id"] for r in approx if r["nn_rank"] == 1
    }
    hits = sum(top.get(i) == 9000 + i for i in range(5))
    assert hits >= 4, f"planted twins found for only {hits}/5 probes: {top}"


def test_lsh_corpus_recall_floor(spark):
    # random embeddings (best cosine ~0.37) are worst-case for LSH; the
    # floor just guards against the candidate generation going dark
    exact = QUERIES["sim_topk_exact"](spark, SF_DIR).collect()
    approx = QUERIES["sim_ann_lsh"](spark, SF_DIR).collect()
    exact_sets: dict[int, set[int]] = {}
    for r in exact:
        exact_sets.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact_sets[p] & approx_sets.get(p, set())) for p in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    assert recall >= 0.2, f"LSH corpus recall {recall:.2f} below floor"


def test_kmeans_partitions_corpus(spark):
    # the clusters must partition the corpus exactly: sizes sum to the
    # row count, ≤ K cells, every cell non-degenerate
    out = QUERIES["embedding_kmeans"](spark, SF_DIR).collect()
    n_corpus = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r["n_vectors"] for r in out) == n_corpus
    assert 1 <= len(out) <= 8
    assert len({r["cluster"] for r in out}) == len(out)
    for r in out:
        assert r["avg_dist_q"] > 0  # mean centroid distance, 1e-6 units


def test_kmeans_inertia_monotone(spark):
    from clj_kinesis_to_firehose_spark.operators.llm_clustering import (
        _fit_kmeans_fp,
    )

    _, _, inertia = _fit_kmeans_fp(spark, SF_DIR)
    assert len(inertia) == 5
    # Lloyd's decreases the objective at every step (assignment and
    # update are both non-increasing); the fixed-point floor-div means
    # sit within 1 ulp-of-integer of the true means, so allow only a
    # vanishing relative slack
    for prev, nxt in zip(inertia, inertia[1:]):
        assert nxt <= prev * 1.0001, inertia


def test_ivf_recall_floor(spark):
    # random embeddings are worst-case for any partitioned index
    # (true neighbors scatter across cells); nprobe=2 of k=8 scores
    # ~25% of the corpus, so the floor guards candidate generation
    # without overclaiming accuracy on adversarial data
    exact = QUERIES["sim_topk_exact"](spark, SF_DIR).collect()
    approx = QUERIES["sim_ann_ivf"](spark, SF_DIR).collect()
    exact_sets: dict[int, set[int]] = {}
    for r in exact:
        exact_sets.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact_sets[p] & approx_sets.get(p, set())) for p in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    assert recall >= 0.2, f"IVF corpus recall {recall:.2f} below floor"


def test_pq_finds_planted_near_dup_vectors(spark, planted_vecs_dir):
    # a cosine-0.999 twin quantizes to (nearly) the same codes as its
    # probe, tops the ADC shortlist, and exact rerank must rank it #1
    approx = QUERIES["sim_ann_pq"](spark, planted_vecs_dir).collect()
    top = {r["probe_id"]: r["neighbor_id"] for r in approx if r["nn_rank"] == 1}
    hits = sum(top.get(i) == 9000 + i for i in range(5))
    assert hits >= 4, f"planted twins found for only {hits}/5 probes: {top}"


def test_pq_corpus_recall_floor(spark):
    # random embeddings are the worst case for quantized scoring; the
    # shortlist+exact-rerank stage still lands 0.76 recall@5 on this
    # fixture (deterministic pipeline), so 0.5 guards real regressions
    exact = QUERIES["sim_topk_exact"](spark, SF_DIR).collect()
    approx = QUERIES["sim_ann_pq"](spark, SF_DIR).collect()
    exact_sets: dict[int, set[int]] = {}
    for r in exact:
        exact_sets.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact_sets[p] & approx_sets.get(p, set())) for p in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    assert recall >= 0.5, f"PQ corpus recall {recall:.2f} below floor"


def test_pq_codes_are_compact(spark):
    # the operator's storage contract: 8 subspace codes, each < 16
    from clj_kinesis_to_firehose_spark.operators.llm_similarity import (
        PQ_K,
        PQ_SUBSPACES,
        _pq_codebooks,
    )

    books = _pq_codebooks(spark, SF_DIR)
    assert len(books) == PQ_SUBSPACES
    for C in books:
        assert C.shape == (PQ_K, 64 // PQ_SUBSPACES)


def test_approx_quantile_within_1pct(spark, oracle_con):
    approx = {
        r["o_orderstatus"]: (r["p50_approx"], r["p90_approx"], r["p99_approx"])
        for r in QUERIES["agg_approx_quantile"](spark, SF_DIR).collect()
    }
    exact = {
        r[0]: (r[1], r[2], r[3])
        for r in oracle_con.execute(
            """SELECT o_orderstatus, QUANTILE_CONT(o_totalprice, 0.5),
                      QUANTILE_CONT(o_totalprice, 0.9), QUANTILE_CONT(o_totalprice, 0.99)
               FROM orders GROUP BY o_orderstatus"""
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for st, (a50, a90, a99) in approx.items():
        for a, e in zip((a50, a90, a99), exact[st]):
            assert abs(a - e) / e <= 0.01, (st, a, e)


def test_hll_sketch_close_to_exact(spark, oracle_con):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["agg_hll_sketch"](spark, SF_DIR).collect()
    }
    exact = dict(
        oracle_con.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY event_type"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    # lgK=12 HLL: relative error ~1.6%/sqrt(2^12)≈2.5% at 3 sigma for
    # these cardinalities; 5% bound keeps the test robust
    for et, n in exact.items():
        assert abs(approx[et] - n) / n <= 0.05, (et, approx[et], n)


def test_compaction_preserves_rows_and_collapses_files(spark, oracle_con):
    from clj_kinesis_to_firehose_spark.operators.scans import compact_file_counts

    row = QUERIES["maintenance_compact"](spark, SF_DIR).collect()[0]
    exact_rows, exact_sum = oracle_con.execute(
        "SELECT COUNT(*), ROUND(SUM(value), 2) FROM events"
    ).fetchall()[0]
    assert row["n_rows"] == exact_rows
    assert abs(row["sum_value"] - exact_sum) < 0.05  # float-order tolerance
    n_before, n_after = compact_file_counts(spark, SF_DIR)
    assert n_after < n_before
    assert n_after <= 4


def test_schema_evolution_backfills_old_generation(spark, oracle_con):
    row = QUERIES["scan_schema_evolution"](spark, SF_DIR).collect()[0]
    n_total, n_gen1 = oracle_con.execute(
        "SELECT COUNT(*), SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) FROM events"
    ).fetchall()[0]
    assert row["n_rows"] == n_total
    assert row["n_cols_unified"] == 5  # 4 base + evolved quality_tier
    assert row["n_backfilled"] == n_gen1  # NULL exactly for gen-1 rows
    assert 0 < row["n_high_tier"] < n_total - n_gen1


def test_pca_projection_matches_eigen_spectrum(spark):
    """The fixed-point exactness upgrade (r14) must not cost PCA
    fidelity: unit-normalized integer projections still carry variance
    equal to the float eigensolve's eigenvalues (prototype measured
    ~2.6e-6 relative; 2% is the regression bar), the components are
    numerically orthogonal, and the spectrum is ordered."""
    from clj_kinesis_to_firehose_spark.operators.llm_clustering import (
        FP_Q,
        _pca_components,
        _pca_fp,
    )

    rows = QUERIES["embedding_pca_project"](spark, SF_DIR).collect()
    n_corpus = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(rows) == n_corpus
    import numpy as np

    _, v1, v2 = _pca_fp(spark, SF_DIR)
    nv1 = np.sqrt(sum(a * a for a in v1))
    nv2 = np.sqrt(sum(a * a for a in v2))
    assert abs(sum(a * b for a, b in zip(v1, v2))) / (nv1 * nv2) < 1e-6
    pc1 = np.array([r["pc1_q"] for r in rows], dtype=np.float64) / (FP_Q * nv1)
    pc2 = np.array([r["pc2_q"] for r in rows], dtype=np.float64) / (FP_Q * nv2)
    _, _, evals = _pca_components(spark, SF_DIR)
    assert evals[0] >= evals[1] > 0
    assert abs(pc1.var() - evals[0]) / evals[0] < 0.02
    assert abs(pc2.var() - evals[1]) / evals[1] < 0.02
    assert pc1.var() >= pc2.var()


def test_bloom_prefilter_superset_of_exact_semi(spark, oracle_con):
    from clj_kinesis_to_firehose_spark.operators.joins import bloom_pass_orders

    passed = {
        r["o_orderkey"] for r in bloom_pass_orders(spark, SF_DIR).collect()
    }
    exact = {
        r[0]
        for r in oracle_con.execute(
            """SELECT o_orderkey FROM orders o WHERE EXISTS
               (SELECT 1 FROM customer c
                WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000.0)"""
        ).fetchall()
    }
    total = oracle_con.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    # no false negatives; false-positive rate small vs the full table
    assert exact <= passed
    assert (len(passed) - len(exact)) / total <= 0.05, (len(passed), len(exact))


def test_pagerank_mass_conserved_and_suppliers_ranked(spark):
    rows = QUERIES["graph_pagerank"](spark, SF_DIR).collect()
    assert len(rows) == 50
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # suppliers (few, high-degree) dominate customers in a bipartite
    # purchase graph; every top-10 node should be a supplier
    assert all(r["node"].startswith("s") for r in rows[:10]), rows[:10]
    # rank must exceed the teleport floor
    assert all(r > 0.15 for r in ranks)


def test_sim_recall_eval_floors(spark):
    # LSH (K=6/L=8) and IVF (nprobe=2) must both recover a solid
    # fraction of the exact top-5 on the fixture probes — the eval op
    # is the tuning surface, these floors are the regression tripwire
    rows = QUERIES["sim_recall_eval"](spark, SF_DIR).collect()
    assert len(rows) == 25  # (4 exact index families + the RRF-fused
    # LSH+IVF list) × 5 probes; the graph family joined the grid in
    # r15 with its fixed-point conversion, the fused list later the
    # same round
    by_method: dict[str, list[float]] = {}
    for r in rows:
        by_method.setdefault(r.method, []).append(r.recall_u4 / 10000.0)
    # IVF probes whole cells → solid recall even on random data; LSH
    # by design only recovers high-cosine pairs, and random-fixture
    # top-5 neighbors sit at low cosine (the S-curve's left tail), so
    # its floor is the observed-regime tripwire, not a quality target
    # PQ shortlists 64 of 500 then exact-reranks, so its floor sits
    # between IVF's hard cell coverage and LSH's high-cosine-only bias
    # graph's own corpus floor (0.7) is pinned in its planted tests;
    # here 0.5 guards the grid wiring
    # rrf fuses a strong list (ivf) with a deliberately weak one
    # (lsh, see above), so its fixture mean sits BETWEEN the two —
    # dual-membership candidates outrank ivf's singles by the RRF
    # rule. That's the honest read of this grid: fusion pays when the
    # tiers are comparably good; the recall row is how you find out.
    floors = {"ivf": 0.5, "lsh": 0.15, "pq": 0.5, "graph": 0.5,
              "rrf": 0.4}
    assert set(by_method) == set(floors)
    for method, recalls in by_method.items():
        mean = sum(recalls) / len(recalls)
        assert mean >= floors[method], (method, recalls)


def test_graph_ann_finds_planted_near_dup_vectors(spark, planted_vecs_dir):
    # twin 9000+i lands in the same shard as probe i (both ≡ i mod 8);
    # a cosine-0.999 twin must surface as the top graph neighbor
    approx = QUERIES["sim_ann_graph"](spark, planted_vecs_dir).collect()
    top = {
        r["probe_id"]: r["neighbor_id"] for r in approx if r["nn_rank"] == 1
    }
    hits = sum(top.get(i) == 9000 + i for i in range(5))
    assert hits >= 4, f"planted twins found for only {hits}/5 probes: {top}"


def test_graph_ann_corpus_recall_floor(spark):
    exact = QUERIES["sim_topk_exact"](spark, SF_DIR).collect()
    approx = QUERIES["sim_ann_graph"](spark, SF_DIR).collect()
    exact_sets: dict[int, set[int]] = {}
    for r in exact:
        exact_sets.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact_sets[p] & approx_sets.get(p, set())) for p in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    assert recall >= 0.7, f"graph ANN corpus recall {recall:.2f} below floor"


def test_graph_ann_beam_visits_bounded_fraction(spark):
    # the graph-index property: the beam must NOT brute-force the
    # shard. The fixture's shards (~60 vectors) are smaller than the
    # beam itself, so synthesize a corpus where shard size (500) well
    # exceeds ef (48) — visited nodes must stay a fraction of the shard
    import numpy as np

    from clj_kinesis_to_firehose_spark.operators.llm_graph_ann import (
        graph_search_stats,
    )

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((4000, 64)).astype("float32")
    out = tempfile.mkdtemp(prefix="kf_graph_corpus_")
    spark.createDataFrame(
        [(i, vecs[i].tolist(), 0) for i in range(4000)],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    rows = graph_search_stats(spark, out).collect()
    assert rows, "no shards searched"
    mean_frac = sum(r["n_visited"] / r["n_shard"] for r in rows) / len(rows)
    assert all(r["n_shard"] == 500 for r in rows)
    assert mean_frac <= 0.75, (
        f"beam visited {mean_frac:.0%} of each 500-node shard on average — "
        "not meaningfully better than brute force"
    )


def test_cms_heavyhitters_is_superset_with_bounded_overshoot(spark, oracle_con):
    # Count-Min structural guarantees on the shortlist (now an EXACT
    # oracle op, but the sketch math still deserves its own pins):
    # every estimate ≥ its true count, the shortlist contains EVERY
    # true φ=1% heavy hitter (no false negatives — CMS never
    # undercounts), and overshoot is bounded by d=4/w=256 collisions
    # (expected ≤ N/w per row; min over 4 rows — use 5·N/w slack).
    est = {
        (r["event_type"], r["user_id"]): r["est_count"]
        for r in QUERIES["agg_cms_heavyhitters"](spark, SF_DIR).collect()
    }
    true = {
        (et, u): n
        for et, u, n in oracle_con.execute(
            "SELECT event_type, user_id, COUNT(*) FROM events GROUP BY 1, 2"
        ).fetchall()
    }
    totals = dict(
        oracle_con.execute(
            "SELECT event_type, COUNT(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert est, "shortlist is empty at this SF — threshold too strict"
    for (et, u), e in est.items():
        t = true[(et, u)]  # every shortlisted key was observed
        assert e >= t, f"CMS undercounted {(et, u)}: {e} < {t}"
        assert e <= t + 5 * totals[et] / 256, f"CMS overshoot {(et, u)}"
    # no false negatives: every true heavy hitter is shortlisted
    for (et, u), t in true.items():
        if t * 100 >= totals[et]:
            assert (et, u) in est, f"true heavy hitter {(et, u)} missing"


def test_knn_descent_converges_to_exact_graph(spark):
    # NN-Descent must recover most of the EXACT kNN graph in 3 rounds
    # (paper: a handful of rounds to high recall on generic metrics)
    import numpy as np

    from clj_kinesis_to_firehose_spark.operators.llm_graph_ann import (
        KNN_K,
        _knn_descent_graph,
    )

    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    sims = Xn @ Xn.T
    np.fill_diagonal(sims, -np.inf)
    order = np.argsort(-sims, axis=1)[:, :KNN_K]
    exact = {
        int(ids[i]): {int(ids[j]) for j in order[i]} for i in range(len(ids))
    }
    approx: dict[int, set[int]] = {}
    for r in _knn_descent_graph(spark, SF_DIR).collect():
        approx.setdefault(r["a"], set()).add(r["b"])
    hits = sum(len(exact[v] & approx.get(v, set())) for v in exact)
    total = sum(len(s) for s in exact.values())
    recall = hits / total
    assert recall >= 0.85, f"kNN-graph recall {recall:.3f} below floor"


def test_sort_cluster_prunes_row_groups(spark):
    # the whole point of the sort-clustering rewrite: after ordering by
    # l_shipdate, a one-month predicate overlaps a small fraction of
    # row groups, while the random layout's zone maps are useless
    # (every group spans the full date domain)
    from clj_kinesis_to_firehose_spark.operators.scans import (
        sort_cluster_rowgroup_stats,
    )

    row = QUERIES["maintenance_sort_cluster"](spark, SF_DIR).collect()[0]
    assert row.n_rows_matching > 0
    rand_total, rand_hit, sort_total, sort_hit = sort_cluster_rowgroup_stats(
        spark, SF_DIR
    )
    assert rand_hit == rand_total  # random layout: no pruning
    assert sort_hit * 2 <= sort_total, (sort_hit, sort_total)  # ≥50% pruned


def test_incremental_minhash_matches_batch_on_delta_pairs(spark, planted_docs_dir):
    # consistency contract: the incremental run (delta vs persisted
    # index) must recover every batch-mode pair that involves at least
    # one delta doc — same bands, same verify threshold, so equality,
    # not just superset, on that slice
    import pyspark.sql.functions as F

    def bucket_of(doc_id: int) -> int:
        import hashlib
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100

    batch = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_near_minhash"](spark, planted_docs_dir).collect()
    }
    batch_delta = {
        (a, b) for a, b in batch if bucket_of(a) >= 80 or bucket_of(b) >= 80
    }
    incr = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_incremental_minhash"](
            spark, planted_docs_dir
        ).collect()
    }
    assert incr == batch_delta, (
        f"incremental {sorted(incr)} != batch-delta slice {sorted(batch_delta)}"
    )
    # and the incremental path must itself see some of the planted dups
    assert any(a >= 9000 or b >= 9000 for a, b in incr) or not batch_delta


def test_zorder_prunes_on_second_dimension(spark):
    # the whole point of Z-ordering vs 1-D sort: a predicate on the
    # NON-lead dimension (value band) finds useful zone maps. The
    # user-sorted layout leaves every row group spanning the full
    # value domain (zero pruning); the Z-ordered layout must skip a
    # majority of them
    from clj_kinesis_to_firehose_spark.operators.scans import zorder_rowgroup_stats

    stats = zorder_rowgroup_stats(spark, SF_DIR)
    rand_total, rand_hit = stats["random"]
    user_total, user_hit = stats["user_sorted"]
    z_total, z_hit = stats["zordered"]
    assert rand_hit == rand_total, stats  # random layout: no pruning
    assert user_hit == user_total, stats  # 1-D sort on user_id: none either
    assert z_hit <= z_total // 2, stats   # Z-order: majority skipped


def test_hierarchy_rollup_invariants(spark):
    """Structural invariants the oracle can't see failing reasons for:
    roots partition the forest (their subtree sizes sum to n), depth is
    exactly the digit-depth of the key, and every leaf subtree is 1."""
    import math

    rows = {
        r["node"]: r
        for r in QUERIES["graph_hierarchy_rollup"](spark, SF_DIR).collect()
    }
    n = len(rows)
    roots = [r for k, r in rows.items() if k < 10]
    assert sum(r["n_subtree"] for r in roots) == n
    for k, r in rows.items():
        assert r["depth"] == (int(math.log10(k)) if k > 0 else 0), k
    # deepest keys are leaves
    max_depth = max(r["depth"] for r in rows.values())
    for k, r in rows.items():
        if r["depth"] == max_depth:
            assert r["n_subtree"] == 1


def test_interpolation_bounded_by_neighbors(spark):
    """Every interpolated value lies within [min, max] of its two
    anchoring observations, and observed rows reproduce the raw daily
    counts exactly."""
    out = QUERIES["ts_interpolate_linear"](spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    n_interp = 0
    for series in by_type.values():
        series.sort(key=lambda r: r["day"])
        obs_idx = [i for i, r in enumerate(series) if r["is_observed"]]
        assert obs_idx[0] == 0 and obs_idx[-1] == len(series) - 1
        for a, b in zip(obs_idx, obs_idx[1:]):
            lo = min(series[a]["value"], series[b]["value"])
            hi = max(series[a]["value"], series[b]["value"])
            for i in range(a + 1, b):
                assert lo - 1e-9 <= series[i]["value"] <= hi + 1e-9
                n_interp += 1
    assert n_interp > 0, "fixture produced no gaps — op untested"


def test_kpl_codec_roundtrip_and_guards():
    """KPL wire codec: round-trip identity, key-table dedup, checksum
    and magic guards (public AWS KPL format — magic + protobuf + md5)."""
    from clj_kinesis_to_firehose_spark.sources.kinesis import (
        KPL_MAGIC,
        kpl_aggregate,
        kpl_deaggregate,
    )

    recs = [("u1", b"a"), ("u2", b"bb"), ("u1", b"ccc"), ("u3", b"")]
    blob = kpl_aggregate(recs)
    assert blob[:4] == KPL_MAGIC
    assert kpl_deaggregate(blob) == recs
    # key table deduplicates: only 3 distinct keys serialized
    assert blob.count(b"u1") == 1
    with pytest.raises(ValueError, match="checksum"):
        kpl_deaggregate(blob[:-1] + bytes([blob[-1] ^ 0xFF]))
    with pytest.raises(ValueError, match="magic"):
        kpl_deaggregate(b"XXXX" + blob[4:])


def test_kpl_decoder_tolerates_explicit_hash_keys():
    """Real KPL blobs may carry explicit_hash_key_table entries (field
    2) and per-record explicit_hash_key_index — the decoder must skip
    both, not reject the record."""
    import hashlib

    from clj_kinesis_to_firehose_spark.sources.kinesis import (
        KPL_MAGIC,
        _varint,
        kpl_deaggregate,
    )

    pk, ehk, data = b"mykey", b"123456789", b"payload"
    body = b"\x0a" + _varint(len(pk)) + pk          # partition_key_table
    body += b"\x12" + _varint(len(ehk)) + ehk       # explicit_hash_key_table
    rec = b"\x08" + _varint(0)                      # partition_key_index
    rec += b"\x10" + _varint(0)                     # explicit_hash_key_index
    rec += b"\x1a" + _varint(len(data)) + data      # data
    body += b"\x1a" + _varint(len(rec)) + rec
    blob = KPL_MAGIC + body + hashlib.md5(body).digest()
    assert kpl_deaggregate(blob) == [("mykey", b"payload")]


def _kpl_blob(body: bytes) -> bytes:
    import hashlib

    from clj_kinesis_to_firehose_spark.sources.kinesis import KPL_MAGIC

    return KPL_MAGIC + body + hashlib.md5(body).digest()


def test_kpl_decoder_skips_length_delimited_tags_field():
    """KPL's ``repeated Tag tags = 4`` is LENGTH-DELIMITED (tag byte
    0x22), not a varint — a wire-type-blind skip misparses the length
    prefix as a varint value and desyncs the whole record (advisor
    finding, round 4)."""
    from clj_kinesis_to_firehose_spark.sources.kinesis import _varint, kpl_deaggregate

    pk, data = b"pk", b"data-bytes"
    tag_msg = b"\x0a" + _varint(3) + b"env" + b"\x12" + _varint(4) + b"prod"
    rec = b"\x08" + _varint(0)
    rec += b"\x1a" + _varint(len(data)) + data
    rec += b"\x22" + _varint(len(tag_msg)) + tag_msg   # tags submessage
    body = b"\x0a" + _varint(len(pk)) + pk
    body += b"\x1a" + _varint(len(rec)) + rec
    assert kpl_deaggregate(_kpl_blob(body)) == [("pk", b"data-bytes")]


def test_kpl_decoder_accepts_record_before_key_table():
    """Protobuf serializers may emit fields in any order: a Record
    whose partition_key_index precedes its key-table entry is legal
    and must resolve after the full payload is walked."""
    from clj_kinesis_to_firehose_spark.sources.kinesis import _varint, kpl_deaggregate

    pk, data = b"late-key", b"v"
    rec = b"\x08" + _varint(0) + b"\x1a" + _varint(len(data)) + data
    body = b"\x1a" + _varint(len(rec)) + rec            # Record first
    body += b"\x0a" + _varint(len(pk)) + pk             # key table after
    assert kpl_deaggregate(_kpl_blob(body)) == [("late-key", b"v")]


def test_kpl_decoder_rejects_out_of_range_key_index():
    """A key index beyond the key table must raise ValueError (bad
    blob), not IndexError (decoder bug)."""
    import pytest

    from clj_kinesis_to_firehose_spark.sources.kinesis import _varint, kpl_deaggregate

    rec = b"\x08" + _varint(7) + b"\x1a" + _varint(1) + b"x"
    body = b"\x0a" + _varint(2) + b"pk" + b"\x1a" + _varint(len(rec)) + rec
    with pytest.raises(ValueError, match="key index"):
        kpl_deaggregate(_kpl_blob(body))


def test_avro_event_codec_roundtrip_property():
    """Pure-Python Avro binary codec (public spec): zigzag longs,
    length-prefixed UTF-8 strings, LE doubles — round-trips any event,
    including negative longs and empty strings; trailing or truncated
    bytes fail loudly."""
    import math

    import pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from clj_kinesis_to_firehose_spark.sources.kinesis import (
        avro_decode_event,
        avro_encode_event,
    )

    longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    texts = st.text(max_size=64)
    doubles = st.floats(allow_nan=False, width=64)

    @given(longs, longs, longs, texts, doubles, texts)
    @settings(max_examples=200, deadline=None)
    def roundtrip(event_id, ts, user_id, event_type, value, props):
        blob = avro_encode_event(event_id, ts, user_id, event_type, value, props)
        got = avro_decode_event(blob)
        assert got[:4] == (event_id, ts, user_id, event_type)
        assert got[4] == value or (math.isnan(got[4]) and math.isnan(value))
        assert got[5] == props

    roundtrip()
    blob = avro_encode_event(1, 2, 3, "t", 4.0, "p")
    with pytest.raises(ValueError):
        avro_decode_event(blob + b"\x00")
    with pytest.raises(ValueError):
        avro_decode_event(blob[:-1])


def test_avro_envelope_decode_is_permissive(spark):
    """One corrupt Avro payload in the envelope must decode to an
    all-null row (dead-letter routable), not fail the task — the same
    poison-record liveness contract as the delivery sink; valid
    records around it decode exactly."""
    from clj_kinesis_to_firehose_spark.sources.kinesis import (
        avro_encode_event,
        decode_kinesis_envelope,
    )

    good = avro_encode_event(1, 1_700_000_000_000_000_000, 7, "click", 2.5, "{}")
    rows = [(good, None), (b"\xff\x01garbage", None),
            (avro_encode_event(2, 1_700_000_000_000_000_000, 8, "view", 1.0, "{}"), None)]
    env = spark.createDataFrame(
        rows, "data binary, approximateArrivalTimestamp timestamp"
    )
    got = {r["event_id"]: r for r in
           decode_kinesis_envelope(env, payload_format="avro").collect()}
    assert set(got) == {1, 2, None}
    assert got[1]["event_type"] == "click" and got[1]["value"] == 2.5
    assert got[None]["event_type"] is None and got[None]["ts"] is None


def test_avro_envelope_decode_handles_null_payload(spark):
    """A NULL data blob in the envelope must decode to an all-null row
    like the JSON path does — not crash the task with TypeError."""
    from clj_kinesis_to_firehose_spark.sources.kinesis import (
        avro_encode_event,
        decode_kinesis_envelope,
    )

    good = avro_encode_event(1, 1_700_000_000_000_000_000, 7, "click", 2.5, "{}")
    env = spark.createDataFrame(
        [(good, None), (None, None)],
        "data binary, approximateArrivalTimestamp timestamp",
    )
    got = decode_kinesis_envelope(env, payload_format="avro").collect()
    ids = sorted((r["event_id"] is None) for r in got)
    assert ids == [False, True]


def test_portable_hll_estimate_within_bound(spark):
    """agg_hll_portable's estimator quality: m=64 gives sigma ~ 13%;
    assert every group lands within 20% of exact countDistinct (about
    1.5 sigma — the fixture's observed worst case is ~13%). The op's
    ORACLE already pins cross-engine exactness; this pins that the
    exactly-reproduced number is also a GOOD estimate."""
    from clj_kinesis_to_firehose_spark import registry
    from tests.conftest import SF_DIR

    registry._load_all()
    est = {
        r["event_type"]: r["approx_ids"]
        for r in registry.queries()["agg_hll_portable"](spark, SF_DIR).collect()
    }
    from clj_kinesis_to_firehose_spark.sources import load_table
    from pyspark.sql import functions as F

    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for et, n in exact.items():
        assert abs(est[et] - n) / n < 0.20, (et, est[et], n)


def test_portable_cms_never_underestimates(spark):
    """agg_cms_portable's structural guarantee: a CMS estimate is
    always >= the true count (collisions only ADD), and with w=256 over
    this fixture the overestimate stays within 2% of the stream size.
    The oracle pins cross-engine exactness; this pins the sketch
    property."""
    from clj_kinesis_to_firehose_spark import registry
    from tests.conftest import SF_DIR
    from clj_kinesis_to_firehose_spark.sources import load_table
    from pyspark.sql import functions as F

    registry._load_all()
    est = {
        (r["event_type"], r["user_id"]): r["est_count"]
        for r in registry.queries()["agg_cms_portable"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        (r["event_type"], r["user_id"]): r["c"]
        for r in ev.filter(F.col("user_id").between(1, 20))
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    n_stream = ev.count()
    assert est, "probe set empty"
    for k, e in est.items():
        true = exact.get(k, 0)
        assert e >= true, (k, e, true)
        assert e - true <= 0.02 * n_stream, (k, e, true)
