"""Round-15 operator pins: the preflight guard's control decision
(planted hot key → dead-letter), and the sample-fit kmeans coverage
contract."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark import registry
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def test_preflight_gate_clean_on_organic_fixture(spark):
    # organic TPC-H-ish fanouts sit far below the cap: everything
    # joins, the prediction matches the executed count exactly, and
    # the decision says so
    row = QUERIES["join_preflight_gated"](spark, SF_DIR).collect()[0]
    assert row["decision"] == "clean"
    assert row["n_keys_dead"] == 0
    assert row["rows_dead_lettered"] == 0
    assert row["rows_joined"] == row["rows_predicted"] > 0


def test_preflight_gate_deadletters_planted_hot_key(spark):
    # an adversarial flood on ONE custkey (a template-flood/crawler
    # trap stand-in) must flip the decision, be priced exactly, and be
    # EXCLUDED from the executed join — telemetry turned into control
    from clj_kinesis_to_firehose_spark.operators.joins import (
        JOIN_FANOUT_CAP,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    hot = customer.select(F.min("c_custkey")).collect()[0][0]
    n_flood = JOIN_FANOUT_CAP + 500
    template = orders.limit(1).drop("o_orderkey", "o_custkey")
    flood = (
        spark.range(n_flood)
        .crossJoin(F.broadcast(template))
        .select(
            (F.col("id") + 1_000_000_000).alias("o_orderkey"),
            F.lit(hot).cast("long").alias("o_custkey"),
            *template.columns,
        )
    )
    doctored = orders.select(flood.columns).unionByName(flood)
    out = tempfile.mkdtemp(prefix="kf_hotkey_")
    doctored.write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )
    customer.write.mode("overwrite").parquet(
        os.path.join(out, "customer.parquet")
    )

    row = QUERIES["join_preflight_gated"](spark, out).collect()[0]
    organic = QUERIES["join_preflight_gated"](spark, SF_DIR).collect()[0]
    hot_organic = (
        orders.filter(F.col("o_custkey") == hot).count()
    )
    assert row["decision"] == "degraded"
    assert row["n_keys_dead"] == 1
    # the dead-lettered mass is the flood plus the key's organic rows
    assert row["rows_dead_lettered"] == n_flood + hot_organic
    # the executed join excludes the hot key and STILL matches its
    # own histogram prediction exactly
    assert row["rows_joined"] == row["rows_predicted"]
    assert row["rows_joined"] == organic["rows_joined"] - hot_organic


def test_semdedup_cells_laws_and_planted_twin(spark):
    from clj_kinesis_to_firehose_spark.operators.llm_graph_ann import (
        SEMDEDUP_TAU_Q12,
    )

    out = QUERIES["dedup_semdedup_cells"](spark, SF_DIR).toPandas()
    # structural laws: keeper precedes pruned, threshold respected,
    # one verdict per pruned vector, and the fixture regime prunes
    assert len(out) > 0
    assert (out.keeper_vec_id < out.pruned_vec_id).all()
    assert (out.cos_q12 >= SEMDEDUP_TAU_Q12).all()
    assert out.pruned_vec_id.is_unique

    # a planted near-twin (cosine ≈ .999) must land in its seed's cell
    # and be pruned in favor of a lower-id keeper
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    rows = [r.asDict() for r in base]
    for i in range(3):
        near = dict(rows[i])
        emb = list(near["embedding"])
        emb[0] += 0.01
        emb[1] -= 0.01
        near.update(vec_id=9000 + i, embedding=emb)
        rows.append(near)
    out_dir = tempfile.mkdtemp(prefix="kf_semdedup_")
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    planted = QUERIES["dedup_semdedup_cells"](spark, out_dir).toPandas()
    pruned = set(planted.pruned_vec_id)
    assert {9000, 9001, 9002} <= pruned, sorted(pruned)[-5:]


def test_portable_hash60_spark_twin_matches_md5_definition(spark):
    # the SQL twin has Hypothesis coverage (test_fixedpoint_properties);
    # this pins the SPARK expression twin — conv(substr(md5(x),1,15),
    # 16, 10)::long — to the same pure-Python definition over a seeded
    # spread of shapes (unicode, separators, digits, empty)
    import hashlib
    import random

    from clj_kinesis_to_firehose_spark.operators.llm_dedup import (
        portable_hash60,
    )

    rng = random.Random(0xC0FFEE)
    pool = "abc XYZ 0123456789:_-|/é€漢\t"
    strings = [""] + [
        "".join(rng.choice(pool) for _ in range(rng.randrange(1, 48)))
        for _ in range(400)
    ]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_hash60(F.col("s")).alias("h")).collect()
    }
    for s in strings:
        expect = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
        assert got[s] == expect, repr(s)


def test_dedup_cascade_stages_prune_planted_copies(spark):
    # plant 5 exact copies (stage-1 food) and 5 near copies (one token
    # appended — high jaccard, stage-2 food); each stage must prune at
    # least its plants and the stage accounting must telescope
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.orderBy("doc_id").limit(20).collect()
    rows = [r.asDict() for r in docs.collect()]
    next_id = max(r["doc_id"] for r in rows) + 1
    for i in range(5):
        exact = dict(base[i].asDict())
        exact.update(doc_id=next_id + i)
        rows.append(exact)
    for i in range(5):
        near = dict(base[5 + i].asDict())
        near.update(
            doc_id=next_id + 5 + i, text=near["text"] + " zzznearcopy"
        )
        rows.append(near)
    out_dir = tempfile.mkdtemp(prefix="kf_cascade_")
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    out = {
        r["stage"]: r
        for r in QUERIES["dedup_cascade_report"](spark, out_dir).collect()
    }
    ex, near = out["exact"], out["near_minhash"]
    assert ex["n_in"] == len(rows)
    assert ex["n_pruned"] >= 5  # the exact copies collapse
    assert ex["n_out"] == ex["n_in"] - ex["n_pruned"]
    assert near["n_in"] == ex["n_out"]  # the cascade telescopes
    assert near["n_pruned"] >= 5  # the near copies are caught
    assert near["n_out"] == near["n_in"] - near["n_pruned"]


def test_incremental_semantic_prunes_planted_arrival(spark):
    import hashlib

    from clj_kinesis_to_firehose_spark.operators.llm_graph_ann import (
        INC_SEM_BASE_PCT,
        SEMDEDUP_TAU_Q12,
    )

    def bucket(vid: int) -> int:
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:8], 16) % 100

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    rows = [r.asDict() for r in base]
    # seed must be in the BASE bucket, the planted arrival in DELTA
    seed = next(r for r in rows if bucket(r["vec_id"]) < INC_SEM_BASE_PCT)
    twin_id = next(
        i for i in range(9000, 9200) if bucket(i) >= INC_SEM_BASE_PCT
    )
    near = dict(seed)
    emb = list(near["embedding"])
    emb[0] += 0.01
    emb[1] -= 0.01
    near.update(vec_id=twin_id, embedding=emb)
    rows.append(near)
    out_dir = tempfile.mkdtemp(prefix="kf_incsem_")
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    out = QUERIES["dedup_incremental_semantic"](spark, out_dir).toPandas()
    # internal law: the verdict is exactly the threshold predicate
    pruned = out[out.verdict == "prune"]
    admitted = out[out.verdict == "admit"]
    assert (pruned.best_base_cos_q12 >= SEMDEDUP_TAU_Q12).all()
    assert (
        admitted.best_base_cos_q12.isna()
        | (admitted.best_base_cos_q12 < SEMDEDUP_TAU_Q12)
    ).all()
    # the planted arrival lands on its seed's cell and is pruned
    row = out[out.vec_id == twin_id]
    assert len(row) == 1
    assert row.iloc[0].verdict == "prune", row.to_string()


def test_graph_calibration_curve_laws(spark):
    # the sweep's reason to exist: more walk budget, more recall, more
    # visited nodes — and the production setting sits at the top
    from clj_kinesis_to_firehose_spark.operators.llm_graph_ann import (
        BEAM_B,
        GRAPH_CAL_SWEEP,
        GRAPH_HOPS,
    )

    out = QUERIES["sim_ann_graph_calibration"](spark, SF_DIR).toPandas()
    assert len(out) == len(GRAPH_CAL_SWEEP)
    grid = out.set_index(["hops", "beam"])
    # recall and visited volume are monotone in hops at the full beam
    hop_seq = [grid.loc[(h, 8)] for h in (1, 2, 3)]
    assert all(
        a.recall_u4 <= b.recall_u4 for a, b in zip(hop_seq, hop_seq[1:])
    )
    assert all(
        a.n_visited <= b.n_visited for a, b in zip(hop_seq, hop_seq[1:])
    )
    # a wider beam at the same hops can only help
    assert grid.loc[(3, 4)].recall_u4 <= grid.loc[(3, 8)].recall_u4
    assert grid.loc[(3, 4)].n_visited <= grid.loc[(3, 8)].n_visited
    # the production setting recovers (nearly) everything here
    assert grid.loc[(GRAPH_HOPS, BEAM_B)].recall_u4 >= 9000


def test_survivorship_ledger_laws(spark):
    # the ledger covers the whole bounded population, keeps exactly one
    # member per component, and the survivor is the best-quality member
    out = QUERIES["dedup_survivorship"](spark, SF_DIR).toPandas()
    comps = QUERIES["dedup_cluster_components"](spark, SF_DIR).toPandas()
    assert len(out) == len(comps)  # one ledger row per clustered doc
    by_comp = out.groupby("component_id")
    assert (by_comp["kept"].sum() == 1).all()  # exactly one survivor
    assert (by_comp.size().values == by_comp["n_members"].first().values).all()
    for _, g in out.groupby("component_id"):
        surv = g[g.kept].iloc[0]
        assert (g.survivor_doc_id == surv.doc_id).all()
        ratio = g.n_distinct / g.n_tokens
        best = ratio.max()
        # survivor attains the max ratio; min doc_id among attainers
        assert surv.n_distinct / surv.n_tokens == best
        assert surv.doc_id == g[ratio == best].doc_id.min()
    # unlike the min-id convention, at least one multi-member component
    # must exist and the keep-best pick is a real decision (rank is
    # dense from 1)
    multi = out[out.n_members > 1]
    assert len(multi) > 0
    assert (out.quality_rank >= 1).all()


def test_rank_fusion_laws(spark):
    # fused shortlist: per-probe rank dense to TOP_K, score is the
    # exact integer RRF of the two input ranks, dual-membership beats
    # either single list at equal rank
    from clj_kinesis_to_firehose_spark.operators.llm_graph_ann import (
        RRF_K,
        RRF_SCALE,
        TOP_K,
    )

    out = QUERIES["sim_rank_fusion"](spark, SF_DIR).toPandas()
    for _, g in out.groupby("probe_id"):
        assert sorted(g.fused_rank) == list(range(1, len(g) + 1))
        assert len(g) <= TOP_K
    def c(r):
        return RRF_SCALE // (RRF_K + r) if r > 0 else 0
    assert (out.apply(lambda x: c(x.r_lsh) + c(x.r_ivf), axis=1)
            == out.rrf_u12).all()
    both = out[(out.r_lsh > 0) & (out.r_ivf > 0)]
    assert len(both) > 0  # the two families overlap on real data
    # a rank-1-in-both candidate scores strictly above any
    # single-list candidate (2/(k+1) > 1/(k+r) for every r >= 1)
    single = out[(out.r_lsh == 0) | (out.r_ivf == 0)]
    if len(single):
        assert both.rrf_u12.max() > single.rrf_u12.max()
