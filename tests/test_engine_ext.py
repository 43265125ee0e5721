"""Round-12 continuation behavioral tests: the recursive-CTE walk
against a pure-python reference, pipe syntax against its DataFrame
twin, the ℓ-diversity gate against a pandas recompute, watermark-
scoped dedup under injected redelivery, idempotent-sink no-double-
write under full stream replay, seed-vocab structural laws, the
two-phase curriculum rank against the plain global sort, and the Holt
fold against a literal python recurrence."""

from __future__ import annotations

import pandas as pd

from clj_kinesis_to_firehose_spark import registry
from clj_kinesis_to_firehose_spark.operators.engine_ext import (
    CURRICULUM_SHARDS,
    CURRICULUM_STAGES,
    L_DIVERSITY_THRESHOLD,
    SEED_MAX_PIECE_LEN,
    SEED_VOCAB_TOPK,
)
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def _events(spark) -> pd.DataFrame:
    return (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type")
        .toPandas()
    )


def test_recursive_hierarchy_matches_python_walk(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").toPandas()
    out = QUERIES["sql_recursive_hierarchy"](spark, SF_DIR).toPandas()

    def walk(k: int) -> tuple[int, int]:
        d = 0
        while k >= 10:
            k //= 10
            d += 1
        return k, d

    roots = cust.c_custkey.map(lambda k: walk(int(k))[0])
    depths = cust.c_custkey.map(lambda k: walk(int(k))[1])
    ref = (
        pd.DataFrame(
            {"root_key": roots, "depth": depths, "bal": cust.c_acctbal}
        )
        .groupby("root_key")
        .agg(n_nodes=("depth", "size"), max_depth=("depth", "max"))
        .reset_index()
    )
    got = out.sort_values("root_key").reset_index(drop=True)
    assert list(got.root_key) == list(ref.root_key)
    assert list(got.n_nodes) == list(ref.n_nodes)
    assert list(got.max_depth) == list(ref.max_depth)
    assert got.n_nodes.sum() == len(cust)


def test_pipe_syntax_equals_dataframe_twin(spark):
    from pyspark.sql import functions as F

    out = (
        QUERIES["sql_pipe_syntax_orders"](spark, SF_DIR)
        .toPandas()
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    twin = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .filter(F.col("n_orders") >= 2)
        .toPandas()
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, twin, check_dtype=False)
    assert (out.n_orders >= 2).all()


def test_l_diversity_matches_pandas(spark):
    ev = _events(spark)
    ev["day"] = ev.ts.dt.date
    g = ev.groupby(["event_type", "day"]).agg(
        n_rows=("event_id", "size"), n_sensitive=("user_id", "nunique")
    )
    risky = g.n_sensitive < L_DIVERSITY_THRESHOLD
    ref = (
        pd.DataFrame(
            {
                "n_groups": g.groupby("event_type").size(),
                "n_low_diversity": risky.groupby("event_type").sum(),
                "rows_at_risk": g.n_rows[risky]
                .groupby("event_type")
                .sum()
                .reindex(g.index.get_level_values(0).unique(), fill_value=0),
                "min_diversity": g.n_sensitive.groupby("event_type").min(),
            }
        )
        .reset_index()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    got = (
        QUERIES["dq_l_diversity"](spark, SF_DIR)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ("n_groups", "n_low_diversity", "rows_at_risk", "min_diversity"):
        assert list(got[c]) == list(ref[c]), c


def test_dedup_within_watermark_removes_injected_redelivery(spark):
    ev = _events(spark)
    got = QUERIES["stream_dedup_within_watermark"](spark, SF_DIR).toPandas()
    expect = ev.groupby("event_type").event_id.nunique()
    for _, row in got.iterrows():
        assert row.n_unique == expect[row.event_type]
    # the replay really injected duplicates the operator had to remove
    assert got.n_unique.sum() == ev.event_id.nunique() < len(ev) + 200


def test_idempotent_sink_no_double_writes_after_full_replay(spark):
    ev = _events(spark)
    got = QUERIES["stream_idempotent_sink"](spark, SF_DIR).toPandas()
    # the stream was delivered TWICE (fresh checkpoint, same sink);
    # exactly-once output means per-type counts equal the batch counts
    expect = ev.groupby("event_type").size()
    for _, row in got.iterrows():
        assert row.n_records == expect[row.event_type]
    assert got.n_records.sum() == len(ev)


def test_seed_vocab_structural_laws(spark):
    out = QUERIES["vocab_seed_substrings"](spark, SF_DIR).toPandas()
    assert len(out) == SEED_VOCAB_TOPK
    assert out.piece.str.len().between(2, SEED_MAX_PIECE_LEN).all()
    ranked = out.sort_values("seed_rank")
    assert (ranked.weight.diff().dropna() <= 0).all()  # weight-desc order
    assert (out.n_words >= 1).all()
    # every piece occurs in the corpus text (it came from real words)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    blob = " ".join(docs.text)
    assert all(p in blob for p in out.piece)


def test_curriculum_two_phase_rank_equals_global_sort(spark):
    out = (
        QUERIES["corpus_curriculum_order"](spark, SF_DIR)
        .toPandas()
        .sort_values("position")
        .reset_index(drop=True)
    )
    n = len(out)
    assert list(out.position) == list(range(1, n + 1))
    ref = out.sort_values(
        ["ratio_u4", "n_tokens", "doc_id"], ascending=[False, True, True]
    ).reset_index(drop=True)
    assert list(ref.doc_id) == list(out.doc_id)  # two-phase == global sort
    assert out.stage.between(1, CURRICULUM_STAGES).all()
    assert (out.stage.diff().dropna() >= 0).all()  # stages are contiguous
    assert (out.shard == (out.position - 1) % CURRICULUM_SHARDS).all()


def test_holt_fold_matches_python_recurrence(spark):
    ev = _events(spark)
    ev["day"] = ev.ts.dt.date
    daily = (
        ev.groupby(["event_type", "day"])
        .size()
        .rename("x")
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    got = (
        QUERIES["ts_holt_linear"](spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    for etype, grp in daily.groupby("event_type"):
        xs = [float(v) for v in grp.x]
        l, b = xs[0], 0.0
        for x in xs[1:]:
            l_new = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * (l_new - l) + 0.5 * b
            l = l_new
        row = got.loc[etype]
        assert row.n_days == len(xs)
        assert row.level == l  # bit-exact dyadic fold
        assert row.trend == b
        assert row.forecast_next == l + b


def test_greedy_tokenize_matches_python_greedy(spark):
    pieces = set(
        QUERIES["vocab_seed_substrings"](spark, SF_DIR).toPandas().piece
    )
    out = (
        QUERIES["tokenize_greedy_pieces"](spark, SF_DIR)
        .toPandas()
        .set_index("term")
    )

    def greedy(word: str) -> tuple[int, int]:
        pos, n, fb = 0, 0, 0
        while pos < len(word):
            for plen in (4, 3, 2):
                if word[pos:pos + plen] in pieces and plen <= len(word) - pos:
                    pos += plen
                    break
            else:
                pos += 1
                fb += 1
            n += 1
        return n, fb

    assert len(out) > 0
    for term, row in out.iterrows():
        n, fb = greedy(term)
        assert (row.n_pieces, row.n_fallback) == (n, fb), term
        # piece segmentation never produces more pieces than chars
        assert row.n_pieces <= max(len(term), 1)


def test_video_scene_cuts_consistent_with_framehash(spark):
    from clj_kinesis_to_firehose_spark.operators.engine_ext import (
        VSC_THRESHOLD,
    )

    fh = (
        QUERIES["multimodal_video_framehash"](spark, SF_DIR)
        .toPandas()
        .sort_values(["doc_id", "frame_idx"])
    )
    out = QUERIES["multimodal_video_scene_cuts"](spark, SF_DIR).toPandas()
    ref_cuts, ref_frames = {}, {}
    for doc_id, grp in fh.groupby("doc_id"):
        hs = [int(h) & (2**64 - 1) for h in grp.fhash]
        cuts = sum(
            1
            for a, b in zip(hs, hs[1:])
            if bin(a ^ b).count("1") > VSC_THRESHOLD
        )
        ref_cuts[doc_id], ref_frames[doc_id] = cuts, len(hs)
    for _, row in out.iterrows():
        assert row.n_frames == ref_frames[row.doc_id]
        assert row.n_cuts == ref_cuts[row.doc_id]
    # non-vacuous: some clips have cuts, some don't
    assert out.n_cuts.max() > 0 and (out.n_cuts == 0).any()


def test_audio_dynamics_brackets_fingerprint(spark):
    from clj_kinesis_to_firehose_spark.operators.curation_r12 import (
        AFP_WINDOWS,
    )

    dyn = QUERIES["multimodal_audio_dynamics"](spark, SF_DIR).toPandas()
    assert (dyn.min_e <= dyn.max_e).all()
    assert dyn.n_below_mean.between(0, AFP_WINDOWS).all()
    # a window below the mean exists iff energies are not all equal,
    # and the fingerprint's above-mean bit count must complement it
    fp = QUERIES["multimodal_audio_fingerprint"](spark, SF_DIR).toPandas()
    m = dyn.merge(fp, on="doc_id")
    assert (m.n_below_mean + m.n_bits_set <= AFP_WINDOWS).all()


def test_t_closeness_matches_pandas_tv(spark):
    from clj_kinesis_to_firehose_spark.operators.engine_ext import (
        T_CLOSE_CLASSES,
    )

    ev = _events(spark)
    ev["day"] = ev.ts.dt.date.astype(str)
    ev["sclass"] = ev.user_id % T_CLOSE_CLASSES
    n = len(ev)
    glob = ev.groupby("sclass").size()
    got = QUERIES["dq_t_closeness"](spark, SF_DIR).toPandas()
    assert len(got) == ev.groupby(["event_type", "day"]).ngroups
    for _, row in got.iterrows():
        grp = ev[(ev.event_type == row.event_type) & (ev.day == row.day)]
        ng = len(grp)
        tv_num = sum(
            abs(
                int((grp.sclass == c).sum()) * n
                - int(glob.get(c, 0)) * ng
            )
            for c in range(T_CLOSE_CLASSES)
        )
        assert row.n_rows == ng
        assert row.tv_num == tv_num
        assert row.breaches_t == int(tv_num * 5 > 2 * n * ng)
    # tv_num/(2*N*ng) is a true TV distance: bounded by 1
    assert (got.tv_num <= 2 * n * got.n_rows).all()


def test_fim_spans_partition_and_head(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    got = QUERIES["corpus_fim_spans"](spark, SF_DIR).toPandas()
    m = got.merge(docs[["doc_id", "text"]], on="doc_id")
    # the three spans tile the document exactly
    assert (m.prefix_len + m.middle_len + m.suffix_len == m.n_chars).all()
    assert (m.prefix_len >= 0).all() and (m.suffix_len >= 0).all()
    # middle_head is the real text at the computed offset
    for _, r in m.head(50).iterrows():
        start = int(r.prefix_len)
        assert r.middle_head == r.text[start:start + 8]
    # deterministic: two runs give identical spans
    again = QUERIES["corpus_fim_spans"](spark, SF_DIR).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )


def test_epoch_schedule_budget_law(spark):
    from clj_kinesis_to_firehose_spark.operators.engine_ext import (
        EPOCH_BUDGET_MULT,
    )

    got = QUERIES["corpus_epoch_schedule"](spark, SF_DIR).toPandas()
    total = got.n_tokens.sum()
    s = len(got)
    budget = (total * EPOCH_BUDGET_MULT) // s
    assert (got.budget_tokens == budget).all()
    for _, r in got.iterrows():
        assert r.repeat_u4 == budget * 10000 // r.n_tokens
    # the data-constrained regime: at least one source must repeat
    assert (got.repeat_u4 > 10000).any()
