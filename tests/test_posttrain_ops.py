"""Behavioral tests for the post-training assembly family
(operators/posttrain.py) — semantic laws the DuckDB hash check can't
express: margin positivity, budget ceilings, offset contiguity,
mask-span algebra, and plan shape (broadcast apply, single Exchange
for the two-window trim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import queries
from tests.conftest import SF_DIR

QUERIES = queries()


def test_pref_pairs_have_positive_margin_and_same_cohort(spark):
    out = QUERIES["pref_pair_assembly"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    # chosen beats rejected: margin d1/t1 - d2/t2 > 0 in exact rational form
    assert (out.margin_num > 0).all()
    assert (out.margin_den > 0).all()
    assert (out.chosen_doc_id != out.rejected_doc_id).all()
    # length de-bias contract: both sides of a pair share the bucket, so
    # token counts differ by < 2 bucket widths
    assert (
        (out.chosen_tokens // 50) == (out.rejected_tokens // 50)
    ).all(), "pair crosses its length bucket"


def test_pref_stats_share_is_consistent_with_pairs(spark):
    pairs = QUERIES["pref_pair_assembly"](spark, SF_DIR).toPandas()
    stats = QUERIES["pref_pair_stats"](spark, SF_DIR).toPandas()
    assert stats.n_pairs.sum() == len(pairs)
    # fixed-point share recomputes from the integer counts
    for _, r in stats.iterrows():
        assert r.share_chosen_longer_u4 == (10000 * r.n_chosen_longer) // r.n_pairs


def test_winrate_matrix_shares_sum_per_loser(spark):
    out = QUERIES["pref_winrate_matrix"](spark, SF_DIR).toPandas()
    per_loser = out.groupby("rejected_source")
    for loser, g in per_loser:
        assert g.n_wins.sum() == g.n_losses_of_rejected.iloc[0]
        # each FLOOR share under-approximates; the sum of true shares is 1
        assert g.share_of_losses_u4.sum() <= 10000
        assert g.share_of_losses_u4.sum() > 10000 - len(g)


def test_conversation_transcript_turn_count_matches_lines(spark):
    out = QUERIES["chat_conversation_assembly"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    n_lines = out.transcript.str.count("\n") + 1
    assert (n_lines == out.n_turns).all()
    assert (out.n_assistant_turns <= out.n_turns).all()
    # role tags are the only line openers
    assert out.transcript.str.match(r"<(user|assistant|system)> ").all()


def test_context_trim_respects_budget_and_offsets_are_contiguous(spark):
    out = (
        QUERIES["chat_context_trim"](spark, SF_DIR)
        .orderBy("user_id", "month", "turn_idx")
        .toPandas()
    )
    assert len(out) > 0
    for (_, _), g in out.groupby(["user_id", "month"]):
        # total kept cost within budget (cost = ws tokens of each line)
        kept_cost = g.line.str.split(" ").map(len).sum()
        assert kept_cost <= 12
        # offsets tile the packed transcript: next start = prev end + 1
        starts, ends = list(g.start_char), list(g.end_char)
        assert starts[0] == 0
        for i in range(1, len(g)):
            assert starts[i] == ends[i - 1] + 1
        # loss mask marks exactly the assistant turns
        assert ((g.role == "assistant") == g.loss_mask).all()


def test_context_trim_keeps_the_newest_turns(spark):
    """The trim is a SUFFIX: every dropped turn is strictly older
    (by the (ts, event_id) turn order) than every kept turn within
    its conversation — a prefix-keeping bug would pass the budget
    test but fail here."""
    from clj_kinesis_to_firehose_spark.sources import load_table

    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "user_id",
            F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias(
                "month"
            ),
            "ts",
            "event_id",
        )
        .toPandas()
    )
    kept = QUERIES["chat_context_trim"](spark, SF_DIR).toPandas()
    kept_ids = set(kept.event_id)
    checked_a_drop = False
    for (_, _), g in ev.groupby(["user_id", "month"]):
        order = g.sort_values(["ts", "event_id"]).event_id.tolist()
        flags = [eid in kept_ids for eid in order]
        if not any(flags):
            continue
        first_kept = flags.index(True)
        # suffix property: everything after the first kept turn is kept
        assert all(flags[first_kept:]), f"non-suffix keep set in {order}"
        checked_a_drop = checked_a_drop or first_kept > 0
    assert checked_a_drop, "fixture never exercised a dropped prefix"


def test_sft_loss_mask_span_algebra(spark):
    out = QUERIES["corpus_sft_loss_mask"](spark, SF_DIR).toPandas()
    # trainable: mask starts right after the prompt + separating space;
    # untrainable: the span collapses to [n_chars, n_chars)
    t = out[out.trainable]
    assert (t.mask_start == t.prompt_chars + 1).all()
    u = out[~out.trainable]
    assert (u.mask_start == u.mask_end).all()
    assert (out.mask_end >= out.mask_start).all()
    # trainable iff the masked span is non-empty
    assert ((out.mask_end > out.mask_start) == out.trainable).all()
    # no response -> zero loss-bearing tokens
    assert (out.loc[~out.trainable, "masked_bpe_tokens"] == 0).all()
    assert (out.loc[out.trainable, "masked_bpe_tokens"] > 0).any()


def test_tokenizer_eval_floor_units_recompute(spark):
    out = QUERIES["tokenizer_compression_eval"](spark, SF_DIR).toPandas()
    for _, r in out.iterrows():
        assert r.chars_per_token_u4 == int(
            10000.0 * r.total_chars / r.total_bpe_tokens
        )
        assert r.fertility_u4 == int(
            10000.0 * r.total_bpe_tokens / r.total_ws_tokens
        )


def test_minmax_scale_bounds_and_broadcast_plan(spark):
    df = QUERIES["feature_minmax_scale"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "fit/apply join must broadcast the fit"
    out = df.toPandas()
    assert out.scaled_u6.min() == 0
    assert out.scaled_u6.max() == 1000000
    # per-group extremes hit the bounds
    for _, g in out.groupby("l_returnflag"):
        assert g.scaled_u6.min() == 0 and g.scaled_u6.max() == 1000000


def test_context_trim_plans_one_exchange_for_both_windows(spark):
    plan = (
        QUERIES["chat_context_trim"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, (
        f"expected the two window passes to share one Exchange, got "
        f"{n_exchanges}"
    )


def test_woe_binning_odds_identity(spark):
    out = QUERIES["feature_woe_binning"](spark, SF_DIR).toPandas()
    tot_pos, tot_neg = out.n_pos.sum(), out.n_neg.sum()
    assert (out.odds_num == out.n_pos * tot_neg).all()
    assert (out.odds_den == out.n_neg * tot_pos).all()
    both = out[(out.n_pos > 0) & (out.n_neg > 0)]
    assert (
        both.odds_ratio_u6 == (1000000.0 * both.odds_num / both.odds_den).astype(int)
    ).all()
    # degenerate bins emit NULL, never a fabricated ratio
    degen = out[(out.n_pos == 0) | (out.n_neg == 0)]
    assert degen.odds_ratio_u6.isna().all()


def test_bt_strength_laws(spark):
    out = QUERIES["pref_bt_strength"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.strength_u6 > 0).all()
    # rank is a 1..n permutation ordered by strength desc
    assert sorted(out.strength_rank) == list(range(1, len(out) + 1))
    by_rank = out.sort_values("strength_rank")
    assert by_rank.strength_u6.is_monotonic_decreasing
    # games are symmetric counts: each pair contributes to both sides
    assert out.n_games.sum() == 2 * out.n_wins.sum()
    # zero-win sources keep the prior strength (MM guard, no div-by-zero)
    zero = out[out.n_wins == 0]
    assert (zero.strength_u6 == 1_000_000).all()


def test_crawl_budget_sums_exactly_and_stays_within_one_seat(spark):
    out = QUERIES["crawl_politeness_budget"](spark, SF_DIR).toPandas()
    assert out.quota.sum() == 10_000
    assert ((out.quota - out.quota_floor).isin([0, 1])).all()
    # sublinear politeness: weight is monotone in host size
    s = out.sort_values("n_docs")
    assert s.weight_u6.is_monotonic_increasing


def test_stream_chat_assembly_equals_batch_build(spark):
    """Micro-batch boundaries cannot change a transcript: the streaming
    merge of sorted partials equals the batch build row-for-row."""
    batch = (
        QUERIES["chat_conversation_assembly"](spark, SF_DIR)
        .orderBy("user_id", "month")
        .toPandas()
    )
    streamed = (
        QUERIES["stream_chat_assembly"](spark, SF_DIR)
        .orderBy("user_id", "month")
        .toPandas()
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        batch.reset_index(drop=True),
        streamed.reset_index(drop=True),
        check_dtype=False,
    )


def test_pref_manifest_is_leakage_safe_and_shards_only_train(spark):
    out = QUERIES["pref_train_manifest"](spark, SF_DIR).toPandas()
    pairs = QUERIES["pref_pair_assembly"](spark, SF_DIR).toPandas()
    assert len(out) == len(pairs)
    # split is a pure function of the cohort: one split per cohort
    per_cohort = out.groupby(["lang", "tok_bucket"]).split.nunique()
    assert (per_cohort == 1).all()
    # shards exist exactly on train rows, within range
    train = out[out.split == "train"]
    assert train.shard_id.notna().all()
    assert train.shard_id.isin(range(4)).all()
    assert out[out.split != "train"].shard_id.isna().all()


def test_dedup_savings_consistent_with_dedup_exact(spark):
    savings = QUERIES["corpus_dedup_savings"](spark, SF_DIR).toPandas()
    groups = QUERIES["dedup_exact"](spark, SF_DIR).toPandas()
    # total dupes = total rows - distinct texts
    assert savings.n_dupes.sum() == savings.n_docs.sum() - len(groups)
    assert (savings.bytes_saved <= savings.total_bytes).all()
    for _, r in savings.iterrows():
        assert r.savings_share_u4 == (10000 * r.bytes_saved) // r.total_bytes


def test_dedup_savings_join_is_unhinted_and_pushdown_survives(spark):
    """The keeper join is unhinted (AQE decides: broadcast at bench
    scale, text-co-located SMJ at corpus scale) and the scan stays
    column-pruned: only the four referenced columns are read."""
    plan = (
        QUERIES["corpus_dedup_savings"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)
    assert "ReadSchema: struct<doc_id:bigint,text:string,source:string,n_chars:bigint>" in plan


def test_udf_arrow_scalar_matches_builtin_expression(spark):
    from clj_kinesis_to_firehose_spark.sources import load_table

    out = QUERIES["udf_arrow_scalar"](spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") < 2000)
    expected = ev.select(
        "event_id",
        (F.col("user_id") * 31 + F.length("event_type")).alias("checksum"),
    )
    assert out.exceptAll(expected).count() == 0
    assert expected.exceptAll(out).count() == 0


def test_pair_assembly_plans_one_exchange_no_join(spark):
    """The cohort-extreme aggregate form: one scan, one shuffle, no
    self-join — the plan the window+self-join formulation could not
    produce (it planned two Exchanges)."""
    plan = (
        QUERIES["pref_pair_assembly"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_bt_calibration_bins_are_consistent(spark):
    out = QUERIES["pref_bt_calibration"](spark, SF_DIR).toPandas()
    bt = QUERIES["pref_bt_strength"](spark, SF_DIR).toPandas()
    assert out.bin_id.between(0, 10).all()
    # every game appears once per orientation: totals match the fit's
    assert out.n_games.sum() == bt.n_games.sum()
    assert out.n_wins.sum() == bt.n_wins.sum()
    for _, r in out.iterrows():
        assert r.emp_winrate_u4 == (10000 * r.n_wins) // r.n_games
        # mirror bins: a matchup in bin b has its reverse in bin 9-b (or
        # the 0.5 boundary bin) — total games are symmetric around 5000
    assert (out.n_wins <= out.n_games).all()


def test_freshness_lag_head_has_zero_lag(spark):
    out = QUERIES["dq_freshness_lag"](spark, SF_DIR).toPandas()
    assert (out.lag_minutes >= 0).all()
    assert (out.lag_minutes == 0).any(), "the stream head itself lags 0"
    # lag recomputes from the emitted timestamps
    head = out.latest_ts.max()
    recomputed = ((head - out.latest_ts).dt.total_seconds() // 60).astype(int)
    assert (out.lag_minutes == recomputed).all()


def test_bt_scaled_extends_the_exact_twin(spark):
    """More MM iterations refine, never scramble: the 64-step
    checkpointed fit agrees with the 3-step twin on the game totals
    and stays positive; both are hash-exact vs their own oracles."""
    short = QUERIES["pref_bt_strength"](spark, SF_DIR).toPandas()
    long = QUERIES["pref_bt_strength_scaled"](spark, SF_DIR).toPandas()
    assert set(long.source) == set(short.source)
    assert (long.strength_u6 > 0).all()
    m = long.merge(short, on="source", suffixes=("_l", "_s"))
    assert (m.n_wins_l == m.n_wins_s).all()
    assert (m.n_games_l == m.n_games_s).all()


def test_ivf_calibration_recall_laws(spark):
    out = (
        QUERIES["sim_ann_ivf_calibration"](spark, SF_DIR)
        .orderBy("nprobe")
        .toPandas()
    )
    assert list(out.nprobe) == [1, 2, 4, 8]
    # recall and candidate volume are monotone in the probe budget
    assert out.recall_u4.is_monotonic_increasing
    assert out.n_candidates.is_monotonic_increasing
    # probing every cell (nprobe = K_CLUSTERS = 8) IS brute force
    assert out.recall_u4.iloc[-1] == 10000
    assert (out.n_retrieved == 25).all()  # 5 probes x top-5 always fill


def test_stream_pref_ingest_equals_batch_build(spark):
    """Cohort extremes are mergeable: extremes-of-extremes over
    micro-batch partials equals the batch build row-for-row."""
    import pandas as pd

    batch = (
        QUERIES["pref_pair_assembly"](spark, SF_DIR)
        .orderBy("lang", "tok_bucket")
        .toPandas()
    )
    streamed = (
        QUERIES["stream_pref_pair_ingest"](spark, SF_DIR)
        .orderBy("lang", "tok_bucket")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        batch.reset_index(drop=True),
        streamed.reset_index(drop=True),
        check_dtype=False,
    )


def test_rake_score_identity_and_stopwords_excluded(spark):
    from clj_kinesis_to_firehose_spark.operators.llm_text import STOPWORDS

    out = QUERIES["text_keyword_rake"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert not out.word.isin(STOPWORDS).any()
    # deg >= freq (every phrase has length >= 1) and the fixed-point
    # score recomputes from the exact integers
    assert (out.deg >= out.freq).all()
    for _, r in out.iterrows():
        assert r.rake_u4 == (10000 * r.deg) // r.freq
    # single-word phrases floor the score at exactly 1.0
    assert (out.rake_u4 >= 10000).all()


def test_pack_efficiency_reconciles_with_bins(spark):
    eff = QUERIES["corpus_pack_efficiency"](spark, SF_DIR).toPandas()
    bins = QUERIES["corpus_pack_sequences"](spark, SF_DIR).toPandas()
    assert eff.n_bins.sum() == len(bins)
    assert eff.total_tokens.sum() == bins.bin_tokens.sum()
    assert (eff.capacity_tokens == eff.n_bins * 512).all()
    # overflow accounting: only bins beyond capacity contribute
    for _, r in eff.iterrows():
        g = bins[bins.lang == r.lang]
        assert r.n_overflow_bins == (g.bin_tokens > 512).sum()
        assert r.overflow_tokens == (g.bin_tokens - 512).clip(lower=0).sum()


def test_xml_roundtrip_is_identity(spark):
    from clj_kinesis_to_firehose_spark.sources import load_table

    out = QUERIES["scan_xml_roundtrip"](spark, SF_DIR)
    src = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    assert out.exceptAll(src).count() == 0
    assert src.exceptAll(out).count() == 0


def test_stream_freshness_equals_batch_audit(spark):
    import pandas as pd

    batch = (
        QUERIES["dq_freshness_lag"](spark, SF_DIR)
        .orderBy("event_type")
        .toPandas()
    )
    streamed = (
        QUERIES["stream_freshness_monitor"](spark, SF_DIR)
        .orderBy("event_type")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        batch.reset_index(drop=True),
        streamed.reset_index(drop=True),
        check_dtype=False,
    )


def test_bot_rate_profile_laws(spark):
    out = QUERIES["dq_bot_rate_profile"](spark, SF_DIR).toPandas()
    assert (out.active_minutes >= 1).all()
    assert (out.active_minutes <= out.n_events).all()
    for _, r in out.iterrows():
        assert r.rate_u4 == (10000 * r.n_events) // r.active_minutes
        assert r.bot_flag == (r.n_events >= 50 and r.rate_u4 > 15000)
