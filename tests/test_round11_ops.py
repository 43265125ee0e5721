"""Round-11 operator behavioral tests: vocabulary coverage laws and
non-degenerate OOV, a pure-Python BPE pair-count replay, group-split
leakage disjointness, hard-negative positive-exclusion non-vacuity,
and a pandas recompute of the key-skew profile — plus plan-shape pins
for the new broadcast paths."""

from __future__ import annotations

import collections

import pandas as pd

from clj_kinesis_to_firehose_spark import registry
from clj_kinesis_to_firehose_spark.operators.curation_r11 import (
    BPE_TOPK,
    NEG_POS_THRESH,
    NEG_TOP_K,
    SKEW_TOPK,
    SPLIT_FOLDS,
    VOCAB_TOPK,
)
from clj_kinesis_to_firehose_spark.plans import audit
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def test_vocab_coverage_monotone_and_partial(spark):
    """Coverage must rise monotonically with rank and stay < 1 at
    K=20: the fixture has ~31 distinct terms, so a top-20 vocab that
    claims full coverage means the rank/cumsum logic is broken."""
    out = (
        QUERIES["vocab_build_topk"](spark, SF_DIR)
        .toPandas()
        .sort_values("vocab_rank")
    )
    assert len(out) == VOCAB_TOPK
    assert list(out.vocab_rank) == list(range(1, VOCAB_TOPK + 1))
    cov = list(out.coverage)
    assert all(a < b for a, b in zip(cov, cov[1:])), cov
    assert 0 < cov[-1] < 1, cov[-1]
    # tf ordering matches the rank ordering (desc, term tie-break)
    tfs = list(out.tf)
    assert all(a >= b for a, b in zip(tfs, tfs[1:]))
    assert (out.df <= out.tf).all() and (out.df > 0).all()


def test_oov_rate_non_degenerate_and_consistent(spark):
    """The K=20 vocab must leave a real OOV remainder (the constant
    was sized for exactly this), and n_oov/n_tokens must reproduce
    oov_rate."""
    out = QUERIES["vocab_oov_rate"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert len(out) == len(docs)
    assert out.oov_rate.mean() > 0.05, "vocab covers everything — vacuous"
    assert (out.n_oov <= out.n_tokens).all()
    recomputed = (out.n_oov / out.n_tokens).round(6)
    assert (recomputed == out.oov_rate).all()


def test_bpe_pair_counts_match_python_replay(spark):
    """Replay the BPE counting kernel in pure Python over the raw
    fixture and require identical (pair, count) content for the full
    top-K — catches both the per-word pair extraction and the
    frequency weighting."""
    out = QUERIES["bpe_pair_counts"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    wf = collections.Counter()
    for text in docs.text:
        for w in text.split(" "):
            if len(w) >= 2:
                wf[w] += 1
    pairs = collections.Counter()
    for w, f in wf.items():
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += f
    expect = sorted(
        pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:BPE_TOPK]
    got = [
        ((r.left_sym, r.right_sym), r.pair_count)
        for r in out.sort_values("pair_rank").itertuples()
    ]
    assert got == expect


def test_split_group_holdout_is_group_disjoint(spark):
    """The leakage law: no source may appear in more than one split;
    folds are in range and the split is a pure function of source."""
    out = QUERIES["split_group_holdout"](spark, SF_DIR).toPandas()
    per_source = out.groupby("source").agg(
        n_splits=("split", "nunique"), n_folds=("fold", "nunique")
    )
    assert (per_source.n_splits == 1).all()
    assert (per_source.n_folds == 1).all()
    assert set(out.split) == {"train", "val"}, "one side empty — vacuous"
    assert out.fold.between(0, SPLIT_FOLDS - 1).all()


def test_hard_negatives_exclude_real_positives(spark):
    """Every returned cosine is strictly below the positive threshold,
    ranks are dense 1..K per probe, and — non-vacuity — every probe
    actually HAS candidates above the threshold that were excluded
    (otherwise the operator is just sim_topk_exact with extra steps)."""
    out = QUERIES["sim_hard_negatives"](spark, SF_DIR).toPandas()
    topk = QUERIES["sim_topk_exact"](spark, SF_DIR).toPandas()
    assert (out.cosine < NEG_POS_THRESH).all()
    for pid, grp in out.groupby("probe_id"):
        assert sorted(grp.neg_rank) == list(range(1, NEG_TOP_K + 1))
    # sim_topk's unfiltered top-1 per probe sits above the threshold
    # on this fixture, so the exclusion filter removed real rows
    top1 = topk[topk.nn_rank == 1].set_index("probe_id").cosine
    assert (top1 >= NEG_POS_THRESH).all(), top1
    # and no excluded (positive) neighbor leaks into the negatives
    positives = set(
        map(tuple, topk[topk.cosine >= NEG_POS_THRESH][
            ["probe_id", "neighbor_id"]
        ].itertuples(index=False))
    )
    returned = set(
        map(tuple, out[["probe_id", "neighbor_id"]].itertuples(index=False))
    )
    assert not positives & returned


def test_key_skew_matches_pandas_recompute(spark):
    """Recompute the full profile in pandas: heavy-key list, shares,
    and the global skew ratio must agree exactly."""
    out = (
        QUERIES["dq_key_skew"](spark, SF_DIR)
        .toPandas()
        .sort_values("key_rank")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    counts = ev.groupby("user_id").size().reset_index(name="n")
    counts = counts.sort_values(["n", "user_id"], ascending=[False, True])
    total, n_keys, mx = counts.n.sum(), len(counts), counts.n.max()
    head = counts.head(SKEW_TOPK).reset_index(drop=True)
    assert list(out.user_id) == list(head.user_id)
    assert list(out.n_rows) == list(head.n)
    assert (out.share == (head.n / total).round(6)).all()
    assert (out.n_keys == n_keys).all()
    assert (out.skew_ratio == round(mx * n_keys / total, 4)).all()
    assert (out.skew_ratio >= 1).all()


# --- plan-shape pins ---------------------------------------------------------


def test_oov_vocab_join_broadcasts(spark):
    """The K-row vocab side must broadcast — a shuffle join against a
    20-row relation is the wrong plan at any scale."""
    df = QUERIES["vocab_oov_rate"](spark, SF_DIR)
    assert audit.n_broadcast_joins(df) >= 1, audit.plan_report(df)


def test_hard_negatives_probe_side_broadcasts(spark):
    """Same contract as sim_topk_exact: the probe-side crossJoin plans
    as a BroadcastNestedLoopJoin (a map-side fan-out over one corpus
    scan), never a shuffle-based cartesian product."""
    df = QUERIES["sim_hard_negatives"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_topk_paths_avoid_global_sort(spark):
    """vocab/bpe/skew top-Ks must plan as TakeOrdered (partial top-K),
    never a full Exchange+Sort of the ranked relation."""
    for name in ["vocab_build_topk", "bpe_pair_counts", "dq_key_skew"]:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, (name, plan[:2000])


def test_char_entropy_matches_python_replay(spark):
    """Replay the entropy computation in pure Python (same char-order
    fold) for every doc and require 6-dp equality; entropy must also
    respect its information-theoretic bound log2(n_unique)."""
    import math

    out = QUERIES["text_char_entropy"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet").set_index("doc_id")
    assert len(out) == len(docs)
    for r in out.sample(n=50, random_state=7).itertuples():
        text = docs.loc[r.doc_id].text
        n = collections.Counter(text)
        total = len(text)
        s = 0.0
        for c in sorted(n):
            p = n[c] / total
            s += p * math.log(p)
        assert r.n_chars_total == total
        assert r.n_unique_chars == len(n)
        assert r.char_entropy == round(-s / math.log(2), 6)
    bound = (out.n_unique_chars.map(lambda u: math.log2(u))) + 1e-9
    assert (out.char_entropy <= bound).all()
    assert (out.char_entropy >= 0).all()


def _python_bpe_merges(texts, n_merges):
    """Pure-Python replay of the operator's merge semantics: pair
    counts over the '|'-joined dictionary, top non-self pair, and the
    double-pass str.replace apply (fuzz-verified to agree with both
    engines' REPLACE)."""
    wf = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if len(w) >= 2:
                wf[w] += 1
    reps = {("|" + "|".join(w) + "|"): f for w, f in wf.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for rep, f in reps.items():
            syms = rep.strip("|").split("|")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        cands = [(p, c) for p, c in pairs.items() if p[0] != p[1]]
        (l, r), c = min(cands, key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((l, r, c))
        pat, sub = f"|{l}|{r}|", f"|{l}{r}|"
        nxt = collections.Counter()
        for rep, f in reps.items():
            nxt[rep.replace(pat, sub).replace(pat, sub)] += f
        reps = nxt
    return merges


def test_bpe_learn_merges_matches_python_replay(spark):
    """The full select-apply-recount loop must agree with a pure-
    Python replay, and iteration 1 must agree with bpe_pair_counts'
    top non-self pair (the two operators share the counting rule)."""
    out = (
        QUERIES["bpe_learn_merges"](spark, SF_DIR)
        .toPandas()
        .sort_values("merge_rank")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    expect = _python_bpe_merges(list(docs.text), len(out))
    got = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in out.itertuples()
    ]
    assert got == expect
    pc = QUERIES["bpe_pair_counts"](spark, SF_DIR).toPandas()
    top_nonself = pc[pc.left_sym != pc.right_sym].sort_values(
        ["pair_count", "left_sym", "right_sym"], ascending=[False, True, True]
    ).iloc[0]
    assert (got[0][0], got[0][1]) == (
        top_nonself.left_sym,
        top_nonself.right_sym,
    )


def test_engine_replace_semantics_agree(spark):
    """The BPE apply step leans on REPLACE scan semantics being
    identical in Spark, DuckDB, and Python (the replay above uses
    str.replace) — pin that with the pathological run/alternation
    cases where scan-replace and greedy merging could diverge."""
    import duckdb
    from pyspark.sql import functions as SF

    cases = [
        ("|a|a|a|a|a|a|", "|a|a|", "|aa|"),
        ("|a|b|a|b|a|b|", "|a|b|", "|ab|"),
        ("|a|b|b|a|", "|b|b|", "|bb|"),
        ("|ab|a|b|ab|", "|a|b|", "|ab|"),
        ("||", "|a|b|", "|ab|"),
    ]
    df = spark.createDataFrame(
        [(i, s, p, r) for i, (s, p, r) in enumerate(cases)],
        "id int, s string, pat string, sub string",
    )
    sp = {
        r.id: r.out
        for r in df.select(
            "id",
            SF.replace(SF.replace("s", "pat", "sub"), "pat", "sub").alias(
                "out"
            ),
        ).collect()
    }
    con = duckdb.connect()
    for i, (s, p, r) in enumerate(cases):
        du = con.execute(
            "SELECT REPLACE(REPLACE(?,?,?),?,?)", [s, p, r, p, r]
        ).fetchone()[0]
        py = s.replace(p, r).replace(p, r)
        assert sp[i] == du == py, (s, p, sp[i], du, py)


def test_stream_vocab_equals_batch_vocab(spark):
    """Micro-batch boundaries must not change the vocabulary: the
    streaming ingest's merged partials equal the batch build row for
    row."""
    stream = (
        QUERIES["stream_vocab_ingest"](spark, SF_DIR)
        .toPandas()
        .sort_values("vocab_rank")
        .reset_index(drop=True)
    )
    batch = (
        QUERIES["vocab_build_topk"](spark, SF_DIR)
        .toPandas()
        .sort_values("vocab_rank")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(stream, batch)


def test_bpe_tokenize_apply_matches_python_replay(spark):
    """Apply the replayed merges to every word in pure Python and
    require identical per-doc token counts — covers the full-
    dictionary apply (including the len-1 words the training
    dictionary excludes) and the chars-per-token arithmetic."""
    out = QUERIES["bpe_tokenize_apply"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    merges = _python_bpe_merges(list(docs.text), 3)
    cache = {}

    def n_sym(word):
        if word not in cache:
            rep = "|" + "|".join(word) + "|"
            for l, r, _ in merges:
                pat, sub = f"|{l}|{r}|", f"|{l}{r}|"
                rep = rep.replace(pat, sub).replace(pat, sub)
            cache[word] = len(rep.strip("|").split("|"))
        return cache[word]

    got = out.set_index("doc_id")
    for row in docs.sample(n=60, random_state=3).itertuples():
        words = row.text.split(" ")
        toks = sum(n_sym(w) for w in words)
        chars = sum(len(w) for w in words)
        g = got.loc[row.doc_id]
        assert g.n_words == len(words)
        assert g.n_bpe_tokens == toks
        assert g.chars_per_token == round(chars / toks, 4)
    # merges must actually compress: fewer tokens than characters
    assert (out.n_bpe_tokens < out.n_words * 50).all()
    assert (out.chars_per_token > 1).all(), "no merge applied — vacuous"


def test_dataset_card_matches_pandas_recompute(spark):
    """Integer-sum recompute of the per-source card, plus the global
    law: token shares sum to 1 (6-dp)."""
    out = QUERIES["corpus_dataset_card"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    g = docs.assign(
        n_tok=docs.text.map(lambda t: len(t.split(" "))),
        n_chr=docs.text.map(len),
    ).groupby("source")
    expect = g.agg(
        n_docs=("n_tok", "size"),
        n_tokens=("n_tok", "sum"),
        n_chars=("n_chr", "sum"),
        n_langs=("n_chr", "size"),
    )
    expect["n_langs"] = docs.groupby("source").lang.nunique()
    got = out.set_index("source")
    for c in ["n_docs", "n_tokens", "n_chars", "n_langs"]:
        assert got[c].sort_index().equals(expect[c].sort_index()), c
    assert abs(out.pct_corpus_tokens.sum() - 1.0) < 1e-4
    total = expect.n_tokens.sum()
    for r in out.itertuples():
        assert r.pct_corpus_tokens == round(
            expect.loc[r.source].n_tokens / total, 6
        )


def test_quality_histogram_decile_laws(spark):
    """Global-decile balance: summed across sources each decile holds
    n/10 docs (+-1 for the NTILE remainder), decile ranges don't
    overlap, and every doc is counted once."""
    out = QUERIES["corpus_quality_histogram"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n = len(docs)
    per_decile = out.groupby("decile").n_docs.sum()
    assert per_decile.sum() == n
    assert set(per_decile.index) == set(range(1, 11))
    assert per_decile.between(n // 10, n // 10 + 1).all()
    rng = out.groupby("decile").agg(
        lo=("min_ratio_u8", "min"), hi=("max_ratio_u8", "max")
    ).sort_index()
    # decile d's ceiling never exceeds decile d+1's floor (integer
    # 1e-8 units since r12 — exact compare, no epsilon needed)
    assert (rng.hi.values[:-1] <= rng.lo.values[1:]).all()


def test_lsh_calibration_curve_is_discriminating(spark):
    """The measured S-curve must rise with the planted similarity
    level and actually discriminate (not all-0 / all-1); jaccard bands
    must be ordered with the levels and disjoint."""
    out = (
        QUERIES["dedup_lsh_calibration"](spark, SF_DIR)
        .toPandas()
        .sort_values("level")
        .reset_index(drop=True)
    )
    from clj_kinesis_to_firehose_spark.operators.curation_r11 import (
        LSH_CAL_LEVELS,
    )

    assert list(out.level) == sorted(LSH_CAL_LEVELS)
    assert out.n_planted.nunique() == 1 and (out.n_planted > 0).all()
    rec = list(out.recall)
    assert all(a <= b for a, b in zip(rec, rec[1:])), rec
    assert rec[0] < rec[-1], "flat curve — calibration is vacuous"
    assert rec[-1] >= 0.9, "highest-similarity plants not recovered"
    jac = list(out.min_jaccard)
    assert all(a < b for a, b in zip(jac, jac[1:])), jac
    # per-level bands disjoint: max of level i below min of level i+1
    assert all(
        hi < lo
        for hi, lo in zip(list(out.max_jaccard)[:-1], list(out.min_jaccard)[1:])
    )


def test_hybrid_confirm_scores_every_lsh_candidate(spark):
    """Every banded-LSH candidate pair gets BOTH signals; the text
    signal must agree with dedup_near_minhash's verified pairs, and
    the flag algebra must be internally consistent."""
    out = QUERIES["dedup_hybrid_confirm"](spark, SF_DIR).toPandas()
    mh = QUERIES["dedup_near_minhash"](spark, SF_DIR).toPandas()
    assert len(out) >= len(mh)
    text_pairs = set(
        map(tuple, out[out.text_dup == 1][["doc_a", "doc_b"]]
            .itertuples(index=False))
    )
    mh_pairs = set(
        map(tuple, mh[["doc_a", "doc_b"]].itertuples(index=False))
    )
    assert text_pairs == mh_pairs
    assert (out.both_confirm == (out.text_dup & out.emb_dup)).all()
    assert out.jaccard.between(0, 1).all()
    assert out.cosine.between(-1, 1).all()


def test_bpe_survives_word_collapsing_to_single_symbol(spark):
    """Regression: when a selected merge spans an entire 2-char word
    (corpus 'ab ab ab abc abd' → merge (a,b) collapses word 'ab' to
    ONE symbol), the next iteration's pair extraction must not index
    past the 1-element symbol array — under ANSI mode the unguarded
    sequence(1, 0) descending + syms[1] aborted the job."""
    from clj_kinesis_to_firehose_spark.operators.curation_r11 import (
        _bpe_merge_steps,
    )

    docs = spark.createDataFrame(
        [("ab ab ab abc abd",)], "text string"
    )
    steps = _bpe_merge_steps(spark, SF_DIR, docs=docs)
    rows = [s.collect() for s in steps]
    # iteration 1 must select (a, b); later iterations must complete
    # (possibly empty once no non-self pair remains) without erroring
    assert rows[0][0].left_sym == "a" and rows[0][0].right_sym == "b"
    assert len(rows) == 3


def test_dim_stats_canary_is_the_only_dead_dim(spark):
    """The appended constant dimension (pos 65) must be flagged dead —
    and be the ONLY dead one: a healthy fixture with a planted
    positive control, so the detection path is non-vacuous."""
    out = QUERIES["embedding_dim_stats"](spark, SF_DIR).toPandas()
    assert len(out) == 65
    dead = out[out.is_dead == 1]
    assert list(dead.pos) == [65]
    canary = dead.iloc[0]
    assert canary.std_x == 0 and canary.min_x == 0 and canary.max_x == 0
    assert (out[out.pos < 65].std_x > 0.05).all()


def test_dup_rate_by_source_consistent_with_pairs(spark):
    """Per-source dup-doc counts must equal a recompute from the
    verified pair list, and total docs must cover the corpus."""
    out = QUERIES["corpus_dup_rate_by_source"](spark, SF_DIR).toPandas()
    pairs = QUERIES["dedup_near_minhash"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    dup_ids = set(pairs.doc_a) | set(pairs.doc_b)
    expect = (
        docs.assign(is_dup=docs.doc_id.isin(dup_ids).astype(int))
        .groupby("source")
        .agg(n_docs=("doc_id", "size"), n_dup_docs=("is_dup", "sum"))
    )
    got = out.set_index("source").sort_index()
    assert got.n_docs.equals(expect.sort_index().n_docs)
    assert got.n_dup_docs.equals(expect.sort_index().n_dup_docs)
    assert out.n_docs.sum() == len(docs)
    assert out.n_dup_docs.sum() == len(dup_ids)


def test_oov_monitor_batches_tile_the_corpus(spark):
    """The four batch rows must partition the corpus (docs and tokens
    sum to the batch operator's totals) and each batch's oov_rate must
    reproduce from its own counts."""
    out = (
        QUERIES["stream_oov_monitor"](spark, SF_DIR)
        .toPandas()
        .sort_values("batch_id")
    )
    per_doc = QUERIES["vocab_oov_rate"](spark, SF_DIR).toPandas()
    assert list(out.batch_id) == [1, 2, 3, 4]
    assert out.n_docs.sum() == len(per_doc)
    assert out.n_tokens.sum() == per_doc.n_tokens.sum()
    assert out.n_oov.sum() == per_doc.n_oov.sum()
    assert (
        out.oov_rate == (out.n_oov / out.n_tokens).round(6)
    ).all()


def test_novelty_declines_with_arrival_order(spark):
    """Every doc's novel grams are a subset of its grams; the corpus-
    level novelty must DECLINE with arrival order (the curve is the
    point), and summed novel grams must equal the distinct gram
    vocabulary."""
    out = (
        QUERIES["text_ngram_novelty"](spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out.n_novel <= out.n_grams).all()
    assert out.iloc[0].novelty_rate == 1.0, "first doc must be all-novel"
    first, last = out.head(50).novelty_rate.mean(), out.tail(
        50
    ).novelty_rate.mean()
    assert first > last + 0.2, (first, last)
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    vocab = set()
    for r in docs.sort_values("doc_id").itertuples():
        t = r.text.split(" ")
        vocab |= {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
    assert out.n_novel.sum() == len(vocab)


def test_train_manifest_is_the_admitted_set(spark):
    """Manifest rows = exactly the admitted docs; split matches the
    group-holdout rule doc for doc; shards are stateless doc-hash."""
    man = QUERIES["corpus_train_manifest"](spark, SF_DIR).toPandas()
    adm = QUERIES["corpus_admission_decision"](spark, SF_DIR).toPandas()
    split = QUERIES["split_group_holdout"](spark, SF_DIR).toPandas()
    admitted = set(adm[adm.admitted == 1].doc_id)
    assert set(man.doc_id) == admitted
    merged = man.merge(split, on="doc_id", suffixes=("_m", "_s"))
    assert (merged.split_m == merged.split_s).all()
    assert man.shard_id.between(0, 7).all()
    assert man.shard_id.nunique() == 8
    import hashlib

    for r in man.sample(n=30, random_state=5).itertuples():
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16)
        assert r.shard_id == h % 8


def test_replace_scan_semantics_fuzz_duckdb_vs_python():
    """Property fuzz (no JVM needed): DuckDB's REPLACE must agree with
    Python str.replace on arbitrary '|'-joined symbol strings and
    merge patterns — the portability assumption under the BPE apply
    step (the Spark side is pinned separately by the crafted-case
    engine test)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()
    sym = st.sampled_from(["a", "b", "c", "ab", "ba", "abc"])

    @settings(max_examples=300, deadline=None)
    @given(
        syms=st.lists(sym, min_size=0, max_size=12),
        left=sym,
        right=sym,
    )
    def check(syms, left, right):
        s = "|" + "|".join(syms) + "|" if syms else "||"
        pat, sub = f"|{left}|{right}|", f"|{left}{right}|"
        du = con.execute(
            "SELECT REPLACE(REPLACE(?,?,?),?,?)", [s, pat, sub, pat, sub]
        ).fetchone()[0]
        py = s.replace(pat, sub).replace(pat, sub)
        assert du == py, (s, pat, du, py)

    check()


def test_orc_scan_supports_pushdown_and_pruning(spark):
    """The ORC path must get the same Catalyst treatment as parquet:
    a filtered 2-column projection over the roundtrip output shows
    pushed filters and a pruned read schema."""
    from clj_kinesis_to_firehose_spark.sources import scratch_dir

    docs_path = scratch_dir("kf_orc_audit_")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    spark.createDataFrame(docs).write.mode("overwrite").orc(docs_path)
    df = (
        spark.read.orc(docs_path)
        .filter("n_chars > 300")
        .select("doc_id", "lang")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "n_chars" in plan, plan[:1500]
    assert "text" not in plan.split("ReadSchema")[1][:200], plan[:1500]
    got = df.toPandas()
    expect = docs[docs.n_chars > 300]
    assert len(got) == len(expect)


def test_path_topk_matches_pandas_replay(spark):
    """Full pandas replay of the 3-gram path counting over (ts,
    event_id)-ordered user timelines."""
    out = (
        QUERIES["event_path_topk"](spark, SF_DIR)
        .toPandas()
        .sort_values("path_rank")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    paths = collections.Counter()
    for _, grp in ev.groupby("user_id"):
        t = list(grp.event_type)
        for i in range(len(t) - 2):
            paths[f"{t[i]}>{t[i + 1]}>{t[i + 2]}"] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.path, r.n_paths) for r in out.itertuples()]
    assert got == expect


def test_linear_attribution_conserves_value(spark):
    """Conservation law: total attributed value across channels equals
    the total purchase value (each purchase's credit splits exactly,
    up to the per-credit 4-dp rounding x n_credits bound); organic
    appears and every credited purchase fans out to at most K rows."""
    from clj_kinesis_to_firehose_spark.operators.curation_r11 import (
        ATTR_LOOKBACK_K,
    )

    out = QUERIES["attribution_linear_multi_touch"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    purchases = ev[ev.event_type == "purchase"]
    total = purchases.value.sum()
    attributed = out.attributed_value.sum()
    # per-credit FLOOR truncates at most 1e-4 each
    tol = 0.0001 * out.n_credits.sum()
    assert total - tol <= attributed <= total + 1e-6, (
        attributed,
        total,
        tol,
    )
    assert (out.attributed_value == out.attributed_value_u / 10000).all()
    assert "organic" in set(out.channel)
    n_credited = out[out.channel != "organic"].n_credits.sum()
    assert n_credited <= len(purchases) * ATTR_LOOKBACK_K
    last = QUERIES["attribution_last_touch"](spark, SF_DIR).toPandas()
    # last-touch channels are a SUBSET of linear's (a channel can earn
    # linear credit without ever being the final touch, not vice versa)
    assert set(last.touch_channel) <= set(out.channel)


def test_image_phash_buckets_are_visual_clusters(spark):
    """The hash must come from real decoded pixels: recompute one
    doc's hash from the raw codec path and match; bucket structure
    must be non-degenerate (real collisions, not all-unique or
    all-same); n_bits_set must equal the popcount of phash."""
    out = QUERIES["multimodal_image_phash"](spark, SF_DIR).toPandas()
    assert len(out) == 500
    # popcount over the UNSIGNED 64-bit view: phash is int64 two's
    # complement (bit 63 = sign), bin() of a negative is sign-magnitude
    assert (
        out.n_bits_set
        == out.phash.map(lambda p: bin(int(p) & (2**64 - 1)).count("1"))
    ).all()
    n_buckets = out.phash.nunique()
    assert 1 < n_buckets < len(out), n_buckets
    from clj_kinesis_to_firehose_spark.functions.imaging import (
        decode_image,
        encode_bmp,
        encode_ppm,
        pixel_array,
    )

    from clj_kinesis_to_firehose_spark.operators.curation_r11 import (
        AHASH_DIM,
    )

    n = AHASH_DIM * AHASH_DIM
    for d in [0, 1, 7, 42]:
        data = (
            encode_bmp(pixel_array(d))
            if d % 2 == 0
            else encode_ppm(pixel_array(d))
        )
        arr = decode_image(data)
        h, w = arr.shape[:2]
        s = arr.sum(axis=2).astype("int64")
        samples = [
            int(s[(oy * h) // AHASH_DIM][(ox * w) // AHASH_DIM])
            for oy in range(AHASH_DIM)
            for ox in range(AHASH_DIM)
        ]
        total = sum(samples)
        ph = sum((1 << k) for k, v in enumerate(samples) if v * n > total)
        if ph >= 1 << 63:
            ph -= 1 << 64
        assert out.set_index("doc_id").loc[d].phash == ph


def test_phash_pairs_tile_the_collision_buckets(spark):
    """Pair count must equal sum over buckets of C(size, 2), and every
    pair must share its bucket's hash."""
    ph = QUERIES["multimodal_image_phash"](spark, SF_DIR).toPandas()
    pairs = QUERIES["multimodal_phash_dup_pairs"](spark, SF_DIR).toPandas()
    sizes = ph.groupby("phash").size()
    expect = int((sizes * (sizes - 1) // 2).sum())
    assert len(pairs) == expect
    lookup = ph.set_index("doc_id").phash
    assert (pairs.phash.values == lookup.loc[pairs.doc_a].values).all()
    assert (pairs.phash.values == lookup.loc[pairs.doc_b].values).all()
    assert (pairs.doc_a < pairs.doc_b).all()
