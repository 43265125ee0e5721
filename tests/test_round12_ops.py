"""Round-12 operator behavioral tests: planted near-dup image recovery
through the hamming band path, brute-force completeness of the banded
pair generation, poison-batch survival on the dead-letter decode
kernel, scaled-vs-exact BPE agreement and monotone merge counts, the
ANN calibration grid's structural recall laws, and the watermark
audit's drop localization."""

from __future__ import annotations

import pandas as pd

from clj_kinesis_to_firehose_spark import registry
from clj_kinesis_to_firehose_spark.operators.curation_r11 import (
    AHASH_DIM,
    _phash_batches,
)
from clj_kinesis_to_firehose_spark.operators.curation_r12 import (
    ANN_CAL_LEVELS,
    ANN_CAL_TABLE_BUDGETS,
    BPE_SCALED_MERGES,
    DEAD_LETTER_MOD,
    PHASH_HAMMING_D,
    WM_AUDIT_LATE_ROWS,
    _decode_dead_letter_batches,
    _phash_banded,
)
from clj_kinesis_to_firehose_spark.operators.llm_dedup import band_candidates
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def _popcount64(v: int) -> int:
    return bin(int(v) & (2**64 - 1)).count("1")


def test_phash_hamming_pairs_complete_vs_brute_force(spark):
    """The banded candidate generation must be COMPLETE at d <=
    PHASH_HAMMING_D (pigeonhole over 4x16-bit bands): the op's output
    must equal the brute-force all-pairs hamming filter over the
    corpus hashes, exactly."""
    ph = (
        QUERIES["multimodal_image_phash"](spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
    )
    out = QUERIES["multimodal_phash_hamming_pairs"](spark, SF_DIR).toPandas()
    hashes = list(zip(ph.doc_id, ph.phash))
    expect = set()
    for i, (da, pa) in enumerate(hashes):
        for db, pb in hashes[i + 1:]:
            d = _popcount64(int(pa) ^ int(pb))
            if d <= PHASH_HAMMING_D:
                expect.add((min(da, db), max(da, db), d))
    got = set(zip(out.doc_a, out.doc_b, out.hamming))
    assert got == expect
    assert len(got) > 0  # non-vacuous at sf0.01
    # the equality-bucket op is exactly the hamming-0 slice
    eq_pairs = QUERIES["multimodal_phash_dup_pairs"](spark, SF_DIR).toPandas()
    assert set(zip(eq_pairs.doc_a, eq_pairs.doc_b)) == {
        (a, b) for a, b, d in got if d == 0
    }


def test_phash_hamming_recovers_planted_near_dup_image(spark):
    """A one-pixel perturbation of a real encoded image must land
    within the hamming tolerance of its original and be recovered by
    the SAME band join the production op uses. The planted pair is
    re-verified to survive its own filters (hamming actually <= d),
    so the recovery assertion cannot go vacuous."""
    import numpy as np

    from clj_kinesis_to_firehose_spark.functions.imaging import (
        encode_ppm,
        pixel_array,
    )

    base = pixel_array(3)  # 7 x 14 — big enough that one pixel is < a cell
    tweaked = base.copy()
    tweaked[0, 0] = (tweaked[0, 0].astype(int) + 8).astype(np.uint8) % 256
    rows = [
        (1, encode_ppm(base)),
        (2, encode_ppm(tweaked)),
        (3, encode_ppm(pixel_array(200))),  # unrelated image
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    ph = media.mapInPandas(
        _phash_batches,
        schema=(
            "doc_id long, width int, height int, phash long, n_bits_set long"
        ),
    )
    hp = {r["doc_id"]: r["phash"] for r in ph.collect()}
    planted_d = _popcount64(int(hp[1]) ^ int(hp[2]))
    assert 0 <= planted_d <= PHASH_HAMMING_D, planted_d
    cand = band_candidates(_phash_banded(ph.select("doc_id", "phash")))
    pairs = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert (1, 2) in pairs


def test_dead_letter_kernel_isolates_poison_within_a_batch():
    """Good rows must decode normally even when corrupt payloads sit
    in the SAME Arrow batch — and each corruption class must map to
    its stable reason code."""
    from clj_kinesis_to_firehose_spark.functions.imaging import (
        encode_bmp,
        encode_ppm,
        pixel_array,
    )

    good_b = encode_bmp(pixel_array(4))
    good_p = encode_ppm(pixel_array(5))
    batch = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3, 4], dtype="int64"),
            "payload": pd.Series(
                [good_b, b"XX" + good_b[2:], good_p[:4], good_p],
                dtype="object",
            ),
        }
    )
    (out,) = list(_decode_dead_letter_batches([batch]))
    by_id = out.set_index("doc_id")
    assert by_id.loc[1, "status"] == "ok"
    assert (by_id.loc[1, "width"], by_id.loc[1, "height"]) == (
        pixel_array(4).shape[1],
        pixel_array(4).shape[0],
    )
    assert by_id.loc[2, "status"] == "dead"
    assert by_id.loc[2, "reason"] == "bad_magic"
    assert by_id.loc[3, "status"] == "dead"
    assert by_id.loc[3, "reason"] == "decode_error"
    assert by_id.loc[4, "status"] == "ok"


def test_dead_letter_op_routes_exactly_the_poison_schedule(spark):
    out = QUERIES["multimodal_decode_dead_letter"](spark, SF_DIR).toPandas()
    dead = out[out.status == "dead"]
    assert set(dead.doc_id) == {
        d for d in out.doc_id if d % DEAD_LETTER_MOD == 0
    }
    assert dead.width.isna().all() and dead.height.isna().all()
    ok = out[out.status == "ok"]
    assert ok.reason.isna().all()
    assert (ok.width >= 4).all() and (ok.height >= 4).all()


def test_bpe_scaled_extends_the_exact_twin(spark):
    """The checkpointed driver loop must reproduce the N=3 exact
    learner's merges as its prefix (same selection rule), produce the
    full budget, and obey BPE's monotone law: the winning pair count
    never increases from one merge to the next."""
    scaled = (
        QUERIES["bpe_learn_merges_scaled"](spark, SF_DIR)
        .toPandas()
        .sort_values("merge_rank")
    )
    exact = (
        QUERIES["bpe_learn_merges"](spark, SF_DIR)
        .toPandas()
        .sort_values("merge_rank")
    )
    assert len(scaled) == BPE_SCALED_MERGES
    head = scaled.head(len(exact)).reset_index(drop=True)
    pd.testing.assert_frame_equal(head, exact.reset_index(drop=True))
    counts = list(scaled.pair_count)
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert (scaled.left_sym != scaled.right_sym).all()
    assert not scaled.left_sym.str.contains("|", regex=False).any()
    assert not scaled.right_sym.str.contains("|", regex=False).any()


def test_bpe_scaled_delta_matches_reaggregating_reference(spark):
    """r16: the scaled loop maintains its pair counts by DELTA (one
    single-stage statement per iteration folded in the driver) instead
    of re-aggregating the dictionary. This pins the invariant that
    rewrite rests on: a reference loop that re-aggregates the full
    dictionary with the shared _bpe_top_pair rule every step must
    produce the identical (merge_rank, left, right, pair_count)
    sequence — counts included, since the delta-maintained table must
    equal the full aggregation term for term for selection to agree."""
    from pyspark.sql import functions as F

    from clj_kinesis_to_firehose_spark.operators.curation_r11 import (
        _bpe_len2_dictionary,
        _bpe_top_pair,
    )

    n_ref = 16  # enough to cross one checkpoint + pending-chain cycle
    out = (
        QUERIES["bpe_learn_merges_scaled"](spark, SF_DIR)
        .toPandas()
        .sort_values("merge_rank")
        .head(n_ref)
        .reset_index(drop=True)
    )
    w = _bpe_len2_dictionary(spark, SF_DIR).localCheckpoint(eager=True)
    ref = []
    for k in range(1, n_ref + 1):
        top = _bpe_top_pair(w).collect()
        if not top:
            break
        row = top[0]
        ref.append(
            (k, row["left_sym"], row["right_sym"], int(row["pair_count"]))
        )
        pat = f"|{row['left_sym']}|{row['right_sym']}|"
        sub = f"|{row['left_sym']}{row['right_sym']}|"
        w = w.select(
            F.replace(
                F.replace("rep", F.lit(pat), F.lit(sub)),
                F.lit(pat),
                F.lit(sub),
            ).alias("rep"),
            "freq",
        )
    got = list(
        out[["merge_rank", "left_sym", "right_sym", "pair_count"]].itertuples(
            index=False, name=None
        )
    )
    assert [(int(a), b, c, int(d)) for a, b, c, d in got] == ref


def test_ann_calibration_recall_laws(spark):
    """Structural guarantees of the recall grid: the full ladder x
    budget grid is present; recall is monotone non-decreasing in the
    table budget for every level (a prefix budget can only add
    collisions); the easiest cell (cos .99, 8 tables) is near-exact;
    and the grid discriminates (hardest cell strictly below easiest)."""
    out = QUERIES["sim_ann_calibration"](spark, SF_DIR).toPandas()
    grid = out.set_index(["level", "n_tables"]).recall_u4
    assert len(out) == len(ANN_CAL_LEVELS) * len(ANN_CAL_TABLE_BUDGETS)
    for lvl in ANN_CAL_LEVELS:
        seq = [grid[(lvl, b)] for b in sorted(ANN_CAL_TABLE_BUDGETS)]
        assert all(a <= b for a, b in zip(seq, seq[1:])), (lvl, seq)
    assert grid[(max(ANN_CAL_LEVELS), 8)] >= 9000
    assert grid[(min(ANN_CAL_LEVELS), 1)] < grid[(max(ANN_CAL_LEVELS), 8)]
    assert (out.n_planted == out.n_planted.iloc[0]).all()


def test_signature_int_udf_matches_production_kernel(spark):
    """The integer-domain signature twin must be BIT-EQUAL to the
    production float kernel on real embeddings — the parity claim the
    r15 exact calibration grid rests on (its planted variants can only
    be signed through the integer path)."""
    from pyspark.sql import functions as F

    from clj_kinesis_to_firehose_spark.operators.llm_similarity import (
        _signature_int_udf,
        _signature_udf,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(1000000)).cast("long"),
        ).alias("eq"),
    )
    both = emb.select(
        "vec_id",
        _signature_udf()(F.col("e")).alias("sf"),
        _signature_int_udf()(F.col("eq")).alias("si"),
    )
    assert both.filter(F.col("sf") != F.col("si")).count() == 0


def test_watermark_audit_localizes_drops_to_the_late_batch(spark):
    """Drops must appear ONLY in the late-replay batch: the four
    time-ordered slices and the sentinel never lose a row, the late
    batch's input size is the replayed row count, and its drop count
    is positive (state-row units — post-partial-aggregation)."""
    out = (
        QUERIES["stream_watermark_audit"](spark, SF_DIR)
        .toPandas()
        .sort_values("batch_id")
        .reset_index(drop=True)
    )
    assert list(out.batch_id) == [0, 1, 2, 3, 4, 5]
    assert (out.loc[:3, "state_rows_dropped_late"] == 0).all()
    assert out.loc[4, "rows_in"] == WM_AUDIT_LATE_ROWS
    assert out.loc[4, "state_rows_dropped_late"] > 0
    assert out.loc[5, "rows_in"] == 1
    assert out.loc[5, "state_rows_dropped_late"] == 0
    assert out.rows_in.sum() == out.loc[:3, "rows_in"].sum() + WM_AUDIT_LATE_ROWS + 1


def test_quality_histogram_units_are_exact_integers(spark, oracle_con):
    """The r12 contract change (r11 ADVICE): the decile comparator and
    the emitted min/max are integer 1e-8 ratio units — no doubles
    anywhere, so no cross-engine ROUND channel. Recompute one decile
    boundary in pandas integer math."""
    out = QUERIES["corpus_quality_histogram"](spark, SF_DIR).toPandas()
    assert str(out.min_ratio_u8.dtype) in ("int64", "Int64")
    assert (out.min_ratio_u8 <= out.max_ratio_u8).all()
    docs = oracle_con.execute(
        "SELECT doc_id, text FROM documents"
    ).fetchdf()
    toks = docs.text.str.split(" ")
    ratio = (
        toks.map(lambda t: len(set(t))) * 100000000 // toks.map(len)
    )
    assert out.n_docs.sum() == len(docs)
    assert out.min_ratio_u8.min() == ratio.min()
    assert out.max_ratio_u8.max() == ratio.max()


def test_lsh_calibration_guard_trips_on_id_overlap(spark):
    """The id-space guard must fail LOUDLY when a corpus doc_id
    reaches the planted-variant id space (r11 ADVICE: a silent overlap
    corrupts the recall curve). Feed the aug builder a doctored corpus
    through the same code path via a temp view swap is invasive;
    instead assert the guard expression itself is wired: the planted
    relation's plan contains the assert."""
    from clj_kinesis_to_firehose_spark.operators.curation_r11 import (
        _lsh_cal_aug,
    )

    _, _, planted = _lsh_cal_aug(spark, SF_DIR)
    plan = planted._jdf.queryExecution().analyzed().toString()
    assert "assert_true" in plan
    # and on the healthy fixture it evaluates clean
    assert planted.limit(1).count() == 1


def test_multiprobe_pairs_complete_at_radius_seven(spark):
    """Multi-probe candidates must equal the brute-force all-pairs
    hamming filter at d <= 7 (pigeonhole with 1-bit probes), and must
    contain the plain band join's d <= 3 output as a subset."""
    from clj_kinesis_to_firehose_spark.operators.curation_r12 import (
        PHASH_MULTIPROBE_D,
    )

    ph = QUERIES["multimodal_image_phash"](spark, SF_DIR).toPandas()
    out = QUERIES["multimodal_phash_multiprobe_pairs"](spark, SF_DIR).toPandas()
    hashes = list(zip(ph.doc_id, ph.phash))
    expect = set()
    for i, (da, pa) in enumerate(hashes):
        for db, pb in hashes[i + 1:]:
            d = _popcount64(int(pa) ^ int(pb))
            if d <= PHASH_MULTIPROBE_D:
                expect.add((min(da, db), max(da, db), d))
    got = set(zip(out.doc_a, out.doc_b, out.hamming))
    assert got == expect
    narrow = QUERIES["multimodal_phash_hamming_pairs"](spark, SF_DIR).toPandas()
    assert set(zip(narrow.doc_a, narrow.doc_b, narrow.hamming)) <= got


def test_dim_truncation_recall_laws(spark):
    """Structural laws of the truncation grid: the full dimension is
    self-recall 1.0 for every probe; every cell is a valid fraction of
    TOP_K; and the widest proper prefix (32 of 64 dims) beats the
    narrowest (8) on mean recall. Per-probe monotonicity in width is
    deliberately NOT asserted — with untrained random embeddings a
    wider prefix can evict a narrow prefix's lucky hit (observed on
    the fixture: probe 0 scores 0.2 at dim 8 and 0.0 at dim 16), and
    surfacing that non-monotonicity is exactly what the eval is FOR."""
    out = QUERIES["sim_dim_truncation_eval"](spark, SF_DIR).toPandas()
    dims = sorted(out.dim.unique())
    assert dims[-1] == 64
    full = out[out.dim == 64]
    assert (full.recall == 1.0).all()
    assert out.recall.between(0.0, 1.0).all()
    assert (out.n_hits <= 5).all()
    by_dim = out.groupby("dim").recall.mean()
    assert by_dim[32] > by_dim[8]
    assert by_dim[8] < 1.0


def test_csv_corrupt_records_account_for_every_line(spark, oracle_con):
    from clj_kinesis_to_firehose_spark.operators.curation_r12 import (
        CSV_CORRUPT_MOD,
    )

    row = QUERIES["scan_csv_corrupt_records"](spark, SF_DIR).collect()[0]
    n, n_corrupt = oracle_con.execute(
        f"SELECT COUNT(*), SUM(CASE WHEN o_orderkey % {CSV_CORRUPT_MOD} = 0"
        "  THEN 1 ELSE 0 END) FROM orders"
    ).fetchone()
    assert row["n_rows"] == n
    assert row["n_corrupt"] == n_corrupt > 0
    assert row["n_good"] + row["n_corrupt"] == row["n_rows"]


def test_partition_completeness_accounts_for_the_full_spine(spark):
    out = QUERIES["dq_partition_completeness"](spark, SF_DIR).toPandas()
    assert (out.n_expected == out.n_present + out.n_missing).all()
    assert out.n_missing.sum() > 0  # non-vacuous at fixture density
    assert (out.n_present > 0).all()  # no fully-dark day in the fixture


def test_k_anonymity_profile_is_non_vacuous(spark, oracle_con):
    from clj_kinesis_to_firehose_spark.operators.curation_r12 import (
        K_ANON_THRESHOLD,
    )

    out = QUERIES["dq_k_anonymity"](spark, SF_DIR).toPandas()
    assert (out.n_risky_groups > 0).all()  # hour-grain quasi-ids leak
    assert (out.min_group_size >= 1).all()
    assert (out.min_group_size < K_ANON_THRESHOLD).all()
    n_groups = oracle_con.execute(
        "SELECT COUNT(*) FROM (SELECT event_type, CAST(ts AS DATE),"
        " EXTRACT(HOUR FROM ts) FROM events GROUP BY 1, 2, 3)"
    ).fetchone()[0]
    assert out.n_groups.sum() == n_groups


def test_audio_fingerprint_from_real_codec_path(spark):
    """Recompute one doc's fingerprint straight from the codec: encode
    the deterministic waveform, decode it, window the energies, and
    match the operator's bit pattern; popcount must agree with the
    unsigned 64-bit view."""
    import numpy as np

    from clj_kinesis_to_firehose_spark.functions.audio import (
        decode_wav,
        encode_wav,
        sample_array,
        sample_rate,
    )
    from clj_kinesis_to_firehose_spark.operators.curation_r12 import (
        AFP_WINDOWS,
    )

    out = QUERIES["multimodal_audio_fingerprint"](spark, SF_DIR).toPandas()
    assert len(out) == 500
    assert (
        out.n_bits_set
        == out.fingerprint.map(lambda v: _popcount64(v))
    ).all()
    assert 1 < out.fingerprint.nunique() <= len(out)
    for d in [0, 1, 7, 42]:
        samples, _ = decode_wav(encode_wav(sample_array(d), sample_rate(d)))
        n = len(samples)
        s = samples.astype(np.int64)
        e = np.zeros(AFP_WINDOWS, dtype=np.int64)
        np.add.at(e, (np.arange(n) * AFP_WINDOWS) // n, s * s)
        te = int(e.sum())
        fp = sum(
            (1 << k) for k in range(AFP_WINDOWS) if int(e[k]) * AFP_WINDOWS > te
        )
        if fp >= 1 << 63:
            fp -= 1 << 64
        assert out.set_index("doc_id").loc[d].fingerprint == fp


def test_audio_hamming_pairs_complete_vs_brute_force(spark):
    afp = QUERIES["multimodal_audio_fingerprint"](spark, SF_DIR).toPandas()
    out = QUERIES["multimodal_audio_hamming_pairs"](spark, SF_DIR).toPandas()
    fps = list(zip(afp.doc_id, afp.fingerprint))
    expect = set()
    for i, (da, fa) in enumerate(fps):
        for db, fb in fps[i + 1:]:
            d = _popcount64(int(fa) ^ int(fb))
            if d <= PHASH_HAMMING_D:
                expect.add((min(da, db), max(da, db), d))
    assert set(zip(out.doc_a, out.doc_b, out.hamming)) == expect
    assert len(expect) > 0


def test_incremental_phash_matches_brute_force_triage(spark):
    """The banded incremental triage must equal a brute-force pandas
    recount of near-dups vs index and within batch, and its novelty
    flag must be the conjunction of both zero-counts."""
    from clj_kinesis_to_firehose_spark.operators.curation_r12 import (
        PHASH_BATCH_SPLIT,
    )

    ph = QUERIES["multimodal_image_phash"](spark, SF_DIR).toPandas()
    out = (
        QUERIES["dedup_incremental_phash"](spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    idx = ph[ph.doc_id < PHASH_BATCH_SPLIT]
    batch = ph[ph.doc_id >= PHASH_BATCH_SPLIT]
    assert set(out.index) == set(batch.doc_id)
    for _, row in batch.iterrows():
        vs_idx = sum(
            _popcount64(int(row.phash) ^ int(h)) <= PHASH_HAMMING_D
            for h in idx.phash
        )
        vs_batch = sum(
            _popcount64(int(row.phash) ^ int(h)) <= PHASH_HAMMING_D
            for d, h in zip(batch.doc_id, batch.phash)
            if d != row.doc_id
        )
        got = out.loc[row.doc_id]
        assert got.n_dup_vs_index == vs_idx
        assert got.n_dup_in_batch == vs_batch
        assert got.is_novel == int(vs_idx == 0 and vs_batch == 0)
    assert (out.is_novel == 0).any() and (out.is_novel == 1).any()


def test_state_audit_proves_bounded_state(spark):
    """The state-growth audit's structural laws: state never exceeds
    the live-window bound (it stays ~flat across the steady batches
    rather than accumulating), the sentinel batch collapses state to
    the sentinel's own group, and the final no-data flush batch ends
    with eviction having fired (removed > 0) while nothing was
    updated."""
    out = (
        QUERIES["stream_state_audit"](spark, SF_DIR)
        .toPandas()
        .sort_values("batch_id")
        .reset_index(drop=True)
    )
    assert list(out.batch_id) == [0, 1, 2, 3, 4, 5]
    steady = out.loc[1:3, "state_rows"]
    assert (steady <= out.loc[0, "state_rows"] * 1.1).all()  # bounded
    assert out.loc[4, "state_rows"] < out.loc[3, "state_rows"] / 10
    final = out.loc[5]
    assert final.rows_in == 0 and final.state_rows_updated == 0
    assert final.state_rows_removed > 0
    # conservation: state = cumulative-new − cumulative-removed holds
    # batch over batch (new = updated − carryover is not directly
    # observable, but state delta must equal updated-new minus removed,
    # bounded by updated)
    delta = out.state_rows.diff().fillna(out.state_rows)
    assert (delta <= out.state_rows_updated - 0).all()


def test_stream_phash_ingest_matches_batch_triage_semantics(spark):
    """The streaming index ingest's arrival-order semantics: batch 1
    is all-novel (empty index), later batches see monotonically
    non-decreasing cumulative hit pressure, and every document appears
    exactly once with its NTILE batch assignment."""
    out = (
        QUERIES["stream_phash_index_ingest"](spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 500
    assert out.doc_id.is_unique
    assert set(out.batch_id) == {1, 2, 3, 4}
    b1 = out[out.batch_id == 1]
    assert (b1.n_dup_vs_prior == 0).all() and (b1.novel == 1).all()
    later = out[out.batch_id > 1]
    assert (later.n_dup_vs_prior > 0).any()  # the index is being hit
    assert ((out.n_dup_vs_prior == 0) == (out.novel == 1)).all()


def test_video_framehash_from_real_codec_path(spark):
    """Recompute one clip's frame hashes straight from the codec and
    match the operator; per-doc frame counts must equal the clip
    shape; popcount must agree with the unsigned view."""
    from clj_kinesis_to_firehose_spark.functions.video import (
        clip_shape,
        decode_y4m,
        encode_y4m,
    )
    from clj_kinesis_to_firehose_spark.operators.curation_r12 import (
        VFH_DIM,
    )

    out = QUERIES["multimodal_video_framehash"](spark, SF_DIR).toPandas()
    assert (
        out.n_bits_set == out.fhash.map(lambda v: _popcount64(v))
    ).all()
    per_doc = out.groupby("doc_id").frame_idx.count()
    for d in [0, 1, 7, 42]:
        assert per_doc[d] == clip_shape(d)[0]
        frames, w, h = decode_y4m(encode_y4m(d))
        n = VFH_DIM * VFH_DIM
        for f, planes in enumerate(frames):
            yp = planes[0].astype("int64")
            samples = [
                int(yp[(oy * h) // VFH_DIM][(ox * w) // VFH_DIM])
                for oy in range(VFH_DIM)
                for ox in range(VFH_DIM)
            ]
            total = sum(samples)
            fh = sum(
                (1 << k) for k, v in enumerate(samples) if v * n > total
            )
            if fh >= 1 << 63:
                fh -= 1 << 64
            got = out[(out.doc_id == d) & (out.frame_idx == f)]
            assert got.fhash.iloc[0] == fh


def test_video_dup_pairs_match_pandas_recount(spark):
    from clj_kinesis_to_firehose_spark.operators.curation_r12 import (
        VIDEO_SHARED_MIN,
    )

    fhs = QUERIES["multimodal_video_framehash"](spark, SF_DIR).toPandas()
    out = QUERIES["multimodal_video_dup_pairs"](spark, SF_DIR).toPandas()
    by_doc = fhs.groupby("doc_id").fhash.apply(set)
    docs = sorted(by_doc.index)
    expect = {}
    import collections
    inv = collections.defaultdict(set)
    for d, hs in by_doc.items():
        for h in hs:
            inv[h].add(d)
    cand = set()
    for h, ds in inv.items():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                cand.add((a, b))
    for a, b in cand:
        shared = len(by_doc[a] & by_doc[b])
        if shared >= VIDEO_SHARED_MIN:
            expect[(a, b)] = shared
    got = {(r.doc_a, r.doc_b): r.n_shared_frames for r in out.itertuples()}
    assert got == expect
    assert len(got) > 0


def test_multimodal_rollup_is_the_union_of_its_inputs(spark):
    """The rollup must contain exactly the union of the four modality
    pair relations, with flags matching membership and n_modalities
    equal to the flag sum."""
    out = QUERIES["dedup_multimodal_rollup"](spark, SF_DIR).toPandas()
    parts = {
        "text_dup": QUERIES["dedup_near_minhash"],
        "image_dup": QUERIES["multimodal_phash_hamming_pairs"],
        "audio_dup": QUERIES["multimodal_audio_hamming_pairs"],
        "video_dup": QUERIES["multimodal_video_dup_pairs"],
    }
    sets = {
        col: set(
            map(tuple, fn(spark, SF_DIR).toPandas()[["doc_a", "doc_b"]].values)
        )
        for col, fn in parts.items()
    }
    union = set().union(*sets.values())
    assert set(map(tuple, out[["doc_a", "doc_b"]].values)) == union
    for r in out.itertuples():
        pair = (r.doc_a, r.doc_b)
        for col in parts:
            assert getattr(r, col) == int(pair in sets[col]), (pair, col)
        assert r.n_modalities == sum(
            int(pair in sets[col]) for col in parts
        )
    # the multi-signal tail exists (or the confirm principle is moot)
    assert (out.n_modalities >= 2).any()
