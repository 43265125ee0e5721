"""Round-13 operator tests: the adversarial-bucket guard in the shared
LSH candidate generator (template-flood boundedness + dead-letter
telemetry), and the band-bucket pre-flight stats op."""

from __future__ import annotations

from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark import registry
from clj_kinesis_to_firehose_spark.operators.llm_dedup import (
    BAND_BUCKET_CAP,
    _band_keys,
    _minhash_sigs,
    band_candidates,
    oversized_band_buckets,
)
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def _synthetic_banded(spark, flood_n: int, organic: list[int]):
    """A (doc_id, band, bucket) relation with one flood bucket of
    ``flood_n`` docs plus small organic buckets (doc ids continue
    after the flood)."""
    rows = [(i, 0, "flood") for i in range(flood_n)]
    nxt = flood_n
    for j, size in enumerate(organic):
        for _ in range(size):
            rows.append((nxt, 0, f"organic{j}"))
            nxt += 1
    return spark.createDataFrame(rows, "doc_id long, band int, bucket string")


def test_band_candidates_excludes_oversized_bucket(spark):
    """A bucket over the cap generates ZERO pairs; organic buckets are
    untouched — the guard bounds output cardinality, which AQE
    skew-split alone cannot (it spreads the join's work, not the
    Θ(bucket²) output)."""
    banded = _synthetic_banded(spark, BAND_BUCKET_CAP + 200, [3, 2])
    pairs = band_candidates(banded).collect()
    # organic only: C(3,2) + C(2,2) = 3 + 1
    assert len(pairs) == 4, pairs
    flood_ids = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    assert all(i >= BAND_BUCKET_CAP + 200 for i in flood_ids)


def test_band_candidates_cap_boundary_and_optout(spark):
    """A bucket exactly AT the cap still pairs (<= is admitted);
    max_bucket=None restores unguarded behavior."""
    at_cap = _synthetic_banded(spark, 0, [BAND_BUCKET_CAP])
    n = band_candidates(at_cap).count()
    assert n == BAND_BUCKET_CAP * (BAND_BUCKET_CAP - 1) // 2
    over = _synthetic_banded(spark, BAND_BUCKET_CAP + 1, [])
    assert band_candidates(over).count() == 0
    assert (
        band_candidates(over, max_bucket=None).count()
        == (BAND_BUCKET_CAP + 1) * BAND_BUCKET_CAP // 2
    )


def test_oversized_buckets_reported_as_dead_letter(spark):
    banded = _synthetic_banded(spark, BAND_BUCKET_CAP + 200, [3, 2])
    report = oversized_band_buckets(banded).collect()
    assert len(report) == 1
    assert report[0].bucket == "flood"
    assert report[0].n_docs == BAND_BUCKET_CAP + 200


def test_template_flood_end_to_end_bounded(spark):
    """The adversarial corpus the r12 verdict describes: docs identical
    except a per-doc serial token — exact dedup does NOT collapse them
    (texts differ), and most land in one minhash bucket per band.
    Through the production kernel the pair output must stay bounded
    and the flood must surface in the telemetry relation, with the job
    completing (no Θ(n²) blow-up)."""
    base = " ".join(f"tok{k}" for k in range(48))
    n = 2 * BAND_BUCKET_CAP  # ~78% share the dominant bucket per band
    docs = spark.createDataFrame(
        [(i, f"{base} serial{i}") for i in range(n)], "doc_id long, text string"
    )
    banded = _band_keys(_minhash_sigs(spark, docs))
    flood = oversized_band_buckets(banded)
    assert flood.count() >= 1, "flood bucket not detected"
    n_pairs = band_candidates(banded).count()
    # unguarded would be >= C(0.5*n, 2) ≈ 0.5M from the dominant
    # buckets alone; guarded output is only the sub-cap residue
    assert n_pairs < BAND_BUCKET_CAP * (BAND_BUCKET_CAP - 1) // 2, n_pairs


def test_band_bucket_stats_fixture_has_no_oversized(spark):
    """On the organic fixture the guard is invisible: zero oversized
    buckets in every band — the precondition for the exact oracles of
    every band_candidates consumer to remain guard-agnostic."""
    rows = QUERIES["dedup_band_bucket_stats"](spark, SF_DIR).collect()
    assert len(rows) == 4 and {r.band for r in rows} == {0, 1, 2, 3}
    assert all(r.n_oversized == 0 for r in rows), rows
    assert all(r.max_bucket_n <= BAND_BUCKET_CAP for r in rows), rows
    # pair cost the band join will pay is consistent with bucket sizes
    assert all(r.pair_cost >= 0 and r.n_buckets > 0 for r in rows)


def test_quality_filter_learns_the_label_rule(spark):
    """The fitted filter must beat 90% agreement with its weak label
    (the label is linearly representable in the token-count basis, so
    a converged fit recovers it), and the learned words-vs-token
    weight ratio must sit near the labeler's -QL_LABEL_PCT/100."""
    from clj_kinesis_to_firehose_spark.operators.quality_model import (
        QL_FEATURES,
        QL_LABEL_PCT,
    )

    conf = QUERIES["quality_linear_eval"](spark, SF_DIR).collect()
    n = sum(r.n_docs for r in conf)
    agree = sum(r.n_docs for r in conf if r.pred == r.label_weak)
    assert n == 500 and agree / n > 0.90, conf
    w = {r.feature: r.weight for r in
         QUERIES["quality_linear_fit"](spark, SF_DIR).collect()}
    assert set(w) == set(QL_FEATURES)
    tok_avg = sum(v for k, v in w.items() if k.startswith("tok_")) / 4
    # labeler margin ∝ Σ(100·c_j)·1 − PCT·words and the features
    # already carry the ×100, so the recovered -words/token ratio
    # should approximate PCT itself (perceptron, not LS → within 50%)
    ratio = -w["words"] / tok_avg
    assert 0.5 * QL_LABEL_PCT < ratio < 1.5 * QL_LABEL_PCT, w


def test_quality_apply_margin_consistent_with_pred(spark):
    out = QUERIES["quality_linear_apply"](spark, SF_DIR).collect()
    assert len(out) == 500
    for r in out:
        assert r.pred == (1 if r.margin > 0 else -1)


def test_stream_quality_admission_equals_batch(spark):
    """Micro-batch boundaries cannot change a per-doc decision given a
    static model: the streamed per-source admission report must equal
    the batch scorer aggregated the same way."""
    stream = {
        r.source: (r.n_admitted, r.n_rejected, r.sum_margin)
        for r in QUERIES["stream_quality_admission"](spark, SF_DIR).collect()
    }
    from clj_kinesis_to_firehose_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    batch = (
        QUERIES["quality_linear_apply"](spark, SF_DIR)
        .join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("pred") == 1, 1).otherwise(0)).alias("adm"),
            F.sum(F.when(F.col("pred") == 1, 0).otherwise(1)).alias("rej"),
            F.sum("margin").alias("m"),
        )
        .collect()
    )
    assert {r.source: (r.adm, r.rej, r.m) for r in batch} == stream


def test_flood_gate_parity_spark_vs_oracle(spark):
    """The bucket gate is part of the ORACLE contract, not fixture
    luck (r13 review finding): under an actual template flood the
    registered minhash oracle (with its QUALIFY gate) must produce
    exactly the pairs the guarded Spark pipeline produces."""
    import duckdb

    base = " ".join(f"tok{k}" for k in range(48))
    n = 2 * BAND_BUCKET_CAP
    pdf = __import__("pandas").DataFrame(
        {"doc_id": range(n), "text": [f"{base} serial{i}" for i in range(n)]}
    )
    sdf = spark.createDataFrame(pdf)
    banded = _band_keys(_minhash_sigs(spark, sdf))
    spark_pairs = {
        (r.doc_a, r.doc_b) for r in band_candidates(banded).collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    from clj_kinesis_to_firehose_spark.operators.llm_dedup import (
        _sql_shingle_ctes,
        sql_bucket_gate,
    )

    q = _sql_shingle_ctes() + f"""
    , bands_ok AS ({sql_bucket_gate("bands")})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands_ok a JOIN bands_ok b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """
    oracle_pairs = {(a, b) for a, b in con.execute(q).fetchall()}
    con.close()
    assert spark_pairs == oracle_pairs
    assert len(spark_pairs) < BAND_BUCKET_CAP * (BAND_BUCKET_CAP - 1) // 2


def test_every_banded_modality_fixture_under_cap(spark):
    """Guard-invisibility precondition pinned for EVERY relation
    band_candidates guards — text minhash AND image phash AND audio
    fingerprint (r13 review finding: the image path has the largest
    organic buckets, so it is the one a fixture regeneration would
    trip first; this makes that a loud, named failure instead of an
    opaque driver hash mismatch)."""
    from clj_kinesis_to_firehose_spark.operators.curation_r12 import (
        _phash_banded,
        multimodal_audio_fingerprint,
        multimodal_image_phash,
    )

    img = _phash_banded(
        multimodal_image_phash(spark, SF_DIR).select("doc_id", "phash")
    )
    aud = _phash_banded(
        multimodal_audio_fingerprint(spark, SF_DIR).select(
            "doc_id", F.col("fingerprint").alias("phash")
        )
    )
    for name, banded in [("image", img), ("audio", aud)]:
        over = oversized_band_buckets(banded).collect()
        assert not over, (name, over)


def test_quality_curve_converges_past_the_knee(spark):
    """Epoch 0 is the all-misclassified zero vector; the post-training
    row must sit under 10% of the sample (the >90% agreement the eval
    pins, seen from the training side), and the curve's tail must
    improve on its head — convergence, not oscillation at chance."""
    from clj_kinesis_to_firehose_spark.operators.quality_model import (
        QL_EPOCHS,
        QL_SAMPLE_N,
    )

    rows = {
        r.epoch: r.n_misclassified
        for r in QUERIES["quality_linear_curve"](spark, SF_DIR).collect()
    }
    assert set(rows) == set(range(QL_EPOCHS + 1))
    assert rows[0] == QL_SAMPLE_N
    assert rows[QL_EPOCHS] < QL_SAMPLE_N // 10
    assert rows[QL_EPOCHS] < rows[1]


def test_multimodal_band_stats_matches_modality_relations(spark):
    """The multimodal pre-flight's numbers must agree with the banded
    relations it describes: zero oversized on the fixture, and the
    image rows must reflect the larger organic buckets the image path
    carries."""
    rows = QUERIES["multimodal_band_bucket_stats"](spark, SF_DIR).collect()
    assert len(rows) == 8  # 4 bands x 2 modalities
    assert {(r.modality) for r in rows} == {"image", "audio"}
    assert all(r.n_oversized == 0 for r in rows), rows
    img_max = max(r.max_bucket_n for r in rows if r.modality == "image")
    assert img_max > 1, rows  # collisions exist — the pre-flight sees them


def test_group_advantages_sum_to_zero_per_group(spark):
    """The defining property of group-relative advantages: within every
    group the scaled advantages sum EXACTLY to zero (n·r − Σr summed
    over the group is n·Σr − n·Σr), and a degenerate group's rows are
    all zero."""
    rows = QUERIES["rl_group_advantages"](spark, SF_DIR).collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r.source, []).append(r)
    stats = {
        r.source: r
        for r in QUERIES["rl_group_stats"](spark, SF_DIR).collect()
    }
    assert set(by_group) == set(stats)
    for src, grp in by_group.items():
        assert sum(r.adv_num for r in grp) == 0, src
        assert all(r.n_group == stats[src].n_group == len(grp) for r in grp)
        if stats[src].is_degenerate:
            assert all(r.adv_num == 0 for r in grp)
