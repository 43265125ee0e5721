"""Round-8 extension audits: URL canonicalization stays shuffle-free
codegen and is idempotent under Hypothesis-generated mess, and the
KMV/theta sketch estimates land within the published error bound
against true cardinalities."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from clj_kinesis_to_firehose_spark import registry
from clj_kinesis_to_firehose_spark.plans import audit
from tests.conftest import SF_DIR

QUERIES = registry.queries()

_label = st.from_regex(r"[a-z0-9][a-z0-9-]{0,6}", fullmatch=True).filter(
    lambda s: s != "www"
)
_seg = st.from_regex(r"[A-Za-z0-9_.~-]{1,6}", fullmatch=True)
_key = st.one_of(
    st.sampled_from(["utm_source", "utm_medium", "utm_x"]),
    st.from_regex(r"[a-z]{1,5}", fullmatch=True),
)


@st.composite
def messy_url(draw):
    scheme = draw(st.sampled_from(["http", "HTTP", "https", "HTTPS", "hTtPs"]))
    www = draw(st.sampled_from(["", "www.", "WWW."]))
    host = ".".join(draw(st.lists(_label, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080", ":9000"]))
    path = "".join("/" + draw(_seg) for _ in range(draw(st.integers(0, 3))))
    path += "/" * draw(st.integers(0, 2))
    params = draw(
        st.lists(
            st.tuples(_key, st.from_regex(r"[A-Za-z0-9]{0,4}", fullmatch=True)),
            max_size=4,
        )
    )
    query = "&".join(f"{k}={v}" for k, v in params)
    frag = draw(st.sampled_from(["", "#x", "#Sec-1"]))
    return (
        scheme + "://" + www + host.upper() + port + path
        + ("?" + query if query else "") + frag
    )


@given(st.lists(messy_url(), min_size=1, max_size=40))
@settings(max_examples=3, deadline=None)
def test_url_normalize_idempotent(spark, urls):
    # canonicalization must be a projection onto its own image:
    # norm(norm(u)) == norm(u) for arbitrary mess (hosts that are
    # not themselves named 'www', which no canonicalizer can fix)
    from clj_kinesis_to_firehose_spark.operators.curation_ext import (
        with_norm_url,
    )

    df = spark.createDataFrame([(u,) for u in urls], "raw_url string")
    once = with_norm_url(df).select("raw_url", "norm_url")
    rows1 = {r.raw_url: r.norm_url for r in once.collect()}
    again = with_norm_url(
        spark.createDataFrame(
            [(v,) for v in rows1.values()], "raw_url string"
        )
    )
    rows2 = {r.raw_url: r.norm_url for r in again.collect()}
    for norm in rows1.values():
        assert rows2[norm] == norm, (norm, rows2[norm])


def test_url_normalize_is_shuffle_free_codegen(spark):
    # pure per-row string algebra: the canonical key must stream out
    # of the scan — zero exchanges, whole-stage codegen
    df = QUERIES["text_url_normalize"](spark, SF_DIR)
    assert audit.n_shuffles(df) == 0, audit.plan_report(df)
    assert audit.has_whole_stage_codegen(df)


def test_url_normalize_key_collapses_crawl_variants(spark):
    # the whole point: raw variants differ, canonical keys dedup
    df = QUERIES["text_url_normalize"](spark, SF_DIR)
    row = df.filter("doc_id = 0").collect()[0]
    assert row.raw_url != row.norm_url
    assert "utm_" in row.raw_url and "utm_" not in row.norm_url
    assert "#" in row.raw_url and "#" not in row.norm_url
    assert row.norm_url.startswith("http://cdn-")


def test_kmv_estimates_within_error_bound(spark):
    # KMV relative error ~ 1/sqrt(K-2) ≈ 12.7% at K=64; allow 3 sigma.
    # True distinct user-days per type come straight from DuckDB.
    df = QUERIES["agg_kmv_theta"](spark, SF_DIR)
    rows = {(r.type_a, r.type_b): r for r in df.collect()}
    con = duckdb.connect()
    truth = dict(
        con.execute(
            f"""
            SELECT event_type, COUNT(DISTINCT
                CAST(user_id AS VARCHAR) || ':' || strftime(ts, '%Y-%m-%d'))
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1
            """
        ).fetchall()
    )
    tol = 3 * 0.127
    for (ta, tb), r in rows.items():
        for t, est in ((ta, r.est_a), (tb, r.est_b)):
            assert abs(est - truth[t]) <= tol * truth[t], (t, est, truth[t])
        # union estimate bounded by the pair's true union bracket
        lo, hi = max(truth[ta], truth[tb]), truth[ta] + truth[tb]
        assert r.est_union >= lo * (1 - tol)
        assert r.est_union <= hi * (1 + tol)
        # intersection consistency: est_inter <= est_union, both >= 0
        assert 0 <= r.est_intersect <= r.est_union * (1 + 1e-9)


def test_kmv_incremental_merge_equals_direct(spark):
    # the mergeability theorem the incremental op rests on: the K
    # smallest of the union of per-day K-smallest sets ARE the K
    # smallest of the full set — merged estimate must equal the
    # direct sketch's estimate EXACTLY, not approximately
    df = QUERIES["agg_kmv_incremental"](spark, SF_DIR)
    merged = {r.event_type: (r.k_n, r.est_distinct) for r in df.collect()}
    con = duckdb.connect()
    direct = dict(
        con.execute(
            f"""
            WITH h AS (
              SELECT DISTINCT event_type,
                     (('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' ||
                         strftime(ts, '%Y-%m-%d')), 1, 15))::BIGINT) AS hv
              FROM read_parquet('{SF_DIR}/events.parquet')
            ), rk AS (
              SELECT event_type, hv,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY hv) AS rn
              FROM h
            ), kt AS (
              SELECT event_type, max(hv) AS theta, count(*) AS k_n
              FROM rk WHERE rn <= 64 GROUP BY event_type
            )
            SELECT event_type,
                   CASE WHEN k_n < 64 THEN CAST(k_n AS DOUBLE)
                        ELSE ROUND((63.0 * 1152921504606846976) / theta, 4)
                        END
            FROM kt
            """
        ).fetchall()
    )
    assert set(merged) == set(direct)
    for t, (_, est) in merged.items():
        assert est == direct[t], (t, est, direct[t])


def test_url_variants_collapse_to_resources(spark):
    # two crawls per doc + doc_id%400 resource collisions: every
    # canonical group must hold >=2 variants and the winner is the
    # smallest doc_id in the group
    df = QUERIES["dedup_url_variants"](spark, SF_DIR)
    rows = df.collect()
    assert all(r.n_variants >= 2 for r in rows)
    assert all(r.n_variants == 2 * r.n_docs for r in rows)
    # canonical count = distinct resource ids present
    n_docs = QUERIES["text_url_normalize"](spark, SF_DIR).count()
    assert len(rows) == min(n_docs, 400)


def test_url_variant_dedup_is_two_phase_agg(spark):
    # explode + canonicalize map-side; the only exchanges are the
    # standard two-phase distinct-agg on the canonical key — the
    # plan must never shuffle the raw crawl variants more than that
    df = QUERIES["dedup_url_variants"](spark, SF_DIR)
    assert audit.n_shuffles(df) <= 2, audit.plan_report(df)


def test_shard_routing_ranges_cover_and_contain(spark):
    # every record lands in exactly one shard, min/max stay inside
    # the owned range, and load tracks range width (uniform hashing)
    from clj_kinesis_to_firehose_spark.operators.routing_ops import SHARD_MAP

    df = QUERIES["kinesis_shard_routing"](spark, SF_DIR)
    rows = {r.shard_id: r for r in df.collect()}
    total = sum(r.n_records for r in rows.values())
    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    assert total == n_events  # exactly-once coverage, no gaps/overlap
    space = 1 << 60
    for sid, lo, hi in SHARD_MAP:
        r = rows[sid]
        assert lo <= r.min_hk and r.max_hk < hi, (sid, r)
        share, width = r.n_records / total, (hi - lo) / space
        assert abs(share - width) < 0.12, (sid, share, width)


def test_shard_routing_broadcasts_the_map(spark):
    # the interval lookup must be a BroadcastNestedLoopJoin (range
    # predicates can't hash-join) — the fact side is NEVER sort-merge
    # shuffled against an 8-row map; the only exchanges belong to the
    # per-shard aggregation
    for name in ["kinesis_shard_routing", "kinesis_reshard_range_migration"]:
        df = QUERIES[name](spark, SF_DIR)
        plan = audit.formatted_plan(df)
        assert "BroadcastNestedLoopJoin" in plan, name
        assert "SortMergeJoin" not in plan, name
        assert audit.n_shuffles(df) <= 2, audit.plan_report(df)


def test_reshard_migration_is_range_local(spark):
    # the transition matrix is identity outside the split/merged
    # parents: only shardId-004 fans to -008/-009 and -005/-006
    # collapse to -010
    df = QUERIES["kinesis_reshard_range_migration"](spark, SF_DIR)
    legal = {
        "shardId-004": {"shardId-008", "shardId-009"},
        "shardId-005": {"shardId-010"},
        "shardId-006": {"shardId-010"},
    }
    for r in df.collect():
        expected = legal.get(r.shard_before, {r.shard_before})
        assert r.shard_after in expected, (r.shard_before, r.shard_after)


def test_kmv_sketch_state_is_bounded(spark):
    # the persistable sketch is K values per group — the op's pair
    # rows expose k_n which must never exceed K
    df = QUERIES["agg_kmv_theta"](spark, SF_DIR)
    for r in df.collect():
        assert r.k_a <= 64 and r.k_b <= 64
