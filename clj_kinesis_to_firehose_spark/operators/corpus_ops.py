"""Corpus-design operators for LLM training-data pipelines: source
mixing with temperature, dedup-informed quality signals, the
filter-retention funnel, and embedding-space label diagnostics.

Scale design: every operator here is a constant number of shuffles on
keys whose cardinality is either corpus-scale-with-map-side-combine
(doc_id, shingle) or tiny (source, label, stage) — no O(n²) pair
space, no driver-side loops, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.functions import shingles
from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import fan_out, load_table

#: temperature for source re-weighting: share^ALPHA, renormalized.
#: ALPHA < 1 flattens the mixture toward rare sources (the standard
#: multilingual/multi-source corpus balancing knob).
SAMPLE_TEMP_ALPHA = 0.5


@register(
    "sample_temperature_source",
    oracle=f"""
    WITH c AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), t AS (
        SELECT SUM(n_docs) AS n_total FROM c
    ), w AS (
        SELECT source, n_docs, n_total,
               n_docs / CAST(n_total AS DOUBLE) AS raw_share,
               POW(n_docs / CAST(n_total AS DOUBLE), {SAMPLE_TEMP_ALPHA})
                   AS wt
        FROM c CROSS JOIN t
    )
    SELECT source,
           n_docs,
           ROUND(raw_share, 6) AS raw_share,
           ROUND(wt / SUM(wt) OVER (), 6) AS temp_share,
           CAST(ROUND(wt / SUM(wt) OVER () * n_total) AS BIGINT)
               AS target_docs
    FROM w
    """,
)
def sample_temperature_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture: re-weight each source's share
    as share^α (α=0.5), renormalize, and emit the per-source document
    budget a balanced training mix would sample.

    One corpus aggregation (map-side combine on ``source``); everything
    after operates on |sources| rows, so the global re-normalization
    window is a deliberate single-partition pass over a tiny relation —
    the same shape at 100 TB, where |sources| stays in the hundreds.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    w = counts.crossJoin(F.broadcast(total)).withColumn(
        "raw_share", F.col("n_docs") / F.col("n_total").cast("double")
    ).withColumn("wt", F.pow("raw_share", F.lit(SAMPLE_TEMP_ALPHA)))
    everything = Window.partitionBy()
    return w.select(
        "source",
        "n_docs",
        F.round("raw_share", 6).alias("raw_share"),
        F.round(F.col("wt") / F.sum("wt").over(everything), 6).alias("temp_share"),
        F.round(
            F.col("wt") / F.sum("wt").over(everything) * F.col("n_total")
        ).cast("long").alias("target_docs"),
    )


@register(
    "text_dup_ngram_coverage",
    oracle="""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t, text FROM documents
    ), shl AS (
        SELECT doc_id,
               CASE WHEN LEN(t) >= 3
                    THEN LIST_TRANSFORM(RANGE(LEN(t) - 2),
                         i -> ARRAY_TO_STRING(LIST_SLICE(t, i + 1, i + 3), ' '))
                    ELSE [text] END AS sh
        FROM toks
    ), sh AS (
        SELECT DISTINCT doc_id, UNNEST(sh) AS shingle FROM shl
    ), c AS (
        SELECT shingle, COUNT(*) AS ndocs FROM sh GROUP BY shingle
    )
    SELECT doc_id,
           COUNT(*) AS n_ngrams,
           ROUND(AVG(CASE WHEN ndocs >= 2 THEN 1.0 ELSE 0.0 END), 6)
               AS dup_ngram_frac
    FROM sh JOIN c USING (shingle)
    GROUP BY doc_id
    """,
)
def text_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-n-gram coverage per document: the fraction of a doc's
    distinct 3-token shingles that also appear in at least one other
    document — the corpus-level repetition signal quality pipelines
    use alongside near-dedup (a doc can evade pair-level dedup while
    being assembled from corpus boilerplate; this catches it).

    Two aggregations on the exploded shingle relation: doc-frequency
    per shingle (map-side combine), then a per-doc average after a
    shingle-keyed join. The join is shingle↔shingle — both sides
    shuffle-partition on the same key, and the frequency side is the
    smaller post-agg relation. No pair space anywhere.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = fan_out(spark, docs).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text")))).alias("shingle"),
    )
    ndocs = sh.groupBy("shingle").agg(F.count("*").alias("ndocs"))
    return (
        sh.join(ndocs, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.round(
                F.avg(F.when(F.col("ndocs") >= 2, 1.0).otherwise(0.0)), 6
            ).alias("dup_ngram_frac"),
        )
    )


@register(
    "corpus_filter_funnel",
    oracle="""
    WITH flagged AS (
        SELECT lang = 'en' AS s1,
               lang = 'en' AND n_chars BETWEEN 100 AND 2000 AS s2,
               lang = 'en' AND n_chars BETWEEN 100 AND 2000
                   AND LEN(STRING_SPLIT(text, ' ')) >= 20 AS s3,
               lang = 'en' AND n_chars BETWEEN 100 AND 2000
                   AND LEN(STRING_SPLIT(text, ' ')) >= 20
                   AND doc_id = MIN(doc_id) OVER (PARTITION BY text) AS s4
        FROM documents
    ), agg AS (
        SELECT COUNT(*) AS n_input,
               CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
               CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
        FROM flagged
    )
    SELECT stage_idx, stage, n_docs,
           ROUND(n_docs / CAST(n_input AS DOUBLE), 6) AS retention
    FROM (
        SELECT 0 AS stage_idx, 'input' AS stage, n_input AS n_docs, n_input FROM agg
        UNION ALL SELECT 1, 'lang_en', n1, n_input FROM agg
        UNION ALL SELECT 2, 'length_100_2000', n2, n_input FROM agg
        UNION ALL SELECT 3, 'min_20_tokens', n3, n_input FROM agg
        UNION ALL SELECT 4, 'exact_dedup', n4, n_input FROM agg
    )
    """,
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-retention funnel: the survivor count after each stage of
    a C4-style cleaning pipeline (language gate → length band → minimum
    token count → exact dedup keeper), as one report — the first
    artifact a corpus-construction run publishes.

    Single corpus scan: stage predicates are cumulative boolean columns,
    the dedup-keeper flag is one window over ``text`` (the only
    shuffle), and the funnel is a conditional aggregation unpivoted via
    ``stack`` — NOT four filtered re-scans, which is what makes this
    shape affordable at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    keeper = F.min("doc_id").over(Window.partitionBy("text")) == F.col("doc_id")
    s1 = F.col("lang") == "en"
    s2 = s1 & F.col("n_chars").between(100, 2000)
    s3 = s2 & (F.size(F.split("text", " ")) >= 20)
    s4 = s3 & keeper
    agg = docs.select(
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3"), s4.alias("s4")
    ).agg(
        F.count("*").alias("n_input"),
        F.sum(F.col("s1").cast("long")).alias("n1"),
        F.sum(F.col("s2").cast("long")).alias("n2"),
        F.sum(F.col("s3").cast("long")).alias("n3"),
        F.sum(F.col("s4").cast("long")).alias("n4"),
    )
    return agg.select(
        F.expr(
            "stack(5, "
            "0L, 'input', n_input, "
            "1L, 'lang_en', n1, "
            "2L, 'length_100_2000', n2, "
            "3L, 'min_20_tokens', n3, "
            "4L, 'exact_dedup', n4) AS (stage_idx, stage, n_docs)"
        ),
        "n_input",
    ).select(
        "stage_idx",
        "stage",
        "n_docs",
        F.round(F.col("n_docs") / F.col("n_input").cast("double"), 6).alias(
            "retention"
        ),
    )


@register(
    "embedding_centroid_distance",
    oracle="""
    WITH v AS (
        SELECT vec_id, label,
               LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ), pe AS (
        SELECT vec_id, label, UNNEST(e) AS x,
               GENERATE_SUBSCRIPTS(e, 1) AS pos
        FROM v
    ), cent AS (
        SELECT label, pos, AVG(x) AS c FROM pe GROUP BY label, pos
    )
    SELECT pe.vec_id, pe.label,
           ROUND(SQRT(SUM((pe.x - cent.c) * (pe.x - cent.c))), 4)
               AS centroid_dist
    FROM pe JOIN cent USING (label, pos)
    GROUP BY pe.vec_id, pe.label
    """,
)
def embedding_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid distance for every embedding — the
    within-class scatter diagnostic that surfaces mislabeled or
    outlier vectors before they poison contrastive training.

    Centroids via posexplode → (label, pos) average (map-side combine;
    |labels|·dim rows out), reassembled into arrays and BROADCAST back
    — the full-corpus side is touched exactly once and the distance is
    a JVM-side zip_with/aggregate fold, so the plan is one shuffle for
    the centroid agg plus a map-only scoring pass at any corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    pe = emb.select("vec_id", "label", F.posexplode("e").alias("pos", "x"))
    cent = (
        pe.groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("e", "centroid", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        emb.join(F.broadcast(cent), "label")
        .select("vec_id", "label", F.round(dist, 4).alias("centroid_dist"))
    )


@register(
    "corpus_chunk_documents",
    oracle="""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t,
               LEN(STRING_SPLIT(text, ' ')) AS n
        FROM documents
    )
    SELECT doc_id, CAST(s / 24 AS BIGINT) AS chunk_id, s AS chunk_start,
           CAST(LEAST(32, n - s) AS BIGINT) AS n_tokens,
           t[s + 1] AS first_token,
           t[LEAST(s + 32, n)] AS last_token,
           MD5(ARRAY_TO_STRING(t[s + 1 : LEAST(s + 32, n)], ' ')) AS chunk_md5
    FROM toks, UNNEST(RANGE(0, n, 24)) AS r(s)
    """,
)
def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size context-window chunking with overlap — the step that
    turns variable-length documents into training/RAG windows: 32-token
    chunks on a 24-token stride (8-token overlap), the last chunk
    truncated at the document tail. Every chunk carries its boundary
    tokens plus an md5 of the joined chunk text, so the oracle pins
    content, not just offsets.

    Pure column expressions end to end: token split, a `sequence` of
    chunk starts, one explode — no shuffle at all until a downstream
    consumer aggregates, no Python, and chunking parallelizes with the
    scan (each doc's chunks are produced where the doc is read). At
    100 TB this is exactly the map-only pass you want; the stride/size
    constants become tokenizer-budget parameters."""
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(spark, docs).select(
        "doc_id",
        F.split("text", " ").alias("t"),
        F.size(F.split("text", " ")).alias("n"),
    )
    chunks = toks.select(
        "doc_id",
        "n",
        "t",
        F.explode(F.expr("sequence(0, n - 1, 24)")).alias("s"),
    )
    n_tok = F.least(F.lit(32), F.col("n") - F.col("s"))
    chunk_arr = F.slice("t", F.col("s") + 1, n_tok)
    return chunks.select(
        "doc_id",
        (F.col("s") / 24).cast("long").alias("chunk_id"),
        F.col("s").alias("chunk_start"),
        n_tok.cast("long").alias("n_tokens"),
        F.element_at("t", F.col("s") + 1).alias("first_token"),
        F.element_at("t", F.least(F.col("s") + 32, F.col("n"))).alias("last_token"),
        F.md5(F.concat_ws(" ", chunk_arr)).alias("chunk_md5"),
    )


@register(
    "sample_importance_weighted",
    oracle="""
    WITH scored AS (
        SELECT source,
               LEAST(1.0, GREATEST(0.1, n_chars / 120.0)) AS w,
               CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 10000 AS b
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN b < w * 10000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           ROUND(SUM(w), 4) AS expected_sample
    FROM scored GROUP BY source
    """,
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance-weighted subsampling: each document's
    acceptance probability is a quality proxy (here a clipped length
    score; in production a perplexity/classifier score), and the
    accept decision is hash(doc_id) mod 10⁴ < w·10⁴ — no RNG state, so
    the SAME documents are kept on any cluster, any partitioning, any
    re-run, and incremental corpus additions don't reshuffle earlier
    decisions. This is how a 100 TB pipeline does quality-weighted
    corpus mixing reproducibly (cf. the temperature-mix operator,
    which reweights at source granularity; this one acts per
    document). One scan, one aggregation; the md5→bucket expression is
    cross-engine exact (same parity trick as sample_hash_split).
    Output reports per-source totals, the realized sample size, and
    the expected size Σw so the hash sampler's calibration is visible.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.1), F.col("n_chars") / 120.0))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10000
    )
    scored = docs.select(
        "source", w.alias("w"), bucket.alias("b")
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("b") < F.col("w") * 10000, 1).otherwise(0)).alias(
            "n_sampled"
        ),
        F.round(F.sum("w"), 4).alias("expected_sample"),
    )


@register(
    "corpus_cap_per_source",
    oracle="""
    SELECT doc_id, source, keep_rank FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS keep_rank
        FROM documents
    ) WHERE keep_rank <= 20
    """,
)
def corpus_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-domination cap: keep at most K=20 documents per source,
    chosen by deterministic hash order — the guard that stops one
    crawler dump from dominating a mixed corpus. Hash order (not
    doc_id order) makes the kept subset an unbiased sample of each
    source, yet identical on every cluster and re-run, and stable
    under corpus growth except where new docs hash below the cap.

    One window shuffle on the source key; the md5 rank key is the same
    cross-engine-exact trick as sample_hash_split. At 100 TB, per-key
    top-K via window + early filter is AQE-friendly (rank predicate
    pushes into the sort as a per-partition limit)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("keep_rank"))
        .filter(F.col("keep_rank") <= 20)
    )


@register(
    "corpus_realize_mixture",
    oracle=f"""
    WITH c AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), t AS (
        SELECT SUM(n_docs) AS n_total FROM c
    ), w AS (
        SELECT source, n_docs,
               CAST(ROUND(
                   POW(n_docs / CAST(n_total AS DOUBLE), {SAMPLE_TEMP_ALPHA})
                   / SUM(POW(n_docs / CAST(n_total AS DOUBLE),
                             {SAMPLE_TEMP_ALPHA})) OVER () * n_total
               ) AS BIGINT) AS target_docs
        FROM c CROSS JOIN t
    ), perdoc AS (
        SELECT d.doc_id, d.source,
               w.target_docs / CAST(w.n_docs AS DOUBLE) AS k,
               CAST(('0x' || SUBSTRING(MD5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 10000 AS b
        FROM documents d JOIN w USING (source)
    ), copies AS (
        SELECT doc_id, source,
               CAST(FLOOR(k) AS BIGINT)
               + CASE WHEN b < (k - FLOOR(k)) * 10000 THEN 1 ELSE 0 END AS m
        FROM perdoc
    ), realized AS (
        SELECT source, doc_id, m
        FROM copies, UNNEST(RANGE(1, m + 1)) AS r(i)
    )
    SELECT source,
           COUNT(DISTINCT doc_id) AS n_source_docs,
           COUNT(*) AS n_copies
    FROM realized GROUP BY source
    """,
)
def corpus_realize_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature-scaled source mixture: turn
    sample_temperature_source's per-source budgets into an actual
    training stream by repeating each document floor(k) times plus one
    stochastic-rounding extra copy decided by a deterministic hash
    threshold (k = source target ÷ source size). Σ copies per source
    lands within n_docs·1 of the budget, with zero RNG state — the
    same realized corpus on any cluster, any partitioning, any rerun.

    Scale shape: one corpus aggregation builds the |sources|-row
    budget table (broadcast back), the copy multiplier is map-side
    arithmetic, and the explode multiplies rows where they already
    live — no shuffle of the realized stream at all until a consumer
    aggregates. k derives from the ROUNDED integer budget over the
    integer source count, so the double division is exact and no
    pow-ulp divergence can flip floor/fraction between engines."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    # corpus total as a window over the |sources|-row counts relation
    # (r15, guide §2.4): the 1-row SUM aggregate + crossJoin re-derived
    # the whole counts subtree — a second corpus scan for a number the
    # counts rows already carry.
    everything = Window.partitionBy()
    wt = F.pow(F.col("n_docs") / F.col("n_total").cast("double"), SAMPLE_TEMP_ALPHA)
    budget = (
        counts.withColumn("n_total", F.sum("n_docs").over(everything))
        .withColumn("wt", wt)
        .select(
            "source",
            "n_docs",
            F.round(F.col("wt") / F.sum("wt").over(everything) * F.col("n_total"))
            .cast("long")
            .alias("target_docs"),
        )
    )
    k = F.col("target_docs") / F.col("n_docs").cast("double")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10000
    )
    m = F.floor(k).cast("long") + F.when(
        bucket < (k - F.floor(k)) * 10000, 1
    ).otherwise(0)
    realized = (
        docs.select("doc_id", "source")
        .join(F.broadcast(budget), "source")
        .withColumn("m", m)
        .filter(F.col("m") > 0)
        .select(
            "source", "doc_id", F.explode(F.expr("sequence(1, m)")).alias("copy_i")
        )
    )
    return realized.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_source_docs"),
        F.count("*").alias("n_copies"),
    )


@register(
    "corpus_shard_manifest",
    oracle="""
    SELECT shard_id, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM (
        SELECT doc_id, n_chars,
               CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 64 AS shard_id
        FROM documents
    ) GROUP BY shard_id
    """,
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest: assign every document to one of
    64 shards by content-stable hash and emit per-shard counts and
    byte totals — the layout step that feeds distributed dataloaders
    (each worker streams its own shard files; the manifest is how the
    trainer plans epochs). Hash sharding balances shards without a
    sort and keeps assignment stable as the corpus grows; the manifest
    itself is one aggregation (64 rows at any corpus size). At 100 TB
    the same expression is the partitionBy key of the shard write."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 64
    )
    return (
        docs.select("doc_id", "n_chars", shard.alias("shard_id"))
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )
