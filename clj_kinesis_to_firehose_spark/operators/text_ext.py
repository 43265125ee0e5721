"""Round-8 text/window extensions: C4-style cross-document segment
dedup, Unicode NFC normalization, and an exact moving median.

``text_line_dedup`` implements the C4 pipeline's line-level dedup
(remove any line that repeats across documents) over the fixture's
single-line word-soup documents by defining a "line" as a fixed
10-word segment — the machinery (explode -> global segment frequency
-> anti-join -> ordered reconstruction) is identical to newline-split
text and is the part that matters at 100 TB: one explode, one hash
aggregation on the segment, one anti-join (AQE broadcasts the dup
list when small), one per-doc reassembly. Pair cost is linear in
corpus size — never all-pairs.

``text_unicode_normalize`` is the one op in this family that needs
Python: Spark SQL has no NFC builtin, so an Arrow-batched pandas UDF
wraps ``unicodedata.normalize`` — the documented slow-path escape
hatch, stateless and shuffle-free. DuckDB's ``nfc_normalize`` is the
exact oracle, so composed-vs-decomposed code-point math is
hash-checked for real.

``win_moving_median`` is an exact (interpolated) median over a
7-row moving window — Spark's ``percentile(value, 0.5)`` window
aggregate vs DuckDB's ``quantile_cont`` (windowed ``median`` in
DuckDB takes the lower middle, NOT the interpolated value — that
near-miss is why the oracle spells ``quantile_cont``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import fan_out, load_table

#: words per synthetic "line"; the oracle SQL hard-codes 10 in its
#: slice arithmetic — change only in lockstep.
SEGMENT_WORDS = 10


@register(
    "text_line_dedup",
    oracle="""
    WITH segs AS (
        SELECT doc_id, seg_idx,
               array_to_string(words[(seg_idx-1)*10+1 : seg_idx*10], ' ') AS seg
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
             LATERAL (SELECT unnest(generate_series(
                 1, CAST(ceil(len(words)/10.0) AS BIGINT))) AS seg_idx)
    ), dup AS (
        SELECT seg FROM segs GROUP BY seg HAVING COUNT(DISTINCT doc_id) >= 2
    ), rebuilt AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(seg, ' ' ORDER BY seg_idx) AS dedup_text
        FROM segs WHERE seg NOT IN (SELECT seg FROM dup)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(ceil(len(string_split(d.text, ' '))/10.0) AS INT) AS n_segments,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(r.dedup_text, '') AS dedup_text
    FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C4-style cross-document line dedup: drop every 10-word segment
    # that appears (exactly) in >= 2 distinct documents, then rebuild
    # each document from its surviving segments in original order.
    docs = load_table(spark, sf_dir, "documents")
    w = SEGMENT_WORDS
    words = F.split("text", " ")
    n_segments = F.ceil(F.size(words) / F.lit(float(w))).cast("int")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_segments),
                # slice() is 1-based; the trailing segment is shorter
                # and concat_ws never pads — same as the oracle's
                # inclusive list slice.
                lambda i: F.concat_ws(" ", F.slice(words, (i - 1) * w + 1, w)),
            )
        ).alias("pos", "seg"),
    ).select("doc_id", (F.col("pos") + 1).alias("seg_idx"), "seg")
    # ONE pass over the segment stream (r15, guide §2.4 — the
    # dedup_substring_spans window pattern): the groupBy+anti-join
    # formulation re-derived the whole corpus segment explode for the
    # duplicate-set side (the anti-join's build side cannot reuse the
    # probe side's exchange, and the two seg-keyed exchanges carry
    # different column sets so they never unify). The distinct-doc
    # count per segment value is dense_rank's max over the one
    # hash(seg)-partitioned stream; keeping n_docs < 2 IS the anti
    # join against the >= 2 set.
    by_doc = Window.partitionBy("seg").orderBy("doc_id")
    whole = Window.partitionBy("seg")
    kept = (
        segs.withColumn("rk", F.dense_rank().over(by_doc))
        .withColumn("n_docs", F.max("rk").over(whole))
        .filter(F.col("n_docs") < 2)
        .drop("rk", "n_docs")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        # array_sort on (seg_idx, seg) structs restores document order
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    return (
        docs.select("doc_id", n_segments.alias("n_segments"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_segments",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
        )
    )


@register(
    "text_unicode_normalize",
    oracle="""
    SELECT doc_id,
           length('e' || chr(769) || 'o' || chr(776) || '-' || lang) AS raw_len,
           length(nfc_normalize(
               'e' || chr(769) || 'o' || chr(776) || '-' || lang)) AS nfc_len,
           nfc_normalize(
               'e' || chr(769) || 'o' || chr(776) || '-' || lang
           ) || ':' || substr(text, 1, 24) AS nfc_text
    FROM documents
    """,
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NFC normalization of decomposed sequences built per row:
    # 'e'+U+0301 -> U+00E9, 'o'+U+0308 -> U+00F6. Spark has no NFC
    # builtin, so this is the family's documented pandas-UDF slow
    # path — stateless, Arrow-batched, no shuffle.
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    raw = F.concat(F.lit("e\u0301o\u0308-"), F.col("lang"))

    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x))

    return docs.select(
        "doc_id",
        F.length(raw).alias("raw_len"),
        F.length(nfc(raw)).alias("nfc_len"),
        F.concat(nfc(raw), F.lit(":"), F.substring("text", 1, 24)).alias(
            "nfc_text"
        ),
    )


@register(
    "win_moving_median",
    oracle="""
    SELECT event_id, event_type,
           ROUND(quantile_cont(value, 0.5) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS moving_median
    FROM events
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact interpolated median over a 7-row moving window — robust
    # smoothing a z-score/EWMA can't give. percentile() runs as a
    # JVM window aggregate: one shuffle on event_type, sort by
    # (ts, event_id) — the event_id tie-break makes frame contents
    # deterministic cross-engine.
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return events.select(
        "event_id",
        "event_type",
        F.round(F.expr("percentile(value, 0.5)").over(w), 4).alias(
            "moving_median"
        ),
    )
