"""Scalar-function operators (SURVEY.md §2 H1-H9): string / regex /
date / math / conditional / array / map / JSON surfaces.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside WholeStageCodegen; no Python UDFs in any of these paths.
Engine-divergent corners are avoided per SURVEY.md §5.3 rule 6
(no negative modulo, explicit datediff argument order, 1-indexed
array access on both sides, RE2-safe regex only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "str_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           TRIM(CONCAT('  ', p_name, '  ')) AS name_trimmed,
           SUBSTRING(p_name, 1, 5) AS name_head,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_name, ' ', '_') AS name_snake,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part
    """,
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@register(
    "str_split_explode",
    oracle="""
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 100
    """,
)
def str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )


@register(
    "str_regexp",
    oracle="""
    SELECT p_partkey, p_brand,
           REGEXP_EXTRACT(p_brand, 'Brand#([0-9]+)', 1) AS brand_num
    FROM part
    WHERE REGEXP_MATCHES(p_name, '^(small|red) ')
    """,
)
def str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_name").rlike("^(small|red) ")).select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", "Brand#([0-9]+)", 1).alias("brand_num"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS order_year,
           MONTH(o_orderdate) AS order_month,
           DAY(o_orderdate) AS order_day,
           DATE_TRUNC('month', o_orderdate) AS order_month_start,
           DATEDIFF('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_day
    FROM orders WHERE o_orderkey < 3000
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DuckDB DATEDIFF('day', start, end) == Spark datediff(end, start);
    # both truncate to whole days (arguments deliberately ordered per
    # SURVEY.md §5.3 rule 6)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .cast("date")
        .cast("string")
        .alias("due_day"),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           ABS(l_quantity - 25.0) AS qty_dev,
           ROUND(POW(l_discount, 2), 6) AS disc_sq,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           MOD(CAST(l_quantity AS BIGINT), 7) AS qty_mod7
    FROM lineitem WHERE l_orderkey < 1500
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark FLOOR/CEIL(double) → long natively; oracle casts to match.
    # MOD runs on non-negative ints only (engine semantics diverge on
    # negatives). Quantities are integral doubles → BIGINT cast exact.
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
    )


@register(
    "cond_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000.0 THEN 'large'
                WHEN o_totalprice >= 100000.0 THEN 'medium'
                ELSE 'small' END AS size_bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_filled,
           GREATEST(o_totalprice, 100000.0) AS price_floor100k,
           LEAST(o_totalprice, 300000.0) AS price_cap300k
    FROM orders
    """,
)
def cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000.0, "large")
        .when(F.col("o_totalprice") >= 100000.0, "medium")
        .otherwise("small")
        .alias("size_bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_filled"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor100k"),
        F.least(F.col("o_totalprice"), F.lit(300000.0)).alias("price_cap300k"),
    )


@register(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           LEN(embedding[1:8]) AS head_len,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 3)
             AS elem_sum
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both engines 1-index here: Spark element_at / DuckDB [1]; the
    # element sum accumulates in double on both sides (float32 inputs
    # widened first) and rounds at 3 dp
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.size(F.slice("embedding", 1, 8)).cast("long").alias("head_len"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x.cast("double"),
            ),
            3,
        ).alias("elem_sum"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS prop_k,
           (CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) >= 50) AS k_high
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the bridge's payload-inspection analog: schema-on-read projection
    # of the JSON props column (SURVEY.md §1.2)
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id", k.alias("prop_k"), (k >= 50).alias("k_high")
    )


@register(
    "map_funcs",
    oracle="""
    SELECT event_id,
           'k' AS only_key,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_value,
           1 AS n_keys
    FROM events WHERE event_id < 5000
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full MapType round-trip on the Spark side (from_json → map<string,
    # long> → keys/values/size); the oracle projects the same scalars via
    # JSON since the fixture maps are single-key by construction
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    m = F.from_json("props", "map<string,long>")
    return ev.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("only_key"),
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


@register(
    "date_interval_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus_3m,
           CAST(LAST_DAY(o_orderdate) AS VARCHAR) AS month_end,
           QUARTER(o_orderdate) AS qtr,
           DAYOFWEEK(o_orderdate) AS dow,
           WEEKOFYEAR(o_orderdate) AS iso_week
    FROM orders WHERE o_orderkey < 4000
    """,
)
def date_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic: month addition with end-of-month
    clamping (Jan 31 + 3mo = Apr 30 on both engines), last_day,
    quarter, day-of-week, ISO week.

    DuckDB DAYOFWEEK is 0=Sunday; Spark dayofweek() is 1=Sunday, so
    the Spark side subtracts 1. Both weekofyear() are ISO-8601.
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    return orders.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("string").alias("plus_3m"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
    )


@register(
    "array_lambda_funcs",
    oracle="""
    SELECT vec_id,
           LEN(LIST_FILTER(embedding, x -> x > 0)) AS n_pos,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sum_sq,
           LEN(LIST_FILTER(embedding, x -> x > 2.0)) > 0 AS any_big,
           ROUND(LIST_MAX(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 6)
             AS max_elem
    FROM embeddings
    """,
)
def array_lambda_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (lambda forms): filter, transform,
    exists, fold — the vector toolkit that keeps per-element work
    JVM-side (codegen'd) instead of exploding rows or calling Python.

    Fold accumulates float32 elements widened to double, left-to-right
    on both engines; 4-dp round absorbs nothing here (same op order ⇒
    bit-identical) but keeps the §5.3 discipline uniform.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > F.lit(0.0))).cast("long").alias("n_pos"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            4,
        ).alias("sum_sq"),
        F.exists("embedding", lambda x: x.cast("double") > F.lit(2.0)).alias("any_big"),
        F.round(
            F.array_max(F.transform("embedding", lambda x: x.cast("double"))), 6
        ).alias("max_elem"),
    )


@register(
    "str_regexp_extract_all",
    oracle="""
    SELECT event_id,
           ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(props, '[0-9]+'), ',') AS nums,
           CAST(LEN(REGEXP_EXTRACT_ALL(props, '[0-9]+')) AS BIGINT) AS n_nums
    FROM events
    """,
)
def str_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: every digit run in the JSON props payload,
    joined to a scalar so the value-hash sees the full array content
    (array columns stringify differently across engines). Pure codegen
    map work — zero shuffles at any scale."""
    events = load_table(spark, sf_dir, "events")
    # Spark's regexp_extract_all extracts capture group idx (default 1),
    # so the pattern needs an explicit group; DuckDB's extracts the full
    # match with no group — both yield the digit runs.
    nums = F.regexp_extract_all("props", F.lit("([0-9]+)"))
    return events.select(
        "event_id",
        F.array_join(nums, ",").alias("nums"),
        F.size(nums).cast("long").alias("n_nums"),
    )


@register(
    "array_setops",
    oracle="""
    SELECT doc_id,
           COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_INTERSECT(
               STRING_SPLIT(text, ' '),
               ['the', 'a', 'join', 'scan', 'merge'])), ','), '') AS kw_hits,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_distinct_tokens,
           COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(
               LIST_DISTINCT(STRING_SPLIT(text, ' ')),
               t -> LEN(t) >= 6)), ','), '') AS long_tokens
    FROM documents
    """,
)
def array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra over tokenized documents: intersection with a
    keyword list, distinct-cardinality, and a length-predicate filter.
    array_intersect/array_distinct dedupe in both engines; results are
    sorted and joined to scalars so the hash is order-insensitive.
    Per-row lambda work stays in the JVM (no Python boundary)."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    kw = F.array(*[F.lit(w) for w in ["the", "a", "join", "scan", "merge"]])
    return docs.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect(tokens, kw)), ",").alias("kw_hits"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_distinct_tokens"),
        F.array_join(
            F.array_sort(
                F.filter(F.array_distinct(tokens), lambda t: F.length(t) >= 6)
            ),
            ",",
        ).alias("long_tokens"),
    )


@register(
    "try_functions_safe_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_num,
           TRY_CAST(event_type AS BIGINT) AS bad_cast,
           CASE WHEN (event_id % 10) = 0 THEN NULL
                ELSE value / (event_id % 10) END AS safe_div
    FROM events
    """,
)
def try_functions_safe_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface (ANSI-mode hardening): try_cast
    yields NULL instead of raising on malformed input, try_divide
    yields NULL on a zero divisor. On a dirty 100 TB feed these keep a
    single bad record from killing a stage — the column-level PERMISSIVE
    posture, same family as route_dead_letter's parse handling."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.expr(
            "try_cast(get_json_object(props, '$.k') AS BIGINT)"
        ).alias("k_num"),
        F.expr("try_cast(event_type AS BIGINT)").alias("bad_cast"),
        # no rounding: the IEEE division is bit-identical across engines,
        # while 2dp-inputs ÷ small ints land on exact half-ties where
        # ROUND modes (HALF_UP vs half-even) diverge
        F.try_divide("value", F.col("event_id") % 10).alias("safe_div"),
    )


@register(
    "json_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(JSON_EXTRACT(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(JSON_EXTRACT(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    WHERE CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) IS NOT NULL
    GROUP BY event_type
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``try_parse_json`` ingests the payload once into the binary
    variant encoding, ``try_variant_get`` does typed path extraction —
    the open-schema ingestion path (vs ``get_json_object``, which
    re-parses the JSON text per extraction). At 100 TB the difference
    is parse-once-shred-many: variant columns store a parsed binary
    form, so N path reads cost one parse, and malformed payloads
    degrade to null instead of failing the pipeline (try_ semantics).
    The oracle reads the same paths with DuckDB's JSON extraction."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )
