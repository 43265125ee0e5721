"""Web-corpus URL canonicalization — round-8 curation extension.

Every web-scale corpus pipeline (C4, RefinedWeb, Common Crawl
processing) dedups and joins on a CANONICAL url, not the raw crawl
string: scheme/host case, default ports, fragments, tracking
parameters, and trailing slashes all vary freely across crawls of the
same resource [PK: C4/RefinedWeb processing descriptions; RFC 3986
normalization rules]. ``text_url_normalize`` implements the standard
rule set as pure codegen string expressions — zero shuffles, zero
Python, the canonical key streams out of the scan at any corpus size
and feeds straight into the existing dedup_exact hash-groupBy.

The fixture's documents table has no URL column, so (same pattern as
``text_unicode_normalize``'s decomposed code points) each row builds a
deterministically messy URL from its own columns — uppercase scheme
and host, www. prefix, a default or non-default port, an optional
trailing slash, shuffled utm_* tracking params, and a fragment — and
the op must normalize it:

* scheme and host lowercased, ``www.`` stripped;
* default ports dropped (``:80`` for http, ``:443`` for https) but
  non-default ports kept — including ``:80`` on https;
* trailing slashes stripped from the path (root stays ``/``);
* ``utm_*`` params removed, the rest sorted by byte order;
* the fragment dropped.

The DuckDB oracle rebuilds the identical rules with list lambdas, so
every branch of the port/slash/param logic is hash-checked for real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import load_table


@register(
    "text_url_normalize",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
        || '://WWW.Cdn-' || source || '.Example.COM'
        || (CASE doc_id % 3 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
            ELSE ':8080' END)
        || '/Docs/' || lang || '/' || doc_id
        || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
        || '?utm_source=feed&z=' || (doc_id % 7) || '&utm_campaign=news&a='
        || (doc_id % 5) || '&lang=' || lang
        || '#Section-' || (doc_id % 9) AS raw_url
      FROM documents
    ), parts AS (
      SELECT doc_id, raw_url,
        lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) AS scheme,
        regexp_extract(raw_url, '^[A-Za-z]+://([^/?#]*)', 1) AS authority,
        regexp_extract(raw_url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1) AS rawpath,
        regexp_extract(raw_url, '\\?([^#]*)', 1) AS rawquery
      FROM raw
    ), norm AS (
      SELECT doc_id, raw_url, scheme,
        regexp_replace(lower(string_split(authority, ':')[1]),
                       '^www\\.', '') AS host,
        CASE WHEN len(string_split(authority, ':')) < 2 THEN ''
             WHEN scheme = 'http'
                  AND string_split(authority, ':')[2] = '80' THEN ''
             WHEN scheme = 'https'
                  AND string_split(authority, ':')[2] = '443' THEN ''
             ELSE ':' || string_split(authority, ':')[2] END AS port,
        CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
             ELSE regexp_replace(rawpath, '/+$', '') END AS npath,
        array_to_string(list_sort(list_filter(string_split(rawquery, '&'),
            x -> NOT starts_with(x, 'utm_'))), '&') AS nquery
      FROM parts
    )
    SELECT doc_id, raw_url,
           scheme || '://' || host || port || npath
             || CASE WHEN nquery = '' THEN '' ELSE '?' || nquery END
             AS norm_url,
           md5(scheme || '://' || host || port || npath
             || CASE WHEN nquery = '' THEN '' ELSE '?' || nquery END)
             AS url_key
    FROM norm
    """,
)
def text_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RFC-3986-style canonicalization, all inside whole-stage codegen:
    # one projection, no shuffle, no Python. url_key = md5(norm_url)
    # is the join/dedup key a crawl pipeline would groupBy on.
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    raw_url = F.concat(
        F.when(did % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://WWW.Cdn-"),
        F.col("source"),
        F.lit(".Example.COM"),
        F.when(did % 3 == 0, F.lit(":80"))
        .when(did % 3 == 1, F.lit(":443"))
        .otherwise(F.lit(":8080")),
        F.lit("/Docs/"),
        F.col("lang"),
        F.lit("/"),
        did.cast("string"),
        F.when(did % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&z="),
        (did % 7).cast("string"),
        F.lit("&utm_campaign=news&a="),
        (did % 5).cast("string"),
        F.lit("&lang="),
        F.col("lang"),
        F.lit("#Section-"),
        (did % 9).cast("string"),
    )
    with_raw = docs.select("doc_id", raw_url.alias("raw_url"))

    scheme = F.lower(F.regexp_extract("raw_url", r"^([A-Za-z]+)://", 1))
    authority = F.regexp_extract("raw_url", r"^[A-Za-z]+://([^/?#]*)", 1)
    rawpath = F.regexp_extract("raw_url", r"^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    rawquery = F.regexp_extract("raw_url", r"\?([^#]*)", 1)
    parts = with_raw.select(
        "doc_id",
        "raw_url",
        scheme.alias("scheme"),
        F.split(authority, ":").alias("auth"),
        rawpath.alias("rawpath"),
        rawquery.alias("rawquery"),
    )

    host = F.regexp_replace(
        F.lower(F.element_at("auth", 1)), r"^www\.", ""
    )
    port_raw = F.when(
        F.size("auth") < 2, F.lit("")
    ).otherwise(F.element_at("auth", 2))
    port = (
        F.when(port_raw == "", F.lit(""))
        .when((F.col("scheme") == "http") & (port_raw == "80"), F.lit(""))
        .when((F.col("scheme") == "https") & (port_raw == "443"), F.lit(""))
        .otherwise(F.concat(F.lit(":"), port_raw))
    )
    stripped = F.regexp_replace("rawpath", r"/+$", "")
    npath = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    nquery = F.array_join(
        F.array_sort(
            F.filter(
                F.split("rawquery", "&"),
                lambda x: ~x.startswith("utm_"),
            )
        ),
        "&",
    )
    norm_url = F.concat(
        F.col("scheme"),
        F.lit("://"),
        host,
        port,
        npath,
        F.when(nquery == "", F.lit("")).otherwise(F.concat(F.lit("?"), nquery)),
    )
    return parts.select(
        "doc_id",
        "raw_url",
        norm_url.alias("norm_url"),
        F.md5(norm_url).alias("url_key"),
    )
