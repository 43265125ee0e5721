"""Multimodal-column operators (SURVEY.md §2 J8 plus the brief's
binary-payload plumbing: decode / feature-extract / resize / frame-
sample as Arrow-batched Pandas functions over opaque binary columns).

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic fake (`_fake_decode`) — the Spark-side
contract (binary column + typed metadata struct, mapInPandas batch
shape, partition-preserving schema) is real and tested; swapping in
a PIL/ffmpeg kernel changes one function body, no plan changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import fan_out, load_table


@register(
    "multimodal_join",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars,
           LEN(e.embedding) AS dim,
           ROUND(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE))), 3)
             AS vec_sum,
           ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS vec_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # text + vector modalities joined on the shared id: one result row
    # carries scalar text features and vector statistics together
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        "lang",
        "n_chars",
        F.size("e").cast("long").alias("dim"),
        F.round(F.aggregate("e", F.lit(0.0), lambda s, x: s + x), 3).alias("vec_sum"),
        F.round(
            F.sqrt(F.aggregate("e", F.lit(0.0), lambda s, x: s + x * x)), 4
        ).alias("vec_norm"),
    )


#: schema of the decoded-feature output — binary in, typed features out
_DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "width int, height int, n_frames int, feature_mean double"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image/video decode kernel.

    STUB: no codec libraries exist in this container. Derives fake
    (width, height, n_frames, feature_mean) purely from the payload
    bytes so results are reproducible; a real kernel (PIL, ffmpeg,
    torchaudio) replaces this body without touching the Spark plan.
    """
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    n_frames = 1 + (payload[0] % 4) if n else 1
    # raw double — rounding happens JVM-side (F.round, HALF_UP) so the
    # DuckDB oracle's ROUND agrees exactly (Python round() is banker's)
    feature_mean = sum(payload[:256]) / max(min(n, 256), 1) / 255.0
    return width, height, n_frames, feature_mean


def decode_media_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batches of (doc_id, media_type, payload)
    → typed feature rows. Runs once per Arrow batch, vectorized over
    rows inside the batch — the 100 TB decode path (one Python worker
    per core, Arrow transfer, no per-row py4j)."""
    for pdf in batches:
        decoded = [_fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "n_frames": [d[2] for d in decoded],
                "feature_mean": [d[3] for d in decoded],
            }
        )
        yield out


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(LENGTH(text) AS BIGINT) AS n_bytes,
           CAST(16 + LENGTH(text) % 64 AS INT) AS width,
           CAST(16 + (LENGTH(text) // 64) % 64 AS INT) AS height,
           CAST(1 + UNICODE(SUBSTR(text, 1, 1)) % 4 AS INT) AS n_frames,
           ROUND(
               CAST(LIST_SUM(LIST_TRANSFORM(
                        RANGE(LEAST(LENGTH(text), 256)),
                        i -> UNICODE(SUBSTR(text, i + 1, 1)))) AS DOUBLE)
               / GREATEST(LEAST(LENGTH(text), 256), 1) / 255.0,
               6) AS feature_mean
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → decoded feature columns via mapInPandas.

    The decode kernel is a deterministic fake (_fake_decode — no codec
    libraries exist in this container; a real kernel replaces that one
    function without touching the Spark plan), but because the fake is
    pure arithmetic over the payload bytes and the fixture text is
    ASCII (byte == codepoint, verified at every SF), the whole operator
    gets an EXACT DuckDB oracle — the Arrow plumbing, batch shape, and
    schema are all hash-checked, stub codec notwithstanding.

    The binary payloads are manufactured from document text (utf-8
    bytes) — opaque binary + metadata struct, exactly the layout a
    real image/audio table would have."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return media.mapInPandas(decode_media_batches, schema=_DECODE_SCHEMA).withColumn(
        "feature_mean", F.round("feature_mean", 6)
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, frame_idx FROM (
        SELECT doc_id, UNNEST(RANGE(0, n_chars % 7 + 1)) AS frame_idx
        FROM documents
    ) WHERE doc_id < 100
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # frame-sampling plumbing: one row per sampled frame index, fanned
    # out JVM-side with sequence+explode (a real video table would carry
    # n_frames in metadata; here n_chars stands in deterministically)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), (F.col("n_chars") % 7))).alias("frame_idx"),
    ).select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))


_RESIZE_SCHEMA = (
    "doc_id long, width long, height long, "
    "out_w long, out_h long, n_bytes_resized long"
)

#: resize target: longest edge scaled to this many "pixels"
RESIZE_BOX = 64


def resize_media_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: aspect-preserving resize planning. The
    dimension arithmetic (scale longest edge to RESIZE_BOX, integer
    floor on the short edge, resized byte budget = out_w*out_h) is the
    real contract a thumbnailing pipeline schedules around; the pixel
    resample itself would replace this body (STUB — no image libs in
    this container)."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, _, _ = _fake_decode(payload)
            m = max(w, h)
            ow, oh = (w * RESIZE_BOX) // m, (h * RESIZE_BOX) // m
            rows.append((int(doc_id), w, h, ow, oh, ow * oh))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height", "out_w", "out_h",
                "n_bytes_resized",
            ],
        ).astype("int64")


@register(
    "multimodal_resize",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             16 + LENGTH(text) % 64 AS width,
             16 + (LENGTH(text) // 64) % 64 AS height
      FROM documents
    )
    SELECT doc_id, width, height,
           (width * {RESIZE_BOX}) // GREATEST(width, height) AS out_w,
           (height * {RESIZE_BOX}) // GREATEST(width, height) AS out_h,
           ((width * {RESIZE_BOX}) // GREATEST(width, height))
             * ((height * {RESIZE_BOX}) // GREATEST(width, height))
             AS n_bytes_resized
    FROM dims
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over a binary media column (the brief's third
    multimodal primitive beside decode and frame-sample): mapInPandas
    computes source dims from the payload (the stubbed decode) and the
    aspect-preserving target box — all-integer arithmetic, so the op
    gets an EXACT oracle recomputing the same dims from the payload
    length. Scale shape is identical to multimodal_decode: fan_out
    spreads the single-file fixture scan across cores ahead of the
    Python kernel, then a pure map stage over Arrow batches."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return media.mapInPandas(resize_media_batches, schema=_RESIZE_SCHEMA)


_FEATURE_DIM = 8

_FEATURE_SCHEMA = "doc_id long, dim_idx long, feat double"


def feature_extract_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: payload bytes → fixed-dim feature vector in
    LONG form (one row per dimension). The kernel is a deterministic
    byte-striping fake (dim k sums every 8th byte of the first 256 —
    STUB for a real image/audio encoder); a learned encoder replaces
    this body and the long-form schema, batching, and downstream joins
    are unchanged."""
    import numpy as np

    for pdf in batches:
        ids, dims, feats = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(payload[:256], dtype=np.uint8)
            for k in range(_FEATURE_DIM):
                ids.append(int(doc_id))
                dims.append(k)
                feats.append(float(b[k::_FEATURE_DIM].sum()) / 255.0)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "dim_idx": pd.Series(dims, dtype="int64"),
                # explicit dtype: an empty partition's [] would infer
                # object, not float64, and break the Arrow schema
                "feat": pd.Series(feats, dtype="float64"),
            }
        )


@register(
    "multimodal_feature_extract",
    oracle=f"""
    SELECT doc_id, k AS dim_idx,
           ROUND(COALESCE(CAST(LIST_SUM(LIST_TRANSFORM(
               LIST_FILTER(RANGE(LEAST(LENGTH(text), 256)),
                           i -> i % {_FEATURE_DIM} = k),
               i -> UNICODE(SUBSTR(text, i + 1, 1)))) AS DOUBLE), 0.0)
             / 255.0, 6) AS feat
    FROM documents, UNNEST(RANGE({_FEATURE_DIM})) AS t(k)
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over a binary media column (the brief's
    fourth multimodal primitive): mapInPandas turns each payload into
    a fixed-dim (_FEATURE_DIM) vector, emitted in long form so the oracle
    compare is flat-exact (array columns render differently across
    engines). The fake encoder is pure byte arithmetic, so the whole
    Arrow path — batch shape, striping, rounding discipline (JVM-side
    HALF_UP after the kernel) — is hash-checked despite the stubbed
    kernel. fan_out ahead of the kernel, then a pure map stage."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return media.mapInPandas(
        feature_extract_batches, schema=_FEATURE_SCHEMA
    ).withColumn("feat", F.round("feat", 6))
