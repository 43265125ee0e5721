"""Multimodal audio/video operators over REAL container bytes —
round-8 extension.

The multimodal family treats media as binary columns with typed
metadata; round 8 gave images real BMP/PPM codecs, and this module
does the same for audio: every document row synthesizes a
deterministic int16 waveform, encodes it to genuine RIFF/WAVE PCM-16
bytes, and the operators then PARSE those bytes back (chunk walk,
little-endian samples) before computing statistics. The DuckDB
oracles recompute sample sums, sums of squares, and header byte
counts analytically from the generator formula — a wrong endianness,
chunk offset, or decimation stride in the decode path breaks the
hash, exactly like the imaging twins.

Scale shape: fan_out spreads the scan; encode and decode are pure
Arrow-batched map stages over the binary column — zero shuffles,
Python cost set by batch shape, not row count (SCALE.md multimodal
row).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import register
from clj_kinesis_to_firehose_spark.sources import fan_out, load_table


def _encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from clj_kinesis_to_firehose_spark.functions.audio import (
        encode_wav,
        sample_array,
        sample_rate,
    )

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": [
                    encode_wav(sample_array(d), sample_rate(d))
                    for d in pdf["doc_id"]
                ],
            }
        )


_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate_hz int, n_samples int, "
    "sum_amp long, sum_sq long"
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from clj_kinesis_to_firehose_spark.functions.audio import decode_wav

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples, rate = decode_wav(bytes(payload))
            s = samples.astype(np.int64)
            rows.append(
                (
                    doc_id,
                    len(payload),
                    rate,
                    len(samples),
                    int(s.sum()),
                    int((s * s).sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_bytes",
                "sample_rate_hz",
                "n_samples",
                "sum_amp",
                "sum_sq",
            ],
        )


@register(
    "multimodal_audio_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             256 + doc_id % 64 AS n,
             CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 12000
                  WHEN 2 THEN 16000 ELSE 20000 END AS rate
      FROM documents
    )
    SELECT doc_id,
           CAST(44 + 2 * n AS BIGINT) AS n_bytes,
           CAST(rate AS INT) AS sample_rate_hz,
           CAST(n AS INT) AS n_samples,
           ROUND((n * 1000.0) / rate, 4) AS duration_ms,
           CAST(LIST_SUM(LIST_TRANSFORM(RANGE(n),
               i -> (doc_id * 31 + i * 17) % 4096 - 2048)) AS BIGINT)
             AS sum_amp,
           ROUND(SQRT(CAST(LIST_SUM(LIST_TRANSFORM(RANGE(n),
               i -> ((doc_id * 31 + i * 17) % 4096 - 2048)
                  * ((doc_id * 31 + i * 17) % 4096 - 2048))) AS DOUBLE)
               / n), 6) AS rms
    FROM dims
    """,
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary audio column → decoded waveform statistics via
    mapInPandas and the REAL pure-Python WAV codec
    (functions/audio.py): canonical RIFF/WAVE PCM-16 mono bytes are
    encoded then re-parsed from the public wire format. The oracle
    recomputes the 44-byte-header size and the sample sum /
    sum-of-squares analytically, so the hash check covers actual
    decoded sample math end to end."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    from clj_kinesis_to_firehose_spark.operators.multimodal import (
        compose_batches,
    )

    decoded = docs.select("doc_id").mapInPandas(
        compose_batches(_encode_batches, _decode_batches),
        schema=_DECODE_SCHEMA,
    )
    return decoded.select(
        "doc_id",
        "n_bytes",
        "sample_rate_hz",
        "n_samples",
        F.round(
            (F.col("n_samples") * F.lit(1000.0)) / F.col("sample_rate_hz"), 4
        ).alias("duration_ms"),
        "sum_amp",
        F.round(
            F.sqrt(F.col("sum_sq").cast("double") / F.col("n_samples")), 6
        ).alias("rms"),
    )


@register(
    "multimodal_audio_resample",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             256 + doc_id % 64 AS n,
             2 + doc_id % 3 AS k
      FROM documents
    ), outn AS (
      SELECT doc_id, n, k, (n - 1) // k + 1 AS m FROM dims
    )
    SELECT doc_id,
           CAST(k AS INT) AS decim_factor,
           CAST(m AS INT) AS n_out,
           CAST(LIST_SUM(LIST_TRANSFORM(RANGE(m),
               j -> (doc_id * 31 + j * k * 17) % 4096 - 2048)) AS BIGINT)
             AS sum_amp_out,
           ROUND(SQRT(CAST(LIST_SUM(LIST_TRANSFORM(RANGE(m),
               j -> ((doc_id * 31 + j * k * 17) % 4096 - 2048)
                  * ((doc_id * 31 + j * k * 17) % 4096 - 2048))) AS DOUBLE)
               / m), 6) AS rms_out
    FROM outn
    """,
)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode real WAV bytes, decimate by a per-row stride (every
    k-th sample — the integer-exact stand-in where a polyphase
    low-pass kernel drops in), and re-derive the output stats. The
    oracle walks the SAME decimated index set analytically: an
    off-by-one in the stride or a wrong output length breaks the
    hash."""
    import numpy as np

    from clj_kinesis_to_firehose_spark.functions.audio import (
        decimate,
        decode_wav,
    )

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _ = decode_wav(bytes(payload))
                k = 2 + doc_id % 3
                out = decimate(samples, k).astype(np.int64)
                rows.append(
                    (doc_id, k, len(out), int(out.sum()), int((out * out).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "decim_factor", "n_out", "sum_amp_out", "sum_sq"],
            )

    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    from clj_kinesis_to_firehose_spark.operators.multimodal import (
        compose_batches,
    )

    out = docs.select("doc_id").mapInPandas(
        compose_batches(_encode_batches, _resample),
        schema=(
            "doc_id long, decim_factor int, n_out int, "
            "sum_amp_out long, sum_sq long"
        ),
    )
    return out.select(
        "doc_id",
        "decim_factor",
        "n_out",
        "sum_amp_out",
        F.round(
            F.sqrt(F.col("sum_sq").cast("double") / F.col("n_out")), 6
        ).alias("rms_out"),
    )


@register(
    "multimodal_video_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             4 + doc_id % 6 AS w,
             4 + doc_id % 5 AS h,
             2 + doc_id % 4 AS nf
      FROM documents
    ), frames AS (
      SELECT doc_id, w, h, UNNEST(RANGE(nf)) AS f FROM dims
    )
    SELECT doc_id,
           CAST(f AS INT) AS frame_idx,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           ROUND(CAST(LIST_SUM(LIST_TRANSFORM(RANGE(w * h),
               i -> (doc_id * 31 + f * 19 + (i % w) * 7 + (i // w) * 13)
                    % 256)) AS DOUBLE) / (w * h), 6) AS mean_y,
           ROUND(CAST(LIST_SUM(LIST_TRANSFORM(RANGE(w * h),
               i -> (doc_id * 31 + f * 19 + (i % w) * 7 + (i // w) * 13
                     + 101) % 256)) AS DOUBLE) / (w * h), 6) AS mean_u,
           ROUND(CAST(LIST_SUM(LIST_TRANSFORM(RANGE(w * h),
               i -> (doc_id * 31 + f * 19 + (i % w) * 7 + (i // w) * 13
                     + 202) % 256)) AS DOUBLE) / (w * h), 6) AS mean_v
    FROM frames
    """,
)
def multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary video column → one row of per-plane means PER FRAME via
    mapInPandas and the REAL pure-Python Y4M codec
    (functions/video.py): YUV4MPEG2 streams are encoded then
    re-parsed from the public container format — the oracle
    recomputes every frame's Y/U/V means analytically, so a FRAME
    marker misparse, plane-order swap, or frame-offset error breaks
    the hash. Completes the real-codec sweep across the media family
    (BMP/PPM images, WAV audio, Y4M video)."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from clj_kinesis_to_firehose_spark.functions.video import encode_y4m

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [encode_y4m(d) for d in pdf["doc_id"]],
                }
            )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from clj_kinesis_to_firehose_spark.functions.video import decode_y4m

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, w, h = decode_y4m(bytes(payload))
                for f, planes in enumerate(frames):
                    # raw integer plane sums only — the mean/round
                    # happens in the Spark plan with F.round so the
                    # rounding mode (HALF_UP) matches the DuckDB
                    # oracle's ROUND, same as multimodal_audio_decode
                    s = planes.astype(np.int64).sum(axis=(1, 2))
                    rows.append(
                        (doc_id, f, w, h, int(s[0]), int(s[1]), int(s[2]))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "width", "height",
                         "sum_y", "sum_u", "sum_v"],
            )

    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    from clj_kinesis_to_firehose_spark.operators.multimodal import (
        compose_batches,
    )

    sums = docs.select("doc_id").mapInPandas(
        compose_batches(_encode, _decode),
        schema=(
            "doc_id long, frame_idx int, width int, height int, "
            "sum_y long, sum_u long, sum_v long"
        ),
    )
    npix = (F.col("width") * F.col("height")).cast("double")
    return sums.select(
        "doc_id",
        "frame_idx",
        "width",
        "height",
        F.round(F.col("sum_y") / npix, 6).alias("mean_y"),
        F.round(F.col("sum_u") / npix, 6).alias("mean_u"),
        F.round(F.col("sum_v") / npix, 6).alias("mean_v"),
    )
