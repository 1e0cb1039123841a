"""Oracle-gated queries that exercise the engine's *Python* execution paths
(Arrow-batched mapInPandas / pandas UDF) — the quarantined slow path that
built-in functions can't express (media decode, pluggable tokenizers).

The multimodal decode stub derives dimensions deterministically from the
payload's sha256 (functions/multimodal.py), which DuckDB can mirror in SQL —
so the driver's oracle gate validates the actual mapInPandas plumbing
(Arrow batching, schema, 1->1 row mapping), not just a JVM twin.

Scale notes: both operators are per-row transforms with no shuffle —
embarrassingly parallel over Arrow batches; `arrow.maxRecordsPerBatch`
bounds decoder memory for large media.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.functions.multimodal import (
    attach_payload,
    decode_media_metadata,
)
from realtimedatawarehouse_self_spark.functions.text import tokenize_udf
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """attach binary payload -> mapInPandas decode -> typed metadata."""
    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return decode_media_metadata(attach_payload(docs))


# The stub decoder (functions/multimodal.py::_decode_image_bytes):
#   h = sha256(payload); width = 160 + h[0]%8*80; height = 90 + h[1]%8*45
# mirrored below on the hex digest (byte 0 = hex chars 1-2, byte 1 = 3-4).
_MULTIMODAL_DECODE_SQL = """
WITH hashed AS (
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
)
SELECT doc_id, n_bytes,
       CASE WHEN n_bytes % 3 = 0 THEN 'image/png'
            WHEN n_bytes % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS mime_type,
       CAST(160 + (TRY_CAST('0x' || substr(sha256, 1, 2) AS INTEGER) % 8) * 80
            AS INTEGER) AS width,
       CAST(90 + (TRY_CAST('0x' || substr(sha256, 3, 2) AS INTEGER) % 8) * 45
            AS INTEGER) AS height,
       sha256
FROM hashed
"""


def keyword_page_view_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 via the pluggable pandas-UDF tokenizer (Arrow batches), instead of
    the JVM split path of `keyword_page_view` — same oracle semantics."""
    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    words = docs.select(
        "lang", F.explode(tokenize_udf(F.col("text"))).alias("keyword")
    )
    return words.groupBy("lang", "keyword").agg(
        F.count(F.lit(1)).alias("keyword_ct")
    )


_KEYWORD_UDF_SQL = """
SELECT lang, keyword, CAST(count(*) AS BIGINT) AS keyword_ct
FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS keyword FROM documents
)
WHERE keyword <> ''
GROUP BY 1, 2
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->N frame sampling through mapInPandas (functions/multimodal.py::
    sample_frames): each payload yields one row per 64-byte "frame" (the
    stub for ffmpeg keyframe seeks). The oracle regenerates the same frames
    in SQL (payloads are ASCII, so byte slicing == character slicing) and
    hash-pins every frame's content — verifying the row-explosion plumbing
    end-to-end, not just row counts."""
    from realtimedatawarehouse_self_spark.functions.multimodal import (
        attach_payload,
        sample_frames,
    )

    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    frames = sample_frames(attach_payload(docs))
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame_bytes").cast("bigint").alias("n_frame_bytes"),
        "frame_sha256",
    )


_FRAME_SAMPLE_SQL = """
WITH d AS (
    SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
    FROM documents WHERE length(text) > 0
),
frames AS (
    SELECT doc_id,
           CAST(u.i AS INTEGER) AS frame_idx,
           substr(text, CAST(u.i * 64 + 1 AS BIGINT), 64) AS frame
    FROM d, UNNEST(range(0, CAST(ceil(n / 64.0) AS BIGINT))) AS u(i)
)
SELECT doc_id, frame_idx,
       CAST(length(frame) AS BIGINT) AS n_frame_bytes,
       sha256(frame) AS frame_sha256
FROM frames
"""


def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shape Python path: 256-byte PCM window segmentation with
    exact per-window energy (sum of byte values) via mapInPandas
    (functions/multimodal.py::audio_energy_windows). Payloads are ASCII
    text bytes, so the DuckDB oracle recomputes the identical energies
    with ord() over character slices — the Arrow plumbing AND the
    numeric reduction are both verified, not just row counts."""
    from realtimedatawarehouse_self_spark.functions.multimodal import (
        attach_payload,
        audio_energy_windows,
    )

    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return audio_energy_windows(attach_payload(docs))


_AUDIO_WINDOWS_SQL = """
WITH d AS (
    SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
    FROM documents WHERE length(text) > 0
),
wins AS (
    SELECT doc_id,
           CAST(u.i AS INTEGER) AS win_idx,
           substr(text, CAST(u.i * 256 + 1 AS BIGINT), 256) AS w
    FROM d, UNNEST(range(0, CAST(ceil(n / 256.0) AS BIGINT))) AS u(i)
)
SELECT doc_id, win_idx,
       CAST(length(w) AS BIGINT) AS n_win_bytes,
       CAST(list_sum(list_transform(range(1, length(w) + 1),
                                    i -> ord(substr(w, i, 1))))
            AS BIGINT) AS energy
FROM wins
"""


QUERIES = {
    "multimodal_decode": multimodal_decode,
    "keyword_page_view_udf": keyword_page_view_udf,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_audio_windows": multimodal_audio_windows,
}

ORACLE = {
    "multimodal_decode": _MULTIMODAL_DECODE_SQL,
    "keyword_page_view_udf": _KEYWORD_UDF_SQL,
    "multimodal_frame_sample": _FRAME_SAMPLE_SQL,
    "multimodal_audio_windows": _AUDIO_WINDOWS_SQL,
}
