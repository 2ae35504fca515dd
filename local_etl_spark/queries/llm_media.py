"""Multimodal/binary-column queries (SURVEY.md §2.4-J `llm_multimodal`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_etl_spark.multimodal.columns import decode_media, synthesize_media
from local_etl_spark.queries._util import t
from local_etl_spark.registry import query


@query(
    "llm_multimodal",
    family="llm",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha
    FROM documents
    """,
)
def llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column basics: byte length + content hash.

    The binary payload is the utf-8 text bytes (a stand-in for media
    bytes); length/sha are JVM built-ins over BinaryType — the two ops
    every blob pipeline needs first (size accounting + content
    addressing).
    """
    payload = F.col("text").cast("binary")
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
    )


@query("llm_media_decode", family="llm", oracle=None)
def llm_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media decode: REAL container parsing (PPM / WAV /
    Y4M magic-sniff + header grammar + pixel/sample/frame stats) inside
    mapInPandas — multimodal/columns.py. Rows-only: the kernel output
    isn't SQL-expressible; tests/test_llm_media_text.py cross-checks
    every decoded field against a driver-side reference parse."""
    media = synthesize_media(t(spark, sf_dir, "documents"))
    return decode_media(media)


@query("llm_media_framesample", family="llm", oracle=None)
def llm_media_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over the media table: a real Y4M stream
    walk emitting one row per sampled frame with the sha1 of that
    frame's actual YUV bytes (multimodal/columns.py frame_sample;
    pytest ground truth in tests/test_llm_media_text.py). Rows-only:
    the sampled-frame fan-out isn't SQL-expressible."""
    from local_etl_spark.multimodal.columns import frame_sample

    media = synthesize_media(t(spark, sf_dir, "documents"))
    return frame_sample(media, every_n=10)
