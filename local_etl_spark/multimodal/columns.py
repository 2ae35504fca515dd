"""Multimodal column handling (SURVEY.md §2.4-J, `llm_multimodal`).

Convention: media travels as an opaque ``binary`` payload column plus
typed metadata (modality, mime, declared dims) — the layout every
large-scale training pipeline converges on (media bytes stay columnar
next to their features; no filesystem side-channel).

The decode kernels (image decode, audio resample, video frame-sample)
need libraries this container doesn't ship, so the KERNELS are stubs —
``_decode_real`` raises NotImplementedError and the deterministic fake
parses a self-describing header we embed when synthesizing payloads.
Everything AROUND the kernel is real and tested: the Arrow-batched
``mapInPandas`` plumbing, schemas, batch shapes, and partitioning are
exactly what a real decoder drops into.

Scale notes: mapInPandas streams Arrow batches — one Python worker per
core per partition, no driver involvement, and payload bytes cross to
Python once. Real deployments additionally cap
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
10 MB videos doesn't materialize as one giant Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

# 14-byte self-describing fake header: %06d width, %06d height, %02d channels
_HEADER_LEN = 14

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("body_sha", T.StringType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from `documents`: a binary payload
    whose first 14 bytes are a parseable header, body = the text bytes.

    Generation is pure JVM expression — at scale this column would come
    off parquet directly; nothing here shuffles.
    """
    width = (F.col("doc_id") % 512 + 16).cast("int")
    height = (F.col("doc_id") % 384 + 16).cast("int")
    channels = (F.col("doc_id") % 3 + 1).cast("int")
    header = F.format_string("%06d%06d%02d", width, height, channels)
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.concat(header, F.col("text")).cast("binary").alias("payload"),
    )


def _decode_real(payload: bytes, modality: str):
    """Placeholder for the real kernel (PIL / soundfile / pyav).

    Cited contract: decode payload → (width, height, channels, frames).
    The container has none of these libraries, so this stays a stub.
    """
    raise NotImplementedError(
        "real media decode requires imaging/audio libraries not present "
        "in this environment; the fake header path below exercises the "
        "identical Spark plumbing"
    )


def decode_media(media: DataFrame, use_real_kernel: bool = False) -> DataFrame:
    """Arrow-batched decode: binary payload → typed metadata + checksum.

    mapInPandas signature and batch shape are production-real; only the
    per-payload kernel is faked (header parse + sha1 of the body).
    """

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "width": [],
                "height": [],
                "channels": [],
                "n_bytes": [],
                "body_sha": [],
            }
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                if use_real_kernel:
                    _decode_real(bytes(payload), modality)  # raises
                raw = bytes(payload)
                head, body = raw[:_HEADER_LEN], raw[_HEADER_LEN:]
                out["width"].append(int(head[0:6]))
                out["height"].append(int(head[6:12]))
                out["channels"].append(int(head[12:14]))
                out["n_bytes"].append(len(body))
                out["body_sha"].append(hashlib.sha1(body).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling, stubbed at the kernel: emits one row per
    sampled 'frame' index derived from the declared header — the
    explode-shaped output (row-per-frame with a binary frame column in
    production) is the part that matters for downstream batching."""
    decoded = decode_media(media)
    n_frames = F.when(F.col("modality") == "video", F.col("height")).otherwise(
        F.lit(1)
    )
    return decoded.select(
        "doc_id",
        "modality",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
