"""Multimodal column handling (SURVEY.md 2b).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing -- schema, Arrow batching, partition
shape, UDF signatures -- is real and tested; only the media *decode*
step is stubbed (no image/audio libraries in this environment), behind
``decode_stub`` / a deterministic fake feature extractor.

Pattern: ``mapInPandas`` with an explicit output schema. Arrow moves the
binary batches; the Python function sees pandas Series of bytes. At scale
this is the canonical shape for CPU-bound media preprocessing: one Python
worker per core per executor, batch-at-a-time, no per-row overhead.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField("byte_len", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("byte_len", IntegerType(), True),
        StructField("content_sha", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def attach_payloads(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text table as a media table: utf-8 bytes stand in for the
    blob. Real deployments read blobs via ``spark.read.format('binaryFile')``
    or from a bytes column in parquet -- identical downstream."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.octet_length(payload).alias("byte_len"),
    )


def decode_stub(payload: bytes, media_type: str) -> bytes:
    """Placeholder for the real media decoder (PIL / torchaudio / pyav).

    The container has no media libraries; a deployment swaps this single
    function. Raising keeps the contract honest -- callers use
    ``fake_features`` for tests.
    """
    raise NotImplementedError(
        f"media decode for {media_type} requires image/audio libraries "
        "not present in this environment; swap decode_stub for a real decoder"
    )


def fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor: sha256-derived floats.
    Exercises the exact batch/Arrow/schema path a real encoder would."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Batch feature extraction over binary payloads via ``mapInPandas``.

    The iterator-of-batches signature keeps memory bounded regardless of
    partition size -- the required shape for 100 TB media columns (one
    in-flight Arrow batch per task, not one partition-sized pandas frame).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "content_sha": [
                        hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                    ],
                    "features": [fake_features(p, dim) for p in pdf["payload"]],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
