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
                    # NULL payload -> NULL sha/features (absence
                    # propagates; the schema allows NULL blobs and a
                    # crash-per-batch on one missing blob is the wrong
                    # failure mode at 100 TB -- the sibling kernels
                    # already handle None)
                    "content_sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "features": [
                        fake_features(p, dim) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("resized", BinaryType(), True),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode->resize->re-encode (a real
    deployment swaps in PIL via ``decode_stub``): byte payload is
    truncated/cycled to exactly width*height bytes, so output size is the
    deterministic function of (w, h) a real resize would have."""
    target = width * height
    if not payload:
        return b"\x00" * target
    reps = -(-target // len(payload))
    return (payload * reps)[:target]


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Batch image resize over binary payloads (``mapInPandas``).

    The Spark-side contract is the real one -- binary in, fixed-shape
    binary out, Arrow batches, bounded memory; only the pixel transform is
    the deterministic fake (no image libs in this container)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    # NULL blob -> NULL output (extract_features'
                    # discipline): a missing payload is absence, not a
                    # width*height zero-byte image
                    "resized": [
                        fake_resize(p, width, height) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
        StructField("frame_sha", StringType(), True),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: 1 input row -> n_frames output rows
    (``mapInPandas`` is a flat-map over batches, so the row-exploding
    shape costs nothing extra). The fake "decoder" slices the payload
    into n_frames even chunks at deterministic offsets -- the uniform
    temporal sampling a real pyav/ffmpeg step would do."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    # NULL blob -> n_frames NULL frames (the frame spine
                    # stays 1->n_frames per input row, but a missing
                    # payload must not masquerade as sha-of-empty-bytes
                    # frames -- extract_features' NULL discipline)
                    for i in range(n_frames):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(None)
                    continue
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    frame = payload[i * step : (i + 1) * step]
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "frame_sha": [
                        hashlib.sha256(f).hexdigest() if f is not None else None
                        for f in frames
                    ],
                }
            )

    return media.filter(F.col("media_type") == "video/mp4").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


_PNG_MAGIC_HEX = "89504E470D0A1A0A"


def synth_png_header(
    df: DataFrame, id_col: str, width, height, bit_depth: int = 8,
    color_type: int = 6,
) -> DataFrame:
    """Attach a byte-correct PNG signature + IHDR chunk as a ``payload``
    binary column (magic, length, 'IHDR', 4-byte big-endian dims,
    depth, color type): the deterministic stand-in for real image
    blobs that lets header parsing be tested end-to-end without media
    libraries. ``width``/``height`` are Column expressions."""
    hex_str = F.concat(
        F.lit(_PNG_MAGIC_HEX),
        F.lit("0000000D"),                       # IHDR length = 13
        F.lit("49484452"),                       # 'IHDR'
        F.lpad(F.hex(width.cast("bigint")), 8, "0"),
        F.lpad(F.hex(height.cast("bigint")), 8, "0"),
        F.lpad(F.hex(F.lit(int(bit_depth))), 2, "0"),
        F.lpad(F.hex(F.lit(int(color_type))), 2, "0"),
    )
    return df.select(
        F.col(id_col).alias("media_id"), F.unhex(hex_str).alias("payload")
    )


def parse_png_header(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata from raw PNG bytes with BUILT-IN expressions only
    (substring/hex/conv on the binary column -- whole-stage codegen, no
    Python, no decode library): adds

      is_png     -- the 8-byte signature matches,
      width / height -- IHDR big-endian dims (bytes 17-24),
      bit_depth / color_type -- IHDR bytes 25-26,

    NULL metadata for non-PNG or truncated payloads. THIS is the part
    of the multimodal surface that is real at 100 TB -- container
    headers route, filter and shard blobs (group by resolution, drop
    sub-256px images) long before any pixel decode runs; only the
    decode itself (operators/multimodal.py decode_stub) needs a media
    library."""
    p = F.col(payload_col)
    is_png = (F.octet_length(p) >= 26) & (
        F.hex(F.substring(p, 1, 8)) == F.lit(_PNG_MAGIC_HEX)
    )

    def be_int(pos: int, nbytes: int):
        return F.conv(F.hex(F.substring(p, pos, nbytes)), 16, 10).cast(
            "bigint"
        )

    return df.select(
        "*",
        is_png.alias("is_png"),
        F.when(is_png, be_int(17, 4)).alias("width"),
        F.when(is_png, be_int(21, 4)).alias("height"),
        F.when(is_png, be_int(25, 1)).cast("int").alias("bit_depth"),
        F.when(is_png, be_int(26, 1)).cast("int").alias("color_type"),
    )
