"""Multimodal plumbing tests: binary payload schema, mapInPandas feature
extraction batch path, decode stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    attach_payloads,
    decode_stub,
    extract_features,
    fake_features,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_payload_schema_and_types(spark, sf_smoke_dir):
    docs = load_table(spark, sf_smoke_dir, "documents")
    media = attach_payloads(docs)
    assert [f.dataType.simpleString() for f in media.schema.fields] == [
        "bigint", "binary", "string", "int",
    ]
    row = media.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.byte_len == len(row.payload)


def test_extract_features_mapinpandas(spark, sf_smoke_dir):
    docs = load_table(spark, sf_smoke_dir, "documents")
    media = attach_payloads(docs).repartition(8)  # exercise multi-batch path
    feats = extract_features(media, dim=8)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == docs.count()
    sample = rows[0]
    assert len(sample.features) == 8
    assert all(0.0 <= f < 1.0 for f in sample.features)
    # deterministic: same payload -> same features, matching driver-side calc
    doc = docs.filter(F.col("doc_id") == sample.media_id).first()
    expected = fake_features(doc.text.encode(), 8)
    assert [pytest.approx(e, abs=1e-6) for e in expected] == list(sample.features)


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError, match="image/audio libraries"):
        decode_stub(b"\x89PNG", "image/png")


def test_resize_media_fixed_shape(spark, sf_smoke_dir):
    from taxi_data_pipeline_pset2_spark.operators.multimodal import (
        RESIZED_SCHEMA,
        resize_media,
    )

    docs = load_table(spark, sf_smoke_dir, "documents").limit(50)
    media = attach_payloads(docs)
    out = resize_media(media, width=16, height=9)
    assert out.schema == RESIZED_SCHEMA
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r.resized) == 16 * 9 for r in rows)
    assert all(r.width == 16 and r.height == 9 for r in rows)


def test_sample_frames_explodes_videos_only(spark, sf_smoke_dir):
    from taxi_data_pipeline_pset2_spark.operators.multimodal import (
        FRAME_SCHEMA,
        sample_frames,
    )

    docs = load_table(spark, sf_smoke_dir, "documents").limit(60)
    media = attach_payloads(docs)
    n_videos = media.filter(F.col("media_type") == "video/mp4").count()
    out = sample_frames(media, n_frames=4)
    assert out.schema == FRAME_SCHEMA
    rows = out.collect()
    assert len(rows) == n_videos * 4
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_id.values())
    # deterministic: re-running yields identical frame hashes
    again = {(r.media_id, r.frame_idx): r.frame_sha for r in sample_frames(media, 4).collect()}
    assert {(r.media_id, r.frame_idx): r.frame_sha for r in rows} == again


class TestPngHeader:
    def test_parses_real_png_header_bytes(self, spark):
        import struct

        from taxi_data_pipeline_pset2_spark.operators.multimodal import (
            parse_png_header,
        )

        def png_hdr(w, h, depth=8, ctype=2):
            return (
                b"\x89PNG\r\n\x1a\n"
                + struct.pack(">I", 13)
                + b"IHDR"
                + struct.pack(">II", w, h)
                + bytes([depth, ctype])
            )

        rows = [
            (1, png_hdr(640, 480)),
            (2, png_hdr(4096, 2160, depth=16, ctype=6)),
            (3, b"RIFFxxxxWAVE"),          # not a PNG
            (4, b"\x89PNG\r\n\x1a\n"),     # truncated: magic only
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {r.media_id: r for r in parse_png_header(df).collect()}
        assert got[1].is_png and (got[1].width, got[1].height) == (640, 480)
        assert got[1].bit_depth == 8 and got[1].color_type == 2
        assert got[2].width == 4096 and got[2].bit_depth == 16
        assert got[3].is_png is False and got[3].width is None
        assert got[4].is_png is False  # truncated fails the length gate

    def test_synth_roundtrip_matches_planted(self, spark):
        from pyspark.sql import functions as F

        from taxi_data_pipeline_pset2_spark.operators.multimodal import (
            parse_png_header,
            synth_png_header,
        )

        df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
        media = synth_png_header(
            df, "doc_id", 16 + (F.col("doc_id") * 7) % 1024,
            16 + (F.col("doc_id") * 13) % 768,
        )
        for r in parse_png_header(media).collect():
            assert r.is_png
            assert r.width == 16 + (r.media_id * 7) % 1024
            assert r.height == 16 + (r.media_id * 13) % 768

    def test_no_python_in_plan(self, spark):
        from pyspark.sql import functions as F

        from taxi_data_pipeline_pset2_spark.operators.multimodal import (
            parse_png_header,
            synth_png_header,
        )

        df = spark.createDataFrame([(1,)], "doc_id long")
        media = synth_png_header(df, "doc_id", F.lit(32), F.lit(32))
        plan = (
            parse_png_header(media)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_extract_features_null_payload_yields_null_metadata(spark):
    """r11: a NULL blob must produce a NULL-metadata row, not a
    batch-killing TypeError inside the Arrow kernel (the schema allows
    NULL payloads; the resize/frame kernels propagate None too)."""
    from taxi_data_pipeline_pset2_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    media = spark.createDataFrame(
        [(1, b"abc", "image/png", 3), (2, None, "image/png", None)],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert rows[1].content_sha is not None and len(rows[1].features) == 8
    assert rows[2].content_sha is None and rows[2].features is None


def test_resize_and_frames_propagate_null_payloads(spark):
    """NULL blobs come out as NULL resized bytes / NULL frames+shas, not
    as zero-byte images or sha-of-empty frames (extract_features'
    discipline, aligned across all three media kernels)."""
    from taxi_data_pipeline_pset2_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
        sample_frames,
    )

    media = spark.createDataFrame(
        [(1, b"somebytes", "video/mp4", 9), (2, None, "video/mp4", None)],
        MEDIA_SCHEMA,
    )
    rs = {r.media_id: r for r in resize_media(media, 4, 4).collect()}
    assert len(rs[1].resized) == 16
    assert rs[2].resized is None
    fr = sample_frames(media, n_frames=2).collect()
    by_id = {}
    for r in fr:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[2]) == 2  # the frame spine survives
    assert all(r.frame is None and r.frame_sha is None for r in by_id[2])
    assert all(r.frame is not None and r.frame_sha is not None for r in by_id[1])
