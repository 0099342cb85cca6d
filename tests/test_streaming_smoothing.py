"""Streaming EWMA: drained over per-file micro-batches it must equal
the batch ewma operator over the concatenated rows, bit-exactly."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.timeseries import ewma
from taxi_data_pipeline_pset2_spark.streaming.incremental import read_docs_stream
from taxi_data_pipeline_pset2_spark.streaming.smoothing import streaming_ewma


def _batches():
    # per-key ts monotone across batches (the file-source ingest-order
    # contract); unordered inside a batch to exercise the in-batch sort
    return [
        [(2, 1, "2024-01-01 00:02:00", 12.0), (1, 1, "2024-01-01 00:01:00", 10.0),
         (3, 2, "2024-01-01 00:01:00", 5.0)],
        [(4, 1, "2024-01-01 00:03:00", 9.0), (5, 2, "2024-01-01 00:02:00", 5.0)],
        [(6, 1, "2024-01-01 00:04:00", 30.0), (7, 2, "2024-01-01 00:03:00", 8.0)],
    ]


def _write_units(spark, base):
    flat = os.path.join(base, "flat")
    os.makedirs(flat)
    t0 = time.time() - 100
    n = 0
    for i, rows in enumerate(_batches()):
        unit = os.path.join(base, f"unit{i}")
        (
            spark.createDataFrame(
                rows, "event_id long, user_id long, ts string, value double"
            )
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(unit)
        )
        for f in sorted(os.listdir(unit)):
            if f.endswith(".parquet"):
                dst = os.path.join(flat, f"part-{i:03d}.parquet")
                os.rename(os.path.join(unit, f), dst)
                os.utime(dst, (t0 + n, t0 + n))
                n += 1
    return flat


def test_streaming_ewma_equals_batch_operator(spark, tmp_path):
    flat = _write_units(spark, str(tmp_path / "ev"))
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = read_docs_stream(spark, flat, max_files_per_trigger=1)
    q = (
        streaming_ewma(stream, alpha=0.3)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.event_id: (r.user_id, r.value, r.ewma)
        for r in spark.read.parquet(out_dir).collect()
    }

    all_rows = [r for b in _batches() for r in b]
    batch_df = spark.createDataFrame(
        all_rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = {
        r.event_id: (r.user_id, r.value, r.ewma)
        for r in ewma(
            batch_df, ["user_id"], "ts", "value", alpha=0.3,
            tie_cols=["event_id"],
        ).collect()
    }
    assert got == want  # bit-exact across the batch slicing
    assert len(got) == len(all_rows)  # one output row per event


def test_streaming_ewma_validates_alpha(spark, tmp_path):
    flat = _write_units(spark, str(tmp_path / "ev"))
    stream = read_docs_stream(spark, flat)
    with pytest.raises(ValueError):
        streaming_ewma(stream, alpha=0.0)
