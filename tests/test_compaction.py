"""Small-file compaction: fragmented partitions collapse, data and
partition semantics survive, healthy partitions stay byte-identical."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.compaction import compact_partitions


def test_compaction_collapses_fragmented_partition_only(spark, tmp_path):
    path = str(tmp_path / "tbl")
    schema = "id long, ts timestamp, value double"
    # January arrives in 6 tiny appends -> 6+ files in one partition
    for i in range(6):
        (
            spark.createDataFrame(
                [
                    (i * 10 + j, dt.datetime(2024, 1, 1 + j), float(j))
                    for j in range(5)
                ],
                schema,
            )
            .coalesce(1)
            .withColumn("load_month", F.lit("2024-01"))
            .write.mode("append")
            .partitionBy("load_month")
            .parquet(path)
        )
    # February arrives once (healthy partition)
    month_feb = spark.createDataFrame(
        [(100 + j, dt.datetime(2024, 2, 1 + j), 1.0) for j in range(5)], schema
    ).coalesce(1).withColumn("load_month", F.lit("2024-02"))
    month_feb.write.mode("append").partitionBy("load_month").parquet(path)

    # materialize BEFORE compacting: the lazy plan pins the old file
    # listing, which atomic_overwrite replaces
    before_ids = {r.id for r in spark.read.parquet(path).collect()}
    n_before = len(before_ids)
    jan_dir = os.path.join(path, "load_month=2024-01")
    feb_dir = os.path.join(path, "load_month=2024-02")
    assert len([f for f in os.listdir(jan_dir) if f.endswith(".parquet")]) >= 6
    feb_files = {
        f: os.path.getmtime(os.path.join(feb_dir, f)) for f in os.listdir(feb_dir)
    }

    results = compact_partitions(spark, path, min_files_to_compact=4)
    assert [r.partition for r in results] == ["load_month=2024-01"]
    assert results[0].files_after < results[0].files_before
    assert (
        len([f for f in os.listdir(jan_dir) if f.endswith(".parquet")])
        == results[0].files_after
        == 1  # tiny partition -> one size-justified file
    )
    # healthy partition untouched, byte-stable
    assert {
        f: os.path.getmtime(os.path.join(feb_dir, f)) for f in os.listdir(feb_dir)
    } == feb_files

    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert {r.id for r in after.collect()} == before_ids
    # partition column still discoverable and correct
    assert after.filter(F.col("load_month") == "2024-01").count() == 30

    # idempotent: second run finds nothing to do
    assert compact_partitions(spark, path, min_files_to_compact=4) == []
