"""Incremental rollup maintenance: refresh of touched months must equal
a full rebuild, while untouched partitions are neither rescanned nor
rewritten (verified via file mtimes)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.rollup import (
    full_rollup,
    refresh_rollup,
)
from taxi_data_pipeline_pset2_spark.sources.sinks import month_partitioned_ingest


def _agg(fact):
    return fact.groupBy("load_month", "kind").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
    )


def _snapshot(path):
    return {
        os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    }


def test_refresh_equals_full_rebuild_and_skips_history(spark, tmp_path):
    fact = str(tmp_path / "fact")
    roll = str(tmp_path / "roll")
    jan = [(i, dt.datetime(2024, 1, 1 + i % 20), "a" if i % 2 else "b", float(i)) for i in range(40)]
    feb = [(100 + i, dt.datetime(2024, 2, 1 + i % 20), "a", float(i) * 2) for i in range(30)]
    schema = "id long, ts timestamp, kind string, value double"
    month_partitioned_ingest(spark, spark.createDataFrame(jan + feb, schema), fact, "ts")
    full_rollup(spark, fact, roll, _agg)
    jan_files_before = {
        k: v for k, v in _snapshot(roll).items() if "load_month=2024-01" in k
    }
    assert jan_files_before

    # backfill: February restated, March arrives
    feb2 = [(200 + i, dt.datetime(2024, 2, 5), "b", 1.5) for i in range(10)]
    mar = [(300 + i, dt.datetime(2024, 3, 3), "a", 7.0) for i in range(5)]
    month_partitioned_ingest(spark, spark.createDataFrame(feb2 + mar, schema), fact, "ts")
    refresh_rollup(spark, fact, roll, _agg, months=["2024-02", "2024-03"])

    got = {
        (r.load_month, r.kind): (r.n, r.total)
        for r in spark.read.parquet(roll).collect()
    }
    scratch = str(tmp_path / "scratch")
    full_rollup(spark, fact, scratch, _agg)
    want = {
        (r.load_month, r.kind): (r.n, r.total)
        for r in spark.read.parquet(scratch).collect()
    }
    assert got == want  # incremental == full rebuild
    assert {m for m, _ in got} == {"2024-01", "2024-02", "2024-03"}
    # January partition untouched by the refresh: same files, same mtimes
    jan_files_after = {
        k: v for k, v in _snapshot(roll).items() if "load_month=2024-01" in k
    }
    assert jan_files_after == jan_files_before


def test_refresh_requires_partition_column(spark, tmp_path):
    import pytest

    fact = str(tmp_path / "fact2")
    month_partitioned_ingest(
        spark,
        spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), "a", 1.0)],
            "id long, ts timestamp, kind string, value double",
        ),
        fact,
        "ts",
    )
    with pytest.raises(ValueError, match="load_month"):
        refresh_rollup(
            spark, fact, str(tmp_path / "r2"),
            lambda f: f.groupBy("kind").count(), ["2024-01"],
        )
