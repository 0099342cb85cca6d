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


def _agg_basis(df):
    return df.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sum_v"),
    )


def test_changelog_maintenance_equals_recompute(spark):
    """apply_changelog_to_rollup: maintained rollup == full recompute on
    the new snapshot, covering inserts, in-place updates, group moves,
    deletes, a group emptied to zero, and a NULL group key."""
    from taxi_data_pipeline_pset2_spark.operators.cdc import snapshot_diff
    from taxi_data_pipeline_pset2_spark.operators.rollup import (
        apply_changelog_to_rollup,
    )

    old_rows = [
        (1, "a", 10), (2, "a", 20), (3, "b", 5),
        (4, "c", 7),               # group c will empty
        (5, None, 100), (6, None, 50),  # NULL cohort
    ]
    new_rows = [
        (1, "a", 10),              # unchanged
        (2, "b", 20),              # moved a -> b
        (3, "b", 9),               # value update
        (5, None, 120),            # NULL-group update
        (6, None, 50),
        (7, "a", 33), (8, "d", 1), # inserts (one into a new group)
    ]
    old = spark.createDataFrame(old_rows, "id int, g string, v int")
    new = spark.createDataFrame(new_rows, "id int, g string, v int")

    base = _agg_basis(old)
    log = snapshot_diff(old, new, ["id"], compare_cols=["g", "v"])
    maintained = apply_changelog_to_rollup(base, log, ["g"], ["v"])
    want = {
        (r.g, r.n, r.sum_v) for r in _agg_basis(new).collect()
    }
    got = {(r.g, r.n, r.sum_v) for r in maintained.collect()}
    assert got == want
    assert ("c", 1, 7) not in got  # emptied group dropped


def test_changelog_maintenance_noop_changelog(spark):
    from taxi_data_pipeline_pset2_spark.operators.cdc import snapshot_diff
    from taxi_data_pipeline_pset2_spark.operators.rollup import (
        apply_changelog_to_rollup,
    )

    rows = [(1, "a", 10), (2, "b", 20)]
    df = spark.createDataFrame(rows, "id int, g string, v int")
    base = _agg_basis(df)
    log = snapshot_diff(df, df, ["id"], compare_cols=["g", "v"])
    out = apply_changelog_to_rollup(base, log, ["g"], ["v"])
    assert {(r.g, r.n, r.sum_v) for r in out.collect()} == {
        (r.g, r.n, r.sum_v) for r in base.collect()
    }
