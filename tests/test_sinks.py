"""Sink semantics: atomic replace, clustered layout, idempotent monthly
partition overwrite (SURVEY.md S5-S8, X1, 2.11)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.sources.manifest import coverage_gaps
from taxi_data_pipeline_pset2_spark.sources.sinks import (
    atomic_overwrite,
    clustered_write,
    export_csv,
    month_partitioned_ingest,
)


def test_atomic_overwrite_swaps_and_survives_failure(spark, tmp_path):
    path = str(tmp_path / "tbl")
    atomic_overwrite(spark.range(10), path)
    assert spark.read.parquet(path).count() == 10
    atomic_overwrite(spark.range(25), path)
    assert spark.read.parquet(path).count() == 25
    # a failing write must leave the previous table fully readable
    poisoned = spark.range(5).select(
        F.when(F.col("id") < 99, F.col("id"))
        .otherwise(F.raise_error("boom"))
        .alias("id"),
        F.raise_error("boom").alias("bad"),
    )
    with pytest.raises(Exception):
        atomic_overwrite(poisoned, path)
    assert spark.read.parquet(path).select("id").count() == 25
    # no staging/backup debris
    parent = os.path.dirname(path)
    assert [d for d in os.listdir(parent) if "__staging" in d or "__old" in d] == []


def test_atomic_overwrite_restores_backup_on_swap_failure(spark, tmp_path, monkeypatch):
    """Failure injected BETWEEN the two renames: path has been moved to
    backup, the staging->path swap fails. The backup is the only copy of
    the old table at that instant -- it must be restored, not deleted."""
    import taxi_data_pipeline_pset2_spark.sources.sinks as sinks

    path = str(tmp_path / "tbl")
    atomic_overwrite(spark.range(25), path)
    real_rename = os.rename

    def failing_rename(src, dst):
        if "__staging" in src and dst == path:
            raise OSError("injected failure between the two renames")
        return real_rename(src, dst)

    monkeypatch.setattr(sinks.os, "rename", failing_rename)
    with pytest.raises(OSError, match="injected"):
        atomic_overwrite(spark.range(99), path)
    monkeypatch.undo()
    assert spark.read.parquet(path).count() == 25  # original table survived
    parent = os.path.dirname(path)
    assert [d for d in os.listdir(parent) if "__staging" in d or "__old" in d] == []


def test_clustered_write_layout(spark, sf_smoke_dir, tmp_path):
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    path = str(tmp_path / "gold")
    orders = load_table(spark, sf_smoke_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    clustered_write(orders, path, partition_by=("o_year",), sort_by=("o_orderdate",))
    parts = [d for d in os.listdir(path) if d.startswith("o_year=")]
    assert len(parts) > 1
    # pruned reads must stay parallel: the range-repartition spreads each
    # partition dir over multiple files (one giant file would serialize
    # the very scan clustering is meant to speed up)
    files_per_part = [
        len([f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")])
        for d in parts
    ]
    assert max(files_per_part) > 1, files_per_part
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # partition pruning: a single-year predicate reads a single directory
    plan = (
        back.filter(F.col("o_year") == 2024)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan or back.filter(F.col("o_year") == 2024).count() > 0


def test_month_partitioned_ingest_is_idempotent_per_month(spark, tmp_path):
    path = str(tmp_path / "bronze")
    rows = [
        (1, dt.datetime(2024, 1, 5)),
        (2, dt.datetime(2024, 1, 20)),
        (3, dt.datetime(2024, 2, 3)),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    month_partitioned_ingest(spark, df, path, "ts")
    assert spark.read.parquet(path).count() == 3
    # re-ingest ONLY February with different content: January untouched
    feb2 = spark.createDataFrame(
        [(30, dt.datetime(2024, 2, 7)), (31, dt.datetime(2024, 2, 8))],
        "id long, ts timestamp",
    )
    month_partitioned_ingest(spark, feb2, path, "ts")
    back = spark.read.parquet(path)
    assert back.count() == 4  # 2 jan + 2 new feb
    assert {r.id for r in back.collect()} == {1, 2, 30, 31}


def test_export_csv_single_file(spark, tmp_path):
    path = str(tmp_path / "out_csv")
    export_csv(spark.range(7).withColumn("x", F.col("id") * 2), path)
    files = [f for f in os.listdir(path) if f.endswith(".csv")]
    assert len(files) == 1
    assert spark.read.option("header", True).csv(path).count() == 7


def test_coverage_gaps_detects_missing_period(spark):
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 10)),
            (2, dt.datetime(2024, 3, 2)),
        ],
        "id long, ts timestamp",
    )
    gaps = coverage_gaps(df, "ts", "2024-01-01", "2024-03-31", unit="month").collect()
    assert [r.missing_period for r in gaps] == ["2024-02-01"]
    assert all(r.status == "brecha" for r in gaps)


def test_read_csv_quarantine_splits_good_and_bad(spark, tmp_path):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from taxi_data_pipeline_pset2_spark.sources.readers import read_csv_quarantine

    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,amount\n"
        "1,alpha,10.5\n"
        "2,beta,not_a_number\n"   # type failure -> quarantined
        "3,gamma,7.25\n"
        "4,delta,1.0,EXTRA_COL\n"  # arity failure -> quarantined
        "5,epsilon,3.5\n"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("amount", DoubleType()),
        ]
    )
    good, bad = read_csv_quarantine(spark, str(p), schema)
    assert {r.id for r in good.collect()} == {1, 3, 5}
    raw = {r.raw_record for r in bad.collect()}
    assert raw == {"2,beta,not_a_number", "4,delta,1.0,EXTRA_COL"}
    # clean rows keep full typed values
    assert {r.amount for r in good.collect()} == {10.5, 7.25, 3.5}


def test_merge_upsert_update_insert_delete(spark, tmp_path):
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.sources.sinks import merge_upsert

    path = str(tmp_path / "merge_tbl")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    ).write.parquet(path)

    updates = spark.createDataFrame(
        [(2, "b2", 25.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    merge_upsert(spark, path, updates, ("id",))
    got = {r.id: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    # delete clause: drop rows with v >= 30 during the next merge
    merge_upsert(
        spark, path,
        spark.createDataFrame([(1, "a2", 11.0)], "id long, name string, v double"),
        ("id",),
        delete_pred=F.col("v") >= 30.0,
    )
    got = {r.id: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a2", 11.0), 2: ("b2", 25.0)}

    # schema mismatch is refused before any write
    import pytest

    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(
            spark, path,
            spark.createDataFrame([(9, "x")], "id long, name string"),
            ("id",),
        )


def _partition_file_state(path: str, dirname: str) -> dict:
    """(relative file -> (size, mtime_ns)) for one partition directory."""
    d = os.path.join(path, dirname)
    return {
        f: (os.path.getsize(os.path.join(d, f)), os.stat(os.path.join(d, f)).st_mtime_ns)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    }


def _make_partitioned_table(spark, path: str) -> None:
    spark.createDataFrame(
        [
            (1, "a", 10.0, "2024-01"),
            (2, "b", 20.0, "2024-01"),
            (3, "c", 30.0, "2024-02"),
            (4, "d", 40.0, "2024-02"),
            (5, "e", 50.0, "2024-03"),
        ],
        "id long, name string, v double, month string",
    ).write.partitionBy("month").parquet(path)


def test_merge_upsert_partitioned_touches_only_affected(spark, tmp_path):
    """The 100 TB contract: merging one month must leave every other
    month's files untouched ON DISK (same bytes, same mtimes)."""
    from taxi_data_pipeline_pset2_spark.sources.sinks import merge_upsert_partitioned

    path = str(tmp_path / "ptbl")
    _make_partitioned_table(spark, path)
    before_feb = _partition_file_state(path, "month=2024-02")
    before_mar = _partition_file_state(path, "month=2024-03")

    updates = spark.createDataFrame(
        [
            (2, "b2", 21.0, "2024-01"),  # update in-place
            (6, "f", 60.0, "2024-01"),  # insert into existing partition
            (7, "g", 70.0, "2024-04"),  # insert into brand-new partition
        ],
        "id long, name string, v double, month string",
    )
    merge_upsert_partitioned(spark, path, updates, ("id",), "month")

    got = {r.id: (r.name, r.v, r.month) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a", 10.0, "2024-01"),
        2: ("b2", 21.0, "2024-01"),
        3: ("c", 30.0, "2024-02"),
        4: ("d", 40.0, "2024-02"),
        5: ("e", 50.0, "2024-03"),
        6: ("f", 60.0, "2024-01"),
        7: ("g", 70.0, "2024-04"),
    }
    # untouched partitions: identical files, sizes AND mtimes
    assert _partition_file_state(path, "month=2024-02") == before_feb
    assert _partition_file_state(path, "month=2024-03") == before_mar


def test_merge_upsert_partitioned_delete_can_empty_partition(spark, tmp_path):
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.sources.sinks import merge_upsert_partitioned

    path = str(tmp_path / "ptbl_del")
    _make_partitioned_table(spark, path)
    before_mar = _partition_file_state(path, "month=2024-03")

    # the delete predicate wipes every 2024-02 row; NULL-pred rows survive
    updates = spark.createDataFrame(
        [(3, "c", 30.0, "2024-02"), (4, "d", 40.0, "2024-02")],
        "id long, name string, v double, month string",
    )
    merge_upsert_partitioned(
        spark, path, updates, ("id",), "month", delete_pred=F.col("v") >= 0.0
    )
    assert not os.path.exists(os.path.join(path, "month=2024-02"))
    got = {r.id for r in spark.read.parquet(path).collect()}
    assert got == {1, 2, 5}
    assert _partition_file_state(path, "month=2024-03") == before_mar


def test_merge_upsert_partitioned_swap_failure_rolls_back(spark, tmp_path, monkeypatch):
    """A failure mid-swap must restore every partition to its pre-merge
    state -- no half-merged table."""
    from taxi_data_pipeline_pset2_spark.sources import sinks

    path = str(tmp_path / "ptbl_rb")
    _make_partitioned_table(spark, path)
    before = {r.id: (r.name, r.v, r.month) for r in spark.read.parquet(path).collect()}

    updates = spark.createDataFrame(
        [(1, "a2", 11.0, "2024-01"), (3, "c2", 31.0, "2024-02")],
        "id long, name string, v double, month string",
    )

    real_rename = os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        # let the first partition's swap (move-aside + move-in) succeed,
        # then fail while the second partition is mid-swap
        calls["n"] += 1
        if calls["n"] == 3:
            raise OSError("injected swap failure")
        return real_rename(src, dst)

    monkeypatch.setattr(sinks.os, "rename", failing_rename)
    import pytest as _pytest

    with _pytest.raises(OSError, match="injected"):
        sinks.merge_upsert_partitioned(spark, path, updates, ("id",), "month")
    monkeypatch.undo()

    after = {r.id: (r.name, r.v, r.month) for r in spark.read.parquet(path).collect()}
    assert after == before


def test_merge_upsert_partitioned_int_partition_column(spark, tmp_path):
    """Directory-name resolution must hold for non-string partition
    types (Spark renders int partitions as <col>=<int>)."""
    from taxi_data_pipeline_pset2_spark.sources.sinks import merge_upsert_partitioned

    path = str(tmp_path / "ptbl_int")
    spark.createDataFrame(
        [(1, "a", 2023), (2, "b", 2023), (3, "c", 2024)],
        "id long, name string, yr int",
    ).write.partitionBy("yr").parquet(path)
    before_2024 = _partition_file_state(path, "yr=2024")

    updates = spark.createDataFrame(
        [(2, "b2", 2023), (9, "z", 2025)], "id long, name string, yr int"
    )
    merge_upsert_partitioned(spark, path, updates, ("id",), "yr")
    got = {r.id: (r.name, r.yr) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 2023), 2: ("b2", 2023), 3: ("c", 2024), 9: ("z", 2025)}
    assert _partition_file_state(path, "yr=2024") == before_2024
