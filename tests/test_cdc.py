"""Snapshot-diff CDC: change classification, NULL-safe compares,
include_unchanged, column validation, and composition with merge."""

from __future__ import annotations

import pytest

from taxi_data_pipeline_pset2_spark.operators.cdc import snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, status string, amount double")


def test_change_classification(spark):
    old = _snap(spark, [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0), (4, None, 40.0)])
    new = _snap(
        spark,
        [
            (1, "A", 10.0),      # unchanged
            (2, "B2", 20.0),     # update (status)
            (4, None, 40.0),     # unchanged (NULL == NULL is "no change")
            (5, "E", 50.0),      # insert
        ],
    )
    got = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(got) == {2, 3, 5}
    assert got[2].change_type == "update"
    assert got[2].old_status == "B" and got[2].new_status == "B2"
    assert got[3].change_type == "delete" and got[3].new_status is None
    assert got[5].change_type == "insert" and got[5].old_status is None

    # NULL -> value and value -> NULL are both updates
    old2 = _snap(spark, [(1, None, 1.0), (2, "X", 1.0)])
    new2 = _snap(spark, [(1, "Y", 1.0), (2, None, 1.0)])
    types = {r.k: r.change_type for r in snapshot_diff(old2, new2, ["k"]).collect()}
    assert types == {1: "update", 2: "update"}


def test_include_unchanged_and_subset_columns(spark):
    old = _snap(spark, [(1, "A", 10.0), (2, "B", 20.0)])
    new = _snap(spark, [(1, "A", 99.0), (2, "B", 20.0)])
    # only status compared: amount restatement is "unchanged"
    rows = snapshot_diff(
        old, new, ["k"], compare_cols=["status"], include_unchanged=True
    ).collect()
    assert {r.k: r.change_type for r in rows} == {1: "unchanged", 2: "unchanged"}
    # full compare flags the amount change
    assert {
        r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()
    } == {1: "update"}


def test_missing_column_rejected(spark):
    old = _snap(spark, [(1, "A", 1.0)])
    new = old.drop("amount")
    with pytest.raises(ValueError, match="absent"):
        snapshot_diff(old, new, ["k"], compare_cols=["amount"])


def test_changelog_feeds_merge(spark, tmp_path):
    """The emitted delta drives merge_upsert to reproduce the new
    snapshot exactly -- the CDC -> MERGE contract."""
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.sources.sinks import merge_upsert

    old = _snap(spark, [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0)])
    new = _snap(spark, [(2, "B2", 20.0), (3, "C", 30.0), (4, "D", 40.0)])
    target = str(tmp_path / "dim")
    old.write.parquet(target)

    delta = snapshot_diff(old, new, ["k"])
    upserts = delta.filter(F.col("change_type") != "delete").select(
        "k",
        F.col("new_status").alias("status"),
        F.col("new_amount").alias("amount"),
    )
    merge_upsert(
        spark,
        target,
        upserts,
        key_cols=["k"],
        delete_pred=F.lit(False),
    )
    # apply deletes via the delta's delete keys
    dels = {r.k for r in delta.filter(F.col("change_type") == "delete").collect()}
    got = {
        (r.k, r.status, r.amount)
        for r in spark.read.parquet(target).collect()
        if r.k not in dels
    }
    want = {(2, "B2", 20.0), (3, "C", 30.0), (4, "D", 40.0)}
    assert got == want


def test_snapshot_diff_matches_bruteforce(spark):
    """Property: classification agrees with a dict-based reference on
    random snapshot pairs (including NULLs and disjoint key sets)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vals = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
    snap = st.dictionaries(st.integers(0, 12), vals, max_size=10)

    @given(old=snap, new=snap)
    @settings(max_examples=10, deadline=None)
    def run(old, new):
        odf = spark.createDataFrame(
            [(k, v) for k, v in old.items()], "k long, v string"
        ) if old else spark.createDataFrame([], "k long, v string")
        ndf = spark.createDataFrame(
            [(k, v) for k, v in new.items()], "k long, v string"
        ) if new else spark.createDataFrame([], "k long, v string")
        got = {
            r.k: r.change_type
            for r in snapshot_diff(odf, ndf, ["k"], include_unchanged=True).collect()
        }
        want = {}
        for k in set(old) | set(new):
            if k not in old:
                want[k] = "insert"
            elif k not in new:
                want[k] = "delete"
            elif old[k] != new[k]:
                want[k] = "update"
            else:
                want[k] = "unchanged"
        assert got == want

    run()


def test_snapshot_diff_null_keys_and_empty_compare_cols(spark):
    """A NULL-keyed row present in both snapshots is ONE row (NULL-safe
    join), and an explicit compare_cols=[] is a presence-only diff, not
    'compare everything'."""
    from taxi_data_pipeline_pset2_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(None, "x"), (1, "a")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(None, "x"), (1, "b")], "k int, v string"
    )
    out = {r.k: r.change_type for r in
           snapshot_diff(old, new, ["k"], include_unchanged=True).collect()}
    assert out == {None: "unchanged", 1: "update"}
    # presence-only: attribute churn must not surface as an update
    out2 = {r.k: r.change_type for r in
            snapshot_diff(old, new, ["k"], compare_cols=[],
                          include_unchanged=True).collect()}
    assert out2 == {None: "unchanged", 1: "unchanged"}
