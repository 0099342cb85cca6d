"""SCD2 snapshot collapsing: version boundaries, half-open intervals,
NULL-safe change detection, dbt-default deletion semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.plans.scd import scd2_from_snapshots

T1, T2, T3 = (dt.datetime(2024, m, 1) for m in (1, 2, 3))


def _snapshots(spark):
    rows = [
        # key 1: never changes -> one open version
        (1, "gold", "NYC", T1), (1, "gold", "NYC", T2), (1, "gold", "NYC", T3),
        # key 2: segment changes at T2 -> two versions
        (2, "silver", "BOS", T1), (2, "gold", "BOS", T2), (2, "gold", "BOS", T3),
        # key 3: appears at T2 (late arrival)
        (3, "bronze", "SFO", T2), (3, "bronze", "SFO", T3),
        # key 4: NULL -> value at T3 is a change; NULL == NULL is not
        (4, None, "LAX", T1), (4, None, "LAX", T2), (4, "silver", "LAX", T3),
        # key 5: present only at T1 (deleted upstream) -> stays open
        (5, "gold", "CHI", T1),
    ]
    return spark.createDataFrame(
        rows, "cust_id long, segment string, city string, snapshot_ts timestamp"
    )


def test_scd2_versions_and_intervals(spark):
    out = scd2_from_snapshots(
        _snapshots(spark), key_cols=["cust_id"], attr_cols=["segment", "city"]
    )
    rows = {(r.cust_id, r.effective_from): r for r in out.collect()}
    assert out.count() == 7  # 1 + 2 + 1 + 2 + 1 versions

    assert rows[(1, T1)].is_current and rows[(1, T1)].effective_to is None

    v1, v2 = rows[(2, T1)], rows[(2, T2)]
    assert v1.segment == "silver" and v1.effective_to == T2 and not v1.is_current
    assert v2.segment == "gold" and v2.effective_to is None and v2.is_current

    assert rows[(3, T2)].effective_from == T2 and rows[(3, T2)].is_current

    n1, n2 = rows[(4, T1)], rows[(4, T3)]
    assert n1.segment is None and n1.effective_to == T3  # NULL==NULL: no split at T2
    assert n2.segment == "silver" and n2.is_current

    assert rows[(5, T1)].is_current  # dbt-default: deletion keeps it open

    # half-open intervals: per key, effective_from strictly increasing and
    # each effective_to equals the next effective_from
    for key in (1, 2, 3, 4, 5):
        vs = sorted(
            (r for (k, _), r in rows.items() if k == key),
            key=lambda r: r.effective_from,
        )
        for a, b in zip(vs, vs[1:]):
            assert a.effective_to == b.effective_from
        assert vs[-1].effective_to is None


def test_scd2_supports_asof_fact_join(spark):
    """The history table must answer 'which version was in effect at
    event time' via the repo's as-of join."""
    from taxi_data_pipeline_pset2_spark.operators.asof import asof_join

    dim = scd2_from_snapshots(
        _snapshots(spark), key_cols=["cust_id"], attr_cols=["segment", "city"]
    )
    facts = spark.createDataFrame(
        [(100, 2, dt.datetime(2024, 1, 15)), (101, 2, dt.datetime(2024, 2, 15))],
        "event_id long, cust_id long, ts timestamp",
    )
    joined = asof_join(
        facts,
        dim.select("cust_id", F.col("effective_from").alias("ts"), "segment"),
        on="cust_id",
        left_ts="ts",
        right_ts="ts",
    )
    got = {r.event_id: r.segment_asof for r in joined.collect()}
    assert got == {100: "silver", 101: "gold"}


def test_as_of_reconstruction_is_identity_at_snapshot_times(spark):
    """scd2_as_of at each snapshot timestamp reproduces that snapshot's
    tracked attributes exactly; between snapshots it returns the prior
    version; before the first snapshot it returns nothing."""
    from taxi_data_pipeline_pset2_spark.plans.scd import (
        scd2_as_of,
        scd2_from_snapshots,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01", "x"), (1, "2024-02-01", "y"), (1, "2024-03-01", "y"),
        (2, "2024-01-01", "p"), (2, "2024-02-01", "p"), (2, "2024-03-01", "q"),
        (3, "2024-02-01", "m"),  # late-arriving key
    ]
    snaps = spark.createDataFrame(rows, "k int, ts string, attr string").select(
        "k", F.col("ts").cast("timestamp").alias("snapshot_ts"), "attr"
    )
    hist = scd2_from_snapshots(snaps, ["k"], ["attr"])

    def at(ts):
        return {(r.k, r.attr) for r in scd2_as_of(hist, ts).collect()}

    assert at("2024-01-01") == {(1, "x"), (2, "p")}
    assert at("2024-01-15") == {(1, "x"), (2, "p")}
    assert at("2024-02-01") == {(1, "y"), (2, "p"), (3, "m")}
    assert at("2024-03-01") == {(1, "y"), (2, "q"), (3, "m")}
    assert at("2030-01-01") == {(1, "y"), (2, "q"), (3, "m")}  # current
    assert at("2023-12-31") == set()


def test_apply_snapshot_chain_equals_rebuild(spark):
    """Applying snapshots one at a time == rebuilding from all of them,
    incl. new keys, attribute changes, NULL attrs/keys, and a key that
    disappears then returns unchanged."""
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.plans.scd import (
        scd2_apply_snapshot,
        scd2_from_snapshots,
    )

    snaps = {
        "2024-01-01": [(1, "x"), (2, "p"), (None, "n1")],
        "2024-02-01": [(1, "y"), (2, "p"), (3, "m"), (None, "n2")],
        "2024-03-01": [(1, "y"), (2, None), (3, "m"), (None, "n2")],
    }

    def snap_df(ts):
        return spark.createDataFrame(
            [(k, ts, a) for k, a in snaps[ts]], "k int, ts string, attr string"
        ).select("k", F.col("ts").cast("timestamp").alias("snapshot_ts"), "attr")

    all_snaps = None
    for ts in snaps:
        all_snaps = snap_df(ts) if all_snaps is None else all_snaps.unionByName(snap_df(ts))
    rebuilt = scd2_from_snapshots(all_snaps, ["k"], ["attr"])

    ts_list = list(snaps)
    hist = scd2_from_snapshots(snap_df(ts_list[0]), ["k"], ["attr"])
    for ts in ts_list[1:]:
        hist = scd2_apply_snapshot(
            hist, snap_df(ts).drop("snapshot_ts"), ["k"], ["attr"], ts
        )

    def canon(df):
        return {
            (r.k, r.attr, str(r.effective_from), str(r.effective_to), r.is_current)
            for r in df.collect()
        }

    assert canon(hist) == canon(rebuilt)
    # the disappearing-key scenario: drop key 2 in an extra snapshot;
    # its open row must survive untouched
    extra = spark.createDataFrame([(1, "y"), (3, "m")], "k int, attr string")
    hist2 = scd2_apply_snapshot(hist, extra, ["k"], ["attr"], "2024-04-01")
    k2 = [r for r in hist2.collect() if r.k == 2 and r.is_current]
    assert len(k2) == 1 and k2[0].attr is None


class TestInferMembers:
    def test_placeholders_and_flags(self, spark):
        from taxi_data_pipeline_pset2_spark.plans.scd import infer_members

        dim = spark.createDataFrame(
            [(1, "Alice", "A"), (2, "Bob", "B")], "k long, name string, seg string"
        )
        facts = spark.createDataFrame(
            [(1,), (3,), (3,), (4,), (None,)], "fk long"
        )
        out = infer_members(
            dim, facts, "k", "fk", defaults={"seg": "UNK"}
        ).collect()
        by = {r.k: r for r in out}
        assert set(by) == {1, 2, 3, 4}  # NULL fact key is not a member
        assert by[1].is_inferred is False and by[1].name == "Alice"
        assert by[3].is_inferred is True and by[3].name is None
        assert by[3].seg == "UNK" and by[4].seg == "UNK"

    def test_no_missing_keys_is_identity_plus_flag(self, spark):
        from taxi_data_pipeline_pset2_spark.plans.scd import infer_members

        dim = spark.createDataFrame([(1, "x")], "k long, v string")
        facts = spark.createDataFrame([(1,)], "fk long")
        out = infer_members(dim, facts, "k", "fk").collect()
        assert len(out) == 1 and out[0].is_inferred is False

    def test_unknown_default_column_rejected(self, spark):
        import pytest as _pytest

        from taxi_data_pipeline_pset2_spark.plans.scd import infer_members

        dim = spark.createDataFrame([(1, "x")], "k long, v string")
        with _pytest.raises(ValueError, match="non-dim"):
            infer_members(dim, dim, "k", "k", defaults={"nope": 1})

    def test_backfill_update_replaces_placeholder(self, spark):
        """The lifecycle claim: once real attributes arrive, an SCD
        apply against the same key supersedes the placeholder."""
        from taxi_data_pipeline_pset2_spark.plans.scd import infer_members

        dim = spark.createDataFrame([(1, "Alice")], "k long, name string")
        facts = spark.createDataFrame([(2,)], "fk long")
        with_ph = infer_members(dim, facts, "k", "fk")
        arrived = spark.createDataFrame([(2, "Carol")], "k long, name string")
        repaired = (
            with_ph.join(arrived.withColumnRenamed("name", "_n"), "k", "left")
            .select(
                "k",
                F.coalesce("_n", "name").alias("name"),
                (F.col("is_inferred") & F.col("_n").isNull()).alias("is_inferred"),
            )
        )
        by = {r.k: r for r in repaired.collect()}
        assert by[2].name == "Carol" and by[2].is_inferred is False


def test_apply_snapshot_rejects_duplicate_business_keys(spark):
    """A dirty extract carrying one key twice would fan the current row
    out in the join and emit TWO open is_current versions -- a silently
    corrupted dimension; the apply must fail loudly instead."""
    import pytest as _pytest
    from pyspark.sql.utils import CapturedException

    from taxi_data_pipeline_pset2_spark.plans.scd import (
        scd2_apply_snapshot,
        scd2_from_snapshots,
    )

    snaps = spark.createDataFrame(
        [(1, "a", "2024-01-01")], "k int, attr string, snapshot_ts string"
    ).withColumn("snapshot_ts", F.to_timestamp("snapshot_ts"))
    hist = scd2_from_snapshots(snaps, ["k"], ["attr"])
    dirty = spark.createDataFrame(
        [(1, "b"), (1, "c")], "k int, attr string"
    )
    with _pytest.raises(Exception, match="duplicate business key"):
        scd2_apply_snapshot(hist, dirty, ["k"], ["attr"], "2024-02-01").collect()


def test_from_snapshots_null_ts_does_not_split_versions(spark):
    """lag(ts).isNull() conflated 'first row' with 'previous row has a
    NULL snapshot_ts'; first-row detection is now positional, so a
    NULL-ts row with identical attributes does not split a spurious
    version."""
    from taxi_data_pipeline_pset2_spark.plans.scd import scd2_from_snapshots

    snaps = spark.createDataFrame(
        [(1, "a", None), (1, "a", "2024-01-02")],
        "k int, attr string, snapshot_ts string",
    ).withColumn("snapshot_ts", F.to_timestamp("snapshot_ts"))
    out = scd2_from_snapshots(snaps, ["k"], ["attr"]).collect()
    assert len(out) == 1 and out[0].is_current
