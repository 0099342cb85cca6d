"""Privacy + reconciliation operators: pseudonym determinism and join
survival, k-anonymity semantics, checksum order/partition independence
and sensitivity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.audit import (
    row_fingerprints,
    table_checksum,
)
from taxi_data_pipeline_pset2_spark.operators.privacy import (
    k_anonymity,
    pseudonymize,
)


class TestPseudonymize:
    def test_deterministic_and_joins_survive(self, spark):
        a = spark.createDataFrame(
            [("alice", 1), ("bob", 2), ("alice", 3)], "name string, x long"
        )
        b = spark.createDataFrame(
            [("alice", "US"), ("carol", "DE")], "name string, cc string"
        )
        pa = pseudonymize(a, ["name"], salt="s1")
        pb = pseudonymize(b, ["name"], salt="s1")
        joined = pa.join(pb, "name")
        assert joined.count() == 2  # both alice rows still match
        toks = {r.name for r in pa.collect()}
        assert "alice" not in toks and all(len(t) == 16 for t in toks)
        # same value -> same token
        assert pa.select("name").distinct().count() == 2

    def test_salt_rotation_breaks_linkage(self, spark):
        df = spark.createDataFrame([("alice",)], "name string")
        t1 = pseudonymize(df, ["name"], salt="rel1").collect()[0].name
        t2 = pseudonymize(df, ["name"], salt="rel2").collect()[0].name
        assert t1 != t2

    def test_null_stays_null_and_validation(self, spark):
        df = spark.createDataFrame([(None,), ("x",)], "name string")
        rows = pseudonymize(df, ["name"], salt="s").collect()
        assert sorted([r.name is None for r in rows]) == [False, True]
        with pytest.raises(ValueError, match="length"):
            pseudonymize(df, ["name"], salt="s", length=4)


class TestKAnonymity:
    def test_small_cohorts_flagged(self, spark):
        rows = [("A", 1)] * 5 + [("A", 2)] * 2 + [("B", 1)] + [(None, 1)] * 3
        df = spark.createDataFrame(rows, "seg string, nat long")
        got = {
            (r.seg, r.nat): r.n
            for r in k_anonymity(df, ["seg", "nat"], k=5).collect()
        }
        # (A,1) has 5 -> anonymous; the rest are risky cohorts
        assert got == {("A", 2): 2, ("B", 1): 1, (None, 1): 3}

    def test_validation(self, spark):
        df = spark.createDataFrame([("x",)], "a string")
        with pytest.raises(ValueError, match="k must be"):
            k_anonymity(df, ["a"], k=1)


class TestTableChecksum:
    def test_order_and_partitioning_independent(self, spark):
        rows = [(i, f"v{i % 7}") for i in range(500)]
        df1 = spark.createDataFrame(rows, "k long, v string")
        df2 = spark.createDataFrame(list(reversed(rows)), "k long, v string").repartition(13)
        c1 = table_checksum(df1).collect()[0]
        c2 = table_checksum(df2).collect()[0]
        assert (c1.n_rows, c1.checksum) == (c2.n_rows, c2.checksum)

    def test_single_changed_row_changes_checksum(self, spark):
        rows = [(i, "a") for i in range(100)]
        base = table_checksum(
            spark.createDataFrame(rows, "k long, v string")
        ).collect()[0]
        rows[50] = (50, "b")
        changed = table_checksum(
            spark.createDataFrame(rows, "k long, v string")
        ).collect()[0]
        assert base.checksum != changed.checksum
        assert base.n_rows == changed.n_rows

    def test_duplicates_count_multiply(self, spark):
        one = spark.createDataFrame([(1, "a")], "k long, v string")
        two = spark.createDataFrame([(1, "a"), (1, "a")], "k long, v string")
        assert (
            table_checksum(one).collect()[0].checksum
            != table_checksum(two).collect()[0].checksum
        )

    def test_null_and_separator_traps_all_distinct(self, spark):
        """r11 length-prefix encoding: every boundary trap now hashes
        distinctly -- NULL vs any string (including the old sentinel),
        ('aNULL', x) vs ('a', NULLx), and the separator-shift pair
        ('a\\x01b', 'c') vs ('a', 'b\\x01c') that collided under the
        bare-separator scheme."""

        def cs(rows):
            df = spark.createDataFrame(rows, "u string, v string")
            return table_checksum(df).collect()[0].checksum

        assert cs([("x", None)]) != cs([("x", "\x02NULL\x02")])
        assert cs([("x", None)]) != cs([("x", "N")])
        assert cs([("x" + "\x02NULL\x02", "y")]) != cs([("x", "\x02NULL\x02y")])
        # the r11 finding: separator inside a field must not shift
        # field boundaries
        assert cs([("a\x01b", "c")]) != cs([("a", "b\x01c")])
        # length-prefix text must not be forgeable from inside a value
        assert cs([("1:a", "b")]) != cs([("1:a\x011:b", None)])

    def test_fingerprints_join_back(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        fp = row_fingerprints(df, ["k", "v"])
        assert fp.select("row_fp").distinct().count() == 2
