"""Gini, entropy, and ABC-classification tests against closed forms."""

import math

import pytest

from taxi_data_pipeline_pset2_spark.operators.segmentation import (
    abc_classification,
)
from taxi_data_pipeline_pset2_spark.operators.stats import (
    gini_coefficient,
    group_entropy,
)


class TestGini:
    def test_perfect_equality_zero(self, spark):
        df = spark.createDataFrame([(10.0,)] * 8, "x double")
        r = gini_coefficient(df, "x").collect()[0]
        assert r.gini == pytest.approx(0.0, abs=1e-9)
        assert r.n == 8 and r.total == pytest.approx(80.0)

    def test_total_concentration(self, spark):
        # one unit holds everything: G = (n-1)/n
        df = spark.createDataFrame(
            [(0.0,)] * 9 + [(100.0,)], "x double"
        )
        r = gini_coefficient(df, "x").collect()[0]
        assert r.gini == pytest.approx(0.9, abs=1e-9)

    def test_reference_value(self, spark):
        vals = [1.0, 2.0, 3.0, 4.0, 10.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        r = gini_coefficient(df, "x").collect()[0]
        n, s = len(vals), sum(vals)
        six = sum((i + 1) * v for i, v in enumerate(sorted(vals)))
        ref = (2 * six - (n + 1) * s) / (n * s)
        assert r.gini == pytest.approx(ref, abs=1e-9)

    def test_groups_and_zero_total(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("b", 0.0), ("b", 0.0)],
            "g string, x double",
        )
        out = {r.g: r for r in gini_coefficient(df, "x", ["g"]).collect()}
        assert out["a"].gini == pytest.approx(0.0)
        assert out["b"].gini is None


class TestGroupEntropy:
    def test_uniform_max_entropy(self, spark):
        df = spark.createDataFrame(
            [("g", c) for c in "abcd" for _ in range(5)], "g string, c string"
        )
        r = group_entropy(df, "c", ["g"]).collect()[0]
        assert r.k == 4 and r.n == 20
        assert r.entropy == pytest.approx(math.log(4), abs=1e-5)
        assert r.norm_entropy == pytest.approx(1.0, abs=1e-5)

    def test_single_category_zero(self, spark):
        df = spark.createDataFrame([("g", "a")] * 7, "g string, c string")
        r = group_entropy(df, "c", ["g"]).collect()[0]
        assert r.entropy == pytest.approx(0.0, abs=1e-6)
        assert r.norm_entropy == 0.0

    def test_skewed_reference(self, spark):
        # 9x a, 1x b: H = -(0.9 ln 0.9 + 0.1 ln 0.1)
        df = spark.createDataFrame(
            [("g", "a")] * 9 + [("g", "b")], "g string, c string"
        )
        r = group_entropy(df, "c", ["g"]).collect()[0]
        ref = -(0.9 * math.log(0.9) + 0.1 * math.log(0.1))
        assert r.entropy == pytest.approx(ref, abs=1e-5)

    def test_null_is_a_category(self, spark):
        df = spark.createDataFrame(
            [("g", "a"), ("g", None)], "g string, c string"
        )
        r = group_entropy(df, "c", ["g"]).collect()[0]
        assert r.k == 2
        assert r.entropy == pytest.approx(math.log(2), abs=1e-5)


class TestAbcClassification:
    def test_classes_and_shares(self, spark):
        # values 70, 15, 10, 5: cum shares .70 (A) .85 (B... wait:
        # A<=0.8 -> 70 A; 85 B? cum .85 <= .95 -> B; .95 -> B; 1.0 -> C
        rows = [("w", 70.0), ("x", 15.0), ("y", 10.0), ("z", 5.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = {r.key: r for r in abc_classification(df, "k", "v").collect()}
        assert out["w"].abc_class == "A" and out["w"].rank == 1
        assert out["x"].abc_class == "B"
        assert out["y"].abc_class == "B"  # cum 0.95 <= 0.95
        assert out["z"].abc_class == "C"
        assert out["w"].share == pytest.approx(0.7)
        assert out["z"].cum_share == pytest.approx(1.0)

    def test_aggregates_per_key(self, spark):
        df = spark.createDataFrame(
            [("a", 5.0), ("a", 5.0), ("b", 2.0)], "k string, v double"
        )
        out = {r.key: r for r in abc_classification(df, "k", "v").collect()}
        assert out["a"].value == pytest.approx(10.0)
        assert out["a"].rank == 1 and out["b"].rank == 2

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "k string, v double")
        with pytest.raises(ValueError):
            abc_classification(df, "k", "v", a_cut=0.9, b_cut=0.8)
