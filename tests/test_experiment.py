"""Experiment plumbing: assignment determinism/balance/independence,
SRM detection, delta-method reference equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.experiment import (
    assign_variants,
    ratio_metric_delta,
    srm_check,
)


def _units(spark, n):
    return spark.range(n).select(F.col("id").alias("u"))


class TestAssignVariants:
    def test_deterministic_and_balanced(self, spark):
        df = _units(spark, 4000)
        w = {"a": 0.5, "b": 0.5}
        v1 = {r.u: r.variant for r in assign_variants(df, "u", w, "s1").collect()}
        v2 = {r.u: r.variant for r in assign_variants(df, "u", w, "s1").collect()}
        assert v1 == v2  # reshuffle-stable
        share = sum(1 for v in v1.values() if v == "a") / len(v1)
        assert 0.46 < share < 0.54

    def test_salt_independence(self, spark):
        df = _units(spark, 4000)
        w = {"a": 0.5, "b": 0.5}
        v1 = {r.u: r.variant for r in assign_variants(df, "u", w, "exp1").collect()}
        v2 = {r.u: r.variant for r in assign_variants(df, "u", w, "exp2").collect()}
        same = sum(1 for u in v1 if v1[u] == v2[u]) / len(v1)
        assert 0.45 < same < 0.55  # independent experiments

    def test_weighted_split_and_validation(self, spark):
        df = _units(spark, 6000)
        w = {"a": 0.1, "b": 0.9}
        counts = (
            assign_variants(df, "u", w, "s")
            .groupBy("variant").count().collect()
        )
        by = {r.variant: r["count"] for r in counts}
        assert 0.07 < by["a"] / 6000 < 0.13
        with pytest.raises(ValueError, match="sum to 1"):
            assign_variants(df, "u", {"a": 0.5}, "s")


class TestSrmCheck:
    def test_honest_assignment_passes(self, spark):
        df = assign_variants(
            _units(spark, 5000), "u", {"a": 0.5, "b": 0.5}, "s"
        )
        r = srm_check(df, {"a": 0.5, "b": 0.5}).collect()[0]
        assert r.n == 5000 and r.df == 1
        assert r.chi2 < 6.0  # no mismatch signal

    def test_dropped_units_alarm(self, spark):
        df = assign_variants(
            _units(spark, 5000), "u", {"a": 0.5, "b": 0.5}, "s"
        )
        # a logging bug drops 20% of treatment: SRM must scream
        broken = df.filter(
            (F.col("variant") == "a") | (F.col("u") % 5 != 0)
        )
        r = srm_check(broken, {"a": 0.5, "b": 0.5}).collect()[0]
        assert r.chi2 > 25.0


class TestRatioMetricDelta:
    def test_matches_numpy_delta_method(self, spark):
        import random

        import numpy as np

        rng = random.Random(3)
        rows = []
        xs, ys = [], []
        for u in range(200):
            y = rng.randint(1, 20)
            x = sum(rng.random() < 0.3 for _ in range(y))
            xs.append(x)
            ys.append(y)
            rows += [("u%d" % u, 1, 0)] * x + [("u%d" % u, 0, 1)] * 0
            rows += [("u%d" % u, 0, 1)] * y
        df = spark.createDataFrame(rows, "u string, x int, y int")
        r = ratio_metric_delta(df, "u", "x", "y").collect()[0]
        x, y = np.array(xs, float), np.array(ys, float)
        n = len(x)
        ratio = x.sum() / y.sum()
        vx, vy = x.var(ddof=1), y.var(ddof=1)
        cov = np.cov(x, y, ddof=1)[0, 1]
        var_r = (vx - 2 * ratio * cov + ratio**2 * vy) / (n * y.mean() ** 2)
        assert r.n_units == n
        assert r.ratio == pytest.approx(ratio, abs=1e-6)
        assert r.se == pytest.approx(float(np.sqrt(var_r)), abs=1e-6)

    def test_degenerate_groups(self, spark):
        df = spark.createDataFrame(
            [("g1", "u1", 1, 0), ("g2", "u2", 1, 2), ("g2", "u3", 0, 2)],
            "g string, u string, x int, y int",
        )
        got = {r.g: r for r in ratio_metric_delta(df, "u", "x", "y", ["g"]).collect()}
        assert got["g1"].ratio is None  # zero denominator
        assert got["g2"].ratio == 0.25 and got["g2"].se is not None
