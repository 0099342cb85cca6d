"""Change-point tests: planted shift recovery, edge cases, reference
equality against a brute-force python CUSUM."""

import numpy as np
import pytest

from taxi_data_pipeline_pset2_spark.operators.changepoint import (
    mean_shift_changepoint,
)


def _run(spark, series, key="k"):
    rows = [(key, i, float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "k string, i int, x double")
    return mean_shift_changepoint(df, ["k"], ["i"], "x").collect()


class TestMeanShiftChangepoint:
    def test_planted_shift_recovered(self, spark):
        rng = np.random.default_rng(7)
        series = np.concatenate(
            [rng.normal(0, 1, 60), rng.normal(5, 1, 40)]
        )
        r = _run(spark, series)[0]
        assert abs(r.change_pos - 60) <= 2
        assert r.shift == pytest.approx(5.0, abs=0.7)
        assert r.cusum_stat > 0.5  # strong shift scores high

    def test_matches_bruteforce_reference(self, spark):
        rng = np.random.default_rng(11)
        series = np.concatenate([rng.normal(2, 1, 25), rng.normal(4, 1, 35)])
        r = _run(spark, series)[0]
        x = np.asarray(series)
        n = len(x)
        c = np.cumsum(x) - (np.arange(1, n + 1) / n) * x.sum()
        k = int(np.argmax(np.abs(c[:-1]))) + 1
        assert r.change_pos == k
        assert r.cusum_abs == pytest.approx(abs(c[k - 1]), abs=1e-4)
        assert r.mean_before == pytest.approx(x[:k].mean(), abs=1e-4)
        assert r.mean_after == pytest.approx(x[k:].mean(), abs=1e-4)
        assert r.cusum_stat == pytest.approx(
            abs(c[k - 1]) / (x.std() * np.sqrt(n)), abs=1e-4
        )

    def test_no_shift_scores_low(self, spark):
        rng = np.random.default_rng(3)
        r = _run(spark, rng.normal(10, 1, 100))[0]
        assert r.cusum_stat < 0.5

    def test_constant_series_null_stats(self, spark):
        r = _run(spark, [5.0] * 10)[0]
        assert r.n == 10
        assert r.change_pos is None and r.cusum_stat is None

    def test_single_point_no_row(self, spark):
        assert _run(spark, [1.0]) == []

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [("k", 0, 1.0), ("k", 1, None), ("k", 2, 2.0), ("k", 3, 2.0)],
            "k string, i int, x double",
        )
        r = mean_shift_changepoint(df, ["k"], ["i"], "x").collect()[0]
        assert r.n == 3

    def test_multiple_keys(self, spark):
        rows = [("a", i, float(i >= 5) * 10) for i in range(10)]
        rows += [("b", i, 1.0 + (i % 2) * 0.0) for i in range(4)]
        df = spark.createDataFrame(rows, "k string, i int, x double")
        out = {r.k: r for r in mean_shift_changepoint(df, ["k"], ["i"], "x").collect()}
        assert out["a"].change_pos == 5
        assert out["b"].change_pos is None  # constant
