"""PSI and Cramer's V semantics vs scipy-free hand references."""

from __future__ import annotations

import math

import pytest

from taxi_data_pipeline_pset2_spark.operators.drift import (
    cramers_v,
    psi_categorical,
    psi_total,
)


def _cat_df(spark, pairs):
    return spark.createDataFrame([(c,) for c in pairs], "lang string")


def test_psi_zero_for_identical_distributions(spark):
    d = _cat_df(spark, ["a"] * 10 + ["b"] * 30)
    assert psi_total(d, d, "lang") == 0.0


def test_psi_matches_hand_reference_and_handles_one_sided(spark):
    exp = _cat_df(spark, ["a"] * 8 + ["b"] * 2)
    act = _cat_df(spark, ["a"] * 2 + ["b"] * 6 + ["c"] * 2)
    rows = {r.category: r for r in psi_categorical(exp, act, "lang").collect()}
    # hand reference with add-0.5 smoothing over k=3 categories
    te, ta, k = 10, 10, 3
    for cat, ne, na in (("a", 8, 2), ("b", 2, 6), ("c", 0, 2)):
        pe = (ne + 0.5) / (te + 0.5 * k)
        pa = (na + 0.5) / (ta + 0.5 * k)
        want = round((pa - pe) * math.log(pa / pe), 6)
        assert rows[cat].psi_contrib == pytest.approx(want, abs=1e-6)
        assert (rows[cat].n_expected, rows[cat].n_actual) == (ne, na)
    assert psi_total(exp, act, "lang") == pytest.approx(
        sum(r.psi_contrib for r in rows.values()), abs=1e-6
    )
    # shifted mix crosses the 0.25 "major shift" folklore threshold
    assert psi_total(exp, act, "lang") > 0.25


def test_psi_null_category_is_a_cohort(spark):
    exp = _cat_df(spark, ["a", None, None])
    act = _cat_df(spark, ["a", "a", None])
    rows = {r.category: r for r in psi_categorical(exp, act, "lang").collect()}
    assert rows[None].n_expected == 2 and rows[None].n_actual == 1
    assert len(rows) == 2


def test_cramers_v_extremes(spark):
    # perfect association: b == a
    perfect = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, "a string, b string"
    )
    r = cramers_v(perfect, "a", "b").collect()[0]
    assert r.cramers_v == pytest.approx(1.0, abs=1e-6)
    assert r.chi2 == pytest.approx(10.0, abs=1e-6)  # chi2 = n for 2x2 perfect
    # independence: uniform product table
    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(5)],
        "a string, b string",
    )
    r2 = cramers_v(indep, "a", "b").collect()[0]
    assert r2.chi2 == 0.0 and r2.cramers_v == 0.0
    # degenerate: single category on one side -> NULL V
    degen = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    assert cramers_v(degen, "a", "b").collect()[0].cramers_v is None


def test_cramers_v_counts_null_as_category(spark):
    # {NULL, x} vs {p, q} perfect association: before the fix ka came
    # from countDistinct (1, excluding NULL) so the denominator
    # n*(min-1) was 0 and V went NULL; with NULL counted it is an exact
    # 2x2 perfect table -> V = 1, chi2 = n.
    d = spark.createDataFrame(
        [("x", "p")] * 4 + [(None, "q")] * 4, "a string, b string"
    )
    r = cramers_v(d, "a", "b").collect()[0]
    assert (r.df_a, r.df_b) == (1, 1)
    assert r.chi2 == pytest.approx(8.0, abs=1e-6)
    assert r.cramers_v == pytest.approx(1.0, abs=1e-6)
    # and V stays bounded <= 1 on a NULL-heavy non-square table
    d2 = spark.createDataFrame(
        [("x", "p"), (None, "p"), (None, "q"), ("y", "q"), (None, "r")],
        "a string, b string",
    )
    r2 = cramers_v(d2, "a", "b").collect()[0]
    assert (r2.df_a, r2.df_b) == (2, 2)
    assert r2.cramers_v is not None and 0.0 <= r2.cramers_v <= 1.0


def test_psi_numeric_detects_shift_and_not_identity(spark):
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.operators.drift import psi_numeric

    base = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("v"))
    same = psi_numeric(base, base, "v", bins=5)
    total_same = sum(r.psi_contrib for r in same.collect())
    assert abs(total_same) < 1e-9
    shifted = base.select((F.col("v") + 60.0).alias("v"))
    total_shift = sum(r.psi_contrib for r in psi_numeric(base, shifted, "v", bins=5).collect())
    assert total_shift > 0.25
    # NULLs form their own bin on both sides
    with_null = base.union(spark.createDataFrame([(None,)], "v double"))
    rows = {r.category for r in psi_numeric(with_null, with_null, "v", bins=5).collect()}
    assert None in rows


class TestKsStatistic:
    @staticmethod
    def _ref_ks(a, b):
        import numpy as np

        pooled = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(np.sort(a), pooled, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), pooled, side="right") / len(b)
        return float(np.max(np.abs(fa - fb)))

    def test_matches_numpy_reference(self, spark):
        import random

        from taxi_data_pipeline_pset2_spark.operators.drift import (
            ks_statistic,
        )

        rng = random.Random(17)
        a = [rng.gauss(0, 1) for _ in range(150)]
        b = [rng.gauss(0.6, 1.2) for _ in range(120)]
        rows = [(x, True) for x in a] + [(x, False) for x in b]
        df = spark.createDataFrame(rows, "v double, f boolean")
        r = ks_statistic(df, "v", "f").collect()[0]
        assert (r.n_a, r.n_b) == (150, 120)
        assert r.ks_d == pytest.approx(self._ref_ks(a, b), abs=1e-6)

    def test_identical_and_disjoint_distributions(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.drift import (
            ks_statistic,
        )

        same = [(float(i % 10), (i // 10) % 2 == 0) for i in range(100)]
        df = spark.createDataFrame(same, "v double, f boolean")
        assert ks_statistic(df, "v", "f").collect()[0].ks_d == 0.0

        rows = [(float(i), True) for i in range(20)] + [
            (float(i + 100), False) for i in range(20)
        ]
        df2 = spark.createDataFrame(rows, "v double, f boolean")
        assert ks_statistic(df2, "v", "f").collect()[0].ks_d == 1.0

    def test_empty_side_null_and_ties(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.drift import (
            ks_statistic,
        )

        rows = [("g1", 1.0, True), ("g1", 2.0, True), ("g2", 1.0, True),
                ("g2", 1.0, False)]
        df = spark.createDataFrame(rows, "g string, v double, f boolean")
        got = {r.g: r for r in ks_statistic(df, "v", "f", ["g"]).collect()}
        assert got["g1"].ks_d is None          # no B sample
        assert got["g2"].ks_d == 0.0           # tied single value


def test_ks_from_counts_equals_row_form(spark):
    """The count-frame form (the streaming monitor's input) must equal
    ks_statistic over the equivalent rows."""
    import random

    from taxi_data_pipeline_pset2_spark.operators.drift import (
        ks_from_counts,
        ks_statistic,
    )

    rng = random.Random(19)
    a = [float(rng.randint(0, 20)) for _ in range(120)]
    b = [float(rng.randint(5, 25)) for _ in range(90)]
    rows = [(v, True) for v in a] + [(v, False) for v in b]
    want = ks_statistic(
        spark.createDataFrame(rows, "v double, f boolean"), "v", "f"
    ).collect()[0]

    from collections import Counter

    ca = spark.createDataFrame(
        [(v, n) for v, n in Counter(a).items()], "v double, n long"
    )
    cb = spark.createDataFrame(
        [(v, n) for v, n in Counter(b).items()], "v double, n long"
    )
    got = ks_from_counts(ca, cb).collect()[0]
    assert (got.n_a, got.n_b, got.ks_d, got.ks_lambda) == (
        want.n_a, want.n_b, want.ks_d, want.ks_lambda,
    )
