"""Kaplan-Meier tests: textbook hand example, censoring semantics,
curve-to-zero, median summary."""

import pytest

from taxi_data_pipeline_pset2_spark.operators.survival import (
    kaplan_meier,
    median_survival,
)


class TestKaplanMeier:
    def test_textbook_example(self, spark):
        # Classic 10-subject example: events at 1,2,2,4; censored at 3,5;
        # events at 6,7; censored at 8,9.
        data = [
            (1.0, 1), (2.0, 1), (2.0, 1), (3.0, 0), (4.0, 1),
            (5.0, 0), (6.0, 1), (7.0, 1), (8.0, 0), (9.0, 0),
        ]
        df = spark.createDataFrame(data, "d double, ev int")
        rows = {r.t: r for r in kaplan_meier(df, "d", "ev").collect()}
        # t=1: n_risk 10, 1 event -> S = 0.9
        assert rows[1.0].n_risk == 10
        assert rows[1.0].survival == pytest.approx(0.9, abs=1e-6)
        # t=2: n_risk 9, 2 events -> S = 0.9 * 7/9 = 0.7
        assert rows[2.0].n_risk == 9
        assert rows[2.0].survival == pytest.approx(0.7, abs=1e-6)
        # t=3: censor only -> survival carries
        assert rows[3.0].n_event == 0 and rows[3.0].n_censored == 1
        assert rows[3.0].survival == pytest.approx(0.7, abs=1e-6)
        # t=4: n_risk 6, 1 event -> 0.7 * 5/6
        assert rows[4.0].n_risk == 6
        assert rows[4.0].survival == pytest.approx(0.7 * 5 / 6, abs=1e-6)
        # t=7: n_risk 3, 1 event -> S(6) * 2/3
        s6 = rows[6.0].survival
        assert rows[7.0].survival == pytest.approx(s6 * 2 / 3, abs=1e-5)

    def test_curve_hits_zero(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1), (2.0, 1), (3.0, 1)], "d double, ev int"
        )
        rows = {r.t: r for r in kaplan_meier(df, "d", "ev").collect()}
        assert rows[3.0].n_risk == 1 and rows[3.0].survival == 0.0

    def test_groups_independent(self, spark):
        data = [("a", 1.0, 1), ("a", 2.0, 0), ("b", 1.0, 0), ("b", 2.0, 1)]
        df = spark.createDataFrame(data, "g string, d double, ev int")
        out = kaplan_meier(df, "d", "ev", ["g"]).collect()
        by = {(r.g, r.t): r for r in out}
        assert by[("a", 1.0)].survival == pytest.approx(0.5)
        assert by[("b", 1.0)].survival == pytest.approx(1.0)  # censor only
        assert by[("b", 2.0)].survival == pytest.approx(0.0)

    def test_null_and_negative_excluded(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1), (None, 1), (2.0, None), (-1.0, 1)],
            "d double, ev int",
        )
        out = kaplan_meier(df, "d", "ev").collect()
        assert len(out) == 1 and out[0].n_risk == 1

    def test_median_survival(self, spark):
        # events at 1..4 of 4 subjects: S = .75, .5, .25, 0 -> median 2
        df = spark.createDataFrame(
            [(float(i), 1) for i in range(1, 5)], "d double, ev int"
        )
        km = kaplan_meier(df, "d", "ev")
        med = median_survival(km).collect()
        assert med[0].median_t == 2.0

    def test_all_censored_median_empty(self, spark):
        df = spark.createDataFrame(
            [(1.0, 0), (2.0, 0)], "d double, ev int"
        )
        km = kaplan_meier(df, "d", "ev")
        assert median_survival(km).count() == 0
