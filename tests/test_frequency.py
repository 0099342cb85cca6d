"""Heavy hitters: candidate pass is a superset, verify pass is exact,
result equals the full exact aggregate on small data."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.frequency import (
    frequent_shingles,
    heavy_hitters,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_heavy_hitters_equals_exact_groupby(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_type")
    got = {
        (r.value, r.n, r.frac) for r in heavy_hitters(events, "event_type", 0.1).collect()
    }
    n = events.count()
    want = {
        (r.event_type, r.n, round(r.n / n, 6))
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 0.1 * n)
        .collect()
    }
    assert got == want and got  # exact counts, exact membership


def test_heavy_hitters_drops_infrequent(spark):
    rows = [("hot",)] * 90 + [(f"cold{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "v string")
    out = heavy_hitters(df, "v", support=0.5).collect()
    assert [(r.value, r.n, r.frac) for r in out] == [("hot", 90, 0.9)]


def test_frequent_shingles_finds_planted_boilerplate(spark):
    boiler = "all rights reserved worldwide"
    rows = [(i, f"{boiler} document body {i} unique tail {i}") for i in range(100)]
    rows += [(100 + i, f"clean text number {i} with words {i}") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.value: r.frac for r in frequent_shingles(docs, support=0.3).collect()}
    assert "all rights reserved" in out
    assert out["all rights reserved"] == 0.5  # 100 of 200 docs
    # nothing from the unique tails sneaks in
    assert all(f >= 0.3 for f in out.values())


class TestRollingDistinct:
    @staticmethod
    def _ref(pairs, w):
        import datetime as dt

        days = sorted({d for _, d in pairs})
        lo, hi = days[0], days[-1]
        out = {}
        cur = lo
        while cur <= hi:
            out[cur.isoformat()] = len(
                {u for u, d in pairs if cur - dt.timedelta(days=w - 1) <= d <= cur}
            )
            cur += dt.timedelta(days=1)
        return out

    def test_matches_bruteforce(self, spark):
        import datetime as dt
        import random

        from taxi_data_pipeline_pset2_spark.operators.frequency import (
            rolling_distinct,
        )

        rng = random.Random(21)
        base = dt.date(2024, 3, 1)
        pairs = [
            (f"u{rng.randint(0, 8)}", base + dt.timedelta(days=rng.randint(0, 20)))
            for _ in range(80)
        ]
        df = spark.createDataFrame(
            [(u, dt.datetime.combine(d, dt.time(12, 0))) for u, d in pairs],
            "user_id string, ts timestamp",
        )
        got = {
            r.day: r.n_distinct
            for r in rolling_distinct(df, "ts", "user_id", 7).collect()
        }
        assert got == self._ref(set(pairs), 7)

    def test_gap_days_report_trailing_actives(self, spark):
        import datetime as dt

        from taxi_data_pipeline_pset2_spark.operators.frequency import (
            rolling_distinct,
        )

        rows = [
            ("a", dt.datetime(2024, 1, 1)),
            ("b", dt.datetime(2024, 1, 1)),
            ("a", dt.datetime(2024, 1, 10)),
        ]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp")
        got = {
            r.day: r.n_distinct
            for r in rolling_distinct(df, "ts", "user_id", 3).collect()
        }
        assert got["2024-01-01"] == 2
        assert got["2024-01-03"] == 2   # still inside the 3-day window
        assert got["2024-01-04"] == 0   # window slid past day 1
        assert got["2024-01-10"] == 1

    def test_window_one_is_daily_distinct(self, spark):
        import datetime as dt

        from taxi_data_pipeline_pset2_spark.operators.frequency import (
            rolling_distinct,
        )

        rows = [
            ("a", dt.datetime(2024, 1, 1)),
            ("a", dt.datetime(2024, 1, 1, 5)),
            ("b", dt.datetime(2024, 1, 2)),
        ]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp")
        got = {
            r.day: r.n_distinct
            for r in rolling_distinct(df, "ts", "user_id", 1).collect()
        }
        assert got == {"2024-01-01": 1, "2024-01-02": 1}


class TestModeBy:
    def test_tie_breaks_to_smallest(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.frequency import mode_by

        rows = [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c")]
        df = spark.createDataFrame(rows, "g string, v string")
        r = mode_by(df, "v", ["g"]).collect()[0]
        assert (r.mode, r.n_mode) == ("a", 2)  # a and b tie at 2 -> a

    def test_null_can_win_but_loses_ties(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.frequency import mode_by

        df1 = spark.createDataFrame(
            [("g", None), ("g", None), ("g", "x")], "g string, v string"
        )
        assert mode_by(df1, "v", ["g"]).collect()[0].mode is None
        df2 = spark.createDataFrame(
            [("g", None), ("g", "x")], "g string, v string"
        )
        assert mode_by(df2, "v", ["g"]).collect()[0].mode == "x"

    def test_ungrouped(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.frequency import mode_by

        df = spark.createDataFrame([(1,), (2,), (2,)], "v long")
        r = mode_by(df, "v").collect()[0]
        assert (r.mode, r.n_mode) == (2, 2)


def test_heavy_hitters_counts_null_and_exact_boundary(spark):
    """NULL is a legitimate heavy hitter (isin(NULL) is never TRUE,
    which previously dropped it from the exact pass), and a value at
    EXACTLY the support frequency must pass the >= contract (the IEEE
    product 0.01 * 300 = 3.0000000000000004 previously excluded it)."""
    from taxi_data_pipeline_pset2_spark.operators.frequency import heavy_hitters

    rows = [(None,)] * 150 + [("a",)] * 147 + [("b",)] * 3
    df = spark.createDataFrame(rows, "v string")
    got = {r.value: r.n for r in heavy_hitters(df, "v", support=0.01).collect()}
    assert got.get(None) == 150 and got.get("a") == 147
    assert got.get("b") == 3  # exactly 1% of 300: boundary included
    import pytest as _pytest

    with _pytest.raises(ValueError, match=r"\[1e-4, 1\]"):
        heavy_hitters(df, "v", support=5e-5)


def test_frequent_shingles_short_doc_corpus_does_not_crash(spark):
    """support * n_docs > n_rows (most docs too short to shingle) must
    clamp freqItems' row support to 1.0 and return the empty frame, not
    crash inside Spark's [1e-4, 1] check."""
    from taxi_data_pipeline_pset2_spark.operators.frequency import (
        frequent_shingles,
    )

    rows = [(i, "ab") for i in range(90)] + [
        (100 + i, f"tok{i} one two three four") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = frequent_shingles(df, support=0.5)
    assert out.count() == 0
