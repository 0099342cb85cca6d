"""Tests: multi-touch attribution weights, journey paths, seasonal-
naive MASE."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.attribution import (
    multi_touch_attribution,
)
from taxi_data_pipeline_pset2_spark.operators.forecast import (
    seasonal_naive_eval,
)
from taxi_data_pipeline_pset2_spark.operators.paths import top_paths


def _ev(uid, minute, etype, eid):
    return (eid, uid, dt.datetime(2024, 1, 1, 10, minute), etype)


SCHEMA = "event_id long, user_id long, ts timestamp, event_type string"


def _attr(spark, rows, lookback=120):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r.channel: r
        for r in multi_touch_attribution(
            df,
            "user_id",
            "ts",
            "event_id",
            "event_type",
            is_conversion=F.col("event_type") == "buy",
            is_touch=F.col("event_type") != "buy",
            lookback_minutes=lookback,
        ).collect()
    }


class TestAttribution:
    def test_four_models_three_touches(self, spark):
        rows = [
            _ev(1, 0, "ad", 1),
            _ev(1, 5, "email", 2),
            _ev(1, 10, "search", 3),
            _ev(1, 15, "buy", 4),
        ]
        out = _attr(spark, rows)
        # first: ad=1; last: search=1; linear: 1/3 each;
        # position: 0.4 / 0.2 / 0.4
        assert out["ad"].credit_first == pytest.approx(1.0)
        assert out["search"].credit_last == pytest.approx(1.0)
        for ch in ("ad", "email", "search"):
            assert out[ch].credit_linear == pytest.approx(1 / 3, abs=1e-5)
        assert out["ad"].credit_position == pytest.approx(0.4)
        assert out["email"].credit_position == pytest.approx(0.2)
        assert out["search"].credit_position == pytest.approx(0.4)

    def test_single_and_double_touch(self, spark):
        rows = [
            _ev(1, 0, "ad", 1), _ev(1, 5, "buy", 2),          # n=1
            _ev(2, 0, "ad", 3), _ev(2, 5, "email", 4),
            _ev(2, 9, "buy", 5),                               # n=2
        ]
        out = _attr(spark, rows)
        # user1: ad gets 1 everywhere; user2: ad 0.5/first, email 0.5/last
        assert out["ad"].credit_position == pytest.approx(1.5)
        assert out["email"].credit_position == pytest.approx(0.5)
        assert out["ad"].credit_first == pytest.approx(2.0)
        assert out["email"].credit_last == pytest.approx(1.0)

    def test_lookback_excludes_old_touches(self, spark):
        rows = [
            (1, 1, dt.datetime(2024, 1, 1, 6, 0), "ad"),
            (2, 1, dt.datetime(2024, 1, 1, 10, 0), "email"),
            (3, 1, dt.datetime(2024, 1, 1, 10, 30), "buy"),
        ]
        out = _attr(spark, rows, lookback=60)
        assert "ad" not in out  # 4.5h before, outside 60min window
        assert out["email"].credit_linear == pytest.approx(1.0)

    def test_touch_credits_multiple_conversions(self, spark):
        rows = [
            _ev(1, 0, "ad", 1), _ev(1, 10, "buy", 2), _ev(1, 20, "buy", 3),
        ]
        out = _attr(spark, rows)
        assert out["ad"].credit_first == pytest.approx(2.0)

    def test_validation(self, spark):
        df = spark.createDataFrame([], SCHEMA)
        with pytest.raises(ValueError):
            multi_touch_attribution(
                df, "user_id", "ts", "event_id", "event_type",
                F.lit(True), F.lit(True), lookback_minutes=0,
            )


class TestTopPaths:
    def test_ordering_and_truncation(self, spark):
        rows = []
        for uid in range(3):  # 3 users: a,b,c,d,e,f -> 5-step prefix
            for i, s in enumerate("abcdef"):
                rows.append((uid * 10 + i, uid, dt.datetime(2024, 1, 1, 0, i), s))
        rows.append((100, 9, dt.datetime(2024, 1, 1, 0, 0), "z"))
        df = spark.createDataFrame(rows, SCHEMA)
        out = top_paths(df, "user_id", "ts", "event_id", "event_type",
                        max_steps=5, top_n=10).collect()
        assert out[0].path == "a > b > c > d > e" and out[0].n_users == 3
        assert out[1].path == "z" and out[1].n_users == 1

    def test_tie_breaks_by_id(self, spark):
        # same timestamp: event_id orders the steps
        ts = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(2, 1, ts, "b"), (1, 1, ts, "a")], SCHEMA
        )
        out = top_paths(df, "user_id", "ts", "event_id", "event_type").collect()
        assert out[0].path == "a > b"

    def test_null_time_sorts_first_and_matches_duckdb(self, spark):
        """r11: Spark's struct-field comparison puts a NULL timestamp
        FIRST; DuckDB's bare ORDER BY defaults NULLS LAST -- the oracle
        now says NULLS FIRST explicitly. Pin the operator's behavior
        against DuckDB running the aligned SQL."""
        import duckdb

        rows = [
            (10, 1, dt.datetime(2024, 1, 2), "b"),
            (11, 1, None, "x"),
            (12, 1, dt.datetime(2024, 1, 1), "a"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = top_paths(df, "user_id", "ts", "event_id", "event_type").collect()
        assert out[0].path == "x > a > b"
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events (event_id BIGINT, user_id BIGINT,"
            " ts TIMESTAMP, event_type VARCHAR)"
        )
        con.executemany("INSERT INTO events VALUES (?,?,?,?)", rows)
        got = con.execute(
            """
            WITH r AS (SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
                         AS rn FROM events)
            SELECT string_agg(coalesce(event_type, ''), ' > ' ORDER BY rn)
            FROM r WHERE rn <= 5 GROUP BY user_id
            """
        ).fetchone()[0]
        assert got == out[0].path


class TestSeasonalNaive:
    def test_perfect_seasonality_zero_test_mae(self, spark):
        rows = []
        eid = 0
        # value depends only on hour-of-day -> seasonal naive is exact
        for day in range(1, 5):
            for hour in range(24):
                rows.append(
                    (eid, 1, dt.datetime(2024, 1, day, hour), "x",
                     float(10 + hour))
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp, "
            "event_type string, value double",
        )
        r = seasonal_naive_eval(
            df, ["event_type"], "ts", "value", "2024-01-03 00:00:00"
        ).collect()[0]
        assert r.n_train == 24 and r.n_test == 48
        assert r.mae_test == pytest.approx(0.0)
        assert r.mase is None  # train MAE 0 -> undefined

    def test_mase_scales(self, spark):
        rows = []
        eid = 0
        # train: +-1 oscillation around hour pattern; test: +-3
        for day in range(1, 7):
            for hour in range(24):
                wiggle = (1.0 if day < 4 else 3.0) * (1 if (day + hour) % 2 else -1)
                rows.append(
                    (eid, 1, dt.datetime(2024, 1, day, hour), "x",
                     10.0 + wiggle)
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp, "
            "event_type string, value double",
        )
        r = seasonal_naive_eval(
            df, ["event_type"], "ts", "value", "2024-01-04 00:00:00"
        ).collect()[0]
        assert r.mae_train == pytest.approx(2.0)  # |(+1)-(-1)| pattern
        assert r.mase is not None and r.mase > 1.0  # test noisier

    def test_gapped_series_skips_missing_lag(self, spark):
        rows = [
            (0, 1, dt.datetime(2024, 1, 1, 5), "x", 1.0),
            (1, 1, dt.datetime(2024, 1, 2, 5), "x", 2.0),   # has lag
            (2, 1, dt.datetime(2024, 1, 2, 7), "x", 9.0),   # no 1/1 7:00
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp, "
            "event_type string, value double",
        )
        r = seasonal_naive_eval(
            df, ["event_type"], "ts", "value", "2024-01-02 00:00:00"
        ).collect()[0]
        assert r.n_train == 0 and r.n_test == 1  # only the 2nd row pairs
        assert r.mae_test == pytest.approx(1.0)
