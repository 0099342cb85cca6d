"""Time-spine / LOCF / transition semantics on hand-built sequences."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.timeseries import (
    resample_locf,
    time_spine,
    transition_counts,
)


def _ev(spark):
    rows = [
        # user 1: obs at 00:10, 00:40 (same hour), 03:05 -> gap hours 1,2
        (1, 1, "2024-01-01 00:10:00", 10.0),
        (2, 1, "2024-01-01 00:40:00", 20.0),
        (3, 1, "2024-01-01 03:05:00", 30.0),
        # user 2: single observation -> one-row spine
        (4, 2, "2024-01-01 05:00:00", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id int, user_id int, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_time_spine_bounds_and_step(spark):
    got = {
        (r.user_id, str(r.ts))
        for r in time_spine(_ev(spark), ["user_id"], "ts", "1 hour").collect()
    }
    assert got == {
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 01:00:00"),
        (1, "2024-01-01 02:00:00"),
        (1, "2024-01-01 03:00:00"),
        (2, "2024-01-01 05:00:00"),
    }
    with pytest.raises(ValueError):
        time_spine(_ev(spark), ["user_id"], "ts", "7 fortnights")


def test_locf_fills_gaps_and_marks_them(spark):
    out = {
        (r.user_id, str(r.ts)): (r.value, r.is_filled)
        for r in resample_locf(
            _ev(spark), ["user_id"], "ts", ["value"], tie_cols=["event_id"]
        ).collect()
    }
    assert out[(1, "2024-01-01 00:00:00")] == (20.0, False)  # last obs in hour
    assert out[(1, "2024-01-01 01:00:00")] == (20.0, True)   # carried
    assert out[(1, "2024-01-01 02:00:00")] == (20.0, True)
    assert out[(1, "2024-01-01 03:00:00")] == (30.0, False)
    assert out[(2, "2024-01-01 05:00:00")] == (5.0, False)
    with pytest.raises(ValueError):
        resample_locf(_ev(spark), ["user_id"], "ts", ["value"], agg="median")


def test_locf_observed_null_is_not_filled_and_carries(spark):
    # hour 0: value 10; hour 1: observed NULL; hour 2: empty.
    # The NULL observation must keep is_filled=False and keep its NULL
    # (not be overwritten by hour 0's value), and the empty hour 2 must
    # carry the LAST OBSERVATION -- the NULL -- forward, not resurrect 10.
    rows = [
        (1, 1, "2024-01-01 00:30:00", 10.0),
        (2, 1, "2024-01-01 01:30:00", None),
        (3, 1, "2024-01-01 03:30:00", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        str(r.ts): (r.value, r.is_filled)
        for r in resample_locf(
            df, ["user_id"], "ts", ["value"], tie_cols=["event_id"]
        ).collect()
    }
    assert out["2024-01-01 00:00:00"] == (10.0, False)
    assert out["2024-01-01 01:00:00"] == (None, False)
    assert out["2024-01-01 02:00:00"] == (None, True)
    assert out["2024-01-01 03:00:00"] == (7.0, False)


def test_locf_multi_value_cols_fill_independently(spark):
    # is_filled comes from bucket presence, and each value column fills
    # from its own last observation
    rows = [
        (1, 1, "2024-01-01 00:00:00", 1.0, 100.0),
        (2, 1, "2024-01-01 02:00:00", 2.0, 200.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, ts string, a double, b double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        str(r.ts): (r.a, r.b, r.is_filled)
        for r in resample_locf(
            df, ["user_id"], "ts", ["a", "b"], tie_cols=["event_id"]
        ).collect()
    }
    assert out["2024-01-01 01:00:00"] == (1.0, 100.0, True)
    assert out["2024-01-01 02:00:00"] == (2.0, 200.0, False)


def test_locf_agg_modes(spark):
    got = {
        (r.user_id, str(r.ts)): r.value
        for r in resample_locf(
            _ev(spark), ["user_id"], "ts", ["value"], agg="avg"
        ).collect()
    }
    assert got[(1, "2024-01-01 00:00:00")] == 15.0  # avg of 10 and 20


def test_ewma_matches_pandas_and_is_partition_independent(spark):
    import pandas as pd

    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        _round_half_up_6,
    )
    from taxi_data_pipeline_pset2_spark.operators.timeseries import ewma

    rows = [
        (i, k, f"2024-01-01 00:{i % 60:02d}:00", float(v))
        for i, (k, v) in enumerate(
            [(1, 10), (1, 12), (1, 9), (1, 30), (2, 5), (2, 5), (2, 8)]
        )
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.event_id: r.ewma
        for r in ewma(
            df, ["user_id"], "ts", "value", alpha=0.3, tie_cols=["event_id"]
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    for _, g in pdf.groupby("user_id"):
        ref = g.sort_values(["ts", "event_id"])["value"].ewm(
            alpha=0.3, adjust=False
        ).mean()
        for eid, want in zip(g.sort_values(["ts", "event_id"])["event_id"], ref):
            assert got[eid] == _round_half_up_6([want])[0], eid
    # bit-identical under any input partitioning
    got2 = {
        r.event_id: r.ewma
        for r in ewma(
            df.repartition(7), ["user_id"], "ts", "value", alpha=0.3,
            tie_cols=["event_id"],
        ).collect()
    }
    assert got == got2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ewma(df, ["user_id"], "ts", "value", alpha=0.0)
    with _pytest.raises(ValueError):
        ewma(df, ["user_id"], "ts", "value", alpha=1.5)


def test_transition_counts_and_probabilities(spark):
    rows = [
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:02:00", "a"),
        (4, 2, "2024-01-01 00:00:00", "a"),
        (5, 2, "2024-01-01 00:01:00", "a"),
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, ts string, state string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.from_state, r.to_state): (r.n, r.p)
        for r in transition_counts(
            df, ["user_id"], "ts", "state", tie_cols=["event_id"]
        ).collect()
    }
    # from a: a->b once, a->a once (p=0.5 each); from b: b->a once (p=1)
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "a"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }


def test_hampel_flags_spike_not_level_shift_window(spark):
    """A lone spike is flagged; normal jitter is not; a flat window
    (MAD 0) yields NULL score and no flag; validation rejects bad
    windows."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        hampel_outliers,
    )

    rows = [(1, i, 10.0 + (100.0 if i == 5 else 0.0) + (i % 3) * 0.5) for i in range(12)]
    rows += [(2, i, 7.0) for i in range(6)]  # flat series
    df = spark.createDataFrame(rows, "k int, t int, v double")
    out = {
        (r.k, r.t): (r.hampel_score, r.is_outlier)
        for r in hampel_outliers(df, ["k"], "t", "v").collect()
    }
    assert out[(1, 5)][1] is True
    assert all(not f for (k, t), (_s, f) in out.items() if not (k == 1 and t == 5))
    assert out[(2, 3)] == (None, False)  # flat window: no scale, no flag

    with pytest.raises(ValueError):
        hampel_outliers(df, ["k"], "t", "v", half_window=0)


def test_hampel_median_interpolation_even_windows(spark):
    """Edge rows see even-sized windows: the median must interpolate
    (avg of middle two), matching PERCENTILE_CONT semantics."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        hampel_outliers,
    )

    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, 2.0), (1, 2, 3.0), (1, 3, 4.0)],
        "k int, t int, v double",
    )
    got = {
        r.t: r.rolling_median
        for r in hampel_outliers(df, ["k"], "t", "v", half_window=1).collect()
    }
    # t=0 window [1,2] -> 1.5; t=1 window [1,2,3] -> 2; t=3 window [3,4] -> 3.5
    assert got == {0: 1.5, 1: 2.0, 2: 3.0, 3: 3.5}


from hypothesis import given, settings
from hypothesis import strategies as st

_hsettings = settings(max_examples=10, deadline=None)


@given(
    obs=st.lists(
        st.tuples(
            st.integers(0, 2),      # key
            st.integers(0, 72),     # hour offset
            st.integers(0, 59),     # minute
            st.integers(-50, 50),   # value
        ),
        min_size=1,
        max_size=25,
    )
)
@_hsettings
def test_locf_matches_python_reference(spark, obs):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, k, base + dt.timedelta(hours=h, minutes=m), float(v))
        for i, (k, h, m, v) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "event_id int, k int, ts timestamp, v double"
    )
    got = {
        (r.k, str(r.ts)): (r.v, r.is_filled)
        for r in resample_locf(
            df, ["k"], "ts", ["v"], tie_cols=["event_id"]
        ).collect()
    }
    # python reference
    want = {}
    by_key: dict[int, list] = {}
    for i, k, ts, v in rows:
        by_key.setdefault(k, []).append((ts, i, v))
    for k, items in by_key.items():
        buckets: dict[dt.datetime, tuple] = {}
        for ts, i, v in items:
            b = ts.replace(minute=0, second=0, microsecond=0)
            cur = buckets.get(b)
            if cur is None or (ts, i) > (cur[0], cur[1]):
                buckets[b] = (ts, i, v)
        lo = min(b for b in buckets)
        hi = max(b for b in buckets)
        t = lo
        last = None
        while t <= hi:
            if t in buckets:
                last = buckets[t][2]
                want[(k, str(t))] = (last, False)
            else:
                want[(k, str(t))] = (last, True)
            t += dt.timedelta(hours=1)
    assert got == want


def test_rolling_features_match_pandas_one_shuffle(spark):
    import pandas as pd

    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        rolling_features,
    )

    rows = [
        (i, k, f"2024-01-01 00:{i:02d}:00", float(v))
        for i, (k, v) in enumerate(
            [(1, 5), (1, 3), (1, 8), (1, 1), (2, 10), (2, 20)]
        )
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = rolling_features(
        df, ["user_id"], "ts", "value", lags=(1, 2), windows=(3,),
        tie_cols=["event_id"],
    )
    got = {
        r.event_id: (r.lag_1, r.lag_2, r.roll_mean_3, r.roll_min_3, r.roll_max_3)
        for r in out.collect()
    }
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        l1 = g["value"].shift(1)
        l2 = g["value"].shift(2)
        rm = g["value"].rolling(3, min_periods=1).mean().round(6)
        rmin = g["value"].rolling(3, min_periods=1).min()
        rmax = g["value"].rolling(3, min_periods=1).max()
        for eid, a, b, c, d, e in zip(g["event_id"], l1, l2, rm, rmin, rmax):
            want = tuple(None if pd.isna(x) else x for x in (a, b, c, d, e))
            assert got[eid] == want, eid
    # one window pass (hence one sort-shuffle) regardless of feature
    # count -- AQE renders the exchange as a ShuffleQueryStage, so count
    # Window nodes rather than Exchange spellings
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes both plans
    assert final.count("Window [") == 1, final
    assert "Join" not in final
    import pytest as _p

    with _p.raises(ValueError):
        rolling_features(df, ["user_id"], "ts", "value", lags=(), windows=())
    with _p.raises(ValueError):
        rolling_features(df, ["user_id"], "ts", "value", lags=(0,))


class TestAcf:
    @staticmethod
    def _ref_acf(xs, max_lag):
        import numpy as np

        x = np.asarray(xs, dtype=float)
        m = x.mean()
        den = ((x - m) ** 2).sum()
        out = {}
        for k in range(1, max_lag + 1):
            if k >= len(x) or den == 0:
                out[k] = None
            else:
                out[k] = float(((x[k:] - m) * (x[:-k] - m)).sum() / den)
        return out

    def test_matches_numpy_reference(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.timeseries import acf

        xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(xs)], "t int, value double"
        )
        got = {r.lag: (r.n_pairs, r.acf) for r in acf(df, "t", "value", 5).collect()}
        ref = self._ref_acf(xs, 5)
        for k in range(1, 6):
            assert got[k][0] == len(xs) - k
            assert got[k][1] == pytest.approx(ref[k], abs=1e-6)

    def test_periodic_series_peaks_at_period(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.timeseries import acf

        xs = [float(i % 4) for i in range(40)]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(xs)], "t int, value double"
        )
        got = {r.lag: r.acf for r in acf(df, "t", "value", 6).collect()}
        assert got[4] == max(got.values())
        assert got[4] > 0.8

    def test_grouped_and_short_series(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.timeseries import acf

        rows = [("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 1.0), ("b", 0, 7.0)]
        df = spark.createDataFrame(rows, "g string, t int, value double")
        out = acf(df, "t", "value", 3, ["g"]).collect()
        by = {(r.g, r.lag): (r.n_pairs, r.acf) for r in out}
        assert by[("b", 1)] == (0, None)  # no pairs
        assert by[("a", 3)][0] == 0
        assert by[("a", 1)][1] is not None

    def test_max_lag_validation(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.timeseries import acf

        df = spark.createDataFrame([(0, 1.0)], "t int, value double")
        with pytest.raises(ValueError, match="max_lag"):
            acf(df, "t", "value", 0)


class TestSeasonalDecompose:
    def test_recovers_planted_weekly_pattern(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.timeseries import (
            seasonal_decompose,
        )

        # value = 100 + phase bump, integers, 8 full weeks
        bump = [0, 10, 20, 5, 15, 30, 25]
        rows = [(t, 100 + bump[t % 7]) for t in range(56)]
        df = spark.createDataFrame(rows, "t int, value long")
        out = seasonal_decompose(df, "t", "value", period=7).collect()
        by_t = {r.t: r for r in out}
        # interior trend = mean over any 7 consecutive = 100 + mean(bump)
        exp_trend = 100 + sum(bump) / 7.0
        for t in range(3, 53):
            assert by_t[t].trend == pytest.approx(exp_trend, abs=1e-6)
            # resid = 0 for a pure trend+seasonal series
            assert by_t[t].resid == pytest.approx(0.0, abs=1e-6)
        # seasonal = bump - mean(bump) for every interior phase
        for t in range(3, 10):
            assert by_t[t].seasonal == pytest.approx(
                bump[t % 7] - sum(bump) / 7.0, abs=1e-6
            )
        # edges: no full window -> NULL trend/resid
        assert by_t[0].trend is None and by_t[0].resid is None
        assert by_t[55].trend is None

    def test_even_period_rejected(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.timeseries import (
            seasonal_decompose,
        )

        df = spark.createDataFrame([(0, 1)], "t int, value long")
        with pytest.raises(ValueError, match="odd"):
            seasonal_decompose(df, "t", "value", period=4)

    def test_value_plus_components_identity(self, spark):
        import random

        from taxi_data_pipeline_pset2_spark.operators.timeseries import (
            seasonal_decompose,
        )

        rng = random.Random(3)
        rows = [(t, rng.randint(0, 50)) for t in range(30)]
        df = spark.createDataFrame(rows, "t int, value long")
        for r in seasonal_decompose(df, "t", "value", period=5).collect():
            if r.resid is not None:
                assert r.value - r.trend - r.seasonal == pytest.approx(
                    r.resid, abs=2e-6
                )


class TestTimeWeightedAvg:
    def test_hand_case_vs_plain_avg(self, spark):
        import datetime as dt

        from taxi_data_pipeline_pset2_spark.operators.timeseries import (
            time_weighted_avg,
        )

        b = dt.datetime(2024, 1, 1)
        # value 10 held for 90s, then a burst of three 100s (5s apart)
        rows = [
            ("u", b, 10.0),
            ("u", b + dt.timedelta(seconds=90), 100.0),
            ("u", b + dt.timedelta(seconds=95), 100.0),
            ("u", b + dt.timedelta(seconds=100), 100.0),
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        r = time_weighted_avg(df, ["k"], "ts", "v").collect()[0]
        # integral = 10*90 + 100*5 + 100*5 = 1900 over 100s
        assert r.span_s == 100 and r.twa == 19.0
        assert r.n_obs == 4
        # plain AVG would say 77.5 -- the burst distortion TWAP fixes

    def test_single_observation_null(self, spark):
        import datetime as dt

        from taxi_data_pipeline_pset2_spark.operators.timeseries import (
            time_weighted_avg,
        )

        df = spark.createDataFrame(
            [("u", dt.datetime(2024, 1, 1), 5.0)],
            "k string, ts timestamp, v double",
        )
        r = time_weighted_avg(df, ["k"], "ts", "v").collect()[0]
        assert r.twa is None and r.span_s == 0

    def test_constant_series_twa_equals_value(self, spark):
        import datetime as dt
        import random

        from taxi_data_pipeline_pset2_spark.operators.timeseries import (
            time_weighted_avg,
        )

        rng = random.Random(6)
        b = dt.datetime(2024, 1, 1)
        rows = [
            ("u", b + dt.timedelta(seconds=s), 42.5)
            for s in sorted(rng.sample(range(100000), 30))
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        assert time_weighted_avg(df, ["k"], "ts", "v").collect()[0].twa == 42.5


class TestResampleInterpolate:
    def test_linear_fill_between_observations(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.timeseries import (
            resample_interpolate,
        )

        rows = [
            (1, "2024-01-01 00:30:00", 10.0),
            (1, "2024-01-01 03:10:00", 40.0),  # 3 buckets later
            (2, "2024-01-01 05:00:00", 7.0),    # singleton
        ]
        df = spark.createDataFrame(
            rows, "user_id int, ts string, value double"
        ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
        out = resample_interpolate(df, ["user_id"], "ts", "value", "1 hour")
        got = {(r.user_id, str(r.ts)): (r.value, r.is_filled) for r in out.collect()}
        assert got[(1, "2024-01-01 00:00:00")] == (10.0, False)
        assert got[(1, "2024-01-01 01:00:00")] == (20.0, True)   # 10 + 30/3
        assert got[(1, "2024-01-01 02:00:00")] == (30.0, True)
        assert got[(1, "2024-01-01 03:00:00")] == (40.0, False)
        assert got[(2, "2024-01-01 05:00:00")] == (7.0, False)

    def test_bucket_mean_and_no_extrapolation(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.timeseries import (
            resample_interpolate,
        )

        rows = [
            (1, "2024-01-01 00:10:00", 10.0),
            (1, "2024-01-01 00:50:00", 30.0),   # same bucket -> mean 20
            (1, "2024-01-01 02:00:00", 50.0),
        ]
        df = spark.createDataFrame(
            rows, "user_id int, ts string, value double"
        ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
        out = resample_interpolate(df, ["user_id"], "ts", "value", "1 hour")
        got = {str(r.ts): r.value for r in out.collect()}
        assert got["2024-01-01 00:00:00"] == 20.0
        assert got["2024-01-01 01:00:00"] == 35.0  # midpoint of 20 and 50


def test_missing_ranges_audit(spark):
    from taxi_data_pipeline_pset2_spark.quality import missing_ranges

    rows = [("a", 1), ("a", 2), ("a", 5), ("a", 9), ("a", 2),  # dup ok
            ("b", 10), ("b", 11), ("c", None)]
    df = spark.createDataFrame(rows, "k string, s long")
    got = [
        (r.k, r.gap_start, r.gap_end, r.n_missing)
        for r in missing_ranges(df, "s", ["k"]).collect()
    ]
    assert got == [("a", 3, 4, 2), ("a", 6, 8, 3)]  # b contiguous, c NULL-only


def test_locf_last_is_deterministic_on_ts_ties(spark):
    """Two observations at the identical ts with tie_cols=None: the
    bucket pick must be deterministic (value_cols close the order), not
    partition-arrival-dependent -- an unstable pick would LOCF-propagate
    into every following filled bucket."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        resample_locf,
    )

    rows = [
        ("k", "2024-01-01 00:10:00", 10.0),
        ("k", "2024-01-01 00:10:00", 20.0),
        ("k", "2024-01-01 02:15:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    a = resample_locf(df.coalesce(1), ["key"], "ts", ["value"]).collect()
    b = resample_locf(df.repartition(16), ["key"], "ts", ["value"]).collect()
    assert [(r.ts, r.value, r.is_filled) for r in a] == [
        (r.ts, r.value, r.is_filled) for r in b
    ]
    # value_cols desc -> the 20.0 row wins the tie, and fills hour 1
    assert a[0].value == 20.0 and a[1].value == 20.0 and a[1].is_filled
