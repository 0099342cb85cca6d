"""Cohort retention: brute-force python reference on the real events
table across all period granularities."""

from __future__ import annotations

import datetime as dt

import pytest

from taxi_data_pipeline_pset2_spark.operators.retention import cohort_retention
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def _trunc(ts: dt.datetime, period: str) -> dt.datetime:
    if period == "day":
        return dt.datetime(ts.year, ts.month, ts.day)
    if period == "week":
        d = dt.datetime(ts.year, ts.month, ts.day)
        return d - dt.timedelta(days=d.weekday())  # ISO Monday start
    return dt.datetime(ts.year, ts.month, 1)


def _offset(cohort: dt.datetime, p: dt.datetime, period: str) -> int:
    if period == "day":
        return (p - cohort).days
    if period == "week":
        return (p - cohort).days // 7
    return (p.year - cohort.year) * 12 + (p.month - cohort.month)


@pytest.mark.parametrize("period", ["day", "week", "month"])
def test_cohort_retention_matches_bruteforce(spark, sf_dir, period):
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    rows = events.collect()
    per_user: dict[int, set] = {}
    for r in rows:
        per_user.setdefault(r.user_id, set()).add(_trunc(r.ts, period))
    want: dict[tuple, set] = {}
    for u, ps in per_user.items():
        cohort = min(ps)
        for p in ps:
            want.setdefault((cohort, _offset(cohort, p, period)), set()).add(u)
    want_counts = {k: len(v) for k, v in want.items()}

    got = {
        (r.cohort, r.period_offset): r.n_users
        for r in cohort_retention(events, period=period).collect()
    }
    assert got == want_counts
    # offset 0 of each cohort is the cohort size: the largest offset row
    for (cohort, off), n in got.items():
        assert n <= got[(cohort, 0)]


def test_cohort_retention_validates_period(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="period"):
        cohort_retention(events, period="hour")


class TestCohortLtv:
    def test_hand_built_curve(self, spark):
        import datetime as dt

        from taxi_data_pipeline_pset2_spark.operators.retention import (
            cohort_ltv,
        )

        rows = [
            # cohort 2024-01: u1 (buys twice), u2 (never returns)
            (1, dt.datetime(2024, 1, 5), 10.0),
            (2, dt.datetime(2024, 1, 20), 20.0),
            (1, dt.datetime(2024, 3, 1), 30.0),
            # cohort 2024-02: u3
            (3, dt.datetime(2024, 2, 1), 40.0),
        ]
        df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
        got = {
            (r.cohort_month, r.age_months): r
            for r in cohort_ltv(df, "u", "ts", "v").collect()
        }
        jan = 12 * 2024 + 1
        assert got[(jan, 0)].n_customers == 2
        assert got[(jan, 0)].cum_revenue == 30.0
        assert got[(jan, 0)].ltv_per_customer == 15.0
        # age 2: +30 revenue, denominator STAYS 2 (u2 never returned)
        assert got[(jan, 2)].cum_revenue == 60.0
        assert got[(jan, 2)].ltv_per_customer == 30.0
        assert got[(jan + 1, 0)].cum_revenue == 40.0

    def test_curve_is_monotone(self, spark):
        import datetime as dt
        import random

        from taxi_data_pipeline_pset2_spark.operators.retention import (
            cohort_ltv,
        )

        rng = random.Random(8)
        rows = [
            (
                rng.randint(1, 20),
                dt.datetime(2024, rng.randint(1, 6), rng.randint(1, 28)),
                float(rng.randint(1, 100)),
            )
            for _ in range(200)
        ]
        df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
        out = cohort_ltv(df, "u", "ts", "v").collect()
        by_cohort = {}
        for r in out:
            by_cohort.setdefault(r.cohort_month, []).append(
                (r.age_months, r.cum_revenue)
            )
        for ages in by_cohort.values():
            vals = [v for _, v in sorted(ages)]
            assert vals == sorted(vals)  # cumulative never decreases
