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
