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


def test_locf_agg_modes(spark):
    got = {
        (r.user_id, str(r.ts)): r.value
        for r in resample_locf(
            _ev(spark), ["user_id"], "ts", ["value"], agg="avg"
        ).collect()
    }
    assert got[(1, "2024-01-01 00:00:00")] == 15.0  # avg of 10 and 20


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
