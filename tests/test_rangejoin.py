"""Bucketed range joins: brute-force equality (property-based), left
semantics, timestamp/date coordinates, the span-cap guard, and the
no-nested-loop plan shape."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)

_settings = settings(max_examples=12, deadline=None)


def _pts(spark, xs):
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "pid long, x double"
    )


def _ivs(spark, spans):
    # (lo, hi) normalized so lo <= hi
    rows = [
        (j, float(min(a, b)), float(max(a, b))) for j, (a, b) in enumerate(spans)
    ]
    return spark.createDataFrame(rows, "iid long, lo double, hi double")


@given(
    xs=st.lists(st.integers(-50, 50), min_size=0, max_size=25),
    spans=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=0,
        max_size=12,
    ),
    width=st.sampled_from([1.0, 7.0, 16.0, 100.0]),
)
@_settings
def test_point_in_interval_matches_bruteforce(spark, xs, spans, width):
    pts, ivs = _pts(spark, xs), _ivs(spark, spans)
    got = {
        (r.pid, r.iid)
        for r in point_in_interval_join(
            pts, ivs, "x", "lo", "hi", bucket_width=width
        ).collect()
    }
    want = {
        (i, j)
        for i, x in enumerate(xs)
        for j, (a, b) in enumerate(spans)
        if min(a, b) <= x < max(a, b)
    }
    assert got == want


@given(
    ls=st.lists(
        st.tuples(st.integers(-40, 40), st.integers(-40, 40)),
        min_size=0,
        max_size=10,
    ),
    rs=st.lists(
        st.tuples(st.integers(-40, 40), st.integers(-40, 40)),
        min_size=0,
        max_size=10,
    ),
    width=st.sampled_from([1.0, 5.0, 13.0]),
)
@_settings
def test_overlap_join_matches_bruteforce_and_dedups(spark, ls, rs, width):
    lf = spark.createDataFrame(
        [(i, float(min(a, b)), float(max(a, b))) for i, (a, b) in enumerate(ls)],
        "lid long, ls double, le double",
    )
    rf = spark.createDataFrame(
        [(j, float(min(a, b)), float(max(a, b))) for j, (a, b) in enumerate(rs)],
        "rid long, rs double, re double",
    )
    rows = interval_overlap_join(
        lf, rf, "ls", "le", "rs", "re", bucket_width=width
    ).collect()
    got = [(r.lid, r.rid) for r in rows]
    want = {
        (i, j)
        for i, (a1, b1) in enumerate(ls)
        for j, (a2, b2) in enumerate(rs)
        if min(a1, b1) <= max(a2, b2) and min(a2, b2) <= max(a1, b1)
    }
    assert set(got) == want
    assert len(got) == len(want), "each overlapping pair must appear exactly once"


def test_left_join_keeps_unmatched_points(spark):
    pts = _pts(spark, [5, 999])
    ivs = _ivs(spark, [(0, 10)])
    out = point_in_interval_join(
        pts, ivs, "x", "lo", "hi", bucket_width=8.0, how="left"
    )
    rows = {r.pid: r.iid for r in out.collect()}
    assert rows == {0: 0, 1: None}


def test_closed_both_includes_end(spark):
    pts = _pts(spark, [10])
    ivs = _ivs(spark, [(0, 10)])
    half = point_in_interval_join(pts, ivs, "x", "lo", "hi", bucket_width=4.0)
    both = point_in_interval_join(
        pts, ivs, "x", "lo", "hi", bucket_width=4.0, closed="both"
    )
    assert half.count() == 0 and both.count() == 1


def test_timestamp_and_date_coordinates(spark):
    ev = spark.range(1).selectExpr(
        "id", "timestamp'2024-01-05 12:00:00' AS ts"
    )
    win = spark.range(1).selectExpr(
        "id AS wid",
        "timestamp'2024-01-05 00:00:00' AS ws",
        "timestamp'2024-01-06 00:00:00' AS we",
    )
    assert (
        point_in_interval_join(ev, win, "ts", "ws", "we", bucket_width=3600.0).count()
        == 1
    )
    d = spark.range(1).selectExpr("id", "date'2024-03-15' AS d")
    dw = spark.range(1).selectExpr(
        "id AS wid", "date'2024-03-01' AS ds", "date'2024-04-01' AS de"
    )
    assert point_in_interval_join(d, dw, "d", "ds", "de", bucket_width=7.0).count() == 1


def test_span_cap_raises(spark):
    pts = _pts(spark, [1])
    ivs = _ivs(spark, [(0, 1000)])
    with pytest.raises(Exception, match="spans more than"):
        point_in_interval_join(
            pts, ivs, "x", "lo", "hi", bucket_width=0.1, span_cap=100
        ).count()


def test_ambiguous_columns_rejected(spark):
    pts = _pts(spark, [1]).withColumnRenamed("pid", "lo")
    ivs = _ivs(spark, [(0, 10)])
    with pytest.raises(ValueError, match="ambiguous"):
        point_in_interval_join(pts, ivs, "x", "lo", "hi", bucket_width=1.0)


def test_no_nested_loop_in_plan(spark, sf_dir):
    """The banding catalog query must plan the bucket equi-join
    (broadcast hash), never BroadcastNestedLoopJoin / cartesian."""
    from taxi_data_pipeline_pset2_spark.queries import registry

    plan = (
        registry()["price_band_totals"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


@given(lo=st.integers(-30, 30), n_buckets=st.integers(1, 6))
@_settings
def test_span_cap_boundary_exact(spark, lo, n_buckets):
    """Cap-adjacent spans (VERDICT r5 item 8): an interval spanning
    EXACTLY span_cap buckets must pass and join correctly; one more
    bucket must raise. width=1 and integer endpoints make the bucket
    count exact: [lo, lo + n - 1] spans n unit buckets."""
    hi = lo + n_buckets - 1
    pts = _pts(spark, [lo, hi])
    ivs = _ivs(spark, [(lo, hi)])
    ok = point_in_interval_join(
        pts, ivs, "x", "lo", "hi", bucket_width=1.0, closed="both",
        span_cap=n_buckets,
    )
    assert {(r.pid, r.iid) for r in ok.collect()} == {(0, 0), (1, 0)}
    if n_buckets > 1:
        with pytest.raises(Exception, match="spans more than"):
            point_in_interval_join(
                pts, ivs, "x", "lo", "hi", bucket_width=1.0,
                span_cap=n_buckets - 1,
            ).count()


class TestIntervalCoverage:
    @staticmethod
    def _ref_cover(ivs):
        """Brute-force union length by sorting and merging."""
        ivs = sorted(ivs)
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        return (
            len(ivs),
            len(islands),
            sum(e - s for s, e in islands),
            sum(e - s for s, e in ivs),
        )

    def test_hand_case(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.rangejoin import (
            interval_coverage,
        )

        rows = [
            ("u1", 0, 10), ("u1", 5, 12),   # overlap -> [0,12]
            ("u1", 12, 20),                  # touching merges
            ("u1", 30, 35),                  # second island
            ("u2", 0, 1),
            ("u2", 5, 5),                    # empty: dropped
            ("u2", None, 9),                 # NULL: dropped
        ]
        df = spark.createDataFrame(rows, "k string, s long, e long")
        got = {r.k: r for r in interval_coverage(df, ["k"], "s", "e").collect()}
        assert got["u1"].n_intervals == 4
        assert got["u1"].n_islands == 2
        assert got["u1"].covered == 25   # [0,20] + [30,35]
        assert got["u1"].raw_total == 10 + 7 + 8 + 5
        assert got["u1"].overlap_saved == 5  # the [5,10] double-count
        assert got["u2"].n_intervals == 1 and got["u2"].covered == 1

    @settings(max_examples=15, deadline=None)
    @given(
        raw=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=50),
                st.integers(min_value=1, max_value=15),
            ),
            min_size=1,
            max_size=12,
        )
    )
    def test_matches_bruteforce(self, spark, raw):
        from taxi_data_pipeline_pset2_spark.operators.rangejoin import (
            interval_coverage,
        )

        ivs = [(s, s + d) for s, d in raw]
        df = spark.createDataFrame(
            [("k", s, e) for s, e in ivs], "k string, s long, e long"
        )
        r = interval_coverage(df, ["k"], "s", "e").collect()[0]
        n, ni, cov, rawt = self._ref_cover(ivs)
        assert (r.n_intervals, r.n_islands, r.covered, r.raw_total) == (
            n, ni, cov, rawt,
        )
        assert r.overlap_saved == rawt - cov
