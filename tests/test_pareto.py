"""Pareto frontier: brute-force dominance equality, orientation,
duplicates, NULLs."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from taxi_data_pipeline_pset2_spark.operators.pareto import pareto_frontier


def _brute_frontier(pts):
    """Distinct non-dominated points under (min x, max y)."""
    pts = set(pts)
    return {
        (x, y)
        for x, y in pts
        if not any(
            (a <= x and b >= y and (a < x or b > y)) for a, b in pts
        )
    }


class TestParetoFrontier:
    def test_hand_case(self, spark):
        pts = [(1.0, 5), (2.0, 7), (2.0, 3), (3.0, 5), (0.5, 1), (4.0, 8)]
        df = spark.createDataFrame(pts, "x double, y long")
        got = {(r.x, r.y) for r in pareto_frontier(df, "x", "y").collect()}
        assert got == {(0.5, 1), (1.0, 5), (2.0, 7), (4.0, 8)}

    def test_duplicates_collapse_and_nulls_drop(self, spark):
        pts = [(1.0, 5), (1.0, 5), (None, 9), (2.0, None)]
        df = spark.createDataFrame(pts, "x double, y long")
        rows = pareto_frontier(df, "x", "y").collect()
        assert [(r.x, r.y) for r in rows] == [(1.0, 5)]

    def test_grouped_frontiers_independent(self, spark):
        pts = [("a", 1.0, 1), ("a", 2.0, 2), ("b", 2.0, 2), ("b", 1.0, 3)]
        df = spark.createDataFrame(pts, "g string, x double, y long")
        got = {
            (r.g, r.x, r.y)
            for r in pareto_frontier(df, "x", "y", ["g"]).collect()
        }
        # group a: both on frontier (tradeoff); group b: (1,3) dominates
        assert got == {("a", 1.0, 1), ("a", 2.0, 2), ("b", 1.0, 3)}

    @settings(max_examples=25, deadline=None)
    @given(
        pts=st.lists(
            st.tuples(
                st.integers(min_value=-9, max_value=9),
                st.integers(min_value=-9, max_value=9),
            ),
            min_size=1,
            max_size=20,
        )
    )
    def test_matches_bruteforce(self, spark, pts):
        fpts = [(float(a), b) for a, b in pts]
        df = spark.createDataFrame(fpts, "x double, y long")
        got = {(r.x, r.y) for r in pareto_frontier(df, "x", "y").collect()}
        assert got == _brute_frontier(fpts)

    def test_frontier_is_monotone(self, spark):
        import random

        rng = random.Random(5)
        pts = [
            (float(rng.randint(0, 20)), rng.randint(0, 20)) for _ in range(60)
        ]
        df = spark.createDataFrame(pts, "x double, y long")
        rows = pareto_frontier(df, "x", "y").collect()
        xs = [r.x for r in rows]
        ys = [r.y for r in rows]
        assert xs == sorted(xs)
        assert ys == sorted(ys)  # strictly increasing y along increasing x
        assert len(set(ys)) == len(ys)
