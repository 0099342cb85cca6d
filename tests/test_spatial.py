"""Grid radius join: brute-force pair equality, boundary semantics,
cell sizing, no-dup guarantee."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from taxi_data_pipeline_pset2_spark.operators.spatial import grid_radius_join


def _pts(spark, pts, idc, xc, yc):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        f"{idc} long, {xc} double, {yc} double",
    )


def _brute(lpts, rpts, r):
    return {
        (i, j)
        for i, (ax, ay) in enumerate(lpts)
        for j, (bx, by) in enumerate(rpts)
        if (ax - bx) ** 2 + (ay - by) ** 2 <= r * r
    }


class TestGridRadiusJoin:
    def test_hand_case_with_boundary(self, spark):
        left = [(0.0, 0.0), (10.0, 10.0)]
        right = [(3.0, 4.0), (0.0, 5.0), (0.0, 5.0001), (10.0, 15.0)]
        l_ = _pts(spark, left, "lid", "lx", "ly")
        r_ = _pts(spark, right, "rid", "rx", "ry")
        out = grid_radius_join(l_, r_, ("lx", "ly"), ("rx", "ry"), 5.0)
        got = {(r.lid, r.rid): r.dist for r in out.collect()}
        # exactly-at-radius (0,5) is INCLUDED; 1e-4 past it is not
        assert set(got) == {(0, 0), (0, 1), (1, 3)}
        assert got[(0, 0)] == 5.0  # 3-4-5 triangle
        assert got[(1, 3)] == 5.0

    def test_cell_smaller_than_radius_rejected(self, spark):
        l_ = _pts(spark, [(0.0, 0.0)], "lid", "lx", "ly")
        with pytest.raises(ValueError, match="cell"):
            grid_radius_join(l_, l_, ("lx", "ly"), ("lx", "ly"), 5.0, cell=2.0)

    @settings(max_examples=20, deadline=None)
    @given(
        lpts=st.lists(
            st.tuples(st.integers(-30, 30), st.integers(-30, 30)),
            min_size=1, max_size=10,
        ),
        rpts=st.lists(
            st.tuples(st.integers(-30, 30), st.integers(-30, 30)),
            min_size=1, max_size=10,
        ),
        r=st.sampled_from([1.0, 5.0, 13.0]),
        cell_mult=st.sampled_from([1.0, 1.7, 4.0]),
    )
    def test_matches_bruteforce(self, spark, lpts, rpts, r, cell_mult):
        l_ = _pts(spark, lpts, "lid", "lx", "ly")
        r_ = _pts(spark, rpts, "rid", "rx", "ry")
        out = grid_radius_join(
            l_, r_, ("lx", "ly"), ("rx", "ry"), r, cell=r * cell_mult
        ).collect()
        got = [(row.lid, row.rid) for row in out]
        assert len(got) == len(set(got))  # no pair emitted twice
        assert set(got) == _brute(lpts, rpts, r)


def test_exact_radius_pairs_survive_hostile_cell_boundaries(spark):
    """r11 margin regression: with cell == radius, a pair at distance
    EXACTLY r whose coordinates sit a rounding error around a cell
    boundary must still share a probed cell -- the working cell is
    widened by a relative margin so the computed floors can never land
    two apart for a qualifying pair."""
    import math

    from taxi_data_pipeline_pset2_spark.operators.spatial import (
        grid_radius_join,
    )

    r = 0.1  # not exactly representable: every quotient rounds
    xs = []
    for n in (1, 3, 7, 10, 13):
        base = n * r
        for eps in (-4e-16, -1e-16, 0.0, 1e-16, 4e-16):
            xs.append(base * (1.0 + eps))
    left = spark.createDataFrame(
        [(i, x, 0.0) for i, x in enumerate(xs)], ["lid", "lx", "ly"]
    )
    right = spark.createDataFrame(
        [(i, x + r, 0.0) for i, x in enumerate(xs)], ["rid", "rx", "ry"]
    )
    got = {
        (row.lid, row.rid)
        for row in grid_radius_join(
            left, right, ("lx", "ly"), ("rx", "ry"), radius=r
        ).collect()
    }
    # every (i, i) pair is at distance <= r by construction (the float
    # sum x + r rounds to within an ulp of exact): all must be found
    for i, x in enumerate(xs):
        dx = (x + r) - x
        if dx * dx <= r * r:
            assert (i, i) in got, f"boundary pair {i} missed at x={x!r}"
