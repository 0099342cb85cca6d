"""Join-view maintenance: delta rule == from-scratch join, bag
semantics, coverage partition (no pair double-counted)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from taxi_data_pipeline_pset2_spark.operators.ivm import maintain_join_view


def _frames(spark, a_rows, b_rows, cut):
    a = spark.createDataFrame(a_rows, "k long, av long, at long")
    b = spark.createDataFrame(b_rows, "k long, bv long, bt long")
    return (
        a.filter(f"at < {cut}"),
        a.filter(f"at >= {cut}"),
        b,
        b.filter(f"bt < {cut}"),
        b.filter(f"bt >= {cut}"),
        a,
    )


class TestMaintainJoinView:
    def test_hand_case(self, spark):
        a_rows = [(1, 10, 0), (2, 20, 0), (1, 11, 5)]       # (1,11) is new
        b_rows = [(1, 100, 0), (2, 200, 5), (3, 300, 0)]    # (2,200) is new
        a_old, da, b_new, b_old, db, a_all = _frames(spark, a_rows, b_rows, 3)
        view_old = a_old.join(b_old, ["k"]).select("k", "av", "bv")
        got = sorted(
            (r.k, r.av, r.bv)
            for r in maintain_join_view(
                view_old, a_old, da, b_new, db, ["k"]
            ).collect()
        )
        want = sorted(
            (r.k, r.av, r.bv)
            for r in a_all.join(b_new, ["k"]).select("k", "av", "bv").collect()
        )
        assert got == want

    @settings(max_examples=20, deadline=None)
    @given(
        a_rows=st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 99), st.integers(0, 9)),
            min_size=0, max_size=12,
        ),
        b_rows=st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 99), st.integers(0, 9)),
            min_size=0, max_size=12,
        ),
        cut=st.integers(0, 10),
    )
    def test_matches_fresh_join_with_duplicates(self, spark, a_rows, b_rows, cut):
        # duplicate keys and duplicate full rows are legal: bag semantics
        a_old, da, b_new, b_old, db, a_all = _frames(spark, a_rows, b_rows, cut)
        view_old = a_old.join(b_old, ["k"]).select("k", "av", "bv")
        got = sorted(
            (r.k, r.av, r.bv)
            for r in maintain_join_view(
                view_old, a_old, da, b_new, db, ["k"]
            ).collect()
        )
        want = sorted(
            (r.k, r.av, r.bv)
            for r in a_all.join(b_new, ["k"]).select("k", "av", "bv").collect()
        )
        assert got == want

    def test_requires_join_key(self, spark):
        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError, match="join key"):
            maintain_join_view(df, df, df, df, df, [])
