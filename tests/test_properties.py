"""Property-based tests (hypothesis): operator implementations vs
brute-force python references on adversarial small inputs."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.asof import asof_join
from taxi_data_pipeline_pset2_spark.operators.skew import salted_aggregate

_SPARK = None


def _spark():
    global _SPARK
    if _SPARK is None:
        from taxi_data_pipeline_pset2_spark.session import get_spark

        _SPARK = get_spark(app_name="props")
    return _SPARK


_ts = st.integers(min_value=0, max_value=50).map(
    lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
)
_key = st.integers(min_value=1, max_value=3)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=8),
    right=st.lists(
        st.tuples(_key, _ts, st.integers(min_value=-5, max_value=5)),
        min_size=0,
        max_size=8,
        unique_by=lambda r: (r[0], r[1]),  # unique (key, ts) on the right
    ),
)
def test_asof_join_matches_bruteforce(left, right):
    spark = _spark()
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts timestamp, rid long"
    )
    rdf = spark.createDataFrame(right, "k long, ts timestamp, v long")
    got = {r.rid: r.v_asof for r in asof_join(ldf, rdf, on="k").collect()}
    for rid, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[rid] == want, (rid, k, t, got[rid], want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(_key, st.integers(min_value=-1000, max_value=1000)),
        min_size=1,
        max_size=40,
    ),
    n_salts=st.sampled_from([1, 2, 7]),
)
def test_salted_aggregate_matches_bruteforce(rows, n_salts):
    spark = _spark()
    df = spark.createDataFrame(rows, "k long, x long")
    got = {
        r.k: (r.n, r.total)
        for r in salted_aggregate(
            df,
            ["k"],
            {"n": (F.count("*"), F.sum("n")), "total": (F.sum("x"), F.sum("total"))},
            n_salts=n_salts,
        ).collect()
    }
    want: dict[int, tuple[int, int]] = {}
    for k, x in rows:
        n, tot = want.get(k, (0, 0))
        want[k] = (n + 1, tot + x)
    assert got == want
