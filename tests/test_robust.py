"""Winsorization: known-percentile clipping, NULL passthrough, global
mode, flag audit, approx-mode agreement, and parameter validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.robust import (
    group_clip_bounds,
    winsorize,
    winsorized_stats,
)


def _df(spark):
    # group a: 0..100 -> p05=5, p95=95 under linear interpolation
    rows = [("a", float(v)) for v in range(101)] + [
        ("b", 10.0),
        ("b", 20.0),
        ("b", None),
    ]
    return spark.createDataFrame(rows, "g string, v double")


def test_group_bounds_and_clip(spark):
    df = _df(spark)
    b = {r.g: (r["__lo"], r["__hi"]) for r in group_clip_bounds(df, "v", ["g"]).collect()}
    assert b["a"] == (5.0, 95.0)
    out = winsorize(df, "v", ["g"], flag=True)
    a_rows = [r for r in out.collect() if r.g == "a"]
    vals = sorted(r.v for r in a_rows)
    assert vals[0] == 5.0 and vals[-1] == 95.0
    assert sum(1 for r in a_rows if r["__clip"] == -1) == 5  # 0..4 clipped up
    assert sum(1 for r in a_rows if r["__clip"] == 1) == 5  # 96..100 clipped down
    # NULL measurement stays NULL, flagged 0
    null_rows = [r for r in out.collect() if r.g == "b" and r.v is None]
    assert len(null_rows) == 1 and null_rows[0]["__clip"] == 0


def test_global_mode_and_out_col(spark):
    df = _df(spark).filter(F.col("g") == "a")
    out = winsorize(df, "v", lower=0.0, upper=0.5, out_col="v_w")
    got = out.agg(F.max("v_w"), F.max("v")).collect()[0]
    assert got[0] == 50.0 and got[1] == 100.0  # original column intact


def test_exact_vs_approx_close(spark):
    df = _df(spark)
    exact = {r.g: (r["__lo"], r["__hi"]) for r in group_clip_bounds(df, "v", ["g"]).collect()}
    approx = {
        r.g: (r["__lo"], r["__hi"])
        for r in group_clip_bounds(df, "v", ["g"], exact=False).collect()
    }
    for g in exact:
        assert abs(exact[g][0] - approx[g][0]) <= 1.0
        assert abs(exact[g][1] - approx[g][1]) <= 1.0


def test_stats_shape_and_validation(spark):
    df = _df(spark)
    stats = {r.g: r for r in winsorized_stats(df, "v", ["g"]).collect()}
    assert stats["a"].n == 101
    assert stats["a"].n_clip_lo == 5 and stats["a"].n_clip_hi == 5
    with pytest.raises(ValueError, match="lower"):
        group_clip_bounds(df, "v", ["g"], lower=0.9, upper=0.1)


def test_zscore_known_values_and_edge_groups(spark):
    from taxi_data_pipeline_pset2_spark.operators.robust import zscore_flag

    rows = (
        [("a", float(v)) for v in (0, 1, 2, 3, 4)]  # mean 2, var 2.5
        + [("const", 7.0), ("const", 7.0)]          # zero variance
        + [("single", 5.0)]                          # n < 2
        + [("a", None)]                              # null measurement
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = zscore_flag(df, "v", ["g"], threshold=1.2)
    a = {r.v: (r.zscore, r.is_outlier) for r in out.collect() if r.g == "a" and r.v is not None}
    sd = 2.5 ** 0.5
    assert a[2.0] == (0.0, False)
    assert a[0.0][0] == round(-2 / sd, 6) and a[0.0][1]  # |z| ~ 1.265 > 1.2
    assert a[4.0][1] and not a[1.0][1] and not a[3.0][1]
    others = {r.g: (r.zscore, r.is_outlier) for r in out.collect() if r.g != "a"}
    assert others["const"] == (None, False)
    assert others["single"] == (None, False)
    nulls = [r for r in out.collect() if r.g == "a" and r.v is None]
    assert nulls and nulls[0].zscore is None and not nulls[0].is_outlier


def test_winsorize_invariants_property(spark):
    """Property: output values lie within the group's [lo, hi]; row
    count and NULL positions preserved; clip flags consistent."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from taxi_data_pipeline_pset2_spark.operators.robust import winsorize

    rows_strategy = st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.one_of(st.none(), st.integers(-100, 100).map(float)),
        ),
        min_size=2,
        max_size=20,
    ).filter(lambda rs: all(
        sum(1 for g2, v in rs if g2 == g and v is not None) >= 1
        for g in {g for g, _ in rs}
    ))

    @given(rows=rows_strategy)
    @settings(max_examples=10, deadline=None)
    def run(rows):
        df = spark.createDataFrame(rows, "g string, v double")
        out = winsorize(df, "v", ["g"], lower=0.1, upper=0.9, flag=True).collect()
        assert len(out) == len(rows)
        by_g = {}
        for g, v in rows:
            if v is not None:
                by_g.setdefault(g, []).append(v)
        for r in out:
            if r.v is None:
                assert r["__clip"] == 0
                continue
            vs = sorted(by_g[r.g])
            assert vs[0] <= r.v <= vs[-1]  # clip stays inside data range
            if r["__clip"] == 0:
                # unclipped rows keep their value (it was inside bounds)
                assert any(abs(r.v - x) < 1e-9 for x in vs)

    run()


def test_null_group_key_rows_are_preserved(spark):
    """ADVICE r5 (medium): a NULL group key is a legitimate cohort --
    groupBy treats it as one, so the broadcast-back join must too. Both
    winsorize and zscore_flag are row-preserving projections."""
    from taxi_data_pipeline_pset2_spark.operators.robust import zscore_flag

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 3.0),
        (None, 10.0), (None, 20.0), (None, None),
    ]
    df = spark.createDataFrame(rows, "g string, v double")

    w = winsorize(df, "v", ["g"], lower=0.0, upper=1.0, flag=True)
    assert w.count() == 6
    null_grp = {r["v"] for r in w.filter(F.col("g").isNull()).collect()}
    assert null_grp == {10.0, 20.0, None}  # NULL value stays NULL too

    z = zscore_flag(df, "v", ["g"])
    assert z.count() == 6
    zn = {r["zscore"] for r in z.filter(F.col("g").isNull()).collect()}
    # NULL cohort: mean 15, sd sqrt(50) -> z = +-0.707107; NULL v -> NULL z
    assert zn == {-0.707107, 0.707107, None}


def test_percentile_rank_blend_exact_and_sketch_agree(spark):
    """Exact window ranks vs the GK-sketch rank path: same ordering,
    ranks within sketch tolerance; weights and direction flags respected."""
    import pytest

    from taxi_data_pipeline_pset2_spark.operators.robust import (
        percentile_rank_blend,
    )

    rows = [(i, float(i), float(100 - i)) for i in range(101)]
    df = spark.createDataFrame(rows, "id int, up double, down double")
    sig = [("up", 0.5, True), ("down", 0.5, False)]
    exact = {
        r.id: r.quality_blend
        for r in percentile_rank_blend(df, sig, exact=True).collect()
    }
    # up and down are perfectly anti-correlated with matched direction
    # flags -> both ranks equal -> blend == percent rank of id
    assert exact[0] == 0.0 and exact[100] == 1.0
    assert exact[50] == 0.5
    approx = {
        r.id: r.quality_blend
        for r in percentile_rank_blend(
            df, sig, exact=False, approx_bins=101
        ).collect()
    }
    for i in range(0, 101, 10):
        assert abs(approx[i] - exact[i]) <= 0.02, (i, approx[i], exact[i])

    with pytest.raises(ValueError):
        percentile_rank_blend(df, [])
    with pytest.raises(ValueError):
        percentile_rank_blend(df, [("up", 0.0, True)])


def test_percentile_rank_blend_grouped(spark):
    from taxi_data_pipeline_pset2_spark.operators.robust import (
        percentile_rank_blend,
    )

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 30.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r.g, r.v): r.quality_blend
        for r in percentile_rank_blend(df, [("v", 1.0, True)], ["g"]).collect()
    }
    assert got[("a", 1.0)] == 0.0 and got[("a", 3.0)] == 1.0
    assert got[("a", 2.0)] == 0.5
    assert got[("b", 10.0)] == 0.0 and got[("b", 30.0)] == 1.0


def test_impute_group_median(spark):
    from taxi_data_pipeline_pset2_spark.operators.robust import (
        impute_group_median,
    )

    rows = [
        ("a", 1.0), ("a", 3.0), ("a", None),
        ("b", 10.0), ("b", None),
        (None, 7.0), (None, None),   # NULL group key is a cohort
        ("empty", None),             # all-NULL group: stays NULL
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = impute_group_median(df, "v", ["g"], flag=True)
    got = {(r["g"], r["v"], r["__imputed"]) for r in out.collect()}
    assert ("a", 2.0, True) in got      # median of {1,3}
    assert ("b", 10.0, True) in got
    assert (None, 7.0, True) in got
    assert ("empty", None, False) in got
    assert out.count() == 8


class TestQuantileNormalize:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, source string, s double")

    def test_identity_when_single_source(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.robust import quantile_normalize

        rows = [(i, "a", float(v)) for i, v in enumerate([5, 1, 9, 3, 7])]
        out = quantile_normalize(self._df(spark, rows), "s", "source", "doc_id")
        got = {r["doc_id"]: r["norm_score"] for r in out.collect()}
        # one source spanning the corpus: pr maps rank r to global rank r
        assert got == {i: float(v) for i, v in enumerate([5, 1, 9, 3, 7])}

    def test_cdf_matching_two_scales(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.robust import quantile_normalize

        # source a on a 0-4 scale, source b on a 100-104 scale, same shape
        rows = [(i, "a", float(i)) for i in range(5)] + [
            (10 + i, "b", float(100 + i)) for i in range(5)
        ]
        out = quantile_normalize(self._df(spark, rows), "s", "source", "doc_id")
        byid = {r["doc_id"]: r["norm_score"] for r in out.collect()}
        # global sorted: 0,1,2,3,4,100,...,104 (N=10). pr in {0,.25,.5,.75,1}
        # j = round(pr*9)+1 -> positions 1,3,6,8,10 -> values 0,2,100,102,104
        want = [0.0, 2.0, 100.0, 102.0, 104.0]
        assert [byid[i] for i in range(5)] == want
        assert [byid[10 + i] for i in range(5)] == want  # scales erased

    def test_monotone_within_source_and_null_excluded(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.robust import quantile_normalize

        import random

        rng = random.Random(5)
        rows = [
            (i, "ab"[i % 2], float(rng.randint(0, 50)))
            for i in range(200)
        ] + [(999, "a", None)]
        out = quantile_normalize(
            self._df(spark, rows), "s", "source", "doc_id"
        ).collect()
        assert all(r["doc_id"] != 999 for r in out)
        assert len(out) == 200
        for src in "ab":
            got = sorted(
                ((r["s"], r["doc_id"], r["norm_score"]) for r in out if r["source"] == src)
            )
            norms = [g[2] for g in got]
            assert norms == sorted(norms)  # monotone in (score, id)

    def test_singleton_source_gets_global_median(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.robust import quantile_normalize

        rows = [(i, "big", float(i)) for i in range(9)] + [(100, "solo", 999.0)]
        out = quantile_normalize(self._df(spark, rows), "s", "source", "doc_id")
        solo = [r for r in out.collect() if r["source"] == "solo"][0]
        # pr = 0.5, N = 10 -> j = round(4.5)+1 = 6 -> 6th smallest global value
        assert solo["norm_score"] == 5.0


class TestGlobalRankBucketed:
    def test_matches_naive_rank_and_handles_ties(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.robust import (
            global_rank_bucketed,
        )
        import random

        rng = random.Random(7)
        rows = [(i, rng.choice([1.5, 2.5, 2.5, 9.0, rng.uniform(0, 100)]))
                for i in range(400)] + [(999, None)]
        df = spark.createDataFrame(rows, "id long, v double")
        got = {r.id: r.pos for r in global_rank_bucketed(df, "v", "id").collect()}
        ref = sorted(((v, i) for i, v in rows if v is not None))
        for pos, (_, i) in enumerate(ref, 1):
            assert got[i] == pos
        assert 999 not in got  # NULL excluded

    def test_constant_column_single_bucket(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.robust import (
            global_rank_bucketed,
        )

        df = spark.createDataFrame([(i, 5.0) for i in range(20)], "id long, v double")
        got = {r.id: r.pos for r in global_rank_bucketed(df, "v", "id").collect()}
        assert got == {i: i + 1 for i in range(20)}  # ties -> id order

    def test_bucket_count_invariance(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.robust import (
            global_rank_bucketed,
        )
        import random

        rng = random.Random(3)
        rows = [(i, rng.gauss(0, 1)) for i in range(300)]
        df = spark.createDataFrame(rows, "id long, v double")
        base = sorted((r.id, r.pos) for r in global_rank_bucketed(df, "v", "id", 1024).collect())
        for nb in (1, 7, 64):
            got = sorted((r.id, r.pos) for r in global_rank_bucketed(df, "v", "id", nb).collect())
            assert got == base, f"n_buckets={nb} diverged"


def test_global_rank_excludes_nan_keeping_buckets_partitioned(spark):
    """A single NaN previously made _hi = NaN -> every bucket NaN ->
    all rows in one bucket, silently reinstating the corpus-sized
    single-task window; NaN is now excluded like NULL."""
    import math

    from taxi_data_pipeline_pset2_spark.operators.robust import (
        global_rank_bucketed,
    )

    rows = [(i, float(i)) for i in range(20)] + [(99, math.nan)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = global_rank_bucketed(df, "v", id_col="id", n_buckets=4).collect()
    assert {r.id for r in out} == set(range(20))  # NaN row excluded
    assert [r.pos for r in sorted(out, key=lambda r: r.id)] == list(
        range(1, 21)
    )
