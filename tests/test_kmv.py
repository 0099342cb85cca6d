"""KMV sketches: exactness below k, estimate accuracy above k,
coordinated set operations vs ground truth, mergeability."""

from __future__ import annotations

import pytest

from taxi_data_pipeline_pset2_spark.operators.kmv import (
    kmv_distinct_estimate,
    kmv_set_estimates,
    kmv_sketch,
)


def _vals(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


class TestKmv:
    def test_exact_below_k(self, spark):
        df = _vals(spark, [f"x{i}" for i in range(40)] * 3)  # 40 distinct
        sk = kmv_sketch(df, "v", k=64)
        r = kmv_distinct_estimate(sk, k=64).collect()[0]
        assert r.n_kept == 40 and r.est_distinct == 40.0

    def test_estimate_within_tolerance_above_k(self, spark):
        n = 5000
        df = _vals(spark, [f"id{i}" for i in range(n)])
        r = kmv_distinct_estimate(kmv_sketch(df, "v", 256), 256).collect()[0]
        assert r.n_kept == 256
        assert abs(r.est_distinct - n) / n < 0.25  # ~1/sqrt(k) regime

    def test_set_estimates_track_truth(self, spark):
        a_vals = [f"k{i}" for i in range(3000)]
        b_vals = [f"k{i}" for i in range(1500, 4500)]  # 50% overlap
        a = kmv_sketch(_vals(spark, a_vals), "v", 256)
        b = kmv_sketch(_vals(spark, b_vals), "v", 256)
        r = kmv_set_estimates(a, b, 256).collect()[0]
        assert abs(r.est_union - 4500) / 4500 < 0.25
        assert abs(r.est_intersection - 1500) / 1500 < 0.35
        assert 0.2 < r.jaccard < 0.5  # true = 1500/4500 = 0.333

    def test_disjoint_sets(self, spark):
        a = kmv_sketch(_vals(spark, [f"a{i}" for i in range(500)]), "v", 128)
        b = kmv_sketch(_vals(spark, [f"b{i}" for i in range(500)]), "v", 128)
        r = kmv_set_estimates(a, b, 128).collect()[0]
        assert r.jaccard == 0.0 and r.est_intersection == 0.0

    def test_identical_sets(self, spark):
        vals = [f"s{i}" for i in range(2000)]
        a = kmv_sketch(_vals(spark, vals), "v", 128)
        b = kmv_sketch(_vals(spark, vals), "v", 128)
        r = kmv_set_estimates(a, b, 128).collect()[0]
        assert r.jaccard == 1.0
        assert r.est_intersection == r.est_union == r.est_a

    def test_k_validation(self, spark):
        with pytest.raises(ValueError, match="k must be"):
            kmv_sketch(_vals(spark, ["a"]), "v", k=1)


class TestGroupedRollup:
    def test_merge_equals_direct_exactly(self, spark):
        """KMV's defining identity: k-smallest of the union of fine
        partials == k-smallest of a from-scratch coarse build -- exact
        sketch equality, not just estimate agreement."""
        from taxi_data_pipeline_pset2_spark.operators.kmv import (
            kmv_grouped_sketch,
            kmv_rollup,
        )

        rows = [
            ("g1", f"d{i % 5}", v) for i, v in enumerate(range(200))
        ] + [("g2", f"d{i % 3}", v) for i, v in enumerate(range(150, 300))]
        df = spark.createDataFrame(rows, "g string, d string, v long")
        k = 16
        fine = kmv_grouped_sketch(df, "v", ["g", "d"], k)
        merged = sorted(
            map(tuple, kmv_rollup(fine, ["g"], k).collect())
        )
        direct = sorted(
            map(tuple, kmv_grouped_sketch(df, "v", ["g"], k).collect())
        )
        assert merged == direct

    def test_grouped_estimate_exact_below_k(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.kmv import (
            kmv_grouped_estimate,
            kmv_grouped_sketch,
        )

        df = spark.createDataFrame(
            [("a", i) for i in range(5)] + [("b", i) for i in range(900)],
            "g string, v long",
        )
        sk = kmv_grouped_sketch(df, "v", ["g"], 64)
        est = {
            r.g: (r.n_kept, r.est_distinct)
            for r in kmv_grouped_estimate(sk, ["g"], 64).collect()
        }
        assert est["a"] == (5, 5.0)  # below k -> exact
        nk, e = est["b"]
        assert nk == 64 and abs(e - 900) / 900 < 0.35  # estimator path

    def test_grouped_sketch_partitioning_invariant(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.kmv import (
            kmv_grouped_sketch,
        )

        df = spark.createDataFrame(
            [("g", i) for i in range(300)], "g string, v long"
        )
        a = sorted(map(tuple, kmv_grouped_sketch(df, "v", ["g"], 8).collect()))
        b = sorted(
            map(
                tuple,
                kmv_grouped_sketch(df.repartition(11), "v", ["g"], 8).collect(),
            )
        )
        assert a == b


def test_kmv_error_audit_is_estimator_path(spark):
    """The audit must exercise the (k-1)*M/h_k estimator, not the
    exact-count fallback (n_kept == k, exact > k), and the ppm column
    must be consistent with the reported estimate and truth."""
    from taxi_data_pipeline_pset2_spark.queries.analytics import (
        kmv_error_audit,
    )
    from tests.conftest import SF_SMOKE_DIR

    row = kmv_error_audit(spark, SF_SMOKE_DIR).collect()[0]
    assert row.n_kept == 256
    assert row.exact_distinct > 256
    assert row.rel_err_ppm == round(
        abs(row.est_distinct - row.exact_distinct)
        * 1_000_000.0
        / row.exact_distinct
    )
