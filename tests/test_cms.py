"""Count-min sketch tests: one-sided error, merge = rebuild, collision
behavior, determinism across partitionings."""

import pytest

from taxi_data_pipeline_pset2_spark.operators.cms import (
    cms_merge,
    cms_point_estimates,
    cms_sketch,
)


@pytest.fixture(scope="module")
def zipf_df(spark):
    # key i appears (101 - i) times, i = 1..100 -> 5050 rows
    rows = [(i,) for i in range(1, 101) for _ in range(101 - i)]
    return spark.createDataFrame(rows, "k int")


class TestCms:
    def test_overestimates_only_and_bounded(self, zipf_df, spark):
        sk = cms_sketch(zipf_df, "k", width=256, depth=4)
        items = spark.createDataFrame([(i,) for i in range(1, 101)], "k int")
        est = {
            int(r.value): r.est
            for r in cms_point_estimates(sk, items, "k", 256, 4).collect()
        }
        exact = {i: 101 - i for i in range(1, 101)}
        n = 5050
        for i, e in est.items():
            assert e >= exact[i]  # CMS never underestimates
            # eps = e/width -> bound e*N/width ~ 53; generous 3x slack
            assert e - exact[i] <= 3 * 2.71828 * n / 256

    def test_tight_when_wide(self, zipf_df, spark):
        sk = cms_sketch(zipf_df, "k", width=8192, depth=4)
        items = spark.createDataFrame([(i,) for i in range(1, 101)], "k int")
        est = {
            int(r.value): r.est
            for r in cms_point_estimates(sk, items, "k", 8192, 4).collect()
        }
        assert est == {i: 101 - i for i in range(1, 101)}  # no collisions

    def test_absent_item_zero_when_wide(self, zipf_df, spark):
        sk = cms_sketch(zipf_df, "k", width=8192, depth=4)
        items = spark.createDataFrame([(999,)], "k int")
        r = cms_point_estimates(sk, items, "k", 8192, 4).collect()[0]
        assert r.est == 0

    def test_merge_equals_rebuild(self, spark):
        a = spark.createDataFrame([(i % 10,) for i in range(200)], "k int")
        b = spark.createDataFrame([(i % 7,) for i in range(150)], "k int")
        merged = cms_merge(
            cms_sketch(a, "k", 128, 3), cms_sketch(b, "k", 128, 3)
        )
        rebuilt = cms_sketch(a.unionByName(b), "k", 128, 3)
        m = {(r.row, r.bucket): r.c for r in merged.collect()}
        rb = {(r.row, r.bucket): r.c for r in rebuilt.collect()}
        assert m == rb

    def test_partitioning_invariant(self, zipf_df, spark):
        s1 = {
            (r.row, r.bucket): r.c
            for r in cms_sketch(zipf_df, "k", 64, 2).collect()
        }
        s2 = {
            (r.row, r.bucket): r.c
            for r in cms_sketch(zipf_df.repartition(13), "k", 64, 2).collect()
        }
        assert s1 == s2

    def test_validation(self, zipf_df):
        with pytest.raises(ValueError):
            cms_sketch(zipf_df, "k", width=1)
        with pytest.raises(ValueError):
            cms_merge()


class TestCmsJoinSize:
    def test_upper_biased_and_bounded(self, spark):
        import random

        from taxi_data_pipeline_pset2_spark.operators.cms import (
            cms_join_size,
            cms_sketch,
        )

        rng = random.Random(4)
        a_keys = [rng.randint(0, 200) for _ in range(800)]
        b_keys = [rng.randint(0, 200) for _ in range(500)]
        a = spark.createDataFrame([(k,) for k in a_keys], "k long")
        b = spark.createDataFrame([(k,) for k in b_keys], "k long")
        width, depth = 1024, 4
        est = cms_join_size(
            cms_sketch(a, "k", width, depth),
            cms_sketch(b, "k", width, depth),
            depth,
        ).collect()[0].est_join_size
        from collections import Counter

        ca, cb = Counter(a_keys), Counter(b_keys)
        true = sum(ca[k] * cb[k] for k in ca)
        assert est >= true  # one-sided
        assert est <= true + len(a_keys) * len(b_keys) / width

    def test_disjoint_keys_estimate_near_zero(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.cms import (
            cms_join_size,
            cms_sketch,
        )

        a = spark.createDataFrame([(i,) for i in range(50)], "k long")
        b = spark.createDataFrame([(i + 1000,) for i in range(50)], "k long")
        est = cms_join_size(
            cms_sketch(a, "k", 2048, 4), cms_sketch(b, "k", 2048, 4), 4
        ).collect()[0].est_join_size
        # true join size 0; collisions may add a little, min-row damps it
        assert est <= 5

    def test_exact_on_collision_free_sketch(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.cms import (
            cms_join_size,
            cms_sketch,
        )

        a = spark.createDataFrame([(1,), (1,), (2,)], "k long")
        b = spark.createDataFrame([(1,), (2,), (2,)], "k long")
        est = cms_join_size(
            cms_sketch(a, "k", 4096, 4), cms_sketch(b, "k", 4096, 4), 4
        ).collect()[0].est_join_size
        assert est == 2 * 1 + 1 * 2  # 3 keys in 4096 buckets: no collision


def test_cms_error_audit_guarantees(spark):
    """The r12 audit row's semantic claims, independent of the hash
    compare: CMS is one-sided (zero underestimates), the mean is the
    sum (the x1e6 column is derived, not independent), and every
    probed item exists (n_items = distinct part keys)."""
    from taxi_data_pipeline_pset2_spark.queries.analytics import (
        cms_error_audit,
    )
    from tests.conftest import SF_SMOKE_DIR

    row = cms_error_audit(spark, SF_SMOKE_DIR).collect()[0]
    assert row.n_underestimates == 0
    assert row.max_err >= 0 and row.sum_err >= 0
    assert row.mean_err_x1e6 == round(row.sum_err * 1_000_000.0 / row.n_items)
    assert row.n_items == 200
    assert 0 <= row.n_over_bound <= row.n_items
