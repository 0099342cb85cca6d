"""Approximate aggregates: error bounds vs the exact computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.queries import spark_queries
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    approx = {
        r.event_type: r.approx_users
        for r in spark_queries()["approx_event_profile"](spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.exact
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        assert abs(approx[et] - ex) <= max(0.05 * ex, 2.0), (et, approx[et], ex)


def test_approx_percentiles_bracket_exact(spark, sf_dir):
    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in spark_queries()["approx_event_profile"](spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.pcts
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("pcts"))
        .collect()
    }
    for et, (a50, a90, a99) in approx.items():
        e50, e90, e99 = exact[et]
        spread = max(e99 - e50, 1e-9)
        assert abs(a50 - e50) <= 0.05 * spread
        assert abs(a90 - e90) <= 0.05 * spread
        assert abs(a99 - e99) <= 0.10 * spread


def test_sketch_rollup_merge_matches_direct(spark, sf_dir):
    """Merging daily HLL sketches must estimate the same cardinality as
    sketching the raw column directly, and land near the exact count."""
    from pyspark.sql import functions as F

    rolled = {
        r.event_type: r.merged_distinct_users
        for r in spark_queries()["sketch_rollup_daily_users"](spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rolled) == set(exact)
    for et, ex in exact.items():
        assert abs(rolled[et] - ex) <= max(0.05 * ex, 2.0), (et, rolled[et], ex)
