"""Heavy hitters: candidate pass is a superset, verify pass is exact,
result equals the full exact aggregate on small data."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.frequency import (
    frequent_shingles,
    heavy_hitters,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_heavy_hitters_equals_exact_groupby(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_type")
    got = {
        (r.value, r.n, r.frac) for r in heavy_hitters(events, "event_type", 0.1).collect()
    }
    n = events.count()
    want = {
        (r.event_type, r.n, round(r.n / n, 6))
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 0.1 * n)
        .collect()
    }
    assert got == want and got  # exact counts, exact membership


def test_heavy_hitters_drops_infrequent(spark):
    rows = [("hot",)] * 90 + [(f"cold{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "v string")
    out = heavy_hitters(df, "v", support=0.5).collect()
    assert [(r.value, r.n, r.frac) for r in out] == [("hot", 90, 0.9)]


def test_frequent_shingles_finds_planted_boilerplate(spark):
    boiler = "all rights reserved worldwide"
    rows = [(i, f"{boiler} document body {i} unique tail {i}") for i in range(100)]
    rows += [(100 + i, f"clean text number {i} with words {i}") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.value: r.frac for r in frequent_shingles(docs, support=0.3).collect()}
    assert "all rights reserved" in out
    assert out["all rights reserved"] == 0.5  # 100 of 200 docs
    # nothing from the unique tails sneaks in
    assert all(f >= 0.3 for f in out.values())
