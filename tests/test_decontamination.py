"""Decontamination tests: planted benchmark overlap must be flagged and
dropped; clean and too-short docs must survive; both policies behave."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.decontamination import (
    contamination_scores,
    decontaminate,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def _fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = (
        docs.orderBy("doc_id")
        .limit(10)
        .select(F.col("doc_id").alias("doc_id"), "text")
    )
    # plant: three train docs that embed a benchmark doc verbatim inside
    # unrelated padding, with ids above the corpus range
    planted = bench.limit(3).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat(F.lit("prefix words here "), F.col("text"), F.lit(" suffix")).alias(
            "text"
        ),
    )
    return docs.unionByName(planted), bench, planted


def test_planted_contamination_flagged_and_dropped(spark, sf_dir):
    train, bench, planted = _fixture(spark, sf_dir)
    scores = contamination_scores(train, bench, k=8)
    flagged = {
        r.doc_id
        for r in scores.filter(F.col("n_contaminated") > 0).collect()
    }
    planted_ids = {r.doc_id for r in planted.collect()}
    assert planted_ids <= flagged
    # benchmark docs are verbatim members of the corpus (the first 10
    # docs): they flag with frac == 1. Planted copies carry extra
    # padding + boundary shingles, so their frac is high but below 1.
    fracs = {r.doc_id: r.contamination_frac for r in scores.collect()}
    bench_ids = {r.doc_id for r in bench.collect()}
    assert all(fracs[i] == 1.0 for i in bench_ids if i in fracs)
    assert all(0.2 < fracs[i] < 1.0 for i in planted_ids)

    clean = decontaminate(train, bench, k=8)
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    assert kept.isdisjoint(planted_ids)
    assert kept == {r.doc_id for r in train.collect()} - flagged


def test_frac_policy_and_short_docs_survive(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),  # verbatim
            (2, "alpha beta gamma delta epsilon zeta unrelated tail words " * 1),
            (3, "tiny doc"),  # shorter than k: no shingles, always survives
            (4, "completely different content with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    scores = {
        r.doc_id: (r.n_contaminated, r.contamination_frac)
        for r in contamination_scores(train, bench, k=6).collect()
    }
    assert scores[1][1] == 1.0
    assert 0 < scores[2][1] < 1.0
    assert 3 not in scores  # no 6-gram
    assert scores[4] == (0, 0.0)

    # strict frac policy keeps the partial overlapper, drops the verbatim
    kept = {
        r.doc_id
        for r in decontaminate(
            train, bench, k=6, max_frac=0.9, min_hits=10**9
        ).collect()
    }
    assert kept == {2, 3, 4}
    # default any-collision policy drops both overlappers
    kept_strict = {r.doc_id for r in decontaminate(train, bench, k=6).collect()}
    assert kept_strict == {3, 4}
