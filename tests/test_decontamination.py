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


def test_semantic_exact_vs_lsh_and_decontaminate(spark, sf_dir):
    """LSH-candidate mode must be a subset of exact mode with identical
    scores on shared ids; planted verbatim-copy bench vectors (cosine
    1.0 -> identical sign bits -> every band collides) must be caught by
    BOTH modes; semantic_decontaminate drops exactly the flagged ids."""
    from taxi_data_pipeline_pset2_spark.operators.decontamination import (
        semantic_contamination_scores,
        semantic_decontaminate,
    )
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 20 != 0)
    # bench = verbatim copies of 10 train vectors under fresh ids: the
    # planted contamination every decon path must flag
    planted = (
        train.orderBy("vec_id")
        .limit(10)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    planted_src = {r.vec_id for r in train.orderBy("vec_id").limit(10).collect()}

    exact = {
        r.vec_id: (r.n_bench_hits, r.max_cosine)
        for r in semantic_contamination_scores(train, planted, 0.99).collect()
    }
    lsh = {
        r.vec_id: (r.n_bench_hits, r.max_cosine)
        for r in semantic_contamination_scores(
            train, planted, 0.99, mode="lsh"
        ).collect()
    }
    assert planted_src <= set(exact)
    assert planted_src <= set(lsh), "identical vectors must collide on every band"
    assert set(lsh) <= set(exact)
    # scores agree wherever LSH found the same hit set
    assert all(lsh[k] == exact[k] for k in lsh if exact[k][0] == lsh[k][0])

    survivors = semantic_decontaminate(train, planted, 0.99)
    got_ids = {r.vec_id for r in survivors.select("vec_id").collect()}
    train_ids = {r.vec_id for r in train.select("vec_id").collect()}
    assert got_ids == train_ids - set(exact)

    # real-data sanity at the catalog threshold: exact mode finds hits,
    # lsh stays a subset (recall at moderate cosine is LSH-limited by
    # design -- the catalog entry uses exact mode)
    bench = emb.filter(F.col("vec_id") % 20 == 0)
    real_exact = semantic_contamination_scores(train, bench, 0.35).count()
    assert real_exact > 0


def test_semantic_bad_mode_rejected(spark, sf_dir):
    import pytest

    from taxi_data_pipeline_pset2_spark.operators.decontamination import (
        semantic_contamination_scores,
    )
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="mode"):
        semantic_contamination_scores(emb, emb, mode="fuzzy")
