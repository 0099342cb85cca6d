"""Semantic tests for the dedup operators beyond oracle parity:
MinHash-LSH recall against exact Jaccard, SimHash locality, exact-dedup
behavior on planted duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    minhash_candidate_pairs,
    simhash_fingerprints,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_exact_dedup_finds_planted_duplicates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    groups = exact_dedup_groups(docs.unionByName(dup))
    dupes = groups.filter(F.col("n_copies") > 1)
    assert dupes.count() == 5
    # survivor is always the original (min id)
    assert dupes.filter(F.col("keep_id") >= 1_000_000).count() == 0


def test_minhash_lsh_recall_vs_exact_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert exact, "fixture should contain high-similarity near-dup pairs"
    candidates = {
        (r.doc_a, r.doc_b) for r in minhash_candidate_pairs(docs).collect()
    }
    recall = len(exact & candidates) / len(exact)
    # 4 bands x 4 rows: P(candidate) = 1-(1-j^4)^4 -> ~0.71 at j=0.6, ~0.98
    # at j=0.8. High-jaccard pairs must essentially all surface.
    assert recall >= 0.8, f"LSH recall {recall} over {len(exact)} true pairs"


def test_simhash_locality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    near = jaccard_pairs(docs, threshold=0.7).limit(20)
    fps = simhash_fingerprints(docs)
    joined = (
        near.join(fps.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a")), "doc_a")
        .join(fps.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b")), "doc_b")
        .select(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
    )
    rows = joined.collect()
    if rows:  # fixture-dependent; >=0.7-jaccard pairs should be close in hamming
        avg_h = sum(r.hamming for r in rows) / len(rows)
        assert avg_h <= 10, f"avg hamming {avg_h} too high for near-dup pairs"
