"""Semantic tests for similarity search: BRP-LSH vs brute force, IVF
bucket restriction, kNN shape invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.similarity import (
    brp_lsh_neighbors,
    knn_topk,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_knn_shape_and_ordering(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_topk(emb, F.col("vec_id") % 50 == 0, k=5).collect()
    by_query: dict[int, list] = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    n_queries = emb.filter(F.col("vec_id") % 50 == 0).count()
    assert len(by_query) == n_queries
    for rows in by_query.values():
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != r.query_id for r in rows)


def test_ivf_bucket_restriction(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_topk(emb, F.col("vec_id") % 50 == 0, k=5, bucket_col="label")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in out.collect():
        assert labels[r.query_id] == labels[r.neighbor_id]


def test_brp_lsh_agrees_with_bruteforce_on_closest(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    pairs = brp_lsh_neighbors(emb, threshold=8.0, bucket_length=4.0).collect()
    assert pairs, "LSH join should find pairs within the distance threshold"
    # every reported distance honors the threshold and the dedup ordering
    assert all(r.dist <= 8.0 and r.id_a < r.id_b for r in pairs)
