"""Iterative k-means: convergence, determinism, cluster sanity."""

from __future__ import annotations

from taxi_data_pipeline_pset2_spark.operators.clustering import (
    kmeans_fit_assign,
    kmeans_inertia,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_kmeans_inertia_decreases_and_assigns_all(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    one = kmeans_fit_assign(emb, k=8, n_iter=1)
    five = kmeans_fit_assign(emb, k=8, n_iter=5)
    assert one.count() == emb.count() == five.count()
    i1, i5 = kmeans_inertia(one), kmeans_inertia(five)
    assert i5 <= i1 * 1.0001, (i1, i5)
    clusters = {r.cluster for r in five.select("cluster").distinct().collect()}
    assert clusters <= set(range(8))
    assert len(clusters) >= 2


def test_kmeans_deterministic_rerun(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = {r.vec_id: r.cluster for r in kmeans_fit_assign(emb, k=4, n_iter=3).collect()}
    b = {r.vec_id: r.cluster for r in kmeans_fit_assign(emb, k=4, n_iter=3).collect()}
    assert a == b
