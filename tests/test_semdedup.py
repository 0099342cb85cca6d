"""SemDeDup tests: planted semantic duplicates collapse to one survivor
per group, the farthest-from-centroid keep policy holds, non-duplicates
survive untouched, and the operator is deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from taxi_data_pipeline_pset2_spark.operators.clustering import kmeans_fit_assign
from taxi_data_pipeline_pset2_spark.operators.semdedup import (
    semantic_dedup,
    semantic_pairs,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table

PLANT_BASE = 1_000_000


def _fixture(spark, sf_dir):
    """Corpus + planted duplicates: for each of three base rows add an
    exact copy (id+1M) and a tiny-perturbation copy (id+2M); cosine
    within each planted group is ~1.0, far above any natural pair."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.orderBy("vec_id").limit(3).collect()
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    planted = []
    for r in base:
        v = list(r.embedding)
        planted.append((r.vec_id + PLANT_BASE, v))
        w = list(v)
        w[0] = float(w[0]) + 1e-4
        planted.append((r.vec_id + 2 * PLANT_BASE, w))
    dup_groups = {
        r.vec_id: {r.vec_id, r.vec_id + PLANT_BASE, r.vec_id + 2 * PLANT_BASE}
        for r in base
    }
    return emb.unionByName(spark.createDataFrame(planted, schema)), dup_groups


def test_planted_groups_collapse_to_one_survivor(spark, sf_dir):
    emb, dup_groups = _fixture(spark, sf_dir)
    kept = semantic_dedup(emb, k=4, n_iter=3, threshold=0.9999)
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    dup_ids = set().union(*dup_groups.values())
    # every non-planted row survives
    assert (all_ids - dup_ids) <= kept_ids
    # exactly one survivor per planted group
    for group in dup_groups.values():
        assert len(group & kept_ids) == 1


def test_pairs_are_within_cluster_and_above_threshold(spark, sf_dir):
    emb, dup_groups = _fixture(spark, sf_dir)
    assigned = kmeans_fit_assign(emb, k=4, n_iter=3)
    pairs = semantic_pairs(emb, assigned, threshold=0.9999)
    rows = pairs.collect()
    assert rows, "planted duplicates must produce pairs"
    clusters = {r.vec_id: r.cluster for r in assigned.collect()}
    for r in rows:
        assert r.cosine >= 0.9999
        assert clusters[r.id_a] == clusters[r.id_b]
    # each planted group's exact-copy pair is present
    found = {(min(a, b), max(a, b)) for a, b in ((r.id_a, r.id_b) for r in rows)}
    for base_id in dup_groups:
        assert (base_id, base_id + PLANT_BASE) in found


def test_survivor_is_farthest_from_centroid(spark, sf_dir):
    emb, dup_groups = _fixture(spark, sf_dir)
    assigned = kmeans_fit_assign(emb, k=4, n_iter=3)
    dists = {r.vec_id: r.dist for r in assigned.collect()}
    kept = semantic_dedup(emb, k=4, n_iter=3, threshold=0.9999)
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    for group in dup_groups.values():
        survivor = (group & kept_ids).pop()
        best = max(group, key=lambda i: (dists[i], -i))
        assert survivor == best


def test_semantic_dedup_deterministic(spark, sf_dir):
    emb, _ = _fixture(spark, sf_dir)
    a = sorted(r.vec_id for r in semantic_dedup(emb, k=4, n_iter=3, threshold=0.9999).collect())
    b = sorted(r.vec_id for r in semantic_dedup(emb, k=4, n_iter=3, threshold=0.9999).collect())
    assert a == b
