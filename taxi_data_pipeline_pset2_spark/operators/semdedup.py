"""Semantic deduplication over embedding columns (SemDeDup).

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster the corpus embeddings
with k-means, compute pairwise cosine similarity WITHIN each cluster
only, and keep one representative per group of semantic duplicates --
the paper keeps the example FARTHEST from its cluster centroid (the
"low similarity to centroid" policy: outliers carry more information).

This composes three operators the engine already has, which is the
point -- semantic dedup is a pipeline shape, not a new kernel:

1. ``kmeans_fit_assign`` (operators/clustering.py): coarse partitioner.
   k must scale with corpus size so clusters stay bounded (the paper
   uses ~n/5k clusters); the within-cluster stage is O(sum c_i^2).
2. within-cluster pairing via ``bucket_pairs`` (operators/dedup.py):
   the same chunked triangular expansion the LSH buckets use, so one
   degenerate cluster cannot materialize an O(c^2) array on a single
   executor; verification is the exact int-scaled cosine from
   operators/similarity.py.
3. ``connected_components`` + survivor window (operators/components.py
   pattern): duplicate groups are components of the >=threshold pair
   graph; one window over (component) picks the survivor.

100 TB notes: every stage is bucketed -- the only all-pairs work happens
inside clusters, whose size the caller controls via k. No collect beyond
k x dim centroids (inside kmeans); survivor selection is one shuffle on
the component key over the pair-graph nodes (dup-sized, not
corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.clustering import kmeans_fit_assign
from taxi_data_pipeline_pset2_spark.operators.components import connected_components
from taxi_data_pipeline_pset2_spark.operators.dedup import bucket_pairs
from taxi_data_pipeline_pset2_spark.operators.similarity import verify_cosine_pairs


def semantic_pairs(
    emb: DataFrame,
    assigned: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) for same-cluster pairs with cosine >=
    threshold. ``assigned`` is the (id, cluster, dist) frame from
    ``kmeans_fit_assign`` -- passed in, not re-derived, so the caller
    pays for clustering exactly once across pairing and survivor
    selection."""
    buckets = (
        assigned.groupBy("cluster")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cands = bucket_pairs(buckets, "ids").select(
        F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b")
    )
    return verify_cosine_pairs(emb, cands, threshold, id_col, vec_col)


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 4,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Drop semantic duplicates; returns the surviving rows of ``emb``.

    Survivor policy (the paper's): within each duplicate component keep
    the example with the LARGEST distance to its cluster centroid,
    breaking ties on the lower id. Rows in no duplicate pair survive
    untouched (they never enter the component graph).
    """
    assigned = kmeans_fit_assign(emb, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    pairs = semantic_pairs(emb, assigned, threshold, id_col, vec_col)
    comp = connected_components(pairs, "id_a", "id_b")
    ranked = comp.join(
        assigned.select(F.col(id_col).alias("node"), "dist"), "node"
    ).withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy("component").orderBy(F.desc("dist"), F.asc("node"))
        ),
    )
    losers = ranked.filter(F.col("_rk") > 1).select(F.col("node").alias(id_col))
    return emb.join(losers, id_col, "left_anti")
