"""Iterative k-means over embedding columns (SURVEY.md 2b; the
"iterative algorithm" class the driver's oracle cannot express in SQL).

Lloyd's algorithm with deterministic initialization (the k lowest
vec_ids), expressed Spark-first:

- assignment step: one ``mapInPandas`` pass; distances to all k centroids
  are a single numpy matmul per Arrow batch (same vectorized-kernel
  pattern as knn_topk_vectorized)
- update step: per-cluster mean via ``posexplode`` + one hash aggregate
  on (cluster, dim) -- k*dim rows collect to the driver (tiny), becoming
  the next broadcast
- iterate a fixed number of rounds; each round is one scan + one shuffle
  of (cluster, dim) partials, independent of corpus size

At 100 TB the per-round cost is a corpus scan + a k*dim-sized aggregate;
the driver never holds more than the centroid matrix. pyspark.ml's
KMeans does the same dance with kmeans|| init; this hand-rolled version
exists for deterministic, dependency-light clustering with an auditable
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_fit_assign(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_centroids: bool = False,
) -> DataFrame:
    """Returns (id, cluster, dist) after ``n_iter`` Lloyd rounds; with
    ``return_centroids`` also the final (k, D) centroid array -- the
    model consumers like IVF need, without re-deriving it with another
    corpus pass (and the re-derived means would be one Lloyd step ahead
    of the centroids that produced the assignment)."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    init_rows = base.orderBy(id_col).limit(k).collect()
    centroids = np.array([r["v"] for r in init_rows], dtype=np.float64)  # (k, D)

    out_schema = f"{id_col} long, cluster int, dist double"

    def make_assign(cent: "np.ndarray"):
        b = spark.sparkContext.broadcast(cent)

        def run(batches):
            C = b.value  # (k, D)
            c_sq = (C * C).sum(axis=1)  # (k,)
            for pdf in batches:
                X = np.array(list(pdf["v"]), dtype=np.float64)  # (N, D)
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
                d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c_sq[None, :]
                np.maximum(d2, 0.0, out=d2)
                idx = d2.argmin(axis=1)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "cluster": idx.astype(np.int32),
                        "dist": np.sqrt(d2[np.arange(len(idx)), idx]),
                    }
                )

        return run

    assigned = None
    for _ in range(n_iter):
        assigned = base.mapInPandas(make_assign(centroids), schema=out_schema).join(
            base, id_col
        )
        # update: mean per (cluster, dim) -- k*D rows back to the driver
        means = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        # Contract check: the driver-side traffic is k*D rows BY
        # CONSTRUCTION (cluster in [0,k) from argmin, dim in [0,D)).
        # A ragged vector column would silently break that; fail loudly.
        if len(means) > k * centroids.shape[1]:
            raise ValueError(
                f"centroid update returned {len(means)} rows > k*D = "
                f"{k * centroids.shape[1]}; embedding column has "
                "inconsistent dimensions"
            )
        new_c = centroids.copy()
        for r in means:
            new_c[r["cluster"], r["dim"]] = r["m"]
        centroids = new_c

    assigned = base.mapInPandas(make_assign(centroids), schema=out_schema)
    if return_centroids:
        return assigned, centroids
    return assigned


def kmeans_inertia(assigned: DataFrame) -> float:
    """Sum of squared distances -- the quantity Lloyd's monotonically
    non-increases (up to float-sum order noise)."""
    row = assigned.agg(
        F.sum(F.col("dist") * F.col("dist")).alias("inertia")
    ).collect()[0]
    return float(row["inertia"])
