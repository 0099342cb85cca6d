"""Iterative k-means over embedding columns (SURVEY.md 2b; the
"iterative algorithm" class the driver's oracle cannot express in SQL).

Lloyd's algorithm with deterministic initialization (the k lowest
vec_ids), expressed Spark-first:

- assignment + update in ONE ``mapInPandas`` pass per round: distances
  to all k centroids are a single numpy matmul per Arrow batch (same
  vectorized-kernel pattern as knn_topk_vectorized), and the same kernel
  emits per-batch partial centroid sums -- (cluster, dim, sum, count)
  rows, k*D per batch -- so the update needs no join back to the corpus
  and no corpus-sized posexplode, just one tiny hash aggregate whose
  k*D result collects to the driver and becomes the next broadcast
- the projected corpus is persisted across rounds (it is scanned once
  per Lloyd round plus the final assignment; without the persist each
  round would re-read and re-project the source)

At 100 TB the per-round cost is one cached-corpus scan + a k*D-sized
aggregate; the driver never holds more than the centroid matrix.
pyspark.ml's KMeans does the same dance with kmeans|| init; this
hand-rolled version exists for deterministic, dependency-light
clustering with an auditable plan.
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
    # One cached materialization feeds every Lloyd round AND the final
    # assignment; without it each round re-reads and re-projects the
    # source (n_iter extra corpus scans -- the r4 'wasteful' finding).
    base = base.persist()
    try:
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

        def make_partial_sums(cent: "np.ndarray"):
            """Assignment + per-batch partial centroid sums in one kernel:
            emits (cluster, dim, sx, n) -- k*D rows per Arrow batch -- so
            the centroid update is a tiny aggregate over batch partials
            instead of a corpus-sized posexplode plus an id-join."""
            b = spark.sparkContext.broadcast(cent)

            def run(batches):
                C = b.value
                c_sq = (C * C).sum(axis=1)
                for pdf in batches:
                    X = np.array(list(pdf["v"]), dtype=np.float64)  # (N, D)
                    d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c_sq[None, :]
                    idx = d2.argmin(axis=1)  # (N,)
                    kk, D = C.shape
                    if X.shape[1] != D:
                        raise ValueError(
                            f"embedding dim {X.shape[1]} != centroid dim {D}; "
                            "embedding column has inconsistent dimensions"
                        )
                    sums = np.zeros((kk, D), dtype=np.float64)
                    np.add.at(sums, idx, X)
                    counts = np.bincount(idx, minlength=kk).astype(np.int64)
                    live = np.flatnonzero(counts)
                    yield pd.DataFrame(
                        {
                            "cluster": np.repeat(live, D).astype(np.int32),
                            "dim": np.tile(np.arange(D, dtype=np.int32), len(live)),
                            "sx": sums[live].ravel(),
                            "n": np.repeat(counts[live], D),
                        }
                    )

            return run

        for _ in range(n_iter):
            # update: exact mean per (cluster, dim) from batch partials --
            # k*D rows back to the driver, no corpus shuffle at all
            means = (
                base.mapInPandas(
                    make_partial_sums(centroids),
                    schema="cluster int, dim int, sx double, n long",
                )
                .groupBy("cluster", "dim")
                .agg((F.sum("sx") / F.sum("n")).alias("m"))
                .collect()
            )
            # Contract check: the driver-side traffic is k*D rows BY
            # CONSTRUCTION (cluster in [0,k) from argmin, dim in [0,D)).
            if len(means) > k * centroids.shape[1]:
                raise ValueError(
                    f"centroid update returned {len(means)} rows > k*D = "
                    f"{k * centroids.shape[1]}"
                )
            new_c = centroids.copy()
            for r in means:
                new_c[r["cluster"], r["dim"]] = r["m"]
            centroids = new_c

        # The final assignment runs against the still-cached corpus and is
        # materialized eagerly (localCheckpoint: narrow (id, cluster, dist)
        # rows on executor-local storage) so the cache can be released
        # before returning -- a lazy return would either recompute from
        # source after the unpersist or pin the cache forever.
        assigned = base.mapInPandas(
            make_assign(centroids), schema=out_schema
        ).localCheckpoint(eager=True)
        if return_centroids:
            return assigned, centroids
        return assigned
    finally:
        base.unpersist(blocking=False)


def kmeans_inertia(assigned: DataFrame) -> float:
    """Sum of squared distances -- the quantity Lloyd's monotonically
    non-increases (up to float-sum order noise)."""
    row = assigned.agg(
        F.sum(F.col("dist") * F.col("dist")).alias("inertia")
    ).collect()[0]
    return float(row["inertia"])
