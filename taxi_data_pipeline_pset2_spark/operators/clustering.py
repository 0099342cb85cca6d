"""Iterative k-means over embedding columns (SURVEY.md 2b).

Lloyd's algorithm with deterministic initialization (the k lowest
vec_ids), expressed Spark-first:

- assignment + update in ONE ``mapInPandas`` pass per round: distances
  to all k centroids are a single numpy int64 matmul per Arrow batch
  (same vectorized-kernel pattern as knn_topk_vectorized), and the same
  kernel emits per-batch partial centroid sums -- (cluster, dim, sum,
  count) rows, k*D per batch -- so the update needs no join back to the
  corpus and no corpus-sized posexplode, just one tiny hash aggregate
  whose k*D result collects to the driver and becomes the next broadcast
- the projected corpus is persisted across rounds (it is scanned once
  per Lloyd round plus the final assignment; without the persist each
  round would re-read and re-project the source)

EXACT INTEGER LLOYD'S (r9, the upgrade that cleared the float-argmin
oracle blocker): vectors quantize once to the repo-standard 1e-6 grid
(``int_embedding``), and centroids are kept ON that grid -- the update
is round_half_up(S/n) per component, computed as the pure-integer
floor((2S + n) / (2n)) from the EXACT integer component sums S. Every
distance is then an exact int64 quantity and every argmin an exact
integer comparison (ties to the lowest cluster id), so assignments and
centroids are bit-identical under ANY partitioning, Arrow batch size,
or aggregation order -- and reproducible in DuckDB, which is what makes
the ``kmeans_clusters`` catalog entry a full rows+schema+hash oracle
(an unrolled per-round CTE chain) instead of the rows-only check every
float formulation was stuck with: float centroid means depend on
shuffle-merge summation order, and a boundary-adjacent point can flip
its argmin on ~1e-16 noise. Centroid quantization costs <= 0.5e-6 per
component per round -- three orders of magnitude under the data grid --
and k-means is a heuristic partitioner; determinism is worth more than
the sixth decimal of a centroid.

At 100 TB the per-round cost is one cached-corpus scan + a k*D-sized
aggregate; the driver never holds more than the centroid matrix.
pyspark.ml's KMeans does the same dance with kmeans|| init; this
hand-rolled version exists for deterministic, dependency-light
clustering with an auditable plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# int64 headroom guard: the grid-wide cap (see operators/similarity.py
# MAX_ABS_IV) bounds each squared-difference term by (2*2^25)^2 = 2^52,
# so ||x-c||^2 <= D * 2^52 stays under 2^63 only up to D = 2048 -- the
# dimension-aware check lives INSIDE _exact_d2 (ADVICE r9: the
# magnitude cap alone is NOT safe at 4096 dims).
from taxi_data_pipeline_pset2_spark.operators.similarity import (
    MAX_ABS_IV as _MAX_ABS_IV,
)


def _exact_d2(X: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
    """Exact int64 squared distances between grid-quantized rows.

    Dimension-aware overflow bound (python-int arithmetic, so the check
    itself cannot wrap): ||x-c||^2 <= D*(2*max_abs)^2 must fit int64 --
    the magnitude cap alone only covers D <= 2048 (ADVICE r9)."""
    import numpy as np

    mx = int(max(np.abs(X).max(initial=0), np.abs(C).max(initial=0)))
    if mx >= _MAX_ABS_IV or X.shape[1] * (2 * mx) ** 2 >= 1 << 63:
        raise ValueError(
            f"quantized magnitudes (max {mx}) too large for exact "
            f"int64 distance arithmetic at dim {X.shape[1]}"
        )
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2, all exact int64
    return (
        (X * X).sum(axis=1)[:, None]
        - 2 * (X @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )


# Driver fast-path bound for kmeans_fit_assign, in CELLS (rows * dims):
# ~4M int64 cells is a few tens of MB collected -- the same bounded
# fast-path budget as components.py's DRIVER_CC_EDGE_CAP. Above it the
# distributed Lloyd loop runs unchanged, so the operator never depends
# on the corpus fitting anywhere.
DRIVER_KMEANS_CELL_CAP = 4_000_000


def kmeans_fit_assign(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_centroids: bool = False,
    driver_cell_cap: int = DRIVER_KMEANS_CELL_CAP,
) -> DataFrame:
    """Returns (id, cluster, dist) after ``n_iter`` exact-integer Lloyd
    rounds -- dist is the euclidean distance to the winning centroid in
    the original units, 6-dp rounded via the shared HALF_UP discipline;
    with ``return_centroids`` also the final (k, D) float centroid
    array in original units (the model consumers like IVF need, without
    re-deriving it with another corpus pass -- and the re-derived means
    would be one Lloyd step ahead of the centroids that produced the
    assignment).

    Corpora whose quantized matrix fits ``driver_cell_cap`` int64 cells
    run the whole Lloyd loop driver-side on one collected numpy matrix
    (r13): the distributed loop costs one cluster round-trip per round
    (Arrow pass + aggregate + collect) that at small scale is pure job
    overhead -- the same bounded-fast-path discipline as
    connected_components / bpe_learn, with the identical exact-integer
    update (shared _exact_d2, same floor((2S+n)/(2n)) centroid rule,
    same first-min argmin), so the result is bit-identical and tests
    pin the two paths equal. ``driver_cell_cap=0`` forces the
    distributed loop."""
    import numpy as np
    import pandas as pd

    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        SCALE,
        _round_half_up_6,
        int_embedding,
    )

    spark = emb.sparkSession
    # NULL vectors are excluded, not crashed on: the Arrow kernels build
    # np.int64 batch matrices where one None is a task-killing TypeError
    # (the _prepared/pq.py discipline); a row with no vector has no
    # cluster, so absence from the assignment is the honest output
    base = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), int_embedding(F.col(vec_col)).alias("iv")
    )
    out_schema = f"{id_col} long, cluster int, dist double"

    if driver_cell_cap > 0:
        # Bounded probe in ONE aggregate job (r14, VERDICT r13 #5 /
        # ADVICE r13): row count (the limit stops the scan at the
        # 1-cell-per-row bound) plus max dim, ZERO vector bytes to the
        # driver -- an over-cap corpus pays one cheap job and goes
        # distributed, never a multi-MB discarded collect. Dim from
        # max(size) instead of the first row only moves the row_cap,
        # i.e. the PATH choice -- the two paths are pinned bit-equal,
        # so any probe heuristic is semantics-free.
        stats = (
            base.select(F.size("iv").alias("_d"))
            .limit(driver_cell_cap + 1)
            .agg(F.count("*").alias("_n"), F.max("_d").alias("_dim"))
            .collect()[0]
        )
        n_bounded, dim = stats["_n"], stats["_dim"] or 1
        row_cap = max(driver_cell_cap // max(dim, 1), 1)
        if n_bounded == 0:
            # empty corpus: the distributed loop degrades to the same
            # empty assignment (guarded there since r14); mirror it
            # without tripping numpy shape errors
            assigned = spark.createDataFrame([], out_schema)
            if return_centroids:
                return assigned, np.zeros((0, dim), dtype=np.float64)
            return assigned
        if n_bounded <= row_cap:
            # under the cap: these rows ARE the whole corpus
            probe = base.limit(n_bounded).collect()
            # NULL-aware sort key (ADVICE r13): NULL ids first, the
            # same order the distributed init's asc_nulls_first
            # orderBy produces -- a None id must not TypeError here
            probe.sort(key=lambda r: (r[id_col] is not None, r[id_col]))
            ids = [r[id_col] for r in probe]
            X = np.array([r["iv"] for r in probe], dtype=np.int64)
            centroids = X[:k].copy()
            for _ in range(n_iter):
                idx = _exact_d2(X, centroids).argmin(axis=1)
                kk = centroids.shape[0]
                sums = np.zeros_like(centroids)
                np.add.at(sums, idx, X)
                counts = np.bincount(idx, minlength=kk).astype(np.int64)
                live = counts > 0
                centroids[live] = np.floor_divide(
                    2 * sums[live] + counts[live][:, None],
                    2 * counts[live][:, None],
                )
            d2 = _exact_d2(X, centroids)
            idx = d2.argmin(axis=1)
            dist = _round_half_up_6(
                np.sqrt(d2[np.arange(len(idx)), idx].astype(np.float64))
                / SCALE
            )
            assigned = spark.createDataFrame(
                pd.DataFrame(
                    {
                        id_col: ids,
                        "cluster": idx.astype(np.int32),
                        "dist": dist,
                    }
                ),
                schema=out_schema,
            )
            if return_centroids:
                return assigned, centroids.astype(np.float64) / SCALE
            return assigned

    # One cached materialization feeds every Lloyd round AND the final
    # assignment; without it each round re-reads and re-projects the
    # source (n_iter extra corpus scans -- the r4 'wasteful' finding).
    base = base.persist()
    try:
        init_rows = base.orderBy(id_col).limit(k).collect()
        if not init_rows:
            # empty corpus (ADVICE r13): the round loop's k*D contract
            # check would IndexError on a zero-row init; return the
            # same empty assignment the driver fast path produces
            assigned = spark.createDataFrame([], out_schema)
            if return_centroids:
                return assigned, np.zeros((0, 1), dtype=np.float64)
            return assigned
        centroids = np.array([r["iv"] for r in init_rows], dtype=np.int64)  # (k, D)

        def make_assign(cent: "np.ndarray"):
            b = spark.sparkContext.broadcast(cent)

            def run(batches):
                C = b.value  # (k, D) int64
                for pdf in batches:
                    X = np.array(list(pdf["iv"]), dtype=np.int64)  # (N, D)
                    d2 = _exact_d2(X, C)
                    idx = d2.argmin(axis=1)  # first min = lowest cluster id
                    dist = _round_half_up_6(
                        np.sqrt(
                            d2[np.arange(len(idx)), idx].astype(np.float64)
                        )
                        / SCALE
                    )
                    yield pd.DataFrame(
                        {
                            id_col: pdf[id_col],
                            "cluster": idx.astype(np.int32),
                            "dist": dist,
                        }
                    )

            return run

        def make_partial_sums(cent: "np.ndarray"):
            """Assignment + per-batch partial centroid sums in one kernel:
            emits (cluster, dim, sx, n) -- k*D rows per Arrow batch -- so
            the centroid update is a tiny EXACT-integer aggregate over
            batch partials instead of a corpus-sized posexplode plus an
            id-join."""
            b = spark.sparkContext.broadcast(cent)

            def run(batches):
                C = b.value
                for pdf in batches:
                    X = np.array(list(pdf["iv"]), dtype=np.int64)  # (N, D)
                    d2 = _exact_d2(X, C)
                    idx = d2.argmin(axis=1)  # (N,)
                    kk, D = C.shape
                    if X.shape[1] != D:
                        raise ValueError(
                            f"embedding dim {X.shape[1]} != centroid dim {D}; "
                            "embedding column has inconsistent dimensions"
                        )
                    sums = np.zeros((kk, D), dtype=np.int64)
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
            # update: exact integer component sums per (cluster, dim)
            # from batch partials -- k*D rows back to the driver, no
            # corpus shuffle at all; the mean lands back on the 1e-6
            # grid via round_half_up(S/n) = floor((2S+n)/(2n))
            sums = (
                base.mapInPandas(
                    make_partial_sums(centroids),
                    schema="cluster int, dim int, sx long, n long",
                )
                .groupBy("cluster", "dim")
                .agg(F.sum("sx").alias("sx"), F.sum("n").alias("n"))
                .collect()
            )
            # Contract check: the driver-side traffic is k*D rows BY
            # CONSTRUCTION (cluster in [0,k) from argmin, dim in [0,D)).
            if len(sums) > k * centroids.shape[1]:
                raise ValueError(
                    f"centroid update returned {len(sums)} rows > k*D = "
                    f"{k * centroids.shape[1]}"
                )
            new_c = centroids.copy()
            for r in sums:
                new_c[r["cluster"], r["dim"]] = (2 * r["sx"] + r["n"]) // (
                    2 * r["n"]
                )
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
            return assigned, centroids.astype(np.float64) / SCALE
        return assigned
    finally:
        base.unpersist(blocking=False)


def kmeans_inertia(assigned: DataFrame) -> float:
    """Sum of squared distances -- the quantity Lloyd's monotonically
    non-increases (up to centroid-quantization and rounding noise)."""
    row = assigned.agg(
        F.sum(F.col("dist") * F.col("dist")).alias("inertia")
    ).collect()[0]
    return float(row["inertia"])
