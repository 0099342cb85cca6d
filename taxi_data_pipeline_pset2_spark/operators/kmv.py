"""KMV (k-minimum-values) distinct-value sketches with set operations
(Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007 -- the theta-sketch
family's simplest member): keep the k smallest hash values of a
column's DISTINCT values; the k-th minimum estimates the distinct
count, and because two sketches over the same hash are coordinated
samples, union/intersection/Jaccard estimates come from comparing
them -- the set-operation power HLL lacks (HLL unions well but cannot
intersect without inclusion-exclusion error blowup).

Estimators (hash space M = 2^32, h_(k) = k-th smallest):

    distinct(A)        ~= (k - 1) * M / h_(k)
    union: KMV(A u B)   = k smallest of merged sketches (exact rule)
    jaccard rho        ~= |union's k smallest present in BOTH| / k
    intersection       ~= rho * distinct(A u B)

Scale shape: per set, one DISTINCT + one TakeOrdered(k) -- the sketch
is k rows regardless of cardinality, mergeable by union + re-take.
Determinism: the hash is the house engine-portable md5 construction,
so a DuckDB twin rebuilds every sketch and estimate bit-exactly (no
randomness, no RNG seeds) -- unlike HLL/KLL whose internals are
engine-private, KMV is oracle-able end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = float(2**32)


def _h(col):
    """Uniform hash of a value into [0, 2^32): dedup.stable_hash64 of
    the string form -- ONE definition of the engine-portable hash, so a
    future prefix change cannot desynchronize the sketch family from
    the dedup/sampling hashes and their oracle twins."""
    from taxi_data_pipeline_pset2_spark.operators.dedup import stable_hash64

    return stable_hash64(col.cast("string"))


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The k smallest distinct hash values of ``col``: one-column frame
    (h), <= k rows (fewer when the column has < k distinct values).
    NULLs are excluded."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (
        df.filter(F.col(col).isNotNull())
        .select(_h(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_distinct_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """(n_kept, est_distinct): (k-1) * M / h_(k) when the sketch is
    full; EXACT count when fewer than k distinct values exist (the
    sketch then holds every one)."""
    agg = sketch.agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.max("h").alias("_hk"),
    )
    return agg.select(
        "n_kept",
        F.round(
            F.when(
                F.col("n_kept") >= k,
                (F.lit(float(k - 1)) * F.lit(_M)) / F.col("_hk").cast("double"),
            ).otherwise(F.col("n_kept").cast("double")),
            6,
        ).alias("est_distinct"),
    )


def kmv_set_estimates(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 256
) -> DataFrame:
    """One row of coordinated-sample set estimates:
    (est_a, est_b, est_union, jaccard, est_intersection). Both
    sketches must share the same k and hash."""
    union_k = (
        sketch_a.unionByName(sketch_b).distinct().orderBy("h").limit(k)
    ).localCheckpoint(eager=True)
    # rho = fraction of the union's k smallest present in BOTH sketches;
    # the count is <= k rows -- bounded driver traffic
    both = (
        union_k.join(sketch_a, "h", "left_semi")
        .join(sketch_b, "h", "left_semi")
        .count()
    )
    est_a = kmv_distinct_estimate(sketch_a, k).select(
        F.col("est_distinct").alias("est_a")
    )
    est_b = kmv_distinct_estimate(sketch_b, k).select(
        F.col("est_distinct").alias("est_b")
    )
    est_u = kmv_distinct_estimate(union_k, k).select(
        F.col("est_distinct").alias("est_union"),
        F.col("n_kept").alias("_nu"),
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .select(
            "est_a",
            "est_b",
            "est_union",
            # try_divide: two empty sketches give _nu = 0, and a plain
            # division is an ANSI DIVIDE_BY_ZERO crash -- NULL
            # jaccard/intersection is the honest degenerate answer
            F.round(
                F.try_divide(F.lit(both), F.col("_nu").cast("double")), 6
            ).alias("jaccard"),
            F.round(
                F.try_divide(F.lit(both), F.col("_nu").cast("double"))
                * F.col("est_union"),
                6,
            ).alias("est_intersection"),
        )
    )


def kmv_grouped_sketch(
    df: DataFrame, col: str, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Per-group KMV partial: the k smallest distinct hashes of ``col``
    within each group -- (group_cols..., h), <= k rows per group.

    Aggregate-first shape: the rank window runs over the DISTINCT
    (group, h) frame, never raw rows, so a group's window input is its
    distinct cardinality (and the sketches themselves are what a 100 TB
    rollup stores -- k rows per group, mergeable upward with
    ``kmv_rollup`` by the exact k-smallest-of-union rule)."""
    from pyspark.sql.window import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        df.filter(F.col(col).isNotNull())
        .select(*group_cols, _h(F.col(col)).alias("h"))
        .distinct()
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def kmv_rollup(
    sketches: DataFrame, to_cols: list[str], k: int = 256
) -> DataFrame:
    """Merge fine-grain KMV partials up to ``to_cols`` grain WITHOUT
    touching raw data: k smallest of the union of each coarse group's
    fine sketches -- the EXACT same sketch a from-scratch build over the
    coarse group produces (KMV's defining mergeability identity; the
    kmv_rollup_weekly_users oracle hash-proves merged == direct).
    Input = (to_cols..., h, ...), output = (to_cols..., h)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*to_cols).orderBy("h")
    return (
        sketches.select(*to_cols, "h")
        .distinct()
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def kmv_grouped_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 256
) -> DataFrame:
    """(group_cols..., n_kept, est_distinct) per group: (k-1) * M /
    h_(k) when the group's sketch is full, EXACT count otherwise."""
    return (
        sketch.groupBy(*group_cols)
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.max("h").alias("_hk"),
        )
        .select(
            *group_cols,
            "n_kept",
            F.round(
                F.when(
                    F.col("n_kept") >= k,
                    (F.lit(float(k - 1)) * F.lit(_M))
                    / F.col("_hk").cast("double"),
                ).otherwise(F.col("n_kept").cast("double")),
                6,
            ).alias("est_distinct"),
        )
    )
