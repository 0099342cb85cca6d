"""Count-min sketch (Cormode & Muthukrishnan 2005): mergeable
approximate frequency counts, completing the sketch family (HLL
distinct counts, KLL quantiles -- queries/relational.py; freqItems
heavy hitters -- operators/frequency.py).

What CMS buys at 100 TB that the exact groupBy cannot: the sketch is
``depth x width`` counters REGARDLESS of key cardinality, so per-day /
per-source frequency tables over an unbounded key domain (URLs,
shingles, user ids) stay fixed-size, merge by cell-wise addition
(re-aggregatable rollups, the same contract as the HLL/KLL rollup
tables), and answer point queries with a one-sided error: est >= true,
est <= true + eps * N with probability 1 - delta for width = e/eps,
depth = ln(1/delta).

Spark-first representation: the sketch is a SPARSE (row, bucket, c)
DataFrame -- pure explode + hash aggregate, no UDF, no driver state.
Merging = union + groupBy sum. Point estimates = a join of the queried
items' (row, bucket) probes against the sketch, min over rows.

Determinism/portability: the d hash functions are the house
engine-portable md5 construction (operators/dedup.py stable_hash64)
seeded by the row index, so a DuckDB twin reproduces the SKETCH ITSELF
bit-exactly -- the catalog entry's oracle rebuilds the sketch in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(value: Column, row: Column, width: int) -> Column:
    """Engine-portable bucket: first 8 md5 hex digits of 'row:value' as
    bigint, mod width. DuckDB twin:
    CAST('0x' || substr(md5(row || ':' || value), 1, 8) AS BIGINT) % width."""
    from taxi_data_pipeline_pset2_spark.operators.dedup import stable_hash64

    return (
        stable_hash64(F.concat(row.cast("string"), F.lit(":"), value)) % width
    )


def cms_sketch(
    df: DataFrame, col: str, width: int = 2048, depth: int = 4
) -> DataFrame:
    """Build the sketch: sparse (row, bucket, c) with one entry per
    NON-EMPTY cell (at most depth * width rows, usually far fewer).
    NULL values are excluded (count them separately if needed)."""
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1; got {width}, {depth}")
    v = F.col(col).cast("string")
    # aggregate raw rows to exact per-VALUE counts first: the d md5
    # hashes then run over the value vocabulary, not over every raw row
    # d times (a pure explode-first formulation was ~6x slower at sf0.1)
    per_value = (
        df.filter(F.col(col).isNotNull())
        .groupBy(v.alias("_v"))
        .agg(F.count("*").alias("_c"))
    )
    rows = per_value.select(
        "_v",
        "_c",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row"),
    )
    return (
        rows.select(
            "row",
            _bucket(F.col("_v"), F.col("row"), width).alias("bucket"),
            "_c",
        )
        .groupBy("row", "bucket")
        .agg(F.sum("_c").cast("bigint").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (width, depth): cell-wise sum.
    The mergeability that makes per-partition / per-day sketch rollups
    re-aggregatable without touching raw data again."""
    if not sketches:
        raise ValueError("need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("row", "bucket").agg(
        F.sum("c").cast("bigint").alias("c")
    )


def cms_point_estimates(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Estimated count per distinct item value: (value, est) with
    est = min over rows of the probed cell (0 when any probe row is
    empty -- the item was never inserted). ``width``/``depth`` must
    match the sketch's build parameters. One probe-side explode +
    (row, bucket)-keyed join + min aggregate; the sketch side is
    fixed-size, broadcastable."""
    v = F.col(col).cast("string")
    probes = (
        items.filter(F.col(col).isNotNull())
        .select(v.alias("value"))
        .distinct()
        .select(
            "value",
            F.explode(
                F.array(*[F.lit(j) for j in range(depth)])
            ).alias("row"),
        )
        .select(
            "value",
            "row",
            _bucket(F.col("value"), F.col("row"), width).alias("bucket"),
        )
    )
    j = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        j.groupBy("value")
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("bigint")
            .alias("est")
        )
        .orderBy("value")
    )


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame, depth: int = 4
) -> DataFrame:
    """Equi-join cardinality estimate from two sketches built with the
    SAME (width, depth) over the two join keys: one row
    (est_join_size) = min over hash rows of the cell-wise inner
    product sum_b a[r,b] * b[r,b] (Cormode & Muthukrishnan 2005, 4.2;
    the AGMS-style estimator CM sketches inherit). Upper-biased like
    the point estimate: colliding keys only ADD, so
    true <= est <= true + (Na * Nb) / width per row, and the min over
    depth independent rows tightens it.

    The planner-adjacent use: |A JOIN B| for a 100 TB pair costs two
    fixed-size sketches (one scan each, mergeable across partitions /
    days) instead of running the join -- size a shuffle, pick a
    broadcast side, or veto a runaway join before executing it.
    Shape: one (row, bucket) equi-join of two <= depth*width-row
    frames + one depth-row aggregate; exact integer products
    (DECIMAL(38,0) sums), so the DuckDB twin reproduces the estimate
    bit-exactly."""
    prods = (
        sketch_a.alias("a")
        .join(
            sketch_b.alias("b"),
            (F.col("a.row") == F.col("b.row"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.row").alias("row"),
            # cast each FACTOR before the product: a bigint c_a*c_b
            # overflows under ANSI once both cells pass ~3e9 counts --
            # exactly the hot-key shape a join-size estimate exists for
            (
                F.col("a.c").cast("decimal(19,0)")
                * F.col("b.c").cast("decimal(19,0)")
            ).alias("_p"),
        )
        .groupBy("row")
        .agg(F.sum("_p").alias("_ip"))
    )
    # rows with NO overlapping non-empty cells have inner product 0 --
    # they must participate in the min, so seed all depth rows
    spark = sketch_a.sparkSession
    all_rows = spark.range(depth).select(F.col("id").cast("int").alias("row"))
    return (
        all_rows.join(prods, "row", "left")
        .agg(
            F.min(F.coalesce(F.col("_ip"), F.lit(0)))
            .cast("bigint")
            .alias("est_join_size")
        )
    )
