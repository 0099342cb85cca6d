"""Mean-shift change-point detection per series: centered-CUSUM argmax
(Page 1954's cumulative sums in the offline form popularized by
Taylor's change-point analysis; equivalently binary segmentation's
first split).

For an ordered series x_1..x_n the centered cumulative sum C_k =
sum_{i<=k} x_i - (k/n) * sum_i x_i peaks where the mean shifts; the
estimated change point is argmax_k |C_k| (k < n), and |C_k| normalized
by sd * sqrt(n) gives a scale-free strength score (~ the two-sample
z statistic of the best split under equal variance). The pipeline
monitoring use: per-feed level shifts that PSI-style distribution
drift (operators/drift.py) smears out -- PSI says "the histogram
moved", this says WHEN.

Scale shape: one shuffle to (key) partitions, two window passes over
each series, one argmax aggregate -- no self-join over split points
(the naive per-split two-sample scan is O(n^2) per series; the CUSUM
identity makes it O(n)). Series length per key is the window-memory
bound, the same contract as every windowed operator here.

Determinism: all sums accumulate as DECIMAL (order-independent); C_k
and the moments derive from exact decimals via fixed double
expressions; the argmax tie-breaks to the SMALLEST k via a
(|C_k| desc, k asc) rank, so results hash-match the DuckDB twin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mean_shift_changepoint(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """One row per key: (key_cols..., n, change_pos, cusum_abs,
    cusum_stat, mean_before, mean_after, shift), where change_pos is
    the 1-indexed last position of the BEFORE segment (argmax |C_k|,
    smallest k on ties), cusum_stat = |C_k| / (sd_pop * sqrt(n)), and
    shift = mean_after - mean_before. Keys with fewer than 2 non-NULL
    values emit NO row (there is no split); zero-variance keys emit
    the row with NULL stats. NULL values are excluded; ``order_cols``
    must order each series uniquely."""
    keys = [F.col(c) for c in key_cols]
    # decimal(18,6): the x*x product stays inside decimal(38,12) under
    # BOTH engines' promotion rules (28,6 squared would overflow 38)
    x = F.col(value_col).cast("decimal(18,6)")
    base = df.filter(F.col(value_col).isNotNull())
    w_key = Window.partitionBy(*keys)
    w_ord = w_key.orderBy(*[F.col(c) for c in order_cols])
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored = base.select(
        *key_cols,
        F.row_number().over(w_ord).alias("_k"),
        F.count("*").over(w_key).alias("n"),
        F.sum(x).over(w_cum).cast("double").alias("_cum"),
        F.sum(x).over(w_key).cast("double").alias("_tot"),
        F.sum(x * x).over(w_key).cast("double").alias("_tot2"),
    ).filter(F.col("_k") < F.col("n"))
    c_k = F.col("_cum") - F.col("_k") * F.col("_tot") / F.col("n")
    var_pop = F.col("_tot2") / F.col("n") - (
        F.col("_tot") / F.col("n")
    ) * (F.col("_tot") / F.col("n"))
    cand = scored.select(
        *key_cols,
        "n",
        F.col("_k").alias("change_pos"),
        F.abs(c_k).alias("_abs_c"),
        (F.col("_cum") / F.col("_k")).alias("_mb"),
        (
            (F.col("_tot") - F.col("_cum")) / (F.col("n") - F.col("_k"))
        ).alias("_ma"),
        F.when(var_pop > 0, F.sqrt(var_pop)).alias("_sd"),
    )
    w_best = Window.partitionBy(*keys).orderBy(
        F.desc("_abs_c"), F.asc("change_pos")
    )
    best = cand.withColumn("_r", F.row_number().over(w_best)).filter(
        F.col("_r") == 1
    )
    ok = F.col("_sd").isNotNull()
    return best.select(
        *key_cols,
        F.col("n").cast("bigint").alias("n"),
        F.when(ok, F.col("change_pos")).cast("bigint").alias("change_pos"),
        F.round(F.when(ok, F.col("_abs_c")), 6).alias("cusum_abs"),
        F.round(
            F.when(ok, F.col("_abs_c") / (F.col("_sd") * F.sqrt(F.col("n")))),
            6,
        ).alias("cusum_stat"),
        F.round(F.when(ok, F.col("_mb")), 6).alias("mean_before"),
        F.round(F.when(ok, F.col("_ma")), 6).alias("mean_after"),
        F.round(F.when(ok, F.col("_ma") - F.col("_mb")), 6).alias("shift"),
    ).orderBy(*key_cols)
