"""Grouped closed-form statistics: per-group simple linear regression
(trend lines at scale). Not in the reference (its analytics stop at
AVG/percentiles); the standard next question over any fact table is
"what's the trend per segment", and the closed form makes it a single
hash aggregate -- no ML library, no iteration.

Determinism: all five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
EXACT decimal sums (order-independent under any partitioning -- the
dec_sum discipline), combined in one fixed double expression and
rounded to 6 dp, so results hash-match a DuckDB twin bit-exactly.

100 TB shape: one partial+final hash aggregate over (group_cols);
output is group-cardinality-sized. Nothing else."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_linreg(
    df: DataFrame,
    x_col,
    y_col,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group_cols..., n, slope, intercept, r2): least-squares line of
    ``y_col`` on ``x_col`` per group, 6-dp rounded. Groups with n < 2
    or zero x-variance get NULL slope/intercept/r2. ``x_col``/``y_col``
    accept column names or Column expressions (e.g. a date cast to epoch
    days)."""
    group_cols = group_cols or []
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    both = x.isNotNull() & y.isNotNull()
    xd = F.when(both, x).cast("decimal(28,6)")
    yd = F.when(both, y).cast("decimal(28,6)")
    agg = (df.groupBy(*group_cols) if group_cols else df.groupBy()).agg(
        F.count(F.when(both, F.lit(1))).cast("bigint").alias("n"),
        F.sum(xd).cast("double").alias("_sx"),
        F.sum(yd).cast("double").alias("_sy"),
        F.sum((F.when(both, x * y)).cast("decimal(38,10)")).cast("double").alias("_sxy"),
        F.sum((F.when(both, x * x)).cast("decimal(38,10)")).cast("double").alias("_sxx"),
        F.sum((F.when(both, y * y)).cast("decimal(38,10)")).cast("double").alias("_syy"),
    )
    n = F.col("n")
    den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den
    intercept = (F.col("_sy") - slope * F.col("_sx")) / n
    sst = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    r2 = F.when(sst > 0, (n * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
                * (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / (den * sst))
    ok = (n >= 2) & (den > 0)
    return agg.select(
        *group_cols,
        "n",
        F.round(F.when(ok, slope), 6).alias("slope"),
        F.round(F.when(ok, intercept), 6).alias("intercept"),
        F.round(F.when(ok, r2), 6).alias("r2"),
    )
