"""2-D Pareto frontier (skyline) per group: the non-dominated set
under (minimize x, maximize y).

The multi-objective shortlist every "best tradeoff" question reduces
to -- cheapest parts per quality tier, fastest configs per cost,
highest-quality documents per token budget (the curation twin: pick
the frontier of (cost, quality) before sampling). The naive
formulation is a quadratic NOT EXISTS anti-join; the 2-D case
collapses to a single sorted window pass (the classic sweep from
Borzsony, Kossmann & Stocker, ICDE 2001): sort by (x asc, y desc) --
a point is on the frontier iff its y strictly exceeds the running max
y of everything sorted before it (anything earlier has x <= ours, so
a >= y there dominates us).

Shape at 100 TB: one distinct (hash shuffle) + one sort shuffle on
(group, x, y) + a window -- linear, no self-join; each group is one
window partition (an ungrouped frontier over a corpus-sized DISTINCT
point set would single-task -- pre-bucket x and take per-bucket
frontiers first if that ever matters; frontiers compose). Other
orientations are the caller negating a column. Exact duplicates
collapse first
(mutually non-dominating duplicates would otherwise make "frontier
membership" order-dependent); output is the distinct frontier point
set, deterministic under any partitioning, so it carries a full DuckDB
window twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct non-dominated points per group, minimizing ``x_col``
    and maximizing ``y_col``: (group_cols..., x_col, y_col) ordered by
    (group, x, y). A point is dominated when another point in its
    group has x <= and y >= with at least one strict. NULL x or y rows
    are excluded (incomparable)."""
    keys = list(group_cols or [])
    x, y = F.col(x_col), F.col(y_col)
    pts = (
        df.filter(x.isNotNull() & y.isNotNull())
        .select(*keys, x_col, y_col)
        .distinct()
    )
    prev_max = F.max(y).over(
        Window.partitionBy(*[F.col(c) for c in keys])
        .orderBy(x.asc(), y.desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("_pm", prev_max)
        .filter(F.col("_pm").isNull() | (y > F.col("_pm")))
        .drop("_pm")
        .orderBy(*keys, x_col, y_col)
    )
