"""As-of (most-recent-at-time) join -- an operator Spark lacks natively
(SURVEY.md 2b custom-operator path (a): composition of existing ops).

For each left row (key, ts), attach the payload of the latest right row
with the same key and right_ts <= ts. The naive formulation is a range
join (quadratic blowup per key); this one is the scalable composition:

    union(left tagged 1, right tagged 0)
      -> one window per key, ordered (ts, tag)
      -> last(payload, ignorenulls) carried forward
      -> keep left rows

ONE shuffle on the key, linear scan within each partition, bounded state
(the running payload) -- the same shape at 60k rows and at 100 TB. Ties
(right_ts == left ts) are inclusive: right rows sort before left rows at
equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join (most recent right row at or before left ts).

    ``value_cols`` defaults to every right column except the key and
    timestamp. Output = all left columns + ``{col}{suffix}`` for each
    value column (NULL when no right row precedes the left row).
    A forward as-of is the mirror image: swap the ordering and use
    ``first(..., ignorenulls)`` over the following frame.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_ts)]
    tagged_left = left.withColumn("_is_left", F.lit(1))
    tagged_right = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("_is_left", F.lit(0))
    u = tagged_left.unionByName(tagged_right, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    return (
        u.select(*left.columns, "_is_left", *carried)
        .filter(F.col("_is_left") == 1)
        .drop("_is_left")
    )
