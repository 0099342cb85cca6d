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

    Row atomicity (r11): the carried state is ONE struct of all value
    columns, not per-column ``last(ignorenulls)`` -- the per-column form
    skips a right row whose payload is legitimately NULL and can stitch
    the output from TWO different right rows (col a from the latest, col
    b from an older one). The struct is non-null for every right row, so
    the match is always exactly the latest preceding row, NULL fields
    included (pandas merge_asof semantics). NULL-timestamp right rows
    are dropped (a row at an unknown time is never "at or before") and
    NULL-timestamp left rows match nothing.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_ts)]
    tagged_left = left.withColumn("_is_left", F.lit(1))
    tagged_right = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            F.col(on),
            F.col(right_ts).alias(left_ts),
            F.struct(*[F.col(c) for c in value_cols]).alias("_payload"),
        )
        .withColumn("_is_left", F.lit(0))
    )
    u = tagged_left.unionByName(tagged_right, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    match = F.when(
        F.col(left_ts).isNotNull(),
        F.last("_payload", ignorenulls=True).over(w),
    )
    carried = [
        match.getField(c).alias(f"{c}{suffix}") for c in value_cols
    ]
    return (
        u.select(*left.columns, "_is_left", *carried)
        .filter(F.col("_is_left") == 1)
        .drop("_is_left")
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Forward as-of join: the EARLIEST right row with right_ts >= left
    ts -- the mirror of ``asof_join`` (next-scheduled-event lookups:
    "which maintenance window does this reading fall before?"). Same
    single key shuffle; ties (right_ts == left ts) are inclusive.
    Struct-atomic carry and NULL-timestamp hygiene as in ``asof_join``
    (r11)."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_ts)]
    tagged_left = left.withColumn("_is_left", F.lit(1))
    tagged_right = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            F.col(on),
            F.col(right_ts).alias(left_ts),
            F.struct(*[F.col(c) for c in value_cols]).alias("_payload"),
        )
        .withColumn("_is_left", F.lit(0))
    )
    u = tagged_left.unionByName(tagged_right, allowMissingColumns=True)
    # left rows sort BEFORE right rows at equal ts, so the
    # currentRow->following frame still sees an equal-ts right row
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("_is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    match = F.when(
        F.col(left_ts).isNotNull(),
        F.first("_payload", ignorenulls=True).over(w),
    )
    carried = [
        match.getField(c).alias(f"{c}{suffix}") for c in value_cols
    ]
    return (
        u.select(*left.columns, "_is_left", *carried)
        .filter(F.col("_is_left") == 1)
        .drop("_is_left")
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Nearest-in-time join: for each left row, the right row minimizing
    |right_ts - left_ts| (sensor alignment, closest-quote matching).
    Ties break BACKWARD (the at-or-before row wins, matching pandas
    merge_asof(direction='nearest')). One-sided misses fall back to the
    side that exists; NULL columns when the key has no right rows.

    Plan: the backward and forward passes share one hash shuffle on the
    key (two in-partition sorts -- the orderings differ in tag
    direction); the final pick is a pure projection. Adds
    ``ts{suffix}`` (the matched right timestamp) alongside the value
    columns."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_ts)]
    # carry the right timestamp as an extra value column: the pick
    # needs both candidates' distances
    r = right.withColumn("_rts", F.col(right_ts))
    carry = [*value_cols, "_rts"]
    back = asof_join(left, r, on, left_ts, right_ts, carry, suffix="_b")
    both = asof_join_forward(back, r, on, left_ts, right_ts, carry, suffix="_f")
    bts, fts = F.col("_rts_b"), F.col("_rts_f")
    lts = F.col(left_ts)
    use_back = F.when(bts.isNull(), F.lit(False)).otherwise(
        fts.isNull()
        | (lts.cast("double") - bts.cast("double") <= fts.cast("double") - lts.cast("double"))
    )
    picked = [
        F.when(use_back, F.col(f"{c}_b")).otherwise(F.col(f"{c}_f")).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    matched_ts = F.when(use_back, bts).otherwise(fts).alias(f"{left_ts}{suffix}")
    return both.select(*left.columns, *picked, matched_ts)
