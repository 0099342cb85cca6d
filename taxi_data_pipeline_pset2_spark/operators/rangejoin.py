"""Generic range joins: point-in-interval and interval-overlap
(SURVEY.md 2b extension surface; the batch complement of the streaming
interval join in streaming/events.py and the as-of join in
operators/asof.py).

Not present in the reference (its joins are all equi-joins on dimension
keys); standard warehouse workloads need them constantly: banding a
measure into a rate table, joining events to validity windows, overlap
of sessions with incidents.

Why not just ``points.join(intervals, p BETWEEN s AND e)``: open-source
Spark plans a non-equi join as BroadcastNestedLoopJoin (or a cartesian
product when neither side broadcasts) -- O(n*m) comparisons and a
single-task disaster at 100 TB. The scalable plan is the classic
BUCKETED range join: quantize the domain into fixed-width buckets,
explode each interval into the buckets it overlaps, and equi-join on
the bucket id; the range predicate rides along as a join-condition
residual, so Spark picks a hash/sort-merge join on the bucket key and
each probe only compares against intervals sharing its bucket. This is
the same strategy Databricks' range-join optimization applies
internally (public docs), re-expressed with open-source primitives.

100 TB notes: the big (point) side is scan-shaped -- one derived bucket
column, no explode. Only intervals explode (x span/width rows), guarded
by ``span_cap`` as a plan-side ANSI error, not a silent blowup. With
``broadcast_intervals=True`` (dim-sized interval tables: rate cards,
calendars) the exploded side broadcasts and the point side never
shuffles at all. Pair dedup in the overlap join is arithmetic (emit
only in the pair's first shared bucket), not a ``distinct`` shuffle.
Everything is built-in column expressions: whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

# max buckets one interval may explode into; wider intervals mean the
# caller picked a bucket_width far off the interval scale (the explode
# would multiply the interval side by span_cap) -- fail loudly instead.
BUCKET_SPAN_CAP = 10_000


def _as_number(df: DataFrame, col: str) -> Column:
    """Order-preserving numeric view of a join coordinate: timestamps ->
    epoch seconds (fractional), dates -> epoch days, numerics as-is."""
    dtype = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return c.cast("double")
    if isinstance(dtype, DateType):
        return F.datediff(c, F.to_date(F.lit("1970-01-01")))
    return c


def _bucket_span(start_b: Column, end_b: Column, span_cap: int) -> Column:
    """Bucket range of one interval, ANSI-raising when it exceeds the
    cap (raise_error is NullType; the cast keeps both branches long)."""
    n = end_b - start_b + F.lit(1)
    guard = F.raise_error(
        F.concat(
            F.lit(f"rangejoin: interval spans more than {span_cap} buckets "),
            F.lit("(bucket_width is too small for this interval scale): "),
            n.cast("string"),
        )
    )
    return F.when(n <= F.lit(span_cap), end_b).otherwise(guard.cast("long"))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
    closed: str = "left",
    broadcast_intervals: bool = False,
    span_cap: int = BUCKET_SPAN_CAP,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    ``closed``: "left" -> start <= p < end (half-open, the banding
    default: adjacent bands never double-match), "both" -> start <= p
    <= end. ``how``: "inner" or "left" (unmatched points kept with NULL
    interval columns -- the range predicate lives in the join condition,
    so left semantics are exact, not filter-after-join).

    Column names must be disjoint across the two frames (rename before
    joining, as with any Spark join).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be left|both, got {closed!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")

    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    p_num = _as_number(points, point_col)
    s_num = _as_number(intervals, start_col)
    e_num = _as_number(intervals, end_col)

    pts = points.withColumn("__rj_bucket", F.floor(p_num / w))
    # NULL or reversed bounds match nothing -- drop them BEFORE the
    # explode (the interval_coverage contract): a NULL span would fall
    # through the cap guard's NULL condition to raise_error and abort
    # the job, and a reversed one passes `n <= cap` (n negative) while
    # sequence(start, stop) then generates a DESCENDING range of
    # unbounded length -- the exact blowup span_cap exists to prevent
    intervals = intervals.filter(
        s_num.isNotNull() & e_num.isNotNull() & (s_num <= e_num)
    )
    start_b = F.floor(s_num / w)
    end_b = _bucket_span(start_b, F.floor(e_num / w), span_cap)
    iv = intervals.withColumn(
        "__rj_bucket", F.explode(F.sequence(start_b, end_b))
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)

    in_range = (p_num >= s_num) & (
        (p_num < e_num) if closed == "left" else (p_num <= e_num)
    )
    cond = (pts["__rj_bucket"] == iv["__rj_bucket"]) & in_range
    return pts.join(iv, cond, how).drop("__rj_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    broadcast_right: bool = False,
    span_cap: int = BUCKET_SPAN_CAP,
) -> DataFrame:
    """Inner-join interval rows that overlap: l_start <= r_end AND
    r_start <= l_end (closed ends -- touching intervals match).

    Both sides explode into their bucket ranges and equi-join on the
    bucket; an overlapping pair shares every bucket in the overlap, so
    the pair is emitted ONLY in its first shared bucket
    (max(first_l, first_r)) -- exact dedup by arithmetic, no
    ``distinct`` shuffle. Column names must be disjoint.
    """
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap_cols)}")
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    def exploded(df: DataFrame, start: str, end: str) -> DataFrame:
        s_num, e_num = _as_number(df, start), _as_number(df, end)
        # same NULL/reversed-bounds hygiene as point_in_interval_join
        df = df.filter(
            s_num.isNotNull() & e_num.isNotNull() & (s_num <= e_num)
        )
        sb = F.floor(s_num / w)
        eb = _bucket_span(sb, F.floor(e_num / w), span_cap)
        return df.withColumn("__rj_first", sb).withColumn(
            "__rj_bucket", F.explode(F.sequence(sb, eb))
        )

    lf = exploded(left, left_start, left_end)
    rf = exploded(right, right_start, right_end)
    if broadcast_right:
        rf = F.broadcast(rf)

    ls, le = _as_number(left, left_start), _as_number(left, left_end)
    rs, re_ = _as_number(right, right_start), _as_number(right, right_end)
    cond = (
        (lf["__rj_bucket"] == rf["__rj_bucket"])
        & (ls <= re_)
        & (rs <= le)
        & (lf["__rj_bucket"] == F.greatest(lf["__rj_first"], rf["__rj_first"]))
    )
    return lf.join(rf, cond, "inner").drop("__rj_bucket", "__rj_first")


def interval_coverage(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merged-interval coverage per key -- the sweep-line union of
    possibly-overlapping [start, end) intervals: (key_cols...,
    n_intervals, n_islands, covered, raw_total, overlap_saved), all
    exact integers in the start/end unit, ordered by key.

    The de-overlap every session/maintenance/billing dataset needs
    before "total active time" means anything (summing raw durations
    double-counts overlaps; this is the correct union length). An
    island is a maximal run of intervals where each starts at or before
    the running max end of its predecessors (touching intervals merge);
    covered = sum over islands of (max end - min start), raw_total =
    plain duration sum, overlap_saved = raw_total - covered >= 0.

    Shape at 100 TB: ONE sort shuffle on (key, start, end) drives both
    windows (running max end for island breaks, running sum for island
    ids), then two hash aggregates (island-sized, key-sized) that AQE
    co-partitions with the sort. No self-join, no explode -- the
    sweep-line is linear in rows, the classic contrast to the bucketed
    overlap JOIN above (which pairs intervals; this unions them).
    Intervals with NULL or end <= start are dropped; island membership
    of exact-duplicate rows is order-independent, so the result is
    deterministic under any partitioning."""
    from pyspark.sql.window import Window

    s = F.col(start_col).cast("bigint")
    e = F.col(end_col).cast("bigint")
    base = df.filter(s.isNotNull() & e.isNotNull() & (e > s)).select(
        *key_cols, s.alias("_s"), e.alias("_e")
    )
    keys = [F.col(c) for c in key_cols]
    w_ord = Window.partitionBy(*keys).orderBy("_s", "_e")
    prev_max = F.max("_e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.select(
        *key_cols,
        "_s",
        "_e",
        F.when(prev_max.isNull() | (F.col("_s") > prev_max), 1)
        .otherwise(0)
        .alias("_new"),
    ).select(
        *key_cols,
        "_s",
        "_e",
        F.sum("_new")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_isl"),
    )
    islands = flagged.groupBy(*keys, F.col("_isl")).agg(
        F.count("*").alias("_n"),
        (F.max("_e") - F.min("_s")).alias("_len"),
        F.sum(F.col("_e") - F.col("_s")).alias("_raw"),
    )
    return (
        islands.groupBy(*keys)
        .agg(
            F.sum("_n").cast("bigint").alias("n_intervals"),
            F.count("*").cast("bigint").alias("n_islands"),
            F.sum("_len").cast("bigint").alias("covered"),
            F.sum("_raw").cast("bigint").alias("raw_total"),
            (F.sum("_raw") - F.sum("_len")).cast("bigint").alias("overlap_saved"),
        )
        .orderBy(*key_cols)
    )
