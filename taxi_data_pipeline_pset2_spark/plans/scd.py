"""Type-2 slowly-changing dimension builder (dbt ``snapshot``
semantics -- the reference is a dbt project, and snapshots are the dbt
feature its dimension layer would grow into next; cf. dbt's
``check_cols`` strategy).

Input: periodic FULL snapshots of a dimension stacked in one DataFrame
with a ``snapshot_ts`` column. Output: one row per (business key,
change run) with ``effective_from`` / ``effective_to`` / ``is_current``
-- the effective-dated history table that lets facts join the dimension
AS OF their event time (see ``operators/asof.py``).

Plan shape: one shuffle on the business key; two window passes (change
detection via lag, run numbering via running sum) and one aggregate --
the same single-shuffle lag/running-sum composition as gap
sessionization (queries/pipeline_ops.py session_counts), applied to
attribute change-tracking instead of time gaps.

dbt-default deletion semantics: a key absent from a later snapshot
keeps its last record open (no hard-delete invalidation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_snapshots(
    snapshots: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "snapshot_ts",
) -> DataFrame:
    """Collapse stacked snapshots into effective-dated SCD2 history.

    A new version starts at the first snapshot where any tracked
    attribute differs from the key's previous snapshot (NULL-safe
    comparison). ``effective_to`` is the start of the next version
    (half-open intervals, no gaps/overlaps); the latest version has
    ``effective_to`` NULL and ``is_current`` true.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    changed = F.lit(False)
    for a in attr_cols:
        # eqNullSafe: NULL -> NULL is "no change"; NULL -> value is one
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    is_new_version = F.when(F.lag(ts_col).over(w).isNull(), F.lit(True)).otherwise(
        changed
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versioned = snapshots.withColumn(
        "_ver", F.sum(is_new_version.cast("int")).over(wsum)
    )
    per_version = versioned.groupBy(*key_cols, "_ver").agg(
        F.min(ts_col).alias("effective_from"),
        *[F.first(a).alias(a) for a in attr_cols],
    )
    wv = Window.partitionBy(*key_cols).orderBy("_ver")
    return (
        per_version.withColumn(
            "effective_to", F.lead("effective_from").over(wv)
        )
        .withColumn("is_current", F.col("effective_to").isNull())
        .drop("_ver")
        .select(
            *key_cols, *attr_cols, "effective_from", "effective_to", "is_current"
        )
    )


def scd2_as_of(
    history: DataFrame, as_of, ts_from: str = "effective_from",
    ts_to: str = "effective_to",
) -> DataFrame:
    """Point-in-time dimension reconstruction: the version of each key
    effective at ``as_of`` (half-open: from <= t < to, open current row
    qualifies via NULL ``ts_to``). One partition-prunable filter -- with
    history stored partitioned/sorted by ``effective_from``, the scan
    skips every version that started after ``as_of``. Inverse of
    :func:`scd2_from_snapshots`: reconstructing at a snapshot's
    timestamp returns exactly that snapshot's rows for tracked keys."""
    t_ = F.lit(as_of).cast("timestamp")
    return history.filter(
        (F.col(ts_from) <= t_)
        & (F.col(ts_to).isNull() | (t_ < F.col(ts_to)))
    )
