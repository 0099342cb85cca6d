"""Incremental, partition-aligned rollup maintenance (SURVEY.md 2.11 /
the hypertable-rollup pattern, exact-aggregate flavor).

``month_partitioned_ingest`` (sources/sinks.py) makes the fact table's
unit of change the month partition; this module makes the derived
aggregate's unit of REFRESH the same partition. After a backfill touches
months M, ``refresh_rollup`` recomputes ONLY those months -- the fact
scan is partition-pruned to M, and the rollup write dynamic-partition-
overwrites exactly those directories. History is never rescanned and
never rewritten: at 100 TB the nightly refresh cost tracks the arriving
data, not the table size.

Complement to the sketch-based rollup (``sketch_rollup_daily_users``):
sketches make COARSER grains cheap to derive (merge partials upward);
this keeps the SAME grain cheap to maintain under partition-aligned
updates, with exact aggregates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "load_month"


def refresh_rollup(
    spark: SparkSession,
    fact_path: str,
    rollup_path: str,
    agg: Callable[[DataFrame], DataFrame],
    months: list[str],
) -> None:
    """Recompute the rollup for exactly ``months`` (values of the
    ``load_month`` partition column) and overwrite only those partitions.

    ``agg`` maps the month-filtered fact to the aggregate and must keep
    ``load_month`` as a column (it is both the grouping anchor and the
    partition key of the rollup table).
    """
    if not months:
        return
    fact = spark.read.parquet(fact_path).filter(F.col(PARTITION_COL).isin(months))
    out = agg(fact)
    if PARTITION_COL not in out.columns:
        raise ValueError(f"agg must preserve the {PARTITION_COL!r} column")
    # the agg's output months must be a SUBSET of the requested ones: an
    # agg that re-derives month attribution from an event timestamp
    # could emit an out-of-scope month, and the dynamic overwrite would
    # then replace that complete partition with a partial aggregate
    # computed from only this refresh's fact slice -- silent data loss
    # in a partition the caller never asked to touch
    stray = (
        out.filter(~F.col(PARTITION_COL).isin(months)).limit(1).collect()
    )
    if stray:
        raise ValueError(
            "refresh_rollup: agg emitted out-of-scope partition "
            f"{stray[0][PARTITION_COL]!r} (requested months: {months})"
        )
    # writer-level option, NOT spark.conf.set: a session-global
    # partitionOverwriteMode=dynamic would leak into every later
    # partitioned overwrite -- including full_rollup, whose from-scratch
    # rebuild relies on static mode to truncate stale partitions
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COL)
        .parquet(rollup_path)
    )


def full_rollup(
    spark: SparkSession,
    fact_path: str,
    rollup_path: str,
    agg: Callable[[DataFrame], DataFrame],
) -> None:
    """The from-scratch twin of ``refresh_rollup``: rebuild every
    partition. Used at bootstrap and as the equivalence oracle for the
    incremental path (tests assert refresh == full rebuild)."""
    out = agg(spark.read.parquet(fact_path))
    if PARTITION_COL not in out.columns:
        raise ValueError(f"agg must preserve the {PARTITION_COL!r} column")
    (
        out.write.mode("overwrite")
        .partitionBy(PARTITION_COL)
        .parquet(rollup_path)
    )


def apply_changelog_to_rollup(
    rollup: DataFrame,
    changelog: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Delta-maintain an additive rollup from a CDC changelog -- no fact
    rescan at all, the step past :func:`refresh_rollup`'s partition
    recompute. At 100 TB the maintenance cost tracks the CHANGED ROWS,
    not even the changed partitions.

    ``rollup`` holds (group_cols..., ``count_col``, sum_<c> for each
    ``sum_cols`` entry) -- the retraction-friendly aggregate basis
    (COUNT and SUM are abelian-group aggregates: deletes subtract
    exactly what inserts added; AVG and friends derive from the basis
    downstream). ``changelog`` is :func:`~.cdc.snapshot_diff` output:
    (group-attribution columns inside old_/new_ images, change_type).
    Group attribution: an insert contributes +new to its new_ group, a
    delete -old to its old_ group, and an update both (which nets to
    zero unless the update moved the row across groups or changed a
    summed value -- both handled exactly).

    Plan: the changelog maps to signed per-row contributions (one
    projection, union of the old-image and new-image sides), aggregates
    to delta-per-group (changelog-sized shuffle), then full-outer-joins
    the existing rollup. Groups whose count reaches 0 are dropped.
    Returns the new rollup frame (caller persists, e.g. via
    atomic_overwrite)."""
    from taxi_data_pipeline_pset2_spark.operators.cdc import CHANGE_COL

    def _side(prefix: str, sign: int, types: list[str]) -> DataFrame:
        return changelog.filter(F.col(CHANGE_COL).isin(types)).select(
            *[F.col(f"{prefix}_{g}").alias(g) for g in group_cols],
            F.lit(sign).cast("long").alias("_dn"),
            *[
                (F.lit(sign) * F.coalesce(F.col(f"{prefix}_{c}"), F.lit(0)))
                .alias(f"_ds_{c}")
                for c in sum_cols
            ],
        )

    contrib = _side("new", 1, ["insert", "update"]).unionByName(
        _side("old", -1, ["delete", "update"])
    )
    delta = contrib.groupBy(*group_cols).agg(
        F.sum("_dn").alias("_dn"),
        *[F.sum(f"_ds_{c}").alias(f"_ds_{c}") for c in sum_cols],
    )
    # NULL-safe full outer: a NULL group key is one cohort on both sides
    # (same discipline as robust._nullsafe_broadcast_join); plain
    # on=group_cols would split it into two rows
    d = delta.select(
        *[F.col(g).alias(f"__d_{g}") for g in group_cols],
        "_dn",
        *[f"_ds_{c}" for c in sum_cols],
    )
    cond = None
    for g in group_cols:
        eq = rollup[g].eqNullSafe(d[f"__d_{g}"])
        cond = eq if cond is None else (cond & eq)
    joined = rollup.join(d, cond, "full_outer")
    new_count = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(
        F.col("_dn"), F.lit(0)
    )
    out = joined.select(
        *[
            F.coalesce(rollup[g], F.col(f"__d_{g}")).alias(g)
            for g in group_cols
        ],
        new_count.cast("long").alias(count_col),
        *[
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_ds_{c}"), F.lit(0))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return out.filter(F.col(count_col) > 0)
