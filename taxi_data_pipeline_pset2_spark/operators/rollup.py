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
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        out.write.mode("overwrite")
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
