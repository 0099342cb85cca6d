"""Source availability manifest + gap detection (SURVEY.md S4, 2.11).

The reference probes each monthly URL with a HEAD request and logs
missing months as ``status='brecha'`` (``loader_yellow_green.py:13-19,
56-61``) and keeps a per-run load manifest for resume
(``loader_yellow_green.py:31-81``). Spark-first: the expected period
spine is generated with sequence+explode and anti-joined against the
periods actually present -- one scan, no driver-side probing loop."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def period_spine(df_any: DataFrame, start: str, end: str, unit: str = "month") -> DataFrame:
    """One row per expected period in [start, end]."""
    step = "interval 1 month" if unit == "month" else "interval 1 day"
    return df_any.sparkSession.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr(step)
            )
        ).alias("expected_period")
    )


def coverage_gaps(
    loaded: DataFrame, ts_col: str | Column, start: str, end: str, unit: str = "month"
) -> DataFrame:
    """Periods in the expected spine with no loaded rows (status='brecha').

    ``left_anti`` against the distinct loaded periods: the distinct is a
    partial-aggregated shuffle on the period (tiny), the spine is
    dim-sized -- no full-data movement at any scale."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    present = loaded.select(F.date_trunc(unit, c).cast("date").alias("expected_period")).distinct()
    spine = period_spine(loaded, start, end, unit)
    return (
        spine.join(present, "expected_period", "left_anti")
        .select(
            F.date_format("expected_period", "yyyy-MM-dd").alias("missing_period"),
            F.lit("brecha").alias("status"),
        )
        .orderBy("missing_period")
    )


def load_manifest(loaded: DataFrame, ts_col: str, source_name: str) -> DataFrame:
    """Per-month load bookkeeping row (rows, span) -- the resume manifest
    the reference keeps per run (idempotent month-partition overwrite)."""
    c = F.col(ts_col)
    return (
        loaded.groupBy(F.date_trunc("month", c).cast("date").alias("period"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min(c).alias("first_ts"),
            F.max(c).alias("last_ts"),
        )
        .select(
            F.lit(source_name).alias("source"),
            F.date_format("period", "yyyy-MM").alias("period"),
            "n_rows",
            "first_ts",
            "last_ts",
        )
        .orderBy("period")
    )
