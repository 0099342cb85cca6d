"""Shared helpers for catalog queries.

Exact-decimal aggregation keeps distributed double SUM/AVG deterministic
and bit-identical to the DuckDB oracle (see catalog.py docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec_sum(col: str | Column, scale: int = 2) -> Column:
    """Order-independent SUM of a double column: exact DECIMAL accumulate,
    deterministic cast back to double. SQL twin:
    ``CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dec_avg(col: str | Column, scale: int = 4, digits: int = 6) -> Column:
    """Deterministic AVG: exact decimal sum / non-null count, rounded.
    SQL twin: ``ROUND(CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE) / COUNT(c), d)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c), digits)


def sql_dec_sum(col: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_dec_avg(col: str, scale: int = 4, digits: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({col}), {digits})"
    )
