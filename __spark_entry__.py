"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``taxi_data_pipeline_pset2_spark`` -- this module
just re-exports the query catalog.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from taxi_data_pipeline_pset2_spark.queries import oracle_sqls, spark_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the reference's clustering-demo benchmark aggregate
    (README.md:90-96, SURVEY.md A8) -- month-truncated group-by over the
    fact, the query BASELINE.md headlines.
    """
    from taxi_data_pipeline_pset2_spark.queries.relational import monthly_trend

    return monthly_trend(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each catalog query (omitted for
    the non-SQL-expressible ops -> driver records rows-only)."""
    return oracle_sqls()
