"""Pivot/unpivot: DuckDB-oracle equality, round-trip, plan shape, and
the explicit-values contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.reshape import (
    pivot_agg,
    unpivot_longify,
)
from taxi_data_pipeline_pset2_spark.queries._helpers import dec_sum
from taxi_data_pipeline_pset2_spark.sources.readers import load_table

from .oracle_utils import compare_frames, duckdb_connection

YEARS = [1992, 1993, 1994, 1995]

_PIVOT_COLS = ", ".join(
    f"CAST(SUM(CAST(CASE WHEN year(o_orderdate) = {y} THEN o_totalprice END"
    f' AS DECIMAL(18,2))) AS DOUBLE) AS "y{y}"'
    for y in YEARS
)

PIVOT_ORACLE = f"""
SELECT o_orderpriority,
       {_PIVOT_COLS}
FROM orders
GROUP BY o_orderpriority
"""

def _pivoted(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    wide = pivot_agg(
        orders,
        ["o_orderpriority"],
        "o_year",
        YEARS,
        dec_sum("o_totalprice"),
    )
    # pivot names columns by the raw value; align with the oracle alias
    for y in YEARS:
        wide = wide.withColumnRenamed(str(y), f"y{y}")
    return wide


def test_pivot_matches_duckdb_oracle(spark, sf_dir):
    got = _pivoted(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    want = con.execute(PIVOT_ORACLE).df()
    assert compare_frames(got, want) == []


def test_pivot_plan_shape(spark, sf_dir):
    plan = (
        _pivoted(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    # Spark plans pivot as (group, pivot)-agg -> pivotfirst-agg: two
    # exchanges, but the second carries only group x |values| rows
    # (already aggregate-sized). Both stages must show map-side partials
    # and there must be NO extra distinct-discovery scan of the fact
    # (exactly one FileScan) -- that is what the explicit value list buys.
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_pivotfirst" in plan and "partial_sum" in plan, plan
    assert plan.count("FileScan") == 1, plan


def test_pivot_requires_values(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="explicit pivot-value list"):
        pivot_agg(orders, ["o_orderpriority"], "o_orderstatus", [], F.count("*"))


def test_unpivot_round_trips_pivot(spark, sf_dir):
    wide = _pivoted(spark, sf_dir)
    long = unpivot_longify(
        wide,
        ["o_orderpriority"],
        [f"y{y}" for y in YEARS],
        var_name="year_col",
        value_name="revenue",
    )
    rows = long.collect()
    assert len(rows) == wide.count() * len(YEARS)
    # spot equality: each long row equals its wide cell
    wide_rows = {r.o_orderpriority: r.asDict() for r in wide.collect()}
    for r in rows:
        assert wide_rows[r.o_orderpriority][r.year_col] == r.revenue
    # no shuffle in the unpivot itself: Expand over the input, no Exchange
    plan = (
        unpivot_longify(
            wide, ["o_orderpriority"], [f"y{y}" for y in YEARS]
        )._jdf.queryExecution().analyzed().toString()
    )
    assert "Expand" in plan


CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""

GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


def test_cube_and_grouping_sets_dual_dialect(spark, sf_dir):
    """CUBE / GROUPING SETS run as the SAME SQL text on Spark SQL and
    DuckDB with identical results -- one Expand pass in Spark (no
    repeated scans per grouping)."""
    from taxi_data_pipeline_pset2_spark.sources.readers import register_views

    from .oracle_utils import canonical_rows

    register_views(spark, sf_dir)
    con = duckdb_connection(sf_dir)
    for sql in (CUBE_SQL, GROUPING_SETS_SQL):
        got = spark.sql(sql).toPandas()
        want = con.execute(sql).df()
        assert sorted(got.columns) == sorted(want.columns)
        assert canonical_rows(got) == canonical_rows(want)
    plan = spark.sql(CUBE_SQL)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan and plan.count("FileScan") == 1, plan
