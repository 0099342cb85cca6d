"""Scalar-function catalog: SURVEY.md section 2.8 (F1-F14).

The reference's scalar surface is Snowflake SQL; Spark twins live in
``functions/scalars.py`` and are exercised here with DuckDB oracles.
Semantic-delta hazards called out in SURVEY.md section 7 (DAYOFWEEK
numbering, month-name padding, DATEDIFF truncation, float formatting) are
pinned by these queries: the oracle SQL encodes the *Spark* semantics so a
hash match proves the delta is handled."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.functions.scalars import (
    duration_hours,
    guarded_pct,
    surrogate_id,
)
from taxi_data_pipeline_pset2_spark.queries._helpers import t
from taxi_data_pipeline_pset2_spark.queries.catalog import query


@query(
    "hash_surrogate_ids",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               md5(concat_ws('|',
                   CAST(l_orderkey AS VARCHAR),
                   CAST(l_linenumber AS VARCHAR),
                   CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR),
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
                   l_returnflag)) AS line_id
        FROM lineitem
    """,
    tags=("scalar", "hash"),
)
def hash_surrogate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MD5 surrogate key over concatenated business columns
    (reference ``fct_trips.sql:10`` trip_id, operator F1). Doubles are
    formatted through DECIMAL(18,2) so the string rendering is fixed --
    the stable-formatting requirement SURVEY.md section 7 flags."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        surrogate_id(
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            F.col("l_quantity").cast("decimal(18,2)"),
            F.col("l_extendedprice").cast("decimal(18,2)"),
            F.col("l_returnflag"),
        ).alias("line_id"),
    )


@query(
    "datetime_functions",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(quarter(o_orderdate) AS INT) AS o_quarter,
               CAST(month(o_orderdate) AS INT) AS o_month,
               CAST(day(o_orderdate) AS INT) AS o_day,
               CAST(hour(o_orderdate) AS INT) AS o_hour,
               CAST(weekofyear(o_orderdate) AS INT) AS o_week,
               CAST(dayofyear(o_orderdate) AS INT) AS o_doy,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS o_dow,
               dayofweek(o_orderdate) IN (0, 6) AS is_weekend,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
               monthname(o_orderdate) AS o_month_name,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
               date_trunc('month', o_orderdate) AS o_month_start
        FROM orders
    """,
    tags=("scalar", "datetime"),
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime extract/construct/format/trunc battery (reference
    ``dim_date.sql:23-36``, ``fct_trips.sql:64-81``; operators F5-F8).
    The oracle encodes Spark's 1=Sunday DAYOFWEEK convention (DuckDB +1)
    -- the numbering hazard from SURVEY.md section 7."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.quarter(d).alias("o_quarter"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        F.hour(d).alias("o_hour"),
        F.weekofyear(d).alias("o_week"),
        F.dayofyear(d).alias("o_doy"),
        F.dayofweek(d).alias("o_dow"),
        F.dayofweek(d).isin(1, 7).alias("is_weekend"),
        F.date_format(d, "yyyy-MM-dd").alias("order_date_str"),
        F.date_format(d, "MMMM").alias("o_month_name"),
        F.date_format(F.date_add(F.to_date(d), 30), "yyyy-MM-dd").alias("due_date"),
        F.date_trunc("month", d).alias("o_month_start"),
    )


@query(
    "trip_duration_metrics",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber,
               ROUND((epoch(l.l_shipdate) - epoch(o.o_orderdate)) / 3600.0, 6) AS lead_time_hours,
               CASE
                   WHEN (epoch(l.l_shipdate) - epoch(o.o_orderdate)) > 0
                   THEN ROUND(CAST(l.l_quantity AS DOUBLE)
                              / ((epoch(l.l_shipdate) - epoch(o.o_orderdate)) / 3600.0), 6)
                   ELSE 0.0
               END AS qty_per_hour
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    tags=("scalar", "datetime", "join"),
)
def trip_duration_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration + guarded-division derived metrics: the fct_trips
    trip_duration_hours / avg_speed_mph pattern (reference
    ``fct_trips.sql:23-29``, operators F4+F11+F2). Exact epoch subtraction,
    CASE-guarded division (never div-by-zero NULLs)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    dur = duration_hours(F.col("o_orderdate"), F.col("l_shipdate"))
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.round(dur, 6).alias("lead_time_hours"),
        guarded_pct(F.col("l_quantity").cast("double"), dur).alias("qty_per_hour"),
    )


@query(
    "string_functions",
    oracle="""
        SELECT c_custkey,
               trim(c_name) AS name_trimmed,
               upper(c_mktsegment) AS segment_upper,
               lower(c_name) AS name_lower,
               c_name LIKE '%1%' AS has_one,
               contains(upper(c_mktsegment), 'BUILD') AS is_building,
               'CUST_' || replace(replace(CAST(c_custkey AS VARCHAR), ' ', '_'), ':', '-') AS run_id
        FROM customer
    """,
    tags=("scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String cleanup + pattern battery: TRIM/UPPER/LOWER, LIKE/contains,
    concat||replace run-id (reference ``dim_zone.sql:15-43`` F9/F10,
    exporter run-id ``.../1759109036:169`` F13)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.trim(F.col("c_name")).alias("name_trimmed"),
        F.upper(F.col("c_mktsegment")).alias("segment_upper"),
        F.lower(F.col("c_name")).alias("name_lower"),
        F.col("c_name").like("%1%").alias("has_one"),
        F.upper(F.col("c_mktsegment")).contains("BUILD").alias("is_building"),
        F.concat(
            F.lit("CUST_"),
            F.regexp_replace(
                F.regexp_replace(F.col("c_custkey").cast("string"), " ", "_"), ":", "-"
            ),
        ).alias("run_id"),
    )


@query(
    "case_flags",
    oracle="""
        SELECT o_orderkey,
               CASE
                   WHEN o_totalprice >= 100000 THEN 'high'
                   WHEN o_totalprice >= 10000 THEN 'mid'
                   ELSE 'low'
               END AS price_band,
               CASE o_orderstatus WHEN 'F' THEN 'finished'
                                  WHEN 'O' THEN 'open'
                                  ELSE 'partial' END AS status_name,
               o_orderstatus = 'F' AND o_totalprice > 50000 AS is_big_finished,
               CAST(COALESCE(NULLIF(o_orderpriority, ''), 'UNKNOWN') AS STRING) AS priority_clean
        FROM orders
    """,
    tags=("scalar", "case"),
)
def case_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched + simple CASE and boolean flag derivation (reference
    ``fct_trips.sql:70-90`` is_rush_hour/is_night_trip/quality flags,
    ``dim_payment_type.sql:7-26``; operators F2+F3)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 100000, "high")
        .when(F.col("o_totalprice") >= 10000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_name"),
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 50000)).alias(
            "is_big_finished"
        ),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("")), F.lit("UNKNOWN")).alias(
            "priority_clean"
        ),
    )


@query(
    "values_dim",
    oracle="""
        SELECT * FROM (VALUES
            (1, 'Credit card'), (2, 'Cash'), (3, 'No charge'),
            (4, 'Dispute'), (5, 'Unknown'), (6, 'Voided trip'), (0, 'Not specified')
        ) AS v(payment_type_id, payment_type_name)
        ORDER BY payment_type_id
    """,
    tags=("dim", "source"),
)
def values_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation as a dimension source (reference
    ``dim_payment_type.sql:29-32`` / ``dim_rate_code.sql:12-21``, operator
    S9): literal rows -> DataFrame, broadcast-able by construction."""
    rows = [
        (1, "Credit card"),
        (2, "Cash"),
        (3, "No charge"),
        (4, "Dispute"),
        (5, "Unknown"),
        (6, "Voided trip"),
        (0, "Not specified"),
    ]
    return spark.createDataFrame(
        rows, schema="payment_type_id int, payment_type_name string"
    ).orderBy("payment_type_id")
