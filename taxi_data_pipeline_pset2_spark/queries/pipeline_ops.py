"""Catalog entries for the pipeline-operator surface: availability/gap
manifest (SURVEY.md S4) and the streaming aggregation's batch twin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.sources.manifest import coverage_gaps, load_manifest
from taxi_data_pipeline_pset2_spark.queries._helpers import t
from taxi_data_pipeline_pset2_spark.queries.catalog import query


@query(
    "coverage_gap_detection",
    oracle="""
        WITH spine AS (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-02-10',
                                                     INTERVAL 1 DAY))::DATE AS d),
        present AS (SELECT DISTINCT date_trunc('day', ts)::DATE AS d FROM events)
        SELECT strftime(s.d, '%Y-%m-%d') AS missing_period, 'brecha' AS status
        FROM spine s
        WHERE NOT EXISTS (SELECT 1 FROM present p WHERE p.d = s.d)
        ORDER BY missing_period
    """,
    tags=("source", "manifest"),
)
def coverage_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap detection (S4): expected daily spine anti-joined against the
    days actually present -- the reference's per-month HEAD-probe loop
    with ``status='brecha'`` logging (``loader_yellow_green.py:13-19,
    56-61``) as one declarative scan."""
    return coverage_gaps(t(spark, sf_dir, "events"), "ts", "2024-01-01", "2024-02-10", unit="day")


@query(
    "load_manifest_months",
    oracle="""
        SELECT 'events' AS source,
               strftime(date_trunc('month', ts), '%Y-%m') AS period,
               count(*) AS n_rows,
               min(ts) AS first_ts,
               max(ts) AS last_ts
        FROM events
        GROUP BY period
        ORDER BY period
    """,
    tags=("source", "manifest"),
)
def load_manifest_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month load manifest (rows + span) -- the reference's resume
    bookkeeping (``loader_yellow_green.py:31-81``) as an aggregate."""
    return load_manifest(t(spark, sf_dir, "events"), "ts", "events")


@query(
    "events_hourly",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    tags=("bench", "streaming", "agg"),
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming tumbling-window aggregate
    (streaming/events.py hourly_event_counts): same grouping, same exact
    decimal sum -- the batch/streaming parity check the driver can
    hash-verify; the streaming path itself is asserted equal in
    tests/test_streaming.py."""
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
        .orderBy("window_start", "event_type")
    )


@query(
    "asof_last_purchase",
    oracle="""
        WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        purchases AS (SELECT user_id, ts, value AS purchase_value
                      FROM events WHERE event_type = 'purchase')
        SELECT c.event_id, c.user_id, c.ts, p.purchase_value AS last_purchase_value
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    tags=("join", "asof"),
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each click event annotated with the
    user's most recent prior purchase value. Spark has no native ASOF;
    this is the one-shuffle union+window composition, hash-verified
    against DuckDB's native ASOF LEFT JOIN."""
    from taxi_data_pipeline_pset2_spark.operators.asof import asof_join

    events = t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    return asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts"
    ).withColumnRenamed("purchase_value_asof", "last_purchase_value")


@query(
    "session_counts",
    oracle="""
        WITH d AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
            SELECT user_id, ts,
                   CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
            FROM d)
        SELECT user_id, session_num, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_num
    """,
    tags=("window", "session"),
)
def session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-sessionization (30 min), the window-function twin of the
    streaming ``sessionize`` operator (streaming/events.py): lag to mark
    session starts, running sum to number them, one aggregate for bounds.
    Two window passes + one aggregate over a single shuffle on user_id."""
    from pyspark.sql.window import Window

    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("new_s", new_s)
        .withColumn("session_num", F.sum("new_s").over(wsum).cast("bigint"))
        .groupBy("user_id", "session_num")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "recent_clicks_before_error",
    oracle="""
        WITH errors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        SELECT e.event_id, e.user_id, count(c.ts) AS n_recent_clicks
        FROM errors e LEFT JOIN clicks c
          ON c.user_id = e.user_id
         AND c.ts > e.ts - INTERVAL 60 MINUTE AND c.ts <= e.ts
        GROUP BY e.event_id, e.user_id
    """,
    tags=("join", "range"),
)
def recent_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: clicks within the hour before each error by
    the same user. Equi-key (user_id) + range predicate: Spark plans the
    equi part as the join key and the range as a post-join filter, so the
    blowup is bounded per user -- the scalable shape for event-window
    correlation (the unbounded form would be a cross join)."""
    events = t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    win_us = 60 * 60 * 1_000_000
    joined = errors.join(
        clicks,
        (F.col("c_user") == F.col("e_user"))
        & (F.unix_micros("c_ts") > F.unix_micros("e_ts") - win_us)
        & (F.col("c_ts") <= F.col("e_ts")),
        "left",
    )
    return joined.groupBy(
        "event_id", F.col("e_user").alias("user_id")
    ).agg(F.count("c_ts").alias("n_recent_clicks"))


@query("sketch_rollup_daily_users", oracle=None, tags=("approx", "rollup"))
def sketch_rollup_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable sketch rollup (the hypertable-rollup pattern):
    per-(event_type, day) HLL sketches of distinct users, then the
    event_type totals computed by MERGING the daily sketches -- not by
    re-scanning raw data. At 100 TB the daily sketch table is the only
    thing ever re-read; any coarser grain (week/month/all-time) is a
    cheap sketch union. Datasketches HLL binaries are not reproducible in
    DuckDB -> rows-only driver check; estimate accuracy vs exact distinct
    is pinned in tests/test_approx.py."""
    events = t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_distinct_users"),
            F.count("*").alias("n_days"),
        )
        .orderBy("event_type")
    )
