"""Cohort retention analysis (SURVEY.md §2 extension: the ad-hoc
product-analytics class the reference's notebook queries belong to,
alongside the ordered funnel in ``operators/funnel.py``).

"Of the users whose FIRST activity fell in period P, how many were
active again k periods later?" -- the classic retention triangle.

Plan shape -- two shuffles, no window function: one hash aggregate
collects each user's distinct active periods (bounded by the calendar
span, not the event count), the cohort is ``array_min`` of that set
(no per-user window pass), and the triangle is one aggregate over the
exploded (user, period) rows. At 100 TB the event table is scanned
once and everything after the first aggregate is user-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIODS = ("day", "week", "month")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """(cohort, period_offset, n_users): users grouped by the period of
    their first activity; ``n_users`` counts the cohort's distinct users
    active exactly ``period_offset`` periods later (offset 0 is the
    cohort size itself). ``cohort`` is the period-truncated timestamp.
    """
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {_PERIODS}, got {period!r}")
    per_user = (
        events.select(
            F.col(user_col), F.date_trunc(period, F.col(ts_col)).alias("p")
        )
        .groupBy(user_col)
        .agg(F.collect_set("p").alias("ps"))
        .select(
            user_col,
            F.array_min("ps").alias("cohort"),
            F.explode("ps").alias("p"),
        )
    )
    if period == "day":
        offset = F.datediff(F.col("p"), F.col("cohort"))
    elif period == "week":
        offset = F.floor(F.datediff(F.col("p"), F.col("cohort")) / 7)
    else:  # month: both sides are month-truncated, so this is exact
        offset = F.months_between(F.col("p"), F.col("cohort"))
    return (
        per_user.groupBy("cohort", offset.cast("int").alias("period_offset"))
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
        .orderBy("cohort", "period_offset")
    )


def cohort_ltv(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Cumulative lifetime value per signup cohort: (cohort_month,
    age_months, n_customers, cum_revenue, ltv_per_customer) where a
    user's cohort is the month of their FIRST event and age is months
    since it -- the money-weighted upgrade of cohort_retention (who
    comes back vs what they're cumulatively worth). The LTV curve's
    flattening point is where acquisition-cost payback is decided.

    Shape: one per-user first-event aggregate (cohort assignment,
    broadcast back), one (cohort, age) revenue aggregate with exact
    DECIMAL sums, then a cumulative window over the cohort x age frame
    -- cohort-count x max-age sized, never row-sized. Month arithmetic
    is integer (12*year + month), so ages are exact; ltv divides by
    the FIXED cohort size (users who never return still hold their
    denominator seat). 6-dp rounding; hash-matches a DuckDB twin."""
    from pyspark.sql.window import Window

    mon = (12 * F.year(ts_col) + F.month(ts_col)).cast("int")
    base = df.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        mon.alias("_m"),
        F.col(value_col).cast("decimal(18,2)").alias("_v"),
    )
    cohorts = base.groupBy("_u").agg(F.min("_m").alias("_cohort"))
    sizes = cohorts.groupBy("_cohort").agg(
        F.count("*").cast("bigint").alias("n_customers")
    )
    # cohorts is USER-sized: never broadcast it -- the join shuffles on
    # the user key (AQE still broadcasts when it happens to be small)
    rev = (
        base.join(cohorts, "_u")
        .groupBy(
            F.col("_cohort"), (F.col("_m") - F.col("_cohort")).alias("age_months")
        )
        .agg(F.sum("_v").alias("_rev"))
    )
    w = (
        Window.partitionBy("_cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.withColumn("_cum", F.sum("_rev").over(w))
        .join(F.broadcast(sizes), "_cohort")
        .select(
            F.col("_cohort").alias("cohort_month"),
            F.col("age_months").cast("int").alias("age_months"),
            "n_customers",
            F.col("_cum").cast("double").alias("cum_revenue"),
            F.round(
                F.col("_cum").cast("double")
                / F.col("n_customers").cast("double"),
                6,
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort_month", "age_months")
    )
