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
