"""Kaplan-Meier survival estimation per group.

Time-to-event analytics (Kaplan & Meier, JASA 1958) over a durations
frame: the standard answer to "how long until X happens", robust to
RIGHT-CENSORING (subjects still alive at observation end contribute to
the at-risk denominator until their censor time, not to events). The
pipeline uses: time-to-fulfillment, time-to-churn, time-to-first-
purchase funnels -- anywhere a naive AVG(duration) would be biased by
in-flight rows.

Scale shape: one hash aggregate to (group, t) -- the curve's row count
is DISTINCT DURATIONS per group, not subjects -- then window functions
over that bounded frame, partitioned by group. Nothing subject-shaped
is windowed: a 10^11-subject corpus with day-granularity durations
still reduces to ~10^3 rows per group before any window runs.

Determinism: the survival product is computed as exp(running sum of
ln(factor)) in the window's ORDER BY t sequence -- the identical
sequential double reduction DuckDB performs -- with factor = 0 (an
event count equal to the risk set, i.e. the curve hits zero) handled
by an explicit seen-zero flag rather than ln(0) (Spark's ln(0) is NULL
where DuckDB's is -inf). Results round once to 6 dp.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Kaplan-Meier curve rows: (group_cols..., t, n_risk, n_event,
    n_censored, survival), one row per distinct observed duration
    (event or censor) per group, ordered by group, t.

    ``duration_col``: non-negative time-to-event-or-censor (any numeric;
    emitted as double ``t``). ``event_col``: boolean/0-1 -- true means
    the event was OBSERVED at t, false means the subject was censored
    at t. Rows with NULL duration/event or negative duration are
    excluded. survival = prod over event times t_i <= t of
    (1 - d_i / n_risk_i); censor-only times carry the previous value."""
    g = [F.col(c) for c in group_cols]
    ev = F.col(event_col).cast("int")
    base = df.filter(
        F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
        & (F.col(duration_col) >= 0)
    )
    by_t = base.groupBy(
        *g, F.col(duration_col).cast("double").alias("t")
    ).agg(
        F.sum(ev).cast("bigint").alias("n_event"),
        F.sum(1 - ev).cast("bigint").alias("n_censored"),
    )
    w_group = Window.partitionBy(*[F.col(c) for c in group_cols])
    w_prev = w_group.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = w_group.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    leaving = F.col("n_event") + F.col("n_censored")
    n_risk = F.sum(leaving).over(w_group) - F.coalesce(
        F.sum(leaving).over(w_prev), F.lit(0)
    )
    stepped = by_t.withColumn("n_risk", n_risk.cast("bigint"))
    factor = F.lit(1.0) - F.col("n_event") / F.col("n_risk")
    zero_seen = F.max((factor <= 0).cast("int")).over(w_cum)
    logsum = F.sum(
        F.when(factor > 0, F.log(factor)).otherwise(F.lit(0.0))
    ).over(w_cum)
    survival = F.when(zero_seen == 1, F.lit(0.0)).otherwise(F.exp(logsum))
    return stepped.select(
        *group_cols,
        "t",
        "n_risk",
        "n_event",
        "n_censored",
        F.round(survival, 6).alias("survival"),
    ).orderBy(*group_cols, "t")


def median_survival(
    km: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Median survival time per group from a ``kaplan_meier`` frame:
    the smallest t with survival <= 0.5. Groups whose curve never
    crosses 0.5 (more than half the subjects censored) emit NO row --
    the estimator is undefined there, not zero. The standard curve
    summary; one tiny aggregate over the curve frame."""
    out = (
        km.filter(F.col("survival") <= 0.5)
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(F.min("t").alias("median_t"))
        .filter(F.col("median_t").isNotNull())
    )
    return out.orderBy(*group_cols) if group_cols else out
