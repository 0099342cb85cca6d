"""Ordered-funnel analysis over an event stream (SURVEY.md §2 extension:
the ad-hoc analytics class the reference's notebook queries belong to,
applied to the events table).

"How many users did view -> click -> purchase, in order, within W
minutes of the first step?" -- the classic product-analytics operator.

Semantics (first-touch): t_0 is the user's EARLIEST step-0 event;
t_i is the earliest step-i event strictly after t_{i-1} (and within the
window, if given). A user converts through stage i iff t_i exists.
First-touch is deliberate: it is deterministic, oracle-expressible, and
the standard default in analytics engines; any-touch windowed funnels
need per-prefix state and belong to the sessionizer.

Plan shape -- one scan, one shuffle: per user, ONE hash aggregate
collects a sorted timestamp array per step (k arrays in one pass);
the stage chain then resolves as pure array expressions
(array_min(filter(arr_i, t > t_{i-1}))) inside the same projection.
No join chain (a k-step funnel as k joins re-shuffles k times), no
driver loop. Per-user state is bounded by that user's event count --
the same bound any per-user analytics carries; a pathological user can
be pre-capped with a per-(user, step) slice if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: tuple[str, ...],
    within_minutes: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(user, t_0..t_{k-1}, n_stages): per-user first-touch stage times
    (null once the chain breaks) and the number of completed stages.
    Users with no step-0 event are absent (they are not in the funnel).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    arrays = [
        F.array_sort(
            F.collect_list(F.when(F.col(type_col) == s, F.col(ts_col)))
        ).alias(f"_a{i}")
        for i, s in enumerate(steps)
    ]
    per_user = (
        events.filter(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(*arrays)
    )
    # F.get (0-based) rather than element_at: ANSI mode (Spark 4 default)
    # makes element_at throw on an empty array; get is null-safe.
    t_cols = [F.get(F.col("_a0"), 0).alias("t_0")]
    prev = F.get(F.col("_a0"), 0)
    deadline = (
        prev + F.expr(f"INTERVAL {within_minutes} MINUTES")
        if within_minutes is not None
        else None
    )
    # single-arg closures on purpose: F.filter dispatches on lambda arity,
    # and a defaulted second parameter would be bound to the ELEMENT INDEX
    def _after(p, d):
        if d is None:
            return lambda x: x > p
        return lambda x: (x > p) & (x <= d)

    for i in range(1, len(steps)):
        cur = F.array_min(F.filter(F.col(f"_a{i}"), _after(prev, deadline)))
        t_cols.append(cur.alias(f"t_{i}"))
        prev = cur
    out = per_user.select(user_col, *t_cols).filter(F.col("t_0").isNotNull())
    n = None
    for i in range(len(steps)):
        term = F.col(f"t_{i}").isNotNull().cast("bigint")
        n = term if n is None else n + term
    return out.withColumn("n_stages", n)


def funnel_summary(
    stages: DataFrame, n_steps: int
) -> DataFrame:
    """(stage, users, conversion_from_start): how many users completed
    each stage, from a ``funnel_stages`` frame. One aggregate over the
    user-sized stage table."""
    counts = stages.agg(
        *[
            F.sum(F.col(f"t_{i}").isNotNull().cast("bigint")).alias(f"s{i}")
            for i in range(n_steps)
        ]
    ).collect()[0]
    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        round_half_up_6,
    )

    # HALF_UP like the oracle's round(), not builtin banker's rounding
    rows = [
        (
            i,
            int(counts[f"s{i}"] or 0),
            round_half_up_6((counts[f"s{i}"] or 0) / counts["s0"])
            if counts["s0"]
            else None,
        )
        for i in range(n_steps)
    ]
    spark = stages.sparkSession
    return spark.createDataFrame(
        rows, "stage int, users bigint, conversion_from_start double"
    )


def funnel_step_timings(
    events: DataFrame,
    steps: tuple[str, ...],
    within_minutes: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Inter-step latency distribution of the funnel: one row per
    transition (step i-1 -> i) with (step, transition, n_users,
    median_s, p90_s, mean_s) in whole seconds -- the "WHERE do users
    stall" companion to funnel_summary's "how many make it". Only
    users who completed the transition contribute; transitions nobody
    completed report n_users = 0 with NULL latencies.

    Same single-aggregate shape as funnel_stages (this composes it):
    the per-user stage times explode to a CONSTANT k-1 transition rows,
    then one transition-keyed aggregate. Gaps are exact integer seconds
    (per-timestamp truncation, so both engines subtract identical
    integers); medians/p90s are exact interpolating percentiles
    (quantile_cont semantics); the mean divides an exact BIGINT sum.
    """
    stages = funnel_stages(
        events, steps, within_minutes, user_col, type_col, ts_col
    )
    rows = []
    for i in range(1, len(steps)):
        gap = F.unix_timestamp(f"t_{i}") - F.unix_timestamp(f"t_{i - 1}")
        rows.append(
            F.struct(
                F.lit(i).cast("int").alias("step"),
                F.lit(f"{steps[i - 1]}->{steps[i]}").alias("transition"),
                gap.cast("bigint").alias("gap"),
            )
        )
    exploded = stages.select(F.explode(F.array(*rows)).alias("_t")).select(
        "_t.step", "_t.transition", "_t.gap"
    )
    agg = exploded.groupBy("step", "transition").agg(
        F.count("gap").cast("bigint").alias("n_users"),
        F.round(F.expr("percentile(gap, 0.5)"), 6).alias("median_s"),
        F.round(F.expr("percentile(gap, 0.9)"), 6).alias("p90_s"),
        F.round(F.sum("gap").cast("double") / F.count("gap"), 6).alias(
            "mean_s"
        ),
    )
    # driver-built transition spine (funnel_summary's device): with no
    # stage-0 completers the exploded frame is EMPTY and a bare groupBy
    # would return zero rows, where the contract (and the oracle's
    # unconditional UNION ALL) is one row per transition with
    # n_users = 0 and NULL latencies
    spine = events.sparkSession.createDataFrame(
        [(i, f"{steps[i - 1]}->{steps[i]}") for i in range(1, len(steps))],
        "step int, transition string",
    )
    return (
        spine.join(agg, ["step", "transition"], "left")
        .select(
            "step",
            "transition",
            F.coalesce(F.col("n_users"), F.lit(0)).cast("bigint").alias(
                "n_users"
            ),
            "median_s",
            "p90_s",
            "mean_s",
        )
        .orderBy("step")
    )
