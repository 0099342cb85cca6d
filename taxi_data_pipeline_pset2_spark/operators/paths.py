"""User-journey path aggregation: the Sankey/flow table behind every
"how do users move through the product" dashboard, and the sequence
analogue of the funnel (funnel.py measures ONE prescribed order;
this surfaces the orders that actually happen).

Scale shape: one hash aggregate per user collects at most the
ENTIRE user's event structs -- bounded by events-per-user, the same
per-group contract as every sessionization here -- sorts them
array-side (array_sort on (time, id) structs: deterministic, no
window shuffle), truncates to ``max_steps``, and renders the path
string; a second hash aggregate counts users per path and TakeOrdered
returns the head. Nothing event-shaped is windowed or re-shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_paths(
    events: DataFrame,
    user_col: str,
    time_col: str,
    id_col: str,
    step_col: str,
    max_steps: int = 5,
    top_n: int = 20,
    sep: str = " > ",
) -> DataFrame:
    """Top ``top_n`` journey prefixes: (path, n_users) where path is
    each user's first ``max_steps`` step labels in (time, id) order
    joined by ``sep``, ranked by n_users desc (path asc on ties).
    Users with fewer events than ``max_steps`` contribute their full
    shorter path; NULL step labels render as the empty string. Events
    with NULL time/id sort FIRST within their user (struct-field
    comparison semantics -- pinned, and mirrored as explicit NULLS
    FIRST in the SQL twin)."""
    if max_steps < 1:
        raise ValueError("max_steps must be >= 1")
    per_user = events.groupBy(F.col(user_col)).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(time_col).alias("t"),
                    F.col(id_col).alias("i"),
                    F.col(step_col).alias("s"),
                )
            )
        ).alias("_seq")
    )
    # explicit coalesce: concat_ws SKIPS null elements, which would
    # silently shorten a path containing a NULL label
    path = F.concat_ws(
        sep,
        F.transform(
            F.slice(F.col("_seq"), 1, max_steps),
            lambda x: F.coalesce(x["s"], F.lit("")),
        ),
    )
    return (
        per_user.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(top_n)
    )
