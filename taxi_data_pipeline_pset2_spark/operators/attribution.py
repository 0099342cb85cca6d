"""Multi-touch marketing attribution: split conversion credit across
the touchpoints that preceded each conversion, under the four standard
models in ONE pass -- first-touch, last-touch, linear, and
position-based (the 40/20/40 "U-shape"; Google Analytics' classic
model lineup).

Scale shape: touches join conversions on the USER equi-key (a hash
join -- the lookback-window predicate rides along in the join
condition, so Catalyst plans a shuffled hash/sort-merge join on
user_id, never a BroadcastNestedLoop), then one window pass per
conversion group (bounded by touches-per-conversion) and one hash
aggregate to channel cardinality. Per-touch weights round to integer
millionths before summing (the lm_score discipline), so channel
credits are partitioning-independent and hash-match the DuckDB twin.

Weight semantics per conversion with n touches (ordered by touch
time, id tiebreak):

 - first:    touch 1 gets 1
 - last:     touch n gets 1
 - linear:   every touch gets 1/n
 - position: n=1 -> 1; n=2 -> 0.5/0.5; n>=3 -> 0.4 first, 0.4 last,
             0.2/(n-2) each middle
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1_000_000


def multi_touch_attribution(
    events: DataFrame,
    user_col: str,
    time_col: str,
    id_col: str,
    channel_col: str,
    is_conversion: Column,
    is_touch: Column,
    lookback_minutes: int = 120,
) -> DataFrame:
    """Channel credit table: (channel, n_touches, credit_first,
    credit_last, credit_linear, credit_position), credits in
    conversions (each attributed conversion distributes exactly 1.0
    per model, up to millionth rounding), ordered by channel.

    A touch attributes to a conversion when it is the SAME user's
    event, strictly before the conversion, and within
    ``lookback_minutes`` of it. A touch preceding several conversions
    credits each (standard GA behavior); conversions with no touch in
    window contribute no credit (unattributed)."""
    if lookback_minutes <= 0:
        raise ValueError("lookback_minutes must be positive")
    conv = events.filter(is_conversion).select(
        F.col(user_col).alias("_cu"),
        F.col(time_col).alias("_ct"),
        F.col(id_col).alias("_cid"),
    )
    touch = events.filter(is_touch).select(
        F.col(user_col).alias("_tu"),
        F.col(time_col).alias("_tt"),
        F.col(id_col).alias("_tid"),
        F.col(channel_col).alias("channel"),
    )
    lb = F.expr(f"INTERVAL {int(lookback_minutes)} MINUTE")
    j = touch.join(
        conv,
        (F.col("_tu") == F.col("_cu"))
        & (F.col("_tt") < F.col("_ct"))
        & (F.col("_tt") >= F.col("_ct") - lb),
    )
    w = Window.partitionBy("_cu", "_cid").orderBy("_tt", "_tid")
    w_all = Window.partitionBy("_cu", "_cid")
    ranked = j.select(
        "channel",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(w_all).alias("_n"),
    )
    rn, n = F.col("_rn"), F.col("_n")
    first = F.when(rn == 1, 1.0).otherwise(0.0)
    last = F.when(rn == n, 1.0).otherwise(0.0)
    linear = F.lit(1.0) / n
    position = (
        F.when(n == 1, 1.0)
        .when(n == 2, 0.5)
        .when((rn == 1) | (rn == n), 0.4)
        .otherwise(F.lit(0.2) / (n - 2))
    )

    def credit_m(col: Column) -> Column:
        return F.round(col * _SCALE).cast("bigint")

    agg = ranked.groupBy("channel").agg(
        F.count("*").cast("bigint").alias("n_touches"),
        F.sum(credit_m(first)).alias("_f"),
        F.sum(credit_m(last)).alias("_l"),
        F.sum(credit_m(linear)).alias("_lin"),
        F.sum(credit_m(position)).alias("_pos"),
    )
    return agg.select(
        "channel",
        "n_touches",
        (F.col("_f").cast("double") / _SCALE).alias("credit_first"),
        (F.col("_l").cast("double") / _SCALE).alias("credit_last"),
        (F.col("_lin").cast("double") / _SCALE).alias("credit_linear"),
        (F.col("_pos").cast("double") / _SCALE).alias("credit_position"),
    ).orderBy("channel")
