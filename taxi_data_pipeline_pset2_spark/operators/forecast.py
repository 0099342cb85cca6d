"""Seasonal-naive forecast evaluation: the baseline every forecasting
pipeline must beat, with MASE (Hyndman & Koehler 2006) as the
scale-free score.

seasonal-naive: y_hat(t) = y(t - season). MASE divides the test MAE
by the TRAIN-period MAE of the same seasonal-naive step, so a MASE
below 1 means "beats the naive baseline where it was fit" and the
score is comparable across series of any magnitude -- the reason
Hyndman made it the M-competition standard over MAPE (undefined at
zero) and raw MAE (scale-bound).

Scale shape: the fact table reduces to one (key, bucket) hash
aggregate; the seasonal lag is a SELF-JOIN ON (key, t - season) --
time-shift joins handle GAPPED series exactly (a row-offset lag
window would silently compare across gaps); then one aggregate per
key splits train/test at the cutoff. Absolute errors accumulate as
DECIMAL, so MAE/MASE hash-match the DuckDB twin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seasonal_naive_eval(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    split_ts: str,
    bucket: str = "hour",
    season_buckets: int = 24,
) -> DataFrame:
    """Per-key backtest of the seasonal-naive forecaster:
    (key_cols..., n_train, n_test, mae_train, mae_test, mase), where
    buckets before ``split_ts`` are train and the rest test, the
    forecast for bucket t is the actual at t - ``season_buckets``
    (from EITHER period -- the standard expanding origin), and buckets
    with no seasonal predecessor are skipped on both sides. mase =
    mae_test / mae_train (NULL when either side is empty or train MAE
    is 0). NULL values are excluded from the bucket sums."""
    keys = [F.col(c) for c in key_cols]
    series = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            *keys, F.date_trunc(bucket, F.col(time_col)).alias("_t")
        )
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_y")
        )
    )
    shift = F.expr(f"INTERVAL {int(season_buckets)} {bucket.upper()}")
    prev = series.select(
        *[F.col(c).alias(f"_p_{c}") for c in key_cols],
        (F.col("_t") + shift).alias("_pt"),
        F.col("_y").alias("_y_prev"),
    )
    cond = (F.col("_t") == F.col("_pt"))
    for c in key_cols:
        # eqNullSafe: NULL is a legitimate cohort (NULL zone/type ids
        # are common); a plain == silently drops the whole NULL-key
        # series from the backtest with no error and no NULL-metric row
        cond = cond & F.col(c).eqNullSafe(F.col(f"_p_{c}"))
    j = series.join(prev, cond)
    err = F.abs(F.col("_y") - F.col("_y_prev"))
    is_test = F.col("_t") >= F.to_timestamp(F.lit(split_ts))
    agg = j.groupBy(*keys).agg(
        F.count(F.when(~is_test, 1)).cast("bigint").alias("n_train"),
        F.count(F.when(is_test, 1)).cast("bigint").alias("n_test"),
        F.sum(F.when(~is_test, err)).cast("double").alias("_se_train"),
        F.sum(F.when(is_test, err)).cast("double").alias("_se_test"),
    )
    mae_train = F.col("_se_train") / F.col("n_train")
    mae_test = F.col("_se_test") / F.col("n_test")
    ok = (F.col("n_train") > 0) & (F.col("n_test") > 0)
    out = agg.select(
        *key_cols,
        "n_train",
        "n_test",
        F.round(F.when(F.col("n_train") > 0, mae_train), 6).alias(
            "mae_train"
        ),
        F.round(F.when(F.col("n_test") > 0, mae_test), 6).alias("mae_test"),
        F.round(
            F.when(ok & (mae_train > 0), mae_test / mae_train), 6
        ).alias("mase"),
    )
    return out.orderBy(*key_cols) if key_cols else out


def pinball_loss(
    df: DataFrame,
    actual_col: str,
    forecast_col: str,
    quantiles: Sequence[float] = (0.5, 0.9),
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Mean pinball (quantile) loss per group and quantile:
    (group_cols..., q, n, pinball) -- THE proper scoring rule for
    quantile forecasts (Gneiting & Raftery 2007; the M5-uncertainty
    metric): loss = q * (y - f) when y >= f else (1 - q) * (f - y),
    so an under-prediction at q=0.9 costs 9x an equal
    over-prediction -- MASE (point accuracy) says nothing about
    calibrated bands; this does.

    Exactness: y, f and every quantile weight are DECIMALS (q enters
    as an exact decimal literal, never a double), so per-row losses
    and their sums are exact under any partitioning; the single final
    mean division rounds to 6 dp. One scan, one hash aggregate with
    len(quantiles) conditional sums, constant-width explode. Rows
    with NULL actual or forecast drop."""
    if not quantiles:
        raise ValueError("need at least one quantile")
    if any(not 0 < q < 1 for q in quantiles):
        raise ValueError(f"quantiles must be in (0,1): {quantiles}")
    keys = [F.col(c) for c in group_cols]
    y = F.col(actual_col).cast("decimal(28,6)")
    f = F.col(forecast_col).cast("decimal(28,6)")
    base = df.filter(y.isNotNull() & f.isNotNull()).select(
        *group_cols, y.alias("_y"), f.alias("_f")
    )
    aggs = [F.count("*").cast("bigint").alias("n")]
    for i, q in enumerate(quantiles):
        qd = F.lit(f"{q:.6f}").cast("decimal(8,6)")
        loss = F.when(
            F.col("_y") >= F.col("_f"),
            (qd * (F.col("_y") - F.col("_f"))).cast("decimal(38,12)"),
        ).otherwise(
            ((F.lit("1.000000").cast("decimal(8,6)") - qd)
             * (F.col("_f") - F.col("_y"))).cast("decimal(38,12)")
        )
        aggs.append(F.sum(loss).alias(f"_s{i}"))
    agg = (base.groupBy(*keys) if group_cols else base.groupBy()).agg(*aggs)
    rows = [
        F.struct(
            F.lit(f"{q:.6f}").cast("decimal(8,6)").alias("q"),
            F.round(
                F.col(f"_s{i}").cast("double") / F.col("n").cast("double"), 6
            ).alias("pinball"),
        )
        for i, q in enumerate(quantiles)
    ]
    out = agg.select(
        *group_cols, "n", F.explode(F.array(*rows)).alias("_r")
    ).select(
        *group_cols,
        F.col("_r.q").cast("double").alias("q"),
        "n",
        "_r.pinball",
    )
    return out.orderBy(*group_cols, "q")
