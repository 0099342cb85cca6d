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
        cond = cond & (F.col(c) == F.col(f"_p_{c}"))
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
