"""Time-series regularization: per-key time spine + last-observation-
carried-forward (LOCF) gap filling, and event-transition counting.

The reference's only spine is dim_date's recursive day sequence
(dim_date.sql:6-12, rebuilt as sequence+explode per SURVEY.md 7);
these operators generalize it to per-entity regular grids -- the shape
sensor/market/telemetry pipelines need before windowed features, and
the batch complement of streaming watermark alignment.

Plan shapes at 100 TB:
- spine: the per-key (min, max) aggregate is key-cardinality-sized;
  the grid explodes from it (rows = sum of per-key spans / step, the
  OUTPUT size -- nothing corpus-shaped is shuffled twice).
- LOCF: one left join of grid onto observations (co-partitioned by
  key+bucket) plus one window last_value(ignorenulls) per key ordered
  by time. A single sort-shuffle on (key, time), the minimum any
  order-dependent fill needs.
- transitions: lead() over (key, time) then a pair hash-aggregate --
  one window shuffle, one vocab-sized aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def time_spine(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """(key_cols..., ts): a regular grid from each key's first to last
    observation (inclusive), step-aligned to the key's first bucket
    start."""
    trunc_unit = {"1 hour": "hour", "1 day": "day", "1 minute": "minute"}.get(step)
    if trunc_unit is None:
        raise ValueError(f"unsupported step {step!r}")
    bounds = df.groupBy(*key_cols).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("_lo"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("_hi"),
    )
    return bounds.select(
        *key_cols,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
        ).alias("ts"),
    )


def resample_locf(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    step: str = "1 hour",
    agg: str = "last",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Regularize to a ``step`` grid with LOCF fill: one row per
    (key, bucket) from the key's first to last observation; buckets
    with observations take the bucket's ``agg`` ('last' by arrival
    order within the bucket, or 'avg'/'sum'/'min'/'max'); empty buckets
    carry the previous bucket's filled value forward. Adds
    ``is_filled`` marking carried rows."""
    if agg not in ("last", "avg", "sum", "min", "max"):
        raise ValueError(f"unsupported agg {agg!r}")
    trunc_unit = {"1 hour": "hour", "1 day": "day", "1 minute": "minute"}[step]
    bucketed = df.withColumn("_bucket", F.date_trunc(trunc_unit, F.col(ts_col)))
    if agg == "last":
        # value_cols close the order as final tie-breakers: with
        # tie_cols=None, two observations at the IDENTICAL ts would
        # otherwise rank by partition-internal arrival order -- a
        # non-order that flips across shuffles/AQE layouts and then
        # LOCF-propagates the flip into every following filled bucket.
        # Same-content duplicates remain interchangeable, so the pick
        # is deterministic given the rows.
        order = (
            [F.col(ts_col).desc()]
            + [F.col(c).desc() for c in (tie_cols or [])]
            + [F.col(c).desc() for c in value_cols]
        )
        w = Window.partitionBy(*key_cols, "_bucket").orderBy(*order)
        per_bucket = (
            bucketed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*key_cols, "_bucket", *value_cols)
        )
    else:
        fn = getattr(F, agg)
        per_bucket = bucketed.groupBy(*key_cols, "_bucket").agg(
            *[fn(c).alias(c) for c in value_cols]
        )
    spine = time_spine(df, key_cols, ts_col, step).withColumnRenamed("ts", "_bucket")
    # join-presence marker, NOT value-nullness: a bucket whose observed
    # value is NULL is an observation (is_filled must stay False and the
    # NULL must survive -- see the no-overwrite guard below), and with
    # several value_cols the first column's nullness says nothing about
    # the others.
    joined = spine.join(
        per_bucket.withColumn("_present", F.lit(True)),
        [*key_cols, "_bucket"],
        "left",
    )
    wfill = (
        Window.partitionBy(*key_cols)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn(
        "is_filled", ~F.coalesce(F.col("_present"), F.lit(False))
    )
    for c in value_cols:
        # struct-pack so last(ignorenulls) skips EMPTY buckets but still
        # carries an observed NULL forward (the observation is the fact;
        # its value may legitimately be NULL)
        carried = F.last(
            F.when(F.col("_present"), F.struct(F.col(c).alias("v"))),
            ignorenulls=True,
        ).over(wfill)
        out = out.withColumn(
            c, F.when(F.col("is_filled"), carried.getField("v")).otherwise(F.col(c))
        )
    return out.withColumnRenamed("_bucket", ts_col).select(
        *key_cols, ts_col, *value_cols, "is_filled"
    )


def transition_counts(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    state_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """First-order transition matrix over per-key event sequences:
    (from_state, to_state, n, p) where p is the row-normalized
    probability rounded to 6dp. ``tie_cols`` break timestamp ties
    deterministically (default: the state itself)."""
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tie_cols or [state_col])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    pairs = (
        df.withColumn("_next", F.lead(state_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"),
            F.col("_next").alias("to_state"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    wrow = Window.partitionBy("from_state")
    return pairs.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(wrow), 6)
    )


def rolling_features(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1,),
    windows: tuple[int, ...] = (3,),
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key lag/rolling feature block in ONE window pass: for each
    ``n`` in ``lags`` a ``lag_{n}`` column, and for each ``w`` in
    ``windows`` trailing-``w``-row (current inclusive) ``roll_mean_{w}``
    / ``roll_min_{w}`` / ``roll_max_{w}`` columns -- the standard
    autoregressive feature prep before any forecasting model.

    All expressions share a single (key, ts, tie) sort window, so the
    plan is one shuffle + one in-partition sort no matter how many
    features are requested -- N features must never mean N shuffles.
    Rolling means are rounded to 6 dp; short leading windows aggregate
    over the rows that exist (pandas min_periods=1 semantics)."""
    if not lags and not windows:
        raise ValueError("request at least one lag or window")
    if any(n < 1 for n in lags) or any(w < 1 for w in windows):
        raise ValueError("lags and windows must be >= 1")
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tie_cols or [])]
    base = Window.partitionBy(*key_cols).orderBy(*order)
    v = F.col(value_col)
    out = df
    for n in lags:
        out = out.withColumn(f"lag_{n}", F.lag(v, n).over(base))
    for w in windows:
        frame = base.rowsBetween(-(w - 1), Window.currentRow)
        out = (
            out.withColumn(f"roll_mean_{w}", F.round(F.avg(v).over(frame), 6))
            .withColumn(f"roll_min_{w}", F.min(v).over(frame))
            .withColumn(f"roll_max_{w}", F.max(v).over(frame))
        )
    return out


def ewma(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    tie_cols: list[str] | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average (adjust=False,
    pandas semantics): ewma_0 = x_0; ewma_t = alpha*x_t +
    (1-alpha)*ewma_{t-1}. The smoothing every monitoring/feature
    pipeline reaches for before a rolling mean's window size is even
    discussed.

    The recursion is inherently sequential per key -- the "built-in
    operators genuinely can't express it" case (a window-expression
    formulation needs (1-alpha)^(-i) weights that overflow past ~1e3
    rows) -- so the kernel is one ``applyInPandas`` per key: ONE hash
    shuffle on the key, a linear in-group scan with O(1) state. Memory
    bound: one key's rows per task (the same contract as every grouped
    kernel here; salt the key upstream if a single series exceeds
    executor memory).

    Determinism: the recursion fixes the float evaluation order given
    the (ts, tie_cols) sort, so results are partitioning-independent
    and bit-reproducible -- a DuckDB recursive CTE replaying the same
    ops hash-matches exactly. ``value_col`` must be non-NULL (filter or
    impute first; a NULL would poison every later step of its series).
    Output adds ``out_col`` rounded to 6 dp."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    from pyspark.sql.types import DoubleType, StructField, StructType

    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        _round_half_up_6,
    )

    order_cols = [ts_col, *(tie_cols or [])]
    # a fresh StructType: .add() would mutate the DataFrame's cached
    # schema object and desync it from the JVM plan
    schema_out = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        out = np.empty(len(vals))
        prev = np.nan
        for i, x in enumerate(vals):
            prev = x if i == 0 else alpha * x + (1.0 - alpha) * prev
            out[i] = prev
        # the shared HALF_UP rounder, not np.round: the DuckDB oracle's
        # round(e, 6) is ties-away-from-zero; np.round's half-to-even
        # would diverge on a .5-millionth boundary (the same latent
        # class as the ADVICE r9 quantizer finding). The streaming twin
        # (streaming/smoothing.py) rounds identically.
        pdf[out_col] = _round_half_up_6(out)
        return pdf

    return df.groupBy(*key_cols).applyInPandas(run, schema=schema_out)


def _arr_median(arr):
    """Exact median of an array expression (interpolated for even n),
    shared by the Hampel filter's two medians. Pure expressions: the
    per-row cost is one sort of the WINDOW (O(w log w)), never anything
    row-count-shaped."""
    s = F.array_sort(arr)
    n = F.size(s)
    mid = (n / 2).cast("int")
    odd = F.element_at(s, mid + 1)
    even = (F.element_at(s, mid) + F.element_at(s, mid + 1)) / 2.0
    return F.when(n % 2 == 1, odd).otherwise(even)


def hampel_outliers(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    half_window: int = 3,
    k: float = 3.0,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Hampel filter: per-key rolling-median/MAD outlier detection, the
    robust alternative to rolling z-scores (one wild point drags a mean
    and its stddev; it barely moves a median and its MAD).

    For each row, over the centered window of ``2*half_window + 1``
    rows: m = median(window), MAD = median(|x - m|), score =
    0.6745 * |v - m| / MAD (the Gaussian consistency constant), outlier
    when score > ``k``. Adds ``rolling_median``, ``hampel_score``
    (6 dp; NULL when MAD = 0 -- a flat window has no scale) and
    ``is_outlier``.

    One (key, time) window sort -- the same single shuffle any ordered
    rolling statistic needs; medians are array expressions over the
    collected window, O(w log w) per row with w a small constant.
    ``value_col`` must be non-NULL (collect_list drops NULLs, which
    would silently shrink windows; filter or impute first)."""
    if half_window < 1:
        raise ValueError("half_window must be >= 1")
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tie_cols or [])
    ]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(-half_window, half_window)
    )
    v = F.col(value_col).cast("double")
    arr = F.collect_list(v).over(w)
    out = df.withColumn("_win", arr)
    m = _arr_median(F.col("_win"))
    out = out.withColumn("rolling_median", m)
    mad = _arr_median(
        F.transform(F.col("_win"), lambda x: F.abs(x - F.col("rolling_median")))
    )
    # round(x*1e6)/1e6 instead of round(x, 6): Spark rounds via the
    # double's SHORTEST DECIMAL repr (BigDecimal.valueOf), DuckDB via
    # multiply -- for a score sitting one ulp under a .5 millionth
    # boundary (seen at sf0.001: 0.8031874999999999) the two disagree.
    # Rounding the IEEE product x*1e6, which both engines compute
    # bit-identically, removes the ambiguity; the oracle mirrors it.
    score = (
        F.round(F.lit(0.6745) * F.abs(v - F.col("rolling_median")) / mad * 1_000_000)
        .cast("bigint")
        .cast("double")
        / 1_000_000
    )
    return (
        out.withColumn("hampel_score", F.when(mad > 0, score))
        .withColumn(
            "is_outlier",
            F.coalesce(F.col("hampel_score") > F.lit(k), F.lit(False)),
        )
        .drop("_win")
    )


def acf(
    df: DataFrame,
    t_col: str,
    value_col: str,
    max_lag: int = 14,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sample autocorrelation function per series: (group_cols..., lag,
    n_pairs, acf) for lag = 1..max_lag, ordered by (group, lag) -- the
    seasonality/persistence probe run on a REGULAR series (compose with
    time_spine / an aggregate-per-bucket upstream; gaps in t silently
    shift lags, as in every ACF implementation).

    Estimator: r_k = sum_{t>k} (x_t - m)(x_{t-k} - m) / sum_t (x_t - m)^2
    with m the full-series mean -- the standard Box-Jenkins form. The
    implementation expands the products so every accumulated quantity
    (pair co-products, pair margins, totals) is an exact DECIMAL sum:
    one window sort per series materializes all max_lag lag columns in
    a single pass, one hash aggregate collects the sufficient
    statistics, and the only doubles are the final fixed-shape
    combination per lag, rounded to 6 dp. Shape: one sort shuffle on
    (group, t) + one group-sized aggregate + a max_lag-wide explode --
    max_lag is a constant, the series length never hits the driver.
    Each SERIES is one window partition (sequential by nature); scale
    comes from many series -- an ungrouped call puts the whole frame in
    one partition, so pre-aggregate to a bounded series first (the
    catalog entry runs on daily buckets). Lags with no pairs (series
    shorter than k+1) or a zero-variance series yield NULL acf."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    keys = list(group_cols or [])
    w = Window.partitionBy(*keys).orderBy(F.col(t_col))
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull()).select(*keys, F.col(t_col), x.alias("_x"))
    lagged = base.select(
        *keys,
        "_x",
        *[F.lag("_x", k).over(w).alias(f"_l{k}") for k in range(1, max_lag + 1)],
    )
    aggs = [
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("_x").cast("decimal(28,6)")).cast("double").alias("_sx"),
        F.sum((F.col("_x") * F.col("_x")).cast("decimal(38,10)"))
        .cast("double")
        .alias("_sxx"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"_l{k}")
        both = lk.isNotNull()
        aggs += [
            F.count(F.when(both, F.lit(1))).cast("bigint").alias(f"c_{k}"),
            F.sum((F.col("_x") * lk).cast("decimal(38,10)"))
            .cast("double")
            .alias(f"sxy_{k}"),
            F.sum(F.when(both, F.col("_x")).cast("decimal(28,6)"))
            .cast("double")
            .alias(f"sa_{k}"),
            F.sum(lk.cast("decimal(28,6)")).cast("double").alias(f"sb_{k}"),
        ]
    agg = (lagged.groupBy(*keys) if keys else lagged.groupBy()).agg(*aggs)
    m = F.col("_sx") / F.col("n")
    den = F.col("_sxx") - F.col("_sx") * F.col("_sx") / F.col("n")
    rows = []
    for k in range(1, max_lag + 1):
        num = (
            F.col(f"sxy_{k}")
            - m * (F.col(f"sa_{k}") + F.col(f"sb_{k}"))
            + F.col(f"c_{k}") * m * m
        )
        rows.append(
            F.struct(
                F.lit(k).cast("int").alias("lag"),
                F.col(f"c_{k}").alias("n_pairs"),
                F.round(
                    F.when((F.col(f"c_{k}") > 0) & (den > 0), num / den), 6
                ).alias("acf"),
            )
        )
    out = agg.select(*keys, F.explode(F.array(*rows)).alias("_r")).select(
        *keys, "_r.lag", "_r.n_pairs", "_r.acf"
    )
    return out.orderBy(*keys, "lag") if keys else out.orderBy("lag")


def seasonal_decompose(
    df: DataFrame,
    t_col: str,
    value_col: str,
    period: int = 7,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Additive moving-average seasonal decomposition per series:
    (group_cols..., t, value, trend, seasonal, resid) with

      trend    = centered moving average over ``period`` rows (odd
                 period required; NULL at the edges without a full
                 window),
      seasonal = mean detrended value of the row's phase (t mod
                 period), computed over rows where trend exists,
      resid    = value - trend - seasonal.

    ``t_col`` must be an INTEGER time index (epoch days/hours -- the
    caller's bucketing defines the cadence) on a dense series; value is
    integer-valued in the exactness contract below.

    Exactness: the windowed trend sum and the per-phase detrended sums
    stay INTEGER (trend*period and detrended*period are exact bigints);
    trend/seasonal/resid become doubles only in final fixed-shape
    divisions rounded to 6 dp, so any partitioning and a DuckDB window
    twin agree bit-exactly. Seasonal indices are the raw phase means
    (not re-centered: re-centering sums `period` doubles whose
    accumulation order the engine doesn't pin). Shape: one sort shuffle
    on (group, t) for the moving window, one phase-sized aggregate
    broadcast back -- series length never hits the driver. As with
    acf, one series = one window partition: pre-aggregate to a bounded
    cadence (daily/hourly buckets) before decomposing."""
    if period < 3 or period % 2 == 0:
        raise ValueError(f"period must be odd >= 3, got {period}")
    keys = list(group_cols or [])
    h = period // 2
    w = Window.partitionBy(*keys).orderBy("t").rowsBetween(-h, h)
    t_i = F.col(t_col).cast("bigint")
    v = F.col(value_col).cast("bigint")
    base = df.filter(v.isNotNull()).select(
        *keys, t_i.alias("t"), v.alias("value")
    )
    trended = base.select(
        *keys,
        "t",
        "value",
        F.when(
            F.count("*").over(w) == period, F.sum("value").over(w)
        ).alias("_tsum"),
    ).withColumn(
        "_det_p",  # detrended * period, exact bigint where trend exists
        (F.col("value") * period - F.col("_tsum")).cast("bigint"),
    )
    phase = F.pmod(F.col("t"), F.lit(period)).cast("int")
    ph = (
        trended.filter(F.col("_tsum").isNotNull())
        .groupBy(*keys, phase.alias("_ph"))
        .agg(
            F.sum("_det_p").cast("bigint").alias("_ps"),
            F.count("*").cast("bigint").alias("_pc"),
        )
    )
    joined = trended.withColumn("_ph", phase).join(
        F.broadcast(ph), [*keys, "_ph"], "left"
    )
    trend = F.col("_tsum").cast("double") / period
    seasonal = F.col("_ps").cast("double") / (F.col("_pc") * period).cast(
        "double"
    )
    return joined.select(
        *keys,
        "t",
        "value",
        F.round(trend, 6).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(
            F.when(
                F.col("_tsum").isNotNull() & F.col("_ps").isNotNull(),
                F.col("value") - trend - seasonal,
            ),
            6,
        ).alias("resid"),
    ).orderBy(*keys, "t")


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average per key over an IRREGULAR series:
    (key_cols..., n_obs, span_s, twa) where each observation's value
    holds until the next observation and twa = integral / span -- the
    correct "average position/price/level" when sampling is uneven (a
    plain AVG over-weights bursts of closely-spaced readings; TWAP is
    the market/telemetry standard). The last observation carries no
    weight (its holding interval is unobserved); keys with < 2
    observations yield NULL twa.

    Exactness: durations are integer seconds (lead over one sort
    window); value * duration accumulates as DECIMAL(38,6) -- exact
    under any partitioning -- and the single final division rounds to
    6 dp, so a DuckDB window twin hash-matches. One sort shuffle on
    (key, ts) + one hash aggregate. Simultaneous observations
    contribute zero-duration segments (ties are harmless; which of two
    equal-ts values "holds" for zero seconds is moot)."""
    from pyspark.sql.window import Window

    keys = [F.col(c) for c in key_cols]
    s = F.unix_timestamp(ts_col)
    v = F.col(value_col).cast("decimal(28,6)")
    base = df.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(*key_cols, s.alias("_s"), v.alias("_v"))
    w = Window.partitionBy(*keys).orderBy("_s", "_v")
    seg = base.select(
        *key_cols,
        "_v",
        (F.lead("_s", 1).over(w) - F.col("_s")).alias("_dur"),
    )
    agg = seg.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.sum("_dur").cast("bigint").alias("span_s"),
        F.sum(
            (F.col("_v") * F.col("_dur")).cast("decimal(38,6)")
        ).alias("_integral"),
    )
    return agg.select(
        *key_cols,
        "n_obs",
        F.coalesce(F.col("span_s"), F.lit(0)).cast("bigint").alias("span_s"),
        F.round(
            F.when(
                F.col("span_s") > 0,
                F.col("_integral").cast("double")
                / F.col("span_s").cast("double"),
            ),
            6,
        ).alias("twa"),
    ).orderBy(*key_cols)


def resample_interpolate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Regularize to a ``step`` grid with LINEAR interpolation between
    the neighboring observed buckets -- the smooth sibling of
    resample_locf (LOCF holds the last level; interpolation is right
    for continuously-varying measurements like temperature or price
    where a step function misstates the path). Returns (key_cols...,
    ts, value, is_filled); empty buckets get

        v = v_prev + (v_next - v_prev) * (t - t_prev) / (t_next - t_prev)

    evaluated on integer bucket indexes (exact), leading/trailing gaps
    (no neighbor on one side) stay NULL rather than extrapolate.
    Buckets with observations take the bucket MEAN (exact decimal sum /
    count). Same plan as LOCF: spine left-join + ONE (key, time) sort
    window carrying both directional neighbor lookups; 6-dp rounding,
    fully oracle-able."""
    trunc_unit = {"1 hour": "hour", "1 day": "day", "1 minute": "minute"}.get(step)
    if trunc_unit is None:
        raise ValueError(f"unsupported step {step!r}")
    step_s = {"hour": 3600, "day": 86400, "minute": 60}[trunc_unit]
    v = F.col(value_col).cast("decimal(28,6)")
    per_bucket = (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(
            *key_cols,
            F.date_trunc(trunc_unit, F.col(ts_col)).alias("_bucket"),
        )
        .agg(
            (F.sum(v).cast("double") / F.count("*")).alias("_obs")
        )
    )
    spine = time_spine(
        df.filter(F.col(ts_col).isNotNull()), key_cols, ts_col, step
    ).withColumnRenamed("ts", "_bucket")
    joined = spine.join(per_bucket, [*key_cols, "_bucket"], "left")
    keys = [F.col(c) for c in key_cols]
    idx = (F.unix_timestamp("_bucket") / step_s).cast("bigint")
    w = Window.partitionBy(*keys).orderBy("_bucket")
    w_prev = w.rowsBetween(Window.unboundedPreceding, 0)
    w_next = w.rowsBetween(0, Window.unboundedFollowing)
    prev = F.last(
        F.when(F.col("_obs").isNotNull(), F.struct(F.col("_obs").alias("v"), idx.alias("t"))),
        ignorenulls=True,
    ).over(w_prev)
    nxt = F.first(
        F.when(F.col("_obs").isNotNull(), F.struct(F.col("_obs").alias("v"), idx.alias("t"))),
        ignorenulls=True,
    ).over(w_next)
    interp = prev.getField("v") + (
        nxt.getField("v") - prev.getField("v")
    ) * (
        (idx - prev.getField("t")).cast("double")
        / (nxt.getField("t") - prev.getField("t")).cast("double")
    )
    filled = F.when(F.col("_obs").isNotNull(), F.col("_obs")).otherwise(
        F.when(prev.isNotNull() & nxt.isNotNull(), interp)
    )
    # round the scaled IEEE product, not the quotient: interpolated
    # values land on exact .5-millionths constantly (rational fractions
    # of tidy decimals), where round(x, 6) is engine-divergent in the
    # last digit (the Hampel lesson)
    value_6dp = F.round(filled * 1_000_000).cast("bigint") / F.lit(1e6)
    return joined.select(
        *key_cols,
        F.col("_bucket").alias(ts_col),
        value_6dp.alias("value"),
        F.col("_obs").isNull().alias("is_filled"),
    ).orderBy(*key_cols, ts_col)
