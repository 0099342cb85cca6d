"""Robust-statistics operators: percentile winsorization / outlier
clipping (SURVEY.md 2b extension surface). Not present in the reference
(its ingest drops rows by fixed business bounds, ``stg_trips.sql``-style
quality predicates); winsorizing is the standard complement when the
signal should be KEPT but bounded -- feature columns, reward scores,
per-doc quality metrics feeding a trainer that hates fat tails.

Plan shape: one hash aggregate computes the per-group clip thresholds
(exact ``percentile`` or ``percentile_approx``); the thresholds frame is
group-cardinality-sized, so it broadcast-joins back onto the scan and
the clip itself is a pure projection (least/greatest). Two scans of the
input total, no corpus-sized shuffle anywhere.

At 100 TB use ``exact=False``: ``percentile_approx`` is a mergeable
one-pass sketch (Greenwald-Khanna), while exact percentile materializes
each group's values. The exact mode exists for dim-sized groups and for
the DuckDB-twin correctness gate (interpolation matches quantile_cont,
cf. the price_percentiles catalog entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

APPROX_ACCURACY = 10_000  # percentile_approx relative-error knob


def _nullsafe_broadcast_join(
    df: DataFrame, small: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Broadcast-join ``small`` (one row per group) back onto ``df`` with
    NULL-safe key equality, preserving every input row.

    groupBy treats NULL keys as one ordinary cohort, but a plain equi-join
    back (``join(..., on=group_cols)``) silently drops those rows because
    NULL != NULL -- breaking the operators' row-preserving contract
    (ADVICE r5, medium). ``eqNullSafe`` keeps the NULL cohort matched, the
    same discipline as sampling.salted_hash's ``<null-id>`` sentinel."""
    if not group_cols:
        return df.crossJoin(F.broadcast(small))
    renamed = small.select(
        *[F.col(c).alias(f"__g_{c}") for c in group_cols],
        *[F.col(c) for c in small.columns if c not in group_cols],
    )
    cond = None
    for c in group_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
        cond = eq if cond is None else (cond & eq)
    return df.join(F.broadcast(renamed), cond, "left").drop(
        *[f"__g_{c}" for c in group_cols]
    )


def group_clip_bounds(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
    exact: bool = True,
) -> DataFrame:
    """(group_cols..., __lo, __hi): per-group winsorization thresholds.
    With no ``group_cols`` the output is a single global row."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    group_cols = group_cols or []
    v = F.col(value_col).cast("double")
    if exact:
        pcts = F.expr(
            f"percentile(CAST({value_col} AS DOUBLE), array({lower}D, {upper}D))"
        )
    else:
        pcts = F.percentile_approx(
            v, F.array(F.lit(lower), F.lit(upper)), F.lit(APPROX_ACCURACY)
        )
    agg = (
        df.groupBy(*group_cols) if group_cols else df.groupBy()
    ).agg(pcts.alias("_p"))
    return agg.select(
        *group_cols,
        F.col("_p")[0].alias("__lo"),
        F.col("_p")[1].alias("__hi"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
    exact: bool = True,
    out_col: str | None = None,
    flag: bool = False,
) -> DataFrame:
    """Clip ``value_col`` into its per-group [lower, upper] percentile
    range. The clipped value lands in ``out_col`` (default: replaces the
    column); ``flag=True`` adds ``__clip`` in {-1, 0, 1} for audit.

    NULL values stay NULL (a missing measurement is not an outlier).
    """
    group_cols = group_cols or []
    bounds = group_clip_bounds(df, value_col, group_cols, lower, upper, exact)
    joined = _nullsafe_broadcast_join(df, bounds, group_cols)
    v = F.col(value_col).cast("double")
    # Spark's least/greatest SKIP nulls (unlike SQL comparison), so an
    # unguarded clip would coerce NULL measurements to the lower bound.
    clipped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    )
    out = joined
    if flag:
        # flag BEFORE the clip projection: when out_col is None the clip
        # replaces value_col, and a flag computed afterwards would read
        # the already-clipped value (always 0)
        out = out.withColumn(
            "__clip",
            F.when(v < F.col("__lo"), F.lit(-1))
            .when(v > F.col("__hi"), F.lit(1))
            .otherwise(F.lit(0)),
        )
    out = out.withColumn(out_col or value_col, clipped)
    return out.drop("__lo", "__hi")


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Per-group clip audit + robust mean: (group_cols..., n, n_clip_lo,
    n_clip_hi, mean_winsorized). Deterministic: the winsorized mean is a
    decimal-exact sum of 6-dp-rounded clipped values divided once, so
    the result hash-matches a SQL twin under any partitioning."""
    w = winsorize(df, value_col, group_cols, lower, upper, exact=True,
                  out_col="__wv", flag=True)
    wv6 = F.round(F.col("__wv"), 6)
    return (
        w.groupBy(*group_cols)
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("__clip") == -1).cast("long")).alias("n_clip_lo"),
            F.sum((F.col("__clip") == 1).cast("long")).alias("n_clip_hi"),
            F.round(
                F.sum(wv6.cast("decimal(28,6)")).cast("double") / F.count("__wv"), 6
            ).alias("mean_winsorized"),
        )
        .orderBy(*group_cols)
    )


def zscore_flag(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    threshold: float = 3.0,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score + outlier flag: adds ``out_col`` (rounded to
    6 dp) and ``is_outlier`` (|z| > threshold, evaluated on the ROUNDED
    score so engines agree at the boundary).

    Determinism: group mean/variance come from EXACT decimal sums of x
    and x^2 (order-independent under any partitioning), combined in one
    fixed double expression -- the same discipline as dec_sum/dec_avg.
    Variance is the textbook (sum_x2 - sum_x^2/n)/(n-1); with 2-dp
    inputs the decimal sums are exact, so the subtraction cancellation
    that makes this formula dangerous in floating point cannot occur
    before the final double arithmetic.

    Plan: one group-sized aggregate, broadcast back onto the scan, then
    a projection -- identical shape to :func:`winsorize`. Groups with
    n < 2 or zero variance get NULL z-scores (flag false), not a
    divide-by-zero.
    """
    group_cols = group_cols or []
    v = F.col(value_col).cast("double")
    sx = F.sum(v.cast("decimal(28,6)")).cast("double")
    sx2 = F.sum((v * v).cast("decimal(38,10)")).cast("double")
    n = F.count(v)
    stats = (
        (df.groupBy(*group_cols) if group_cols else df.groupBy())
        .agg(sx.alias("_sx"), sx2.alias("_sx2"), n.alias("_n"))
        .withColumn("__mean", F.col("_sx") / F.col("_n"))
        .withColumn(
            "__var",
            F.when(
                F.col("_n") >= 2,
                (F.col("_sx2") - F.col("_sx") * F.col("_sx") / F.col("_n"))
                / (F.col("_n") - 1),
            ),
        )
        .select(*group_cols, "__mean", "__var")
    )
    joined = _nullsafe_broadcast_join(df, stats, group_cols)
    z = F.round((v - F.col("__mean")) / F.sqrt(F.col("__var")), 6)
    z = F.when(F.col("__var") > 0, z)  # zero-variance group -> NULL
    return (
        joined.withColumn(out_col, z)
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col(out_col)) > threshold, F.lit(False)),
        )
        .drop("__mean", "__var")
    )


def percentile_rank_blend(
    df: DataFrame,
    signals: list[tuple[str, float, bool]],
    group_cols: list[str] | None = None,
    out_col: str = "quality_blend",
    exact: bool = True,
    approx_bins: int = 1000,
) -> DataFrame:
    """Scale-free multi-signal quality ensemble: percent-rank each
    signal, blend by weight. ``signals`` is (col, weight,
    higher_is_better); the blend is round(sum(w_i * pr_i) / sum(w), 6)
    in [0, 1] -- the FineWeb-style recipe for combining incommensurable
    quality scores (length, repetition, LM score, ...) without
    hand-tuned thresholds, feeding select_quality_mass / a top-fraction
    filter.

    Signals must be non-NULL (rank of a missing measurement is
    undefined; impute or filter first -- engines disagree on NULL sort
    placement, so the operator refuses to guess).

    ``exact=True``: one window sort per signal (per group). A global
    exact percent_rank is a single-partition sort -- fine for
    dim/result-sized frames, wrong for a corpus. ``exact=False`` is the
    100 TB path: ranks come from each signal's Greenwald-Khanna
    quantile sketch (``approx_bins`` boundaries, mergeable one-pass),
    so the plan is one aggregate + a broadcast-back projection --
    no sort, no window, error 1/approx_bins in rank units.
    """
    if not signals:
        raise ValueError("need at least one signal")
    total_w = float(sum(w for _, w, _ in signals))
    if total_w <= 0:
        raise ValueError("weights must sum positive")
    group_cols = group_cols or []
    out = df
    rank_cols = []
    if exact:
        from pyspark.sql import Window

        base = (
            Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
        )
        for col, _w, hib in signals:
            order = base.orderBy(
                F.col(col).asc() if hib else F.col(col).desc()
            )
            rc = f"__pr_{col}"
            out = out.withColumn(rc, F.percent_rank().over(order))
            rank_cols.append(rc)
    else:
        # per-signal quantile grid via the percentile_approx sketch on
        # the group aggregate, broadcast back; rank = fraction of grid
        # boundaries the value beats (in the better direction)
        probs = [i / approx_bins for i in range(1, approx_bins)]
        for col, _w, hib in signals:
            grid = (
                (df.groupBy(*group_cols) if group_cols else df.groupBy())
                .agg(
                    F.percentile_approx(
                        F.col(col).cast("double"),
                        F.array(*[F.lit(p) for p in probs]),
                        F.lit(APPROX_ACCURACY),
                    ).alias(f"__grid_{col}")
                )
            )
            out = _nullsafe_broadcast_join(out, grid, group_cols)
            v = F.col(col).cast("double")

            def _beats_fn(_v, _hib):
                # closure factory: pyspark reads the lambda's arity, so
                # captured values must not appear as default args
                return lambda acc, b: acc + ((_v > b) if _hib else (_v < b)).cast("int")

            _beats = _beats_fn(v, hib)
            rc = f"__pr_{col}"
            out = out.withColumn(
                rc,
                F.aggregate(F.col(f"__grid_{col}"), F.lit(0), _beats)
                .cast("double")
                / (approx_bins - 1),
            ).drop(f"__grid_{col}")
            rank_cols.append(rc)
    blend = sum(
        F.col(rc) * F.lit(float(w)) for rc, (_c, w, _h) in zip(rank_cols, signals)
    ) / F.lit(total_w)
    return out.withColumn(out_col, F.round(blend, 6)).drop(*rank_cols)


def weighted_percentile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    p: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group lower weighted percentile: the smallest value whose
    running weight mass reaches ``p`` of the group total (the inventory/
    token-mass quantile -- "the doc-length below which p of the TOKENS
    sit", not p of the documents). Exact decimal mass accumulation, so
    the cut is order-independent and engine-portable (same discipline
    as sampling.select_quality_mass). One per-group ordered window.

    NULL weights count as zero mass; NULL values sort last and can only
    be selected when p=1 lands on them with zero-mass tails -- pass
    clean values for meaningful results."""
    if not 0.0 < p <= 1.0:
        raise ValueError(f"need 0 < p <= 1, got {p}")
    from pyspark.sql import Window

    group_cols = group_cols or []
    wdec = F.coalesce(
        F.col(weight_col).cast("decimal(28,6)"), F.lit(0).cast("decimal(28,6)")
    )
    part = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    order = part.orderBy(F.asc_nulls_last(value_col))
    running = F.sum(wdec).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum(wdec).over(part)
    hit = (
        df.withColumn("_run", running)
        .withColumn("_tot", total)
        .filter(F.col("_run") >= F.col("_tot") * F.lit(p))
    )
    w_first = Window.partitionBy(*group_cols).orderBy(
        F.asc_nulls_last(value_col)
    ) if group_cols else Window.partitionBy().orderBy(F.asc_nulls_last(value_col))
    return (
        hit.withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .select(
            *group_cols,
            F.col(value_col).cast("double").alias(f"wp_{value_col}"),
        )
    )


def impute_group_median(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
    exact: bool = True,
    flag: bool = False,
) -> DataFrame:
    """Fill NULL ``value_col`` with the group's median (exact
    PERCENTILE_CONT or the GK sketch) -- the repair twin of
    :func:`winsorize`: same broadcast-back plan (one group-sized
    aggregate, NULL-safe join, projection). A group whose values are ALL
    NULL has no median and its rows stay NULL. ``flag=True`` adds
    ``__imputed``."""
    group_cols = group_cols or []
    v = F.col(value_col).cast("double")
    if exact:
        med = F.expr(f"percentile(CAST({value_col} AS DOUBLE), 0.5D)")
    else:
        med = F.percentile_approx(v, F.lit(0.5), F.lit(APPROX_ACCURACY))
    stats = (df.groupBy(*group_cols) if group_cols else df.groupBy()).agg(
        med.alias("__med")
    )
    joined = _nullsafe_broadcast_join(df, stats, group_cols)
    out = joined
    if flag:
        out = out.withColumn(
            "__imputed", v.isNull() & F.col("__med").isNotNull()
        )
    return out.withColumn(
        out_col or value_col, F.coalesce(v, F.col("__med"))
    ).drop("__med")


def quantile_normalize(
    df: DataFrame,
    score_col: str,
    source_col: str,
    id_col: str,
) -> DataFrame:
    """CDF-match every source's score distribution onto the GLOBAL
    distribution: each row's ``norm_score`` is the global score found at
    the same quantile position its score occupies within its source.
    The cross-source blending primitive -- per-source quality scores
    (different scorers, different scales) become directly comparable
    without assuming normality (contrast zscore_flag).

    Method (exact nearest-rank, fully deterministic):
      r   = rank of the row within its source by (score, id)
      pr  = (r - 1) / (n_source - 1)            (0.5 for singletons)
      j   = round(pr * (N - 1)) + 1             (global target position)
      norm_score = global score at position j by the same (score, id)
                   order
    Rows with a NULL score are excluded.

    100 TB shape: the per-source rank is a source-partitioned window;
    the GLOBAL position index never sorts the data in one partition --
    it is per-score offsets (window over distinct scores) + a
    score-partitioned row_number, the same machinery as
    evalmetrics.decile_lift; the final lookup is one equi-join on the
    integer position. Ceiling: the offset window is one task sized by
    the DISTINCT score count; a near-unique continuous score makes it
    row-sized -- quantize scores first at that scale (document lengths
    here have a bounded grid)."""
    from pyspark.sql import Window

    base = df.filter(
        F.col(score_col).isNotNull()
    )
    w_src = Window.partitionBy(source_col).orderBy(score_col, id_col)
    n_src = Window.partitionBy(source_col)
    ranked = base.withColumn("_r", F.row_number().over(w_src)).withColumn(
        "_ns", F.count(F.lit(1)).over(n_src)
    )
    # global position: per-score offsets + score-partitioned tiebreak
    per_score = base.groupBy(F.col(score_col).alias("_s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    w_off = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_score.select(
        "_s", F.coalesce(F.sum("_c").over(w_off), F.lit(0).cast("bigint")).alias("_off")
    )
    w_tie = Window.partitionBy("_s").orderBy("_gid")
    glob = (
        base.select(F.col(score_col).alias("_s"), F.col(id_col).alias("_gid"))
        .join(offsets, "_s")
        .select(
            (F.col("_off") + F.row_number().over(w_tie)).alias("_pos"),
            F.col("_s").alias("_gval"),
        )
    )
    total = base.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    pr = F.when(
        F.col("_ns") > 1,
        (F.col("_r") - 1).cast("double") / (F.col("_ns") - 1),
    ).otherwise(F.lit(0.5))
    j = (F.round(pr * (F.col("_n") - 1)) + 1).cast("bigint")
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("_j", j)
        .join(glob, F.col("_j") == F.col("_pos"))
        .select(
            *[c for c in df.columns],
            F.col("_gval").alias("norm_score"),
        )
    )


def global_rank_bucketed(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact global 1-based position of every row under the total order
    (value asc, id asc) -- WITHOUT any single-task stage: the rank
    machinery's answer for near-unique continuous columns, where the
    per-distinct-value offset trick (quantile_normalize above,
    stats.mannwhitney_u, evalmetrics.binary_auc) degrades to a row-sized
    one-partition window.

    Shape: (1) one broadcast 1-row (min, max) aggregate derives
    ``n_buckets`` equi-width value buckets -- any MONOTONE bucketing
    yields identical positions, so float boundary wobble is harmless by
    construction; (2) per-bucket counts (bucket-count-sized frame, bound
    chosen by the caller) feed the cumulative-offset window; (3) a
    bucket-PARTITIONED row_number orders within buckets in parallel;
    position = offset + in-bucket rank. Every row-sized stage is
    hash-partitioned; the only unpartitioned window runs on <=
    ``n_buckets`` rows no matter the input size. Skewed value
    distributions concentrate rows in few buckets -- raise n_buckets or
    pre-transform (log) the value; the result is invariant either way.

    Returns the input columns plus ``pos`` (bigint). NULL and NaN
    values are excluded (no position). The positions equal the naive
    ``row_number() OVER (ORDER BY value, id)`` bit-for-bit -- that
    naive form IS the DuckDB oracle of the catalog entry
    (scalable_rank_positions), so the scale-shaped plan is
    hash-verified against the single-sort semantics."""
    from pyspark.sql import Window

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    v = F.col(value_col).cast("double")
    # NaN is excluded like NULL: Spark's max() ranks NaN largest, so a
    # single NaN row would make _hi = NaN -> every bucket expression
    # NaN -> ALL rows collapse into one bucket, silently reinstating
    # the corpus-sized single-task window this operator exists to
    # avoid (positions would still be right; the scale invariant not)
    base = df.filter(v.isNotNull() & ~F.isnan(v))
    rng = base.agg(F.min(v).alias("_lo"), F.max(v).alias("_hi"))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_buckets))
    bkt = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((v - F.col("_lo")) / width).cast("int"),
        )
    )
    b = base.crossJoin(F.broadcast(rng)).withColumn("_bkt", bkt)
    counts = b.groupBy("_bkt").agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "_bkt",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0).cast("bigint")).alias("_off"),
    )
    w_in = Window.partitionBy("_bkt").orderBy(v.asc(), F.col(id_col).asc())
    return (
        b.join(offs, "_bkt")
        .withColumn("pos", F.col("_off") + F.row_number().over(w_in))
        .drop("_bkt", "_lo", "_hi")
    )
