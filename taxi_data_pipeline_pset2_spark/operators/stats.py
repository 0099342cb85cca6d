"""Grouped closed-form statistics: per-group simple linear regression
(trend lines at scale). Not in the reference (its analytics stop at
AVG/percentiles); the standard next question over any fact table is
"what's the trend per segment", and the closed form makes it a single
hash aggregate -- no ML library, no iteration.

Determinism: all five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
EXACT decimal sums (order-independent under any partitioning -- the
dec_sum discipline), combined in one fixed double expression and
rounded to 6 dp, so results hash-match a DuckDB twin bit-exactly.

100 TB shape: one partial+final hash aggregate over (group_cols);
output is group-cardinality-sized. Nothing else."""

from __future__ import annotations

from collections.abc import Sequence as _Seq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_linreg(
    df: DataFrame,
    x_col,
    y_col,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group_cols..., n, slope, intercept, r2): least-squares line of
    ``y_col`` on ``x_col`` per group, 6-dp rounded. Groups with n < 2
    or zero x-variance get NULL slope/intercept/r2. ``x_col``/``y_col``
    accept column names or Column expressions (e.g. a date cast to epoch
    days)."""
    group_cols = group_cols or []
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    both = x.isNotNull() & y.isNotNull()
    xd = F.when(both, x).cast("decimal(28,6)")
    yd = F.when(both, y).cast("decimal(28,6)")
    agg = (df.groupBy(*group_cols) if group_cols else df.groupBy()).agg(
        F.count(F.when(both, F.lit(1))).cast("bigint").alias("n"),
        F.sum(xd).cast("double").alias("_sx"),
        F.sum(yd).cast("double").alias("_sy"),
        F.sum((F.when(both, x * y)).cast("decimal(38,10)")).cast("double").alias("_sxy"),
        F.sum((F.when(both, x * x)).cast("decimal(38,10)")).cast("double").alias("_sxx"),
        F.sum((F.when(both, y * y)).cast("decimal(38,10)")).cast("double").alias("_syy"),
    )
    n = F.col("n")
    den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den
    intercept = (F.col("_sy") - slope * F.col("_sx")) / n
    sst = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    r2 = F.when(sst > 0, (n * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
                * (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / (den * sst))
    ok = (n >= 2) & (den > 0)
    return agg.select(
        *group_cols,
        "n",
        F.round(F.when(ok, slope), 6).alias("slope"),
        F.round(F.when(ok, intercept), 6).alias("intercept"),
        F.round(F.when(ok, r2), 6).alias("r2"),
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns in ONE pass:
    (col_a, col_b, n, corr) for every a < b pair -- the numeric
    feature-redundancy screen next to cramers_v (categorical). Rows
    with a NULL in either column of a pair are excluded from that
    pair's statistics (pairwise deletion).

    One hash aggregate computes all sufficient statistics (the
    dec_sum discipline: exact decimal sums, order-independent); the
    pair table is assembled from the single aggregate row -- k columns
    cost one scan, never k^2 scans. corr is NULL when either variance
    is zero."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError("duplicate column names")
    aggs = []
    for i, a in enumerate(cols):
        for j in range(i + 1, len(cols)):
            b = cols[j]
            x = F.col(a).cast("double")
            y = F.col(b).cast("double")
            both = x.isNotNull() & y.isNotNull()
            tag = f"{i}_{j}"
            aggs += [
                F.count(F.when(both, F.lit(1))).cast("bigint").alias(f"n_{tag}"),
                F.sum(F.when(both, x).cast("decimal(28,6)")).cast("double").alias(f"sx_{tag}"),
                F.sum(F.when(both, y).cast("decimal(28,6)")).cast("double").alias(f"sy_{tag}"),
                F.sum(F.when(both, x * y).cast("decimal(38,10)")).cast("double").alias(f"sxy_{tag}"),
                F.sum(F.when(both, x * x).cast("decimal(38,10)")).cast("double").alias(f"sxx_{tag}"),
                F.sum(F.when(both, y * y).cast("decimal(38,10)")).cast("double").alias(f"syy_{tag}"),
            ]
    row = df.agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for j in range(i + 1, len(cols)):
            b = cols[j]
            tag = f"{i}_{j}"
            n = F.col(f"n_{tag}")
            num = n * F.col(f"sxy_{tag}") - F.col(f"sx_{tag}") * F.col(f"sy_{tag}")
            vx = n * F.col(f"sxx_{tag}") - F.col(f"sx_{tag}") * F.col(f"sx_{tag}")
            vy = n * F.col(f"syy_{tag}") - F.col(f"sy_{tag}") * F.col(f"sy_{tag}")
            corr = F.when((vx > 0) & (vy > 0), num / F.sqrt(vx * vy))
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    n.alias("n"),
                    F.round(corr, 6).alias("corr"),
                )
            )
    return row.select(F.explode(F.array(*pairs)).alias("p")).select(
        "p.col_a", "p.col_b", "p.n", "p.corr"
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """One-row MI audit: (n, mi, nmi) for two categorical columns --
    MI = sum p_ij * ln(p_ij / (p_i p_j)) in nats, the
    association-strength screen that, unlike chi-square, reads directly
    as information content; nmi normalizes by sqrt(H_a * H_b)
    (NULL when either entropy is zero). NULL categories are legitimate
    cohorts (same contract as cramers_v).

    Same plan shape as cramers_v: one contingency aggregate + two
    marginals, broadcast-sized joins, per-cell contributions rounded to
    integer millionths and summed (partitioning-independent). Zero
    cells contribute 0 by the p log p convention -- they simply never
    appear in the contingency frame."""
    cells = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count("*").cast("bigint").alias("o"))
    ra = cells.groupBy(F.col("_a").alias("_ga")).agg(F.sum("o").alias("na"))
    cb = cells.groupBy(F.col("_b").alias("_gb")).agg(F.sum("o").alias("nb"))
    tot = cells.agg(F.sum("o").alias("n"))
    j = (
        cells.join(F.broadcast(ra), F.col("_a").eqNullSafe(F.col("_ga")))
        .join(F.broadcast(cb), F.col("_b").eqNullSafe(F.col("_gb")))
        .crossJoin(F.broadcast(tot))
    )
    pij = F.col("o") / F.col("n")
    ratio = (F.col("o").cast("double") * F.col("n")) / (
        F.col("na").cast("double") * F.col("nb")
    )
    mi_m = F.round(pij * F.log(ratio) * 1_000_000).cast("bigint")
    # marginal entropies for the normalization
    ha = ra.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.round(
                -(F.col("na") / F.col("n")) * F.log(F.col("na") / F.col("n"))
                * 1_000_000
            ).cast("bigint")
        ).alias("ham")
    )
    hb = cb.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.round(
                -(F.col("nb") / F.col("n")) * F.log(F.col("nb") / F.col("n"))
                * 1_000_000
            ).cast("bigint")
        ).alias("hbm")
    )
    agg = j.agg(F.first("n").alias("n"), F.sum(mi_m).alias("_mi_m"))
    mi = F.col("_mi_m").cast("double") / 1_000_000
    out = agg.crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
    denom = F.sqrt(
        (F.col("ham").cast("double") / 1_000_000)
        * (F.col("hbm").cast("double") / 1_000_000)
    )
    return out.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(mi, 6).alias("mi"),
        F.round(F.when(denom > 0, mi / denom), 6).alias("nmi"),
    )


# Poisson(1) inverse-CDF thresholds (cumulative e^-1 * 1/k!), written as
# full-precision literals so Spark and any SQL twin evaluate the SAME
# doubles. Counts above 6 are clamped (P ~ 1e-4 at lambda=1).
POISSON1_CUM = (
    0.36787944117144233,
    0.7357588823428847,
    0.919698602928606,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    id_col: str = "doc_id",
    n_boot: int = 40,
    alpha: float = 0.05,
    salt: str = "boot-v1",
    scale: int = 6,
) -> DataFrame:
    """(group_cols..., n, mean, ci_lo, ci_hi): percentile bootstrap CI
    for the per-group mean of ``value_col``, via the DETERMINISTIC
    Poisson bootstrap -- replicate b weights each row by a Poisson(1)
    count derived from hash(id, salt, b), so the whole procedure is
    one pass, order-independent, and reproducible across engines (no
    RNG state, no resample shuffle; Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams", Google 2012 -- the standard
    way to bootstrap data too large to resample).

    Engineered hot path (profiled at sf0.1: 26 s naive -> ~2.5 s):
    - The replicate dimension is EXPLODED INTO ROWS, not spread across
      n_boot aggregate columns (a wide-column draft spent ~11 s per
      run on its ~160-expression tree, with CASE chains re-evaluating
      md5 per branch once codegen gave up). Two posexplodes keep the
      expression tree O(1); the partial aggregate collapses the
      n_boot-fold multiplication to (groups x n_boot) keys per
      partition before any shuffle.
    - Each md5 yields EIGHT 16-bit uniforms (4 hex chars each):
      replicate b = 8g + c reads chunk c of md5(id|salt|g) -- n_boot/8
      hashes per row. Poisson thresholds are compared as 4-char HEX
      STRING literals (byte-wise comparison == numeric comparison for
      lowercase hex in Spark and any SQL engine), so no integer
      conversion runs per chunk. Threshold quantization at 2^-16
      perturbs the Poisson pmf by < 1.6e-5 -- irrelevant to a CI.
    - Replicate sums accumulate BIGINT over round(value * 10^scale):
      long arithmetic, no decimal boxing on the n_boot-fold rows.
      Bound: n_group * 6 * max|value| * 10^scale < 9.2e18 (scale=2
      money: ~1e10 rows/group). The headline ``mean`` still comes from
      an exact DECIMAL(18,6) sum over the UN-exploded base (a second,
      column-pruned scan -- cheaper than dragging decimals through the
      explosion).

    ci_lo/ci_hi are the alpha/2 / 1-alpha/2 percentile replicate means
    (nearest-rank on floor/ceil, from the sorted per-group array);
    replicates that draw an empty resample (possible only for tiny
    groups) are dropped from the percentile array."""
    if n_boot < 2:
        raise ValueError("n_boot must be >= 2")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha in (0, 1)")
    group_cols = group_cols or []
    v = F.col(value_col).cast("double")
    # The n_boot-fold explode + per-replicate md5 below is the heavy
    # per-row work; an under-partitioned source (one parquet split)
    # would run it on one core while the rest idle. spread_small_input
    # is a no-op whenever the scan already carries enough partitions
    # (every real table at 100 TB) -- measured 2.2 s -> 0.6 s at sf0.1
    # (guide section 2.5, input skew).
    from taxi_data_pipeline_pset2_spark.operators.skew import (
        spread_small_input,
    )

    base = spread_small_input(
        df.filter(v.isNotNull()).select(
            *group_cols, v.alias("_v"), F.col(id_col).alias("_id")
        ),
        key_cols=["_id"],
    )
    n_hash = (n_boot + 7) // 8
    id_str = F.coalesce(F.col("_id").cast("string"), F.lit("<null-id>"))
    thresholds = [format(int(round(c * 65536)), "04x") for c in POISSON1_CUM]
    v_int = F.round(F.col("_v") * F.lit(float(10**scale))).cast("bigint")
    hexes = base.select(
        *group_cols,
        v_int.alias("_vi"),
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat(id_str, F.lit(f"|{salt}|{g}")))
                    for g in range(n_hash)
                ]
            )
        ).alias("_g", "_hx"),
    )
    chunks = hexes.select(
        *group_cols,
        "_vi",
        "_g",
        F.posexplode(
            F.array(*[F.substring("_hx", 4 * c + 1, 4) for c in range(8)])
        ).alias("_c", "_ch"),
    )
    if n_boot % 8:
        chunks = chunks.filter(F.col("_g") * 8 + F.col("_c") < n_boot)
    w = F.lit(6)
    for k in range(len(thresholds) - 1, -1, -1):
        w = F.when(F.col("_ch") < thresholds[k], F.lit(k)).otherwise(w)
    rep = chunks.select(
        *group_cols,
        "_vi",
        (F.col("_g") * 8 + F.col("_c")).alias("_b"),
        w.alias("_w"),
    )
    perb = rep.groupBy(*group_cols, "_b").agg(
        F.sum(F.col("_w") * F.col("_vi")).alias("_si"),
        F.sum("_w").cast("bigint").alias("_c"),
    )
    # collect_list drops the NULL means of empty resamples; array_sort
    # then makes the (otherwise nondeterministic) order canonical
    mean_b = F.when(
        F.col("_c") > 0,
        F.col("_si").cast("double") / F.col("_c") / F.lit(float(10**scale)),
    )
    agg = (perb.groupBy(*group_cols) if group_cols else perb.groupBy()).agg(
        F.array_sort(F.collect_list(mean_b)).alias("_m"),
    )
    side = (base.groupBy(*group_cols) if group_cols else base.groupBy()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("_v").cast("decimal(18,6)")).cast("double").alias("_sv"),
    )
    joined = (
        agg.join(F.broadcast(side), group_cols)
        if group_cols
        else agg.crossJoin(F.broadcast(side))
    )
    size = F.size("_m")
    lo_i = F.floor(F.lit(alpha / 2.0) * (size - 1)).cast("int") + 1
    hi_i = F.ceil(F.lit(1.0 - alpha / 2.0) * (size - 1)).cast("int") + 1
    return joined.select(
        *group_cols,
        "n",
        F.round(F.col("_sv") / F.col("n"), 6).alias("mean"),
        F.round(F.element_at("_m", lo_i), 6).alias("ci_lo"),
        F.round(F.element_at("_m", hi_i), 6).alias("ci_hi"),
    )


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """One-row Welch two-sample t-test comparing ``value_col`` between
    ``group_a`` and ``group_b`` of ``group_col``: (n_a, n_b, mean_a,
    mean_b, mean_diff, t_stat, df) with the Welch-Satterthwaite degrees
    of freedom. The unequal-variance default (never pooled): the A/B
    primitive next to poisson_bootstrap_ci's nonparametric CI.

    The five sufficient statistics per group are exact decimal sums
    (dec_sum discipline), combined in one fixed double expression and
    rounded to 6 dp. Sample variance uses the n-1 denominator; groups
    with n < 2 or zero variance yield NULL t/df."""
    v = F.col(value_col).cast("double")
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b
    base = df.filter(v.isNotNull() & (in_a | in_b))

    def side(cond, tag: str):
        return [
            F.count(F.when(cond, F.lit(1))).cast("bigint").alias(f"n_{tag}"),
            F.sum(F.when(cond, v).cast("decimal(28,6)")).cast("double").alias(f"_s{tag}"),
            F.sum(F.when(cond, v * v).cast("decimal(38,10)")).cast("double").alias(f"_q{tag}"),
        ]

    agg = base.agg(*side(in_a, "a"), *side(in_b, "b"))
    na, nb = F.col("n_a"), F.col("n_b")
    ma = F.col("_sa") / na
    mb = F.col("_sb") / nb
    va = (F.col("_qa") - F.col("_sa") * F.col("_sa") / na) / (na - 1)
    vb = (F.col("_qb") - F.col("_sb") * F.col("_sb") / nb) / (nb - 1)
    sea = va / na
    seb = vb / nb
    se2 = sea + seb
    t = (ma - mb) / F.sqrt(se2)
    dof = (se2 * se2) / (
        sea * sea / (na - 1) + seb * seb / (nb - 1)
    )
    ok = (na >= 2) & (nb >= 2) & (se2 > 0)
    return agg.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(ma - mb, 6).alias("mean_diff"),
        F.round(F.when(ok, t), 6).alias("t_stat"),
        F.round(F.when(ok, dof), 6).alias("df"),
    )


def mannwhitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """One-row tie-corrected Mann-Whitney U test comparing
    ``value_col`` between two groups: (n_a, n_b, u_a, auc, z). The
    rank-based nonparametric A/B companion to welch_ttest (no normality
    assumption; exactly the machinery behind evalmetrics.binary_auc:
    u_a = auc * n_a * n_b).

    z uses the normal approximation with the tie-corrected variance
        var = n_a*n_b/12 * ((N + 1) - sum(t^3 - t) / (N * (N - 1)))
    (t = per-distinct-value count across both groups), NO continuity
    correction. All sufficient statistics are exact integers
    accumulated in DECIMAL(38,0); z is NULL when the variance is 0
    (every value tied).

    Plan shape: one hash aggregate to per-distinct-value counts, one
    window over distinct values, one final reduce. Ceiling: the offset
    window is unpartitioned, i.e. a single task sized by the DISTINCT
    value count -- fine for binned/categorical/price-grid values, but a
    near-unique continuous column makes that frame row-sized; at that
    scale quantize the value first (the test's price column has a
    bounded distinct grid, so the frame stays far under it)."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b
    base = df.filter(v.isNotNull() & (in_a | in_b))
    per = base.groupBy(v.alias("_s")).agg(
        F.count(F.when(in_a, F.lit(1))).cast("bigint").alias("_p"),
        F.count(F.when(in_b, F.lit(1))).cast("bigint").alias("_q"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    cum_below = F.coalesce(F.sum("_q").over(w), F.lit(0).cast("bigint"))
    num2 = (
        F.col("_p").cast("decimal(38,0)")
        * (F.lit(2) * cum_below + F.col("_q")).cast("decimal(38,0)")
    )
    # cube in DECIMAL: a value tied across > 2^21 rows makes the bigint
    # t^3 overflow (ANSI throw / silent wrap) before the cast lands
    t_tot = (F.col("_p") + F.col("_q")).cast("decimal(38,0)")
    ties = t_tot * t_tot * t_tot - t_tot
    agg = per.select("_p", "_q", num2.alias("_n2"), ties.alias("_t3")).agg(
        F.sum("_p").cast("bigint").alias("n_a"),
        F.sum("_q").cast("bigint").alias("n_b"),
        F.sum("_n2").alias("_num2"),
        F.sum("_t3").alias("_ties"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    nn = na + nb
    u_a = F.col("_num2").cast("double") / 2.0
    # cast BEFORE multiplying (the binary_auc/search.py discipline):
    # bigint na*nb overflows once both sides exceed ~3e9 rows
    nanb = na.cast("double") * nb.cast("double")
    auc = F.col("_num2").cast("double") / (F.lit(2.0) * nanb)
    var = (
        nanb
        / 12.0
        * (
            (nn + 1).cast("double")
            - F.col("_ties").cast("double") / (nn.cast("double") * (nn - 1))
        )
    )
    z = (u_a - nanb / 2.0) / F.sqrt(var)
    ok = (na > 0) & (nb > 0) & (var > 0)
    return agg.select(
        "n_a",
        "n_b",
        F.round(u_a, 6).alias("u_a"),
        F.round(F.when((na > 0) & (nb > 0), auc), 6).alias("auc"),
        F.round(F.when(ok, z), 6).alias("z"),
    )


def cuped_adjusted_ttest(
    df: DataFrame,
    value_col: str,
    covariate_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """One-row CUPED-adjusted Welch t-test (Deng et al., WSDM 2013):
    (n_a, n_b, theta, mean_a_adj, mean_b_adj, mean_diff, var_reduction,
    t_stat, df). The experimentation workhorse at scale -- a
    pre-experiment covariate x (e.g. last month's metric) absorbs
    between-user variance: y_adj = y - theta * (x - mean(x)), theta =
    cov(x, y) / var(x) POOLED over both arms, then Welch on y_adj.
    var_reduction reports 1 - var(y_adj)/var(y) pooled (~rho^2).

    Everything reduces to the nine pooled/per-arm decimal sufficient
    statistics in ONE hash aggregate; theta and the adjusted moments
    are fixed double expressions over them, so the result is
    partitioning-independent and has an exact SQL twin. Rows with a
    NULL value or covariate are excluded. NULL t/df when either arm has
    n < 2, var(x) = 0, or the adjusted variance is 0."""
    y = F.col(value_col).cast("double")
    x = F.col(covariate_col).cast("double")
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b
    base = df.filter(
        y.isNotNull() & x.isNotNull() & (in_a | in_b)
    )

    def stats(cond, tag):
        return [
            F.count(F.when(cond, F.lit(1))).cast("bigint").alias(f"n_{tag}"),
            F.sum(F.when(cond, y).cast("decimal(28,6)")).cast("double").alias(f"_sy{tag}"),
            F.sum(F.when(cond, x).cast("decimal(28,6)")).cast("double").alias(f"_sx{tag}"),
            F.sum(F.when(cond, y * y).cast("decimal(38,10)")).cast("double").alias(f"_syy{tag}"),
            F.sum(F.when(cond, x * x).cast("decimal(38,10)")).cast("double").alias(f"_sxx{tag}"),
            F.sum(F.when(cond, x * y).cast("decimal(38,10)")).cast("double").alias(f"_sxy{tag}"),
        ]

    agg = base.agg(*stats(in_a, "a"), *stats(in_b, "b"))
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    sy = F.col("_sya") + F.col("_syb")
    sx = F.col("_sxa") + F.col("_sxb")
    syy = F.col("_syya") + F.col("_syyb")
    sxx = F.col("_sxxa") + F.col("_sxxb")
    sxy = F.col("_sxya") + F.col("_sxyb")
    # pooled (biased-normalization cancels in the ratio)
    cov_xy = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    # try_divide: degenerate inputs (empty arm, constant covariate) must
    # surface as NULLs via the `ok` guards below, not ANSI div-by-zero.
    theta = F.try_divide(cov_xy, var_x)
    xbar = F.try_divide(sx, n)
    # per-arm adjusted moments: y_adj = y - theta (x - xbar)
    def adj(tag):
        ni = F.col(f"n_{tag}")
        syi = F.col(f"_sy{tag}")
        sxi = F.col(f"_sx{tag}")
        mean_adj = F.try_divide(syi - theta * (sxi - ni * xbar), ni)
        # sum of y_adj^2 = syy - 2 theta (sxy - xbar sy)
        #                + theta^2 (sxx - 2 xbar sx + n xbar^2)
        ss_adj = (
            F.col(f"_syy{tag}")
            - 2 * theta * (F.col(f"_sxy{tag}") - xbar * syi)
            + theta * theta
            * (F.col(f"_sxx{tag}") - 2 * xbar * sxi + ni * xbar * xbar)
        )
        var_adj = F.try_divide(ss_adj - ni * mean_adj * mean_adj, ni - 1)
        return mean_adj, var_adj

    ma, va = adj("a")
    mb, vb = adj("b")
    sea = F.try_divide(va, na)
    seb = F.try_divide(vb, nb)
    se2 = sea + seb
    t = F.try_divide(ma - mb, F.sqrt(se2))
    dof = F.try_divide(
        se2 * se2,
        F.try_divide(sea * sea, na - 1) + F.try_divide(seb * seb, nb - 1),
    )
    var_adj_pooled = var_y - cov_xy * cov_xy * F.try_divide(F.lit(1.0), var_x)
    vr = F.lit(1.0) - F.try_divide(var_adj_pooled, var_y)
    ok = (na >= 2) & (nb >= 2) & (var_x > 0) & (se2 > 0)
    return agg.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        F.round(F.when(var_x > 0, theta), 6).alias("theta"),
        F.round(F.when(var_x > 0, ma), 6).alias("mean_a_adj"),
        F.round(F.when(var_x > 0, mb), 6).alias("mean_b_adj"),
        F.round(F.when(var_x > 0, ma - mb), 6).alias("mean_diff"),
        F.round(F.when((var_x > 0) & (var_y > 0), vr), 6).alias("var_reduction"),
        F.round(F.when(ok, t), 6).alias("t_stat"),
        F.round(F.when(ok, dof), 6).alias("df"),
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    group_cols: _Seq[str] = (),
) -> DataFrame:
    """Gini concentration coefficient per group: (group_cols..., n,
    total, gini), the standard inequality measure (0 = perfectly even,
    ->1 = one unit holds everything) over NON-NEGATIVE values --
    revenue concentration by segment, token-share concentration by
    source. Uses the rank identity

        G = (2 * sum(i * x_(i)) - (n + 1) * sum(x)) / (n * sum(x))

    with x_(i) ascending. One shuffle on the group key: a rank window
    pass, then a hash aggregate. Tied values may rank either way --
    the weighted sum is invariant under permuting equal values, so the
    result is still deterministic. Sums accumulate as DECIMAL; NULLs
    are excluded; groups with n=0 or total=0 emit NULL gini."""
    from pyspark.sql import Window

    keys = [F.col(c) for c in group_cols]
    x = F.col(value_col).cast("decimal(18,6)")
    base = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*keys).orderBy(F.asc(value_col))
    ranked = base.select(
        *group_cols,
        x.alias("_x"),
        F.row_number().over(w).cast("decimal(10,0)").alias("_i"),
    )
    agg = ranked.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("_x").cast("double").alias("_sx"),
        F.sum(F.col("_i") * F.col("_x")).cast("double").alias("_six"),
    )
    g = (
        2.0 * F.col("_six") - (F.col("n") + 1) * F.col("_sx")
    ) / (F.col("n") * F.col("_sx"))
    out = agg.select(
        *group_cols,
        "n",
        F.round(F.col("_sx"), 6).alias("total"),
        F.round(F.when(F.col("_sx") > 0, g), 6).alias("gini"),
    )
    return out.orderBy(*group_cols) if group_cols else out


def group_entropy(
    df: DataFrame,
    category_col: str,
    group_cols: _Seq[str] = (),
) -> DataFrame:
    """Shannon entropy of a categorical mix per group: (group_cols...,
    n, k, entropy, norm_entropy) with entropy = -sum p ln p (nats) and
    norm_entropy = entropy / ln(k) in [0, 1] (0 for single-category
    groups) -- the diversity gauge for source/language mixes a curation
    pipeline monitors next to PSI drift. NULL categories count as a
    legitimate category (same cohort stance as drift.py). Two hash
    aggregates (category-sized, then group-sized); per-category
    c*ln(c) terms round to integer millionths before summing (the
    lm_score discipline -- a raw double sum over an unordered hash
    aggregate is partitioning-dependent in its last ulp)."""
    keys = [F.col(c) for c in group_cols]
    counts = df.groupBy(
        *keys, F.col(category_col).alias("_cat")
    ).agg(F.count("*").alias("_c"))
    clogc_m = F.round(
        F.col("_c").cast("double")
        * F.log(F.col("_c").cast("double"))
        * 1_000_000
    ).cast("bigint")
    agg = counts.groupBy(*keys).agg(
        F.sum("_c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum(clogc_m).alias("_clogc_m"),
    )
    # -sum p ln p = ln n - (1/n) sum c ln c  (exact-count form: one ln
    # per category, no per-row p division)
    h = F.log(F.col("n").cast("double")) - (
        F.col("_clogc_m").cast("double") / 1_000_000
    ) / F.col("n")
    norm = F.when(F.col("k") > 1, h / F.log(F.col("k").cast("double"))).otherwise(
        F.lit(0.0)
    )
    out = agg.select(
        *group_cols,
        "n",
        "k",
        F.round(h, 6).alias("entropy"),
        F.round(norm, 6).alias("norm_entropy"),
    )
    return out.orderBy(*group_cols) if group_cols else out


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: _Seq[str] = (),
) -> DataFrame:
    """Spearman rank correlation per group: (group_cols..., n, rho),
    the monotone-association complement of corr_matrix's Pearson (which
    a single outlier can saturate). Ties get AVERAGE (fractional)
    ranks -- the textbook estimator, so rho matches scipy.stats
    .spearmanr and a DuckDB window twin bit-exactly.

    Rank bookkeeping stays INTEGER end-to-end: the doubled average rank
    2*avg_rank = 2*RANK() + tie_count - 1 is a BIGINT (rho is invariant
    under the affine rescale, so correlating doubled ranks gives the
    identical coefficient), every sum/product accumulates as
    BIGINT/DECIMAL(38,0) -- order-independent under any partitioning --
    and the only doubles are the final Pearson-on-ranks combination,
    one fixed expression rounded to 6 dp. Rows with a NULL in either
    column are excluded first (ranks are computed on the complete
    pairs).

    100 TB shape: the doubled rank depends only on (group, value), so
    it is computed per DISTINCT value -- a per-value count aggregate
    plus a cumulative-offset window over the value-vocabulary-sized
    frame (2*rows_below + ties + 1), hash-joined back to the rows.
    Never a row-sort window: a 3-group fact table would otherwise sort
    a third of the corpus in ONE task per group (the decile_lift /
    quantile_normalize per-score-offset machinery). NULL rho when
    n < 2 or either rank variance is zero (all-tied column)."""
    from pyspark.sql import Window

    keys = list(group_cols)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        *keys, x.alias("_x"), y.alias("_y")
    )

    def _rank2_map(col: str, out: str) -> DataFrame:
        """(keys..., col, out): doubled average rank per distinct value
        = 2*(rows below) + ties + 1."""
        per_v = base.groupBy(*keys, col).agg(
            F.count("*").cast("bigint").alias("_c")
        )
        w_off = (
            Window.partitionBy(*[F.col(c) for c in keys])
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        below = F.coalesce(F.sum("_c").over(w_off), F.lit(0).cast("bigint"))
        return per_v.select(
            *keys, col, (2 * below + F.col("_c") + 1).cast("bigint").alias(out)
        )

    ranked = base.join(_rank2_map("_x", "_rx"), [*keys, "_x"]).join(
        _rank2_map("_y", "_ry"), [*keys, "_y"]
    )
    agg = (ranked.groupBy(*keys) if keys else ranked.groupBy()).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("_rx").cast("double").alias("_sx"),
        F.sum("_ry").cast("double").alias("_sy"),
        # cast each FACTOR to decimal before the product: a doubled
        # rank reaches 2n, so the bigint product overflows at group
        # sizes past ~1.5e9 rows -- exactly the 100 TB shape the
        # docstring promises DECIMAL accumulation for
        F.sum(F.col("_rx").cast("decimal(19,0)") * F.col("_ry").cast("decimal(19,0)"))
        .cast("double")
        .alias("_sxy"),
        F.sum(F.col("_rx").cast("decimal(19,0)") * F.col("_rx").cast("decimal(19,0)"))
        .cast("double")
        .alias("_sxx"),
        F.sum(F.col("_ry").cast("decimal(19,0)") * F.col("_ry").cast("decimal(19,0)"))
        .cast("double")
        .alias("_syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    rho = F.when((vx > 0) & (vy > 0), num / F.sqrt(vx * vy))
    out = agg.select(
        *keys, "n", F.round(rho, 6).alias("rho")
    )
    return out.orderBy(*keys) if keys else out


def theil_sen(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: _Seq[str] = (),
    max_group_rows: int = 20_000,
) -> DataFrame:
    """Theil-Sen robust trend per group: (group_cols..., n, n_slopes,
    slope, intercept), slope = MEDIAN of all pairwise slopes
    (y_j - y_i)/(x_j - x_i) over x_i < x_j, intercept = median(y -
    slope * x) -- the estimator that shrugs off ~29% outliers where
    grouped_linreg's least squares follows them (Sen, JASA 1968).

    Inherently quadratic in group size, so it is a SMALL-SERIES
    operator by contract: groups wider than ``max_group_rows`` fail
    loudly inside the plan (assert_true, the span_cap discipline from
    rangejoin.py) instead of detonating a trillion-pair shuffle.
    Aggregate first -- the catalog entry runs it over monthly rollups,
    never raw facts. Pair generation is a group-keyed self-join (one
    shuffle each side); medians are Spark's exact interpolating
    percentile over the slope set, matching DuckDB quantile_cont
    bit-exactly (the A4 contract); slopes from identical operands are
    identical IEEE doubles, so the result is deterministic and fully
    oracle-able. NULL rows drop; groups with < 2 distinct x yield NULL
    slope."""
    keys = list(group_cols)

    def _j(a: DataFrame, b: DataFrame, how: str = "inner") -> DataFrame:
        return a.join(b, keys, how) if keys else a.crossJoin(b)

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        *keys, x.alias("_x"), y.alias("_y")
    )
    counts = base.groupBy(*keys).agg(F.count("*").cast("bigint").alias("n"))
    # the cap rides the plan as an assert inside a filter (NULL on pass,
    # error on breach) so pruning can't drop it and no extra action runs
    guard = counts.withColumn(
        "_guard",
        F.assert_true(
            F.col("n") <= max_group_rows,
            F.concat(
                F.lit(
                    f"theil_sen group exceeds max_group_rows={max_group_rows}: "
                ),
                F.col("n").cast("string"),
            ),
        ),
    ).filter(F.col("_guard").isNull()).drop("_guard")
    lhs = _j(
        base.select(*keys, F.col("_x").alias("_xi"), F.col("_y").alias("_yi")),
        F.broadcast(guard.drop("n")) if keys else F.broadcast(guard.select(F.lit(1).alias("_one"))),
    )
    rhs = base.select(*keys, F.col("_x").alias("_xj"), F.col("_y").alias("_yj"))
    pairs = (
        _j(lhs, rhs)
        .filter(F.col("_xi") < F.col("_xj"))
        .select(
            *keys,
            (
                (F.col("_yj") - F.col("_yi")) / (F.col("_xj") - F.col("_xi"))
            ).alias("_m"),
        )
    )
    slopes = pairs.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n_slopes"),
        F.expr("percentile(_m, 0.5)").alias("_slope"),
    )
    resid = _j(base, F.broadcast(slopes.select(*keys, "_slope")))
    inter = resid.groupBy(*keys).agg(
        F.expr("percentile(_y - _slope * _x, 0.5)").alias("_icept")
    )
    out = _j(_j(counts, slopes, "left"), inter, "left").select(
        *keys,
        "n",
        F.coalesce(F.col("n_slopes"), F.lit(0)).cast("bigint").alias("n_slopes"),
        F.round("_slope", 6).alias("slope"),
        F.round("_icept", 6).alias("intercept"),
    )
    return out.orderBy(*keys) if keys else out


def interarrival_stats(
    df: DataFrame,
    key_cols: _Seq[str],
    ts_col: str,
) -> DataFrame:
    """Inter-arrival-time statistics per key: (key_cols..., n_events,
    n_gaps, mean_gap, sd_gap, cv, burstiness) in seconds, 6-dp -- the
    traffic-shape profile (cron-like, Poisson-like, bursty) that drift
    monitors and capacity models key off. burstiness = (sd - mean) /
    (sd + mean) in [-1, 1): -1 periodic, 0 Poisson, ->1 bursty (Goh &
    Barabasi, EPL 2008); cv = sd / mean.

    Gaps are exact integer seconds from one lag window (ties on equal
    timestamps give zero gaps -- legitimate bursts); sums of gaps and
    squared gaps accumulate as BIGINT/DECIMAL(38,0), population
    variance combines them in one fixed double expression. One sort
    shuffle on (key, ts) + one hash aggregate. Keys with < 2 events
    yield NULL stats; zero-mean (all simultaneous) keys yield NULL
    cv/burstiness."""
    from pyspark.sql.window import Window

    keys = [F.col(c) for c in key_cols]
    s = F.unix_timestamp(ts_col)
    base = df.filter(F.col(ts_col).isNotNull()).select(
        *key_cols, s.alias("_s")
    )
    w = Window.partitionBy(*keys).orderBy("_s")
    gapped = base.select(
        *key_cols, (F.col("_s") - F.lag("_s", 1).over(w)).alias("_g")
    )
    agg = gapped.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count("_g").cast("bigint").alias("n_gaps"),
        F.sum("_g").cast("bigint").alias("_sg"),
        F.sum((F.col("_g") * F.col("_g")).cast("decimal(38,0)"))
        .cast("double")
        .alias("_sgg"),
    )
    n = F.col("n_gaps").cast("double")
    mean = F.col("_sg").cast("double") / n
    var = (F.col("_sgg") - F.col("_sg").cast("double") * F.col("_sg").cast("double") / n) / n
    sd = F.sqrt(F.when(var > 0, var).otherwise(F.lit(0.0)))
    return agg.select(
        *key_cols,
        "n_events",
        "n_gaps",
        F.round(F.when(F.col("n_gaps") > 0, mean), 6).alias("mean_gap"),
        F.round(F.when(F.col("n_gaps") > 0, sd), 6).alias("sd_gap"),
        F.round(
            F.when((F.col("n_gaps") > 0) & (mean > 0), sd / mean), 6
        ).alias("cv"),
        F.round(
            F.when(
                (F.col("n_gaps") > 0) & ((sd + mean) > 0),
                (sd - mean) / (sd + mean),
            ),
            6,
        ).alias("burstiness"),
    ).orderBy(*key_cols)


def mix_decomposition(
    df_base: DataFrame,
    df_comp: DataFrame,
    segment_col: str,
    value_col: str,
) -> DataFrame:
    """Why did the average move: per-segment decomposition of the
    change in a mean metric between a base and a comparison population
    (Oaxaca-Blinder / price-volume-mix, the Simpson's-paradox guard):

        total change = sum_s [ w_base_s * (m_comp_s - m_base_s)   (within)
                             + (w_comp_s - w_base_s) * m_base_s   (mix)
                             + (w_comp_s - w_base_s)
                               * (m_comp_s - m_base_s) ]          (interaction)

    Returns one row per segment (segment, n_base, n_comp, mean_base,
    mean_comp, within_effect, mix_effect, interaction) plus the
    identity that the three effect columns sum EXACTLY to the overall
    mean change -- an average can fall while every segment improves,
    and this says so. Segments absent on one side enter with weight 0
    there (their whole contribution is mix/interaction). NULL values
    drop; NULL segment is a legitimate segment.

    One hash aggregate per side (segment-sized), a null-safe
    full-outer join of two segment frames, fixed double expressions
    rounded to 6 dp -- exact decimal sums underneath, so a DuckDB twin
    hash-matches."""

    def _seg(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        return (
            df.filter(v.isNotNull())
            .groupBy(F.col(segment_col).alias("_seg"))
            .agg(
                F.count("*").cast("bigint").alias(f"n_{tag}"),
                F.sum(v.cast("decimal(28,6)"))
                .cast("double")
                .alias(f"_s_{tag}"),
            )
        )
    b = _seg(df_base, "base")
    c = _seg(df_comp, "comp").withColumnRenamed("_seg", "_seg_c")
    j = b.join(
        c, F.col("_seg").eqNullSafe(F.col("_seg_c")), "full_outer"
    ).select(
        F.coalesce(F.col("_seg"), F.col("_seg_c")).alias("segment"),
        F.coalesce(F.col("n_base"), F.lit(0)).cast("bigint").alias("n_base"),
        F.coalesce(F.col("n_comp"), F.lit(0)).cast("bigint").alias("n_comp"),
        F.coalesce(F.col("_s_base"), F.lit(0.0)).alias("_sb"),
        F.coalesce(F.col("_s_comp"), F.lit(0.0)).alias("_sc"),
    )
    tot = j.agg(
        F.sum("n_base").cast("double").alias("_tb"),
        F.sum("n_comp").cast("double").alias("_tc"),
    )
    x = j.crossJoin(F.broadcast(tot))
    m_b = F.try_divide(F.col("_sb"), F.col("n_base").cast("double"))
    m_c = F.try_divide(F.col("_sc"), F.col("n_comp").cast("double"))
    # try_divide like m_b/m_c above: an empty (or all-NULL-value) side
    # makes the total 0 and a plain division an ANSI DIVIDE_BY_ZERO
    w_b = F.try_divide(F.col("n_base").cast("double"), F.col("_tb"))
    w_c = F.try_divide(F.col("n_comp").cast("double"), F.col("_tc"))
    # absent-side means contribute only through terms weighted by the
    # side where they exist: coalesce to the OTHER side's mean so the
    # w*delta algebra stays exact (standard treatment of entering /
    # exiting segments)
    mb = F.coalesce(m_b, m_c)
    mc = F.coalesce(m_c, m_b)
    within = w_b * (mc - mb)
    mix = (w_c - w_b) * mb
    inter = (w_c - w_b) * (mc - mb)
    return x.select(
        "segment",
        "n_base",
        "n_comp",
        F.round(m_b, 6).alias("mean_base"),
        F.round(m_c, 6).alias("mean_comp"),
        F.round(within, 6).alias("within_effect"),
        F.round(mix, 6).alias("mix_effect"),
        F.round(inter, 6).alias("interaction"),
    ).orderBy("segment")
