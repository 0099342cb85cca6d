"""Experimentation plumbing: deterministic variant assignment, the
sample-ratio-mismatch (SRM) guardrail, and delta-method inference for
ratio metrics -- the entry point the A/B analysis family
(operators/stats.py welch_ttest / cuped_adjusted_ttest /
mannwhitney_u) assumes already happened.

- assign_variants: units map to variants by hash share -- the
  house-standard engine-portable md5 bucket, so assignment is
  reproducible across engines, stable under reshuffles, and
  INDEPENDENT per salt (a new experiment = a new salt, no carryover
  correlation between experiments). Scan-shaped projection.
- srm_check: the first thing to test before reading ANY result: a
  chi-square goodness-of-fit of observed variant counts against the
  configured split (Fabijan et al. 2019 -- an SRM invalidates the
  experiment outright; p ~ chi2 with k-1 dof, the statistic is
  reported and the caller compares against their threshold, keeping
  output engine-exact). One variant-sized aggregate.
- ratio_metric_delta: mean and variance of a RATIO metric (clicks /
  views per unit) via the delta method over unit-level sums --
  averaging per-unit ratios over-weights tiny denominators, and
  row-level t-tests ignore within-unit correlation; the delta method
  on (sum_num, sum_den) is the standard fix (Deng et al. 2017). Exact
  decimal sufficient statistics, one aggregate per variant.
"""

from __future__ import annotations

from collections.abc import Sequence as _Seq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def assign_variants(
    df: DataFrame,
    unit_col: str,
    weights: dict[str, float],
    salt: str,
) -> DataFrame:
    """The input plus a ``variant`` column: unit u lands in the variant
    whose cumulative weight interval contains hash(salt:u) / 1e6.
    Weights must be positive and sum to ~1 (validated); NULL units get
    NULL variant (exclude them upstream). Same unit + same salt =>
    same variant, on any engine.

    The bucket hash uses a 60-bit md5 prefix (15 hex chars, fits a
    signed int64 in every engine): with a 32-bit prefix, 2^32 mod 1e6
    = 967296 leaves the high bucket range systematically under-weighted
    by ~2.3e-10 per bucket -- enough that at n ~ 1e10 units the
    realized split drifts ~7e-6 absolute from the configured weights
    and srm_check raises a GUARANTEED false alarm against its own
    assignment. At 60 bits the residual bias is ~9e-19 per bucket,
    unobservable at any n."""
    if not weights:
        raise ValueError("need at least one variant")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9 or any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive and sum to 1: {weights}")
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(salt), F.lit(":"), F.col(unit_col).cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % _BUCKETS
    )
    expr = None
    cum = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        cum += w
        bound = int(round(cum * _BUCKETS))
        cond = h < bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    variant = (expr.otherwise(last) if expr is not None else F.lit(last))
    return df.withColumn(
        "variant", F.when(F.col(unit_col).isNotNull(), variant)
    )


def srm_check(
    assignments: DataFrame,
    weights: dict[str, float],
    variant_col: str = "variant",
) -> DataFrame:
    """One row (n, chi2, df) testing observed variant counts against
    the configured split -- chi2 well above the k-1-dof critical value
    (3.84 for 2 variants at alpha=.05; use alpha~1e-3 in practice, the
    SRM convention) means the assignment or logging pipeline is
    dropping units and every downstream readout is invalid. Exact
    integer counts; chi2 is one fixed double expression, 6-dp."""
    counts = (
        assignments.filter(F.col(variant_col).isNotNull())
        .groupBy(F.col(variant_col).alias("_v"))
        .agg(F.count("*").cast("bigint").alias("_n"))
    )
    terms = []
    for name, w in sorted(weights.items()):
        n_v = F.max(F.when(F.col("_v") == name, F.col("_n")))
        terms.append((n_v, w))
    agg = counts.agg(
        F.sum("_n").cast("bigint").alias("n"),
        *[
            F.coalesce(t[0], F.lit(0)).cast("bigint").alias(f"_c{i}")
            for i, t in enumerate(terms)
        ],
    )
    chi2 = None
    for i, (_, w) in enumerate(terms):
        exp = F.col("n").cast("double") * F.lit(float(w))
        term = (F.col(f"_c{i}").cast("double") - exp) * (
            F.col(f"_c{i}").cast("double") - exp
        ) / exp
        chi2 = term if chi2 is None else chi2 + term
    return agg.select(
        "n",
        F.round(F.when(F.col("n") > 0, chi2), 6).alias("chi2"),
        F.lit(len(terms) - 1).cast("int").alias("df"),
    )


def ratio_metric_delta(
    df: DataFrame,
    unit_col: str,
    num_col: str,
    den_col: str,
    group_cols: _Seq[str] = (),
) -> DataFrame:
    """Delta-method inference for a ratio metric per group:
    (group_cols..., n_units, ratio, se) where ratio = sum(num) /
    sum(den) over unit-level sums and se is the delta-method standard
    error

        var(X/Y) ~= (1/n) * (s_x^2 - 2*r*s_xy + r^2*s_y^2) / ybar^2

    with per-unit (x_i, y_i) sums -- the correct uncertainty for
    CTR-style metrics where per-row tests ignore within-unit
    correlation and per-unit-ratio averages over-weight tiny
    denominators. Exact decimal unit sums and sufficient statistics;
    one (group, unit) aggregate + one group aggregate. Groups with
    n < 2 units or zero denominator yield NULL se/ratio."""
    keys = list(group_cols)
    per_unit = (
        df.filter(F.col(unit_col).isNotNull())
        .groupBy(*keys, F.col(unit_col).alias("_u"))
        .agg(
            F.coalesce(
                F.sum(F.col(num_col).cast("decimal(28,6)")),
                F.lit(0).cast("decimal(28,6)"),
            ).alias("_x"),
            F.coalesce(
                F.sum(F.col(den_col).cast("decimal(28,6)")),
                F.lit(0).cast("decimal(28,6)"),
            ).alias("_y"),
        )
    )
    agg = (per_unit.groupBy(*keys) if keys else per_unit.groupBy()).agg(
        F.count("*").cast("bigint").alias("n_units"),
        F.sum("_x").cast("double").alias("_sx"),
        F.sum("_y").cast("double").alias("_sy"),
        F.sum((F.col("_x") * F.col("_x")).cast("decimal(38,10)"))
        .cast("double")
        .alias("_sxx"),
        F.sum((F.col("_x") * F.col("_y")).cast("decimal(38,10)"))
        .cast("double")
        .alias("_sxy"),
        F.sum((F.col("_y") * F.col("_y")).cast("decimal(38,10)"))
        .cast("double")
        .alias("_syy"),
    )
    # try_divide throughout: ANSI mode would otherwise throw on the
    # degenerate groups (n=1, zero denominator) BEFORE the when-guards
    # could suppress them; NULL propagation gives the same NULL output
    n = F.col("n_units").cast("double")
    r = F.try_divide(F.col("_sx"), F.col("_sy"))
    xbar = F.col("_sx") / n
    ybar = F.col("_sy") / n
    var_x = F.try_divide(F.col("_sxx") - n * xbar * xbar, n - 1)
    var_y = F.try_divide(F.col("_syy") - n * ybar * ybar, n - 1)
    cov = F.try_divide(F.col("_sxy") - n * xbar * ybar, n - 1)
    var_r = F.try_divide(
        var_x - 2 * r * cov + r * r * var_y, n * ybar * ybar
    )
    ok = (F.col("n_units") >= 2) & (F.col("_sy") > 0)
    out = agg.select(
        *keys,
        "n_units",
        F.round(F.when(F.col("_sy") > 0, r), 6).alias("ratio"),
        F.round(
            F.when(ok & (var_r >= 0), F.sqrt(var_r)), 6
        ).alias("se"),
    )
    return out.orderBy(*keys) if keys else out
