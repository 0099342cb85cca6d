"""Distribution-drift and association audits: PSI between two
snapshots of a categorical column, and chi-square / Cramer's V between
two categorical columns.

The monitoring layer a production pipeline runs next to the dbt-style
row tests (quality.py): row tests catch broken VALUES, these catch
broken DISTRIBUTIONS -- an upstream feed silently shifting its
category mix passes every not_null/accepted_values test and still
wrecks a model trained on last month's mix. PSI is the standard drift
gate (banking/model-monitoring folklore thresholds: <0.1 stable,
0.1-0.25 drifting, >0.25 shifted); Cramer's V is the scale-free
association strength used for feature redundancy screens.

Determinism: counts are exact integers; each cell/category contribution
is rounded once to integer millionths and summed as integers (the
lm_score discipline), so totals hash-match a DuckDB twin under any
partitioning.

Plan shapes: one hash aggregate per side (category-cardinality-sized
results), a category-keyed full outer join (broadcast-sized), fixed
projections. Nothing corpus-shaped is shuffled twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def category_counts(df: DataFrame, col: str, out: str = "n") -> DataFrame:
    """(category, ``out``): the category-cardinality-sized count frame
    PSI runs on. Exposed so a monitor can aggregate a reference corpus
    ONCE and reuse the counts across every micro-batch
    (streaming/drift.py) instead of re-scanning it per batch."""
    return df.groupBy(F.col(col).alias("category")).agg(
        F.count("*").cast("bigint").alias(out)
    )


def psi_categorical(
    expected: DataFrame,
    actual: DataFrame,
    col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-category PSI breakdown: (category, n_expected, n_actual,
    psi_contrib) with psi_contrib = (pa - pe) * ln(pa / pe) in 6-dp;
    proportions use add-``smoothing`` so a category present on only one
    side contributes a finite, large term instead of infinity. Total
    PSI = sum(psi_contrib) (driver-side or one more aggregate).

    NULL category is a legitimate cohort (NULL-safe join key)."""
    return psi_from_counts(
        category_counts(expected, col, "n_expected"),
        category_counts(actual, col, "n_actual"),
        smoothing,
    )


def psi_from_counts(
    e: DataFrame, a: DataFrame, smoothing: float = 0.5
) -> DataFrame:
    """PSI from pre-aggregated (category, n_expected) / (category,
    n_actual) count frames -- the reusable half of ``psi_categorical``."""
    joined = e.withColumnRenamed("category", "_ce").join(
        a.withColumnRenamed("category", "_ca"),
        F.col("_ce").eqNullSafe(F.col("_ca")),
        "full_outer",
    )
    ne = F.coalesce(F.col("n_expected"), F.lit(0))
    na = F.coalesce(F.col("n_actual"), F.lit(0))
    cats = joined.select(
        F.coalesce(F.col("_ce"), F.col("_ca")).alias("category"),
        ne.alias("n_expected"),
        na.alias("n_actual"),
    )
    # totals via window-free broadcast: the category frame is tiny, one
    # grouped aggregate + crossJoin keeps the plan join-shaped
    totals = cats.agg(
        F.sum("n_expected").alias("_te"),
        F.sum("n_actual").alias("_ta"),
        F.count("*").alias("_k"),
    )
    j = cats.crossJoin(F.broadcast(totals))
    pe = (F.col("n_expected") + F.lit(smoothing)) / (
        F.col("_te") + F.lit(smoothing) * F.col("_k")
    )
    pa = (F.col("n_actual") + F.lit(smoothing)) / (
        F.col("_ta") + F.lit(smoothing) * F.col("_k")
    )
    contrib = (pa - pe) * F.log(pa / pe)
    return j.select(
        "category",
        "n_expected",
        "n_actual",
        (
            F.round(contrib * SCALE).cast("bigint").cast("double") / SCALE
        ).alias("psi_contrib"),
    )


def psi_total(
    expected: DataFrame, actual: DataFrame, col: str, smoothing: float = 0.5
) -> float:
    """Scalar PSI (sum of 6-dp contributions -- an exact integer sum in
    millionths, so the total is partitioning-independent)."""
    rows = (
        psi_categorical(expected, actual, col, smoothing)
        .agg(
            F.sum(F.round(F.col("psi_contrib") * SCALE).cast("bigint")).alias("s")
        )
        .first()
    )
    return (rows["s"] or 0) / SCALE


def cramers_v(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """One-row association audit: (n, df_a, df_b, chi2, cramers_v) for
    two categorical columns. chi2 = sum (o - e)^2 / e over the
    contingency table with e = row_total * col_total / n; V =
    sqrt(chi2 / (n * (min(k_a, k_b) - 1))), both 6-dp. One contingency
    aggregate + two marginal aggregates (all category-sized), broadcast
    joins, integer-millionths cell sums."""
    cells = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count("*").cast("bigint").alias("o"))
    # distinct renames break cells/ra/cb lineage ambiguity (all three
    # derive from the same aggregate)
    ra = cells.groupBy(F.col("_a").alias("_ga")).agg(F.sum("o").alias("row_n"))
    cb = cells.groupBy(F.col("_b").alias("_gb")).agg(F.sum("o").alias("col_n"))
    # ka/kb must count NULL as a category: the grid and chi2 include
    # NULL-keyed cells (eqNullSafe joins), so countDistinct alone (which
    # drops NULL) would undercount the table dimensions -- V could
    # exceed 1, or go NULL for a {NULL, x} two-category column.
    tot = cells.agg(
        F.sum("o").alias("n"),
        (
            F.countDistinct("_a") + F.max(F.col("_a").isNull().cast("int"))
        ).alias("ka"),
        (
            F.countDistinct("_b") + F.max(F.col("_b").isNull().cast("int"))
        ).alias("kb"),
    )
    # the FULL ka x kb grid: zero cells contribute (0 - e)^2 / e = e to
    # chi2 and must not vanish just because no row hit them (a perfect
    # 2x2 association would otherwise score V = 0.707, not 1)
    grid = ra.crossJoin(F.broadcast(cb))
    j = (
        grid.join(
            cells,
            F.col("_ga").eqNullSafe(F.col("_a"))
            & F.col("_gb").eqNullSafe(F.col("_b")),
            "left",
        )
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    # exact decimal product, THEN the double division: bigint row_n *
    # col_n overflows under ANSI once two marginals each exceed ~3e9
    # rows (the DuckDB twin is immune only because its sum() returns
    # HUGEINT); decimal(19,0)^2 fits decimal(38,0) for any bigint pair
    # and converts to the same double the bigint product did
    e = (
        F.col("row_n").cast("decimal(19,0)")
        * F.col("col_n").cast("decimal(19,0)")
    ).cast("double") / F.col("n").cast("double")
    cell_m = F.round((F.col("o") - e) * (F.col("o") - e) / e * SCALE).cast("bigint")
    agg = j.agg(
        F.first("n").alias("n"),
        F.first("ka").alias("ka"),
        F.first("kb").alias("kb"),
        F.sum(cell_m).alias("_chi2_m"),
    )
    chi2 = F.col("_chi2_m").cast("double") / SCALE
    # double factors for the same reason: n * (k - 1) is a bigint
    # product and a 1e15-row table with 1e4 categories overflows it
    denom = F.col("n").cast("double") * (
        F.least("ka", "kb") - F.lit(1)
    ).cast("double")
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        (F.col("ka") - 1).cast("bigint").alias("df_a"),
        (F.col("kb") - 1).cast("bigint").alias("df_b"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.when(denom > 0, F.sqrt(chi2 / denom)), 6
        ).alias("cramers_v"),
    )


def psi_numeric(
    expected: DataFrame,
    actual: DataFrame,
    col: str,
    bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """PSI for a numeric column: bin BOTH frames by the EXPECTED side's
    quantile boundaries (the reference distribution defines the bins --
    binning each side by its own quantiles would define drift away),
    then run the categorical PSI over bin ids. Boundaries come from the
    mergeable approxQuantile sketch; NULL values form their own bin."""
    probs = [i / bins for i in range(1, bins)]
    bounds = sorted(set(expected.stat.approxQuantile(col, probs, 0.001)))

    def assign(df: DataFrame) -> DataFrame:
        cell = F.lit(0).cast("int")
        for b in bounds:
            cell = cell + (F.col(col).cast("double") > F.lit(float(b))).cast("int")
        return df.select(
            F.when(F.col(col).isNotNull(), cell).alias("_bin")
        )

    return psi_categorical(assign(expected), assign(actual), "_bin", smoothing)


def ks_statistic(
    df: DataFrame,
    value_col: str,
    flag_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per group:
    (group_cols..., n_a, n_b, ks_d, ks_lambda) comparing the value
    distribution where ``flag_col`` is true (sample A) vs false
    (sample B). The BINNING-FREE distribution comparison next to
    psi_numeric (whose quantile bins can hide shape changes inside a
    bin): D = max over pooled jump points of |F_A(x) - F_B(x)|;
    ks_lambda = D * sqrt(n_a*n_b/(n_a+n_b)) is the scale-free effect
    size (asymptotic alpha=0.05 rejects around lambda > 1.36 -- the
    full Smirnov series is left to the caller's lookup, keeping the
    output engine-exact).

    Step CDFs only move at observed values, so evaluating at the
    pooled DISTINCT values is exact -- and that is also the scale
    shape: one (group, value) hash aggregate with per-sample counts,
    one cumulative window over the value-vocabulary-sized frame (the
    spearman_corr discipline -- never a raw-row sort), one max
    aggregate. Counts are exact integers; the CDF quotients are fixed
    double expressions; NULL values and NULL flags drop; a group with
    an empty side yields NULL D."""
    keys = list(group_cols or [])
    v = F.col(value_col).cast("double")
    flag = F.col(flag_col).cast("boolean")
    base = df.filter(v.isNotNull() & flag.isNotNull()).select(
        *keys, v.alias("_v"), flag.alias("_f")
    )
    per_v = base.groupBy(*keys, "_v").agg(
        F.count(F.when(F.col("_f"), F.lit(1))).cast("bigint").alias("_ca"),
        F.count(F.when(~F.col("_f"), F.lit(1))).cast("bigint").alias("_cb"),
    )
    return _ks_from_per_value(per_v, keys)


def _ks_from_per_value(per_v: DataFrame, keys: list[str]) -> DataFrame:
    """The KS machinery over a (keys..., _v, _ca, _cb) per-value count
    frame: cumulative CDF gaps + max, shared by the batch operator and
    the streaming monitor's ks_from_counts."""
    from pyspark.sql.window import Window

    w_cum = (
        Window.partitionBy(*[F.col(c) for c in keys])
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*[F.col(c) for c in keys])
    cum = per_v.select(
        *keys,
        F.sum("_ca").over(w_cum).alias("_cuma"),
        F.sum("_cb").over(w_cum).alias("_cumb"),
        F.sum("_ca").over(w_all).alias("_na"),
        F.sum("_cb").over(w_all).alias("_nb"),
    )
    diff = F.when(
        (F.col("_na") > 0) & (F.col("_nb") > 0),
        F.abs(
            F.col("_cuma").cast("double") / F.col("_na").cast("double")
            - F.col("_cumb").cast("double") / F.col("_nb").cast("double")
        ),
    )
    agg = cum.groupBy(*keys).agg(
        F.max("_na").cast("bigint").alias("n_a"),
        F.max("_nb").cast("bigint").alias("n_b"),
        F.max(diff).alias("_d"),
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    lam = F.col("_d") * F.sqrt(
        (F.col("n_a") * F.col("n_b")).cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    out = agg.select(
        *keys,
        "n_a",
        "n_b",
        F.round(F.when(ok, F.col("_d")), 6).alias("ks_d"),
        F.round(F.when(ok, lam), 6).alias("ks_lambda"),
    )
    return out.orderBy(*keys) if keys else out


def ks_from_counts(counts_a: DataFrame, counts_b: DataFrame) -> DataFrame:
    """One-row KS from two ungrouped per-value count frames (columns
    (v, n)): the form the streaming monitor feeds with a batch's counts
    against PRE-AGGREGATED reference counts -- the reference corpus is
    never re-scanned per batch, only its value-vocabulary-sized count
    frame re-windows."""
    a = counts_a.select(F.col("v").cast("double").alias("_v"), F.col("n").alias("_ca"))
    b = counts_b.select(F.col("v").cast("double").alias("_v"), F.col("n").alias("_cb"))
    per_v = (
        a.join(b, "_v", "full_outer")
        .select(
            "_v",
            F.coalesce(F.col("_ca"), F.lit(0)).cast("bigint").alias("_ca"),
            F.coalesce(F.col("_cb"), F.lit(0)).cast("bigint").alias("_cb"),
        )
    )
    return _ks_from_per_value(per_v, [])
