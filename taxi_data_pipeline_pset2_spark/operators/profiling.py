"""Data observability: table profiling and schema-drift detection.

``profile_table`` is the ANALYZE TABLE / dbt-docs surface: one
aggregate pass computes per-column null fraction, approximate distinct
count, and min/max. Everything is a single Spark job (one wide agg row,
transposed driver-side into a column-per-row frame) -- at 100 TB the
profile costs one scan, never per-column jobs.

``schema_drift`` guards the ingest boundary: compare the expected
schema against what a parquet path actually carries BEFORE reading data
through it -- the reference's loader discovers drift by crashing
mid-load (new TLC columns appear yearly); here it is a zero-row
metadata check with a structured report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StructType


def profile_table(df: DataFrame, approx_rsd: float = 0.05) -> DataFrame:
    """Per-column profile: (column, dtype, n_rows, n_nulls, null_frac,
    approx_distinct, min_value, max_value) -- min/max as strings so one
    frame covers every column type. ONE aggregate job for the whole
    table."""
    spark = df.sparkSession
    cols = df.schema.fields
    aggs = [F.count(F.lit(1)).alias("_n")]
    for f in cols:
        c = F.col(f.name)
        aggs += [
            F.count(F.when(c.isNull(), 1)).alias(f"{f.name}__nulls"),
            F.approx_count_distinct(f.name, rsd=approx_rsd).alias(f"{f.name}__ndv"),
            F.min(c).cast("string").alias(f"{f.name}__min"),
            F.max(c).cast("string").alias(f"{f.name}__max"),
        ]
    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        round_half_up_6,
    )

    row = df.agg(*aggs).collect()[0]
    n = row["_n"]
    out = [
        Row(
            column=f.name,
            dtype=f.dataType.simpleString(),
            n_rows=n,
            n_nulls=row[f"{f.name}__nulls"],
            # HALF_UP like the oracle's round(), not builtin banker's
            null_frac=round_half_up_6(row[f"{f.name}__nulls"] / n)
            if n
            else 0.0,
            approx_distinct=row[f"{f.name}__ndv"],
            min_value=row[f"{f.name}__min"],
            max_value=row[f"{f.name}__max"],
        )
        for f in cols
    ]
    return spark.createDataFrame(out)


@dataclass(frozen=True)
class SchemaDrift:
    missing: tuple[str, ...]  # expected but absent in the files
    added: tuple[str, ...]  # present in the files, not expected
    type_changed: tuple[tuple[str, str, str], ...]  # (col, expected, actual)

    @property
    def clean(self) -> bool:
        return not (self.missing or self.added or self.type_changed)

    @property
    def breaking(self) -> bool:
        """Added columns are additive (ignorable); missing or retyped
        columns break typed readers."""
        return bool(self.missing or self.type_changed)


def schema_drift(
    spark: SparkSession, expected: StructType, path: str
) -> SchemaDrift:
    """Footer-only drift check: no data rows are read."""
    actual = spark.read.parquet(path).schema
    exp = {f.name: f.dataType for f in expected.fields}
    act = {f.name: f.dataType for f in actual.fields}
    missing = tuple(sorted(set(exp) - set(act)))
    added = tuple(sorted(set(act) - set(exp)))
    type_changed = tuple(
        (name, exp[name].simpleString(), act[name].simpleString())
        for name in sorted(set(exp) & set(act))
        if exp[name] != act[name]
        # numeric widenings the coercing reader (F14) absorbs are not drift
        and not (
            isinstance(exp[name], NumericType) and isinstance(act[name], NumericType)
        )
    )
    return SchemaDrift(missing, added, type_changed)


def column_histogram(df, col: str, bins: int = 10):
    """Equi-width histogram of a numeric column: (bin, lo, hi, n) with
    ``bins`` rows. One min/max aggregate (driver-sized) + one hash
    aggregate on the bin id -- two scans, both scan-shaped; the bin
    arithmetic is floor((v - min) / width) clamped to the last bin, a
    pure codegen expression identical in the DuckDB twin. NaN values
    are excluded like NULLs: Spark's ordering ranks NaN above every
    double, so one NaN row would otherwise become max_value and poison
    every bin edge (width = NaN -> the whole histogram lands in one
    bin with NaN boundaries)."""
    from pyspark.sql import functions as F

    v = F.col(col).cast("double")
    df = df.filter(v.isNotNull() & ~F.isnan(v))
    mn, mx = df.agg(
        F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
    ).first()
    if mn is None:
        return df.sparkSession.createDataFrame(
            [], "bin int, lo double, hi double, n bigint"
        )
    width = (mx - mn) / bins if mx > mn else 1.0
    bin_id = F.least(
        F.lit(bins - 1),
        F.floor((F.col(col).cast("double") - F.lit(mn)) / F.lit(width)),
    ).cast("int")
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_id.alias("bin"))
        .agg(F.count("*").alias("n"))
    )
    edges = df.sparkSession.createDataFrame(
        [(i, mn + i * width, mn + (i + 1) * width) for i in range(bins)],
        "bin int, lo double, hi double",
    )
    return (
        edges.join(counts, "bin", "left")
        .select("bin", "lo", "hi", F.coalesce("n", F.lit(0)).alias("n"))
        .orderBy("bin")
    )


def quantile_bin(
    df, col: str, bins: int = 10, out_col: str | None = None, exact: bool = False
):
    """Equal-frequency discretization: adds ``out_col`` (default
    ``{col}_bin``) in [0, bins) with ~equal row counts per bin -- the
    feature-engineering twin of ``column_histogram`` (equi-width) and
    the same quantile-cell machinery the Z-order layout uses.

    One boundary pass (driver gets bins-1 literals); the assignment is
    a codegen comparison chain, no shuffle. Duplicate boundaries (heavy
    ties) are collapsed, so bins on a low-cardinality column may be
    fewer but never empty-by-split.

    ``exact=False`` (default, the 100 TB path): approxQuantile's
    mergeable Greenwald-Khanna sketch. ``exact=True``: PERCENTILE_CONT
    interpolation, rounded to 6 dp so the boundary set is bit-portable
    across engines (the same convention as price_percentiles /
    winsorize) -- what the DuckDB-twin catalog entry uses."""
    from pyspark.sql import functions as F

    out_col = out_col or f"{col}_bin"
    probs = [i / bins for i in range(1, bins)]
    if exact:
        arr = ", ".join(f"{p}D" for p in probs)
        row = df.agg(
            F.expr(f"percentile(CAST({col} AS DOUBLE), array({arr}))")
        ).collect()[0][0]
        if row is None:  # empty/all-NULL input: percentile yields NULL
            bounds = []
        else:
            # HALF_UP at 6dp (the engine-portable convention) -- builtin
            # round() is banker's and can diverge from the DuckDB twin on
            # boundary ties (ADVICE r5)
            from taxi_data_pipeline_pset2_spark.operators.similarity import (
                _round_half_up_6,
            )

            bounds = sorted({float(b) for b in _round_half_up_6(list(row))})
    else:
        bounds = sorted(set(df.stat.approxQuantile(col, probs, 0.001)))
    cell = F.lit(0).cast("int")
    for b in bounds:
        cell = cell + (F.col(col).cast("double") > F.lit(float(b))).cast("int")
    return df.withColumn(out_col, F.when(F.col(col).isNotNull(), cell))


def source_profile(
    docs,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
) -> "DataFrame":
    """Per-source dataset-card sheet: (source, n_docs, avg_quality,
    n_unique, dup_rate, lang_entropy) -- the per-domain statistics a
    curator reads before setting mixture weights (is this source
    boilerplate-heavy? monolingual? low quality?).

    - avg_quality: mean composite quality score, decimal-exact sum then
      one rounded division;
    - dup_rate: 1 - distinct content fingerprints / docs (exact dup
      mass inside the source);
    - lang_entropy: Shannon entropy of the source's language mix in
      nats, per-language contributions rounded to integer millionths
      and summed (the PSI discipline -> partitioning-independent).

    Two hash aggregates (per-source, per-source-language) + one
    source-cardinality join; nothing corpus-shaped shuffles twice."""
    from taxi_data_pipeline_pset2_spark.operators.dedup import normalize_text
    from taxi_data_pipeline_pset2_spark.operators.text import with_quality_score

    scored = with_quality_score(docs, text_col)
    base = scored.select(
        source_col,
        lang_col,
        "quality_score",
        F.md5(normalize_text(F.col(text_col))).alias("_fp"),
    )
    per_src = (
        base.groupBy(source_col)
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("quality_score").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_quality"),
            F.countDistinct("_fp").cast("bigint").alias("n_unique"),
        )
        .withColumn(
            "dup_rate",
            F.round(1 - F.col("n_unique") / F.col("n_docs"), 6),
        )
    )
    sl = base.groupBy(source_col, lang_col).agg(F.count("*").alias("_n"))
    tot = sl.groupBy(source_col).agg(F.sum("_n").alias("_t"))
    p = F.col("_n") / F.col("_t")
    # NULL-safe source joins: groupBy keeps a NULL source as a cohort,
    # and a plain equi-join here would silently drop that whole cohort
    # from the sheet (r11; the seasonal-naive NULL-key precedent) --
    # an unattributed-source bucket is exactly what a curator must see
    ent = (
        sl.join(
            tot.withColumnRenamed(source_col, "_src_t"),
            F.col(source_col).eqNullSafe(F.col("_src_t")),
        )
        .select(
            source_col,
            F.round(-p * F.log(p) * 1_000_000).cast("bigint").alias("_em"),
        )
        .groupBy(source_col)
        .agg((F.sum("_em").cast("double") / 1_000_000).alias("lang_entropy"))
    )
    return per_src.join(
        ent.withColumnRenamed(source_col, "_src_e"),
        F.col(source_col).eqNullSafe(F.col("_src_e")),
    ).drop("_src_e")


def benford_audit(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit audit against Benford's law (Newcomb
    1881 / Benford 1938; the standard forensic screen for fabricated or
    truncated numeric feeds -- organically-grown magnitudes follow
    P(d) = log10(1 + 1/d), capped or synthesized ones don't).

    Returns 9 rows (digit, n, frac_observed, frac_expected,
    chi2_contrib): chi-square per digit against the Benford expectation
    (sum the column for the test statistic, 8 df). Zero/NULL values
    carry no first digit and are excluded; magnitudes below 5e-7
    quantize to 0.000000 on the 6-dp decimal grid and drop with the
    zeros (both engines, by construction).

    Engine-portability: the first digit comes from the DECIMAL string
    rendering (regexp first [1-9]) rather than floor(x/10^floor(log10 x))
    -- the float-log route misassigns exact powers of ten when log10
    lands a hair under an integer. The Benford expectations are
    PRE-COMPUTED python literals, so Spark and the DuckDB oracle compare
    against bit-identical constants. One hash aggregate to 9 rows.
    """
    import math

    # decimal(38,6), not (18,6): the cast is ANSI and a value >= 1e12
    # would abort the whole audit -- a forensic screen must survive the
    # very magnitudes it screens. Sub-millionth values quantize to
    # 0.000000 and drop with the zeros (documented above); in-range
    # renderings are identical at either precision.
    digit = F.regexp_extract(
        F.col(col).cast("decimal(38,6)").cast("string"), "[1-9]", 0
    )
    counts = (
        df.select(digit.alias("digit"))
        .filter(F.col("digit") != "")
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(str(d), math.log10(1 + 1 / d)) for d in range(1, 10)],
        "digit string, frac_expected double",
    )
    j = expected.join(counts, "digit", "left").na.fill({"n": 0})
    totals = j.agg(F.sum("n").alias("_tot"))
    j = j.crossJoin(F.broadcast(totals))
    exp_n = F.col("_tot") * F.col("frac_expected")
    return j.select(
        "digit",
        "n",
        F.round(F.try_divide(F.col("n"), F.col("_tot")), 6).alias(
            "frac_observed"
        ),
        F.round("frac_expected", 6).alias("frac_expected"),
        F.round(
            F.try_divide((F.col("n") - exp_n) * (F.col("n") - exp_n), exp_n),
            6,
        ).alias("chi2_contrib"),
    ).orderBy("digit")


def skew_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """One-row shuffle-key skew audit for a prospective join/aggregate
    key: (n_rows, n_keys, max_key_rows, top1_share, p99_key_rows,
    mean_key_rows, skew_ratio) -- the pre-flight check before keying a
    100 TB shuffle (operators/skew.py holds the FIXES: salting,
    bucketed joins; this measures whether they're needed). skew_ratio =
    max key rows / mean key rows: ~1 uniform, >> 1 means the biggest
    key's partition becomes the straggler task.

    One hash aggregate to key-sized counts, then one key-sized
    aggregate with an exact interpolating percentile -- nothing
    row-sized leaves the first aggregate. NULL keys are a legitimate
    (often the worst-offending) key. 6-dp rounding; exact integer
    counts; matches a DuckDB twin bit-exactly."""
    counts = df.groupBy(
        *[F.col(c) for c in key_cols]
    ).agg(F.count("*").cast("bigint").alias("_c"))
    return counts.agg(
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("_c").cast("bigint").alias("max_key_rows"),
        F.round(
            F.max("_c").cast("double") / F.sum("_c").cast("double"), 6
        ).alias("top1_share"),
        F.round(F.expr("percentile(_c, 0.99)"), 6).alias("p99_key_rows"),
        F.round(
            F.sum("_c").cast("double") / F.count("*").cast("double"), 6
        ).alias("mean_key_rows"),
        F.round(
            F.max("_c").cast("double")
            / (F.sum("_c").cast("double") / F.count("*").cast("double")),
            6,
        ).alias("skew_ratio"),
    )
