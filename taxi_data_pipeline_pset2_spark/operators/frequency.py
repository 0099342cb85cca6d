"""Heavy hitters at scale: two-phase frequent-item detection.

Completes the approx family (HLL distinct counts, KLL quantiles --
queries/relational.py) with frequencies. The scale shape is the classic
candidates-then-verify split:

 1. candidate pass: ``DataFrame.freqItems`` (Karp/Shenker/Papadimitriou
    one-pass counting) returns a SUPERSET of every value with frequency
    >= support -- no shuffle of raw values, driver traffic bounded by
    1/support items;
 2. verify pass: exact counts for the candidate set only (a filter the
    scan can push down + one tiny aggregate), dropping false positives.

Result: exact counts for exactly the true heavy hitters, at the cost of
two scans and a candidate-sized aggregate -- never a full groupBy of the
value domain (at 100 TB a distinct-shingle aggregate IS the corpus;
the candidate filter makes the exact pass cheap).

LLM-pipeline tie-in: ``frequent_shingles`` surfaces boilerplate n-grams
(nav bars, license headers) -- the principled way to choose
``max_df``-style stopword cutoffs for ``jaccard_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, col: str, support: float = 0.01) -> DataFrame:
    """Values of ``col`` with frequency >= support, with EXACT counts.
    Returns (value, n, frac) ordered by n desc, value asc. NULL is a
    legitimate value (a 50%-NULL column HAS a heavy hitter); the
    boundary test compares the OBSERVED double frequency n/N against
    ``support`` -- `n >= support * N` looks equivalent but the IEEE
    product excludes exact-boundary values (0.01 * 300 =
    3.0000000000000004, so a value at exactly 1% of 300 rows failed
    the documented >= contract; the oracle twin compares the same
    quotient)."""
    # freqItems' own domain is [1e-4, 1] -- validate BOTH bounds here
    # so a tiny support raises this operator's error, not Spark's
    if not 1e-4 <= support <= 1:
        raise ValueError(f"support must be in [1e-4, 1], got {support}")
    candidates = df.freqItems([col], support).collect()[0][0]
    n_rows = df.count()
    if not candidates or n_rows == 0:
        return df.sparkSession.createDataFrame(
            [], "value string, n long, frac double"
        )
    non_null = [c for c in candidates if c is not None]
    cond = F.col(col).isin(non_null) if non_null else F.lit(False)
    if any(c is None for c in candidates):
        # isin(NULL) is never TRUE: without this, a NULL heavy hitter
        # silently vanishes from the exact-count pass
        cond = cond | F.col(col).isNull()
    return (
        df.filter(cond)
        .groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count("*").alias("n"))
        .filter(
            F.col("n").cast("double") / F.lit(float(n_rows)) >= F.lit(support)
        )
        .withColumn("frac", F.round(F.col("n") / F.lit(n_rows), 6))
        .orderBy(F.desc("n"), F.asc("value"))
    )


def frequent_shingles(
    docs: DataFrame,
    support: float = 0.05,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate detector: k-token shingles appearing in >= support of
    DOCUMENTS (document frequency -- shingles are distinct per doc, so
    one exploded row == one supporting doc). Output feeds
    jaccard_pairs(max_df=...) cutoffs.

    ``support`` is a fraction of docs; freqItems' support argument is a
    fraction of exploded ROWS, so it is rescaled by docs/rows (floored
    at freqItems' 1e-4 minimum -- a looser candidate pass only adds
    false positives, which the exact verify drops)."""
    from taxi_data_pipeline_pset2_spark.operators.dedup import doc_shingles

    if not 0 < support <= 1:
        raise ValueError(f"support must be in (0, 1], got {support}")
    e = doc_shingles(docs, text_col, id_col, k).select(id_col, "shingle")
    n_docs = docs.count()
    n_rows = e.count()
    if n_rows == 0 or n_docs == 0:
        return docs.sparkSession.createDataFrame(
            [], "value string, n long, frac double"
        )
    # clamp to freqItems' [1e-4, 1] domain: a short-doc corpus can
    # push support * n_docs past n_rows (support impossible to reach),
    # where an uncapped ratio crashes inside Spark instead of
    # returning the correct empty frame via the exact verify
    row_support = min(max(support * n_docs / n_rows, 1e-4), 1.0)
    candidates = e.freqItems(["shingle"], row_support).collect()[0][0]
    if not candidates:
        return docs.sparkSession.createDataFrame(
            [], "value string, n long, frac double"
        )
    return (
        e.filter(F.col("shingle").isin(list(candidates)))
        .groupBy(F.col("shingle").cast("string").alias("value"))
        .agg(F.count("*").alias("n"))
        .filter(
            F.col("n").cast("double") / F.lit(float(n_docs)) >= F.lit(support)
        )
        .withColumn("frac", F.round(F.col("n") / F.lit(n_docs), 6))
        .orderBy(F.desc("n"), F.asc("value"))
    )


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Exact trailing-window distinct count per day -- rolling WAU:
    (day, n_distinct) for every day in the data's span, where
    n_distinct counts ids active in [day - window_days + 1, day].

    A sliding DISTINCT cannot ride a window-function sum (distinct
    doesn't decompose), and re-scanning the fact per day is quadratic.
    The scalable shape: reduce to DISTINCT (id, day) pairs once, then
    explode each pair to the ``window_days`` window-ends it serves
    (a CONSTANT factor, the rangejoin.py explode discipline), dedup
    (id, window_end) -- one id active on several days inside a window
    must count once -- and hash-aggregate per window end. Work is
    O(active-pairs x window), never O(days x corpus). Days with zero
    activity report 0 via the generated day spine; window ends beyond
    the data's last day are clipped."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    d = F.to_date(ts_col)
    pairs = (
        df.filter(d.isNotNull())
        .select(F.col(id_col).alias("_id"), d.alias("_d"))
        .distinct()
    )
    bounds = pairs.agg(
        F.min("_d").alias("_lo"), F.max("_d").alias("_hi")
    )
    served = (
        pairs.select(
            "_id",
            F.explode(
                F.sequence(
                    F.col("_d"),
                    F.date_add(F.col("_d"), window_days - 1),
                )
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("_n"))
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(_lo, _hi, interval 1 day)")).alias("day")
    )
    return (
        spine.join(served, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("_n", F.lit(0)).cast("bigint").alias("n_distinct"),
        )
        .orderBy("day")
    )


def mode_by(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic mode per group: (group_cols..., mode, n_mode) --
    the most frequent value, ties broken by the SMALLEST value (Spark's
    built-in ``mode()`` is tie-nondeterministic, which disqualifies it
    from any hash-verified pipeline). NULL is a legitimate value and
    can be the mode; it loses every tie (NULLS LAST in the tiebreak).
    Shape: one (group, value) hash aggregate + one argmax window over
    the value-vocabulary frame -- never a raw-row sort."""
    from pyspark.sql.window import Window

    keys = list(group_cols or [])
    counts = df.groupBy(
        *keys, F.col(value_col).alias("_v")
    ).agg(F.count("*").cast("bigint").alias("_n"))
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(
        F.desc("_n"), F.asc_nulls_last("_v")
    )
    out = (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            *keys,
            F.col("_v").alias("mode"),
            F.col("_n").alias("n_mode"),
        )
    )
    return out.orderBy(*keys) if keys else out
