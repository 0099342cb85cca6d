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
    Returns (value, n, frac) ordered by n desc, value asc."""
    if not 0 < support <= 1:
        raise ValueError(f"support must be in (0, 1], got {support}")
    candidates = df.freqItems([col], support).collect()[0][0]
    n_rows = df.count()
    if not candidates or n_rows == 0:
        return df.sparkSession.createDataFrame(
            [], f"value string, n long, frac double"
        )
    threshold = support * n_rows
    return (
        df.filter(F.col(col).isin(list(candidates)))
        .groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= threshold)
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
    row_support = max(support * n_docs / n_rows, 1e-4)
    candidates = e.freqItems(["shingle"], row_support).collect()[0][0]
    if not candidates:
        return docs.sparkSession.createDataFrame(
            [], "value string, n long, frac double"
        )
    return (
        e.filter(F.col("shingle").isin(list(candidates)))
        .groupBy(F.col("shingle").cast("string").alias("value"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= support * n_docs)
        .withColumn("frac", F.round(F.col("n") / F.lit(n_docs), 6))
        .orderBy(F.desc("n"), F.asc("value"))
    )
