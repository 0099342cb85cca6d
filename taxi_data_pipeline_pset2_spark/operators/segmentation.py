"""RFM customer segmentation: recency / frequency / monetary quintile
scores (Hughes, "Strategic Database Marketing" 1994 -- the classic
behavioral segmentation every CRM pipeline ships).

Scale shape: the fact table reduces to ONE customer-sized hash
aggregate (count + decimal sum + max date per customer) before any
scoring; the NTILE scoring then runs over the customer dimension. An
exact global NTILE is a total order -- one reducer -- which is the
right trade for dimension-sized frames (10^6-10^8 customers); for a
corpus-scale scoring column use the sketch-boundary route instead
(operators/profiling.py ``quantile_bin`` cross-referenced in the
docstring) and accept approximate bin edges.

Determinism: scores tie-break on the customer key inside the NTILE
ORDER BY, so equal metric values still land in a reproducible tile;
monetary accumulates as DECIMAL; recency is an integer day diff from
the frame's own max date (self-contained -- no wall clock).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rfm_segments(
    df: DataFrame,
    customer_col: str,
    date_col: str,
    amount_col: str,
    n_bins: int = 5,
) -> DataFrame:
    """Per-customer RFM scores: (customer, recency_days, frequency,
    monetary, r_score, f_score, m_score, rfm) with each score in
    1..n_bins, n_bins = BEST (most recent / most frequent / highest
    spend -- the marketing convention), and rfm = r*100 + f*10 + m.
    Recency is days from the customer's last activity to the frame's
    max date. NULL dates/amounts are excluded from their metric but a
    customer with any activity always scores. Ordered by customer."""
    if n_bins < 2 or n_bins > 99:
        raise ValueError(f"n_bins must be in [2, 99], got {n_bins}")
    per_cust = df.groupBy(F.col(customer_col).alias("customer")).agg(
        F.max(F.to_date(F.col(date_col))).alias("_last"),
        F.count(date_col).cast("bigint").alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    anchor = per_cust.agg(F.max("_last").alias("_anchor"))
    scored = per_cust.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_days",
        F.datediff(F.col("_anchor"), F.col("_last")).cast("bigint"),
    )
    # oldest first -> the most recent customer lands in tile n_bins;
    # explicit NULLS LAST: Spark's asc defaults nulls-first, DuckDB's
    # nulls-last, so all-NULL-metric customers would tile differently
    w_r = Window.orderBy(
        F.desc_nulls_last("recency_days"), F.asc("customer")
    )
    w_f = Window.orderBy(F.asc_nulls_last("frequency"), F.asc("customer"))
    w_m = Window.orderBy(F.asc_nulls_last("monetary"), F.asc("customer"))
    out = (
        scored.withColumn("r_score", F.ntile(n_bins).over(w_r))
        .withColumn("f_score", F.ntile(n_bins).over(w_f))
        .withColumn("m_score", F.ntile(n_bins).over(w_m))
    )
    return out.select(
        "customer",
        "recency_days",
        "frequency",
        F.round("monetary", 2).alias("monetary"),
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        )
        .cast("int")
        .alias("rfm"),
    ).orderBy("customer")
