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
    customer with any activity always scores; a metric that is fully
    unknown for a customer (no dated row / no non-NULL amount) ranks at
    that metric's WORST end, never the best tile. Ordered by
    customer."""
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
    # oldest first -> the most recent customer lands in tile n_bins.
    # NULLS FIRST, explicitly on BOTH engines (Spark's asc defaults
    # nulls-first, DuckDB's nulls-last): each ordering's FIRST end is
    # its WORST score, and an unknown metric must score worst -- the
    # r11 finding was NULLS LAST here, which tiled a customer with no
    # dated order as MOST recent and a NULL total spend as TOP spender.
    w_r = Window.orderBy(
        F.desc_nulls_first("recency_days"), F.asc("customer")
    )
    w_f = Window.orderBy(F.asc_nulls_first("frequency"), F.asc("customer"))
    w_m = Window.orderBy(F.asc_nulls_first("monetary"), F.asc("customer"))
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


def abc_classification(
    df: DataFrame,
    key_col: str,
    value_col: str,
    a_cut: float = 0.8,
    b_cut: float = 0.95,
) -> DataFrame:
    """Pareto / ABC inventory classification: aggregate ``value_col``
    per key, rank by value desc (key asc on ties), and classify by
    CUMULATIVE value share -- A while cum share <= ``a_cut``, B while
    <= ``b_cut``, else C (the 80/15/5 warehouse convention). The
    catalog's Lorenz-curve companion to gini_coefficient: gini scores
    the concentration, this names the heavy keys.

    Returns (key, value, rank, share, cum_share, abc_class) ordered by
    rank. One hash aggregate to key cardinality, then rank + running-sum
    windows over the aggregated frame (key-sized, not fact-sized);
    values accumulate as DECIMAL and the running sum is the ordered
    prefix sum of exact decimals, so shares are partition-independent.
    Keys with NULL values are excluded; a zero/negative total leaves
    shares NULL (classification undefined)."""
    from pyspark.sql import Window

    if not 0 < a_cut < b_cut <= 1:
        raise ValueError(f"need 0 < a_cut < b_cut <= 1, got {a_cut}, {b_cut}")
    per_key = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_v"))
    )
    w_rank = Window.orderBy(F.desc("_v"), F.asc("key"))
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = per_key.select(
        "key",
        F.col("_v").cast("double").alias("value"),
        F.row_number().over(w_rank).cast("bigint").alias("rank"),
        F.sum("_v").over(w_cum).cast("double").alias("_cum"),
    )
    totals = per_key.agg(F.sum("_v").cast("double").alias("_tot"))
    j = ranked.crossJoin(F.broadcast(totals))
    share = F.when(F.col("_tot") > 0, F.col("value") / F.col("_tot"))
    cum_share = F.when(F.col("_tot") > 0, F.col("_cum") / F.col("_tot"))
    cls = F.when(cum_share <= a_cut, "A").when(cum_share <= b_cut, "B").otherwise("C")
    return j.select(
        "key",
        F.round("value", 6).alias("value"),
        "rank",
        F.round(share, 6).alias("share"),
        F.round(cum_share, 6).alias("cum_share"),
        F.when(F.col("_tot") > 0, cls).alias("abc_class"),
    ).orderBy("rank")
