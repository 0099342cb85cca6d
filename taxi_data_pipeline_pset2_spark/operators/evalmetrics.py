"""Distributed model-evaluation metrics: rank-sum ROC-AUC, calibration
bins + ECE, Cohen's kappa, decile lift/gains.

Not in the reference (its analytics stop at business aggregates;
`data_analysis.ipynb` has no model-eval step), but any pipeline that
scores documents or trains filters (quality classifiers, dedup
verifiers, lang-id) needs to evaluate those scores at corpus scale --
sklearn.metrics on a driver-side collect() stops working long before
100 TB.

Determinism contract (the dec_sum discipline): every metric reduces to
EXACT integer/decimal sufficient statistics (order-independent under
any partitioning), combined in one fixed double expression and rounded
to 6 dp -- so each has a bit-exact DuckDB twin.

100 TB shapes:
- ``binary_auc``: one hash aggregate to per-(group, score) counts, then
  a window over DISTINCT scores within each group -- never a sort of
  the raw rows. With no group_cols the window is a single partition
  over distinct scores only (bounded by score cardinality: ~1e6 for
  2-dp money-like scores, fine; for unbounded float scores quantize
  first or pass group_cols).
- ``calibration_bins`` / ``expected_calibration_error``: one hash
  aggregate to n_bins rows. Nothing else.
- ``cohen_kappa``: contingency aggregate + two broadcast marginals,
  identical plan shape to drift.cramers_v.
- ``decile_lift``: exact global ntile WITHOUT a single-partition sort
  of the data: per-score counts -> cumulative offsets (window over
  distinct scores), join offsets back on score, row_number partitioned
  BY SCORE for the tie-break -- the only unpartitioned window runs
  over distinct scores.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binary_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group_cols..., n_pos, n_neg, auc): tie-aware Mann-Whitney
    ROC-AUC of ``score_col`` ranking ``label_col`` (boolean-castable)
    per group. Rows with a NULL label or score are excluded. auc is
    NULL when a group has no positives or no negatives.

    Tie handling matches average-rank AUC exactly: over distinct
    scores s ascending,
        num2 = sum( pos(s) * (2 * cum_neg_below(s) + neg(s)) )
        auc  = num2 / (2 * n_pos * n_neg)
    num2 is accumulated in DECIMAL(38,0) so the integer arithmetic is
    exact past bigint range (n_pos * n_neg overflows int64 around
    n = 6e9 rows).

    NaN scores are excluded like NULL (r11): Spark's total order ranks
    NaN above every real score, so an undefined score would otherwise
    silently count as the model's MOST confident prediction -- sklearn
    raises here; a distributed metric drops and moves on."""
    group_cols = group_cols or []
    lab = F.col(label_col).cast("boolean")
    sc = F.col(score_col).cast("double")
    per = (
        df.filter(lab.isNotNull() & sc.isNotNull() & ~F.isnan(sc))
        .groupBy(*group_cols, sc.alias("_s"))
        .agg(
            F.count(F.when(lab, F.lit(1))).cast("bigint").alias("_p"),
            F.count(F.when(~lab, F.lit(1))).cast("bigint").alias("_q"),
        )
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_below = F.coalesce(F.sum("_q").over(w), F.lit(0).cast("bigint"))
    contrib = (
        F.col("_p").cast("decimal(38,0)")
        * (F.lit(2) * cum_below + F.col("_q")).cast("decimal(38,0)")
    )
    agg = (
        per.withColumn("_c", contrib)
        .groupBy(*group_cols)
        .agg(
            F.sum("_p").cast("bigint").alias("n_pos"),
            F.sum("_q").cast("bigint").alias("n_neg"),
            F.sum("_c").alias("_num2"),
        )
    )
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    auc = F.col("_num2").cast("double") / (
        F.lit(2.0) * F.col("n_pos") * F.col("n_neg")
    )
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.round(F.when(ok, auc), 6).alias("auc"),
    )


def _calibration_agg(
    df: DataFrame, label_col: str, prob_col: str, n_bins: int
) -> DataFrame:
    """The shared per-bin sufficient statistics (bin, n, n_pos, _sp)
    behind calibration_bins and expected_calibration_error -- ONE
    definition of the bin formula and validity filter, so the two
    views cannot drift."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    lab = F.col(label_col).cast("boolean")
    p = F.col(prob_col).cast("double")
    valid = lab.isNotNull() & p.isNotNull() & (p >= 0.0) & (p <= 1.0)
    b = F.least(F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1))
    return (
        df.filter(valid)
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count(F.when(lab, F.lit(1))).cast("bigint").alias("n_pos"),
            F.sum(p.cast("decimal(28,10)")).cast("double").alias("_sp"),
        )
    )


def calibration_bins(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n, n_pos, conf, acc, gap): fixed-width reliability-diagram
    bins over a probability column in [0, 1]. bin = floor(p * n_bins)
    clamped to n_bins - 1 (so p = 1.0 lands in the last bin); rows with
    NULL or out-of-range p, or NULL label, are excluded. conf = mean
    predicted probability (exact decimal sum / n), acc = empirical
    positive rate, gap = |acc - conf| -- all rounded to 6 dp. Empty
    bins are absent (count 0 contributes 0 to ECE anyway).

    One hash aggregate to <= n_bins rows; the ECE rollup below reuses
    the same sufficient statistics (_calibration_agg)."""
    agg = _calibration_agg(df, label_col, prob_col, n_bins)
    conf = F.col("_sp") / F.col("n")
    acc = F.col("n_pos").cast("double") / F.col("n")
    return agg.select(
        "bin",
        "n",
        "n_pos",
        F.round(conf, 6).alias("conf"),
        F.round(acc, 6).alias("acc"),
        F.round(F.abs(acc - conf), 6).alias("gap"),
    )


def expected_calibration_error(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """One-row (n, ece, mce): expected / maximum calibration error over
    the same fixed-width bins as ``calibration_bins``.
    ece = sum_b (n_b / N) * |acc_b - conf_b|, mce = max_b |acc_b -
    conf_b|; both from UNROUNDED per-bin gaps, rounded to 6 dp at the
    end. The per-bin frame is n_bins rows, so the final reduce is
    free. Shares _calibration_agg with calibration_bins (one bin
    formula, one validity filter, one n_bins >= 1 validation)."""
    bins = _calibration_agg(df, label_col, prob_col, n_bins)
    gap = F.abs(
        F.col("n_pos").cast("double") / F.col("n") - F.col("_sp") / F.col("n")
    )
    return bins.agg(
        # an all-invalid input has zero bins: report n = 0, not NULL
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n"),
        F.round(
            F.sum(gap * F.col("n")) / F.sum("n").cast("double"), 6
        ).alias("ece"),
        F.round(F.max(gap), 6).alias("mce"),
    )


def cohen_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """One-row (n, po, pe, kappa): Cohen's kappa agreement between two
    discrete columns over the same label space. NULL is a legitimate
    category (NULL==NULL counts as agreement -- same contract as
    drift.cramers_v / stats.mutual_information).

    Exact integer form: agree = sum of the diagonal, penum =
    sum_k na_k * nb_k; kappa = (agree * n - penum) / (n^2 - penum) --
    one double division at the end, so partitioning cannot perturb it.
    Plan: one contingency-free pass for agree + two category-sized
    marginal aggregates joined broadcast. kappa is NULL when pe = 1
    (both raters constant)."""
    a = F.col(col_a)
    b = F.col(col_b)
    base = df.select(a.alias("_a"), b.alias("_b"))
    counts = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.col("_a").eqNullSafe(F.col("_b")), F.lit(1)))
        .cast("bigint")
        .alias("agree"),
    )
    ra = base.groupBy(F.col("_a").alias("_ka")).agg(
        F.count(F.lit(1)).cast("bigint").alias("na")
    )
    cb = base.groupBy(F.col("_b").alias("_kb")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nb")
    )
    pe = (
        ra.join(F.broadcast(cb), F.col("_ka").eqNullSafe(F.col("_kb")))
        .agg(
            F.coalesce(
                # cast each factor BEFORE the product: bigint na*nb
                # overflows once both marginals pass ~3e9 rows
                F.sum(
                    F.col("na").cast("decimal(19,0)")
                    * F.col("nb").cast("decimal(19,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("penum")
        )
    )
    j = counts.crossJoin(F.broadcast(pe))
    n = F.col("n")
    # try_divide: an empty input gives n = 0 with non-null zero
    # numerators -- a plain division is an ANSI DIVIDE_BY_ZERO crash
    # instead of an n=0 row with NULL metrics
    po = F.try_divide(F.col("agree").cast("double"), n.cast("double"))
    pe_d = F.try_divide(
        F.col("penum").cast("double"), n.cast("double") * n
    )
    den = (n.cast("decimal(38,0)") * n - F.col("penum")).cast("double")
    num = (
        F.col("agree").cast("decimal(38,0)") * n - F.col("penum")
    ).cast("double")
    return j.select(
        n.alias("n"),
        F.round(po, 6).alias("po"),
        F.round(pe_d, 6).alias("pe"),
        F.round(F.when(den != 0, num / den), 6).alias("kappa"),
    )


def decile_lift(
    df: DataFrame,
    label_col: str,
    score_col: str,
    key_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """(tile, n, n_pos, pos_rate, lift, cum_pos, cum_gain): rank rows by
    score descending (ties broken by ``key_col`` ascending -- pass a
    unique key for determinism), split into ``n_tiles`` equal-width
    rank tiles, and report per-tile response rate, lift vs the overall
    rate, and cumulative gains. Rows with NULL score or label are
    excluded; NaN scores are excluded like NULL (Spark's total order
    would otherwise rank every NaN-scored row INTO TILE 1 -- an
    undefined score occupying the model's top decile); tile =
    (rank - 1) * n_tiles div N + 1, PURE bigint floor division (the
    oracle twin must use the same integer formula, NOT SQL ntile(),
    whose remainder distribution differs, and not a double-divide
    floor, which misassigns boundary rows once (rank-1)*n_tiles passes
    2^53 and the quotient stops being exact).

    Exact global ranks without a single-partition sort of the data:
    (1) per-score counts, (2) cumulative offsets via a window over
    DISTINCT scores descending, (3) offsets joined back on score,
    (4) row_number partitioned BY SCORE orderBy key for the tie-break.
    Only step (2)'s window is unpartitioned and it runs over distinct
    scores, not rows."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    lab = F.col(label_col).cast("boolean")
    sc = F.col(score_col).cast("double")
    base = df.filter(lab.isNotNull() & sc.isNotNull() & ~F.isnan(sc)).select(
        sc.alias("_s"), lab.alias("_y"), F.col(key_col).alias("_k")
    )
    per_score = base.groupBy("_s").agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    w_off = (
        Window.orderBy(F.col("_s").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_score.select(
        "_s",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0).cast("bigint")).alias("_off"),
    )
    total = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.count(F.when(F.col("_y"), F.lit(1))).cast("bigint").alias("_np"),
    )
    w_tie = Window.partitionBy("_s").orderBy("_k")
    ranked = (
        base.join(offsets, "_s")
        .withColumn("_rank", F.col("_off") + F.row_number().over(w_tie))
        .crossJoin(F.broadcast(total))
    )
    # bigint floor division: operands are non-negative, so `div` equals
    # mathematical floor and stays exact at any N (a double-divide
    # floor drifts past 2^53)
    tile = (
        F.expr(f"(_rank - 1) * {int(n_tiles)} div _n").cast("int") + 1
    )
    tiles = (
        ranked.groupBy(tile.alias("tile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count(F.when(F.col("_y"), F.lit(1))).cast("bigint").alias("n_pos"),
            F.first("_n").alias("_nn"),
            F.first("_np").alias("_npp"),
        )
    )
    w_cum = (
        Window.orderBy("tile").rowsBetween(Window.unboundedPreceding, 0)
    )
    rate = F.col("n_pos").cast("double") / F.col("n")
    overall = F.col("_npp").cast("double") / F.col("_nn")
    cum_pos = F.sum("n_pos").over(w_cum)
    return tiles.select(
        "tile",
        "n",
        "n_pos",
        F.round(rate, 6).alias("pos_rate"),
        F.round(F.when(F.col("_npp") > 0, rate / overall), 6).alias("lift"),
        cum_pos.cast("bigint").alias("cum_pos"),
        F.round(
            F.when(F.col("_npp") > 0, cum_pos.cast("double") / F.col("_npp")), 6
        ).alias("cum_gain"),
    ).orderBy("tile")


def retrieval_eval(
    runs: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query retrieval metrics in the TREC run/qrels shape:
    (query, n_rel, hits, precision_at_k, recall_at_k, rr, ndcg_at_k).

    ``runs``: (query_col, doc_col, rank_col) -- a ranked result list,
    rank 1-based and unique per query (ranks > k are ignored).
    ``qrels``: (query_col, doc_col, rel_col) -- graded relevance > 0;
    absent pairs mean rel 0.

    - precision_at_k = hits / k (fixed k denominator, the standard
      definition -- a short result list is penalized);
    - recall_at_k = hits / n_rel, NULL when the query has no relevant
      docs;
    - rr = 1 / first relevant rank within top-k, 0.0 when none;
    - ndcg_at_k: graded DCG with log2(rank+1) discount over the run,
      IDCG from the qrels ranked rel-desc, NULL when IDCG = 0. Both
      DCG sums accumulate per-term integer millionths (bigint), so
      partitioning cannot perturb the 6-dp result.

    Query universe (r11, the trec_eval convention): every query that
    appears in the run's top-k OR has relevant qrels gets a row. A
    query the system returned nothing for (no run rows, or only ranks
    past k) previously vanished from the output entirely -- silently
    INFLATING any macro-average over the rows; it now scores 0 (hits
    0, precision 0, rr 0, ndcg 0) against its n_rel, exactly what
    trec_eval reports for an empty result list.

    100 TB shape: one equi-join runs<->qrels on (query, doc), hash
    aggregates per query, one qrels window partitioned BY QUERY for the
    ideal ranking -- everything partitioned, nothing driver-side."""
    if k < 1:
        raise ValueError("k must be >= 1")
    q = F.col("_q")
    run = runs.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).cast("bigint").alias("_r"),
    ).filter(F.col("_r") <= k)
    qr = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rel_col).cast("double").alias("_rel"),
    ).filter(F.col("_rel") > 0)
    joined = run.join(qr, ["_q", "_d"], "left").withColumn(
        "_rel", F.coalesce(F.col("_rel"), F.lit(0.0))
    )
    dcg_term = F.round(
        F.col("_rel") / F.log2(F.col("_r") + 1) * 1_000_000
    ).cast("bigint")
    per_q = joined.groupBy("_q").agg(
        F.count(F.when(F.col("_rel") > 0, F.lit(1))).cast("bigint").alias("hits"),
        F.min(F.when(F.col("_rel") > 0, F.col("_r"))).alias("_first"),
        F.sum(dcg_term).alias("_dcg_m"),
    )
    w_ideal = Window.partitionBy("_q").orderBy(
        F.col("_rel").desc(), F.col("_d")
    )
    ideal = (
        qr.withColumn("_ir", F.row_number().over(w_ideal))
        .filter(F.col("_ir") <= k)
        .groupBy("_q")
        .agg(
            F.sum(
                F.round(
                    F.col("_rel") / F.log2(F.col("_ir") + 1) * 1_000_000
                ).cast("bigint")
            ).alias("_idcg_m"),
        )
    )
    n_rel = qr.groupBy("_q").agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    out = (
        # full outer: a query with qrels but an empty top-k must score
        # 0, not vanish (see docstring); a query with run rows but no
        # qrels keeps n_rel = 0 as before
        per_q.join(n_rel, "_q", "full")
        .join(ideal, "_q", "left")
        .withColumn("n_rel", F.coalesce(F.col("n_rel"), F.lit(0).cast("bigint")))
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0).cast("bigint")))
        .withColumn("_dcg_m", F.coalesce(F.col("_dcg_m"), F.lit(0).cast("bigint")))
    )
    prec = F.col("hits").cast("double") / k
    rec = F.when(
        F.col("n_rel") > 0, F.col("hits").cast("double") / F.col("n_rel")
    )
    rr = F.coalesce(1.0 / F.col("_first").cast("double"), F.lit(0.0))
    ndcg = F.when(
        F.col("_idcg_m") > 0,
        F.col("_dcg_m").cast("double") / F.col("_idcg_m"),
    )
    return out.select(
        q.alias(query_col),
        "n_rel",
        "hits",
        F.round(prec, 6).alias("precision_at_k"),
        F.round(rec, 6).alias("recall_at_k"),
        F.round(rr, 6).alias("rr"),
        F.round(ndcg, 6).alias("ndcg_at_k"),
    )


def rrf_fuse(
    runs: DataFrame,
    k: int = 60,
    top: int | None = None,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    run_col: str = "run_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of several ranked
    runs into one: score(d) = sum over runs of 1 / (k + rank_r(d)),
    with the conventional k = 60 damping. Returns (query, doc,
    rrf_score, fused_rank), optionally truncated to ``top`` per query.
    Ties break by doc id, so the fused ranking is deterministic.

    The per-(query, doc) score accumulates integer billionths (each
    term is an exact function of small-integer rank, so rounding is
    stable), making the 9-dp score and therefore the fused order
    engine-portable. One hash aggregate + one query-partitioned window."""
    if k < 0:
        # k + rank hits zero at k = -1 / rank 1: an infinite term that
        # ANSI-crashes the bigint cast mid-job -- reject up front
        raise ValueError(f"k must be >= 0, got {k}")
    score_b = F.round(
        F.lit(1_000_000_000.0) / (F.lit(k) + F.col(rank_col).cast("double"))
    ).cast("bigint")
    agg = (
        runs.select(
            F.col(query_col).alias("_q"),
            F.col(doc_col).alias("_d"),
            score_b.alias("_sb"),
        )
        .groupBy("_q", "_d")
        .agg(F.sum("_sb").alias("_score_b"))
    )
    w = Window.partitionBy("_q").orderBy(F.col("_score_b").desc(), F.col("_d"))
    out = agg.withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
    if top is not None:
        out = out.filter(F.col("fused_rank") <= top)
    return out.select(
        F.col("_q").alias(query_col),
        F.col("_d").alias(doc_col),
        (F.col("_score_b").cast("double") / 1_000_000_000).alias("rrf_score"),
        "fused_rank",
    )


def fit_isotonic(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration map per group:
    (group_cols..., score, n, fitted_p) -- the L2-optimal monotone fit
    of the positive rate as a function of score, via the classic
    pool-adjacent-violators algorithm (PAVA). Where calibration_bins
    MEASURES miscalibration, this FIXES it: join a scored frame on
    (group, score) to replace raw scores with calibrated probabilities
    (equi-join application; unseen scores need a nearest-threshold
    lookup, out of scope here).

    100 TB shape: rows collapse FIRST to per-(group, distinct score)
    (sum_label, count) aggregates -- the only thing PAVA needs -- then
    an Arrow applyInPandas kernel runs linear-time PAVA per group.
    Kernel memory is O(distinct scores in the group), the same bound
    binary_auc documents; the raw rows are never sorted or collected.
    PAVA itself is from scratch (stack-based merge, weighted means kept
    as exact integer (sum, count) pairs until the final division)."""
    import pandas as pd

    group_cols = group_cols or []
    lab = F.col(label_col).cast("boolean")
    sc = F.col(score_col).cast("double")
    per = (
        df.filter(lab.isNotNull() & sc.isNotNull() & ~F.isnan(sc))
        .groupBy(*group_cols, sc.alias("score"))
        .agg(
            F.count(F.when(lab, F.lit(1))).cast("bigint").alias("_pos"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )

    out_fields = ", ".join(
        [f"`{c}` {t}" for c, t in _schema_pairs(per, group_cols)]
        + ["score double", "n bigint", "fitted_p double"]
    )

    def pava(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("score").reset_index(drop=True)
        # stack of blocks [sum_pos, count, n_rows]; merge while the
        # previous block's mean is >= the new block's mean (weighted
        # means compared as exact integer cross-products). Merging on
        # equality is harmless and keeps blocks canonical.
        blocks: list[list[int]] = []
        for pos, cnt in zip(pdf["_pos"].to_numpy(), pdf["n"].to_numpy()):
            cur = [int(pos), int(cnt), 1]
            while blocks and blocks[-1][0] * cur[1] >= cur[0] * blocks[-1][1]:
                prev = blocks.pop()
                cur = [prev[0] + cur[0], prev[1] + cur[1], prev[2] + cur[2]]
            blocks.append(cur)
        out_p: list[float] = []
        for pos, cnt, n_rows in blocks:
            # 6-dp via floor(q*1e6 + 0.5)/1e6, NOT python round():
            # round() is banker's (half-even) while the DuckDB oracle
            # twin can only express half-up; this exact expression is
            # reproducible in SQL (floor + identical IEEE ops), which is
            # what upgraded this operator from rows-only to hash-verified
            q = pos / cnt
            out_p.extend([math.floor(q * 1e6 + 0.5) / 1e6] * n_rows)
        res = pdf[[*group_cols, "score", "n"]].copy()
        res["fitted_p"] = out_p
        return res

    if group_cols:
        return per.groupBy(*group_cols).applyInPandas(pava, out_fields)
    # no groups: a constant key column keeps the kernel and schema
    # uniform (applyInPandas passes data columns, not grouping exprs)
    per1 = per.withColumn("_one", F.lit(1))

    def pava1(pdf: pd.DataFrame) -> pd.DataFrame:
        res = pava(pdf.drop(columns=["_one"]))
        return res

    return (
        per1.groupBy("_one")
        .applyInPandas(pava1, out_fields)
    )


def _schema_pairs(df: DataFrame, cols: list[str]) -> list[tuple[str, str]]:
    """(name, spark-sql type) for the given columns of ``df``."""
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return [(c, by_name[c]) for c in cols]
