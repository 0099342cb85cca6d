"""Leakage-safe out-of-fold target encoding -- the categorical
feature-engineering standard (Micci-Barreca, SIGKDD Explorations
2001) done the way competition/production pipelines must: a row's
category is encoded by the target mean computed WITHOUT its own fold,
so the feature never leaks the row's own label into training.

Composes the split machinery (operators/sampling.py hash_split /
group_kfold): any integer fold column works. The arithmetic trick
makes "mean excluding my fold" a subtraction, not k recomputes:

    oof_sum(c, f)  = sum(c) - sum(c, f)
    oof_cnt(c, f)  = cnt(c) - cnt(c, f)
    prior(f)       = (total_sum - sum(f)) / (total_cnt - cnt(f))
    encoding(c, f) = (oof_sum + smoothing * prior) / (oof_cnt + smoothing)

with additive smoothing toward the fold's own out-of-fold GLOBAL mean
(rare categories shrink to the prior; unseen-in-other-folds categories
get exactly the prior).

Scale shape: ONE hash aggregate over (category, fold) -- everything
else derives from it by category-sized and fold-sized re-aggregations
broadcast back. Output is the encoding TABLE, (category, fold)-sized,
never row-sized: applying it is a broadcast join the caller owns.
Determinism: all sums are exact DECIMAL; the encoding is one fixed
double expression rounded to 6 dp, so a DuckDB twin hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    fold_col: str,
    smoothing: float = 20.0,
) -> DataFrame:
    """Out-of-fold encoding table: (cat_col, fold_col, n_oof, prior,
    encoding) for every (category, fold) pair present, ordered. NULL
    categories are a legitimate category (they need an encoding too);
    NULL targets and NULL folds drop. Requires >= 2 folds (the
    out-of-fold prior is undefined when one fold holds everything --
    those rows return NULL encoding rather than a leaked global
    mean)."""
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    y = F.col(target_col).cast("double")
    base = df.filter(y.isNotNull() & F.col(fold_col).isNotNull()).select(
        F.col(cat_col).alias("_cat"),
        F.col(fold_col).cast("bigint").alias("_fold"),
        y.alias("_y"),
    )
    cf = base.groupBy("_cat", "_fold").agg(
        F.count("*").cast("bigint").alias("_cnt_cf"),
        F.sum(F.col("_y").cast("decimal(28,6)")).alias("_sum_cf"),
    )
    c = cf.groupBy("_cat").agg(
        F.sum("_cnt_cf").cast("bigint").alias("_cnt_c"),
        F.sum("_sum_cf").alias("_sum_c"),
    )
    f = cf.groupBy("_fold").agg(
        F.sum("_cnt_cf").cast("bigint").alias("_cnt_f"),
        F.sum("_sum_cf").alias("_sum_f"),
    )
    tot = cf.agg(
        F.sum("_cnt_cf").cast("bigint").alias("_cnt_t"),
        F.sum("_sum_cf").alias("_sum_t"),
    )
    # c is category-vocabulary-sized (AQE broadcasts it when it fits;
    # at huge vocabularies both sides of the _cat join share the cf
    # aggregate's partitioning); f and tot are fold-sized / one row.
    # NULL-safe key: a NULL category is a legitimate cohort.
    j = (
        cf.join(
            c.withColumnRenamed("_cat", "_cat_c"),
            F.col("_cat").eqNullSafe(F.col("_cat_c")),
        )
        .join(F.broadcast(f), "_fold")
        .crossJoin(F.broadcast(tot))
    )
    oof_cnt = F.col("_cnt_c") - F.col("_cnt_cf")
    oof_sum = (F.col("_sum_c") - F.col("_sum_cf")).cast("double")
    prior_den = (F.col("_cnt_t") - F.col("_cnt_f")).cast("double")
    prior = (F.col("_sum_t") - F.col("_sum_f")).cast("double") / prior_den
    enc = (oof_sum + F.lit(float(smoothing)) * prior) / (
        oof_cnt.cast("double") + F.lit(float(smoothing))
    )
    return j.select(
        F.col("_cat").alias(cat_col),
        F.col("_fold").alias(fold_col),
        oof_cnt.cast("bigint").alias("n_oof"),
        F.round(F.when(prior_den > 0, prior), 6).alias("prior"),
        F.round(
            F.when(
                (prior_den > 0)
                & ((oof_cnt.cast("double") + F.lit(float(smoothing))) > 0),
                enc,
            ),
            6,
        ).alias("encoding"),
    ).orderBy(cat_col, fold_col)


def hashed_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 1024,
    signed: bool = True,
) -> DataFrame:
    """Hashing-trick bag-of-words (Weinberger et al., ICML 2009): each
    document becomes sparse rows (id, idx, weight) with idx =
    portable_hash(token) mod dim and, when ``signed``, each token
    contributing +-1 by a second hash bit -- the sign trick makes
    collision noise zero-mean instead of additive. The
    fixed-dimension featurizer that needs NO vocabulary pass, no
    driver-side dictionary, no fitting: the property that makes it THE
    text vectorizer at 100 TB (HashingTF's semantics, re-expressed as
    plain exploded aggregates so the output is a relational frame, not
    an ML-local vector type).

    Shape: tokenize-explode (scan-shaped) + one (id, idx) hash
    aggregate; output is nnz-sized. Weights are exact integers; the
    md5 construction is the house engine-portable hashing, so a DuckDB
    twin rebuilds every index, sign and weight bit-exactly."""
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    from taxi_data_pipeline_pset2_spark.operators.dedup import (
        stable_hash64,
        tokenize,
    )

    # shared tokenize + stable_hash64: the engine-portable hash and the
    # tokenizer contract live in ONE place (dedup.py) so the oracle
    # twins cannot silently desynchronize from a local copy
    tok = F.explode(tokenize(F.col(text_col))).alias("_tok")
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), tok)
        .filter(F.col("_tok") != "")
    )
    h = stable_hash64(F.col("_tok"))
    idx = (h % dim).cast("int")
    if signed:
        # an independent bit: parity of the NEXT md5 hex digit
        sign_bit = F.conv(F.substring(F.md5(F.col("_tok")), 9, 1), 16, 10)
        contrib = F.when(sign_bit % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    else:
        contrib = F.lit(1)
    return (
        base.select("id", idx.alias("idx"), contrib.alias("_c"))
        .groupBy("id", "idx")
        .agg(F.sum("_c").cast("bigint").alias("weight"))
        .filter(F.col("weight") != 0)
        .orderBy("id", "idx")
    )
