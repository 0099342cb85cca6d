"""Unigram language-model scoring (CCNet-style perplexity proxy).

A standard pretraining-corpus quality gate (Wenzek et al., "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
LREC 2020) scores documents by per-token log-probability under a
reference LM and drops the worst tail. The full KenLM 5-gram model needs
an external library; the unigram version is the dependency-light,
SQL-expressible member of the same family and is what this engine ships:
fit add-one-smoothed unigram probabilities on a reference corpus, score
each document by mean token log-prob.

Determinism contract (same device as operators/similarity.py): per-term
log-probs are rounded once to integer millionths (bigint), so the per-doc
sum is an associative integer sum -- identical under any partitioning and
identical to the DuckDB oracle twin -- and the mean is a single double
division at the end.

100 TB plan shape:
- model fit: one corpus scan -> explode(tokens) -> hash aggregate on the
  term (map-side partial combine does the heavy lifting); the model is
  vocabulary-sized, not corpus-sized.
- scoring: explode(tokens) -> join the model on the term -> hash
  aggregate on doc_id. The model join is left to AQE: a web-scale
  vocabulary (~10^7 terms) sits at the broadcast boundary, and AQE's
  runtime size check picks broadcast vs shuffle better than a static
  hint would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.dedup import tokenize
from taxi_data_pipeline_pset2_spark.operators.similarity import (
    round_half_up_int,
)

LOGP_SCALE = 1_000_000


def unigram_model(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, int, int]:
    """Fit an add-one-smoothed unigram model on ``docs``.

    Returns ``(model, total_tokens, vocab_size)`` where ``model`` is
    (term, n, logp_m): term count and ln((n+1)/(total+vocab)) in integer
    millionths. The two scalars come from one aggregate over the
    vocabulary-sized count table, not a second corpus scan.
    """
    counts = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    total, vocab = counts.agg(
        F.sum("n").cast("bigint"), F.count("*").cast("bigint")
    ).first()
    denom = float(total + vocab)
    model = counts.select(
        "term",
        "n",
        F.round(F.log((F.col("n") + 1).cast("double") / F.lit(denom)) * LOGP_SCALE)
        .cast("bigint")
        .alias("logp_m"),
    )
    return model, int(total), int(vocab)


def doc_logprob(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean token log-probability under the unigram model
    fit on ``model_docs`` (default: ``docs`` itself -- the self-scored
    corpus-hygiene pass).

    Returns (id, n_tokens, mean_logprob, ppl_proxy): ppl_proxy =
    exp(-mean_logprob) is the unigram perplexity, the number CCNet
    thresholds on. Out-of-vocabulary terms take the smoothed floor
    ln(1/(total+vocab)) -- a no-op when the model is fit on ``docs``.
    """
    model, total, vocab = unigram_model(
        model_docs if model_docs is not None else docs, text_col
    )
    import math

    floor_m = round_half_up_int(math.log(1.0 / (total + vocab)) * LOGP_SCALE)
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    per_doc = (
        toks.join(model.select("term", "logp_m"), "term", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce("logp_m", F.lit(floor_m))).alias("_sum_logp_m"),
        )
    )
    mean = F.col("_sum_logp_m").cast("double") / LOGP_SCALE / F.col("n_tokens")
    return per_doc.select(
        id_col,
        "n_tokens",
        F.round(mean, 6).alias("mean_logprob"),
        F.round(F.exp(-F.round(mean, 6)), 4).alias("ppl_proxy"),
    )


def logprob_filter(
    docs: DataFrame,
    max_ppl: float,
    model_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop documents whose unigram perplexity proxy exceeds ``max_ppl``
    (the CCNet tail cut). Join-shaped: docs survive by anti-joining the
    over-threshold id set, so the corpus-sized side streams once."""
    scored = doc_logprob(docs, model_docs, text_col, id_col)
    bad = scored.filter(F.col("ppl_proxy") > max_ppl).select(id_col)
    return docs.join(bad, id_col, "left_anti")


def bigram_model(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Fit an add-one-smoothed bigram model: P(cur|prev) =
    (c(prev,cur) + 1) / (c(prev) + V). Returns (bigram_counts,
    unigram_counts, vocab_size); log-probs are derived at scoring time
    so both count tables stay re-usable and re-aggregatable.

    One corpus scan: bigrams come from zipping the token array with its
    own tail (no self-join, no window shuffle) and explode into a hash
    aggregate on the pair. The model is vocabulary^2-bounded in theory,
    observed-bigrams-sized in practice."""
    toks = tokenize(F.col(text_col))
    pairs = _token_pairs(F.col(text_col), "prev", "cur")
    exploded = docs.select(F.explode(pairs).alias("p")).select("p.prev", "p.cur")
    bi = exploded.groupBy("prev", "cur").agg(F.count("*").alias("n_bi"))
    uni = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n_uni"))
    )
    vocab = uni.count()
    return bi, uni, vocab


def doc_bigram_logprob(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean bigram log-probability -- the order-2 member of
    the CCNet scoring family (the unigram one is :func:`doc_logprob`).
    Docs with < 2 tokens have no bigrams and are absent.

    Unseen (prev, cur) pairs back off to the smoothed floor
    1 / (c(prev) + V) when prev is known, and 1 / V when even prev is
    out of vocabulary. Integer-millionth determinism as everywhere."""
    import math

    bi, uni, vocab = bigram_model(
        model_docs if model_docs is not None else docs, text_col
    )
    pairs = _token_pairs(F.col(text_col), "prev", "cur")
    doc_pairs = docs.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, "p.prev", "p.cur"
    )
    joined = (
        doc_pairs.join(bi, ["prev", "cur"], "left")
        .join(uni.withColumnRenamed("term", "prev"), "prev", "left")
    )
    denom = F.coalesce(F.col("n_uni"), F.lit(0)) + F.lit(vocab)
    num = F.coalesce(F.col("n_bi"), F.lit(0)) + 1
    logp_m = F.round(
        F.log(num.cast("double") / denom.cast("double")) * LOGP_SCALE
    ).cast("bigint")
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum(logp_m).alias("_sum_logp_m"),
    )
    mean = F.col("_sum_logp_m").cast("double") / LOGP_SCALE / F.col("n_bigrams")
    return per_doc.select(
        id_col,
        "n_bigrams",
        F.round(mean, 6).alias("mean_logprob"),
        F.round(F.exp(-F.round(mean, 6)), 4).alias("ppl_proxy"),
    )


def _token_pairs(col, f1: str = "w1", f2: str = "w2"):
    """Adjacent-token structs (``f1``, ``f2``) from a text column -- the
    shifted-slice zip, pure expressions (no UDF, no posexplode join).
    The single pair-extraction site every bigram operator shares."""
    t = tokenize(col)
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    return F.zip_with(
        F.slice(t, 1, n1),
        F.slice(t, 2, n1),
        lambda x, y: F.struct(x.alias(f1), y.alias(f2)),
    )


def bigram_doc_logprob(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    lam: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean log-probability under an INTERPOLATED bigram
    model (Jelinek-Mercer): p(w2|w1) = lam * c(w1 w2)/c(w1) +
    (1-lam) * p_uni(w2), with the add-one unigram as the backoff -- one
    rung up the n-gram ladder from ``doc_logprob`` toward the KenLM
    5-gram CCNet actually uses, still fully SQL-expressible. The first
    token scores under the unigram alone.

    Returns (id, n_tokens, mean_logprob, ppl_proxy). Docs with no
    tokens (NULL text) are absent, matching :func:`doc_logprob`'s
    absence semantics -- without the filter they emitted a row whose
    metrics were NULL (mean = sum / NULL n_tokens), a shape no
    threshold downstream can act on. Same determinism device as the
    unigram path: each position's log term is rounded once to integer
    millionths, so per-doc sums are associative integer sums. ``lam``
    should be a dyadic rational (default 0.75) so the literals are
    exact in both engines.

    Plan: bigram extraction is the shifted-slice zip (scan-shaped);
    model counts are two vocabulary-sized hash aggregates; scoring
    joins the pair frame to the bigram and unigram tables (AQE picks
    broadcast vs shuffle by their runtime size) and ends in one per-doc
    aggregate."""
    import math

    if not 0.0 < lam < 1.0:
        raise ValueError("lam must be in (0, 1)")
    ref = model_docs if model_docs is not None else docs
    uni, total, vocab = unigram_model(ref, text_col)
    denom = float(total + vocab)
    floor_m = round_half_up_int(math.log(1.0 / denom) * LOGP_SCALE)

    big = (
        ref.select(F.explode(_token_pairs(F.col(text_col))).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").cast("bigint").alias("nb"))
    )
    cu = uni.select(F.col("term").alias("w1"), F.col("n").alias("cu"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("n").alias("n2"))

    pairs = docs.select(
        F.col(id_col), F.explode(_token_pairs(F.col(text_col))).alias("p")
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    scored = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(cu, "w1", "left")
        .join(u2, "w2", "left")
    )
    cond = F.when(
        F.col("cu").isNotNull() & F.col("nb").isNotNull(),
        F.lit(lam) * F.col("nb") / F.col("cu"),
    ).otherwise(F.lit(0.0))
    backoff = (
        F.lit(1.0 - lam)
        * (F.coalesce(F.col("n2"), F.lit(0)) + 1).cast("double")
        / F.lit(denom)
    )
    lp_m = F.round(F.log(cond + backoff) * LOGP_SCALE).cast("bigint")
    pair_sums = scored.groupBy(id_col).agg(F.sum(lp_m).alias("_pair_m"))

    first = docs.select(
        F.col(id_col),
        F.size(tokenize(F.col(text_col))).cast("bigint").alias("n_tokens"),
        F.element_at(tokenize(F.col(text_col)), 1).alias("term"),
    ).join(uni.select("term", "logp_m"), "term", "left")
    per_doc = first.join(pair_sums, id_col, "left").select(
        id_col,
        "n_tokens",
        (
            F.coalesce(F.col("logp_m"), F.lit(floor_m))
            + F.coalesce(F.col("_pair_m"), F.lit(0))
        ).alias("_sum_m"),
    )
    mean = F.col("_sum_m").cast("double") / LOGP_SCALE / F.col("n_tokens")
    return per_doc.filter(F.col("n_tokens") >= 1).select(
        id_col,
        "n_tokens",
        F.round(mean, 6).alias("mean_logprob"),
        F.round(F.exp(-mean), 6).alias("ppl_proxy"),
    )
