"""DSIR-style importance resampling for targeted data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023 --
public method, reimplemented from the paper's description): score each
candidate document by the log-likelihood ratio of a TARGET-domain
hashed-n-gram model over a SOURCE (raw-pool) model, then keep the
top-weighted documents. The standard recipe for "give me web data that
looks like Wikipedia/books/code" at pretraining scale.

Feature space: unigrams + bigrams hashed into ``n_buckets`` buckets
(hashed n-gram features are what make this tractable -- the model is a
fixed-size count vector, never a vocabulary). Both models are add-one
smoothed over the bucket space.

Determinism contract (same device as operators/lm_score.py): per-bucket
log-probs are rounded once to integer millionths (bigint); a document's
log-ratio is then an associative integer sum of cnt * (logp_t - logp_s)
-- identical under any partitioning and identical to the DuckDB oracle
twin. The hash is the engine-portable ``stable_hash64`` (md5 prefix).

100 TB plan shape:
- model fit: one scan per corpus -> explode(grams) -> hash aggregate on
  the BUCKET id (map-side combine collapses to <= n_buckets rows per
  task); the model is n_buckets rows, broadcast everywhere after.
- scoring: one candidate scan -> explode(grams) -> per-(doc, bucket)
  hash aggregate -> broadcast-join the two models -> per-doc aggregate.
  Two shuffles total (doc-bucket agg, doc agg), both on corpus-sized
  but narrow frames; no UDFs anywhere, everything codegen.
- selection: global top-k via TakeOrderedAndProject (k driver-sized),
  or a threshold filter for streaming-sized outputs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.dedup import (
    stable_hash64,
    tokenize,
)
from taxi_data_pipeline_pset2_spark.operators.similarity import (
    round_half_up_int,
)

LOGP_SCALE = 1_000_000
DEFAULT_BUCKETS = 1024


def _grams(text_col: str):
    """Unigrams + bigrams of the whitespace tokenization, one array."""
    toks = tokenize(F.col(text_col))
    n_bi = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_bi),
        F.slice(toks, 2, n_bi),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def hashed_gram_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Exploded hashed features: (id?, bucket) one row per gram
    occurrence. ``id_col=None`` drops the id (model-fit path)."""
    keep = [F.col(id_col)] if id_col else []
    # The gram explode + per-gram md5 below is the entry's hot loop; an
    # under-partitioned source would run ~10M hashes in one scan task
    # (guide 2.5). No-op when the scan is already wide.
    from taxi_data_pipeline_pset2_spark.operators.skew import (
        spread_small_input,
    )

    docs = spread_small_input(
        docs.select(*keep, F.col(text_col)),
        # id-keyed when an id exists; the model-fit path (no id) has
        # only the text column, so the full-row default applies there
        key_cols=[id_col] if id_col else None,
    )
    exploded = docs.select(*keep, F.explode(_grams(text_col)).alias("g"))
    return exploded.select(
        *keep,
        F.pmod(stable_hash64(F.col("g")), F.lit(n_buckets))
        .cast("bigint")
        .alias("bucket"),
    )


def bucket_model(
    docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> tuple[DataFrame, int]:
    """Add-one-smoothed hashed-n-gram model: ((bucket, logp_m), floor_m)
    with logp_m = round(ln((n_b + 1) / (total + n_buckets)) * 1e6) as
    bigint; ``floor_m`` is the smoothed log-prob of an unseen bucket.
    One scan; the returned frame is <= n_buckets rows."""
    counts = (
        hashed_gram_buckets(docs, text_col, None, n_buckets)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n")).first()[0] or 0
    denom = float(total + n_buckets)
    model = counts.select(
        "bucket",
        F.round(F.log((F.col("n") + 1).cast("double") / F.lit(denom)) * LOGP_SCALE)
        .cast("bigint")
        .alias("logp_m"),
    )
    floor_m = round_half_up_int(math.log(1.0 / denom) * LOGP_SCALE)
    return model, floor_m


def dsir_logratio(
    candidates: DataFrame,
    target: DataFrame,
    source: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, n_grams, log_ratio): importance weight of each candidate,
    log p_target(doc) - log p_source(doc) under the hashed-n-gram
    models. ``source`` defaults to the candidate pool itself (the DSIR
    raw-distribution estimate). Positive = more target-like."""
    p_t, floor_t = bucket_model(target, text_col, n_buckets)
    feats = (
        hashed_gram_buckets(candidates, text_col, id_col, n_buckets)
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    if source is None:
        # the DSIR default (source = the candidate pool) needs the same
        # bucket counts the feature frame already holds: checkpoint the
        # features once and derive the source model from them instead of
        # re-scanning + re-hashing the corpus (one full scan saved; at
        # bench scale this was the single most expensive catalog entry)
        feats = feats.localCheckpoint(eager=False)
        counts = feats.groupBy("bucket").agg(F.sum("cnt").alias("n"))
        total = counts.agg(F.sum("n")).first()[0] or 0
        denom = float(total + n_buckets)
        p_s = counts.select(
            "bucket",
            F.round(
                F.log((F.col("n") + 1).cast("double") / F.lit(denom)) * LOGP_SCALE
            )
            .cast("bigint")
            .alias("logp_m"),
        )
        floor_s = round_half_up_int(math.log(1.0 / denom) * LOGP_SCALE)
    else:
        p_s, floor_s = bucket_model(source, text_col, n_buckets)
    joined = feats.join(
        F.broadcast(p_t.withColumnRenamed("logp_m", "logp_t")), "bucket", "left"
    ).join(
        F.broadcast(p_s.withColumnRenamed("logp_m", "logp_s")), "bucket", "left"
    )
    term_m = F.col("cnt") * (
        F.coalesce("logp_t", F.lit(floor_t)) - F.coalesce("logp_s", F.lit(floor_s))
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.sum(term_m).cast("bigint").alias("_ratio_m"),
        )
        .select(
            id_col,
            "n_grams",
            F.round(F.col("_ratio_m").cast("double") / LOGP_SCALE, 6).alias(
                "log_ratio"
            ),
        )
    )


def dsir_select_topk(
    candidates: DataFrame,
    target: DataFrame,
    k: int,
    source: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """The k most target-like candidates by log-ratio (ties by id --
    deterministic; the paper's Gumbel-noise resampling is a seeded
    variant of the same ordering and is left to the caller's RNG
    policy). Plans as TakeOrderedAndProject: no global sort
    materialization, k rows to the driver at most."""
    scored = dsir_logratio(candidates, target, source, text_col, id_col, n_buckets)
    return scored.orderBy(F.desc("log_ratio"), F.asc(id_col)).limit(k)
