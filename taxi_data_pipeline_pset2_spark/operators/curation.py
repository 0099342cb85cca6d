"""End-to-end corpus curation: the composed pipeline a pretraining-data
team actually runs, built entirely from this repo's operators --
demonstrating that the pieces compose into one lazy DataFrame program
(single Catalyst plan per stage, no driver-side row loops anywhere).

Stages (each optional, all deterministic):
 1. exact dedup        -- keep each content fingerprint's min-id survivor
 1b. near-dup resolve  -- caller-supplied candidate pairs (jaccard /
     minhash / embedding) collapsed to one min-id survivor per
     connected component
 1c. decontamination   -- drop docs colliding with a benchmark/eval set
     (GPT-3-style k-gram collision)
 2. PII redaction      -- emails/IPs/phones scrubbed in place
 3. quality gate       -- composite score + repetition thresholds,
     optionally a CCNet-style unigram-perplexity tail cut
 4. language filter    -- keep the allowed predicted languages
 5. split assignment   -- reshuffle-stable train/val/test hash split

The output carries provenance columns (quality_score, dup_line_ratio,
pred_lang, split) so downstream consumers can re-slice without re-running
the gates. At 100 TB every stage is scan-shaped except the dedup
aggregate (one shuffle on the md5 fingerprint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.components import (
    resolve_duplicate_clusters,
)
from taxi_data_pipeline_pset2_spark.operators.decontamination import decontaminate
from taxi_data_pipeline_pset2_spark.operators.dedup import exact_dedup_groups
from taxi_data_pipeline_pset2_spark.operators.sampling import hash_split
from taxi_data_pipeline_pset2_spark.operators.text import (
    redact_pii,
    with_dup_line_ratio,
    with_pred_lang,
    with_quality_score,
)


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    max_dup_line_ratio: float = 0.5,
    allowed_langs: tuple[str, ...] | None = None,
    split_weights: dict[str, float] | None = None,
    near_dup_pairs: DataFrame | None = None,
    benchmarks: DataFrame | None = None,
    decontam_k: int = 13,
    max_ppl: float | None = None,
) -> DataFrame:
    """Returns the curated corpus: one row per surviving doc with
    ``text`` redacted and provenance columns attached.

    ``near_dup_pairs``: optional (doc_a, doc_b) candidate pairs from any
    generator (`jaccard_pairs`, `minhash_candidate_pairs`, embedding
    LSH); clusters collapse to their min-id member. Pairs computed on
    the pre-dedup corpus are safe: a cluster's global min id is also the
    min of its own exact-fingerprint group, so it survives stage 1.

    ``benchmarks``: optional eval-set docs (same text column name); any
    train doc sharing a ``decontam_k``-gram with them is dropped.

    ``max_ppl``: optional unigram-perplexity ceiling (operators/lm_score);
    the model is fit on the already-deduped corpus so boilerplate mass
    cannot drag the reference distribution toward itself.
    """
    # 1. exact dedup: survivors only (min id per content fingerprint).
    # The id frame is persisted: `kept` is referenced by several later
    # stages (decontamination reads it three times, the perplexity model
    # once), and without the cache every reference re-runs the
    # fingerprint aggregate over the corpus. The cached frame is
    # id-sized, not corpus-sized.
    survivors = (
        exact_dedup_groups(docs, text_col, id_col)
        .select(F.col("keep_id").alias(id_col))
        .persist()
    )
    kept = docs.join(survivors, id_col)

    # 1b. near-dup cluster resolution over caller-chosen candidate pairs
    if near_dup_pairs is not None:
        kept = resolve_duplicate_clusters(kept, near_dup_pairs, id_col)

    # 1c. benchmark decontamination (any-collision policy)
    if benchmarks is not None:
        kept = decontaminate(
            kept, benchmarks, k=decontam_k, text_col=text_col, id_col=id_col
        )

    # 2+3. per-doc signals attached as chained projections -- the gates
    # are properties OF the row, so they never need a join (each join
    # here would both shuffle and re-derive the dedup+decon subtree)
    out = (
        with_pred_lang(
            with_dup_line_ratio(with_quality_score(kept, text_col), text_col),
            text_col,
        )
        .filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("dup_line_ratio") <= max_dup_line_ratio)
        )
    )
    if allowed_langs:
        out = out.filter(F.col("pred_lang").isin(list(allowed_langs)))

    # 3b. optional unigram-perplexity tail cut (model fit on the deduped
    # corpus, scored over the gate survivors)
    if max_ppl is not None:
        from taxi_data_pipeline_pset2_spark.operators.lm_score import logprob_filter

        out = logprob_filter(out, max_ppl, model_docs=kept, text_col=text_col, id_col=id_col)

    # redact AFTER the gates (signals reflect the original content)
    out = out.withColumn(text_col, redact_pii(F.col(text_col)))

    # 5. stable split assignment rides along as the final column
    return hash_split(out, id_col=id_col, weights=split_weights)
