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
    # Spread an under-partitioned source once up front (r13): every
    # stage below is per-row CPU (md5 fingerprints, shingle hashes,
    # quality regexes, PII redaction) and would otherwise serialize in
    # a one-split scan task; no-op at real scale (guide 2.5).
    from taxi_data_pipeline_pset2_spark.operators.skew import (
        spread_small_input,
    )

    docs = spread_small_input(docs, key_cols=[id_col])

    # 1. exact dedup: survivors only (min id per content fingerprint).
    # The id frame is MATERIALIZED (localCheckpoint, the clustering.py
    # device), not persist()-ed: `kept` is referenced by several later
    # stages (decontamination reads it three times, the perplexity
    # model once), and without materialization every reference re-runs
    # the fingerprint aggregate over the corpus -- but a persist()
    # inside a lazily-returned pipeline has no release point and leaks
    # the cache for the session lifetime. The frame is id-sized.
    survivors = (
        exact_dedup_groups(docs, text_col, id_col)
        .select(F.col("keep_id").alias(id_col))
        .localCheckpoint(eager=True)
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


def curation_audit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    max_dup_line_ratio: float = 0.5,
    allowed_langs: tuple[str, ...] | None = None,
    near_dup_pairs: DataFrame | None = None,
    benchmarks: DataFrame | None = None,
    decontam_k: int = 13,
    max_ppl: float | None = None,
) -> DataFrame:
    """Drop-reason audit: one row PER INPUT DOC with ``drop_stage`` --
    the FIRST gate (in curate_corpus's stage order) that removed it, or
    NULL for survivors. The observability layer every curation pipeline
    needs: "how much did each gate cost me, and why is doc X gone?"
    answered without re-running the pipeline by hand.

    Stage labels: exact_dup, near_dup, decontaminated, low_quality,
    repetitive, language, high_perplexity (the last only when
    ``max_ppl`` is given -- it must mirror curate_corpus's optional
    tail cut, else a ppl-dropped doc audits as a phantom survivor; the
    unigram model is fit on the same post-dedup/decontam ``kept`` set
    the pipeline fits on). Stage id-sets are derived with the SAME
    operators curate_corpus composes, so audit and pipeline can't
    disagree; each set is survivor-ids-sized, and the flags chain as
    left-join markers plus row-local signal columns (no extra corpus
    shuffles beyond the stages themselves)."""
    s1 = (
        exact_dedup_groups(docs, text_col, id_col)
        .select(F.col("keep_id").alias(id_col))
        .withColumn("_a1", F.lit(True))
        # localCheckpoint, not persist: see curate_corpus -- a cache
        # inside a lazy return has no release point
        .localCheckpoint(eager=True)
    )
    kept = docs.join(s1.drop("_a1"), id_col)

    s2 = None
    if near_dup_pairs is not None:
        s2 = (
            resolve_duplicate_clusters(kept, near_dup_pairs, id_col)
            .select(id_col)
            .withColumn("_a2", F.lit(True))
        )
        kept = docs.join(s2.drop("_a2"), id_col)

    s3 = None
    if benchmarks is not None:
        s3 = (
            decontaminate(
                kept, benchmarks, k=decontam_k, text_col=text_col, id_col=id_col
            )
            .select(id_col)
            .withColumn("_a3", F.lit(True))
        )
        # the pipeline fits the ppl model on the post-decontam set
        kept = docs.join(s3.drop("_a3"), id_col)

    sig = with_pred_lang(
        with_dup_line_ratio(with_quality_score(docs, text_col), text_col),
        text_col,
    ).select(id_col, "quality_score", "dup_line_ratio", "pred_lang")

    out = docs.select(id_col).join(s1, id_col, "left")
    if s2 is not None:
        out = out.join(s2, id_col, "left")
    if s3 is not None:
        out = out.join(s3, id_col, "left")
    out = out.join(sig, id_col, "left")
    if max_ppl is not None:
        from taxi_data_pipeline_pset2_spark.operators.lm_score import doc_logprob

        ppl = doc_logprob(docs, model_docs=kept, text_col=text_col, id_col=id_col)
        out = out.join(ppl.select(id_col, "ppl_proxy"), id_col, "left")

    # gate conditions mirror the PIPELINE's keep-filters negated via
    # coalesce(cond, False): a NULL signal (e.g. NULL text -> NULL
    # quality_score) fails curate_corpus's `quality_score >= min` filter
    # and must therefore be LABELED dropped here, not fall through the
    # when-chain as a phantom survivor
    stage = F.when(F.col("_a1").isNull(), F.lit("exact_dup"))
    if s2 is not None:
        stage = stage.when(F.col("_a2").isNull(), F.lit("near_dup"))
    if s3 is not None:
        stage = stage.when(F.col("_a3").isNull(), F.lit("decontaminated"))
    stage = stage.when(
        ~F.coalesce(F.col("quality_score") >= min_quality, F.lit(False)),
        F.lit("low_quality"),
    ).when(
        ~F.coalesce(F.col("dup_line_ratio") <= max_dup_line_ratio, F.lit(False)),
        F.lit("repetitive"),
    )
    if allowed_langs:
        stage = stage.when(
            ~F.coalesce(
                F.col("pred_lang").isin(list(allowed_langs)), F.lit(False)
            ),
            F.lit("language"),
        )
    if max_ppl is not None:
        # drop-filter, not a negated keep-filter: the pipeline's
        # logprob_filter removes ppl > max_ppl and lets UNSCORED docs
        # (no tokens) survive -- NULL ppl must therefore NOT label
        stage = stage.when(
            F.coalesce(F.col("ppl_proxy") > max_ppl, F.lit(False)),
            F.lit("high_perplexity"),
        )
    return out.select(id_col, stage.alias("drop_stage"))
