"""End-to-end corpus curation: the composed operator pipeline must
dedup, gate, redact, and split in one lazy program."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.curation import curate_corpus
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_curation_pipeline_end_to_end(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant: 3 exact dups (must collapse), one PII doc (must be scrubbed),
    # one boilerplate doc (must be gated out by dup_line_ratio)
    base = docs.limit(3).collect()
    extra = [
        (1_000_000 + i, base[i].text) for i in range(3)
    ] + [
        (2_000_000, "the fast table row contact me at leak@example.com " * 5),
        (2_000_001, "\n".join(["the same fast line on the table"] * 20)),
    ]
    corpus = docs.unionByName(spark.createDataFrame(extra, "doc_id long, text string"))

    out = curate_corpus(
        corpus, min_quality=0.2, max_dup_line_ratio=0.5,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    rows = out.collect()
    ids = {r.doc_id for r in rows}

    # dedup: planted copies lose to the original min-id survivors
    assert not (ids & {1_000_000, 1_000_001, 1_000_002})
    assert {b.doc_id for b in base} <= ids | {b.doc_id for b in base}
    # boilerplate doc gated by repetition
    assert 2_000_001 not in ids
    # PII doc survives the gates but its text is scrubbed
    pii = [r for r in rows if r.doc_id == 2_000_000]
    if pii:  # quality gate may drop it depending on thresholds
        assert "leak@example.com" not in pii[0].text
        assert "<PII>" in pii[0].text
    assert out.filter(F.col("text").contains("@")).count() == 0

    # provenance + split columns present and valid
    assert {"quality_score", "dup_line_ratio", "pred_lang", "split"} <= set(out.columns)
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # deterministic: same corpus, same result set
    again = {
        r.doc_id
        for r in curate_corpus(
            corpus.repartition(9), min_quality=0.2, max_dup_line_ratio=0.5,
            split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
        ).collect()
    }
    assert again == ids


def test_curation_language_filter_without_label_column(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    langs = {
        r.pred_lang
        for r in curate_corpus(docs, allowed_langs=("en", "es")).collect()
    }
    assert langs <= {"en", "es"}


def test_curation_near_dup_and_decontamination_stages(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from taxi_data_pipeline_pset2_spark.operators.components import (
        connected_components,
    )
    from taxi_data_pipeline_pset2_spark.operators.dedup import jaccard_pairs

    pairs = jaccard_pairs(docs, threshold=0.5)
    cluster_losers = {
        r.node
        for r in connected_components(pairs)
        .filter(F.col("node") != F.col("component"))
        .collect()
    }
    assert cluster_losers, "fixture should contain near-dup clusters"

    bench = docs.orderBy("doc_id").limit(5)
    out = curate_corpus(
        docs, min_quality=0.0, max_dup_line_ratio=1.0,
        near_dup_pairs=pairs, benchmarks=bench, decontam_k=8,
    )
    ids = {r.doc_id for r in out.collect()}
    # near-dup cluster members (non-min) are gone
    assert ids.isdisjoint(cluster_losers)
    # benchmark members themselves collide fully -> gone
    assert ids.isdisjoint({r.doc_id for r in bench.collect()})


def test_curation_perplexity_tail_cut(spark, sf_dir):
    from taxi_data_pipeline_pset2_spark.operators.lm_score import doc_logprob

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # gibberish doc: every token OOV relative to the corpus model -> takes
    # the smoothed floor, the worst possible score
    noise = spark.createDataFrame(
        [(3_000_000, "qzxv1 qzxv2 qzxv3 qzxv4 qzxv5 qzxv6 qzxv7 qzxv8")],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(noise)
    cutoff = doc_logprob(corpus).approxQuantile("ppl_proxy", [0.95], 0.0)[0]
    out = curate_corpus(corpus, min_quality=0.0, max_dup_line_ratio=1.0, max_ppl=cutoff)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 3_000_000 not in ids
    assert len(ids) > 0


def test_curation_full_stack_composition(spark, sf_dir):
    """The whole dedup arsenal in one program: exact dedup + jaccard
    near-dups + duplicated-span pairs feed a single curate_corpus call
    with the perplexity tail cut -- one lazy composition, planted
    artifacts of every class handled."""
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.operators.dedup import jaccard_pairs
    from taxi_data_pipeline_pset2_spark.operators.spans import duplicated_spans

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.orderBy("doc_id").limit(2).collect()
    shared = " ".join(f"boiler{i}" for i in range(25))
    planted = spark.createDataFrame(
        [
            (4_000_000, base[0].text),                      # exact dup
            (4_000_001, f"{base[1].text} tiny tail"),        # jaccard near-dup
            (4_000_002, f"{shared} first framing words"),    # span pair A
            (4_000_003, f"other intro text {shared}"),       # span pair B
        ],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(planted)

    pairs = (
        jaccard_pairs(corpus, threshold=0.5).select("doc_a", "doc_b")
        .unionByName(
            duplicated_spans(corpus, min_tokens=20, k=8).select("doc_a", "doc_b")
        )
    )
    out = curate_corpus(
        corpus,
        min_quality=0.0,
        max_dup_line_ratio=1.0,
        near_dup_pairs=pairs,
    )
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 4_000_000 not in ids          # exact dup collapsed
    assert 4_000_001 not in ids          # jaccard near-dup resolved
    # span pair: exactly one of the two sharers survives
    assert len(ids & {4_000_002, 4_000_003}) == 1
    assert base[0].doc_id in ids and base[1].doc_id in ids


def test_curation_audit_first_failing_stage(spark):
    from taxi_data_pipeline_pset2_spark.operators.curation import (
        curate_corpus,
        curation_audit,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and the rain keeps "
        "falling on the quiet town where trains run slowly past the old "
        "station while people wait patiently for the morning light"
    )
    rows = [
        (1, good),
        (2, good),                      # exact dup of 1 -> exact_dup
        (3, "spam spam spam\n" * 20),   # repetitive lines
        (4, "999 111 222 333"),         # low quality (no alpha, no stopwords)
        (5, good + " unique tail of words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    audit = {
        r.doc_id: r.drop_stage for r in curation_audit(docs).collect()
    }
    assert len(audit) == len(rows)  # one row per input doc
    assert audit[1] is None and audit[5] is None
    assert audit[2] == "exact_dup"
    assert audit[3] in ("repetitive", "low_quality")
    assert audit[4] == "low_quality"
    # audit agrees with the pipeline: NULL drop_stage == survivor set
    survivors = {
        r.doc_id for r in curate_corpus(docs).select("doc_id").collect()
    }
    assert {i for i, s in audit.items() if s is None} == survivors


def test_curation_audit_null_signals_are_not_phantom_survivors(spark):
    """A doc whose signals come out NULL (NULL text) fails the
    pipeline's quality filter and must be LABELED dropped, not fall
    through the audit's when-chain as a survivor."""
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.operators.curation import (
        curate_corpus,
        curation_audit,
    )

    good = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "keeps falling on the quiet grey town tonight and nobody waits"
    )
    docs = spark.createDataFrame(
        [(1, good), (2, None)], "doc_id long, text string"
    )
    audit = {r.doc_id: r.drop_stage for r in curation_audit(docs).collect()}
    survivors = {r.doc_id for r in curate_corpus(docs).select("doc_id").collect()}
    assert audit[2] is not None          # labeled dropped...
    assert 2 not in survivors            # ...because the pipeline drops it
    assert {i for i, s in audit.items() if s is None} == survivors


def test_curation_audit_near_dup_and_decontamination_stages(spark):
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.operators.curation import curation_audit

    base = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen "
        "twenty twentyone twentytwo twentythree twentyfour twentyfive"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " near copy marker"),
            (10, "completely different words about spark catalyst plans "
                 "broadcast joins shuffle partitions adaptive execution "
                 "whole stage codegen vectorized parquet readers"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    bench = docs.filter(F.col("doc_id") == 10)
    audit = {
        r.doc_id: r.drop_stage
        for r in curation_audit(
            docs, near_dup_pairs=pairs, benchmarks=bench, decontam_k=5
        ).collect()
    }
    assert audit[1] is None
    assert audit[2] == "near_dup"       # component loser, min-id survives
    assert audit[10] == "decontaminated"


def test_curation_audit_perplexity_stage_matches_pipeline(spark):
    """A ppl-dropped doc must audit as high_perplexity, not as a phantom
    survivor; and the audit's NULL-stage set must equal curate_corpus's
    survivor set under the same knobs (incl. the max_ppl gate)."""
    from taxi_data_pipeline_pset2_spark.operators.curation import (
        curate_corpus,
        curation_audit,
    )
    from taxi_data_pipeline_pset2_spark.operators.lm_score import doc_logprob

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [(i, base + f" extra{i % 3}") for i in range(1, 13)]
    rows.append((100, "qzxv1 qzxv2 qzxv3 qzxv4 qzxv5 qzxv6 qzxv7 qzxv8"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cutoff = doc_logprob(docs).approxQuantile("ppl_proxy", [0.9], 0.0)[0]

    kw = dict(min_quality=0.0, max_dup_line_ratio=1.0, max_ppl=cutoff)
    survivors = {r.doc_id for r in curate_corpus(docs, **kw).select("doc_id").collect()}
    audit = {r.doc_id: r.drop_stage for r in curation_audit(docs, **kw).collect()}
    assert audit[100] == "high_perplexity"
    assert {i for i, s in audit.items() if s is None} == survivors
