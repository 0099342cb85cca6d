"""Cross-document duplicated-span detection (substring dedup).

Document-level near-dup (jaccard/MinHash, operators/dedup.py) misses the
other duplication mode a pretraining corpus has: long VERBATIM spans
embedded in otherwise-different documents (boilerplate, quoted articles,
license headers). Lee et al., "Deduplicating Training Data Makes
Language Models Better" (arXiv:2107.06499) remove exact substring
duplicates >= 50 tokens via a corpus suffix array; this module computes
the same spans with a relational plan a 100 TB engine can run:

1. positional k-grams: (doc, pos, gram_hash) -- the corpus scan +
   explode, k large enough (default 8) that random gram collisions are
   rare.
2. inverted index on the gram hash; same-bucket postings pair up via the
   chunked ``bucket_pairs`` (a boilerplate gram with huge df is either
   chunk-bounded or dropped by ``max_df``).
3. anchors (doc_a, pos_a, doc_b, pos_b) sharing a gram lie on diagonal
   d = pos_a - pos_b; CONSECUTIVE anchors on one diagonal are the same
   shared span. Runs fall out relationally with the classic gaps-and-
   islands trick: within (doc_a, doc_b, d) ordered by pos_a,
   group = pos_a - row_number() is constant exactly on consecutive
   runs. One window + one aggregate, both keyed by pair-sized data.
4. a run of n anchored grams is a shared span of n + k - 1 tokens;
   report spans >= min_tokens.

Every stage is equi-bucketed (gram hash, then pair+diagonal); nothing is
O(n^2) in documents, and the heavy keys are tunable via k / max_df. The
32-bit gram hash can collide (false anchor); collisions are engine-
portable (md5 prefix), so the DuckDB oracle reproduces them bit-for-bit
and the operator stays hash-verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.components import (
    resolve_duplicate_clusters,
)
from taxi_data_pipeline_pset2_spark.operators.dedup import (
    bucket_pairs,
    positioned_shingles,
    spread_small_input,
    stable_hash64,
    tokenize,
)


def duplicated_spans(
    docs: DataFrame,
    min_tokens: int = 20,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, a_start, b_start, span_tokens) for every maximal
    cross-document verbatim token span of >= ``min_tokens`` tokens
    (0-based token start positions; doc_a < doc_b).

    ``max_df`` drops gram buckets with more than that many POSITIONAL
    OCCURRENCES (not distinct documents: a gram repeated p times in one
    doc counts p -- bucket size is what bounds the pair fan-out, so it
    is the honest knob). The boilerplate escape hatch, approximate
    exactly like ``jaccard_pairs(max_df=...)`` and off by default."""
    docs = spread_small_input(docs, key_cols=[id_col])
    grams = docs.select(
        F.col(id_col),
        F.posexplode(positioned_shingles(tokenize(F.col(text_col)), k)).alias(
            "pos", "gram"
        ),
    ).select(id_col, "pos", stable_hash64(F.col("gram")).alias("h"))
    buckets = (
        grams.groupBy("h")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p")))
            ).alias("xs")
        )
        .filter(F.size("xs") >= 2)
    )
    if max_df is not None:
        buckets = buckets.filter(F.size("xs") <= max_df)
    anchors = (
        bucket_pairs(buckets, "xs")
        .select(
            F.col("p.a.i").alias("doc_a"),
            F.col("p.a.p").alias("pos_a"),
            F.col("p.b.i").alias("doc_b"),
            F.col("p.b.p").alias("pos_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    diag = (F.col("pos_a") - F.col("pos_b")).alias("diag")
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = anchors.select("doc_a", "doc_b", "pos_a", "pos_b", diag).withColumn(
        "grp", F.col("pos_a") - F.row_number().over(w)
    )
    return (
        runs.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.count("*").alias("n"),
            F.min("pos_a").alias("a_start"),
            F.min("pos_b").alias("b_start"),
        )
        .select(
            "doc_a",
            "doc_b",
            "a_start",
            "b_start",
            (F.col("n") + F.lit(k - 1)).cast("bigint").alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_tokens)
    )


def span_dedup(
    docs: DataFrame,
    min_tokens: int = 20,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Drop documents that share a >= ``min_tokens`` verbatim span with a
    lower-id document (the doc-granularity policy: removing the span
    in-place changes document content, which a curation pipeline may not
    be allowed to do; Lee et al. cut the span itself, which needs a
    rewrite pass). One survivor per span-connected cluster."""
    pairs = duplicated_spans(docs, min_tokens, k, text_col, id_col, max_df)
    return resolve_duplicate_clusters(
        docs, pairs.select("doc_a", "doc_b"), id_col, "doc_a", "doc_b"
    )
