"""Incremental near-dup detection: screen a new ingest batch against a
persisted corpus SIGNATURE INDEX, never against the corpus itself
(SURVEY.md 2b extension surface; the reference's monthly-ingest loop,
`loader_yellow_green.py:38`, re-expressed for a dedup pipeline).

The batch-mode dedup family (`operators/dedup.py`) pairs a corpus
against itself -- the right shape for a one-shot clean, the wrong shape
for a pipeline that ingests daily into a 100 TB corpus: re-pairing
all of history per batch is O(corpus) work for O(batch) new data.
The incremental contract:

- The index is the (doc_id, band, band_sig) frame produced by
  ``minhash_band_signatures`` -- LSH_BANDS small rows per document,
  append-only, engine-portable (plain parquet; reproducible bit-for-bit
  from the text, so it can always be rebuilt).
- Per batch: signatures are computed for the NEW docs only, then
  matched against the index with one equi-join on (band, band_sig).
  The batch side is broadcast, so the corpus-sized index is scanned
  exactly once with NO shuffle -- per-batch cost is O(batch) + one
  index scan, independent of how many batches came before. (If the
  index table is bucketed by band_sig via ``sinks.bucketed_write``,
  even that scan prunes.)
- Within-batch dups resolve via the same band-collision pairing +
  connected components as batch mode; survivors' signatures are
  appended to the index for the next batch.

A doc whose id already exists in the index is NOT matched against its
own signatures (re-ingest of batch N must be a no-op, not a
self-dedup); it IS still matched against other docs' signatures.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.components import (
    resolve_duplicate_clusters,
)
from taxi_data_pipeline_pset2_spark.operators.dedup import (
    band_collision_pairs,
    minhash_band_signatures,
)


@dataclass(frozen=True)
class IncrementalDedupResult:
    """Outputs of one ingest batch.

    survivors: new docs kept (no corpus match; one winner per
        within-batch near-dup cluster).
    matches: (doc_id, corpus_id, n_shared_bands) -- every new doc that
        collided with an indexed doc, for audit / lineage.
    index: the input index plus the survivors' signatures; persist this
        (e.g. ``sinks.atomic_overwrite``) for the next batch.
    new_index_rows: JUST the NEW survivors' signature rows (ids
        already present in the index are excluded -- re-ingest appends
        nothing) -- the delta an
        append-mode sink should write instead of re-deriving signatures
        from the survivors' text a second time (the signature pipeline
        is the dominant per-batch cost).
    """

    survivors: DataFrame
    matches: DataFrame
    index: DataFrame
    new_index_rows: DataFrame


def _already_indexed(index: DataFrame, sigs: DataFrame, id_col: str) -> DataFrame:
    """Batch ids that already have rows in the index. One scan-shaped
    semi-join (index side never shuffles; the batch id set broadcasts),
    result batch-bounded. Guards the index append: re-ingesting an
    already-indexed doc must NOT append its signatures a second time --
    duplicated (id, band, band_sig) rows would double that doc's
    ``n_shared_bands`` in every future batch's :func:`match_against_index`
    count, inflating collision evidence past LSH_BANDS and over
    ``min_shared_bands`` thresholds. (A re-ingested id with CHANGED text
    keeps its original signatures: the index is append-only and the id is
    the identity.)"""
    return (
        index.join(
            F.broadcast(sigs.select(id_col).distinct()), id_col, "left_semi"
        )
        .select(id_col)
        .distinct()
    )


def match_against_index(
    sigs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    min_shared_bands: int = 1,
) -> DataFrame:
    """(doc_id, corpus_id, n_shared_bands) for batch signatures that
    collide with the index on >= ``min_shared_bands`` band buckets.

    The batch side is explicitly broadcast: the index is the 100 TB-side
    relation and must not shuffle. The post-join aggregate runs over
    collision rows only (dup-sized, not corpus-sized)."""
    corpus = index.select(
        F.col(id_col).alias("corpus_id"), "band", "band_sig"
    )
    hits = corpus.join(
        F.broadcast(sigs), on=["band", "band_sig"], how="inner"
    ).filter(F.col("corpus_id") != F.col(id_col))
    return (
        hits.groupBy(id_col, "corpus_id")
        .agg(F.count("*").alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= min_shared_bands)
    )


def incremental_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_shared_bands: int = 1,
) -> IncrementalDedupResult:
    """Screen ``new_docs`` against ``index``, dedup the batch
    internally, and emit the grown index.

    Corpus-matched docs are removed first; within-batch clusters are
    then resolved among the remainder only (a pair whose other endpoint
    already fell to a corpus match must not eliminate a clean doc --
    the cluster's duplicate-of-corpus evidence applies to the matched
    endpoint, not transitively).
    """
    # The signature pipeline feeds three consumers (corpus match,
    # within-batch pairing, index append); localCheckpoint materializes
    # it once instead of re-running shingle->hash->minima three times.
    # Batch-sized, so executor storage is fine.
    sigs = minhash_band_signatures(
        new_docs, text_col=text_col, id_col=id_col, k=k
    ).localCheckpoint(eager=False)

    matches = match_against_index(sigs, index, id_col, min_shared_bands)
    corpus_dups = matches.select(id_col).distinct()

    clean = new_docs.join(corpus_dups, id_col, "left_anti")
    within = (
        band_collision_pairs(sigs, id_col)
        .filter(F.col("n_shared_bands") >= min_shared_bands)
        # dup-sized side, broadcast anti-joins: drop pairs whose endpoint
        # already fell to a corpus match, per the contract above
        .join(
            F.broadcast(corpus_dups.withColumnRenamed(id_col, "doc_a")),
            "doc_a",
            "left_anti",
        )
        .join(
            F.broadcast(corpus_dups.withColumnRenamed(id_col, "doc_b")),
            "doc_b",
            "left_anti",
        )
    )
    survivors = resolve_duplicate_clusters(clean, within, id_col=id_col)

    keep_ids = survivors.select(id_col)
    new_rows = sigs.join(F.broadcast(keep_ids), id_col, "left_semi").join(
        F.broadcast(_already_indexed(index, sigs, id_col)), id_col, "left_anti"
    )
    return IncrementalDedupResult(
        survivors=survivors,
        matches=matches,
        index=index.unionByName(new_rows),
        new_index_rows=new_rows,
    )


def incremental_embedding_dedup(
    new_emb: DataFrame,
    index: DataFrame,
    corpus_emb: DataFrame | None = None,
    threshold: float = 0.95,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_shared_bands: int = 1,
) -> IncrementalDedupResult:
    """The embedding-modality twin of :func:`incremental_dedup`: screen a
    batch of vectors against a persisted sign-LSH signature index
    (``similarity.cosine_sketch_bands`` rows, same (id, band, band_sig)
    shape as the MinHash index, so the match/collision machinery is
    shared verbatim).

    With ``corpus_emb`` provided, candidate collisions are verified by
    exact int-scaled cosine >= ``threshold`` (the vectorized
    ``verify_cosine_pairs`` kernel). The corpus-sided work stays
    scan-shaped: candidates are dup-sized, so the vector-lookup joins
    broadcast the candidate side against the corpus scan. Without
    ``corpus_emb`` (vectors archived elsewhere), matches carry
    band-collision evidence only -- the MinHash-style contract.
    """
    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        cosine_sketch_bands,
        verify_cosine_pairs,
    )

    sigs = cosine_sketch_bands(new_emb, dim, id_col, vec_col).localCheckpoint(
        eager=False
    )
    cand = match_against_index(sigs, index, id_col, min_shared_bands)
    if corpus_emb is not None:
        all_emb = new_emb.select(id_col, vec_col).unionByName(
            corpus_emb.select(id_col, vec_col)
        )
        verified = verify_cosine_pairs(
            all_emb,
            cand.select(
                F.col(id_col).alias("id_a"), F.col("corpus_id").alias("id_b")
            ),
            threshold,
            id_col,
            vec_col,
        )
        matches = verified.select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias("corpus_id"),
            "cosine",
        )
    else:
        matches = cand
    corpus_dups = matches.select(id_col).distinct()

    clean = new_emb.join(corpus_dups, id_col, "left_anti")
    within_cand = (
        band_collision_pairs(sigs, id_col)
        .filter(F.col("n_shared_bands") >= min_shared_bands)
        .join(
            F.broadcast(corpus_dups.withColumnRenamed(id_col, "doc_a")),
            "doc_a",
            "left_anti",
        )
        .join(
            F.broadcast(corpus_dups.withColumnRenamed(id_col, "doc_b")),
            "doc_b",
            "left_anti",
        )
    )
    within = verify_cosine_pairs(
        new_emb,
        within_cand.select(
            F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
        ),
        threshold,
        id_col,
        vec_col,
    )
    survivors = resolve_duplicate_clusters(
        clean, within, id_col=id_col, src="id_a", dst="id_b"
    )
    new_rows = sigs.join(
        F.broadcast(survivors.select(id_col)), id_col, "left_semi"
    ).join(F.broadcast(_already_indexed(index, sigs, id_col)), id_col, "left_anti")
    return IncrementalDedupResult(
        survivors=survivors,
        matches=matches,
        index=index.unionByName(new_rows),
        new_index_rows=new_rows,
    )
