"""Positional inverted index + boolean/phrase search over a corpus.

The retrieval complement of the similarity operators: exact term lookup
(AND-conjunctions ranked by term frequency) and positional phrase
matching, the standard text-search primitives a corpus store needs next
to near-dup and embedding search (reference has nothing like it -- its
only pattern match is LIKE '%AIRPORT%' on a 265-row dim, SURVEY.md F10).

Plan shapes, sized for 100 TB:
- index build: one scan -> posexplode(tokens) -> hash aggregate on
  (term, doc) -- a single corpus-sized shuffle; the index frame is
  "exploded postings" (term, doc_id, positions, tf), the layout that
  parallelizes: one row per (term, doc) rather than one giant
  collect_list per term (a hot term's posting list would otherwise
  serialize into one task/row). Persist with
  ``clustered_write(partition_by=bucket(term))`` and term lookups
  become partition-pruned scans.
- AND search: filter the index on the k query terms (predicate pushdown
  on the term column -- scan-shaped, no join), aggregate per doc,
  require all k matched. One small shuffle over only the matching
  postings.
- phrase search: per-term position arrays for the phrase's terms join
  pairwise on doc_id (k-1 joins of already-term-filtered, doc-keyed
  frames), then one higher-order-function expression counts aligned
  positions -- no UDF, no explode of positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.dedup import tokenize


def inverted_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exploded positional postings: (term, id, positions, tf) with
    0-based token positions in document order."""
    toks = docs.select(
        F.col(id_col), F.posexplode(tokenize(F.col(text_col))).alias("pos", "term")
    )
    return (
        toks.groupBy("term", id_col)
        .agg(
            F.sort_array(F.collect_list("pos")).alias("positions"),
            F.count("*").cast("bigint").alias("tf"),
        )
    )


def search_and(
    index: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """Documents containing ALL ``terms``: (id, total_tf) ranked by
    summed term frequency (desc, id asc). ``top_k`` plans as
    TakeOrderedAndProject."""
    if not terms:
        raise ValueError("need at least one term")
    hits = (
        index.filter(F.col("term").isin(list(set(terms))))
        .groupBy(id_col)
        .agg(
            F.countDistinct("term").alias("_nt"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
        .filter(F.col("_nt") == len(set(terms)))
        .select(id_col, "total_tf")
        .orderBy(F.desc("total_tf"), F.asc(id_col))
    )
    return hits.limit(top_k) if top_k is not None else hits


def search_phrase(
    index: DataFrame, phrase: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Documents containing the exact token sequence ``phrase``:
    (id, n_occurrences). A repeated term in the phrase is fine (the
    same posting row joins once per slot)."""
    if not phrase:
        raise ValueError("empty phrase")
    sides = []
    for i, w in enumerate(phrase):
        sides.append(
            index.filter(F.col("term") == w).select(
                F.col(id_col), F.col("positions").alias(f"_p{i}")
            )
        )
    joined = sides[0]
    for i in range(1, len(phrase)):
        joined = joined.join(sides[i], id_col, "inner")
    def _adjacent(i: int):
        # closure factory, NOT a default arg: pyspark reads the lambda's
        # arity, so a `_i=i` default would become a second lambda var
        return lambda p: F.array_contains(F.col(f"_p{i}"), p + i)

    aligned = F.col("_p0")
    for i in range(1, len(phrase)):
        aligned = F.filter(aligned, _adjacent(i))
    return (
        joined.select(
            id_col, F.size(aligned).cast("bigint").alias("n_occurrences")
        )
        .filter(F.col("n_occurrences") > 0)
        .orderBy(id_col)
    )
