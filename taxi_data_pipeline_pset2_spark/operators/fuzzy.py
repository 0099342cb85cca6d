"""Blocked fuzzy matching / entity resolution (SURVEY.md §2 extension).

The warehouse-side duplicate-customer problem: rows that refer to the
same entity but differ by typos. The classic two-phase plan (Christen,
"Data Matching", 2012):

1. BLOCK: group rows by a cheap deterministic key (normalized prefix
   here) so only same-block rows are ever compared -- the equi-bucket
   candidate generator, same shape as the dedup LSH buckets, reusing
   ``bucket_pairs`` so a hot block (e.g. every row sharing the prefix)
   expands in bounded chunks instead of one O(b^2) array.
2. VERIFY: exact Levenshtein on candidates only, after a length prune
   (|len(a)-len(b)| <= d is necessary for distance <= d, and far
   cheaper). ``F.levenshtein`` is JVM-side codegen; DuckDB's
   ``levenshtein`` matches it exactly, which keeps the operator
   hash-verifiable.

Blocking is standard-practice APPROXIMATE: a typo inside the first
``block_len`` characters moves the row to another block and that pair is
missed. Recall can be raised by unioning passes over different keys
(prefix, suffix, ...) -- ``fuzzy_pairs_multi`` does exactly that, still
deterministic and oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.components import (
    resolve_duplicate_clusters,
)
from taxi_data_pipeline_pset2_spark.operators.dedup import bucket_pairs, normalize_text


def _block_key(norm: Column, block_len: int, from_end: bool = False) -> Column:
    if from_end:
        return F.substring(norm, -block_len, block_len)
    return F.substring(norm, 1, block_len)


def fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 1,
    block_len: int = 4,
    from_end: bool = False,
) -> DataFrame:
    """(id_a, id_b, dist) for same-block pairs with Levenshtein distance
    <= ``max_distance`` over the normalized text. id_a < id_b."""
    norm = normalize_text(F.col(text_col))
    keyed = df.select(
        F.col(id_col),
        norm.alias("_s"),
        _block_key(norm, block_len, from_end).alias("_blk"),
    )
    buckets = (
        keyed.groupBy("_blk")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("_s").alias("s")))
            ).alias("xs")
        )
        .filter(F.size("xs") >= 2)
    )
    pairs = bucket_pairs(buckets, "xs").select(
        F.col("p.a.i").alias("id_a"),
        F.col("p.b.i").alias("id_b"),
        F.col("p.a.s").alias("_sa"),
        F.col("p.b.s").alias("_sb"),
    )
    # length prune before the O(len^2) edit-distance kernel
    pruned = pairs.filter(
        F.abs(F.length("_sa") - F.length("_sb")) <= max_distance
    )
    return (
        pruned.withColumn("dist", F.levenshtein("_sa", "_sb"))
        .filter(F.col("dist") <= max_distance)
        .select("id_a", "id_b", "dist")
    )


def fuzzy_pairs_multi(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 1,
    block_len: int = 4,
) -> DataFrame:
    """Two-pass blocking (prefix + suffix), unioned and deduplicated:
    a pair survives if EITHER end of the string is typo-free, so single
    mid-string typos are always caught and only pairs with edits in both
    affixes are missed. Each pass is the same bounded bucket plan; the
    dedup is one aggregate on the (dup-sized) pair set."""
    a = fuzzy_pairs(df, text_col, id_col, max_distance, block_len, from_end=False)
    b = fuzzy_pairs(df, text_col, id_col, max_distance, block_len, from_end=True)
    return (
        a.unionByName(b)
        .groupBy("id_a", "id_b")
        .agg(F.min("dist").alias("dist"))
    )


def fuzzy_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 1,
    block_len: int = 4,
) -> DataFrame:
    """Collapse fuzzy-duplicate clusters to their min-id survivor:
    ``fuzzy_pairs_multi`` edges -> connected components -> one left-anti
    join (the operators/components.py resolution path)."""
    pairs = fuzzy_pairs_multi(df, text_col, id_col, max_distance, block_len)
    return resolve_duplicate_clusters(df, pairs, id_col, "id_a", "id_b")
