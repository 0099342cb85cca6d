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

import pandas as pd
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


def _blocked_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_len: int | None = None,
    from_end: bool = False,
    key_of=None,
) -> DataFrame:
    """(id_a, id_b, _sa, _sb): the shared blocking stage -- normalize,
    block-key, bounded bucket expansion via bucket_pairs. Every verify
    kernel (Levenshtein, Jaro-Winkler, ...) and every block-key scheme
    (prefix/suffix via ``block_len``, phonetic via ``key_of``) runs on
    this one candidate plan, so blocking fixes apply to all at once."""
    norm = normalize_text(F.col(text_col))
    blk = key_of(norm) if key_of is not None else _block_key(norm, block_len, from_end)
    keyed = df.select(
        F.col(id_col),
        norm.alias("_s"),
        blk.alias("_blk"),
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
    return pairs


def _levenshtein_verify(pairs: DataFrame, max_distance: int) -> DataFrame:
    """Shared verify stage: length prune (|len diff| <= d is necessary
    for distance <= d and far cheaper) then exact Levenshtein, over a
    (id_a, id_b, _sa, _sb) candidate frame."""
    pruned = pairs.filter(
        F.abs(F.length("_sa") - F.length("_sb")) <= max_distance
    )
    return (
        pruned.withColumn("dist", F.levenshtein("_sa", "_sb"))
        .filter(F.col("dist") <= max_distance)
        .select("id_a", "id_b", "dist")
    )


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
    pairs = _blocked_candidate_pairs(df, text_col, id_col, block_len, from_end)
    return _levenshtein_verify(pairs, max_distance)


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


def exhaustive_levenshtein_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 1,
    max_rows: int = 5_000,
) -> DataFrame:
    """ALL pairs (id_a < id_b) within Levenshtein ``max_distance`` of
    each other over the normalized text -- the O(n^2) exhaustive ground
    truth a blocking-recall audit compares ``fuzzy_pairs_multi``'s
    candidate set against (the lsh_recall_audit pattern: the audited
    stage is approximate, its measurement is exact).

    Deliberately quadratic, so deliberately capped: more than
    ``max_rows`` input rows fails loudly inside the plan (the theil_sen
    max_group_rows discipline) -- audit a deterministic subset, never
    the full corpus. The pair expansion reuses ``bucket_pairs`` (one
    all-rows bucket, chunked), so per-row memory stays bounded even at
    the cap."""
    norm = normalize_text(F.col(text_col))
    keyed = df.select(F.col(id_col).alias("_i"), norm.alias("_s"))
    one = keyed.groupBy(F.lit(1).alias("_g")).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_i").alias("i"), F.col("_s").alias("s")))
        ).alias("xs")
    )
    guarded = (
        one.withColumn(
            "_guard",
            F.assert_true(
                F.size("xs") <= max_rows,
                F.concat(
                    F.lit(
                        "exhaustive_levenshtein_pairs input exceeds "
                        f"max_rows={max_rows} (this ground truth is "
                        "O(n^2) by design -- audit a subset): "
                    ),
                    F.size("xs").cast("string"),
                ),
            ),
        )
        .filter(F.col("_guard").isNull())
        .drop("_guard", "_g")
    )
    pairs = bucket_pairs(guarded, "xs").select(
        F.col("p.a.i").alias("id_a"),
        F.col("p.b.i").alias("id_b"),
        F.col("p.a.s").alias("_sa"),
        F.col("p.b.s").alias("_sb"),
    )
    return _levenshtein_verify(pairs, max_distance)


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


def _jaro_winkler_py(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Reference Jaro-Winkler (flag algorithm: match window
    max(|a|,|b|)//2 - 1, transpositions = FLOOR-halved mismatches of
    the matched character sequences, boost only above jaro 0.7, prefix
    capped at ``max_prefix``). Fuzzed bit-exact against DuckDB's
    jaro_winkler_similarity, which is what keeps the operator
    oracle-expressible."""
    if not a or not b:
        return 0.0
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    window = max(la, lb) // 2 - 1
    a_flags = [False] * la
    b_flags = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ca:
                a_flags[i] = b_flags[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    # transpositions: the flag algorithm compares the matched CHARACTER
    # sequences of both strings in their own orders and FLOOR-halves the
    # mismatch count -- integer division, as Apache Commons / rapidfuzz
    # / DuckDB implement it (fuzzed to 0 diffs in 8000 random pairs vs
    # DuckDB's jaro_similarity; the fractional t some texts describe
    # diverges on odd mismatch counts)
    ma = [ca for i, ca in enumerate(a) if a_flags[i]]
    mb = [cb for j, cb in enumerate(b) if b_flags[j]]
    t = sum(1 for x, y in zip(ma, mb) if x != y) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro <= 0.7:  # Winkler's boost threshold, as DuckDB applies it
        return jaro
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= max_prefix:
            break
        prefix += 1
    return jaro + prefix * p * (1.0 - jaro)


def jaro_winkler_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.9,
    block_len: int = 2,
) -> DataFrame:
    """(id_a, id_b, jw) for same-block pairs with Jaro-Winkler
    similarity >= ``threshold`` over the normalized text -- the
    name-matching scorer record linkage uses where Levenshtein's unit
    edit costs are too blunt (JW boosts shared prefixes, the
    highest-signal region of personal/place names).

    Same bounded block plan as ``fuzzy_pairs``; the verify kernel is an
    Arrow-batched pandas UDF (no Catalyst JW), 6-dp rounded so the
    DuckDB ``jaro_winkler_similarity`` twin hash-matches."""
    pairs = _blocked_candidate_pairs(df, text_col, id_col, block_len)

    @F.pandas_udf("double")
    def jw(sa: pd.Series, sb: pd.Series) -> pd.Series:
        # the shared HALF_UP rounder, not builtin round (banker's): the
        # DuckDB twin recomputes jaro_winkler_similarity and rounds
        # HALF_UP, so a .5-millionth boundary must break the same way
        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            _round_half_up_6,
        )

        return pd.Series(
            _round_half_up_6(
                [_jaro_winkler_py(a, b) for a, b in zip(sa, sb)]
            )
        )

    return (
        pairs.withColumn("jw", jw("_sa", "_sb"))
        .filter(F.col("jw") >= threshold)
        .select("id_a", "id_b", "jw")
    )


def phonetic_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """(id_a, id_b, dist): same-SOUNDEX-block pairs within Levenshtein
    ``max_distance`` -- the phonetic blocking pass record linkage adds
    next to prefix blocking ("Smith"/"Smyth" share no 4-prefix but
    encode identically). Spark's built-in ``soundex`` is the block key
    (JVM-side codegen, no UDF); the verify kernel and the bounded
    bucket expansion are the shared ``_blocked_candidate_pairs`` plan
    with the key swapped.

    Non-letter-initial caveat: Spark's soundex returns such a string
    UNCHANGED, so digit/punctuation-initial rows block only with
    byte-identical keys (effectively each is its own block) and gain no
    phonetic recall -- run the prefix pass (``fuzzy_pairs``) alongside
    for corpora with coded/numbered names."""
    pairs = _blocked_candidate_pairs(df, text_col, id_col, key_of=F.soundex)
    return _levenshtein_verify(pairs, max_distance)
