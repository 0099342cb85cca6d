"""Market-basket association rules: pairwise support / confidence /
lift over (basket, item) co-occurrences.

The classic retail-analytics primitive (Agrawal & Srikant, VLDB 1994's
Apriori restricted to 2-itemsets -- in practice the level that drives
"bought together" features). The reference's relational surface stops
at grouped aggregates; this is the first genuinely combinatorial
aggregate in the catalog, so the scale discipline is explicit:

 - pair generation explodes each basket's sorted item list in place
   (both operators since r14, via dedup.py's chunked bucket_pairs --
   one basket-keyed aggregate, no self-join) -- never a cartesian over
   items: work is sum over baskets of C(items_in_basket, 2), linear in
   baskets for bounded basket width;
 - basket width is BOUNDED by ``max_basket_items``: a pathological
   basket with 10^4 items would contribute 5*10^7 pairs on its own, so
   over-wide baskets are dropped (counted, not silent -- the relational
   analogue of dedup.py's capped LSH buckets);
 - item frequencies and the basket total are category-sized frames
   broadcast onto the pair aggregate -- nothing corpus-shaped is
   shuffled twice;
 - counts are exact integers, ratios are single double divisions
   rounded once to 6 dp, so results hash-match a DuckDB twin under any
   partitioning.

At 100 TB the same shape holds: the (basket, item) distinct is one
shuffle, the basket aggregate reuses its partitioning (same key), and
the pair aggregate's cardinality is item-vocabulary-squared at worst --
bounded by min_support long before that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.001,
    max_basket_items: int = 256,
) -> DataFrame:
    """Association rules for unordered item PAIRS: one row per pair
    (item_a < item_b) with

      (item_a, item_b, n_ab, n_a, n_b, support, conf_a_b, conf_b_a,
       lift)

    where support = n_ab / n_baskets, conf_a_b = P(b in basket | a in
    basket) = n_ab / n_a, and lift = support / (P(a) * P(b)) -- lift >
    1 means the items co-occur more than independence predicts. Pairs
    below ``min_support`` are dropped; baskets wider than
    ``max_basket_items`` distinct items are excluded entirely (degenerate
    "everything" baskets say nothing about association and cost
    quadratic pairs). NULL baskets and NULL items are excluded. Ordered
    by n_ab desc, item_a, item_b."""
    if not 0 < min_support <= 1:
        raise ValueError(f"min_support must be in (0, 1], got {min_support}")
    if max_basket_items < 2:
        raise ValueError("max_basket_items must be >= 2")
    from taxi_data_pipeline_pset2_spark.operators.dedup import bucket_pairs

    bi = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
    )
    # ONE basket-keyed aggregate builds the sorted item list per basket;
    # width bounding is then a column predicate on the array size, and
    # pair generation explodes each list in place (the dedup.py
    # posting-list machinery -- bounded at cap^2 structs per row). The
    # r12 formulation self-joined bi on the basket key, which evaluated
    # the scan->join->distinct subtree once per alias plus once each for
    # the width/item/total aggregates (physical plan: 40 scan nodes at
    # sf0.1; this form: 16 -- the source is read twice, not five times).
    # Local wall is unchanged (rescans are page-cached at bench scale);
    # at real scale rescans are real I/O, which is why the r13 plan
    # keeps the single-aggregate shape. The emitted pair multiset is
    # identical (sorted list, i < j), so support/confidence/lift hashes
    # are unchanged.
    baskets = (
        bi.groupBy("_b")
        .agg(F.sort_array(F.collect_list("_i")).alias("_items"))
        .filter(F.size("_items") <= max_basket_items)
    )
    totals = baskets.agg(F.count("*").alias("_nb"))
    items = (
        baskets.select(F.explode("_items").alias("_ic"))
        .groupBy("_ic")
        .agg(F.count("*").alias("_ni"))
    )
    pairs = (
        bucket_pairs(baskets, "_items", cap=max_basket_items)
        .groupBy(
            F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b")
        )
        .agg(F.count("*").alias("n_ab"))
    )
    # item-frequency and total frames are vocabulary-/one-row-sized
    j = (
        pairs.join(
            F.broadcast(items.withColumnRenamed("_ic", "item_a")), "item_a"
        )
        .withColumnRenamed("_ni", "n_a")
        .join(F.broadcast(items.withColumnRenamed("_ic", "item_b")), "item_b")
        .withColumnRenamed("_ni", "n_b")
        .crossJoin(F.broadcast(totals))
    )
    support = F.col("n_ab") / F.col("_nb")
    return (
        j.filter(support >= F.lit(min_support))
        .select(
            "item_a",
            "item_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(support, 6).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_a_b"),
            F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_b_a"),
            # cast factors to double BEFORE multiplying: bigint
            # n_a*n_b overflows under ANSI once two popular items each
            # appear in > ~3e9 baskets -- the module's own target scale
            F.round(
                (F.col("n_ab").cast("double") * F.col("_nb").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_ab"), "item_a", "item_b")
    )


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_cooccur: int = 2,
    top_k: int = 10,
    max_basket_items: int = 256,
) -> DataFrame:
    """Item-item collaborative-filtering neighbors by co-occurrence
    cosine: for every item, its ``top_k`` most-similar items as
    (item, neighbor, n_ab, cosine, rank), cosine = n_ab /
    sqrt(n_a * n_b) over distinct-basket co-occurrence counts --
    the classic "customers also bought" primitive (Linden, Smith &
    York, IEEE Internet Computing 2003) next to association_rules'
    lift (which normalizes by independence; cosine normalizes by
    popularity geometry).

    Same scale shape as association_rules (since r14 the same PLAN
    shape too): ONE basket-keyed aggregate builds the sorted item list,
    width bounding is an array-size predicate, and pairs explode in
    place via the chunked posting-list machinery -- the r13
    association_rules rewrite (40 -> 16 scan nodes there) applied to
    this operator's basket-key self-join, which evaluated the
    scan->distinct subtree once per alias plus once each for the
    width/item frequencies. The emitted pair multiset is identical
    (sorted list, i < j, same cap). Item frequencies broadcast, pairs
    below ``min_cooccur`` dropped before ranking. The per-item top-k is
    one window over the (pairs x 2) symmetric frame --
    pair-vocabulary-sized, never corpus-sized. Ranking ties break by
    neighbor id, cosine rounds once to 6 dp AFTER ranking, so output
    is deterministic under any partitioning."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if min_cooccur < 1:
        raise ValueError(f"min_cooccur must be >= 1, got {min_cooccur}")
    from pyspark.sql.window import Window

    from taxi_data_pipeline_pset2_spark.operators.dedup import bucket_pairs

    bi = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
    )
    baskets = (
        bi.groupBy("_b")
        .agg(F.sort_array(F.collect_list("_i")).alias("_items"))
        .filter(F.size("_items") <= max_basket_items)
    )
    items = (
        baskets.select(F.explode("_items").alias("_ic"))
        .groupBy("_ic")
        .agg(F.count("*").alias("_ni"))
    )
    pairs = (
        bucket_pairs(baskets, "_items", cap=max_basket_items)
        .groupBy(F.col("p.a").alias("_a"), F.col("p.b").alias("_bb"))
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= min_cooccur)
    )
    sym = pairs.select(
        F.col("_a").alias("item"), F.col("_bb").alias("neighbor"), "n_ab"
    ).union(
        pairs.select(
            F.col("_bb").alias("item"), F.col("_a").alias("neighbor"), "n_ab"
        )
    )
    j = (
        sym.join(
            F.broadcast(
                items.select(
                    F.col("_ic").alias("item"), F.col("_ni").alias("_na")
                )
            ),
            "item",
        )
        .join(
            F.broadcast(
                items.select(
                    F.col("_ic").alias("neighbor"), F.col("_ni").alias("_nb")
                )
            ),
            "neighbor",
        )
        .withColumn(
            "_cos",
            F.col("n_ab")
            / F.sqrt(
                F.col("_na").cast("double") * F.col("_nb").cast("double")
            ),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("_cos"), F.asc("neighbor")
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "item",
            "neighbor",
            "n_ab",
            F.round("_cos", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy("item", "rank")
    )
