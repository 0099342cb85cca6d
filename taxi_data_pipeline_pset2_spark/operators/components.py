"""Connected components over candidate-duplicate pairs, and the
cluster-resolution step that turns near-dup PAIRS into canonical
SURVIVORS (SURVEY.md 2b dedup surface: pair generation lives in
operators/dedup.py; this is the missing back half a pretraining
pipeline runs after it).

Not present in the reference (batch BI pipeline); standard practice for
corpus dedup: `jaccard_pairs` / `minhash_candidate_pairs` emit edges
(doc_a, doc_b); duplicates are the connected components of that graph,
and exactly one doc per component survives.

Algorithm: the alternating large-star / small-star method (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) -- the
same algorithm GraphFrames uses. Why not simple min-label propagation:
that needs O(diameter) rounds, and near-dup graphs can chain (A~B~C...)
into long paths; alternation converges in O(log^2 n) rounds regardless
of diameter, each round a fixed two-shuffle DataFrame program.

100 TB notes: per round, each star op is ONE hash shuffle (a window min
partitioned by node) plus a distinct; no collect, no driver-side graph.
State is the edge set itself, monotonically contracting toward stars.
`localCheckpoint` after each round truncates lineage so the plan does
not grow with iterations (the classic iterative-Spark failure mode).
Convergence is detected by an (edge-count, xxhash64-checksum) pair --
one tiny aggregate per round, not a full self-comparison join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# O(log^2 n) expected; 50 rounds covers any conceivable corpus. Hitting
# the cap raises rather than silently returning a partial clustering.
MAX_CC_ROUNDS = 50


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the
    minimum of u's closed neighborhood. Emits (v, m) for v > u."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    m = F.least(F.col("u"), F.min("v").over(w))
    return (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct every edge high->low, then for each node u connect u and
    all of its smaller neighbors to the minimum neighbor."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    w = Window.partitionBy("u")
    star = directed.withColumn("m", F.min("v").over(w))
    out = star.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        star.select("u", "m")
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    # decimal(38,0) accumulator: a bigint sum of 64-bit hashes overflows
    # under ANSI mode on any non-trivial edge set
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return (row.n, int(row.h))


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = MAX_CC_ROUNDS,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    ``component`` is the minimum node id in its connected component.

    Only nodes present in at least one pair are returned -- an isolated
    doc is its own survivor and needs no row (callers left-join).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _edge_checksum(edges)
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _edge_checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # At the fixpoint every edge is (node, component-min); roots appear
    # only on the right-hand side and map to themselves.
    children = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return children.union(roots)


def resolve_duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Keep exactly one doc (the min id) per near-dup cluster.

    ``pairs`` is any candidate-pair frame (`jaccard_pairs`,
    `minhash_candidate_pairs`, embedding near-dup); docs in no pair
    survive untouched. One left-anti join against the non-survivor set:
    scan-shaped on the 100 TB side, the dropped-id side is dup-sized.
    """
    comp = connected_components(pairs, src, dst)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
