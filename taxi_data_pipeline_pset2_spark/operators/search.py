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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.dedup import tokenize
from taxi_data_pipeline_pset2_spark.operators.similarity import round_half_up_int


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


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    min_df: int = 2,
    max_df: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All document pairs with TF-IDF cosine >= ``threshold`` -- the
    sparse-vector complement of the embedding near-dup path (classic
    bag-of-words similarity: same wording, not just same meaning).

    Algorithm: tf per (doc, term) -> document frequency -> terms pruned
    to ``min_df <= df <= max_df`` -> per-doc L2 normalization -> one
    self-join ON THE TERM (the inverted-index trick: only docs sharing
    a surviving term ever pair) -> pair aggregate summing products.

    The df ceiling is what makes the join scale-safe: a term in d docs
    contributes d^2 pair rows, so stop-words would be quadratic in the
    corpus -- pruning df > max_df bounds every term's fan-out at
    max_df^2 while dropping only near-zero-IDF dimensions (cosine is
    computed in the pruned space, the standard stop-filtered TF-IDF).

    Determinism (oracle-hash discipline): weights are scaled to exact
    integers (round(tf * idf6 * 1e6)), the L2 norm comes from an exact
    DECIMAL sum of squares, normalized weights are re-scaled to 1e6
    ints, and the pair dot is an exact DECIMAL sum of int products --
    every corpus-sized sum is order-independent; the only float ops
    (ln, sqrt, the final divides) are scalar and identically ordered in
    the DuckDB twin."""
    if min_df < 1 or max_df < min_df:
        raise ValueError("need 1 <= min_df <= max_df")
    n_docs = docs.count()
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    w6 = F.round(
        F.col("tf")
        * F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6)
        * F.lit(1e6)
    ).cast("bigint")
    # a term with df == n_docs has idf 0 -> weight 0: it contributes
    # nothing to any dot product but would zero a doc's norm when it is
    # the doc's ONLY kept term (divide-by-zero) -- drop zero weights
    weighted = (
        tf.join(dfreq, "term")
        .select(id_col, "term", w6.alias("w6"))
        .filter(F.col("w6") != 0)
    )
    # cast BEFORE multiplying: a bigint product would overflow (ANSI
    # throw) once tf * idf crosses ~3e9, i.e. exactly at corpus scale
    norms = weighted.groupBy(id_col).agg(
        F.sum(F.col("w6").cast("decimal(19,0)") * F.col("w6")).alias("ss")
    )
    n6 = F.round(
        F.col("w6").cast("double") * F.lit(1e6) / F.sqrt(F.col("ss").cast("double"))
    ).cast("bigint")
    normed = weighted.join(norms, id_col).select(id_col, "term", n6.alias("n6"))
    a = normed.select(
        F.col(id_col).alias("id_a"), "term", F.col("n6").alias("na")
    )
    b = normed.select(
        F.col(id_col).alias("id_b"), F.col("term"), F.col("n6").alias("nb")
    )
    pairs = (
        a.join(b, ["term"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("na").cast("decimal(19,0)") * F.col("nb")).alias("dot"))
    )
    cosine = F.round(F.col("dot").cast("double") / F.lit(1e12), 6)
    return (
        pairs.withColumn("cosine", cosine)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


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


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    top_k: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 ranked retrieval (Robertson & Walker, SIGIR 1994;
    the Lucene-default scoring function): top-``top_k`` documents for a
    bag-of-terms query, scored

        sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    with the Lucene non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    and the standard constants k1 = 6/5, b = 3/4. The length
    normalization is what AND-search's raw tf ranking lacks: a term
    mention in a short doc outranks the same count in a long one.

    Determinism contract (oracle-hash discipline, same device as
    tfidf_cosine_pairs): with k1 and b exact rationals, each (doc, term)
    contribution equals the integer ratio

        num / den = (22 * tf * L * idf6) / (10*L*tf + 3*L + 9*dl*N)

    in micro-units, where L = total corpus tokens, N = doc count and
    idf6 = round(idf * 1e6), a terms-sized driver scalar through
    round_half_up_int -- the ONLY float step, the precedent-accepted
    scalar ln (operators/lm_score.py, which the oracle recomputes in
    SQL). The division is done as pure bigint HALF_UP,
    ``(2*num + den) div (2*den)`` (positive operands, so Spark ``div``
    == DuckDB ``//``), and the per-doc score is an exact bigint sum of
    those micro-contributions -- order-independent under any
    partitioning and bit-identical to the SQL twin.

    Plan shape at 100 TB: exactly TWO corpus scans -- one builds the
    persisted (id, dl) frame (the 3-scalar aggregate and the final dl
    join both read the cache), one builds the persisted query-term
    postings (pushed IN filter -> (doc, term) aggregate; df/idf come
    off the cache as a bounded terms-sized collect). The dl join and
    the per-doc sum share the doc-id shuffle key; top-k plans as
    TakeOrderedAndProject and is eagerly localCheckpoint-ed (top_k
    rows) so both caches are released before returning (the
    operators/clustering.py device).

    Raises if the exact-integer envelope 2*num_max < 2^63 would
    overflow (corpus of ~1e13 tokens at idf ~ ln(2N): far past any
    bench scale; at that point re-derive with decimal(38,0) operands).
    """
    if not terms:
        raise ValueError("need at least one term")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    qterms = sorted(set(terms))
    # NULL text folds to the empty doc BEFORE tokenize: size(NULL) is -1
    # under Spark's legacy sizeOfNull, which would corrupt L (and the
    # oracle's sum(dl) skips NULLs while count(*) keeps the row -- the
    # two engines would disagree on avgdl)
    toks = tokenize(F.coalesce(F.col(text_col), F.lit("")))
    lengths = docs.select(
        F.col(id_col), F.size(toks).cast("bigint").alias("dl")
    ).persist()
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(qterms))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .persist()
    )
    try:
        n_docs, total_len, max_dl = lengths.agg(
            F.count("*"), F.sum("dl"), F.max("dl")
        ).first()
        if not n_docs or not total_len:
            raise ValueError("empty corpus")
        n, lx, mdl = int(n_docs), int(total_len), int(max_dl)
        # worst-case envelope in python ints: tf <= max dl, idf6 <= the
        # df=1 idf; both num and den enter the div doubled
        idf6_max = round_half_up_int(
            math.log(1.0 + (n - 1 + 0.5) / 1.5) * 1_000_000
        )
        num_max = 22 * mdl * lx * idf6_max
        den_max = 10 * lx * mdl + 3 * lx + 9 * mdl * n
        if 2 * num_max + den_max >= 2**63:
            raise ValueError(
                "bm25_topk exact-integer envelope exceeded: "
                f"2*num_max+den_max = {2 * num_max + den_max} >= 2^63"
            )
        # df is a bounded terms-sized collect off the postings cache;
        # idf6 is computed driver-side (math.log + HALF_UP) and injected
        # as literals, same as the oracle-recomputed scalars in
        # operators/lm_score.py
        dfs = {
            r["term"]: int(r["df"])
            for r in tf.groupBy("term").agg(F.count("*").alias("df")).collect()
        }
        idf6_expr = F.lit(None).cast("bigint")
        for term, df in dfs.items():
            v = round_half_up_int(
                math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1_000_000
            )
            idf6_expr = F.when(F.col("term") == term, F.lit(v)).otherwise(
                idf6_expr
            )
        contrib = (
            tf.join(lengths, id_col)
            .select(
                F.col(id_col),
                (F.lit(22) * F.col("tf") * F.lit(lx) * idf6_expr).alias("num"),
                (
                    F.lit(10 * lx) * F.col("tf")
                    + F.lit(3 * lx)
                    + F.lit(9 * n) * F.col("dl")
                ).alias("den"),
            )
            .select(
                F.col(id_col),
                F.expr("(2 * num + den) div (2 * den)").alias("contrib6"),
            )
        )
        return (
            contrib.groupBy(id_col)
            .agg(
                F.count("*").cast("bigint").alias("n_terms"),
                F.sum("contrib6").cast("bigint").alias("score_micro"),
            )
            .select(
                id_col,
                "n_terms",
                "score_micro",
                (F.col("score_micro").cast("double") / F.lit(1e6)).alias("bm25"),
            )
            .orderBy(F.desc("score_micro"), F.asc(id_col))
            .limit(top_k)
            .localCheckpoint(eager=True)
        )
    finally:
        lengths.unpersist(blocking=False)
        tf.unpersist(blocking=False)
