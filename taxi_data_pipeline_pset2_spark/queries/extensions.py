"""Round-5 catalog extensions: range join, semantic decontamination,
connected-components resolution, exact mixture apportionment.

Each entry gives a previously pytest-only (or brand-new) operator
family a driver-verified DuckDB hash oracle. The oracles reproduce the
operators' deterministic hash/integer arithmetic exactly (see
queries/dedup.py for the shared md5-prefix / int-scaled conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.queries._helpers import (
    dec_avg,
    dec_sum,
    sql_dec_avg,
    sql_dec_sum,
    t,
)
from taxi_data_pipeline_pset2_spark.queries.catalog import query

# ---- bucketed range join -------------------------------------------------

# (band, lo, hi): half-open price bands over orders.o_totalprice
# (sf-independent: the generator's price range is ~[1e3, 5e5] at every SF)
_BANDS = (
    ("p0_050k", 0.0, 50_000.0),
    ("p050_100k", 50_000.0, 100_000.0),
    ("p100_200k", 100_000.0, 200_000.0),
    ("p200_350k", 200_000.0, 350_000.0),
    ("p350_600k", 350_000.0, 600_000.0),
)

_BANDS_SQL = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)

_PRICE_BAND_ORACLE = f"""
    WITH bands(price_band, lo, hi) AS (VALUES {_BANDS_SQL})
    SELECT b.price_band,
           count(*) AS n_orders,
           {sql_dec_sum('o.o_totalprice')} AS revenue,
           {sql_dec_avg('o.o_totalprice', scale=2)} AS avg_price
    FROM orders o JOIN bands b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.price_band
    ORDER BY b.price_band
"""


@query("price_band_totals", oracle=_PRICE_BAND_ORACLE, tags=("bench", "rangejoin", "agg"))
def price_band_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding range join (operators/rangejoin.py point_in_interval_join):
    orders joined to a half-open price-band rate table, then aggregated
    per band. The bucketed equi-join (+ broadcast of the exploded band
    dim) is the 100 TB plan -- never a BroadcastNestedLoopJoin; asserted
    in tests/test_plan_shapes.py."""
    from taxi_data_pipeline_pset2_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    bands = spark.createDataFrame(
        list(_BANDS), "price_band string, lo double, hi double"
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    joined = point_in_interval_join(
        orders, bands, "o_totalprice", "lo", "hi",
        bucket_width=50_000.0, broadcast_intervals=True,
    )
    return (
        joined.groupBy("price_band")
        .agg(
            F.count("*").alias("n_orders"),
            dec_sum("o_totalprice").alias("revenue"),
            dec_avg("o_totalprice", scale=2).alias("avg_price"),
        )
        .orderBy("price_band")
    )


# ---- semantic decontamination --------------------------------------------

# bench = every 20th vector (the held-out benchmark), train = the rest
_SEMDECON_THRESHOLD = 0.2

_SEMDECON_ORACLE = f"""
    WITH prep AS (SELECT vec_id,
                         list_transform(embedding::DOUBLE[],
                                        x -> CAST(round(x * 1000000) AS BIGINT)) AS iv
                  FROM embeddings),
    n AS (SELECT vec_id, iv,
                 CAST(list_sum(list_transform(iv, x -> x * x)) AS BIGINT) AS norm2
          FROM prep),
    b AS (SELECT * FROM n WHERE vec_id % 20 = 0),
    a AS (SELECT * FROM n WHERE vec_id % 20 <> 0),
    pairs AS (SELECT a.vec_id AS vec_id,
                     ROUND(CAST(list_sum(list_transform(generate_series(1, 64),
                                                        i -> a.iv[i] * b.iv[i])) AS DOUBLE)
                           / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))),
                           6) AS cosine
              FROM a CROSS JOIN b)
    SELECT vec_id, count(*) AS n_bench_hits, max(cosine) AS max_cosine
    FROM pairs WHERE cosine >= {_SEMDECON_THRESHOLD}
    GROUP BY vec_id
"""


@query(
    "semantic_decontamination",
    oracle=_SEMDECON_ORACLE,
    tags=("bench", "decontamination", "similarity"),
)
def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination (operators/decontamination.py
    semantic_contamination_scores): train vectors with a benchmark
    neighbor at cosine >= 0.2. The eval-sized bench side broadcasts;
    int-scaled cosines are bit-identical to the oracle. The LSH-
    candidate variant (the path for large benchmark suites) is pinned
    against this exact mode in tests/test_decontamination.py."""
    from taxi_data_pipeline_pset2_spark.operators.decontamination import (
        semantic_contamination_scores,
    )

    emb = t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 20 == 0)
    train = emb.filter(F.col("vec_id") % 20 != 0)
    return semantic_contamination_scores(
        train, bench, threshold=_SEMDECON_THRESHOLD
    )


# ---- connected components over near-dup pairs ----------------------------

# Reuses the dedup_ngram_jaccard edge pipeline (threshold 0.2), then
# resolves components; the oracle closes the same edge set with a
# recursive CTE (transitive closure is fine at oracle scale; the Spark
# side runs the O(log^2 n) star alternation / bounded union-find).
_COMPONENTS_ORACLE = """
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
             FROM documents),
    sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN
               list_transform(generate_series(1, len(toks) - 2),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS sh FROM toks),
    e AS (SELECT doc_id, unnest(sh) AS shingle, len(sh) AS n FROM sh),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter,
                 any_value(a.n) AS n_a, any_value(b.n) AS n_b
          FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM p
              WHERE ROUND(n_inter * 1.0 / (n_a + n_b - n_inter), 6) >= 0.2),
    sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
    reach AS (SELECT u, v FROM sym
              UNION
              SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
              WHERE s.v <> r.u)
    SELECT u AS node, least(u, min(v)) AS component
    FROM reach GROUP BY u
"""


@query("dedup_components", oracle=_COMPONENTS_ORACLE, tags=("bench", "dedup", "components"))
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution (operators/components.py
    connected_components over the jaccard_pairs edge set): (node,
    component-min) for every doc in a near-dup pair -- the back half of
    corpus dedup that turns PAIRS into one survivor per cluster. The
    driver row hash-verifies the star-alternation/union-find result
    against a recursive-CTE transitive closure."""
    from taxi_data_pipeline_pset2_spark.operators.components import (
        connected_components,
    )
    from taxi_data_pipeline_pset2_spark.operators.dedup import jaccard_pairs

    pairs = jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.2)
    return connected_components(pairs)


# ---- exact mixture apportionment -----------------------------------------

_MIX_WEIGHTS = {"en": 0.5, "de": 0.17, "fr": 0.21, "zh": 0.12}
_MIX_TOTAL = 97  # deliberately prime: exercises largest-remainder rounding

_MIX_W_SQL = ", ".join(f"('{d}', {w})" for d, w in sorted(_MIX_WEIGHTS.items()))

_MIXTURE_ORACLE = f"""
    WITH w(lang, wt) AS (VALUES {_MIX_W_SQL}),
    tgt AS (SELECT lang, {_MIX_TOTAL} * wt AS target FROM w),
    takes AS (SELECT lang,
                     CAST(floor(target) AS BIGINT)
                     + CASE WHEN row_number() OVER (ORDER BY floor(target) - target, lang)
                            <= {_MIX_TOTAL} - (SELECT CAST(sum(floor(target)) AS BIGINT) FROM tgt)
                            THEN 1 ELSE 0 END AS take
              FROM tgt),
    ranked AS (SELECT doc_id, lang,
                      row_number() OVER (
                          PARTITION BY lang
                          ORDER BY CAST(('0x' || substr(md5(doc_id::VARCHAR || '|mixture'), 1, 8)) AS BIGINT),
                                   doc_id) AS rk
               FROM documents WHERE lang IN (SELECT lang FROM w))
    SELECT r.doc_id, r.lang
    FROM ranked r JOIN takes tk ON r.lang = tk.lang
    WHERE r.rk <= tk.take
    ORDER BY r.lang, r.doc_id
"""


@query("mixture_exact_sample", oracle=_MIXTURE_ORACLE, tags=("mixing", "sampling"))
def mixture_exact_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact domain-mixture apportionment (operators/mixing.py
    sample_mixture(exact=True)): 97 docs apportioned 50/17/21/12 percent
    across four languages by largest-remainder, rows chosen by the
    engine-portable salted hash rank. The prime total forces fractional
    takes, so the oracle verifies the apportionment arithmetic, not just
    the hash ranking."""
    from taxi_data_pipeline_pset2_spark.operators.mixing import sample_mixture

    docs = t(spark, sf_dir, "documents")
    picked = sample_mixture(
        docs, dict(_MIX_WEIGHTS), domain_col="lang", total=_MIX_TOTAL, exact=True
    )
    return picked.select("doc_id", "lang").orderBy("lang", "doc_id")


# ---- Gopher quality-rule flags -------------------------------------------

_GOPHER_MIN_W, _GOPHER_MAX_W = 20, 80  # split the synthetic corpus

_GOPHER_ORACLE = f"""
    WITH w AS (SELECT doc_id, text,
                      regexp_extract_all(text, '\\S+') AS words,
                      string_split(text, chr(10)) AS lines
               FROM documents),
    m AS (SELECT doc_id,
                 CAST(len(words) AS INT) AS n_words,
                 list_sum(list_transform(words, t -> len(t))) AS sum_len,
                 len(text) - len(replace(text, '#', '')) AS n_hash,
                 len(regexp_extract_all(text, '\\.\\.\\.|…')) AS n_ellipsis,
                 len(lines) AS n_lines,
                 len(list_filter(lines, ln -> regexp_matches(ln, '^\\s*[-*•]'))) AS n_bullet,
                 len(list_filter(lines, ln -> regexp_matches(ln, '(\\.\\.\\.|…)\\s*$'))) AS n_ell_lines,
                 len(list_filter(words, t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha,
                 len(list_filter(['the','be','to','of','and','that','have','with'],
                                 s -> list_contains(list_transform(words, t -> lower(t)), s))) AS n_stop
          FROM w)
    SELECT doc_id, n_words,
           n_words >= {_GOPHER_MIN_W} AND n_words <= {_GOPHER_MAX_W} AS flag_word_count,
           sum_len >= 3 * n_words AND sum_len <= 10 * n_words AS flag_mean_word_len,
           (n_hash + n_ellipsis) * 10 <= n_words AS flag_symbol_ratio,
           n_bullet * 10 <= n_lines AS flag_bullet_lines,
           n_ell_lines * 10 <= n_lines * 3 AS flag_ellipsis_lines,
           n_alpha * 5 >= n_words * 4 AS flag_alpha_words,
           n_stop >= 1 AS flag_stopwords,
           (n_words >= {_GOPHER_MIN_W} AND n_words <= {_GOPHER_MAX_W})
           AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
           AND ((n_hash + n_ellipsis) * 10 <= n_words)
           AND (n_bullet * 10 <= n_lines)
           AND (n_ell_lines * 10 <= n_lines * 3)
           AND (n_alpha * 5 >= n_words * 4)
           AND (n_stop >= 1) AS keep
    FROM m
"""


@query("gopher_quality_flags", oracle=_GOPHER_ORACLE, tags=("bench", "text", "quality"))
def gopher_quality_flags_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality heuristics (operators/text.py gopher_quality_flags;
    Rae et al. 2021 A1.1) as per-rule boolean flags + composite keep.
    Integer cross-multiplied ratio comparisons -> bit-identical flags in
    both engines; one scan, no shuffle, whole-stage codegen."""
    from taxi_data_pipeline_pset2_spark.operators.text import gopher_quality_flags

    return gopher_quality_flags(
        t(spark, sf_dir, "documents"),
        min_words=_GOPHER_MIN_W,
        max_words=_GOPHER_MAX_W,
        min_stopwords=1,  # the synthetic corpus carries only 'the'
    )


# ---- percentile winsorization --------------------------------------------

_WINSOR_ORACLE = """
    WITH b AS (SELECT o_orderpriority,
                      quantile_cont(CAST(o_totalprice AS DOUBLE), 0.05) AS lo,
                      quantile_cont(CAST(o_totalprice AS DOUBLE), 0.95) AS hi
               FROM orders GROUP BY o_orderpriority),
    w AS (SELECT o.o_orderpriority,
                 CAST(o.o_totalprice AS DOUBLE) AS v, b.lo, b.hi,
                 ROUND(least(greatest(CAST(o.o_totalprice AS DOUBLE), b.lo), b.hi), 6) AS wv
          FROM orders o JOIN b USING (o_orderpriority))
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
           CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
           ROUND(CAST(SUM(CAST(wv AS DECIMAL(28,6))) AS DOUBLE) / COUNT(wv), 6) AS mean_winsorized
    FROM w GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("winsorized_price_stats", oracle=_WINSOR_ORACLE, tags=("robust", "agg"))
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization (operators/robust.py): per-priority
    [p05, p95] clip of order prices with clip-count audit and the robust
    mean. Thresholds come from one group-sized aggregate and broadcast
    back onto the scan; the clip is a projection. At 100 TB swap
    exact=False for the mergeable percentile_approx sketch."""
    from taxi_data_pipeline_pset2_spark.operators.robust import winsorized_stats

    return winsorized_stats(
        t(spark, sf_dir, "orders"), "o_totalprice", ["o_orderpriority"]
    )


# ---- per-group deterministic sample --------------------------------------

_PGS_N = 3

_PGS_ORACLE = f"""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY CAST(('0x' || substr(md5(doc_id::VARCHAR || '|group-sample-v1'), 1, 8)) AS BIGINT),
                            doc_id) AS rk
        FROM documents)
    SELECT doc_id, source FROM ranked WHERE rk <= {_PGS_N}
    ORDER BY source, doc_id
"""


@query("per_group_sample_rows", oracle=_PGS_ORACLE, tags=("sampling",))
def per_group_sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic n-per-group sampling (operators/sampling.py
    per_group_sample): 3 docs per source by salted-hash rank -- the
    balanced-eval-set / per-domain-spot-check draw. One window shuffle
    on the group key; the oracle reproduces the identical md5 ranking."""
    from taxi_data_pipeline_pset2_spark.operators.sampling import per_group_sample

    docs = t(spark, sf_dir, "documents")
    return per_group_sample(docs, _PGS_N, "source").select(
        "doc_id", "source"
    ).orderBy("source", "doc_id")


# ---- rows-only tail entries ----------------------------------------------
# (registered past the driver's 50-entry window -- see catalog.py
# _DEPRIORITIZED -- so the remaining pytest-only operator families still
# surface through queries() and get the weaker rows-only driver check if
# the driver honors >50 entries; their strong evidence is the pytest
# suite cited in COVERAGE.md)


def _mmr_oracle(k: int = 5, lam: float = 0.7, knn_k: int = 10) -> str:
    """DuckDB twin of the fixed-k greedy MMR: the selection loop unrolls
    into one (penalty, argmax) CTE pair per round. Literals injected via
    repr() (python 1.0-0.7 = 0.30000000000000004, not decimal 0.3);
    in-candidate similarities are the UNROUNDED quotient of the exact
    int64 dot by the sqrt-norm product, exactly the numpy kernel's
    arithmetic; argmax tie-break is (mmr desc, neighbor_id) -- numpy's
    first-max over the id-sorted frame."""
    from taxi_data_pipeline_pset2_spark.queries.similarity import (
        _SQL_COS,
        _SQL_PREP,
    )

    l_ = repr(lam)
    om = repr(1.0 - lam)
    sim = (
        "CAST(list_sum(list_transform(generate_series(1, len(c.iv)),"
        " i -> c.iv[i] * sn.iv[i])) AS DOUBLE)"
        " / (sqrt(CAST(c.norm2 AS DOUBLE)) * sqrt(CAST(sn.norm2 AS DOUBLE)))"
    )
    parts = [
        f"""{_SQL_PREP},
        q AS (SELECT * FROM n WHERE vec_id % 50 = 0),
        pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                         CAST(list_sum(list_transform(generate_series(1, len(q.iv)),
                                                      i -> q.iv[i] * c.iv[i])) AS BIGINT) AS dot,
                         q.norm2 AS qn, c.norm2 AS cn
                  FROM q JOIN n c ON c.vec_id <> q.vec_id),
        cand AS (SELECT query_id, neighbor_id, {_SQL_COS} AS rel
                 FROM pairs
                 WINDOW w AS (PARTITION BY query_id ORDER BY {_SQL_COS} DESC, neighbor_id)
                 QUALIFY row_number() OVER w <= {knn_k}),
        cv AS (SELECT c.query_id, c.neighbor_id, c.rel, n.iv, n.norm2
               FROM cand c JOIN n ON n.vec_id = c.neighbor_id),
        sel1 AS (SELECT query_id, neighbor_id, rel, CAST({l_} AS DOUBLE) * rel AS mmr_score
                 FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                              ORDER BY CAST({l_} AS DOUBLE) * rel DESC, neighbor_id) AS rn
                       FROM cv)
                 WHERE rn = 1),
        acc1 AS (SELECT query_id, neighbor_id FROM sel1)"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f"""pen{r} AS (
          SELECT c.query_id, c.neighbor_id, c.rel, max({sim}) AS pen
          FROM cv c
          JOIN acc{r - 1} a ON a.query_id = c.query_id
          JOIN n sn ON sn.vec_id = a.neighbor_id
          WHERE NOT EXISTS (SELECT 1 FROM acc{r - 1} x
                            WHERE x.query_id = c.query_id
                              AND x.neighbor_id = c.neighbor_id)
          GROUP BY c.query_id, c.neighbor_id, c.rel),
        sel{r} AS (SELECT query_id, neighbor_id, rel, mmr AS mmr_score FROM (
              SELECT *, CAST({l_} AS DOUBLE) * rel - CAST({om} AS DOUBLE) * pen AS mmr,
                     row_number() OVER (PARTITION BY query_id
                        ORDER BY CAST({l_} AS DOUBLE) * rel - CAST({om} AS DOUBLE) * pen DESC,
                                 neighbor_id) AS rn
              FROM pen{r}) WHERE rn = 1),
        acc{r} AS (SELECT query_id, neighbor_id FROM acc{r - 1}
                   UNION ALL SELECT query_id, neighbor_id FROM sel{r})"""
        )
    finals = "\n        UNION ALL ".join(
        f"SELECT query_id, neighbor_id, CAST({r} AS INT) AS mmr_rank,"
        f" rel AS relevance, mmr_score FROM sel{r}"
        for r in range(1, k + 1)
    )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"\n        {finals}\n        ORDER BY query_id, mmr_rank"
    )


@query("mmr_rerank_topk", oracle=_mmr_oracle(), tags=("similarity", "rerank"))
def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification (operators/mmr.py): top-10 cosine neighbors
    per query re-ranked to 5 diverse picks (lambda=0.7). The greedy loop
    is FIXED at 5 picks, so it unrolls into a chained-CTE DuckDB oracle
    (_mmr_oracle) with bit-identical arithmetic -- upgraded from the
    weaker rows-only check in r8; brute-force reference equality is also
    pinned in tests/test_mmr.py."""
    from taxi_data_pipeline_pset2_spark.operators.mmr import mmr_rerank
    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        knn_topk_vectorized,
    )

    emb = t(spark, sf_dir, "embeddings")
    neighbors = knn_topk_vectorized(emb, F.col("vec_id") % 50 == 0, k=10)
    return mmr_rerank(neighbors, emb, k=5)


def _semdedup_oracle(k: int = 8, n_iter: int = 4, threshold: float = 0.95) -> str:
    """DuckDB twin of the whole SemDeDup pipeline, possible since the
    r9 exact-integer k-means: the unrolled Lloyd chain (reused verbatim
    from similarity._kmeans_oracle as a derived table -- its inner WITH
    shadows this one's) supplies (vec_id, cluster, dist); in-cluster
    pairs filter on the exact int-scaled 6-dp cosine; the duplicate
    components close with a recursive CTE (the dedup_components
    pattern); and the survivor ranking replays the farthest-from-
    centroid / lowest-id policy on the shared 6-dp dist. Output =
    surviving (vec_id, label) rows."""
    from taxi_data_pipeline_pset2_spark.queries.similarity import (
        _kmeans_oracle,
    )

    kmeans_sql = _kmeans_oracle(k=k, n_iter=n_iter)
    cos = (
        "ROUND(CAST(list_sum(list_transform(generate_series(1, 64),"
        " i -> a.iv[i] * b.iv[i])) AS DOUBLE)"
        " / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))), 6)"
    )
    return f"""
    WITH RECURSIVE
    prep AS (SELECT vec_id, label,
                    list_transform(embedding::DOUBLE[],
                                   x -> CAST(round(x * 1000000) AS BIGINT)) AS iv
             FROM embeddings),
    n AS (SELECT vec_id, label, iv,
                 CAST(list_sum(list_transform(iv, x -> x * x)) AS BIGINT) AS norm2
          FROM prep),
    assign AS MATERIALIZED (SELECT * FROM ({kmeans_sql})),
    cands AS MATERIALIZED (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM assign a JOIN assign b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
    pairs AS MATERIALIZED (
        SELECT c.id_a, c.id_b
        FROM cands c JOIN n a ON a.vec_id = c.id_a
        JOIN n b ON b.vec_id = c.id_b
        WHERE {cos} >= {threshold}),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach AS (SELECT u, v FROM sym
              UNION
              SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
              WHERE s.v <> r.u),
    comp AS (SELECT u AS node, least(u, min(v)) AS component
             FROM reach GROUP BY u),
    ranked AS (
        SELECT comp.node,
               row_number() OVER (PARTITION BY comp.component
                                  ORDER BY asg.dist DESC, comp.node ASC) AS rk
        FROM comp JOIN assign asg ON asg.vec_id = comp.node),
    losers AS (SELECT node FROM ranked WHERE rk > 1)
    SELECT vec_id, label FROM embeddings
    WHERE vec_id NOT IN (SELECT node FROM losers)
    ORDER BY vec_id
    """


@query(
    "semdedup_survivors",
    oracle=_semdedup_oracle(threshold=0.4),
    tags=("dedup", "similarity"),
)
def semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/semdedup.py): k-means clusters -> in-cluster
    cosine pairs -> farthest-from-centroid survivor per component.
    FULL oracle since r9 (_semdedup_oracle): exact-integer Lloyd chain
    + exact 6-dp cosines + recursive-CTE component closure + the same
    6-dp-dist survivor policy -- the last 'iterative, no SQL twin'
    claim in the dedup family is gone. Threshold 0.4 here, NOT the
    operator's usual ~0.95: the synthetic corpus has no 0.95-cosine
    pairs, so 0.4 (the established near-dup operating point, cf.
    dedup_embedding_cosine) is what makes the component closure and
    survivor ranking actually fire on this data rather than pass every
    row through. Planted-dup collapse and keep-policy at high
    thresholds stay pinned in tests/test_semdedup.py."""
    from taxi_data_pipeline_pset2_spark.operators.semdedup import semantic_dedup

    emb = t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, k=8, n_iter=4, threshold=0.4).select(
        "vec_id", "label"
    ).orderBy("vec_id")


def _packing_oracle(budget: int = 64) -> str:
    """DuckDB twin of the per-shard best-fit-decreasing placement,
    unrolled as an ordered RECURSIVE CTE (VERDICT r8 item #8): the
    sequential state -- python's bisect-sorted (room, bin) open-bin
    list -- encodes losslessly as one BIGINT list, room * 2^32 + bin
    (room <= budget < 2^32, bin ids dense), so BFD's
    bisect_left((ln, -1)) pop is EXACTLY
    list_min(list_filter(enc, e -> e >= ln * 2^32)): encoded order is
    (room, bin) lexicographic order and bins are non-negative. Each
    recursion step places one doc per shard (all 64 shards advance in
    lockstep; depth = max shard size), and seq_pos falls out AFTER the
    recursion as row_number over placement order, so the state never
    carries per-bin fill counts. Oversize docs (ln > budget) open a
    dedicated bin that is never inserted into the open list -- same
    contract as the engine."""
    return f"""
    WITH RECURSIVE docs0 AS (
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
               CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT) % 64 AS shard
        FROM documents),
    ordered AS (
        SELECT doc_id, n_tokens, shard,
               CAST(row_number() OVER (PARTITION BY shard
                    ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rn
        FROM docs0),
    steps AS (
        SELECT shard, CAST(0 AS BIGINT) AS rn,
               CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_tokens,
               CAST([] AS BIGINT[]) AS enc, CAST(0 AS BIGINT) AS n_bins,
               CAST(NULL AS BIGINT) AS seq_local, CAST(NULL AS BOOLEAN) AS oversize
        FROM (SELECT DISTINCT shard FROM ordered)
        UNION ALL
        SELECT shard, rn, doc_id, n_tokens,
               CASE WHEN is_over THEN enc
                    WHEN best IS NULL THEN
                         CASE WHEN {budget} - n_tokens > 0
                              THEN list_append(enc, ({budget} - n_tokens) * 4294967296 + n_bins)
                              ELSE enc END
                    ELSE
                         CASE WHEN (best // 4294967296) - n_tokens > 0
                              THEN list_append(
                                     list_concat(enc[1:list_position(enc, best) - 1],
                                                 enc[list_position(enc, best) + 1:len(enc)]),
                                     ((best // 4294967296) - n_tokens) * 4294967296
                                     + (best % 4294967296))
                              ELSE list_concat(enc[1:list_position(enc, best) - 1],
                                               enc[list_position(enc, best) + 1:len(enc)])
                         END
               END AS enc,
               CASE WHEN is_over OR best IS NULL THEN n_bins + 1 ELSE n_bins END AS n_bins,
               CASE WHEN is_over OR best IS NULL THEN n_bins
                    ELSE best % 4294967296 END AS seq_local,
               is_over AS oversize
        FROM (
            SELECT s.enc, s.n_bins, o.shard, o.rn, o.doc_id, o.n_tokens,
                   o.n_tokens > {budget} AS is_over,
                   list_min(list_filter(s.enc,
                            e -> e >= o.n_tokens * 4294967296)) AS best
            FROM steps s JOIN ordered o
              ON o.shard = s.shard AND o.rn = s.rn + 1))
    SELECT doc_id, CAST(shard AS INTEGER) AS shard,
           shard * 4294967296 + seq_local AS seq_id,
           CAST(row_number() OVER (PARTITION BY shard, seq_local ORDER BY rn) - 1
                AS INTEGER) AS seq_pos,
           n_tokens, oversize
    FROM steps WHERE rn > 0
    ORDER BY doc_id
    """


@query("packing_assignments", oracle=_packing_oracle(), tags=("packing",))
def packing_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/packing.py): hash-sharded best-fit-
    decreasing assignment of docs into fixed token-budget training
    sequences. FULL oracle since r9 (_packing_oracle): the sequential
    per-shard placement unrolls into an ordered recursive CTE whose
    encoded-bigint open-bin list reproduces BFD's bisect pop exactly.
    Budget 64 here, NOT the operator's realistic 2048 default: the
    synthetic corpus' docs run 1-99 tokens, so 64 is the operating
    point that exercises bin fill, best-fit ties AND the
    oversize-dedicated-bin path on this data (2048 would pack each
    shard into one bin and verify almost nothing). Budget/lossless/
    determinism invariants stay in tests/test_packing.py + the
    hypothesis sweep in tests/test_properties.py."""
    from taxi_data_pipeline_pset2_spark.operators.packing import pack_sequences

    docs = t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), r"\s+")).cast("long")
    )
    return pack_sequences(docs, token_budget=64)


# ---- CDC snapshot diff ---------------------------------------------------

_CDC_ORACLE = """
    WITH old AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                 FROM orders WHERE o_orderkey % 4 <> 1),
    new AS (SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
                   o_totalprice
            FROM orders WHERE o_orderkey % 4 <> 2),
    j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                 o.o_orderkey IS NOT NULL AS in_old,
                 n.o_orderkey IS NOT NULL AS in_new,
                 o.o_orderstatus AS old_o_orderstatus,
                 o.o_totalprice AS old_o_totalprice,
                 n.o_orderstatus AS new_o_orderstatus,
                 n.o_totalprice AS new_o_totalprice
          FROM old o FULL OUTER JOIN new n ON o.o_orderkey IS NOT DISTINCT FROM n.o_orderkey)
    SELECT o_orderkey,
           CASE WHEN NOT in_old THEN 'insert'
                WHEN NOT in_new THEN 'delete'
                WHEN old_o_orderstatus IS DISTINCT FROM new_o_orderstatus
                  OR old_o_totalprice IS DISTINCT FROM new_o_totalprice THEN 'update'
                ELSE 'unchanged' END AS change_type,
           old_o_orderstatus, old_o_totalprice,
           new_o_orderstatus, new_o_totalprice
    FROM j
    WHERE NOT (in_old AND in_new
               AND old_o_orderstatus IS NOT DISTINCT FROM new_o_orderstatus
               AND old_o_totalprice IS NOT DISTINCT FROM new_o_totalprice)
"""


@query("snapshot_diff_orders", oracle=_CDC_ORACLE, tags=("cdc",))
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff (operators/cdc.py): insert/update/delete
    changelog between two synthetic order snapshots (drop keys %4==2,
    add keys %4==1, restate status for keys %7==0). One full-outer
    co-shuffle on the key, NULL-safe attribute compare -- the delta a
    MERGE or cache-invalidation consumer feeds on."""
    from taxi_data_pipeline_pset2_spark.operators.cdc import snapshot_diff

    orders = t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 4 != 1).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 4 != 2).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    return snapshot_diff(old, new, ["o_orderkey"])


# ---- ROLLUP / grouping sets ----------------------------------------------

_ROLLUP_SETS_ORACLE = f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n_orders,
           {sql_dec_sum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
"""


@query("rollup_grouping_sets", oracle=_ROLLUP_SETS_ORACLE, tags=("agg", "rollup"))
def rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (status, priority) -> subtotals ->
    grand total in ONE aggregate pass -- Spark's native ``rollup`` emits
    all grouping sets from a single shuffle (each mapper produces one
    partial per set), the warehouse idiom the reference's dashboards
    would reach for next. ``grouping()`` bits disambiguate real NULLs
    from subtotal rows."""
    orders = t(spark, sf_dir, "orders")
    g_status = F.grouping("o_orderstatus").cast("int")
    g_prio = F.grouping("o_orderpriority").cast("int")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (g_status * 2 + g_prio).cast("bigint").alias("gid"),
            F.count("*").alias("n_orders"),
            dec_sum("o_totalprice").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "revenue",
        )
        .orderBy("gid", "status", "priority")
    )


# ---- z-score outlier audit -----------------------------------------------

_ZSCORE_T = 1.5  # uniform-ish synthetic prices max out near |z| ~ 1.7

_ZSCORE_ORACLE = f"""
    WITH s AS (SELECT o_orderpriority,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sx,
                      CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS sx2,
                      count(o_totalprice) AS n
               FROM orders GROUP BY o_orderpriority),
    st AS (SELECT o_orderpriority, sx / n AS mean,
                  (sx2 - sx * sx / n) / (n - 1) AS var
           FROM s),
    z AS (SELECT o.o_orderpriority,
                 ROUND((CAST(o.o_totalprice AS DOUBLE) - st.mean) / sqrt(st.var), 6) AS zs
          FROM orders o JOIN st USING (o_orderpriority))
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(SUM(CASE WHEN abs(zs) > {_ZSCORE_T} THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           max(abs(zs)) AS max_abs_z
    FROM z GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("zscore_price_outliers", oracle=_ZSCORE_ORACLE, tags=("robust", "agg"))
def zscore_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier audit (operators/robust.py zscore_flag):
    decimal-exact group moments broadcast back onto the scan, rounded
    z-scores, |z| > 1.5 counts per priority. The metric-anomaly twin of
    winsorized_price_stats."""
    from taxi_data_pipeline_pset2_spark.operators.robust import zscore_flag

    z = zscore_flag(
        t(spark, sf_dir, "orders"), "o_totalprice", ["o_orderpriority"],
        threshold=_ZSCORE_T,
    )
    return (
        z.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
            F.max(F.abs("zscore")).alias("max_abs_z"),
        )
        .orderBy("o_orderpriority")
    )


# ---- quality-mass selection ----------------------------------------------

_QMASS_P = 0.5

_QMASS_ORACLE = f"""
    WITH r AS (SELECT doc_id, lang, n_chars,
                      SUM(CAST(n_chars AS DECIMAL(28,6))) OVER (
                          PARTITION BY lang
                          ORDER BY n_chars DESC, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
                      SUM(CAST(n_chars AS DECIMAL(28,6))) OVER (PARTITION BY lang) AS tot,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY n_chars DESC, doc_id) AS rn
               FROM documents)
    SELECT doc_id, lang, n_chars
    FROM r
    WHERE run - CAST(n_chars AS DECIMAL(28,6)) < tot * {_QMASS_P} OR rn = 1
    ORDER BY lang, doc_id
"""


@query("quality_mass_selection", oracle=_QMASS_ORACLE, tags=("sampling", "curation"))
def quality_mass_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-mass truncation (operators/sampling.py
    select_quality_mass): per language, keep the largest docs until half
    the character mass is covered (n_chars plays both score and weight
    here; in a real pipeline score = quality model, weight = token
    count). Decimal-exact running sums make the cut deterministic."""
    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        select_quality_mass,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return select_quality_mass(
        docs, "n_chars", "n_chars", _QMASS_P, ["lang"]
    ).orderBy("lang", "doc_id")


# ---- lexicon sentiment scoring -------------------------------------------

def _sentiment_oracle() -> str:
    from taxi_data_pipeline_pset2_spark.operators.text import SENTIMENT_LEXICON

    lex = ", ".join(
        f"('{w}', {s})" for w, s in sorted(SENTIMENT_LEXICON.items())
    )
    return f"""
        WITH lex(word, score) AS (VALUES {lex}),
        toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
                 FROM documents),
        m AS (SELECT t.doc_id, l.score FROM toks t JOIN lex l ON t.tok = l.word),
        agg AS (SELECT doc_id,
                       CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                       CAST(SUM(CASE WHEN score < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
                       ROUND(SUM(score) * 1.0 / count(*), 6) AS sentiment
                FROM m GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(a.n_pos, 0) AS n_pos,
               coalesce(a.n_neg, 0) AS n_neg,
               a.sentiment
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """


@query("sentiment_scores", oracle=_sentiment_oracle(), tags=("text",))
def sentiment_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon valence scoring (operators/text.py sentiment_scores; the
    SURVEY 2b sentiment-style cell): scan-shaped map-literal lookup, no
    UDF/shuffle/join; mean valence over matched tokens, NULL when no
    lexicon token appears."""
    from taxi_data_pipeline_pset2_spark.operators.text import sentiment_scores

    return sentiment_scores(t(spark, sf_dir, "documents"))


# ---- supplier balance by region (completes driver-table coverage) --------

_SUPPLIER_REGION_ORACLE = f"""
    SELECT r.r_name AS region,
           count(*) AS n_suppliers,
           {sql_dec_sum('s.s_acctbal')} AS total_acctbal,
           {sql_dec_avg('s.s_acctbal', scale=2)} AS avg_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
"""


@query("supplier_balance_by_region", oracle=_SUPPLIER_REGION_ORACLE, tags=("agg", "join"))
def supplier_balance_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop dimension rollup supplier -> nation -> region (the last
    two driver tables no other entry touched): both dims broadcast, one
    aggregate, decimal-exact balances. Completes catalog coverage of
    all ten driver tables."""
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = t(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), F.col("n_regionkey") == reg["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_suppliers"),
            dec_sum("s_acctbal").alias("total_acctbal"),
            dec_avg("s_acctbal", scale=2).alias("avg_acctbal"),
        )
        .orderBy("region")
    )


# ---- vocabulary building -------------------------------------------------

_VOCAB_K = 40

_VOCAB_ORACLE = f"""
    WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
                  FROM documents),
    c AS (SELECT token, count(*) AS n_occurrences,
                 count(DISTINCT doc_id) AS n_docs
          FROM toks GROUP BY token)
    SELECT token, n_occurrences, n_docs,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) AS BIGINT) AS rank
    FROM c
    ORDER BY n_occurrences DESC, token
    LIMIT {_VOCAB_K}
"""


@query("vocab_top_tokens", oracle=_VOCAB_ORACLE, tags=("text", "vocab"))
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building (operators/text.py build_vocab): top-40
    tokens by corpus frequency with document frequencies -- one combined
    hash aggregate + TakeOrdered top-k, driver traffic bounded by the
    vocab size."""
    from taxi_data_pipeline_pset2_spark.operators.text import build_vocab

    return build_vocab(t(spark, sf_dir, "documents"), max_size=_VOCAB_K)


# ---- interval-overlap range join -----------------------------------------

# fixed maintenance windows inside the events table's January range
_MAINT = (
    ("m1", "2024-01-05 00:00:00", "2024-01-06 12:00:00"),
    ("m2", "2024-01-14 06:00:00", "2024-01-15 00:00:00"),
    ("m3", "2024-01-25 00:00:00", "2024-01-28 00:00:00"),
)

_MAINT_SQL = ", ".join(
    f"('{w}', TIMESTAMP '{a}', TIMESTAMP '{b}')" for w, a, b in _MAINT
)

_SESS_OVERLAP_ORACLE = f"""
    WITH d AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id, ts,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
        FROM d),
    sess AS (SELECT user_id, session_num,
                    min(ts) AS session_start, max(ts) AS session_end
             FROM s GROUP BY user_id, session_num),
    w(win_id, win_start, win_end) AS (VALUES {_MAINT_SQL})
    SELECT sess.user_id, sess.session_num, w.win_id
    FROM sess JOIN w
      ON sess.session_start <= w.win_end AND w.win_start <= sess.session_end
    ORDER BY sess.user_id, sess.session_num, w.win_id
"""


@query(
    "session_maintenance_overlap",
    oracle=_SESS_OVERLAP_ORACLE,
    tags=("rangejoin", "session"),
)
def session_maintenance_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap range join (operators/rangejoin.py
    interval_overlap_join): user activity sessions (gap sessionization,
    the session_counts pipeline) overlapped with fixed maintenance
    windows -- which sessions were exposed to which incident. Day-wide
    buckets, dim-sized window side broadcast, arithmetic pair dedup."""
    from taxi_data_pipeline_pset2_spark.operators.rangejoin import (
        interval_overlap_join,
    )
    from taxi_data_pipeline_pset2_spark.queries.pipeline_ops import session_counts

    sessions = session_counts(spark, sf_dir).select(
        "user_id", "session_num", "session_start", "session_end"
    )
    ts_type = dict(sessions.dtypes)["session_start"]
    windows = spark.createDataFrame(
        list(_MAINT), "win_id string, win_start string, win_end string"
    ).select(
        "win_id",
        F.col("win_start").cast(ts_type).alias("win_start"),
        F.col("win_end").cast(ts_type).alias("win_end"),
    )
    joined = interval_overlap_join(
        sessions, windows,
        "session_start", "session_end", "win_start", "win_end",
        bucket_width=86_400.0, broadcast_right=True,
    )
    return joined.select("user_id", "session_num", "win_id").orderBy(
        "user_id", "session_num", "win_id"
    )


# ---- equal-frequency discretization --------------------------------------

_QBIN_N = 8
_QBIN_PROBS = ", ".join(str(i / _QBIN_N) for i in range(1, _QBIN_N))

_QBIN_ORACLE = f"""
    WITH q AS (SELECT list_distinct(list_transform(
                   quantile_cont(CAST(o_totalprice AS DOUBLE), [{_QBIN_PROBS}]),
                   x -> ROUND(x, 6))) AS qs
               FROM orders),
    b AS (SELECT CAST(o_totalprice AS DOUBLE) AS v,
                 CAST(len(list_filter((SELECT qs FROM q),
                                      x -> CAST(o_totalprice AS DOUBLE) > x)) AS INT) AS bin
          FROM orders)
    SELECT bin, count(*) AS n_orders,
           min(v) AS min_price, max(v) AS max_price
    FROM b GROUP BY bin ORDER BY bin
"""


@query("quantile_binned_prices", oracle=_QBIN_ORACLE, tags=("profiling", "agg"))
def quantile_binned_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization (operators/profiling.py
    quantile_bin, exact mode): order prices into 8 quantile bins, per-bin
    count and value range. Boundaries are 6-dp-rounded PERCENTILE_CONT
    values, so the bin edges -- and therefore every assignment -- are
    bit-identical across engines."""
    from taxi_data_pipeline_pset2_spark.operators.profiling import quantile_bin

    orders = t(spark, sf_dir, "orders").select("o_totalprice")
    binned = quantile_bin(orders, "o_totalprice", bins=_QBIN_N, exact=True)
    v = F.col("o_totalprice").cast("double")
    return (
        binned.groupBy(F.col("o_totalprice_bin").alias("bin"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min(v).alias("min_price"),
            F.max(v).alias("max_price"),
        )
        .orderBy("bin")
    )


# ---- DSIR importance resampling ------------------------------------------

_DSIR_B = 512  # hashed-feature buckets
_DSIR_K = 60


def _dsir_grams_sql(src: str) -> str:
    """Unigram+bigram stream (doc_id, g) of a documents subquery --
    the SQL twin of operators/dsir._grams."""
    return f"""
        SELECT doc_id, unnest(ts) AS g FROM {src}
        UNION ALL
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts)),
                                     i -> ts[i] || ' ' || ts[i + 1])) AS g
        FROM {src}
    """


_DSIR_ORACLE = f"""
    WITH cand AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
                  FROM documents WHERE doc_id % 7 <> 0),
    tgt AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
            FROM documents WHERE doc_id % 7 = 0),
    cg AS ({_dsir_grams_sql('cand')}),
    tg AS ({_dsir_grams_sql('tgt')}),
    cbuck AS (SELECT doc_id,
                     CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % {_DSIR_B} AS BIGINT) AS bucket
              FROM cg),
    tbuck AS (SELECT CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % {_DSIR_B} AS BIGINT) AS bucket
              FROM tg),
    scnt AS (SELECT bucket, count(*) AS n FROM cbuck GROUP BY bucket),
    tcnt AS (SELECT bucket, count(*) AS n FROM tbuck GROUP BY bucket),
    stot AS (SELECT sum(n) + {_DSIR_B} AS d FROM scnt),
    ttot AS (SELECT sum(n) + {_DSIR_B} AS d FROM tcnt),
    smodel AS (SELECT bucket, CAST(round(ln((n + 1) / (SELECT d FROM stot)) * 1000000) AS BIGINT) AS logp_s
               FROM scnt),
    tmodel AS (SELECT bucket, CAST(round(ln((n + 1) / (SELECT d FROM ttot)) * 1000000) AS BIGINT) AS logp_t
               FROM tcnt),
    feats AS (SELECT doc_id, bucket, count(*) AS cnt FROM cbuck GROUP BY doc_id, bucket),
    scored AS (
        SELECT f.doc_id,
               CAST(sum(f.cnt) AS BIGINT) AS n_grams,
               CAST(sum(f.cnt * (coalesce(t.logp_t, CAST(round(ln(1.0 / (SELECT d FROM ttot)) * 1000000) AS BIGINT))
                               - coalesce(s.logp_s, CAST(round(ln(1.0 / (SELECT d FROM stot)) * 1000000) AS BIGINT)))) AS BIGINT) AS ratio_m
        FROM feats f
        LEFT JOIN tmodel t USING (bucket)
        LEFT JOIN smodel s USING (bucket)
        GROUP BY f.doc_id
    )
    SELECT doc_id, n_grams, round(ratio_m / 1000000.0, 6) AS log_ratio
    FROM scored
    ORDER BY log_ratio DESC, doc_id
    LIMIT {_DSIR_K}
"""


@query("dsir_topk_selection", oracle=_DSIR_ORACLE, tags=("bench", "text", "dsir"))
def dsir_topk_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (operators/dsir.py): the 60 candidate
    documents most like the target slice (doc_id % 7 == 0) by hashed
    unigram+bigram log-likelihood ratio. Two model fits (bucket-space
    aggregates, <= 512 rows each, broadcast back), one candidate
    feature aggregate, TakeOrdered top-k -- integer-millionths log
    arithmetic end to end, so the ranking hash-matches DuckDB."""
    from taxi_data_pipeline_pset2_spark.operators.dsir import dsir_select_topk

    docs = t(spark, sf_dir, "documents")
    return dsir_select_topk(
        candidates=docs.filter(F.col("doc_id") % 7 != 0),
        target=docs.filter(F.col("doc_id") % 7 == 0),
        k=_DSIR_K,
        n_buckets=_DSIR_B,
    ).orderBy(F.desc("log_ratio"), F.asc("doc_id"))


# ---- changelog-maintained rollup -----------------------------------------

_MAINT_ROLLUP_ORACLE = """
    WITH newsnap AS (
        SELECT o_orderkey, o_orderpriority,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 13 <> 0
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM newsnap
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("rollup_changelog_maintenance", oracle=_MAINT_ROLLUP_ORACLE, tags=("cdc", "rollup"))
def rollup_changelog_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-maintained aggregate (operators/rollup.py
    apply_changelog_to_rollup): the rollup is built on the OLD orders
    snapshot, a CDC changelog (deletes: key % 13 == 0; updates:
    key % 7 == 0 price bump) is derived via snapshot_diff, and the
    maintenance path applies signed per-group deltas -- the oracle
    recomputes the NEW snapshot from scratch, so a hash match proves
    maintenance == recompute without the fact rescan. Integer-cents sums
    keep the delta algebra exact."""
    from taxi_data_pipeline_pset2_spark.operators.cdc import snapshot_diff
    from taxi_data_pipeline_pset2_spark.operators.rollup import (
        apply_changelog_to_rollup,
    )

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    new = orders.filter(F.col("o_orderkey") % 13 != 0).withColumn(
        "cents",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("cents") + F.lit(10000)
        ).otherwise(F.col("cents")),
    )
    base = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    log = snapshot_diff(
        orders, new, ["o_orderkey"], compare_cols=["o_orderpriority", "cents"]
    )
    maintained = apply_changelog_to_rollup(
        base, log, ["o_orderpriority"], ["cents"], count_col="n"
    )
    return maintained.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
    ).orderBy("o_orderpriority")


# ---- SCD2 point-in-time reconstruction -----------------------------------

_ASOF_SNAP_TS = "2024-02-01"  # the middle snapshot of the SCD2 fixture

_SCD2_ASOF_ORACLE = f"""
    SELECT c_mktsegment AS segment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    GROUP BY segment, bal_bucket
    ORDER BY segment, bal_bucket
"""


@query("scd2_as_of_snapshot", oracle=_SCD2_ASOF_ORACLE, tags=("scd",))
def scd2_as_of_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reconstruction round trip (plans/scd.py scd2_as_of):
    the same three-snapshot customer history as scd2_history, collapsed
    to SCD2 and reconstructed AS OF the middle snapshot's timestamp,
    then aggregated. The oracle recomputes the middle snapshot directly
    from the dimension -- a hash match proves snapshots -> SCD2 ->
    as-of is the identity for tracked attributes."""
    from taxi_data_pipeline_pset2_spark.plans.scd import (
        scd2_as_of,
        scd2_from_snapshots,
    )

    cust = t(spark, sf_dir, "customer")
    snaps = None
    for ts, div in (("2024-01-01", 1000), ("2024-02-01", 1000), ("2024-03-01", 500)):
        s = cust.select(
            "c_custkey",
            F.lit(ts).cast("timestamp").alias("snapshot_ts"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / div).cast("bigint").alias("bal_bucket"),
        )
        snaps = s if snaps is None else snaps.unionByName(s)
    hist = scd2_from_snapshots(
        snaps, ["c_custkey"], ["segment", "bal_bucket"], "snapshot_ts"
    )
    return (
        scd2_as_of(hist, _ASOF_SNAP_TS)
        .groupBy("segment", "bal_bucket")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("segment", "bal_bucket")
    )


# ---- time-series regularization ------------------------------------------

_TRANSITIONS_ORACLE = """
    WITH seq AS (
        SELECT event_type AS from_state,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_state
        FROM events
    )
    SELECT from_state, to_state,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY from_state), 6) AS p
    FROM seq WHERE to_state IS NOT NULL
    GROUP BY from_state, to_state
    ORDER BY from_state, to_state
"""


@query("event_transitions", oracle=_TRANSITIONS_ORACLE, tags=("events", "window"))
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event transition matrix (operators/timeseries.py
    transition_counts): per-user lead() pairs, one window shuffle, one
    state-vocabulary-sized aggregate, row-normalized probabilities."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        transition_counts,
    )
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    return transition_counts(
        ev, ["user_id"], "ts", "event_type", tie_cols=["event_id"]
    ).orderBy("from_state", "to_state")


_LOCF_ORACLE = """
    WITH ev AS (SELECT user_id, event_id, ts, value FROM events WHERE user_id < 30),
    b AS (SELECT user_id, date_trunc('hour', ts) AS bucket, ts, event_id, value FROM ev),
    lastv AS (
        SELECT user_id, bucket, value, TRUE AS present FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, bucket
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM b) WHERE rn = 1
    ),
    bounds AS (SELECT user_id, date_trunc('hour', min(ts)) AS lo,
                      date_trunc('hour', max(ts)) AS hi
               FROM ev GROUP BY user_id),
    spine AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
              FROM bounds),
    j AS (SELECT s.user_id, s.bucket, l.value,
                 NOT coalesce(l.present, FALSE) AS is_filled
          FROM spine s LEFT JOIN lastv l USING (user_id, bucket))
    SELECT user_id, bucket AS ts,
           CASE WHEN is_filled
                THEN (last_value(CASE WHEN NOT is_filled THEN {'v': value} END
                                 IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING)).v
                ELSE value END AS value,
           is_filled
    FROM j
    ORDER BY user_id, ts
"""


@query("hourly_value_locf", oracle=_LOCF_ORACLE, tags=("events", "timeseries"))
def hourly_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly regularization with LOCF gap fill
    (operators/timeseries.py resample_locf): spine from each user's
    first to last hour, bucket value = last observation (ties by
    event_id), empty buckets carry forward with is_filled marked. One
    sort-shuffle on (user, hour) -- the minimum an order-dependent fill
    needs."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        resample_locf,
    )
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return resample_locf(
        ev, ["user_id"], "ts", ["value"], step="1 hour", tie_cols=["event_id"]
    ).orderBy("user_id", "ts")


# ---- Hampel rolling-median outliers --------------------------------------

_HAMPEL_ORACLE = """
    WITH ev AS (SELECT user_id, event_id, ts, value FROM events WHERE user_id < 40),
    win AS (
        SELECT user_id, event_id, value,
               list_sort(list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS w
        FROM ev
    ),
    med AS (
        SELECT user_id, event_id, value, w,
               CASE WHEN len(w) % 2 = 1 THEN w[len(w) // 2 + 1]
                    ELSE (w[len(w) // 2] + w[len(w) // 2 + 1]) / 2.0 END AS m
        FROM win
    ),
    mad AS (
        SELECT user_id, event_id, value, m,
               (SELECT CASE WHEN len(d) % 2 = 1 THEN d[len(d) // 2 + 1]
                            ELSE (d[len(d) // 2] + d[len(d) // 2 + 1]) / 2.0 END
                FROM (SELECT list_sort(list_transform(w, x -> abs(x - m))) AS d)) AS s
        FROM med
    )
    SELECT user_id, event_id,
           round(m, 6) AS rolling_median,
           CASE WHEN s > 0
                THEN CAST(round(0.6745 * abs(value - m) / s * 1000000) AS BIGINT)
                     / 1000000.0 END AS hampel_score,
           coalesce(CASE WHEN s > 0
                         THEN CAST(round(0.6745 * abs(value - m) / s * 1000000) AS BIGINT)
                              / 1000000.0 END > 3.0,
                    false) AS is_outlier
    FROM mad
    ORDER BY user_id, event_id
"""


@query("hampel_value_outliers", oracle=_HAMPEL_ORACLE, tags=("events", "timeseries", "robust"))
def hampel_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter (operators/timeseries.py hampel_outliers): per-user
    rolling-median/MAD outlier scores over the event value series,
    centered 7-row windows, ties by event_id. One (user, ts) window
    sort; both medians are array expressions over the collected window."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        hampel_outliers,
    )
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    return (
        hampel_outliers(
            ev, ["user_id"], "ts", "value", half_window=3, k=3.0,
            tie_cols=["event_id"],
        )
        .select(
            "user_id",
            "event_id",
            F.round("rolling_median", 6).alias("rolling_median"),
            "hampel_score",
            "is_outlier",
        )
        .orderBy("user_id", "event_id")
    )


# ---- weighted percentile + grouped regression ----------------------------

_WMEDIAN_ORACLE = """
    WITH d AS (
        SELECT lang,
               CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) AS n_tokens
        FROM documents
    ),
    r AS (
        SELECT lang, n_tokens,
               sum(CAST(n_tokens AS DECIMAL(28,6))) OVER (PARTITION BY lang ORDER BY n_tokens
                   ROWS UNBOUNDED PRECEDING) AS run,
               sum(CAST(n_tokens AS DECIMAL(28,6))) OVER (PARTITION BY lang) AS tot
        FROM d
    ),
    hit AS (
        SELECT lang, n_tokens,
               row_number() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn
        FROM r WHERE run >= tot * 0.5
    )
    SELECT lang, n_tokens AS wp_n_tokens FROM hit WHERE rn = 1
    ORDER BY lang
"""


@query("weighted_median_tokens", oracle=_WMEDIAN_ORACLE, tags=("text", "robust"))
def weighted_median_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass-weighted median document length per language
    (operators/robust.py weighted_percentile): the doc length below
    which half the TOKENS sit -- the curation quantile that documents
    contribute to by mass, not by count. One per-group ordered window
    with exact decimal mass accumulation."""
    from taxi_data_pipeline_pset2_spark.operators.robust import (
        weighted_percentile,
    )

    docs = t(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        .cast("double")
        .alias("n_tokens"),
    )
    return weighted_percentile(
        docs, "n_tokens", "n_tokens", 0.5, ["lang"]
    ).orderBy("lang")


_LINREG_ORACLE = """
    WITH d AS (
        SELECT o_orderpriority,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE) AS x,
               o_totalprice AS y
        FROM orders
    ),
    s AS (
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE) AS syy
        FROM d GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           round(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                      THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
           round(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                      THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n END, 6) AS intercept,
           round(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                      THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
                           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
    FROM s
    ORDER BY o_orderpriority
"""


@query("price_trend_by_priority", oracle=_LINREG_ORACLE, tags=("agg", "stats"))
def price_trend_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment trend line (operators/stats.py grouped_linreg):
    least-squares slope/intercept/r2 of order price over time (epoch
    days) per priority, from one partial+final hash aggregate of exact
    decimal sufficient statistics."""
    from taxi_data_pipeline_pset2_spark.operators.stats import grouped_linreg

    orders = t(spark, sf_dir, "orders")
    return grouped_linreg(
        orders,
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))),
        "o_totalprice",
        ["o_orderpriority"],
    ).orderBy("o_orderpriority")


# ---- distribution drift + association ------------------------------------

_PSI_ORACLE = """
    WITH e AS (SELECT lang AS category, CAST(count(*) AS BIGINT) AS n_expected
               FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
    a AS (SELECT lang AS category, CAST(count(*) AS BIGINT) AS n_actual
          FROM documents WHERE doc_id % 2 = 1 GROUP BY lang),
    cats AS (
        SELECT coalesce(e.category, a.category) AS category,
               coalesce(n_expected, 0) AS n_expected,
               coalesce(n_actual, 0) AS n_actual
        FROM e FULL OUTER JOIN a ON e.category IS NOT DISTINCT FROM a.category
    ),
    tot AS (SELECT sum(n_expected) AS te, sum(n_actual) AS ta, count(*) AS k FROM cats)
    SELECT category, n_expected, n_actual,
           CAST(round((( (n_actual + 0.5) / (ta + 0.5 * k)
                       - (n_expected + 0.5) / (te + 0.5 * k))
                      * ln(((n_actual + 0.5) / (ta + 0.5 * k))
                           / ((n_expected + 0.5) / (te + 0.5 * k)))) * 1000000)
                AS BIGINT) / 1000000.0 AS psi_contrib
    FROM cats, tot
    ORDER BY category
"""


@query("lang_distribution_psi", oracle=_PSI_ORACLE, tags=("drift", "quality"))
def lang_distribution_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per language between two corpus halves
    (operators/drift.py psi_categorical): the distribution-drift gate a
    pipeline runs next to its row tests. Category-sized aggregates +
    one NULL-safe full outer join, integer-millionths contributions."""
    from taxi_data_pipeline_pset2_spark.operators.drift import psi_categorical

    docs = t(spark, sf_dir, "documents")
    return psi_categorical(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "lang",
    ).orderBy("category")


_CRAMERS_ORACLE = """
    WITH cells AS (
        SELECT o_orderstatus AS a, o_orderpriority AS b, CAST(count(*) AS BIGINT) AS o
        FROM orders GROUP BY a, b
    ),
    ra AS (SELECT a, sum(o) AS row_n FROM cells GROUP BY a),
    cb AS (SELECT b, sum(o) AS col_n FROM cells GROUP BY b),
    tot AS (SELECT sum(o) AS n,
                   count(DISTINCT a) + max(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS ka,
                   count(DISTINCT b) + max(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS kb
            FROM cells),
    grid AS (SELECT ra.a, ra.row_n, cb.b, cb.col_n FROM ra CROSS JOIN cb),
    full_cells AS (
        SELECT g.a, g.b, g.row_n, g.col_n, coalesce(c.o, 0) AS o
        FROM grid g LEFT JOIN cells c
          ON g.a IS NOT DISTINCT FROM c.a AND g.b IS NOT DISTINCT FROM c.b
    ),
    contrib AS (
        SELECT CAST(round((f.o - f.row_n * f.col_n / tot.n)
                          * (f.o - f.row_n * f.col_n / tot.n)
                          / (f.row_n * f.col_n / tot.n) * 1000000) AS BIGINT) AS m
        FROM full_cells f, tot
    )
    SELECT CAST(tot.n AS BIGINT) AS n,
           CAST(tot.ka - 1 AS BIGINT) AS df_a,
           CAST(tot.kb - 1 AS BIGINT) AS df_b,
           round((SELECT sum(m) FROM contrib) / 1000000.0, 6) AS chi2,
           round(sqrt(((SELECT sum(m) FROM contrib) / 1000000.0)
                      / (tot.n * (least(tot.ka, tot.kb) - 1))), 6) AS cramers_v
    FROM tot
"""


@query("status_priority_association", oracle=_CRAMERS_ORACLE, tags=("drift", "stats"))
def status_priority_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square / Cramer's V between order status and priority
    (operators/drift.py cramers_v): the scale-free association screen.
    One contingency aggregate + marginals, broadcast joins,
    integer-millionths cell sums."""
    from taxi_data_pipeline_pset2_spark.operators.drift import cramers_v

    return cramers_v(t(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority")


# ---- incremental SCD2 maintenance -----------------------------------------


from taxi_data_pipeline_pset2_spark.queries import families as _families  # noqa: E402


@query("scd2_incremental_apply", oracle=_families._SCD_ORACLE, tags=("scd", "cdc"))
def scd2_incremental_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained SCD2 (plans/scd.py scd2_apply_snapshot):
    history built from the first two customer snapshots, the third
    applied as a delta -- by construction it must equal the scd2_history
    full rebuild, and the shared oracle pins exactly that."""
    from taxi_data_pipeline_pset2_spark.plans.scd import (
        scd2_apply_snapshot,
        scd2_from_snapshots,
    )

    cust = t(spark, sf_dir, "customer")

    def snap(ts: str, div: int):
        return cust.select(
            "c_custkey",
            F.lit(ts).cast("timestamp").alias("snapshot_ts"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / div).cast("bigint").alias("bal_bucket"),
        )

    base = scd2_from_snapshots(
        snap("2024-01-01", 1000).unionByName(snap("2024-02-01", 1000)),
        ["c_custkey"],
        ["segment", "bal_bucket"],
        "snapshot_ts",
    )
    return scd2_apply_snapshot(
        base,
        snap("2024-03-01", 500).drop("snapshot_ts"),
        ["c_custkey"],
        ["segment", "bal_bucket"],
        "2024-03-01",
    )


# ---- as-of join variants: forward + nearest -------------------------------

_ASOF_FWD_ORACLE = """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    purchases AS (SELECT user_id, ts, value AS purchase_value
                  FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, c.ts, p.purchase_value AS next_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    ORDER BY c.event_id
"""


@query("asof_next_purchase", oracle=_ASOF_FWD_ORACLE, tags=("join", "asof"))
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (operators/asof.py asof_join_forward): each
    click annotated with the user's NEXT purchase value -- the mirror of
    asof_last_purchase, hash-verified against DuckDB's native forward
    ASOF (ON c.ts <= p.ts). Same one-shuffle union+window shape."""
    from taxi_data_pipeline_pset2_spark.operators.asof import asof_join_forward

    events = t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    return (
        asof_join_forward(clicks, purchases, on="user_id")
        .withColumnRenamed("purchase_value_asof", "next_purchase_value")
        .orderBy("event_id")
    )


_ASOF_NEAR_ORACLE = """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    purchases AS (SELECT user_id, ts, value AS purchase_value
                  FROM events WHERE event_type = 'purchase'),
    b AS (SELECT c.event_id, c.user_id, c.ts, p.ts AS bts, p.purchase_value AS bv
          FROM clicks c ASOF LEFT JOIN purchases p
            ON c.user_id = p.user_id AND c.ts >= p.ts),
    f AS (SELECT c.event_id, p.ts AS fts, p.purchase_value AS fv
          FROM clicks c ASOF LEFT JOIN purchases p
            ON c.user_id = p.user_id AND c.ts <= p.ts),
    j AS (SELECT b.*, f.fts, f.fv,
                 CASE WHEN bts IS NULL THEN FALSE
                      WHEN fts IS NULL THEN TRUE
                      WHEN epoch(b.ts) - epoch(bts) <= epoch(fts) - epoch(b.ts)
                           THEN TRUE ELSE FALSE END AS use_back
          FROM b JOIN f USING (event_id))
    SELECT event_id, user_id, ts,
           CASE WHEN use_back THEN bv ELSE fv END AS nearest_purchase_value,
           CASE WHEN use_back THEN bts ELSE fts END AS ts_asof
    FROM j
    ORDER BY event_id
"""


@query("asof_nearest_purchase", oracle=_ASOF_NEAR_ORACLE, tags=("join", "asof"))
def asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time join (operators/asof.py asof_join_nearest,
    pandas merge_asof(direction='nearest') semantics, ties backward):
    each click annotated with the temporally CLOSEST purchase and its
    timestamp. The backward and forward passes share one key shuffle;
    the oracle composes DuckDB's two native ASOF directions with the
    identical pick rule."""
    from taxi_data_pipeline_pset2_spark.operators.asof import asof_join_nearest

    events = t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    return (
        asof_join_nearest(clicks, purchases, on="user_id")
        .withColumnRenamed("purchase_value_asof", "nearest_purchase_value")
        .orderBy("event_id")
    )


# ---- per-key EWMA ---------------------------------------------------------

_EWMA_ORACLE = """
    WITH RECURSIVE base AS (
        SELECT user_id, event_id, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE value IS NOT NULL AND user_id < 40
    ),
    r AS (
        SELECT user_id, event_id, ts, value, rn, value AS e
        FROM base WHERE rn = 1
        UNION ALL
        SELECT b.user_id, b.event_id, b.ts, b.value, b.rn,
               0.3 * b.value + 0.7 * r.e
        FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1
    )
    SELECT user_id, event_id, ts, value, round(e, 6) AS ewma
    FROM r
    ORDER BY user_id, event_id
"""


@query("ewma_user_value", oracle=_EWMA_ORACLE, tags=("timeseries", "window", "bench"))
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (operators/timeseries.py ewma,
    alpha=0.3, adjust=False): the smoothing recursion no window
    expression can write. One key shuffle + a linear Arrow kernel per
    key; the oracle is a DuckDB recursive CTE replaying the identical
    IEEE multiply-add order, so the hashes match bit-exactly."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import ewma

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (F.col("user_id") < 40))
        .select("user_id", "event_id", "ts", "value")
    )
    return ewma(
        ev, ["user_id"], "ts", "value", alpha=0.3, tie_cols=["event_id"]
    ).orderBy("user_id", "event_id")


# ---- TF-IDF cosine document similarity ------------------------------------

_TFIDF_COS_THRESHOLD = 0.25
_TFIDF_COS_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term
              HAVING count(*) BETWEEN 2 AND 100),
    w0 AS (SELECT tf.doc_id, tf.term,
                  CAST(round(tf.tf
                             * round(ln((SELECT count(*) FROM documents) * 1.0
                                        / dfreq.df), 6)
                             * 1000000) AS BIGINT) AS w6
           FROM tf JOIN dfreq USING (term)),
    w AS (SELECT * FROM w0 WHERE w6 <> 0),
    norms AS (SELECT doc_id, sum(CAST(w6 AS HUGEINT) * w6) AS ss
              FROM w GROUP BY doc_id),
    n AS (SELECT w.doc_id, w.term,
                 CAST(round(CAST(w6 AS DOUBLE) * 1000000
                            / sqrt(CAST(ss AS DOUBLE))) AS BIGINT) AS n6
          FROM w JOIN norms USING (doc_id)),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 sum(CAST(a.n6 AS HUGEINT) * b.n6) AS dot
          FROM n a JOIN n b ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY id_a, id_b)
    SELECT id_a, id_b,
           round(CAST(dot AS DOUBLE) / 1000000000000.0, 6) AS cosine
    FROM p
    WHERE round(CAST(dot AS DOUBLE) / 1000000000000.0, 6) >= {_TFIDF_COS_THRESHOLD}
    ORDER BY id_a, id_b
"""


@query(
    "tfidf_cosine_docs",
    oracle=_TFIDF_COS_ORACLE,
    tags=("text", "search", "similarity", "bench"),
)
def tfidf_cosine_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairs (operators/search.py
    tfidf_cosine_pairs): inverted-index self-join over df-pruned terms
    (2 <= df <= 100 -- the ceiling bounds every term's pair fan-out at
    df^2, the scale guarantee), exact-int normalized weights, DECIMAL
    dot sums. The bag-of-words complement of the embedding cosine
    path."""
    from taxi_data_pipeline_pset2_spark.operators.search import (
        tfidf_cosine_pairs,
    )

    docs = t(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        docs, threshold=_TFIDF_COS_THRESHOLD, min_df=2, max_df=100
    ).orderBy("id_a", "id_b")


# ---- leakage-safe split ---------------------------------------------------

_LEAKAGE_SPLIT_ORACLE = """
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
             FROM documents),
    sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN
               list_transform(generate_series(1, len(toks) - 2),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS sh FROM toks),
    e AS (SELECT doc_id, unnest(sh) AS shingle, len(sh) AS n FROM sh),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter,
                 any_value(a.n) AS n_a, any_value(b.n) AS n_b
          FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM p
              WHERE ROUND(n_inter * 1.0 / (n_a + n_b - n_inter), 6) >= 0.2),
    sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
    reach AS (SELECT u, v FROM sym
              UNION
              SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
              WHERE s.v <> r.u),
    comp AS (SELECT u AS node, least(u, min(v)) AS component
             FROM reach GROUP BY u),
    g AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS group_id
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
    h AS (SELECT doc_id, group_id,
                 CAST(('0x' || substr(md5(CAST(group_id AS VARCHAR) || '|split-v1'),
                                      1, 8)) AS BIGINT) AS hv
          FROM g)
    SELECT doc_id, group_id,
           CASE WHEN hv < 3865470566 THEN 'train'
                ELSE 'test' END AS split
    FROM h
    ORDER BY doc_id
"""
# 3865470566 = int(0.9 * 2^32), the exact truncated bound hash_split uses


@query(
    "leakage_safe_split_docs",
    oracle=_LEAKAGE_SPLIT_ORACLE,
    tags=("sampling", "dedup", "components"),
)
def leakage_safe_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/test split (operators/sampling.py
    leakage_safe_split): near-dup components from the jaccard edge set
    (the dedup_components pipeline) define the split unit, so a test
    document's near-copy can never train the model. The oracle closes
    the same edge set with a recursive CTE and replays the identical
    portable salted-hash interval assignment."""
    from taxi_data_pipeline_pset2_spark.operators.dedup import jaccard_pairs
    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.2)
    return (
        leakage_safe_split(
            docs.select("doc_id"),
            pairs,
            weights={"train": 0.9, "test": 0.1},
            salt="split-v1",
        )
        .select("doc_id", "group_id", "split")
        .orderBy("doc_id")
    )


# ---- group-aware k-fold ---------------------------------------------------

_KFOLD_ORACLE = """
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
             FROM documents),
    sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN
               list_transform(generate_series(1, len(toks) - 2),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS sh FROM toks),
    e AS (SELECT doc_id, unnest(sh) AS shingle, len(sh) AS n FROM sh),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter,
                 any_value(a.n) AS n_a, any_value(b.n) AS n_b
          FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM p
              WHERE ROUND(n_inter * 1.0 / (n_a + n_b - n_inter), 6) >= 0.2),
    sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
    reach AS (SELECT u, v FROM sym
              UNION
              SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
              WHERE s.v <> r.u),
    comp AS (SELECT u AS node, least(u, min(v)) AS component
             FROM reach GROUP BY u),
    g AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS group_id
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
    SELECT doc_id, group_id,
           CAST(CAST(('0x' || substr(md5(CAST(group_id AS VARCHAR) || '|fold-v1'),
                                     1, 8)) AS BIGINT) % 5 AS INT) AS fold
    FROM g
    ORDER BY doc_id
"""


@query(
    "group_kfold_docs",
    oracle=_KFOLD_ORACLE,
    tags=("sampling", "components"),
)
def group_kfold_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware 5-fold CV assignment (operators/sampling.py
    group_kfold): the cross-validation form of the leakage-safe split --
    a held-out fold never sees another fold's near-copy. Same component
    closure + portable hash, fold = hash % k."""
    from taxi_data_pipeline_pset2_spark.operators.dedup import jaccard_pairs
    from taxi_data_pipeline_pset2_spark.operators.sampling import group_kfold

    docs = t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.2)
    return (
        group_kfold(docs.select("doc_id"), pairs, k=5, salt="fold-v1")
        .select("doc_id", "group_id", "fold")
        .orderBy("doc_id")
    )


# ---- temporal split with embargo ------------------------------------------

_TEMPORAL_SPLIT_ORACLE = """
    SELECT event_id, user_id, ts,
           CASE WHEN ts <= TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
                ELSE 'test' END AS split
    FROM events
    WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
       OR ts > TIMESTAMP '2024-01-22 00:00:00'
    ORDER BY event_id
"""


@query("temporal_split_events", oracle=_TEMPORAL_SPLIT_ORACLE, tags=("sampling", "timeseries"))
def temporal_split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split with a 2-day embargo
    (operators/sampling.py temporal_split): boundary-adjacent rows are
    dropped so autocorrelated test rows can't echo the training tail.
    Scan-shaped; the time predicate partition-prunes on a
    time-partitioned table."""
    from taxi_data_pipeline_pset2_spark.operators.sampling import temporal_split

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return temporal_split(
        ev, "ts", "2024-01-20 00:00:00", "2 days"
    ).orderBy("event_id")


# ---- rolling feature block ------------------------------------------------

_ROLLING_ORACLE = """
    SELECT user_id, event_id, ts, value,
           lag(value, 1) OVER w AS lag_1,
           round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
               AS roll_mean_3,
           min(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_min_3,
           max(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_max_3
    FROM (SELECT user_id, event_id, ts, value FROM events WHERE value IS NOT NULL)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
"""


@query("rolling_features_user_value", oracle=_ROLLING_ORACLE, tags=("timeseries", "window"))
def rolling_features_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag + trailing-3 rolling mean/min/max in one window pass
    (operators/timeseries.py rolling_features): the autoregressive
    feature block, one sort-shuffle for the whole feature set."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        rolling_features,
    )

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
    )
    return rolling_features(
        ev, ["user_id"], "ts", "value", lags=(1,), windows=(3,),
        tie_cols=["event_id"],
    ).orderBy("user_id", "event_id")


# ---- tokenizer coverage (OOV rate) ---------------------------------------

_OOV_ORACLE = f"""
    WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
                  FROM documents),
    c AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
    vocab AS (SELECT token FROM c ORDER BY n DESC, token LIMIT {_VOCAB_K}),
    marked AS (SELECT t.doc_id, t.token, v.token IS NOT NULL AS in_vocab
               FROM toks t LEFT JOIN vocab v USING (token)
               WHERE t.token <> ''),
    per_doc AS (SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_tokens,
                       CAST(sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
                FROM marked GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(p.n_tokens, 0) AS n_tokens,
           coalesce(p.n_oov, 0) AS n_oov,
           CASE WHEN coalesce(p.n_tokens, 0) > 0
                THEN round(p.n_oov * 1.0 / p.n_tokens, 6) END AS oov_rate
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
"""


@query("oov_rate_docs", oracle=_OOV_ORACLE, tags=("text", "vocab"))
def oov_rate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage eval (operators/text.py oov_rate): per-doc
    out-of-vocabulary rate against the top-40 corpus vocabulary -- the
    check a tokenizer/vocab ships with. Vocab-sized broadcast join +
    one per-doc aggregate."""
    from taxi_data_pipeline_pset2_spark.operators.text import build_vocab, oov_rate

    docs = t(spark, sf_dir, "documents")
    vocab = build_vocab(docs, max_size=_VOCAB_K)
    return oov_rate(docs, vocab).orderBy("doc_id")


@query("compression_ratio_docs", oracle=None, tags=("text", "quality"))
def compression_ratio_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc zlib compression ratio (operators/text.py
    compression_ratio): the low-cost repetition/boilerplate signal.
    zlib has no SQL twin -> rows-only driver check; byte-exactness vs
    the python reference pinned in tests/test_text_hygiene.py."""
    from taxi_data_pipeline_pset2_spark.operators.text import compression_ratio

    return compression_ratio(t(spark, sf_dir, "documents")).orderBy("doc_id")


# ---- blocklist safety gate ------------------------------------------------

_BLOCKLIST = {
    "slow": "performance",
    "skew": "performance",
    "error": "reliability",
    "null": "quality",
}
_BLOCK_RATIO = 0.05

_BLOCK_CASE = " ".join(
    f"WHEN '{w}' THEN '{c}'" for w, c in sorted(_BLOCKLIST.items())
)
_BLOCK_IN = ", ".join(f"'{w}'" for w in sorted(_BLOCKLIST))

_BLOCKLIST_ORACLE = f"""
    WITH tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
                FROM documents),
    h AS (SELECT doc_id,
                 CAST(len(ts) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(ts, t -> t IN ({_BLOCK_IN}))) AS BIGINT) AS n_hits,
                 list_distinct(list_filter(
                     list_transform(ts, t -> CASE t {_BLOCK_CASE} END),
                     c -> c IS NOT NULL)) AS cats
          FROM tk)
    SELECT doc_id, n_tokens, n_hits,
           CAST(len(cats) AS BIGINT) AS n_categories,
           CASE WHEN n_tokens > 0 THEN round(n_hits * 1.0 / n_tokens, 6) END
               AS hit_ratio,
           coalesce(CASE WHEN n_tokens > 0
                         THEN round(n_hits * 1.0 / n_tokens, 6) END
                    > {_BLOCK_RATIO}, FALSE) AS blocked
    FROM h
    ORDER BY doc_id
"""


@query("blocklist_safety_flags", oracle=_BLOCKLIST_ORACLE, tags=("text", "quality"))
def blocklist_safety_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-list safety gate (operators/text.py blocklist_flags): hit
    counts, categories, density ratio and the density-thresholded
    blocked flag -- the C4-style bad-words filter as one scan of map
    literals and higher-order expressions, no UDF, no shuffle."""
    from taxi_data_pipeline_pset2_spark.operators.text import blocklist_flags

    return blocklist_flags(
        t(spark, sf_dir, "documents"), _BLOCKLIST, max_hit_ratio=_BLOCK_RATIO
    ).orderBy("doc_id")


def _curation_audit_oracle() -> str:
    """SQL twin of the first-drop-gate CASE chain: each stage re-states
    the SAME fragment its standalone oracle already hash-proves --
    exact-dup fingerprints (dedup_exact), k=8 shingle collisions vs the
    %20 bench split (decontamination_scores), the quality-score formula
    (text_quality), and the dup-line ratio (gopher line split). The
    near-dup stage is off in this entry (no near_dup_pairs), and
    allowed_langs is unset, so the chain is exact_dup ->
    decontaminated -> low_quality -> repetitive. Contamination is
    per-doc-independent, so scoring ALL train docs equals scoring the
    exact-dedup survivors for every doc the chain reaches."""
    from taxi_data_pipeline_pset2_spark.operators.text import LANG_MARKERS

    k = 8
    shingle = " || ' ' || ".join(
        f"toks[i+{j}]" for j in range(k)
    ).replace("toks[i+0]", "toks[i]")
    stop = "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS["en"]) + "]"
    return f"""
    WITH train AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 != 0),
    fp AS (SELECT doc_id,
                  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
           FROM train),
    keep1 AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
    toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
             FROM documents),
    sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= {k} THEN
             list_transform(generate_series(1, len(toks) - {k - 1}),
                            i -> {shingle})
           ELSE CAST([] AS VARCHAR[]) END) AS sh FROM toks),
    e AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
    hs AS (SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h
           FROM e),
    bench_sh AS (SELECT DISTINCT h FROM hs WHERE doc_id % 20 = 0),
    dirty AS (SELECT DISTINCT tr.doc_id FROM hs tr
              JOIN bench_sh b ON tr.h = b.h
              WHERE tr.doc_id % 20 != 0),
    sig AS (SELECT t.doc_id,
                   CAST(4 * CAST(round(CAST(len(list_filter(tk.toks,
                          x -> list_contains({{STOP}}, x))) AS DOUBLE)
                          * 1000000 / len(tk.toks)) AS BIGINT)
                        + 3 * least(CAST(1000000 AS BIGINT),
                                    CAST(len(tk.toks) * 10000 AS BIGINT))
                        + 3 * CAST(round(CAST(length(regexp_replace(lower(t.text),
                              '[^a-z]', '', 'g')) AS DOUBLE)
                              * 1000000 / length(t.text)) AS BIGINT)
                        AS DOUBLE) / 10000000 AS quality_score,
                   CASE WHEN len(list_filter(list_transform(
                             string_split(t.text, chr(10)), x -> trim(x)),
                             x -> x != '')) > 0
                        THEN round(1 - CAST(len(list_distinct(list_filter(
                             list_transform(string_split(t.text, chr(10)),
                                            x -> trim(x)), x -> x != ''))) AS DOUBLE)
                             / len(list_filter(list_transform(
                                  string_split(t.text, chr(10)), x -> trim(x)),
                                  x -> x != '')), 6)
                        ELSE 0.0 END AS dup_line_ratio
            FROM train t JOIN toks tk ON tk.doc_id = t.doc_id)
    SELECT t.doc_id,
           CASE WHEN k1.doc_id IS NULL THEN 'exact_dup'
                WHEN d.doc_id IS NOT NULL THEN 'decontaminated'
                WHEN NOT coalesce(s.quality_score >= 0.3, FALSE)
                     THEN 'low_quality'
                WHEN NOT coalesce(s.dup_line_ratio <= 0.5, FALSE)
                     THEN 'repetitive'
           END AS drop_stage
    FROM train t
    LEFT JOIN keep1 k1 ON k1.doc_id = t.doc_id
    LEFT JOIN dirty d ON d.doc_id = t.doc_id
    LEFT JOIN sig s ON s.doc_id = t.doc_id
    ORDER BY t.doc_id
    """.replace("{STOP}", stop)


@query(
    "curation_drop_audit",
    oracle=_curation_audit_oracle(),
    tags=("curation", "quality"),
)
def curation_drop_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-reason audit for the curation pipeline
    (operators/curation.py curation_audit): one row per input doc with
    the first gate that removed it (NULL = survivor). Upgraded from
    rows-only in r8: the SQL twin (_curation_audit_oracle) re-states
    each gate with the SAME fragment its standalone oracle hash-proves;
    audit == pipeline agreement is also pinned in
    tests/test_curation.py."""
    from taxi_data_pipeline_pset2_spark.operators.curation import curation_audit

    docs = t(spark, sf_dir, "documents")
    return curation_audit(
        docs.filter(F.col("doc_id") % 20 != 0),
        benchmarks=docs.filter(F.col("doc_id") % 20 == 0),
        decontam_k=8,
    ).orderBy("doc_id")


# ---- interpolated bigram LM scoring ---------------------------------------

_BIGRAM_ORACLE = """
    WITH tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
                FROM documents),
    uni AS (SELECT term, count(*) AS n
            FROM (SELECT unnest(ts) AS term FROM tk) GROUP BY term),
    tot AS (SELECT sum(n) AS total, count(*) AS vocab FROM uni),
    pairs AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2
              FROM (SELECT doc_id,
                           unnest(list_transform(generate_series(2, len(ts)),
                                  i -> {'w1': ts[i-1], 'w2': ts[i]})) AS p
                    FROM tk)),
    big AS (SELECT w1, w2, count(*) AS nb FROM pairs GROUP BY w1, w2),
    sc AS (SELECT pr.doc_id,
                  CAST(round(ln(
                      CASE WHEN b.nb IS NOT NULL AND u1.n IS NOT NULL
                           THEN 0.75 * b.nb / u1.n ELSE 0 END
                      + 0.25 * (coalesce(u2.n, 0) + 1) / (tot.total + tot.vocab)
                  ) * 1000000) AS BIGINT) AS m
           FROM pairs pr
           LEFT JOIN big b ON pr.w1 = b.w1 AND pr.w2 = b.w2
           LEFT JOIN uni u1 ON pr.w1 = u1.term
           LEFT JOIN uni u2 ON pr.w2 = u2.term, tot),
    psum AS (SELECT doc_id, sum(m) AS pm FROM sc GROUP BY doc_id),
    f AS (SELECT tk.doc_id, len(ts) AS n_tokens,
                 coalesce(CAST(round(ln((u.n + 1) * 1.0 / (tot.total + tot.vocab))
                                     * 1000000) AS BIGINT),
                          CAST(round(ln(1.0 / (tot.total + tot.vocab))
                                     * 1000000) AS BIGINT)) AS w0m
          FROM tk LEFT JOIN uni u ON ts[1] = u.term, tot)
    SELECT f.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round((w0m + coalesce(pm, 0)) * 1.0 / 1000000 / n_tokens, 6)
               AS mean_logprob,
           round(exp(-((w0m + coalesce(pm, 0)) * 1.0 / 1000000 / n_tokens)), 6)
               AS ppl_proxy
    FROM f LEFT JOIN psum ON f.doc_id = psum.doc_id
    WHERE n_tokens >= 1
    ORDER BY f.doc_id
"""


@query("bigram_doc_logprob", oracle=_BIGRAM_ORACLE, tags=("text", "lm"))
def bigram_doc_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM scoring (operators/lm_score.py
    bigram_doc_logprob, Jelinek-Mercer lam=0.75 over the add-one
    unigram): one rung up the n-gram ladder from the unigram CCNet
    proxy, still integer-millionths deterministic and fully
    SQL-expressible."""
    from taxi_data_pipeline_pset2_spark.operators.lm_score import (
        bigram_doc_logprob,
    )

    return bigram_doc_logprob(t(spark, sf_dir, "documents")).orderBy("doc_id")


# ---- class weights + rolling-origin backtest -------------------------------

_CLASS_WEIGHTS_ORACLE = """
    WITH c AS (SELECT event_type AS lbl, count(*) AS n FROM events GROUP BY lbl),
    t AS (SELECT sum(n) AS nt, count(*) AS k FROM c),
    w AS (SELECT lbl, round(nt * 1.0 / (k * n), 6) AS sample_weight FROM c, t)
    SELECT e.event_id, e.event_type, w.sample_weight
    FROM events e LEFT JOIN w ON e.event_type IS NOT DISTINCT FROM w.lbl
    ORDER BY e.event_id
"""


@query("class_weights_events", oracle=_CLASS_WEIGHTS_ORACLE, tags=("sampling", "agg"))
def class_weights_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency sample weights (operators/sampling.py
    inverse_frequency_weights, sklearn's 'balanced'): every event type
    contributes equal total training mass. One class-sized aggregate
    broadcast back onto the scan."""
    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        inverse_frequency_weights,
    )

    ev = t(spark, sf_dir, "events").select("event_id", "event_type")
    return inverse_frequency_weights(ev, "event_type").orderBy("event_id")


_ROLLING_ORIGIN_ORACLE = """
    WITH f(fold, bend) AS (VALUES
        (0, TIMESTAMP '2024-01-10 00:00:00'),
        (1, TIMESTAMP '2024-01-20 00:00:00')),
    j AS (SELECT e.event_id, e.user_id, e.ts, f.fold,
                 CASE WHEN e.ts <= f.bend THEN 'train'
                      WHEN e.ts > f.bend + INTERVAL 1 DAY THEN 'test' END AS role
          FROM events e CROSS JOIN f)
    SELECT event_id, user_id, ts, fold, role
    FROM j WHERE role IS NOT NULL
    ORDER BY fold, event_id
"""


@query("rolling_origin_backtest", oracle=_ROLLING_ORIGIN_ORACLE, tags=("sampling", "timeseries"))
def rolling_origin_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding-window backtest folds (operators/sampling.py
    rolling_origin_folds): two boundaries, one-day embargo -- fold i
    trains strictly on the past and never sees embargo-adjacent rows.
    A k-row broadcast fold table crossed onto the scan."""
    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        rolling_origin_folds,
    )

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return rolling_origin_folds(
        ev, "ts", ["2024-01-10 00:00:00", "2024-01-20 00:00:00"], "1 day"
    ).orderBy("fold", "event_id")


# ---- numeric correlation matrix + categorical mutual information ----------

def _corr_pair_sql(a: str, b: str) -> str:
    return f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           CAST(count(*) FILTER ({a} IS NOT NULL AND {b} IS NOT NULL) AS BIGINT) AS n,
           CAST(sum(CAST({a} AS DECIMAL(28,6))) FILTER ({a} IS NOT NULL AND {b} IS NOT NULL) AS DOUBLE) AS sx,
           CAST(sum(CAST({b} AS DECIMAL(28,6))) FILTER ({a} IS NOT NULL AND {b} IS NOT NULL) AS DOUBLE) AS sy,
           CAST(sum(CAST({a} * {b} AS DECIMAL(38,10))) FILTER ({a} IS NOT NULL AND {b} IS NOT NULL) AS DOUBLE) AS sxy,
           CAST(sum(CAST({a} * {a} AS DECIMAL(38,10))) FILTER ({a} IS NOT NULL AND {b} IS NOT NULL) AS DOUBLE) AS sxx,
           CAST(sum(CAST({b} * {b} AS DECIMAL(38,10))) FILTER ({a} IS NOT NULL AND {b} IS NOT NULL) AS DOUBLE) AS syy
    FROM lineitem"""


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount")
_CORR_ORACLE = f"""
    WITH s AS ({" UNION ALL ".join(
        _corr_pair_sql(a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    )})
    SELECT col_a, col_b, n,
           round(CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                      THEN (n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                 END, 6) AS corr
    FROM s
    ORDER BY col_a, col_b
"""


@query("metric_corr_matrix", oracle=_CORR_ORACLE, tags=("stats", "agg"))
def metric_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over lineitem metrics in one pass
    (operators/stats.py corr_matrix): the numeric feature-redundancy
    screen -- k columns, one scan, exact decimal sufficient
    statistics."""
    from taxi_data_pipeline_pset2_spark.operators.stats import corr_matrix

    return corr_matrix(
        t(spark, sf_dir, "lineitem"), list(_CORR_COLS)
    ).orderBy("col_a", "col_b")


_MI_ORACLE = """
    WITH cells AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
                          CAST(count(*) AS BIGINT) AS o
                   FROM orders GROUP BY a, b),
    ra AS (SELECT a, sum(o) AS na FROM cells GROUP BY a),
    cb AS (SELECT b, sum(o) AS nb FROM cells GROUP BY b),
    tot AS (SELECT sum(o) AS n FROM cells),
    mi AS (SELECT sum(CAST(round((c.o * 1.0 / tot.n)
                                 * ln((c.o * 1.0 * tot.n) / (ra.na * 1.0 * cb.nb))
                                 * 1000000) AS BIGINT)) AS mim
           FROM cells c
           JOIN ra ON c.a IS NOT DISTINCT FROM ra.a
           JOIN cb ON c.b IS NOT DISTINCT FROM cb.b, tot),
    ha AS (SELECT sum(CAST(round(-(na * 1.0 / tot.n) * ln(na * 1.0 / tot.n)
                                 * 1000000) AS BIGINT)) AS ham
           FROM ra, tot),
    hb AS (SELECT sum(CAST(round(-(nb * 1.0 / tot.n) * ln(nb * 1.0 / tot.n)
                                 * 1000000) AS BIGINT)) AS hbm
           FROM cb, tot)
    SELECT CAST(tot.n AS BIGINT) AS n,
           round(mim * 1.0 / 1000000, 6) AS mi,
           round(CASE WHEN sqrt((ham * 1.0 / 1000000) * (hbm * 1.0 / 1000000)) > 0
                      THEN (mim * 1.0 / 1000000)
                           / sqrt((ham * 1.0 / 1000000) * (hbm * 1.0 / 1000000))
                 END, 6) AS nmi
    FROM tot, mi, ha, hb
"""


@query("status_priority_mi", oracle=_MI_ORACLE, tags=("stats", "drift"))
def status_priority_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between order status and priority
    (operators/stats.py mutual_information): the information-content
    association screen next to chi-square/Cramer's V -- same
    contingency machinery, integer-millionths contributions."""
    from taxi_data_pipeline_pset2_spark.operators.stats import mutual_information

    return mutual_information(
        t(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority"
    )


# ---- model-evaluation metrics (operators/evalmetrics.py) -----------------

_AUC_ORACLE = """
    WITH base AS (
        SELECT o_orderpriority,
               CAST(o_totalprice AS DOUBLE) AS s,
               (o_orderstatus = 'F') AS y
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
          AND NOT isnan(CAST(o_totalprice AS DOUBLE))),
    per AS (
        SELECT o_orderpriority, s,
               CAST(count(*) FILTER (y) AS BIGINT) AS p,
               CAST(count(*) FILTER (NOT y) AS BIGINT) AS q
        FROM base GROUP BY o_orderpriority, s),
    c AS (
        SELECT o_orderpriority, p, q,
               coalesce(sum(q) OVER (PARTITION BY o_orderpriority ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cb
        FROM per)
    SELECT o_orderpriority,
           CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(q) AS BIGINT) AS n_neg,
           round(CASE WHEN sum(p) > 0 AND sum(q) > 0
                      THEN CAST(sum(CAST(p AS DECIMAL(38,0))
                                    * CAST(2 * cb + q AS DECIMAL(38,0)))
                                AS DOUBLE)
                           / (2.0 * sum(p) * sum(q)) END, 6) AS auc
    FROM c GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("auc_order_status", oracle=_AUC_ORACLE, tags=("evalmetrics", "stats", "bench"))
def auc_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority tie-aware ROC-AUC of o_totalprice ranking the
    finished flag (operators/evalmetrics.py binary_auc): the
    score-quality screen for any trained filter, computed from
    per-distinct-score counts -- never a sort of the raw rows."""
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import binary_auc

    o = t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_totalprice",
        (F.col("o_orderstatus") == "F").alias("is_f"),
    )
    return binary_auc(
        o, "is_f", "o_totalprice", ["o_orderpriority"]
    ).orderBy("o_orderpriority")


_CALIBRATION_ORACLE = """
    WITH ext AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                 FROM orders),
    base AS (
        SELECT (o.o_totalprice - e.lo) / (e.hi - e.lo) AS p,
               (o.o_orderstatus = 'F') AS y
        FROM orders o CROSS JOIN ext e
        WHERE o.o_totalprice IS NOT NULL),
    b AS (
        SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (y) AS BIGINT) AS n_pos,
               CAST(sum(CAST(p AS DECIMAL(28,10))) AS DOUBLE) AS sp
        FROM base
        WHERE p >= 0.0 AND p <= 1.0
        GROUP BY bin)
    SELECT bin, n, n_pos,
           round(sp / n, 6) AS conf,
           round(n_pos * 1.0 / n, 6) AS acc,
           round(abs(n_pos * 1.0 / n - sp / n), 6) AS gap
    FROM b ORDER BY bin
"""


@query(
    "calibration_price_prob", oracle=_CALIBRATION_ORACLE, tags=("evalmetrics", "agg")
)
def calibration_price_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins (operators/evalmetrics.py
    calibration_bins) for a min-max-normalized price pseudo-probability
    against the finished flag: one aggregate for the extremes
    (broadcast back), one hash aggregate to 10 bins."""
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import (
        calibration_bins,
    )

    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    ext = o.agg(
        F.min("o_totalprice").alias("_lo"), F.max("o_totalprice").alias("_hi")
    )
    base = o.crossJoin(F.broadcast(ext)).select(
        ((F.col("o_totalprice") - F.col("_lo")) / (F.col("_hi") - F.col("_lo")))
        .alias("p"),
        (F.col("o_orderstatus") == "F").alias("y"),
    )
    return calibration_bins(base, "y", "p", 10).orderBy("bin")


_KAPPA_ORACLE = """
    WITH base AS (
        SELECT (o_totalprice > 150000) AS a, (o_orderstatus = 'F') AS b
        FROM orders),
    cnt AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) FILTER (a IS NOT DISTINCT FROM b) AS BIGINT)
                       AS agree
            FROM base),
    ra AS (SELECT a AS k, CAST(count(*) AS BIGINT) AS na FROM base GROUP BY a),
    cb AS (SELECT b AS k, CAST(count(*) AS BIGINT) AS nb FROM base GROUP BY b),
    pe AS (SELECT coalesce(sum(CAST(ra.na * cb.nb AS DECIMAL(38,0))),
                           CAST(0 AS DECIMAL(38,0))) AS penum
           FROM ra JOIN cb ON ra.k IS NOT DISTINCT FROM cb.k)
    SELECT cnt.n,
           round(cnt.agree * 1.0 / cnt.n, 6) AS po,
           round(CAST(pe.penum AS DOUBLE) / (cnt.n * 1.0 * cnt.n), 6) AS pe,
           round(CASE WHEN CAST(CAST(cnt.n AS DECIMAL(38,0)) * cnt.n - pe.penum
                                AS DOUBLE) != 0
                      THEN CAST(CAST(cnt.agree AS DECIMAL(38,0)) * cnt.n
                                - pe.penum AS DOUBLE)
                           / CAST(CAST(cnt.n AS DECIMAL(38,0)) * cnt.n
                                  - pe.penum AS DOUBLE) END, 6) AS kappa
    FROM cnt, pe
"""


@query("kappa_price_status", oracle=_KAPPA_ORACLE, tags=("evalmetrics", "stats"))
def kappa_price_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between a price-threshold rater and the finished
    flag (operators/evalmetrics.py cohen_kappa): chance-corrected
    agreement from exact integer contingency counts -- the
    inter-annotator screen for labeling pipelines."""
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import cohen_kappa

    o = t(spark, sf_dir, "orders").select(
        (F.col("o_totalprice") > 150000).alias("a"),
        (F.col("o_orderstatus") == "F").alias("b"),
    )
    return cohen_kappa(o, "a", "b")


_LIFT_ORACLE = """
    WITH base AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS s,
               (o_orderstatus = 'F') AS y,
               o_orderkey AS k
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
          AND NOT isnan(CAST(o_totalprice AS DOUBLE))),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nn,
                   CAST(count(*) FILTER (y) AS BIGINT) AS npp
            FROM base),
    r AS (SELECT y,
                 row_number() OVER (ORDER BY s DESC, k) AS rnk
          FROM base),
    a AS (SELECT CAST((rnk - 1) * 10 // tot.nn AS INT) + 1 AS tile, y
          FROM r, tot),
    tiles AS (SELECT tile,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(count(*) FILTER (y) AS BIGINT) AS n_pos
              FROM a GROUP BY tile)
    SELECT t.tile, t.n, t.n_pos,
           round(t.n_pos * 1.0 / t.n, 6) AS pos_rate,
           round(CASE WHEN tot.npp > 0
                      THEN (t.n_pos * 1.0 / t.n) / (tot.npp * 1.0 / tot.nn)
                 END, 6) AS lift,
           CAST(sum(t.n_pos) OVER (ORDER BY t.tile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_pos,
           round(CASE WHEN tot.npp > 0
                      THEN sum(t.n_pos) OVER (ORDER BY t.tile
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           * 1.0 / tot.npp END, 6) AS cum_gain
    FROM tiles t, tot
    ORDER BY t.tile
"""


@query("decile_lift_orders", oracle=_LIFT_ORACLE, tags=("evalmetrics", "window"))
def decile_lift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains of price ranking the finished flag
    (operators/evalmetrics.py decile_lift): exact global rank tiles
    without a single-partition sort -- per-score offsets + a
    score-partitioned tie-break window."""
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import decile_lift

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_orderstatus") == "F").alias("is_f"),
    )
    return decile_lift(o, "is_f", "o_totalprice", "o_orderkey", 10)


_QNORM_ORACLE = """
    WITH base AS (SELECT doc_id, source, n_chars
                  FROM documents WHERE n_chars IS NOT NULL),
    ranked AS (SELECT doc_id, source, n_chars,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY n_chars, doc_id) AS r,
                      count(*) OVER (PARTITION BY source) AS ns
               FROM base),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
    gpos AS (SELECT n_chars AS gval,
                    row_number() OVER (ORDER BY n_chars, doc_id) AS pos
             FROM base),
    tgt AS (SELECT ranked.doc_id, ranked.source, ranked.n_chars,
                   CAST(round((CASE WHEN ns > 1
                                    THEN (r - 1) * 1.0 / (ns - 1)
                                    ELSE 0.5 END) * (tot.n - 1)) + 1
                        AS BIGINT) AS j
            FROM ranked, tot)
    SELECT t.doc_id, t.source, t.n_chars, g.gval AS norm_score
    FROM tgt t JOIN gpos g ON t.j = g.pos
    ORDER BY t.doc_id
"""


@query(
    "quantile_normalized_length", oracle=_QNORM_ORACLE, tags=("robust", "window", "bench")
)
def quantile_normalized_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize document length across sources
    (operators/robust.py quantile_normalize): each doc's n_chars is
    CDF-matched onto the global length distribution, making per-source
    scores directly comparable without a normality assumption. Global
    positions come from per-score offsets + a score-partitioned
    tie-break window -- never a single-partition sort of the rows."""
    from taxi_data_pipeline_pset2_spark.operators.robust import quantile_normalize

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return quantile_normalize(
        docs, "n_chars", "source", "doc_id"
    ).orderBy("doc_id")


@query(
    "scalable_rank_positions",
    oracle="""
        SELECT o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS price,
               row_number() OVER (ORDER BY CAST(o_totalprice AS DOUBLE),
                                  o_orderkey) AS pos
        FROM orders
        WHERE o_totalprice IS NOT NULL
        ORDER BY pos
    """,
    tags=("robust", "window"),
)
def scalable_rank_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global row positions by (price, key) via the BUCKETED rank
    plan (operators/robust.py global_rank_bucketed): 1024 equi-width
    value buckets from one broadcast (min,max) row, cumulative offsets
    over the bucket-count-sized frame, bucket-partitioned in-bucket
    row_number -- the rank-at-scale pattern for near-unique continuous
    columns, where the per-distinct-value offset trick would degrade to
    a row-sized single-task window. The oracle is the NAIVE single sort
    (row_number over the full order), so the hash match proves the
    scale-shaped plan computes the identical total order. Any monotone
    bucketing yields the same positions, which is why the float bucket
    boundaries carry no cross-engine risk."""
    from taxi_data_pipeline_pset2_spark.operators.robust import (
        global_rank_bucketed,
    )

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    return (
        global_rank_bucketed(o, "price", "o_orderkey")
        .select("o_orderkey", "price", "pos")
        .orderBy("pos")
    )


# ---- deterministic Poisson-bootstrap CI ----------------------------------

def _boot_sql(n_boot: int = 40) -> str:
    from taxi_data_pipeline_pset2_spark.operators.stats import POISSON1_CUM

    # mirror of poisson_bootstrap_ci's engineered shape: replicate rows
    # via generate_series, 16-bit hex-string thresholds, bigint scaled
    # sums (scale=2 for 2-dp money), decimal side-aggregate for n/mean
    th = [format(int(round(c * 65536)), "04x") for c in POISSON1_CUM]
    case = (
        "CASE "
        + " ".join(f"WHEN ch < '{t}' THEN {k}" for k, t in enumerate(th))
        + " ELSE 6 END"
    )
    n_hash = (n_boot + 7) // 8
    return f"""
    WITH base AS (SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS v,
                         o_orderkey AS id
                  FROM orders WHERE o_totalprice IS NOT NULL),
    hx AS (SELECT g, CAST(round(v * 100) AS BIGINT) AS vi, gg,
                  md5(coalesce(CAST(id AS VARCHAR), '<null-id>')
                      || '|boot-v1|' || CAST(gg AS VARCHAR)) AS hex
           FROM base CROSS JOIN generate_series(0, {n_hash - 1}) AS t(gg)),
    chk AS (SELECT g, vi, 8 * gg + cc AS b, substr(hex, 4 * cc + 1, 4) AS ch
            FROM hx CROSS JOIN generate_series(0, 7) AS t2(cc)),
    rep AS (SELECT g, vi, b, {case} AS w FROM chk),
    perb AS (SELECT g, b, sum(w * vi) AS si, CAST(sum(w) AS BIGINT) AS c
             FROM rep GROUP BY g, b),
    m AS (SELECT g, list_sort(list_filter(
                    list(CASE WHEN c > 0 THEN CAST(si AS DOUBLE) / c / 100.0 END),
                    x -> x IS NOT NULL)) AS mm
          FROM perb GROUP BY g),
    side AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sv
             FROM base GROUP BY g)
    SELECT s.g AS o_orderpriority, s.n,
           round(s.sv / s.n, 6) AS mean,
           round(mm[CAST(floor(0.025 * (len(mm) - 1)) AS INT) + 1], 6) AS ci_lo,
           round(mm[CAST(ceil(0.975 * (len(mm) - 1)) AS INT) + 1], 6) AS ci_hi
    FROM m JOIN side s ON m.g = s.g
    ORDER BY o_orderpriority
"""


@query(
    "bootstrap_ci_price", oracle=_boot_sql(), tags=("bench", "stats", "agg")
)
def bootstrap_ci_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap CI for mean order price per priority
    (operators/stats.py poisson_bootstrap_ci): 40 deterministic
    hash-weighted replicates in ONE hash aggregate -- the
    uncertainty-at-scale primitive (no resample shuffle, no RNG
    state)."""
    from taxi_data_pipeline_pset2_spark.operators.stats import poisson_bootstrap_ci

    o = t(spark, sf_dir, "orders")
    return poisson_bootstrap_ci(
        o,
        "o_totalprice",
        ["o_orderpriority"],
        id_col="o_orderkey",
        n_boot=40,
        scale=2,
    ).orderBy("o_orderpriority")


_WELCH_ORACLE = """
    WITH base AS (SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS v
                  FROM orders
                  WHERE o_totalprice IS NOT NULL
                    AND o_orderpriority IN ('1-URGENT', '5-LOW')),
    a AS (SELECT CAST(count(*) FILTER (g = '1-URGENT') AS BIGINT) AS n_a,
                 CAST(sum(CAST(v AS DECIMAL(28,6))) FILTER (g = '1-URGENT') AS DOUBLE) AS sa,
                 CAST(sum(CAST(v * v AS DECIMAL(38,10))) FILTER (g = '1-URGENT') AS DOUBLE) AS qa,
                 CAST(count(*) FILTER (g = '5-LOW') AS BIGINT) AS n_b,
                 CAST(sum(CAST(v AS DECIMAL(28,6))) FILTER (g = '5-LOW') AS DOUBLE) AS sb,
                 CAST(sum(CAST(v * v AS DECIMAL(38,10))) FILTER (g = '5-LOW') AS DOUBLE) AS qb
          FROM base)
    SELECT n_a, n_b,
           round(sa / n_a, 6) AS mean_a,
           round(sb / n_b, 6) AS mean_b,
           round(sa / n_a - sb / n_b, 6) AS mean_diff,
           round(CASE WHEN n_a >= 2 AND n_b >= 2
                       AND ((qa - sa * sa / n_a) / (n_a - 1) / n_a
                            + (qb - sb * sb / n_b) / (n_b - 1) / n_b) > 0
                      THEN (sa / n_a - sb / n_b)
                           / sqrt((qa - sa * sa / n_a) / (n_a - 1) / n_a
                                  + (qb - sb * sb / n_b) / (n_b - 1) / n_b)
                 END, 6) AS t_stat,
           round(CASE WHEN n_a >= 2 AND n_b >= 2
                       AND ((qa - sa * sa / n_a) / (n_a - 1) / n_a
                            + (qb - sb * sb / n_b) / (n_b - 1) / n_b) > 0
                      THEN pow((qa - sa * sa / n_a) / (n_a - 1) / n_a
                               + (qb - sb * sb / n_b) / (n_b - 1) / n_b, 2)
                           / (pow((qa - sa * sa / n_a) / (n_a - 1) / n_a, 2) / (n_a - 1)
                              + pow((qb - sb * sb / n_b) / (n_b - 1) / n_b, 2) / (n_b - 1))
                 END, 6) AS df
    FROM a
"""


@query("welch_price_priority", oracle=_WELCH_ORACLE, tags=("stats", "agg"))
def welch_price_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test of order price, urgent vs low priority
    (operators/stats.py welch_ttest): unequal-variance t and
    Welch-Satterthwaite df from exact decimal sufficient statistics --
    the A/B significance primitive next to the bootstrap CI."""
    from taxi_data_pipeline_pset2_spark.operators.stats import welch_ttest

    return welch_ttest(
        t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority",
        "1-URGENT", "5-LOW",
    )


_MWU_ORACLE = """
    WITH base AS (SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS v
                  FROM orders
                  WHERE o_totalprice IS NOT NULL
                    AND o_orderpriority IN ('1-URGENT', '5-LOW')),
    per AS (SELECT v AS s,
                   CAST(count(*) FILTER (g = '1-URGENT') AS BIGINT) AS p,
                   CAST(count(*) FILTER (g = '5-LOW') AS BIGINT) AS q
            FROM base GROUP BY v),
    c AS (SELECT p, q,
                 coalesce(sum(q) OVER (ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS cb
          FROM per),
    a AS (SELECT CAST(sum(p) AS BIGINT) AS n_a,
                 CAST(sum(q) AS BIGINT) AS n_b,
                 sum(CAST(p AS DECIMAL(38,0))
                     * CAST(2 * cb + q AS DECIMAL(38,0))) AS num2,
                 sum(CAST((p + q) * (p + q) * (p + q) - (p + q)
                          AS DECIMAL(38,0))) AS ties
          FROM c)
    SELECT n_a, n_b,
           round(CAST(num2 AS DOUBLE) / 2.0, 6) AS u_a,
           round(CASE WHEN n_a > 0 AND n_b > 0
                      THEN CAST(num2 AS DOUBLE) / (2.0 * n_a * n_b) END, 6)
               AS auc,
           round(CASE WHEN n_a > 0 AND n_b > 0
                       AND CAST(n_a * n_b AS DOUBLE) / 12.0
                           * (CAST(n_a + n_b + 1 AS DOUBLE)
                              - CAST(ties AS DOUBLE)
                                / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))) > 0
                      THEN (CAST(num2 AS DOUBLE) / 2.0
                            - CAST(n_a * n_b AS DOUBLE) / 2.0)
                           / sqrt(CAST(n_a * n_b AS DOUBLE) / 12.0
                                  * (CAST(n_a + n_b + 1 AS DOUBLE)
                                     - CAST(ties AS DOUBLE)
                                       / (CAST(n_a + n_b AS DOUBLE)
                                          * (n_a + n_b - 1))))
                 END, 6) AS z
    FROM a
"""


@query("mannwhitney_price_priority", oracle=_MWU_ORACLE, tags=("stats", "agg"))
def mannwhitney_price_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney U test of order price, urgent vs low
    priority (operators/stats.py mannwhitney_u): the rank-based
    nonparametric A/B companion to the Welch t -- same per-distinct-
    value machinery as the grouped ROC-AUC, never a raw-row sort."""
    from taxi_data_pipeline_pset2_spark.operators.stats import mannwhitney_u

    return mannwhitney_u(
        t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority",
        "1-URGENT", "5-LOW",
    )


_ISOTONIC_ORACLE = """
    WITH base AS (
      SELECT o_orderpriority AS g,
             CAST(round(o_totalprice / 6000) AS INT) AS score_i,
             (o_orderstatus = 'F') AS y
      FROM orders),
    per AS (
      SELECT g, score_i,
             CAST(count(*) FILTER (y) AS BIGINT) AS pos,
             CAST(count(*) AS BIGINT) AS n
      FROM base GROUP BY g, score_i),
    ord_ AS (
      SELECT g, score_i, pos, n,
             row_number() OVER (PARTITION BY g ORDER BY score_i) AS k,
             sum(pos) OVER (PARTITION BY g ORDER BY score_i) AS cpos,
             sum(n) OVER (PARTITION BY g ORDER BY score_i) AS cn
      FROM per),
    -- every contiguous range i..j: block sums via prefix differences
    rng AS (
      SELECT a.g, a.k AS i, b.k AS j,
             (b.cpos - a.cpos + a.pos) AS rpos,
             (b.cn - a.cn + a.n) AS rn
      FROM ord_ a JOIN ord_ b ON a.g = b.g AND a.k <= b.k),
    -- minimax closed form of the L2 isotonic fit:
    -- fitted[k] = max_{i<=k} min_{j>=k} mean(i..j)
    innr AS (
      SELECT t.g, t.k, r.i,
             min(CAST(r.rpos AS DOUBLE) / r.rn) AS mn
      FROM ord_ t JOIN rng r ON r.g = t.g AND r.i <= t.k AND t.k <= r.j
      GROUP BY t.g, t.k, r.i),
    fit AS (SELECT g, k, max(mn) AS q FROM innr GROUP BY g, k)
    SELECT o.g AS o_orderpriority,
           CAST(o.score_i AS DOUBLE) AS score,
           o.n,
           floor(f.q * 1e6 + 0.5) / 1e6 AS fitted_p
    FROM ord_ o JOIN fit f ON o.g = f.g AND o.k = f.k
    ORDER BY o_orderpriority, score
"""


@query(
    "isotonic_calibration",
    oracle=_ISOTONIC_ORACLE,
    tags=("evalmetrics", "iterative"),
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAVA isotonic calibration of the finished-flag rate as a
    function of binned price (operators/evalmetrics.py fit_isotonic).
    The POOLING is iterative, but the L2 isotonic fit has the minimax
    closed form fitted[k] = max_{i<=k} min_{j>=k} mean(i..j) (Barlow et
    al. 1972), which IS SQL-expressible -- O(n^3) over the ~100 distinct
    price bins, a perfectly good oracle shape (the engine runs
    linear-time PAVA; the oracle brute-forces the same real numbers:
    IEEE division is correctly rounded, so equal rationals give
    bit-identical doubles and the hash matches exactly). Upgraded from
    rows-only in r8; L2-optimality vs a brute-force reference is also
    pinned in tests/test_evalmetrics.py. Scores are pre-binned to ~100
    levels so the per-group kernel bound (distinct scores) is
    explicit."""
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import fit_isotonic

    o = t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") / 6000).cast("int").alias("price_bin"),
        (F.col("o_orderstatus") == "F").alias("is_f"),
        "o_orderpriority",
    )
    return fit_isotonic(
        o, "is_f", "price_bin", ["o_orderpriority"]
    ).orderBy("o_orderpriority", "score")


_CUPED_ORACLE = """
    WITH base AS (SELECT l_linestatus AS g,
                         CAST(l_extendedprice AS DOUBLE) AS y,
                         CAST(l_quantity AS DOUBLE) AS x
                  FROM lineitem
                  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
                    AND l_linestatus IN ('O', 'F')),
    a AS (SELECT
            CAST(count(*) FILTER (g = 'O') AS BIGINT) AS n_a,
            CAST(sum(CAST(y AS DECIMAL(28,6))) FILTER (g = 'O') AS DOUBLE) AS sya,
            CAST(sum(CAST(x AS DECIMAL(28,6))) FILTER (g = 'O') AS DOUBLE) AS sxa,
            CAST(sum(CAST(y * y AS DECIMAL(38,10))) FILTER (g = 'O') AS DOUBLE) AS syya,
            CAST(sum(CAST(x * x AS DECIMAL(38,10))) FILTER (g = 'O') AS DOUBLE) AS sxxa,
            CAST(sum(CAST(x * y AS DECIMAL(38,10))) FILTER (g = 'O') AS DOUBLE) AS sxya,
            CAST(count(*) FILTER (g = 'F') AS BIGINT) AS n_b,
            CAST(sum(CAST(y AS DECIMAL(28,6))) FILTER (g = 'F') AS DOUBLE) AS syb,
            CAST(sum(CAST(x AS DECIMAL(28,6))) FILTER (g = 'F') AS DOUBLE) AS sxb,
            CAST(sum(CAST(y * y AS DECIMAL(38,10))) FILTER (g = 'F') AS DOUBLE) AS syyb,
            CAST(sum(CAST(x * x AS DECIMAL(38,10))) FILTER (g = 'F') AS DOUBLE) AS sxxb,
            CAST(sum(CAST(x * y AS DECIMAL(38,10))) FILTER (g = 'F') AS DOUBLE) AS sxyb
          FROM base),
    p AS (SELECT *,
                 n_a + n_b AS n,
                 sya + syb AS sy, sxa + sxb AS sx,
                 syya + syyb AS syy, sxxa + sxxb AS sxx, sxya + sxyb AS sxy
          FROM a),
    th AS (SELECT *,
                  n * sxy - sx * sy AS cov_xy,
                  n * sxx - sx * sx AS var_x,
                  n * syy - sy * sy AS var_y,
                  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
                  sx / n AS xbar
           FROM p),
    m AS (SELECT *,
                 (sya - theta * (sxa - n_a * xbar)) / n_a AS ma,
                 (syb - theta * (sxb - n_b * xbar)) / n_b AS mb,
                 syya - 2 * theta * (sxya - xbar * sya)
                   + theta * theta * (sxxa - 2 * xbar * sxa + n_a * xbar * xbar)
                   AS ssa,
                 syyb - 2 * theta * (sxyb - xbar * syb)
                   + theta * theta * (sxxb - 2 * xbar * sxb + n_b * xbar * xbar)
                   AS ssb
          FROM th),
    v AS (SELECT *,
                 (ssa - n_a * ma * ma) / (n_a - 1) / n_a AS sea,
                 (ssb - n_b * mb * mb) / (n_b - 1) / n_b AS seb
          FROM m)
    SELECT n_a, n_b,
           round(CASE WHEN var_x > 0 THEN theta END, 6) AS theta,
           round(CASE WHEN var_x > 0 THEN ma END, 6) AS mean_a_adj,
           round(CASE WHEN var_x > 0 THEN mb END, 6) AS mean_b_adj,
           round(CASE WHEN var_x > 0 THEN ma - mb END, 6) AS mean_diff,
           round(CASE WHEN var_x > 0 AND var_y > 0
                      THEN 1.0 - (var_y - cov_xy * cov_xy / var_x) / var_y
                 END, 6) AS var_reduction,
           round(CASE WHEN n_a >= 2 AND n_b >= 2 AND var_x > 0
                       AND sea + seb > 0
                      THEN (ma - mb) / sqrt(sea + seb) END, 6) AS t_stat,
           round(CASE WHEN n_a >= 2 AND n_b >= 2 AND var_x > 0
                       AND sea + seb > 0
                      THEN (sea + seb) * (sea + seb)
                           / (sea * sea / (n_a - 1) + seb * seb / (n_b - 1))
                 END, 6) AS df
    FROM v
"""


@query("cuped_price_linestatus", oracle=_CUPED_ORACLE, tags=("stats", "agg"))
def cuped_price_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted Welch t-test of extended price between open and
    finished line items, with quantity as the pre-experiment covariate
    (operators/stats.py cuped_adjusted_ttest, Deng et al. 2013): the
    variance-reduction experimentation primitive -- nine decimal
    sufficient statistics in one aggregate, closed-form adjustment."""
    from taxi_data_pipeline_pset2_spark.operators.stats import cuped_adjusted_ttest

    return cuped_adjusted_ttest(
        t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        "l_linestatus",
        "O",
        "F",
    )


_SPEARMAN_ORACLE = """
    WITH base AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_extendedprice AS DOUBLE) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    r AS (
      SELECT flag,
             CAST(2 * rank() OVER (PARTITION BY flag ORDER BY x)
                  + count(*) OVER (PARTITION BY flag, x) - 1
                  AS BIGINT) AS rx,
             CAST(2 * rank() OVER (PARTITION BY flag ORDER BY y)
                  + count(*) OVER (PARTITION BY flag, y) - 1
                  AS BIGINT) AS ry
      FROM base
    ),
    s AS (
      SELECT flag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS DOUBLE) AS sx,
             CAST(sum(ry) AS DOUBLE) AS sy,
             CAST(sum(CAST(rx * ry AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(rx * rx AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(ry * ry AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM r GROUP BY flag
    )
    SELECT flag, n,
           round(CASE WHEN (n * sxx - sx * sx) > 0
                       AND (n * syy - sy * sy) > 0
                 THEN (n * sxy - sx * sy)
                      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                 END, 6) AS rho
    FROM s ORDER BY flag
"""


@query("spearman_qty_price", oracle=_SPEARMAN_ORACLE, tags=("stats", "window", "bench"))
def spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price per
    return flag (operators/stats.py spearman_corr): the
    monotone-association screen next to metric_corr_matrix's Pearson.
    Doubled integer average ranks keep every accumulation exact; the
    oracle twin rebuilds the identical ranks with DuckDB windows."""
    from taxi_data_pipeline_pset2_spark.operators.stats import spearman_corr

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    return spearman_corr(li, "x", "y", ["flag"])


_DAILY_SER_SQL = """
      b AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo,
                   CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
      sp AS (SELECT CAST(unnest(generate_series(lo, hi,
                                 INTERVAL 1 DAY)) AS DATE) AS d FROM b),
      dc AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS c
             FROM orders GROUP BY 1),
      ser AS (SELECT date_diff('day', DATE '1970-01-01', sp.d) AS t,
                     CAST(coalesce(c, 0) AS BIGINT) AS value
              FROM sp LEFT JOIN dc USING (d))
"""

_ACF_ORACLE = f"""
    WITH {_DAILY_SER_SQL},
    lags AS (SELECT unnest(generate_series(1, 14)) AS k),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(CAST(value AS DOUBLE) AS DECIMAL(28,6)))
                  AS DOUBLE) AS sx,
             CAST(sum(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                           AS DECIMAL(38,10))) AS DOUBLE) AS sxx
      FROM ser
    ),
    per_k AS (
      SELECT l.k,
             CAST(count(*) AS BIGINT) AS c,
             CAST(sum(CAST(CAST(s1.value AS DOUBLE)
                           * CAST(s2.value AS DOUBLE)
                           AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(CAST(s1.value AS DOUBLE) AS DECIMAL(28,6)))
                  AS DOUBLE) AS sa,
             CAST(sum(CAST(CAST(s2.value AS DOUBLE) AS DECIMAL(28,6)))
                  AS DOUBLE) AS sb
      FROM lags l, ser s1, ser s2
      WHERE s1.t = s2.t + l.k
      GROUP BY l.k
    )
    SELECT CAST(l.k AS INTEGER) AS lag,
           CAST(coalesce(p.c, 0) AS BIGINT) AS n_pairs,
           round(CASE WHEN coalesce(p.c, 0) > 0
                       AND (tot.sxx - tot.sx * tot.sx / tot.n) > 0
                 THEN (p.sxy - (tot.sx / tot.n) * (p.sa + p.sb)
                       + p.c * (tot.sx / tot.n) * (tot.sx / tot.n))
                      / (tot.sxx - tot.sx * tot.sx / tot.n)
                 END, 6) AS acf
    FROM lags l LEFT JOIN per_k p ON p.k = l.k CROSS JOIN tot
    ORDER BY lag
"""


def _daily_order_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense zero-filled daily order-count series (t = epoch day)."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").cast("bigint").alias("value")
    )
    spine = o.agg(
        F.to_date(F.min("o_orderdate")).alias("lo"),
        F.to_date(F.max("o_orderdate")).alias("hi"),
    ).select(F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d"))
    return spine.join(daily, "d", "left").select(
        F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01"))).alias("t"),
        F.coalesce("value", F.lit(0)).cast("bigint").alias("value"),
    )


@query("acf_daily_orders", oracle=_ACF_ORACLE, tags=("timeseries", "window"))
def acf_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily order volume, lags 1..14
    (operators/timeseries.py acf): the weekly-seasonality probe. The
    series is the zero-filled daily count over a generated date spine;
    the oracle rebuilds each lag relationally (self-join on t offset)
    but shares the exact decimal sufficient statistics and the final
    double combination."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import acf

    return acf(_daily_order_series(spark, sf_dir), "t", "value", max_lag=14)


_SEASONAL_ORACLE = f"""
    WITH {_DAILY_SER_SQL},
    tr AS (
      SELECT t, value,
             CASE WHEN count(*) OVER wm = 7
                  THEN CAST(sum(value) OVER wm AS BIGINT) END AS tsum
      FROM ser
      WINDOW wm AS (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (SELECT t, value, tsum,
                   value * 7 - tsum AS detp, t % 7 AS ph
            FROM tr),
    phs AS (SELECT ph, CAST(sum(detp) AS BIGINT) AS ps,
                   CAST(count(*) AS BIGINT) AS pc
            FROM det WHERE tsum IS NOT NULL GROUP BY ph)
    SELECT t, value,
           round(CAST(tsum AS DOUBLE) / 7, 6) AS trend,
           round(CAST(ps AS DOUBLE) / CAST(pc * 7 AS DOUBLE), 6) AS seasonal,
           round(CASE WHEN tsum IS NOT NULL AND ps IS NOT NULL
                 THEN value - CAST(tsum AS DOUBLE) / 7
                      - CAST(ps AS DOUBLE) / CAST(pc * 7 AS DOUBLE)
                 END, 6) AS resid
    FROM det LEFT JOIN phs USING (ph)
    ORDER BY t
"""


@query("seasonal_daily_orders", oracle=_SEASONAL_ORACLE, tags=("timeseries", "window"))
def seasonal_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive 7-day seasonal decomposition of daily order volume
    (operators/timeseries.py seasonal_decompose): centered moving-
    average trend, phase-mean seasonal, residual. Integer-exact
    windowed sums (trend*7, detrended*7 are bigints) make the
    decomposition hash-stable against the DuckDB window twin."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        seasonal_decompose,
    )

    return seasonal_decompose(
        _daily_order_series(spark, sf_dir), "t", "value", period=7
    )


_COVERAGE_ORACLE = """
    WITH iv AS (
      SELECT user_id,
             CAST(epoch_ms(ts) // 1000 AS BIGINT) AS s,
             CAST(epoch_ms(ts) // 1000 AS BIGINT)
               + greatest(1, CAST(floor(value * 60) AS BIGINT)) AS e
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    base AS (SELECT * FROM iv WHERE e > s),
    fl AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER wp IS NULL OR s > max(e) OVER wp
                  THEN 1 ELSE 0 END AS nw
      FROM base
      WINDOW wp AS (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    isl AS (
      SELECT user_id, s, e,
             sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS grp
      FROM fl
    ),
    g AS (
      SELECT user_id, grp, count(*) AS n,
             max(e) - min(s) AS len, sum(e - s) AS raw
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(sum(n) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(len) AS BIGINT) AS covered,
           CAST(sum(raw) AS BIGINT) AS raw_total,
           CAST(sum(raw) - sum(len) AS BIGINT) AS overlap_saved
    FROM g GROUP BY user_id ORDER BY user_id
"""


@query("user_event_coverage", oracle=_COVERAGE_ORACLE, tags=("timeseries", "window", "bench"))
def user_event_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-interval activity coverage per user (operators/rangejoin
    .py interval_coverage): each event opens a [ts, ts + value minutes)
    activity window; overlaps must union, not sum. One sweep-line sort
    per user -- the linear-complement of the bucketed overlap JOIN
    (session_maintenance_overlap pairs intervals; this de-overlaps
    them)."""
    from taxi_data_pipeline_pset2_spark.operators.rangejoin import (
        interval_coverage,
    )

    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    s = F.unix_timestamp("ts")
    iv = ev.select(
        "user_id",
        s.alias("s"),
        (s + F.greatest(F.lit(1), F.floor(F.col("value") * 60))).alias("e"),
    )
    return interval_coverage(iv, ["user_id"], "s", "e")


_PARETO_ORACLE = """
    WITH pts AS (
      SELECT DISTINCT p_brand AS brand,
             CAST(p_retailprice AS DOUBLE) AS price,
             CAST(p_size AS BIGINT) AS size
      FROM part
      WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    ),
    fl AS (
      SELECT brand, price, size,
             max(size) OVER (PARTITION BY brand
                             ORDER BY price ASC, size DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS pm
      FROM pts
    )
    SELECT brand, price, size
    FROM fl WHERE pm IS NULL OR size > pm
    ORDER BY brand, price, size
"""


@query("pareto_parts_price_size", oracle=_PARETO_ORACLE, tags=("window", "agg"))
def pareto_parts_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts per brand (operators/pareto.py):
    cheapest-price / largest-size non-dominated set -- the
    multi-objective shortlist as one sorted window sweep, no quadratic
    NOT EXISTS."""
    from taxi_data_pipeline_pset2_spark.operators.pareto import (
        pareto_frontier,
    )

    pts = t(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand"),
        F.col("p_retailprice").cast("double").alias("price"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    return pareto_frontier(pts, "price", "size", ["brand"])


_ITEMSIM_ORACLE = """
    WITH bi0 AS (
      SELECT DISTINCT l_orderkey AS bk, p_brand AS i
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_orderkey IS NOT NULL AND p_brand IS NOT NULL
    ),
    ok AS (SELECT bk FROM bi0 GROUP BY bk HAVING count(*) <= 256),
    bi AS (SELECT bi0.* FROM bi0 JOIN ok USING (bk)),
    ic AS (SELECT i, count(*) AS c FROM bi GROUP BY i),
    pc AS (
      SELECT x.i AS a, y.i AS b, CAST(count(*) AS BIGINT) AS n_ab
      FROM bi x JOIN bi y ON x.bk = y.bk AND x.i < y.i
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS (
      SELECT a AS item, b AS neighbor, n_ab FROM pc
      UNION ALL
      SELECT b AS item, a AS neighbor, n_ab FROM pc
    ),
    sc AS (
      SELECT item, neighbor, n_ab,
             n_ab / sqrt(CAST(ca.c * cb.c AS DOUBLE)) AS cos
      FROM sym
      JOIN ic ca ON ca.i = item
      JOIN ic cb ON cb.i = neighbor
    ),
    rk AS (
      SELECT item, neighbor, n_ab, cos,
             row_number() OVER (PARTITION BY item
                                ORDER BY cos DESC, neighbor) AS rank
      FROM sc
    )
    SELECT item, neighbor, n_ab, round(cos, 6) AS cosine,
           CAST(rank AS INTEGER) AS rank
    FROM rk WHERE rank <= 5 ORDER BY item, rank
"""


@query("brand_item_neighbors", oracle=_ITEMSIM_ORACLE, tags=("basket", "join"))
def brand_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 "bought together" brand neighbors by co-occurrence cosine
    (operators/basket.py item_similarity): the collaborative-filtering
    primitive next to association_rules' lift -- same bounded
    basket-key self-join, popularity-geometry normalization, per-item
    window rank."""
    from taxi_data_pipeline_pset2_spark.operators.basket import (
        item_similarity,
    )

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select("l_orderkey", "p_brand")
    return item_similarity(
        baskets, "l_orderkey", "p_brand", min_cooccur=2, top_k=5
    )


_THEILSEN_ORACLE = """
    WITH m AS (
      SELECT o_orderpriority AS priority,
             CAST(12 * extract(year FROM o_orderdate)
                  + extract(month FROM o_orderdate) AS DOUBLE) AS x,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM orders
      GROUP BY 1, 12 * extract(year FROM o_orderdate)
                  + extract(month FROM o_orderdate)
    ),
    cnt AS (SELECT priority, CAST(count(*) AS BIGINT) AS n
            FROM m GROUP BY 1),
    pairs AS (
      SELECT a.priority, (b.y - a.y) / (b.x - a.x) AS s
      FROM m a JOIN m b ON a.priority = b.priority AND a.x < b.x
    ),
    sl AS (
      SELECT priority, CAST(count(*) AS BIGINT) AS n_slopes,
             quantile_cont(s, 0.5) AS slope
      FROM pairs GROUP BY 1
    ),
    ic AS (
      SELECT m.priority, quantile_cont(m.y - sl.slope * m.x, 0.5) AS icept
      FROM m JOIN sl ON m.priority = sl.priority
      GROUP BY m.priority
    )
    SELECT cnt.priority, cnt.n,
           CAST(coalesce(sl.n_slopes, 0) AS BIGINT) AS n_slopes,
           round(sl.slope, 6) AS slope,
           round(ic.icept, 6) AS intercept
    FROM cnt
    LEFT JOIN sl ON cnt.priority = sl.priority
    LEFT JOIN ic ON cnt.priority = ic.priority
    ORDER BY cnt.priority
"""


@query("theilsen_monthly_revenue", oracle=_THEILSEN_ORACLE, tags=("stats", "join"))
def theilsen_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust revenue trend per order priority
    (operators/stats.py theil_sen) over the MONTHLY rollup -- the
    aggregate-first contract for the quadratic estimator: ~80 months
    per group, thousands of pairwise slopes, never raw-fact pairs.
    Slope/intercept are exact interpolating medians, matching
    quantile_cont."""
    from taxi_data_pipeline_pset2_spark.operators.stats import theil_sen

    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (12 * F.year("o_orderdate") + F.month("o_orderdate")).alias("_xm"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("y")
    ).select("priority", F.col("_xm").cast("double").alias("x"), "y")
    return theil_sen(m, "x", "y", ["priority"])


_INTERARRIVAL_ORACLE = """
    WITH g AS (
      SELECT user_id,
             CAST(epoch_ms(ts) // 1000 AS BIGINT)
               - lag(CAST(epoch_ms(ts) // 1000 AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY
                       CAST(epoch_ms(ts) // 1000 AS BIGINT)) AS gap
      FROM events WHERE ts IS NOT NULL
    ),
    a AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(gap) AS BIGINT) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS sg,
             CAST(sum(CAST(gap * gap AS DECIMAL(38,0))) AS DOUBLE) AS sgg
      FROM g GROUP BY user_id
    ),
    d AS (
      SELECT user_id, n_events, n_gaps,
             CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean,
             sqrt(CASE WHEN (sgg - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                                   / CAST(n_gaps AS DOUBLE))
                            / CAST(n_gaps AS DOUBLE) > 0
                  THEN (sgg - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                              / CAST(n_gaps AS DOUBLE))
                       / CAST(n_gaps AS DOUBLE)
                  ELSE 0.0 END) AS sd
      FROM a
    )
    SELECT user_id, n_events, n_gaps,
           round(CASE WHEN n_gaps > 0 THEN mean END, 6) AS mean_gap,
           round(CASE WHEN n_gaps > 0 THEN sd END, 6) AS sd_gap,
           round(CASE WHEN n_gaps > 0 AND mean > 0
                 THEN sd / mean END, 6) AS cv,
           round(CASE WHEN n_gaps > 0 AND (sd + mean) > 0
                 THEN (sd - mean) / (sd + mean) END, 6) AS burstiness
    FROM d ORDER BY user_id
"""


@query("user_interarrival_stats", oracle=_INTERARRIVAL_ORACLE, tags=("timeseries", "window"))
def user_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per user (operators/stats.py
    interarrival_stats): mean/sd/CV/burstiness of event spacing -- the
    traffic-shape profile. One lag window + one hash aggregate, exact
    integer gap sums."""
    from taxi_data_pipeline_pset2_spark.operators.stats import (
        interarrival_stats,
    )

    return interarrival_stats(
        t(spark, sf_dir, "events"), ["user_id"], "ts"
    )


_SPATIAL_ORACLE = """
    WITH c AS (
      SELECT c_custkey,
             (CAST('0x' || substr(md5('cx:' || CAST(c_custkey AS VARCHAR)),
                                  1, 8) AS BIGINT) % 1000000) / 1000.0 AS x,
             (CAST('0x' || substr(md5('cy:' || CAST(c_custkey AS VARCHAR)),
                                  1, 8) AS BIGINT) % 1000000) / 1000.0 AS y
      FROM customer
    ),
    s AS (
      SELECT s_suppkey,
             (CAST('0x' || substr(md5('sx:' || CAST(s_suppkey AS VARCHAR)),
                                  1, 8) AS BIGINT) % 1000000) / 1000.0 AS x,
             (CAST('0x' || substr(md5('sy:' || CAST(s_suppkey AS VARCHAR)),
                                  1, 8) AS BIGINT) % 1000000) / 1000.0 AS y
      FROM supplier
    ),
    p AS (
      SELECT c_custkey, s_suppkey,
             (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS d2
      FROM c CROSS JOIN s
    )
    SELECT c_custkey, s_suppkey, round(sqrt(d2), 6) AS dist
    FROM p WHERE d2 <= 2500.0
    ORDER BY c_custkey, s_suppkey
"""


def _hash_coord(key, salt: str):
    """0..1000 planar coordinate from the engine-portable md5 bucket
    (the cms.py construction): first 8 hex digits as int, mod 1e6,
    /1000."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (h % 1_000_000) / F.lit(1000.0)


@query("customers_near_suppliers", oracle=_SPATIAL_ORACLE, tags=("spatial", "join", "bench"))
def customers_near_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed planar radius join (operators/spatial.py
    grid_radius_join): every (customer, supplier) pair within distance
    50 on a synthetic 1000x1000 plane (coordinates derived from the
    engine-portable md5 hash, so both engines place every point
    identically). The ORACLE is the brute-force cross join -- an
    independent proof that the 3x3 neighbor-cell equi-join finds
    exactly the qualifying pairs, boundary cases included."""
    from taxi_data_pipeline_pset2_spark.operators.spatial import (
        grid_radius_join,
    )

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        _hash_coord(F.col("c_custkey"), "cx:").alias("cx_pos"),
        _hash_coord(F.col("c_custkey"), "cy:").alias("cy_pos"),
    )
    supp = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _hash_coord(F.col("s_suppkey"), "sx:").alias("sx_pos"),
        _hash_coord(F.col("s_suppkey"), "sy:").alias("sy_pos"),
    )
    return (
        grid_radius_join(
            cust, supp, ("cx_pos", "cy_pos"), ("sx_pos", "sy_pos"), radius=50.0
        )
        .select("c_custkey", "s_suppkey", "dist")
        .orderBy("c_custkey", "s_suppkey")
    )


_IVM_ORACLE = """
    SELECT date_trunc('month', o_orderdate) AS o_month,
           o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    ORDER BY o_month, priority
"""


@query("ivm_join_view_maintenance", oracle=_IVM_ORACLE, tags=("incremental", "join", "bench"))
def ivm_join_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained orders x lineitem join view
    (operators/ivm.py maintain_join_view): the base view joins only
    pre-2001 orders with pre-2001 shipments; 2001 orders and 2001
    shipments then apply as append deltas via the delta rule
    (delta_A x B_new + A_old x delta_B, both delta-broadcast). The
    ORACLE is the from-scratch full join -- the maintained view must
    aggregate to bit-identical monthly revenue, the strongest
    maintenance proof (the scd2_incremental_apply pattern)."""
    from taxi_data_pipeline_pset2_spark.operators.ivm import (
        maintain_join_view,
    )

    cut = F.lit("2001-01-01").cast("timestamp")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_shipdate",
    )
    a_old = o.filter(F.col("o_orderdate") < cut)
    delta_a = o.filter(F.col("o_orderdate") >= cut)
    b_old = li.filter(F.col("l_shipdate") < cut)
    delta_b = li.filter(F.col("l_shipdate") >= cut)
    cols = [
        "o_orderkey", "o_orderpriority", "o_orderdate",
        "l_extendedprice", "l_shipdate",
    ]
    view_old = a_old.join(b_old, ["o_orderkey"]).select(*cols)
    v = maintain_join_view(
        view_old, a_old, delta_a, li, delta_b, ["o_orderkey"]
    )
    return (
        v.groupBy(
            F.date_trunc("month", "o_orderdate").alias("o_month"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_month", "priority")
    )


_TENC_ORACLE = """
    WITH base AS (
      SELECT p_brand AS cat, l_orderkey % 5 AS fold,
             CAST(l_extendedprice AS DOUBLE) AS y
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_extendedprice IS NOT NULL AND l_orderkey IS NOT NULL
    ),
    cf AS (
      SELECT cat, CAST(fold AS BIGINT) AS fold,
             CAST(count(*) AS BIGINT) AS cnt_cf,
             sum(CAST(y AS DECIMAL(28,6))) AS sum_cf
      FROM base GROUP BY 1, 2
    ),
    c AS (SELECT cat, CAST(sum(cnt_cf) AS BIGINT) AS cnt_c,
                 sum(sum_cf) AS sum_c FROM cf GROUP BY 1),
    f AS (SELECT fold, CAST(sum(cnt_cf) AS BIGINT) AS cnt_f,
                 sum(sum_cf) AS sum_f FROM cf GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt_cf) AS BIGINT) AS cnt_t,
                   sum(sum_cf) AS sum_t FROM cf)
    SELECT cf.cat AS brand, cf.fold,
           CAST(cnt_c - cnt_cf AS BIGINT) AS n_oof,
           round(CAST(sum_t - sum_f AS DOUBLE)
                 / CAST(cnt_t - cnt_f AS DOUBLE), 6) AS prior,
           round((CAST(sum_c - sum_cf AS DOUBLE)
                  + 20.0 * (CAST(sum_t - sum_f AS DOUBLE)
                            / CAST(cnt_t - cnt_f AS DOUBLE)))
                 / (CAST(cnt_c - cnt_cf AS DOUBLE) + 20.0), 6) AS encoding
    FROM cf
    JOIN c ON cf.cat IS NOT DISTINCT FROM c.cat
    JOIN f ON cf.fold = f.fold
    CROSS JOIN tot
    ORDER BY brand, cf.fold
"""


@query("brand_target_encoding", oracle=_TENC_ORACLE, tags=("ml", "agg"))
def brand_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe out-of-fold target encoding of brand -> mean line
    price (operators/encoding.py target_encode_oof): each (brand, fold)
    cell is encoded from the OTHER folds only, smoothed toward the
    fold's out-of-fold global mean -- one (category, fold) aggregate,
    derived margins broadcast back. Folds are l_orderkey % 5
    (deterministic on both engines)."""
    from taxi_data_pipeline_pset2_spark.operators.encoding import (
        target_encode_oof,
    )

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"),
        (F.col("l_orderkey") % 5).alias("fold"),
        F.col("l_extendedprice").alias("y"),
    )
    return target_encode_oof(base, "brand", "y", "fold", smoothing=20.0)


_SKEW_ORACLE = """
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    )
    SELECT CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_key_rows,
           round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
             AS top1_share,
           round(quantile_cont(c, 0.99), 6) AS p99_key_rows,
           round(CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS mean_key_rows,
           round(CAST(max(c) AS DOUBLE)
                 / (CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6)
             AS skew_ratio
    FROM c
"""


@query("user_key_skew", oracle=_SKEW_ORACLE, tags=("profiling", "agg"))
def user_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew audit for events.user_id
    (operators/profiling.py skew_report): the pre-flight measurement
    that decides whether operators/skew.py's salting machinery is
    needed before keying a shuffle on this column."""
    from taxi_data_pipeline_pset2_spark.operators.profiling import (
        skew_report,
    )

    return skew_report(t(spark, sf_dir, "events"), ["user_id"])


_ROLLING_DISTINCT_ORACLE = """
    WITH pairs AS (
      SELECT DISTINCT user_id AS id, CAST(ts AS DATE) AS d
      FROM events WHERE ts IS NOT NULL
    ),
    b AS (SELECT min(d) AS lo, max(d) AS hi FROM pairs),
    served AS (
      SELECT DISTINCT id,
             CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM pairs
    ),
    cnt AS (SELECT day, CAST(count(*) AS BIGINT) AS n
            FROM served GROUP BY day),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM b
    )
    SELECT strftime(spine.day, '%Y-%m-%d') AS day,
           CAST(coalesce(n, 0) AS BIGINT) AS n_distinct
    FROM spine LEFT JOIN cnt USING (day)
    ORDER BY day
"""


@query("rolling_7day_users", oracle=_ROLLING_DISTINCT_ORACLE, tags=("timeseries", "agg", "bench"))
def rolling_7day_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day distinct users per day (operators/frequency
    .py rolling_distinct): sliding DISTINCT doesn't decompose into
    window sums, so each active (user, day) pair explodes to the
    constant 7 window-ends it serves and dedups once -- O(pairs x 7),
    never O(days x corpus)."""
    from taxi_data_pipeline_pset2_spark.operators.frequency import (
        rolling_distinct,
    )

    return rolling_distinct(
        t(spark, sf_dir, "events"), "ts", "user_id", window_days=7
    )


_PNG_ORACLE = """
    SELECT doc_id AS media_id,
           TRUE AS is_png,
           CAST(16 + (doc_id * 7) % 1024 AS BIGINT) AS width,
           CAST(16 + (doc_id * 13) % 768 AS BIGINT) AS height,
           8 AS bit_depth, 6 AS color_type
    FROM documents
    ORDER BY media_id
"""


@query("multimodal_png_dims", oracle=_PNG_ORACLE, tags=("multimodal",))
def multimodal_png_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG header metadata parsed from raw binary payloads
    (operators/multimodal.py parse_png_header): byte-correct signature
    + IHDR headers are synthesized per document with planted dims, and
    the parser must recover them through the real binary path
    (substring/hex/conv on a binary column, codegen-only). The oracle
    computes the PLANTED dims directly from doc_id -- proving the
    synthesize->bytes->parse round trip is exact. Header-level typed
    metadata is the multimodal operation that is real at 100 TB;
    only pixel decode is stubbed (decode_stub)."""
    from taxi_data_pipeline_pset2_spark.operators.multimodal import (
        parse_png_header,
        synth_png_header,
    )

    docs = t(spark, sf_dir, "documents")
    media = synth_png_header(
        docs,
        "doc_id",
        16 + (F.col("doc_id") * 7) % 1024,
        16 + (F.col("doc_id") * 13) % 768,
    )
    return (
        parse_png_header(media)
        .select(
            "media_id", "is_png", "width", "height", "bit_depth",
            "color_type",
        )
        .orderBy("media_id")
    )


_INFER_ORACLE = """
    WITH dim AS (
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer WHERE c_custkey % 10 != 0
    ),
    missing AS (
      SELECT DISTINCT o_custkey AS c_custkey
      FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM dim)
    )
    SELECT c_custkey, c_name, c_mktsegment, FALSE AS is_inferred FROM dim
    UNION ALL
    SELECT c_custkey, NULL, 'UNKNOWN', TRUE FROM missing
    ORDER BY c_custkey
"""


@query("inferred_dim_members", oracle=_INFER_ORACLE, tags=("dim", "join"))
def inferred_dim_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving-dimension repair (plans/scd.py infer_members):
    every tenth customer is withheld from the dimension; orders
    referencing the withheld keys get per-key placeholder members
    (segment defaulted, name NULL) so the fact load keeps referential
    integrity until the real attributes backfill -- Kimball's inferred
    members, the per-key upgrade of dim_zone's single 'Unknown' row."""
    from taxi_data_pipeline_pset2_spark.plans.scd import infer_members

    dim = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 != 0)
        .select("c_custkey", "c_name", "c_mktsegment")
    )
    facts = t(spark, sf_dir, "orders").select("o_custkey")
    return infer_members(
        dim, facts, "c_custkey", "o_custkey",
        defaults={"c_mktsegment": "UNKNOWN"},
    ).orderBy("c_custkey")


_CMS_JOIN_ORACLE = """
    WITH d(j) AS (VALUES (0), (1), (2), (3)),
    av AS (SELECT CAST(o_orderkey AS VARCHAR) AS v, count(*) AS c
           FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1),
    bv AS (SELECT CAST(l_orderkey AS VARCHAR) AS v, count(*) AS c
           FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
    sa AS (SELECT j AS row,
                  CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || v),
                                      1, 8) AS BIGINT) % 65536 AS bucket,
                  CAST(sum(c) AS BIGINT) AS c
           FROM av, d GROUP BY 1, 2),
    sb AS (SELECT j AS row,
                  CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || v),
                                      1, 8) AS BIGINT) % 65536 AS bucket,
                  CAST(sum(c) AS BIGINT) AS c
           FROM bv, d GROUP BY 1, 2),
    ip AS (SELECT sa.row,
                  sum(CAST(sa.c AS DECIMAL(19,0)) * CAST(sb.c AS DECIMAL(19,0))) AS p
           FROM sa JOIN sb ON sa.row = sb.row AND sa.bucket = sb.bucket
           GROUP BY sa.row)
    SELECT CAST(min(coalesce(p, 0)) AS BIGINT) AS est_join_size
    FROM d LEFT JOIN ip ON ip.row = d.j
"""


@query("cms_join_size_estimate", oracle=_CMS_JOIN_ORACLE, tags=("sketch", "agg"))
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|orders JOIN lineitem| estimated from two count-min sketches
    (operators/cms.py cms_join_size): the sketch inner-product
    estimator -- join cardinality for shuffle sizing WITHOUT running
    the join; two fixed-size sketches, one (row, bucket) equi-join.
    The engine-portable hashing means the oracle rebuilds both
    sketches and lands on the bit-identical estimate."""
    from taxi_data_pipeline_pset2_spark.operators.cms import (
        cms_join_size,
        cms_sketch,
    )

    sa = cms_sketch(
        t(spark, sf_dir, "orders"), "o_orderkey", width=65536, depth=4
    )
    sb = cms_sketch(
        t(spark, sf_dir, "lineitem"), "l_orderkey", width=65536, depth=4
    )
    return cms_join_size(sa, sb, depth=4)


_KMV_K = 256
_KMV_ORACLE = f"""
    WITH ha AS (
      SELECT DISTINCT CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                          1, 8) AS BIGINT) AS h
      FROM orders
      WHERE o_custkey IS NOT NULL
        AND extract(year FROM o_orderdate) = 1997
    ),
    hb AS (
      SELECT DISTINCT CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                          1, 8) AS BIGINT) AS h
      FROM orders
      WHERE o_custkey IS NOT NULL
        AND extract(year FROM o_orderdate) = 1998
    ),
    ska AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
    skb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
    sku AS (SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
            ORDER BY h LIMIT {_KMV_K}),
    ea AS (SELECT count(*) AS nk, max(h) AS hk FROM ska),
    eb AS (SELECT count(*) AS nk, max(h) AS hk FROM skb),
    eu AS (SELECT count(*) AS nk, max(h) AS hk FROM sku),
    bo AS (SELECT count(*) AS c FROM sku
           WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb))
    SELECT
      round(CASE WHEN ea.nk >= {_KMV_K}
            THEN ({_KMV_K - 1}.0 * 4294967296.0) / CAST(ea.hk AS DOUBLE)
            ELSE CAST(ea.nk AS DOUBLE) END, 6) AS est_a,
      round(CASE WHEN eb.nk >= {_KMV_K}
            THEN ({_KMV_K - 1}.0 * 4294967296.0) / CAST(eb.hk AS DOUBLE)
            ELSE CAST(eb.nk AS DOUBLE) END, 6) AS est_b,
      round(CASE WHEN eu.nk >= {_KMV_K}
            THEN ({_KMV_K - 1}.0 * 4294967296.0) / CAST(eu.hk AS DOUBLE)
            ELSE CAST(eu.nk AS DOUBLE) END, 6) AS est_union,
      round(bo.c / CAST(eu.nk AS DOUBLE), 6) AS jaccard,
      round((bo.c / CAST(eu.nk AS DOUBLE))
            * round(CASE WHEN eu.nk >= {_KMV_K}
                    THEN ({_KMV_K - 1}.0 * 4294967296.0)
                         / CAST(eu.hk AS DOUBLE)
                    ELSE CAST(eu.nk AS DOUBLE) END, 6), 6)
        AS est_intersection
    FROM ea, eb, eu, bo
"""


# Rollup sketch size: small enough that BOTH grains fill on the test
# corpus (~150 weekly / ~100 daily distinct users), so the (k-1)*M/h_k
# estimator path is exercised, not just the exact-count fallback.
_KMV_ROLLUP_K = 32

_KMV_ROLLUP_ORACLE = f"""
    WITH ev AS (
      SELECT DISTINCT
             strftime(CAST(ts AS DATE)
                      - CAST(((CAST(ts AS DATE) - DATE '1970-01-05') % 7 + 7)
                             % 7 AS INTEGER), '%Y-%m-%d') AS week,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) AS h
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    daily AS (
      SELECT week, day, h FROM (
        SELECT week, day, h,
               row_number() OVER (PARTITION BY week, day ORDER BY h) AS r
        FROM ev) WHERE r <= {_KMV_ROLLUP_K}
    ),
    merged AS (
      SELECT week, h FROM (
        SELECT week, h, row_number() OVER (PARTITION BY week ORDER BY h) AS r
        FROM (SELECT DISTINCT week, h FROM daily)) WHERE r <= {_KMV_ROLLUP_K}
    ),
    direct AS (
      SELECT week, h FROM (
        SELECT week, h, row_number() OVER (PARTITION BY week ORDER BY h) AS r
        FROM (SELECT DISTINCT week, h FROM ev)) WHERE r <= {_KMV_ROLLUP_K}
    ),
    em AS (SELECT week, count(*) AS nk, max(h) AS hk FROM merged GROUP BY week),
    ed AS (SELECT week, count(*) AS nk, max(h) AS hk FROM direct GROUP BY week),
    nd AS (SELECT week, CAST(count(DISTINCT day) AS BIGINT) AS n_days
           FROM ev GROUP BY week)
    SELECT nd.week, nd.n_days,
           round(CASE WHEN ed.nk >= {_KMV_ROLLUP_K}
                 THEN ({_KMV_ROLLUP_K - 1}.0 * 4294967296.0)
                      / CAST(ed.hk AS DOUBLE)
                 ELSE CAST(ed.nk AS DOUBLE) END, 6) AS est_direct,
           round(CASE WHEN em.nk >= {_KMV_ROLLUP_K}
                 THEN ({_KMV_ROLLUP_K - 1}.0 * 4294967296.0)
                      / CAST(em.hk AS DOUBLE)
                 ELSE CAST(em.nk AS DOUBLE) END, 6) AS est_merged
    FROM nd JOIN em ON em.week = nd.week JOIN ed ON ed.week = nd.week
    ORDER BY nd.week
"""


@query(
    "kmv_rollup_weekly_users",
    oracle=_KMV_ROLLUP_ORACLE,
    tags=("sketch", "agg", "timeseries"),
)
def kmv_rollup_weekly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-user sketch rollup on a PORTABLE sketch
    (r9, net-new #3): per-day KMV partials of user_id merge up to
    weekly estimates by the exact k-smallest-of-union rule
    (operators/kmv.py kmv_grouped_sketch / kmv_rollup) -- the same
    merge-partials-never-rescan-raw pattern as the HLL-based
    sketch_rollup_daily_users, but with a deterministic md5 sketch, so
    the ENTIRE rollup is hash-verified: each week's row carries BOTH
    the merged-from-daily estimate and the direct-build estimate, and
    the oracle reproduces both -- merged == direct is KMV's
    mergeability identity, proven inside both engines on every driver
    run rather than asserted in a unit test. k=32 so both grains fill
    on the test corpus and the (k-1)*M/h_k estimator path is the one
    under test."""
    from taxi_data_pipeline_pset2_spark.operators.kmv import (
        kmv_grouped_estimate,
        kmv_grouped_sketch,
        kmv_rollup,
    )

    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    day = F.to_date("ts")
    monday = F.date_sub(
        day,
        (
            (F.datediff(day, F.lit("1970-01-05").cast("date")) % 7) + 7
        )
        % 7,
    )
    base = ev.select(
        F.date_format(monday, "yyyy-MM-dd").alias("week"),
        F.date_format(day, "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    daily = kmv_grouped_sketch(base, "user_id", ["week", "day"], _KMV_ROLLUP_K)
    est_m = kmv_grouped_estimate(
        kmv_rollup(daily, ["week"], _KMV_ROLLUP_K), ["week"], _KMV_ROLLUP_K
    ).select("week", F.col("est_distinct").alias("est_merged"))
    est_d = kmv_grouped_estimate(
        kmv_grouped_sketch(base, "user_id", ["week"], _KMV_ROLLUP_K),
        ["week"],
        _KMV_ROLLUP_K,
    ).select("week", F.col("est_distinct").alias("est_direct"))
    n_days = base.select("week", "day").distinct().groupBy("week").agg(
        F.count("*").cast("bigint").alias("n_days")
    )
    return (
        n_days.join(est_d, "week")
        .join(est_m, "week")
        .select("week", "n_days", "est_direct", "est_merged")
        .orderBy("week")
    )


@query("kmv_customer_overlap", oracle=_KMV_ORACLE, tags=("sketch", "agg"))
def kmv_customer_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-customer overlap between the 1997 and 1998 order
    cohorts from two 256-row KMV sketches (operators/kmv.py):
    coordinated-sample union/Jaccard/intersection estimates -- the set
    operations HLL cannot answer -- at k rows per side regardless of
    cardinality. Deterministic portable hashing: the oracle rebuilds
    both sketches and every estimate bit-exactly."""
    from taxi_data_pipeline_pset2_spark.operators.kmv import (
        kmv_set_estimates,
        kmv_sketch,
    )

    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1997)
    b = o.filter(F.year("o_orderdate") == 1998)
    return kmv_set_estimates(
        kmv_sketch(a, "o_custkey", _KMV_K),
        kmv_sketch(b, "o_custkey", _KMV_K),
        _KMV_K,
    )


_KS_ORACLE = """
    WITH base AS (
      SELECT o_orderstatus AS status, CAST(o_totalprice AS DOUBLE) AS v,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS f
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL
    ),
    per_v AS (
      SELECT status, v,
             CAST(count(*) FILTER (f) AS BIGINT) AS ca,
             CAST(count(*) FILTER (NOT f) AS BIGINT) AS cb
      FROM base GROUP BY 1, 2
    ),
    cum AS (
      SELECT status,
             sum(ca) OVER wc AS cuma, sum(cb) OVER wc AS cumb,
             sum(ca) OVER wa AS na, sum(cb) OVER wa AS nb
      FROM per_v
      WINDOW wc AS (PARTITION BY status ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wa AS (PARTITION BY status)
    ),
    agg AS (
      SELECT status,
             CAST(max(na) AS BIGINT) AS n_a,
             CAST(max(nb) AS BIGINT) AS n_b,
             max(CASE WHEN na > 0 AND nb > 0 THEN
                 abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
                     - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE)) END) AS d
      FROM cum GROUP BY status
    )
    SELECT status, n_a, n_b,
           round(CASE WHEN n_a > 0 AND n_b > 0 THEN d END, 6) AS ks_d,
           round(CASE WHEN n_a > 0 AND n_b > 0 THEN
                 d * sqrt(CAST(n_a * n_b AS DOUBLE)
                          / CAST(n_a + n_b AS DOUBLE)) END, 6) AS ks_lambda
    FROM agg ORDER BY status
"""


@query("ks_price_by_urgency", oracle=_KS_ORACLE, tags=("drift", "stats", "window", "bench"))
def ks_price_by_urgency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov comparison of order value,
    urgent (1-URGENT/2-HIGH) vs standard priorities, per order status
    (operators/drift.py ks_statistic): the binning-free shape test next
    to psi_numeric's binned PSI -- cumulative CDF gaps over the
    distinct-value frame, never a raw-row sort."""
    from taxi_data_pipeline_pset2_spark.operators.drift import ks_statistic

    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull()
    )
    flagged = o.select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("v"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("urgent"),
    )
    return ks_statistic(flagged, "v", "urgent", ["status"])


_SEASONAL_OUTLIER_ORACLE = f"""
    WITH {_DAILY_SER_SQL},
    tr AS (
      SELECT t, value,
             CASE WHEN count(*) OVER wm = 7
                  THEN CAST(sum(value) OVER wm AS BIGINT) END AS tsum
      FROM ser
      WINDOW wm AS (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (SELECT t, value, tsum,
                   value * 7 - tsum AS detp, t % 7 AS ph
            FROM tr),
    phs AS (SELECT ph, CAST(sum(detp) AS BIGINT) AS ps,
                   CAST(count(*) AS BIGINT) AS pc
            FROM det WHERE tsum IS NOT NULL GROUP BY ph),
    dec_ AS (
      SELECT t, value,
             round(CASE WHEN tsum IS NOT NULL AND ps IS NOT NULL
                   THEN value - CAST(tsum AS DOUBLE) / 7
                        - CAST(ps AS DOUBLE) / CAST(pc * 7 AS DOUBLE)
                   END, 6) AS resid
      FROM det LEFT JOIN phs USING (ph)
    ),
    med AS (SELECT quantile_cont(resid, 0.5) AS m FROM dec_
            WHERE resid IS NOT NULL),
    mad AS (SELECT quantile_cont(abs(resid - med.m), 0.5) AS mad
            FROM dec_, med WHERE resid IS NOT NULL)
    SELECT t, value, resid,
           round((resid - med.m) / (1.4826 * mad.mad), 6) AS mad_score
    FROM dec_, med, mad
    WHERE resid IS NOT NULL AND mad.mad > 0
      AND abs((resid - med.m) / (1.4826 * mad.mad)) > 3.0
    ORDER BY t
"""


@query("seasonal_outlier_days", oracle=_SEASONAL_OUTLIER_ORACLE, tags=("timeseries", "window"))
def seasonal_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted demand anomalies: days whose decomposition
    residual sits more than 3 robust sigmas (MAD * 1.4826) from the
    median residual -- the composition of this round's
    seasonal_decompose with the robust-outlier discipline
    (operators/robust.py, operators/timeseries.py hampel_outliers):
    de-trend and de-season FIRST, or every holiday week flags its
    whole neighborhood."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        seasonal_decompose,
    )

    dec = seasonal_decompose(
        _daily_order_series(spark, sf_dir), "t", "value", period=7
    ).filter(F.col("resid").isNotNull())
    med = dec.agg(F.expr("percentile(resid, 0.5)").alias("_m"))
    dec_m = dec.crossJoin(F.broadcast(med))
    mad = dec_m.agg(
        F.expr("percentile(abs(resid - _m), 0.5)").alias("_mad")
    )
    scored = dec_m.crossJoin(F.broadcast(mad)).withColumn(
        "mad_score",
        F.round(
            (F.col("resid") - F.col("_m")) / (1.4826 * F.col("_mad")), 6
        ),
    )
    return (
        scored.filter(
            (F.col("_mad") > 0)
            & (
                F.abs(
                    (F.col("resid") - F.col("_m"))
                    / (1.4826 * F.col("_mad"))
                )
                > 3.0
            )
        )
        .select("t", "value", "resid", "mad_score")
        .orderBy("t")
    )


_KANON_ORACLE = """
    SELECT c_mktsegment AS segment, c_nationkey AS nation,
           CAST(count(*) AS BIGINT) AS n
    FROM customer
    GROUP BY 1, 2
    HAVING count(*) < 5
    ORDER BY n, segment, nation
"""


@query("k_anonymity_audit", oracle=_KANON_ORACLE, tags=("privacy", "agg"))
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifier cohorts smaller than k=5 over (segment, nation)
    (operators/privacy.py k_anonymity): each row is a re-identifiable
    cohort the release must generalize or suppress -- Sweeney's
    criterion as a violating-rows audit, one hash aggregate."""
    from taxi_data_pipeline_pset2_spark.operators.privacy import k_anonymity

    c = t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
    )
    return k_anonymity(c, ["segment", "nation"], k=5)


_PSEUDO_ORACLE = """
    SELECT c_custkey,
           substr(md5('r7salt:' || c_name), 1, 16) AS c_name,
           c_mktsegment
    FROM customer
    WHERE c_custkey <= 200
    ORDER BY c_custkey
"""


@query("pseudonymized_customers", oracle=_PSEUDO_ORACLE, tags=("privacy",))
def pseudonymized_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic salted pseudonymization of customer names
    (operators/privacy.py pseudonymize): equal names -> equal tokens,
    so joins and aggregates survive tokenization; rotating the salt
    rotates the pseudonym space between releases. Scan-shaped,
    codegen-only."""
    from taxi_data_pipeline_pset2_spark.operators.privacy import pseudonymize

    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select("c_custkey", "c_name", "c_mktsegment")
    )
    return pseudonymize(c, ["c_name"], salt="r7salt", length=16).orderBy(
        "c_custkey"
    )


_CHECKSUM_ORACLE = """
    WITH enc AS (
      SELECT CASE WHEN o_orderkey IS NULL THEN 'N'
                  ELSE len(CAST(o_orderkey AS VARCHAR)) || ':'
                       || CAST(o_orderkey AS VARCHAR) END AS e1,
             CASE WHEN o_custkey IS NULL THEN 'N'
                  ELSE len(CAST(o_custkey AS VARCHAR)) || ':'
                       || CAST(o_custkey AS VARCHAR) END AS e2,
             CASE WHEN o_orderstatus IS NULL THEN 'N'
                  ELSE len(o_orderstatus) || ':' || o_orderstatus END AS e3,
             CASE WHEN o_orderpriority IS NULL THEN 'N'
                  ELSE len(o_orderpriority) || ':' || o_orderpriority END AS e4
      FROM orders
    ),
    fp AS (
      SELECT CAST('0x' || substr(md5(concat_ws(chr(1), e1, e2, e3, e4)),
               1, 15) AS BIGINT) AS h
      FROM enc
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(h AS DECIMAL(38,0)))
                % CAST(9223372036854775808 AS DECIMAL(38,0)) AS BIGINT)
             AS checksum
    FROM fp
"""


@query("orders_table_checksum", oracle=_CHECKSUM_ORACLE, tags=("audit", "agg"))
def orders_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order/partitioning-independent reconciliation checksum of the
    orders key columns (operators/audit.py table_checksum): two systems
    agree iff their (n_rows, checksum) pairs agree -- the oracle IS the
    other system here, computing the identical portable-md5 checksum in
    DuckDB. One scan, one aggregate, one row."""
    from taxi_data_pipeline_pset2_spark.operators.audit import table_checksum

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    return table_checksum(o)


_HASHED_FEAT_ORACLE = """
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents WHERE text IS NOT NULL
    ),
    ne AS (SELECT id, tok FROM toks WHERE tok != ''),
    hashed AS (
      SELECT id,
             CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 512
                  AS INTEGER) AS idx,
             CASE WHEN CAST('0x' || substr(md5(tok), 9, 1) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS c
      FROM ne
    )
    SELECT id, idx, CAST(sum(c) AS BIGINT) AS weight
    FROM hashed GROUP BY id, idx
    HAVING sum(c) != 0
    ORDER BY id, idx
"""


@query("hashed_doc_features", oracle=_HASHED_FEAT_ORACLE, tags=("ml", "text", "agg"))
def hashed_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed hashing-trick features over documents (operators/encoding
    .py hashed_features, dim 512): the vocabulary-free text vectorizer
    -- no dictionary pass, no fitting, fixed dimension at any corpus
    size; the sign bit zero-means collision noise. Sparse relational
    output (id, idx, weight), bit-identical in the oracle."""
    from taxi_data_pipeline_pset2_spark.operators.encoding import (
        hashed_features,
    )

    return hashed_features(
        t(spark, sf_dir, "documents"), "text", "doc_id", dim=512
    )


_MODE_ORACLE = """
    WITH counts AS (
      SELECT o_orderstatus AS status, o_orderpriority AS v,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ),
    rk AS (
      SELECT status, v, n,
             row_number() OVER (PARTITION BY status
                                ORDER BY n DESC, v ASC NULLS LAST) AS r
      FROM counts
    )
    SELECT status, v AS mode, n AS n_mode
    FROM rk WHERE r = 1 ORDER BY status
"""


@query("modal_priority_by_status", oracle=_MODE_ORACLE, tags=("agg",))
def modal_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: the most frequent order priority per status
    (operators/frequency.py mode_by) with smallest-value tie-break --
    Spark's built-in mode() is tie-nondeterministic, which disqualifies
    it from hash-verified pipelines. Value-vocabulary aggregate +
    argmax window."""
    from taxi_data_pipeline_pset2_spark.operators.frequency import mode_by

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("v"),
    )
    return mode_by(o, "v", ["status"])


_TWAP_ORACLE = """
    WITH base AS (
      SELECT user_id,
             CAST(epoch_ms(ts) // 1000 AS BIGINT) AS s,
             CAST(value AS DECIMAL(28,6)) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    seg AS (
      SELECT user_id, v,
             lead(s) OVER (PARTITION BY user_id ORDER BY s, v) - s AS dur
      FROM base
    ),
    agg AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_obs,
             CAST(sum(dur) AS BIGINT) AS span_s,
             sum(CAST(v * dur AS DECIMAL(38,6))) AS integral
      FROM seg GROUP BY user_id
    )
    SELECT user_id, n_obs,
           CAST(coalesce(span_s, 0) AS BIGINT) AS span_s,
           round(CASE WHEN span_s > 0
                 THEN CAST(integral AS DOUBLE) / CAST(span_s AS DOUBLE)
                 END, 6) AS twa
    FROM agg ORDER BY user_id
"""


@query("user_value_twap", oracle=_TWAP_ORACLE, tags=("timeseries", "window"))
def user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average event value per user
    (operators/timeseries.py time_weighted_avg): each reading holds
    until the next, so burst sampling doesn't over-weight the mean --
    the TWAP/telemetry-correct aggregate over irregular series. Exact
    decimal value x integer-second integration."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        time_weighted_avg,
    )

    return time_weighted_avg(
        t(spark, sf_dir, "events"), ["user_id"], "ts", "value"
    )


_LTV_ORACLE = """
    WITH base AS (
      SELECT o_custkey AS u,
             CAST(12 * extract(year FROM o_orderdate)
                  + extract(month FROM o_orderdate) AS INTEGER) AS m,
             CAST(o_totalprice AS DECIMAL(18,2)) AS v
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        AND o_totalprice IS NOT NULL
    ),
    cohorts AS (SELECT u, min(m) AS cohort FROM base GROUP BY u),
    sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
              FROM cohorts GROUP BY cohort),
    rev AS (
      SELECT c.cohort, b.m - c.cohort AS age_months, sum(b.v) AS r
      FROM base b JOIN cohorts c ON b.u = c.u
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort, age_months,
             sum(r) OVER (PARTITION BY cohort ORDER BY age_months
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_r
      FROM rev
    )
    SELECT cum.cohort AS cohort_month,
           CAST(age_months AS INTEGER) AS age_months,
           n_customers,
           CAST(cum_r AS DOUBLE) AS cum_revenue,
           round(CAST(cum_r AS DOUBLE) / CAST(n_customers AS DOUBLE), 6)
             AS ltv_per_customer
    FROM cum JOIN sizes ON cum.cohort = sizes.cohort
    ORDER BY cohort_month, age_months
"""


@query("cohort_ltv_curves", oracle=_LTV_ORACLE, tags=("retention", "window"))
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV per first-order cohort (operators/retention.py
    cohort_ltv): monthly cohorts, exact decimal revenue accumulation,
    fixed cohort-size denominators -- the money-weighted companion to
    cohort_retention_weekly."""
    from taxi_data_pipeline_pset2_spark.operators.retention import cohort_ltv

    return cohort_ltv(
        t(spark, sf_dir, "orders"), "o_custkey", "o_orderdate", "o_totalprice"
    )


_INTERP_ORACLE = """
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS b,
             CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*)
               AS obs
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(b) AS lo, max(b) AS hi FROM obs GROUP BY 1
    ),
    spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                  AS TIMESTAMP) AS b
      FROM bounds
    ),
    j AS (
      SELECT s.user_id, s.b, obs,
             CAST(epoch_ms(s.b) // 1000 // 3600 AS BIGINT) AS idx
      FROM spine s LEFT JOIN obs
        ON obs.user_id = s.user_id AND obs.b = s.b
    ),
    nb AS (
      SELECT user_id, b, obs, idx,
             last_value(CASE WHEN obs IS NOT NULL THEN obs END IGNORE NULLS)
               OVER wp AS pv,
             last_value(CASE WHEN obs IS NOT NULL THEN idx END IGNORE NULLS)
               OVER wp AS pt,
             first_value(CASE WHEN obs IS NOT NULL THEN obs END IGNORE NULLS)
               OVER wn AS nv,
             first_value(CASE WHEN obs IS NOT NULL THEN idx END IGNORE NULLS)
               OVER wn AS nt
      FROM j
      WINDOW wp AS (PARTITION BY user_id ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY b
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(b, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(round((CASE WHEN obs IS NOT NULL THEN obs
                 WHEN pv IS NOT NULL AND nv IS NOT NULL
                 THEN pv + (nv - pv) * (CAST(idx - pt AS DOUBLE)
                                        / CAST(nt - pt AS DOUBLE))
                 END) * 1000000) AS BIGINT) / 1000000.0 AS value,
           obs IS NULL AS is_filled
    FROM nb ORDER BY user_id, ts
"""


@query("hourly_value_interpolated", oracle=_INTERP_ORACLE, tags=("timeseries", "window"))
def hourly_value_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user value grid with LINEAR interpolation across
    empty buckets (operators/timeseries.py resample_interpolate): the
    smooth sibling of hourly_value_locf for continuously-varying
    measurements; leading/trailing gaps stay NULL rather than
    extrapolate."""
    from taxi_data_pipeline_pset2_spark.operators.timeseries import (
        resample_interpolate,
    )

    out = resample_interpolate(
        t(spark, sf_dir, "events"), ["user_id"], "ts", "value", "1 hour"
    )
    return out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "value",
        "is_filled",
    ).orderBy("user_id", "ts")


_MISSING_SEQ_ORACLE = """
    WITH vals AS (
      SELECT DISTINCT o_custkey AS k, o_orderkey AS s
      FROM orders WHERE o_orderkey IS NOT NULL
    ),
    g AS (
      SELECT k, s,
             lead(s) OVER (PARTITION BY k ORDER BY s) AS nxt
      FROM vals
    )
    SELECT k AS o_custkey,
           CAST(s + 1 AS BIGINT) AS gap_start,
           CAST(nxt - 1 AS BIGINT) AS gap_end,
           CAST(nxt - s - 1 AS BIGINT) AS n_missing
    FROM g WHERE nxt > s + 1 AND k <= 20
    ORDER BY o_custkey, gap_start
"""


@query("order_sequence_gaps", oracle=_MISSING_SEQ_ORACLE, tags=("quality", "window"))
def order_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing ranges in each customer's order-key sequence
    (quality.py missing_ranges, first 20 customers): the completeness
    audit for offset/invoice/version columns -- gaps from a lead()
    window over DISTINCT observed values, never a generated full-range
    spine."""
    from taxi_data_pipeline_pset2_spark.quality import missing_ranges

    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    return missing_ranges(o, "o_orderkey", ["o_custkey"])


_SRM_ORACLE = """
    WITH units AS (SELECT DISTINCT user_id FROM events
                   WHERE user_id IS NOT NULL),
    assigned AS (
      SELECT CASE WHEN CAST('0x' || substr(md5('exp7:' ||
                        CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
                        % 1000000 < 500000
             THEN 'control' ELSE 'treatment' END AS variant
      FROM units
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (variant = 'control') AS BIGINT) AS c0,
             CAST(count(*) FILTER (variant = 'treatment') AS BIGINT) AS c1
      FROM assigned
    )
    SELECT n,
           round(CASE WHEN n > 0 THEN
             (CAST(c0 AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
             * (CAST(c0 AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
             / (CAST(n AS DOUBLE) * 0.5)
             + (CAST(c1 AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
             * (CAST(c1 AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
             / (CAST(n AS DOUBLE) * 0.5) END, 6) AS chi2,
           CAST(1 AS INTEGER) AS df
    FROM c
"""


@query("variant_assignment_srm", oracle=_SRM_ORACLE, tags=("experiment", "agg"))
def variant_assignment_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 50/50 variant assignment of event users + the
    sample-ratio-mismatch guardrail (operators/experiment.py): the
    check that must pass before the A/B stats family (Welch, CUPED,
    Mann-Whitney) reads anything -- chi2 far above the 1-dof critical
    value means the assignment or logging drops units. Portable hash
    assignment: the oracle reproduces every unit's variant."""
    from taxi_data_pipeline_pset2_spark.operators.experiment import (
        assign_variants,
        srm_check,
    )

    units = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
    )
    assigned = assign_variants(
        units, "user_id", {"control": 0.5, "treatment": 0.5}, salt="exp7"
    )
    return srm_check(assigned, {"control": 0.5, "treatment": 0.5})


_RATIO_ORACLE = """
    WITH base AS (
      SELECT user_id,
             CASE WHEN CAST('0x' || substr(md5('exp7:' ||
                       CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
                       % 1000000 < 500000
             THEN 'control' ELSE 'treatment' END AS variant,
             event_type
      FROM events WHERE user_id IS NOT NULL
    ),
    per_unit AS (
      SELECT variant, user_id,
             CAST(count(*) FILTER (event_type = 'click')
                  AS DECIMAL(28,6)) AS x,
             CAST(count(*) FILTER (event_type = 'view')
                  AS DECIMAL(28,6)) AS y
      FROM base GROUP BY 1, 2
    ),
    agg AS (
      SELECT variant,
             CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE) AS syy
      FROM per_unit GROUP BY 1
    )
    SELECT variant, n_units,
           round(CASE WHEN sy > 0 THEN sx / sy END, 6) AS ratio,
           round(CASE WHEN n_units >= 2 AND sy > 0 AND
                 ((sxx - n_units * (sx / n_units) * (sx / n_units)) / (n_units - 1)
                  - 2 * (sx / sy) * ((sxy - n_units * (sx / n_units) * (sy / n_units)) / (n_units - 1))
                  + (sx / sy) * (sx / sy) * ((syy - n_units * (sy / n_units) * (sy / n_units)) / (n_units - 1)))
                 / (n_units * (sy / n_units) * (sy / n_units)) >= 0
                 THEN sqrt(
                 ((sxx - n_units * (sx / n_units) * (sx / n_units)) / (n_units - 1)
                  - 2 * (sx / sy) * ((sxy - n_units * (sx / n_units) * (sy / n_units)) / (n_units - 1))
                  + (sx / sy) * (sx / sy) * ((syy - n_units * (sy / n_units) * (sy / n_units)) / (n_units - 1)))
                 / (n_units * (sy / n_units) * (sy / n_units)))
                 END, 6) AS se
    FROM agg ORDER BY variant
"""


@query("ctr_ratio_delta", oracle=_RATIO_ORACLE, tags=("experiment", "agg"))
def ctr_ratio_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks-per-view ratio with delta-method standard errors per
    assigned variant (operators/experiment.py ratio_metric_delta
    composing assign_variants): the correct uncertainty for CTR-style
    metrics -- row-level tests ignore within-user correlation, per-user
    ratio averages over-weight tiny denominators; the delta method
    over unit-level sums fixes both (Deng et al. 2017)."""
    from taxi_data_pipeline_pset2_spark.operators.experiment import (
        assign_variants,
        ratio_metric_delta,
    )

    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    assigned = assign_variants(
        ev, "user_id", {"control": 0.5, "treatment": 0.5}, salt="exp7"
    ).select(
        "variant",
        "user_id",
        (F.col("event_type") == "click").cast("int").alias("is_click"),
        (F.col("event_type") == "view").cast("int").alias("is_view"),
    )
    return ratio_metric_delta(
        assigned, "user_id", "is_click", "is_view", ["variant"]
    )


_STORAGE_ORACLE = """
    SELECT path_in_schema AS column,
           CAST(count(*) AS BIGINT) AS n_row_groups,
           CAST(sum(total_compressed_size) AS BIGINT) AS compressed_bytes,
           CAST(sum(total_uncompressed_size) AS BIGINT)
             AS uncompressed_bytes,
           round(CASE WHEN sum(total_compressed_size) > 0
                 THEN CAST(sum(total_uncompressed_size) AS DOUBLE)
                      / CAST(sum(total_compressed_size) AS DOUBLE)
                 END, 6) AS compression_ratio
    FROM parquet_metadata('/root/testdata/sf0.01/lineitem.parquet')
    GROUP BY 1 ORDER BY 1
"""


@query(
    "lineitem_storage_report",
    oracle=_STORAGE_ORACLE,
    tags=("profiling", "storage"),
)
def lineitem_storage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column parquet storage audit of the fact table from footers
    only (operators/storage.py column_storage_report): compressed /
    uncompressed bytes and compression ratio per column, no data pages
    read -- the size-side feedback the clustered/Z-order layout
    machinery doesn't give. Footer reads distribute over the file
    list via mapInPandas; the oracle is DuckDB's own parquet_metadata
    parser agreeing on every byte."""
    from taxi_data_pipeline_pset2_spark.operators.storage import (
        column_storage_report,
    )

    # pinned to the sf0.01 file on BOTH sides: oracle strings are static
    # SQL (no sf_dir templating in the driver contract), and DuckDB's
    # parquet_metadata needs the literal path -- the one catalog entry
    # whose subject is a specific physical artifact, not a logical table
    del sf_dir
    return column_storage_report(
        spark, "/root/testdata/sf0.01/lineitem.parquet"
    )


_MIXDEC_ORACLE = """
    WITH b AS (
      SELECT o_orderpriority AS seg, CAST(count(*) AS BIGINT) AS n_base,
             CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sb
      FROM orders
      WHERE extract(year FROM o_orderdate) = 1997
        AND o_totalprice IS NOT NULL
      GROUP BY 1
    ),
    c AS (
      SELECT o_orderpriority AS seg, CAST(count(*) AS BIGINT) AS n_comp,
             CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sc
      FROM orders
      WHERE extract(year FROM o_orderdate) = 1998
        AND o_totalprice IS NOT NULL
      GROUP BY 1
    ),
    j AS (
      SELECT coalesce(b.seg, c.seg) AS segment,
             CAST(coalesce(n_base, 0) AS BIGINT) AS n_base,
             CAST(coalesce(n_comp, 0) AS BIGINT) AS n_comp,
             coalesce(sb, 0.0) AS sb, coalesce(sc, 0.0) AS sc
      FROM b FULL OUTER JOIN c ON b.seg IS NOT DISTINCT FROM c.seg
    ),
    tot AS (
      SELECT CAST(sum(n_base) AS DOUBLE) AS tb,
             CAST(sum(n_comp) AS DOUBLE) AS tc
      FROM j
    ),
    e AS (
      SELECT segment, n_base, n_comp,
             CASE WHEN n_base > 0
                  THEN sb / CAST(n_base AS DOUBLE) END AS m_b,
             CASE WHEN n_comp > 0
                  THEN sc / CAST(n_comp AS DOUBLE) END AS m_c,
             CAST(n_base AS DOUBLE) / tb AS w_b,
             CAST(n_comp AS DOUBLE) / tc AS w_c
      FROM j, tot
    ),
    f AS (
      SELECT segment, n_base, n_comp, m_b, m_c, w_b, w_c,
             coalesce(m_b, m_c) AS mb, coalesce(m_c, m_b) AS mc
      FROM e
    )
    SELECT segment, n_base, n_comp,
           round(m_b, 6) AS mean_base,
           round(m_c, 6) AS mean_comp,
           round(w_b * (mc - mb), 6) AS within_effect,
           round((w_c - w_b) * mb, 6) AS mix_effect,
           round((w_c - w_b) * (mc - mb), 6) AS interaction
    FROM f ORDER BY segment
"""


@query("aov_mix_decomposition", oracle=_MIXDEC_ORACLE, tags=("stats", "agg"))
def aov_mix_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why average order value moved 1997 -> 1998, per priority
    (operators/stats.py mix_decomposition): the Oaxaca-Blinder /
    price-volume-mix split of the mean change into within-segment,
    mix-shift and interaction effects -- the Simpson's-paradox guard
    (an average can fall while every segment improves; this says so).
    The three effect columns sum exactly to the overall change."""
    from taxi_data_pipeline_pset2_spark.operators.stats import (
        mix_decomposition,
    )

    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    base = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_orderpriority").alias("seg"),
        F.col("o_totalprice").alias("v"),
    )
    comp = o.filter(F.year("o_orderdate") == 1998).select(
        F.col("o_orderpriority").alias("seg"),
        F.col("o_totalprice").alias("v"),
    )
    return mix_decomposition(base, comp, "seg", "v")
