"""Text-analysis catalog entries over ``documents`` (SURVEY.md 2b):
quality scoring, language ID, token counting, fingerprinting, profiling,
plus the multimodal binary-column metadata path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from taxi_data_pipeline_pset2_spark.operators.text import (
    LANG_MARKERS,
    TOKEN_REGEX,
    fingerprint_columns,
    language_id,
    quality_metrics,
    token_count_bpe,
    token_count_ws,
)
from taxi_data_pipeline_pset2_spark.operators.dedup import tokenize
from taxi_data_pipeline_pset2_spark.queries._helpers import t
from taxi_data_pipeline_pset2_spark.queries.catalog import query


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "text_quality",
    oracle=f"""
        WITH tk AS (SELECT doc_id, text,
                           string_split_regex(trim(lower(text)), '\\s+') AS toks
                    FROM documents),
        m AS (SELECT doc_id, text, toks,
                     CAST(round(CAST(len(list_filter(toks,
                          x -> list_contains({_sql_list(LANG_MARKERS['en'])}, x))) AS DOUBLE)
                          * 1000000 / len(toks)) AS BIGINT) AS stop_m,
                     CAST(round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                          * 1000000 / length(text)) AS BIGINT) AS alpha_m,
                     least(CAST(1000000 AS BIGINT), CAST(len(toks) * 10000 AS BIGINT)) AS length_m
              FROM tk)
        SELECT doc_id,
               CAST(length(text) AS INT) AS n_chars,
               CAST(len(toks) AS INT) AS n_tokens,
               ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                     / len(toks), 6) AS avg_token_len,
               CAST(stop_m AS DOUBLE) / 1000000 AS stopword_ratio,
               CAST(alpha_m AS DOUBLE) / 1000000 AS alpha_ratio,
               CAST(4 * stop_m + 3 * length_m + 3 * alpha_m AS DOUBLE) / 10000000 AS quality_score
        FROM m
    """,
    tags=("bench", "text"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features (length/stopword/char-class ratios) +
    composite score -- the heuristic quality-filter stage of a pretraining
    data pipeline."""
    return quality_metrics(t(spark, sf_dir, "documents"))


def _langid_oracle() -> str:
    scores = ",\n               ".join(
        f"CAST(len(list_filter(toks, x -> list_contains({_sql_list(ws)}, x))) AS INT)"
        f" AS score_{lang}"
        for lang, ws in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"score_{lang} >= score_{other}" for other in langs[i + 1 :]
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = (
        f"CASE WHEN score_{langs[0]} IS NULL THEN NULL "
        + " ".join(cases)
        + f" ELSE '{langs[-1]}' END"
    )
    return f"""
        WITH tk AS (SELECT doc_id, lang AS lang_labeled,
                           string_split_regex(trim(lower(text)), '\\s+') AS toks
                    FROM documents),
        s AS (SELECT doc_id, lang_labeled,
               {scores}
              FROM tk)
        SELECT doc_id, lang_labeled, score_en, score_es, score_de, score_zh,
               {case_sql} AS pred_lang,
               ({case_sql}) = lang_labeled AS is_match
        FROM s
    """


@query("lang_id", oracle=_langid_oracle(), tags=("text",))
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic: occurrence counts per language
    table, argmax with deterministic tie-break, compared against the
    labeled ``lang`` column."""
    return language_id(t(spark, sf_dir, "documents"))


@query(
    "token_fingerprints",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_REGEX}')) AS INT) AS n_bpe_tokens,
               CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS INT)
                   AS n_distinct_tokens,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_md5,
               CAST(('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 8))
                    AS BIGINT) AS band_hash,
               length(text) // 100 AS len_bucket
        FROM documents
    """,
    tags=("text",),
)
def token_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways (whitespace split, BPE-ish regex
    pre-tokenization, distinct vocabulary size) + the fingerprint bundle
    (content md5, 32-bit band hash, length bucket -- the sharding/join-key
    toolkit for dedup at scale), one projection pass per doc. Two catalog
    entries fused so both stay inside the driver's 50-query correctness
    budget; the underlying operators (operators/text.py token_count_*,
    fingerprints) are unchanged and separately unit-tested."""
    docs = t(spark, sf_dir, "documents")
    md5_col, band_col, len_col = fingerprint_columns(F.col("text"))
    return docs.select(
        "doc_id",
        token_count_ws(F.col("text")).alias("n_ws_tokens"),
        token_count_bpe(F.col("text")).alias("n_bpe_tokens"),
        F.size(F.array_distinct(tokenize(F.col("text")))).alias("n_distinct_tokens"),
        md5_col,
        band_col,
        len_col.cast("long").alias("len_bucket"),
    )


@query(
    "docs_profile",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               count(DISTINCT source) AS n_sources,
               ROUND(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("text", "agg"),
)
def docs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling aggregate: per-language doc counts, source
    diversity, char-length stats."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


@query(
    "multimodal_metadata",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS byte_len,
               md5(text) AS payload_md5,
               substr(md5(text), 1, 2) AS shard_key
        FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary-column plumbing: payload as ``binary`` (utf-8 bytes
    stand in for image/audio blobs -- the decode libs are stubbed, see
    operators/multimodal.py), byte length, content hash, shard key.
    Proves schema/partition/hash handling of binary columns end-to-end."""
    docs = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("byte_len"),
        F.md5(payload).alias("payload_md5"),
        F.substring(F.md5(payload), 1, 2).alias("shard_key"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
        WITH v AS (SELECT doc_id AS media_id, text,
                          greatest(length(text) // 4, 1) AS step
                   FROM documents WHERE doc_id % 3 = 2),
        f AS (SELECT media_id, i AS frame_idx,
                     substr(text, i * step + 1, step) AS fr
              FROM v, (SELECT unnest(generate_series(0, 3)) AS i))
        SELECT media_id, CAST(frame_idx AS INT) AS frame_idx, sha256(fr) AS frame_sha
        FROM f
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through the real ``mapInPandas`` batch path
    (operators/multimodal.py sample_frames): 1 video -> 4 deterministic
    frame chunks. Even the Python-side "decoder" is hash-verified -- the
    oracle reproduces the byte slicing in SQL (valid because the stand-in
    payloads are ASCII; the Spark op itself is byte-correct for any
    binary)."""
    from taxi_data_pipeline_pset2_spark.operators.multimodal import (
        attach_payloads,
        sample_frames,
    )

    media = attach_payloads(t(spark, sf_dir, "documents"))
    return sample_frames(media, n_frames=4).select("media_id", "frame_idx", "frame_sha")


@query(
    "multimodal_resize",
    oracle="""
        SELECT doc_id AS media_id, CAST(16 AS INT) AS width, CAST(9 AS INT) AS height,
               sha256(substr(repeat(text, CAST(ceil(144.0 / length(text)) AS INT)),
                             1, 144)) AS resized_sha
        FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-shape media resize through ``mapInPandas`` (operators/
    multimodal.py resize_media): binary in, exactly width*height bytes
    out, Arrow-batched. The byte-cycling stand-in transform is mirrored
    in SQL (repeat + substr on the ASCII payloads), so the full Python
    batch path is hash-verified."""
    from taxi_data_pipeline_pset2_spark.operators.multimodal import (
        attach_payloads,
        resize_media,
    )

    media = attach_payloads(t(spark, sf_dir, "documents"))
    return resize_media(media, width=16, height=9).select(
        "media_id", "width", "height", F.sha2("resized", 256).alias("resized_sha")
    )


@query(
    "term_document_frequency",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS tok
            FROM documents)
        SELECT tok, count(*) AS df,
               ROUND(ln((SELECT count(*) FROM documents) * 1.0 / count(*)), 6) AS idf
        FROM toks GROUP BY tok
        ORDER BY df DESC, tok LIMIT 50
    """,
    tags=("text",),
)
def term_document_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus document frequency + IDF, top-50 terms: the inverted-index /
    TF-IDF building block (SURVEY.md 2b text analysis). Distinct tokens
    per doc -> explode -> one hash aggregate on the token; the corpus
    count is a broadcast scalar. Same single-shuffle shape at any corpus
    size."""
    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()
    return (
        docs.select(
            "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .select(
            "tok", "df", F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("idf")
        )
        .orderBy(F.desc("df"), "tok")
        .limit(50)
    )


@query(
    "tfidf_vectors",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
            FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        x AS (SELECT tf.doc_id, tf.term, tf.tf,
                     ROUND(tf.tf * ln((SELECT count(*) FROM documents) * 1.0 / dfreq.df), 6)
                         AS tf_idf
              FROM tf JOIN dfreq USING (term)),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY tf_idf DESC, term) AS rnk
              FROM x)
        SELECT doc_id, term, tf, tf_idf, CAST(rnk AS BIGINT) AS rnk
        FROM r WHERE rnk <= 5
    """,
    tags=("text",),
)
def tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF weights, top-5 terms per doc (SURVEY.md 2b: the
    HashingTF+IDF shape, built on ``term_document_frequency``'s corpus DF).

    Plan: one explode -> hash aggregate on (doc_id, term) for TF; the
    document-frequency table is a second aggregate OF THE TF TABLE (no
    second scan of the corpus); tf-idf joins the two on the term -- a
    shuffle join, because at 100 TB the vocabulary is itself too big to
    broadcast -- then a per-doc window takes the top-5 with a
    deterministic (tf_idf DESC, term) tiebreak on the rounded weight."""
    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tf_idf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf_idf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "term", "tf", "tf_idf", "rnk")
    )


# ---- inverted-index search -----------------------------------------------

_PHRASE = ("fast", "scan")
_AND_TERMS = ("spark", "join", "window")
_AND_K = 30

_PHRASE_ORACLE = f"""
    WITH tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
                FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(range(1, len(ts)),
                i -> ts[i] = '{_PHRASE[0]}' AND ts[i + 1] = '{_PHRASE[1]}')) AS BIGINT)
               AS n_occurrences
    FROM tk
    WHERE len(list_filter(range(1, len(ts)),
              i -> ts[i] = '{_PHRASE[0]}' AND ts[i + 1] = '{_PHRASE[1]}')) > 0
    ORDER BY doc_id
"""


@query("phrase_search_hits", oracle=_PHRASE_ORACLE, tags=("text", "search"))
def phrase_search_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search (operators/search.py): documents
    containing the exact token sequence, with occurrence counts from
    the positional inverted index -- term-filtered posting frames
    joined per doc, adjacency checked by a higher-order array filter
    (no UDF, no position explode)."""
    from taxi_data_pipeline_pset2_spark.operators.search import (
        inverted_index,
        search_phrase,
    )

    idx = inverted_index(t(spark, sf_dir, "documents"))
    return search_phrase(idx, list(_PHRASE))


_AND_ORACLE = f"""
    WITH tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
                FROM documents),
    hits AS (
        SELECT doc_id,
               CAST(len(list_filter(ts, x -> x IN {tuple(_AND_TERMS)})) AS BIGINT)
                   AS total_tf
        FROM tk
        WHERE {' AND '.join(f"list_contains(ts, '{w}')" for w in _AND_TERMS)}
    )
    SELECT doc_id, total_tf FROM hits
    ORDER BY total_tf DESC, doc_id
    LIMIT {_AND_K}
"""


@query("boolean_and_search", oracle=_AND_ORACLE, tags=("text", "search", "bench"))
def boolean_and_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive term search (operators/search.py): top-30 documents
    containing ALL query terms, ranked by summed term frequency. The
    index filter is a pushed-down IN predicate on the term column
    (partition-pruned on a term-bucketed index at scale); one
    postings-sized aggregate, TakeOrdered top-k."""
    from taxi_data_pipeline_pset2_spark.operators.search import (
        inverted_index,
        search_and,
    )

    idx = inverted_index(t(spark, sf_dir, "documents"))
    return search_and(idx, list(_AND_TERMS), top_k=_AND_K)


_BM25_TERMS = ("merge", "stream", "the")
_BM25_K = 30

_BM25_ORACLE = f"""
    WITH tk AS (SELECT doc_id,
                       string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') AS ts
                FROM documents),
    lens AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM tk),
    scal AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS l
             FROM lens),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(ts) AS term FROM tk)
           WHERE term IN {_BM25_TERMS}
           GROUP BY doc_id, term),
    idf AS (SELECT term,
                   CAST(round(ln(1 + ((SELECT n FROM scal) - count(*) + 0.5)
                                     / (count(*) + 0.5)) * 1000000) AS BIGINT)
                       AS idf6
            FROM tf GROUP BY term),
    c AS (SELECT tf.doc_id,
                 (2 * (22 * tf.tf * (SELECT l FROM scal) * idf.idf6)
                  + (10 * (SELECT l FROM scal) * tf.tf
                     + 3 * (SELECT l FROM scal)
                     + 9 * lens.dl * (SELECT n FROM scal)))
                 // (2 * (10 * (SELECT l FROM scal) * tf.tf
                          + 3 * (SELECT l FROM scal)
                          + 9 * lens.dl * (SELECT n FROM scal))) AS contrib6
          FROM tf JOIN idf USING (term) JOIN lens USING (doc_id))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(contrib6) AS BIGINT) AS score_micro,
           CAST(sum(contrib6) AS DOUBLE) / 1000000 AS bm25
    FROM c GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id
    LIMIT {_BM25_K}
"""


@query("bm25_topk_docs", oracle=_BM25_ORACLE, tags=("text", "search", "bench"))
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (operators/search.py bm25_topk): the
    length-normalized, idf-weighted scorer the search family lacked
    between raw-tf AND-search and TF-IDF pair cosine (SURVEY.md 2b text
    analysis; Lucene's default similarity). k1 = 6/5 and b = 3/4 are
    exact rationals, so every (doc, term) contribution is a ratio of
    exact bigints HALF_UP-divided via ``div`` and the per-doc score is
    an order-independent integer sum -- the oracle rebuilds the same
    integers and the hash matches bit-exact (the scalar ln is the one
    precedent-accepted float, as in unigram_doc_logprob)."""
    from taxi_data_pipeline_pset2_spark.operators.search import bm25_topk

    return bm25_topk(
        t(spark, sf_dir, "documents"), list(_BM25_TERMS), top_k=_BM25_K
    )


# ---- percentile-rank quality blending ------------------------------------

_BLEND_K = 80

_BLEND_ORACLE = f"""
    WITH sig AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n_chars_d,
               CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) AS n_tokens_d,
               CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS DOUBLE)
                 / len(string_split_regex(trim(lower(text)), '\\s+')) AS distinct_ratio
        FROM documents
    ),
    ranked AS (
        SELECT doc_id,
               percent_rank() OVER (ORDER BY n_chars_d) AS pr_chars,
               percent_rank() OVER (ORDER BY n_tokens_d) AS pr_tokens,
               percent_rank() OVER (ORDER BY distinct_ratio) AS pr_distinct
        FROM sig
    )
    SELECT doc_id,
           round((pr_chars * 0.3 + pr_tokens * 0.3 + pr_distinct * 0.4) / 1.0, 6)
               AS quality_blend
    FROM ranked
    ORDER BY quality_blend DESC, doc_id
    LIMIT {_BLEND_K}
"""


@query("quality_rank_blend", oracle=_BLEND_ORACLE, tags=("text", "robust"))
def quality_rank_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal quality ensemble (operators/robust.py
    percentile_rank_blend): three incommensurable signals (chars,
    tokens, distinct-token ratio) percent-ranked and weight-blended,
    top-80 documents. Exact window mode here (result-sized corpus);
    the sketch mode is the corpus-scale path."""
    from taxi_data_pipeline_pset2_spark.operators.robust import (
        percentile_rank_blend,
    )

    docs = t(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    sig = docs.select(
        "doc_id",
        F.length("text").cast("double").alias("n_chars_d"),
        F.size(toks).cast("double").alias("n_tokens_d"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("distinct_ratio"),
    )
    blended = percentile_rank_blend(
        sig,
        [("n_chars_d", 0.3, True), ("n_tokens_d", 0.3, True), ("distinct_ratio", 0.4, True)],
    )
    return (
        blended.select("doc_id", "quality_blend")
        .orderBy(F.desc("quality_blend"), F.asc("doc_id"))
        .limit(_BLEND_K)
    )


_SOURCE_PROFILE_ORACLE = f"""
    WITH tk AS (SELECT source, lang, text,
                       string_split_regex(trim(lower(text)), '\\s+') AS toks
                FROM documents),
    m AS (SELECT source, lang,
                 CAST(4 * CAST(round(CAST(len(list_filter(toks,
                          x -> list_contains({_sql_list(LANG_MARKERS['en'])}, x))) AS DOUBLE)
                          * 1000000 / len(toks)) AS BIGINT)
                      + 3 * least(CAST(1000000 AS BIGINT), CAST(len(toks) * 10000 AS BIGINT))
                      + 3 * CAST(round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                          * 1000000 / length(text)) AS BIGINT) AS DOUBLE) / 10000000
                     AS quality_score,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
          FROM tk),
    per AS (SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   round(CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
                         / count(*), 6) AS avg_quality,
                   CAST(count(DISTINCT fp) AS BIGINT) AS n_unique
            FROM m GROUP BY source),
    sl AS (SELECT source, lang, count(*) AS n FROM m GROUP BY source, lang),
    tt AS (SELECT source, sum(n) AS t FROM sl GROUP BY source),
    e AS (SELECT sl.source,
                 CAST(round(-(n * 1.0 / t) * ln(n * 1.0 / t) * 1000000) AS BIGINT) AS em
          FROM sl JOIN tt ON sl.source IS NOT DISTINCT FROM tt.source),
    ent AS (SELECT source, CAST(sum(em) AS DOUBLE) / 1000000 AS lang_entropy
            FROM e GROUP BY source)
    SELECT p.source, n_docs, avg_quality, n_unique,
           round(1 - n_unique * 1.0 / n_docs, 6) AS dup_rate,
           lang_entropy
    FROM per p JOIN ent ON p.source IS NOT DISTINCT FROM ent.source
    ORDER BY p.source
"""


@query("source_quality_profile", oracle=_SOURCE_PROFILE_ORACLE, tags=("text", "agg", "quality"))
def source_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset-card sheet (operators/profiling.py
    source_profile): doc counts, decimal-exact mean quality, exact-dup
    rate, language-mix entropy -- the per-domain statistics that set
    mixture weights. Two hash aggregates + one source-sized join."""
    from taxi_data_pipeline_pset2_spark.operators.profiling import source_profile

    return source_profile(t(spark, sf_dir, "documents")).orderBy("source")


_SFT_SEP = "value"

_SFT_MASK_ORACLE = f"""
    WITH tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
                FROM documents),
    m AS (SELECT doc_id, ts,
                 CASE WHEN coalesce(list_position(ts, '{_SFT_SEP}'), 0) > 0
                      THEN list_position(ts, '{_SFT_SEP}')
                      ELSE len(ts) END AS eff
          FROM tk)
    SELECT doc_id,
           CAST(eff AS BIGINT) AS n_prompt,
           CAST(len(ts) - eff AS BIGINT) AS n_completion,
           array_to_string(list_transform(generate_series(1, len(ts)),
                           i -> CASE WHEN i > eff THEN '1' ELSE '0' END), '')
               AS mask
    FROM m
    ORDER BY doc_id
"""


@query("sft_loss_masks", oracle=_SFT_MASK_ORACLE, tags=("text", "sft"))
def sft_loss_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-tuning loss masks (operators/text.py sft_loss_mask):
    0 over the prompt span up to and including the first separator
    token, 1 over the completion -- the SFT data prep that keeps loss
    off the prompt. Scan-shaped index-aware array expressions; the
    driver row compares the string-encoded mask."""
    from taxi_data_pipeline_pset2_spark.operators.text import sft_loss_mask

    out = sft_loss_mask(t(spark, sf_dir, "documents"), _SFT_SEP)
    return out.select(
        "doc_id",
        "n_prompt",
        "n_completion",
        F.concat_ws(
            "", F.transform(F.col("loss_mask"), lambda x: x.cast("string"))
        ).alias("mask"),
    ).orderBy("doc_id")
