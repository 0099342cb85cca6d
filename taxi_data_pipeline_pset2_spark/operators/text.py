"""Text analysis operators for training-data pipelines (SURVEY.md 2b):
language ID, quality scoring, token counting, document fingerprinting.

All pure ``pyspark.sql.functions`` compositions (split/filter/transform/
aggregate higher-order functions) -- no Python in the row path, so these
run inside whole-stage codegen and scale with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.dedup import (
    normalize_text,
    stable_hash64,
    tokenize,
)
from taxi_data_pipeline_pset2_spark.operators.skew import spread_small_input

# BPE-ish pre-tokenization: letter runs | digit runs | single symbol.
# Kept to a regex subset with identical semantics in Java regex and RE2.
TOKEN_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# Marker-word tables for the n-gram-free language-ID heuristic. The lists
# are deterministic engine constants; ties break by table order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "fast", "slow"],
    "es": ["data", "row", "value", "table"],
    "de": ["batch", "window", "join", "group"],
    "zh": ["spark", "hash", "key", "scan"],
}


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(col))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish regex token count (letter runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(TOKEN_REGEX), 0))


def _quality_exprs(text_col: str) -> dict[str, Column]:
    """The per-doc quality feature expressions, keyed by output name.
    Single source of truth for ``quality_metrics`` (id + metrics frame)
    and ``with_quality_score`` (chainable, join-free column attach).

    score = 0.4*stopword_ratio + 0.3*min(1, n_tokens/100) + 0.3*alpha_ratio
    -- the shape of a fastText-style heuristic quality filter, built from
    length/stopword/character-class ratios.

    Ratios in exact integer millionths: rounding a small-denominator
    rational at 1e-6 is engine-stable, but rounding a *sum of rounded*
    values is not (every value lands on the tie grid). So the composite
    score is integer arithmetic divided once -- no final round() at all.
    """
    toks = tokenize(F.col(text_col))
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_tokens = F.size(toks)
    sum_tok_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z]", ""))
    n_chars = F.length(F.col(text_col))
    stop_m = F.round(n_stop.cast("double") * 1_000_000 / n_tokens).cast("bigint")
    alpha_m = F.round(n_alpha.cast("double") * 1_000_000 / n_chars).cast("bigint")
    length_m = F.least(F.lit(1_000_000).cast("bigint"), (n_tokens * 10_000).cast("bigint"))
    score_tenmillionths = 4 * stop_m + 3 * length_m + 3 * alpha_m
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(sum_tok_len.cast("double") / n_tokens, 6),
        "stopword_ratio": stop_m.cast("double") / 1_000_000,
        "alpha_ratio": alpha_m.cast("double") / 1_000_000,
        "quality_score": score_tenmillionths.cast("double") / 10_000_000,
    }


def quality_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality features + composite score (see
    :func:`_quality_exprs` for the definitions)."""
    docs = spread_small_input(docs, key_cols=[id_col])
    exprs = _quality_exprs(text_col)
    return docs.select(
        F.col(id_col), *[c.alias(name) for name, c in exprs.items()]
    )


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Chainable form: the input frame plus a ``quality_score`` column --
    a pure projection, so composed pipelines (curate_corpus) attach the
    gate signal without a join and without re-deriving the input."""
    return docs.select("*", _quality_exprs(text_col)["quality_score"].alias("quality_score"))


def _lang_score_exprs(text_col: str) -> dict[str, Column]:
    """score_<lang> marker-occurrence counts over the token stream."""
    toks = tokenize(F.col(text_col))

    def _score(words: list[str]):
        arr = F.array([F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda tok: F.array_contains(arr, tok)))

    return {f"score_{lang}": _score(words) for lang, words in LANG_MARKERS.items()}


def _lang_argmax_expr() -> Column:
    """argmax over the score_<lang> columns with table-order tie-break.
    Must run in a projection AFTER the scores are bound as columns: each
    score is referenced against every other language, and interpreted
    higher-order functions re-evaluate repeated subexpressions."""
    langs = list(LANG_MARKERS)
    # NULL text -> NULL scores -> every >= condition is NULL, so the
    # chain would fall through to the LAST language as a confident
    # label for a doc with no text at all; abstain (NULL) instead
    pred = F.when(
        F.col(f"score_{langs[0]}").isNull(), F.lit(None).cast("string")
    )
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1 :]:
            c = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = c if cond is None else cond & c
        branch = F.lit(lang)
        if cond is not None:
            pred = pred.when(cond, branch)
        else:
            pred = pred.otherwise(branch)
    return pred


def language_id(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-word language-ID heuristic: per-language occurrence counts
    over the token stream, argmax with table-order tie-break."""
    scores = _lang_score_exprs(text_col)
    # the labeled column is optional: a production corpus has no ground
    # truth; lang_labeled/is_match appear only when a label exists
    has_label = "lang" in docs.columns
    label_cols = [F.col("lang").alias("lang_labeled")] if has_label else []
    scored = docs.select(
        F.col(id_col), *label_cols, *[c.alias(n) for n, c in scores.items()]
    )
    out = scored.withColumn("pred_lang", _lang_argmax_expr())
    if has_label:
        out = out.withColumn("is_match", F.col("pred_lang") == F.col("lang_labeled"))
    return out


def with_pred_lang(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Chainable form: the input frame plus a ``pred_lang`` column (the
    intermediate score columns are bound in one projection and dropped
    after the argmax) -- no join, no input re-derivation."""
    scores = _lang_score_exprs(text_col)
    return (
        docs.select("*", *[c.alias(n) for n, c in scores.items()])
        .withColumn("pred_lang", _lang_argmax_expr())
        .drop(*scores)
    )


def fingerprint_columns(text_col: Column) -> list[Column]:
    """The fingerprint bundle as columns -- content md5, 32-bit band
    hash, length bucket. Single source of truth: ``fingerprints`` and
    the catalog's ``token_fingerprints`` both build from here, so a
    change to the normalization or hash cannot silently fork the dedup
    fingerprint definition between operator and oracle-checked query."""
    norm = normalize_text(text_col)
    return [
        F.md5(norm).alias("content_md5"),
        stable_hash64(norm).alias("band_hash"),
        (F.length(text_col) / 100).cast("int").alias("len_bucket"),
    ]


def fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document fingerprint bundle: content md5, 32-bit band hash (for
    bucketed joins), and length bucket -- the join-key toolkit for
    dedup/sharding at scale."""
    return docs.select(F.col(id_col), *fingerprint_columns(F.col(text_col)))


# PII patterns (C4/CCNet-style corpus scrubbing). Kept to a regex subset
# with identical semantics in Java regex and RE2; order matters -- emails
# before phones so the phone pattern can't eat an address's digits.
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_REGEX = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_REGEX = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"


def redact_pii(col: Column, token: str = "<PII>") -> Column:
    """Scrub emails, IPv4 addresses, and phone-shaped digit runs to a
    fixed token -- the standard pre-training corpus hygiene pass. Pure
    ``regexp_replace`` chain: codegen'd, scales with the scan, no UDF.
    Heuristic by design (like C4's): a phone regex has false positives
    on long digit runs, which is the accepted trade for never shipping
    an unredacted true positive."""
    out = F.regexp_replace(col, EMAIL_REGEX, token)
    out = F.regexp_replace(out, IPV4_REGEX, token)
    return F.regexp_replace(out, PHONE_REGEX, token)


def _repetition_struct(text_col: str) -> Column:
    """The once-bound (n_lines, n_distinct_lines, max_line_count) struct
    underlying both repetition entry points."""
    lines_expr = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    # bind the lines array once (interpreted HOFs re-evaluate shared
    # subexpressions; see dedup.doc_shingles)
    from taxi_data_pipeline_pset2_spark.operators.dedup import _bind_once

    # max line frequency via sort + linear run-length fold: the naive
    # per-distinct-line count is O(distinct x lines) -- quadratic on
    # exactly the boilerplate-heavy docs this metric exists to catch.
    # Sorted equal lines are adjacent; one aggregate pass tracks the
    # current and best run. "" as the initial prev can't collide: empty
    # lines were filtered out above.
    def _max_run(lines: Column) -> Column:
        run_next = lambda acc, x: F.when(  # noqa: E731
            x == acc["prev"], acc["run"] + 1
        ).otherwise(F.lit(1))
        return F.aggregate(
            F.array_sort(lines),
            F.struct(
                F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                run_next(acc, x).alias("run"),
                F.greatest(acc["best"], run_next(acc, x)).alias("best"),
            ),
            lambda acc: acc["best"],
        )

    return _bind_once(
        lines_expr,
        lambda lines: F.struct(
            F.size(lines).alias("n_lines"),
            F.size(F.array_distinct(lines)).alias("n_distinct_lines"),
            _max_run(lines).alias("max_line_count"),
        ),
    )


def _dup_line_ratio_from(m: Column) -> Column:
    return (
        F.when(
            m["n_lines"] > 0,
            F.round(1 - m["n_distinct_lines"] / m["n_lines"], 6),
        )
        .otherwise(F.lit(0.0))
    )


def repetition_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals, per document:

    - n_lines / n_distinct_lines over newline-split, trimmed, non-empty
      lines; dup_line_ratio = 1 - distinct/total (boilerplate detector);
    - max_line_freq: occurrences of the most repeated line / total
      (catches the nav-bar-pasted-50x page that a global ratio misses).

    One per-row array pipeline (split -> filter -> distinct / frequency
    fold) -- no explode, no shuffle: repetition is a property OF the row,
    so it never needs to leave the row."""
    metrics = _repetition_struct(text_col)
    return docs.select(F.col(id_col), metrics.alias("_m")).select(
        id_col,
        F.col("_m.n_lines").alias("n_lines"),
        F.col("_m.n_distinct_lines").alias("n_distinct_lines"),
        _dup_line_ratio_from(F.col("_m")).alias("dup_line_ratio"),
        F.when(F.col("_m.n_lines") > 0,
               F.round(F.col("_m.max_line_count") / F.col("_m.n_lines"), 6)
        ).otherwise(F.lit(0.0)).alias("max_line_freq"),
    )


def with_dup_line_ratio(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Chainable form: the input frame plus a ``dup_line_ratio`` column
    (struct bound in one projection, then consumed) -- no join, no input
    re-derivation."""
    return (
        docs.select("*", _repetition_struct(text_col).alias("_m"))
        .withColumn("dup_line_ratio", _dup_line_ratio_from(F.col("_m")))
        .drop("_m")
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows -- the standard
    pretraining/RAG preprocessing step between curation and embedding.

    Returns (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text):
    chunk i covers tokens [i*step, i*step + max_tokens) with
    step = max_tokens - overlap, so consecutive chunks share ``overlap``
    tokens and every token is covered. The last chunk is the final
    window and may be shorter; a doc with <= max_tokens tokens yields
    exactly one chunk (its full text, whitespace-normalized). Docs with
    no tokens yield no row.

    Plan shape: one projection binds the token array, one explode emits
    chunk indices, one projection slices -- scan-shaped, no shuffle, no
    UDF; at 100 TB chunking rides the corpus scan it is fused into.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must be in [0, max_tokens)")
    step = max_tokens - overlap
    toks = F.col("_toks")
    n = F.size(toks)
    # number of windows: 1 + ceil((n - max_tokens) / step) for n > max
    extra = F.ceil((n - F.lit(max_tokens)).cast("double") / F.lit(step)).cast("int")
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(F.lit(1) + extra)
    start = F.col("chunk_id") * F.lit(step)  # 0-based token offset
    piece = F.slice(toks, start + 1, F.lit(max_tokens))
    # tokens = maximal \S+ runs via regexp_extract_all, NOT
    # split-on-\s+: Spark trim strips only spaces, so a doc starting
    # or ending with \n/\t would gain phantom '' tokens that shift
    # every chunk_start by one, and a whitespace-only doc ('\n') would
    # pass a length(trim) emptiness check and emit a junk chunk
    return (
        docs.select(
            F.col(id_col),
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(r"\S+"), 0
            ).alias("_toks"),
        )
        .filter(F.size("_toks") > 0)
        .select(
            id_col,
            "_toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            start.alias("chunk_start"),
            F.size(piece).alias("n_chunk_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )


# Gopher rule constants (Rae et al. 2021, "Scaling Language Models:
# ... Gopher", appendix A1.1 quality heuristics). The eight required
# stop words are the paper's list verbatim.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_stopwords: int = 2,
) -> DataFrame:
    """Per-doc Gopher quality-rule flags (Rae et al. 2021 A1.1): one
    boolean column per rule plus the composite ``keep``, so downstream
    consumers can re-slice by individual rule without re-scanning.

    Every rule is an INTEGER comparison (cross-multiplied ratios, no
    float rounding), so the flags are bit-identical across engines and
    partitionings -- same discipline as the int-scaled cosine kernels.
    Pure column expressions over one scan: whole-stage codegen, no
    shuffle, no UDF.

    Rules (defaults are the paper's):
    - word_count: min_words <= n_words <= max_words
    - mean_word_len: mean word length in [min, max] characters
    - symbol_ratio: (# of '#' or '...' occurrences) / n_words <= 0.1
    - bullet_lines: <= 10% of lines start with a bullet (-, *, or the
      unicode bullet)
    - ellipsis_lines: <= 30% of lines end with '...' (or the unicode
      ellipsis)
    - alpha_words: >= 80% of words contain an alphabetic character
    - stopwords: >= min_stopwords distinct required stop words appear
    """
    docs = spread_small_input(docs, key_cols=[id_col])
    # Single-pass JVM regex counts instead of interpreted higher-order
    # lambdas per word/line (transform/filter run outside codegen):
    # - a "word" is a maximal \S+ run (what split-on-\s+ yields), so
    #   words-with-a-letter == non-overlapping matches of \S*[A-Za-z]\S*
    # - summed word length == chars left after deleting all whitespace
    # - line rules count with (?m) anchors instead of a per-line filter
    # Measured ~4x on the bench entry; the DuckDB oracle keeps the
    # list-comprehension formulation, so the pytest oracle replay pins
    # the equivalence on real data.
    text = F.col(text_col)
    # count maximal \S+ runs directly: split(trim(text), \s+) keeps
    # phantom '' elements when text starts/ends with \n or \t (Spark
    # trim strips only spaces), off-by-one-ing the word count on the
    # overwhelmingly common \n-bounded doc shape -- and breaking this
    # comment block's own claimed equivalence with \S*[A-Za-z]\S*
    n_words = F.size(F.regexp_extract_all(text, F.lit(r"\S+"), 0))
    sum_len = F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(text, F.lit(r"\.\.\.|…"), 0))
    n_lines = F.size(F.split(text, r"\n"))
    n_bullet_lines = F.size(
        F.regexp_extract_all(text, F.lit(r"(?m)^\s*[-*•]"), 0)
    )
    n_ellipsis_lines = F.size(
        F.regexp_extract_all(text, F.lit(r"(?m)(\.\.\.|…)[ \t]*$"), 0)
    )
    n_alpha_words = F.size(
        F.regexp_extract_all(text, F.lit(r"\S*[A-Za-z]\S*"), 0)
    )
    # one lookaround pass for all stopwords (8 separate rlikes cost ~3x
    # the whole rest of the rule set); lookarounds keep separators
    # unconsumed so adjacent stopwords ("the be") both match
    stop_alt = "|".join(GOPHER_STOPWORDS)
    n_stop = F.size(
        F.array_distinct(
            F.regexp_extract_all(
                F.lower(text), F.lit(rf"(?<=^|\s)({stop_alt})(?=\s|$)"), 1
            )
        )
    )
    flags = {
        "flag_word_count": (n_words >= min_words) & (n_words <= max_words),
        "flag_mean_word_len": (sum_len >= min_mean_word_len * n_words)
        & (sum_len <= max_mean_word_len * n_words),
        "flag_symbol_ratio": (n_hash + n_ellipsis) * 10 <= n_words,
        "flag_bullet_lines": n_bullet_lines * 10 <= n_lines,
        "flag_ellipsis_lines": n_ellipsis_lines * 10 <= n_lines * 3,
        "flag_alpha_words": n_alpha_words * 5 >= n_words * 4,
        "flag_stopwords": n_stop >= min_stopwords,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        *[c.alias(n) for n, c in flags.items()],
        keep.alias("keep"),
    )


# Small built-in valence lexicon (AFINN-shaped: word -> integer score in
# [-5, 5]; entries authored here, not copied from any published list).
# The synthetic corpus exercises fast/slow/big/small; the rest make the
# operator useful on real text.
SENTIMENT_LEXICON: dict[str, int] = {
    "fast": 2, "slow": -2, "big": 1, "small": -1,
    "good": 2, "great": 3, "excellent": 4, "amazing": 4, "love": 3,
    "happy": 3, "best": 3, "win": 2, "useful": 2, "clean": 1,
    "bad": -2, "poor": -2, "terrible": -4, "awful": -4, "hate": -3,
    "sad": -2, "worst": -3, "fail": -2, "broken": -2, "dirty": -1,
}


def sentiment_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Lexicon-based valence scoring (the SURVEY 2b "sentiment-style
    scoring" cell): per doc, counts of positive/negative lexicon tokens
    and the mean valence over MATCHED tokens (NULL when nothing
    matches -- absence of evidence is not neutrality).

    Pure column expressions over one scan (map literal + higher-order
    functions): no UDF, no shuffle, no join -- the lexicon rides into
    every task as a literal. The same scan-shaped pattern extends to any
    word-weight table small enough to inline; a corpus-sized lexicon
    would switch to a broadcast join on the exploded tokens instead.
    """
    docs = spread_small_input(docs, key_cols=[id_col])
    lex = F.create_map(
        *[x for w, s in sorted(SENTIMENT_LEXICON.items()) for x in (F.lit(w), F.lit(s))]
    )
    toks = tokenize(F.col(text_col))
    val = lambda t: F.element_at(lex, t)  # noqa: E731 - NULL for non-lexicon tokens
    n_pos = F.size(F.filter(toks, lambda t: val(t) > 0))
    n_neg = F.size(F.filter(toks, lambda t: val(t) < 0))
    total = F.aggregate(
        F.transform(toks, lambda t: F.coalesce(val(t), F.lit(0))),
        F.lit(0),
        lambda a, x: a + x,
    )
    n_matched = n_pos + n_neg
    sentiment = F.when(
        n_matched > 0, F.round(total.cast("double") / n_matched, 6)
    )
    return docs.select(
        F.col(id_col),
        n_pos.cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
        sentiment.alias("sentiment"),
    )


def build_vocab(
    docs: DataFrame,
    max_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: the ``max_size`` most frequent whitespace
    tokens (ties by token, so the vocab is deterministic and
    engine-portable), with total and document frequencies -- the
    counting stage every tokenizer/embedding pipeline starts from.

    One explode + hash aggregate (map-side combined) + TakeOrdered
    top-k: the corpus shuffles only (token, partial-count) states, and
    driver traffic is bounded by ``max_size`` -- the same contract as
    ``top_n_by_hash``. Returns (token, n_occurrences, n_docs, rank).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    if min_count > 1:
        counts = counts.filter(F.col("n_occurrences") >= min_count)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return (
        counts.orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(max_size)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def oov_rate(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str = "token",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a fixed vocabulary
    frame (e.g. ``build_vocab``'s output): (id, n_tokens, n_oov,
    oov_rate 6-dp) -- the standard tokenizer-coverage eval run before
    committing a vocab, and the per-doc filter for "this document is
    not in the tokenizer's language".

    Plan: explode -> LEFT ANTI-shaped membership via a left join on the
    token (the vocab is vocab-sized: broadcast) -> one per-doc hash
    aggregate. Empty docs report 0 tokens and NULL rate (0/0 is not
    "perfect coverage")."""
    # the '' sentinel token (tokenize('') convention) is NOT a real
    # token: counting it would report an empty-string doc as n_tokens=1
    # / oov_rate=1.0 ("total OOV") instead of the documented 0-token /
    # NULL-rate path
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("_tok")
    ).filter(F.col("_tok") != "")
    marked = toks.join(
        F.broadcast(vocab.select(F.col(token_col).alias("_tok")).distinct()
                    .withColumn("_in", F.lit(True))),
        "_tok",
        "left",
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum((~F.coalesce(F.col("_in"), F.lit(False))).cast("bigint"))
        .cast("bigint")
        .alias("n_oov"),
    )
    # left join back so token-less docs keep a row
    base = docs.select(id_col).join(per_doc, id_col, "left")
    return base.select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("n_oov") / F.col("n_tokens"), 6),
        ).alias("oov_rate"),
    )


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio: (id, n_bytes,
    n_compressed, ratio = n_bytes / n_compressed, 6-dp) -- the
    classic low-cost repetition/boilerplate signal (highly repetitive
    machine-generated text compresses far better than natural prose;
    filters often drop ratio outliers on BOTH tails).

    zlib has no Catalyst expression, so this is an Arrow-batched
    ``mapInPandas`` kernel -- scan-shaped, no shuffle, and
    deterministic: zlib output length at a fixed level is a pure
    function of the bytes (pinned against the python reference in
    tests). NULL text yields NULL metrics. No SQL twin (DuckDB has no
    zlib) -> rows-only catalog entry."""
    import zlib
    from typing import Iterator as _Iter

    import pandas as _pd

    out_schema = f"{id_col} long, n_bytes long, n_compressed long, ratio double"

    def run(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        for pdf in batches:
            ids, nb, nc, ratio = [], [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                ids.append(i)
                if txt is None:
                    nb.append(None); nc.append(None); ratio.append(None)
                    continue
                raw = txt.encode("utf-8")
                comp = zlib.compress(raw, level)
                nb.append(len(raw))
                nc.append(len(comp))
                ratio.append(round(len(raw) / len(comp), 6) if comp else None)
            yield _pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "n_compressed": nc, "ratio": ratio}
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def blocklist_flags(
    docs: DataFrame,
    blocklist: dict[str, str],
    max_hit_ratio: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Word-list safety gate (the C4/Gopher "bad words" filter shape):
    per doc, total blocklist hits, distinct categories hit, the hit
    ratio over all tokens, and ``blocked`` when the ratio exceeds
    ``max_hit_ratio`` (a single incidental term shouldn't nuke a long
    document; density should). ``blocklist`` maps term -> category.

    Same scan-shaped plan as sentiment_scores: the list rides into
    every task as a map literal, pure higher-order expressions, no
    UDF/join/shuffle. A corpus-sized list would switch to a broadcast
    join on exploded tokens. Returns (id, n_tokens, n_hits,
    n_categories, hit_ratio 6-dp, blocked). Edge rows: NULL text yields
    NULL counts/ratio and blocked=False; empty/whitespace text counts
    ONE empty token (the engine-wide tokenize('') -> [''] convention
    the DuckDB twins share), ratio 0.0, not blocked."""
    if not blocklist:
        raise ValueError("empty blocklist")
    cat = F.create_map(
        *[x for w, c in sorted(blocklist.items()) for x in (F.lit(w), F.lit(c))]
    )
    toks = tokenize(F.col(text_col))
    hit_cats = F.filter(
        F.transform(toks, lambda t: F.element_at(cat, t)),
        lambda c: c.isNotNull(),
    )
    n_tokens = F.size(toks).cast("bigint")
    n_hits = F.size(hit_cats).cast("bigint")
    ratio = F.when(
        n_tokens > 0, F.round(n_hits.cast("double") / n_tokens, 6)
    )
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_hits.alias("n_hits"),
        F.size(F.array_distinct(hit_cats)).cast("bigint").alias("n_categories"),
        ratio.alias("hit_ratio"),
        F.coalesce(ratio > F.lit(max_hit_ratio), F.lit(False)).alias("blocked"),
    )


def sft_loss_mask(
    docs: DataFrame,
    sep_token: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Instruction-tuning loss masks: (id, tokens, loss_mask, n_prompt,
    n_completion) where ``loss_mask[i] = 1`` for completion tokens
    (strictly after the FIRST ``sep_token`` occurrence) and 0 for the
    prompt span including the separator -- the standard SFT data prep
    that keeps the loss off the prompt. Documents with no separator are
    all-prompt (mask all zeros): the caller decides whether to drop or
    keep them, so the operator stays a pure projection.

    Scan-shaped pure expressions (array_position + an index-aware
    transform); no UDF, no shuffle."""
    toks = tokenize(F.col(text_col))
    # first separator position (1-based); 0 when absent -> treat as
    # "separator at end": everything is prompt
    pos = F.array_position(toks, sep_token)
    eff = F.when(pos > 0, pos).otherwise(F.size(toks))
    mask = F.transform(
        toks, lambda _, i: F.when(i + 1 > eff, F.lit(1)).otherwise(F.lit(0))
    )
    n_total = F.size(toks).cast("bigint")
    n_completion = F.aggregate(
        mask, F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return docs.select(
        F.col(id_col),
        toks.alias("tokens"),
        mask.alias("loss_mask"),
        (n_total - n_completion).alias("n_prompt"),
        n_completion.alias("n_completion"),
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top collocations by pointwise mutual information (Church &
    Hanks, CL 1990): adjacent whitespace-token pairs whose corpus
    co-occurrence beats the unigram-independence expectation,

        pmi = ln( (c_ab / T_b) / ((c_a / T_u) * (c_b / T_u)) )

    with T_u total token positions and T_b total bigram positions.
    The corpus-linguistics primitive behind multiword-expression
    vocabularies (BPE merges optimize frequency; PMI surfaces the
    low-frequency-but-glued pairs frequency misses). ``min_count``
    suppresses the classic PMI pathology (hapax pairs scoring ln(T)).

    Returns (w1, w2, n_pair, n_w1, n_w2, pmi) -- top_k by (pmi desc,
    w1, w2). Plan: two explode+hash aggregates (bigrams, unigrams), two
    vocabulary-keyed joins onto the min_count-filtered pair frame, one
    broadcast totals row, TakeOrdered top-k. Nothing corpus-shaped
    shuffles twice; pmi is one double expression over exact integer
    counts, rounded once to 6 dp."""
    from taxi_data_pipeline_pset2_spark.operators.dedup import tokenize

    # explicit NULL-text filter: under the session's ANSI semantics
    # size(NULL) is NULL (sum skips it, explode emits nothing -- already
    # correct), but under legacy sizeOfNull it is -1 and every NULL doc
    # would subtract one from T_u, shifting EVERY pmi; pin the correct
    # behavior independent of config
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        tokenize(F.col(text_col)).alias("_t")
    )
    n_bi = F.greatest(F.size("_t") - 1, F.lit(0))
    pairs = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice("_t", 1, n_bi).alias("w1"),
                    F.slice(F.col("_t"), 2, n_bi).alias("w2"),
                )
            ).alias("_p")
        )
        .groupBy(
            F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
        )
        .agg(F.count("*").cast("bigint").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    uni = (
        toks.select(F.explode("_t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("n_tok"))
    )
    totals = toks.agg(
        F.sum(F.size("_t")).cast("double").alias("_tu"),
        F.sum(n_bi).cast("double").alias("_tb"),
    )
    j = (
        pairs.join(uni.withColumnRenamed("tok", "w1"), "w1")
        .withColumnRenamed("n_tok", "n_w1")
        .join(uni.withColumnRenamed("tok", "w2"), "w2")
        .withColumnRenamed("n_tok", "n_w2")
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.log(
        (F.col("n_pair") / F.col("_tb"))
        / ((F.col("n_w1") / F.col("_tu")) * (F.col("n_w2") / F.col("_tu")))
    )
    return (
        j.select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )
