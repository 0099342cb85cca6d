"""PII redaction and repetition-quality operators (corpus hygiene)."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.text import (
    redact_pii,
    repetition_metrics,
)


def test_redact_pii_scrubs_all_three_classes(spark):
    rows = [
        (1, "contact bob.smith+x@corp.example.co for details"),
        (2, "server at 192.168.001.1 port open"),
        (3, "call +1 (555) 123-4567 or 555-987-6543 now"),
        (4, "clean text with numbers 42 and the year 2024"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.clean for r in df.select("id", redact_pii(F.col("text")).alias("clean")).collect()}
    assert "@" not in out[1] and "<PII>" in out[1]
    assert "192.168" not in out[2] and "<PII>" in out[2]
    assert "555" not in out[3] and out[3].count("<PII>") == 2
    assert out[4] == rows[3][1]  # short numbers untouched


def test_repetition_metrics_flags_boilerplate(spark):
    boiler = "\n".join(["HOME | ABOUT | CONTACT"] * 9 + ["actual unique content"])
    clean = "\n".join(f"unique line {i}" for i in range(10))
    df = spark.createDataFrame([(1, boiler), (2, clean), (3, "")], "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert got[1].n_lines == 10 and got[1].n_distinct_lines == 2
    assert got[1].dup_line_ratio == 0.8 and got[1].max_line_freq == 0.9
    assert got[2].dup_line_ratio == 0.0 and got[2].max_line_freq == 0.1
    assert got[3].n_lines == 0 and got[3].dup_line_ratio == 0.0


def test_chunk_documents_geometry_and_coverage(spark, sf_dir):
    """Chunk windows must tile the token stream exactly: python-side
    reference slices per doc, chunk-count formula, overlap sharing, and
    the one-chunk short-doc case."""
    import math

    from taxi_data_pipeline_pset2_spark.operators.text import chunk_documents
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    max_t, ov = 20, 5
    step = max_t - ov
    docs = load_table(spark, sf_dir, "documents").limit(100)
    ref = {
        r.doc_id: r.text.strip().lower().split()
        for r in docs.collect()
        if r.text.strip()
    }
    rows = chunk_documents(docs, max_tokens=max_t, overlap=ov).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(ref)
    for doc_id, chunks in by_doc.items():
        toks = ref[doc_id]
        n = len(toks)
        want_chunks = 1 if n <= max_t else 1 + math.ceil((n - max_t) / step)
        assert sorted(c.chunk_id for c in chunks) == list(range(want_chunks))
        for c in chunks:
            assert c.chunk_start == c.chunk_id * step
            want = toks[c.chunk_start : c.chunk_start + max_t]
            assert c.chunk_text == " ".join(want)
            assert c.n_chunk_tokens == len(want) <= max_t
        # every token covered: the last chunk must reach the end
        last = max(chunks, key=lambda c: c.chunk_id)
        assert last.chunk_start + last.n_chunk_tokens == n


def test_chunk_documents_validates_params(spark, sf_dir):
    import pytest

    from taxi_data_pipeline_pset2_spark.operators.text import chunk_documents
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(docs, max_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, max_tokens=10, overlap=10)


def test_gopher_quality_flags_rules(spark):
    """Each Gopher rule trips on its planted pathological doc and passes
    on the clean one."""
    from taxi_data_pipeline_pset2_spark.operators.text import gopher_quality_flags

    clean = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away to find some more food for the long winter season ahead now"
    )
    docs = spark.createDataFrame(
        [
            (1, clean),
            (2, "too short"),
            (3, "the " + "#tag " * 30),  # symbol ratio >= 0.1
            (4, "the intro line\n" + "\n".join("- bullet %d" % i for i in range(9))),
            (5, "the one...\nanother line...\nthird goes on...\nplain\nplain2"),
            (6, "the " + "12 34 56 78 90 " * 5),  # digits: alpha-word rule
            (7, "没有 英文 停用 词 在 这里 只有 中文 词汇 " * 3),  # no stopwords
            (8, "the " + "supercalifragilisticexpialidocious " * 25),  # long words
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r
        for r in gopher_quality_flags(docs, min_words=15, max_words=200).collect()
    }
    assert got[1].keep
    assert not got[2].flag_word_count and not got[2].keep
    assert not got[3].flag_symbol_ratio
    assert not got[4].flag_bullet_lines
    assert not got[5].flag_ellipsis_lines
    assert not got[6].flag_alpha_words
    assert not got[7].flag_stopwords
    assert not got[8].flag_mean_word_len
    # per-rule flags are independent: doc 3 still passes word count
    assert got[3].flag_word_count


def test_sentiment_scores(spark):
    from taxi_data_pipeline_pset2_spark.operators.text import sentiment_scores

    docs = spark.createDataFrame(
        [
            (1, "fast fast slow"),       # +2 +2 -2 over 3 matched -> 0.666667
            (2, "nothing lexical here"),  # no match -> NULL
            (3, "terrible awful bad"),    # all negative
            (4, "GOOD Fast"),             # case-folded
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in sentiment_scores(docs).collect()}
    assert got[1].n_pos == 2 and got[1].n_neg == 1
    assert got[1].sentiment == round(2 / 3, 6)
    assert got[2].sentiment is None and got[2].n_pos == 0
    assert got[3].n_neg == 3 and got[3].sentiment < -2
    assert got[4].n_pos == 2 and got[4].sentiment == 2.0


def test_gopher_flags_match_python_reference(spark):
    """The single-pass regex formulation must agree with a per-word /
    per-line reference implementation on adversarial whitespace: blank
    lines, leading/trailing runs, bullets after blanks, mixed dots."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from taxi_data_pipeline_pset2_spark.operators.text import (
        GOPHER_STOPWORDS,
        gopher_quality_flags,
    )

    alphabet = "ab the # … . - * • \n\t 12 x… "
    docs_strategy = st.lists(
        st.text(alphabet=alphabet, min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    )

    def ref_flags(text, min_words, max_words):
        # a word is a maximal \S+ run (the engine moved off
        # split-on-\s+, whose phantom '' elements at \n/\t-bounded
        # edges off-by-one'd the count -- see
        # test_gopher_word_count_robust_to_newline_edges)
        words = _re.findall(r"\S+", text)
        lines = text.split("\n")
        n_words = len(words)
        sum_len = sum(len(w) for w in words)
        n_sym = text.count("#") + len(_re.findall(r"\.\.\.|…", text))
        n_bullet = sum(1 for ln in lines if _re.match(r"\s*[-*•]", ln))
        n_ell = sum(1 for ln in lines if _re.search(r"(\.\.\.|…)\s*$", ln))
        n_alpha = sum(1 for w in words if _re.search("[A-Za-z]", w))
        low = [w.lower() for w in words]
        n_stop = sum(1 for s in GOPHER_STOPWORDS if s in low)
        return (
            min_words <= n_words <= max_words,
            3 * n_words <= sum_len <= 10 * n_words,
            n_sym * 10 <= n_words,
            n_bullet * 10 <= len(lines),
            n_ell * 10 <= 3 * len(lines),
            n_alpha * 5 >= n_words * 4,
            n_stop >= 2,
        )

    @given(texts=docs_strategy)
    @settings(max_examples=10, deadline=None)
    def run(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r.doc_id: (
                r.flag_word_count, r.flag_mean_word_len, r.flag_symbol_ratio,
                r.flag_bullet_lines, r.flag_ellipsis_lines,
                r.flag_alpha_words, r.flag_stopwords,
            )
            for r in gopher_quality_flags(df, min_words=2, max_words=30).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == ref_flags(t, 2, 30), (i, repr(t))

    run()


def test_oov_rate_semantics(spark):
    from taxi_data_pipeline_pset2_spark.operators.text import oov_rate

    docs = spark.createDataFrame(
        [
            (1, "a b c"),        # all in vocab
            (2, "a b z"),        # one OOV
            (3, "x y z"),        # all OOV
            (4, None),           # NULL text -> 0 tokens, NULL rate
        ],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("a",), ("b",), ("c",)], "token string")
    out = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in oov_rate(docs, vocab).collect()
    }
    assert out[1] == (3, 0, 0.0)
    assert out[2] == (3, 1, round(1 / 3, 6))
    assert out[3] == (3, 3, 1.0)
    assert out[4][0] == 0 and out[4][2] is None


def test_compression_ratio_matches_python_zlib(spark):
    import zlib

    from taxi_data_pipeline_pset2_spark.operators.text import compression_ratio

    rows = [
        (1, "abc " * 200),          # highly repetitive -> high ratio
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_bytes, r.n_compressed, r.ratio)
        for r in compression_ratio(docs).collect()
    }
    for did, txt in rows:
        if txt is None:
            assert out[did] == (None, None, None)
        else:
            raw = txt.encode()
            comp = zlib.compress(raw, 6)
            assert out[did] == (
                len(raw), len(comp), round(len(raw) / len(comp), 6)
            ), did
    # the repetitive doc compresses far better than natural prose
    assert out[1][2] > 3 * out[2][2]


def test_blocklist_flags_density_semantics(spark):
    import pytest

    from taxi_data_pipeline_pset2_spark.operators.text import blocklist_flags

    bl = {"bad": "cat1", "worse": "cat2", "ugly": "cat1"}
    docs = spark.createDataFrame(
        [
            (1, "bad " + "ok " * 99),            # 1/100 hits -> under 5%
            (2, "bad worse ugly ok"),            # 3/4 -> blocked, 2 categories
            (3, "clean text only here"),
            (4, None),                           # NULL text -> NULL ratio, not blocked
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_hits, r.n_categories, r.hit_ratio, r.blocked)
        for r in blocklist_flags(docs, bl, max_hit_ratio=0.05).collect()
    }
    assert out[1] == (1, 1, 0.01, False)  # density, not presence, blocks
    assert out[2] == (3, 2, 0.75, True)
    assert out[3][0] == 0 and out[3][3] is False
    assert out[4][2] is None and out[4][3] is False
    with pytest.raises(ValueError):
        blocklist_flags(docs, {})


def test_sft_loss_mask_semantics(spark):
    from taxi_data_pipeline_pset2_spark.operators.text import sft_loss_mask

    docs = spark.createDataFrame(
        [
            (1, "what is spark <sep> a distributed engine"),
            (2, "no separator anywhere here"),
            (3, "<sep> completion only"),
            (4, "a <sep> b <sep> c"),  # FIRST separator splits
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.loss_mask, r.n_prompt, r.n_completion)
        for r in sft_loss_mask(docs, "<sep>").collect()
    }
    assert out[1] == ([0, 0, 0, 0, 1, 1, 1], 4, 3)
    assert out[2] == ([0, 0, 0, 0], 4, 0)     # all-prompt when absent
    assert out[3] == ([0, 1, 1], 1, 2)
    assert out[4] == ([0, 0, 1, 1, 1], 2, 3)  # second sep is completion text


def test_gopher_word_count_robust_to_newline_edges(spark):
    """trim strips only spaces and split keeps edge empties: a doc
    bounded by \\n/\\t must not gain phantom '' words (a 49-word doc
    with a leading newline previously passed the 50-word floor)."""
    from taxi_data_pipeline_pset2_spark.operators.text import (
        gopher_quality_flags,
    )

    body = " ".join(f"word{i}" for i in range(49))
    docs = spark.createDataFrame(
        [(1, "\n" + body), (2, body + "\t"), (3, body)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_words for r in gopher_quality_flags(docs).collect()}
    assert out == {1: 49, 2: 49, 3: 49}


def test_chunk_documents_whitespace_only_and_newline_edges(spark):
    """A whitespace-only doc has zero tokens -> no chunk row; a leading
    newline must not shift chunk offsets with a phantom '' token."""
    from taxi_data_pipeline_pset2_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "\n"), (2, "\na b c"), (3, "a b c")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=2, overlap=0).collect()
    ids = {r.doc_id for r in out}
    assert 1 not in ids
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_start, r.chunk_text))
    assert sorted(by_doc[2]) == sorted(by_doc[3]) == [(0, "a b"), (2, "c")]


def test_language_id_abstains_on_null_text(spark):
    """NULL text must predict NULL, not fall through the argmax chain
    to a confident label for a doc with no text."""
    from taxi_data_pipeline_pset2_spark.operators.text import language_id

    docs = spark.createDataFrame(
        [(1, None, "en"), (2, "the cat and the hat", "en")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: (r.pred_lang, r.is_match) for r in language_id(docs).collect()}
    assert out[1] == (None, None)
    assert out[2][0] == "en" and out[2][1] is True


def test_oov_rate_empty_doc_reports_zero_tokens(spark):
    """The '' sentinel token is not a real token: an empty-string doc
    must report 0 tokens / NULL rate, not n_tokens=1 / oov_rate=1.0."""
    from taxi_data_pipeline_pset2_spark.operators.text import oov_rate

    docs = spark.createDataFrame(
        [(1, ""), (2, "alpha beta")], "doc_id long, text string"
    )
    vocab = spark.createDataFrame([("alpha",)], "token string")
    out = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate) for r in
           oov_rate(docs, vocab).collect()}
    assert out[1] == (0, 0, None)
    assert out[2] == (2, 1, 0.5)
