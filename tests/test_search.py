"""Inverted-index search semantics: positional postings, conjunctive
ranking, phrase adjacency incl. repeated-word and overlapping matches."""

from __future__ import annotations

import pytest

from taxi_data_pipeline_pset2_spark.operators.search import (
    inverted_index,
    search_and,
    search_phrase,
)

DOCS = [
    (1, "the quick brown fox the quick"),
    (2, "quick the quick the quick"),  # overlapping "quick the quick"
    (3, "brown fox runs fast"),
    (4, "the the the"),  # repeated-word phrase
    (5, ""),
]


def _idx(spark):
    return inverted_index(
        spark.createDataFrame(DOCS, "doc_id long, text string")
    )


def test_index_positions_and_tf(spark):
    idx = {(r.term, r.doc_id): (r.positions, r.tf) for r in _idx(spark).collect()}
    assert idx[("quick", 1)] == ([1, 5], 2)
    assert idx[("the", 4)] == ([0, 1, 2], 3)
    assert idx[("", 5)] == ([0], 1)  # empty doc -> one empty token


def test_search_and_requires_all_terms(spark):
    got = {r.doc_id: r.total_tf for r in search_and(_idx(spark), ["the", "quick"]).collect()}
    assert got == {1: 4, 2: 5}  # doc 4 lacks "quick", doc 3 lacks both
    ranked = search_and(_idx(spark), ["the", "quick"], top_k=1).collect()
    assert ranked[0].doc_id == 2  # highest summed tf first


def test_phrase_counts_overlaps_and_repeats(spark):
    idx = _idx(spark)
    got = {r.doc_id: r.n_occurrences for r in search_phrase(idx, ["the", "quick"]).collect()}
    assert got == {1: 2, 2: 2}
    # repeated-word phrase: "the the" occurs twice in doc 4 (overlap)
    got2 = {r.doc_id: r.n_occurrences for r in search_phrase(idx, ["the", "the"]).collect()}
    assert got2 == {4: 2}
    # 3-token phrase spanning the repeat
    got3 = {r.doc_id: r.n_occurrences for r in search_phrase(idx, ["quick", "the", "quick"]).collect()}
    assert got3 == {2: 2}
    # absent phrase (words exist, never adjacent)
    assert search_phrase(idx, ["fox", "quick"]).count() == 0


def test_tfidf_cosine_pairs_geometry(spark):
    import math

    from taxi_data_pipeline_pset2_spark.operators.search import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),      # identical -> cosine 1
            (3, "alpha beta delta"),      # partial overlap with 1/2
            (4, "epsilon zeta eta"),      # no shared term -> no pair
            (5, "epsilon zeta eta"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(docs, threshold=0.0, max_df=10).collect()
    }
    assert out[(1, 2)] == pytest.approx(1.0, abs=1e-5)
    assert out[(4, 5)] == pytest.approx(1.0, abs=1e-5)
    assert (1, 4) not in out and (2, 5) not in out  # inverted index: no shared term
    assert 0 < out[(1, 3)] < 1  # partial overlap strictly between
    # python brute-force over the same weighting
    n = 5
    toks = {d: t.split() for d, t in [(r[0], r[1]) for r in docs.collect()]}
    tf: dict = {}
    for d, ts in toks.items():
        for t in ts:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    dfreq: dict = {}
    for (d, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    kept = {t for t, c in dfreq.items() if 2 <= c <= 10}
    vecs: dict = {}
    for (d, t), c in tf.items():
        if t in kept:
            w = round(c * round(math.log(n / dfreq[t]), 6) * 1e6)
            vecs.setdefault(d, {})[t] = w
    exp_pairs = {
        (a, b)
        for a in vecs
        for b in vecs
        if a < b and set(vecs[a]) & set(vecs[b])
    }
    assert set(out) == exp_pairs  # nothing missing, nothing spurious
    for (a, b), got in out.items():
        va, vb = vecs.get(a, {}), vecs.get(b, {})
        na = math.sqrt(sum(w * w for w in va.values()))
        nb = math.sqrt(sum(w * w for w in vb.values()))
        dot = sum(
            round(1e6 * va[t] / na) * round(1e6 * vb[t] / nb)
            for t in set(va) & set(vb)
        )
        assert got == pytest.approx(dot / 1e12, abs=2e-6), (a, b)


def test_tfidf_cosine_max_df_prunes_stopwords(spark):
    from taxi_data_pipeline_pset2_spark.operators.search import tfidf_cosine_pairs

    # "the" appears in all docs; with max_df=2 it is pruned, so the only
    # similarity left comes from the rare shared terms
    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "the dog"), (3, "the cat")],
        "doc_id long, text string",
    )
    out = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(docs, threshold=0.0, max_df=2).collect()
    }
    assert set(out) == {(1, 3)}  # only the "cat" pair survives pruning
    assert out[(1, 3)] == pytest.approx(1.0, abs=1e-5)
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(docs, min_df=0)
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(docs, min_df=5, max_df=2)


def test_validation(spark):
    idx = _idx(spark)
    with pytest.raises(ValueError):
        search_and(idx, [])
    with pytest.raises(ValueError):
        search_phrase(idx, [])


def test_search_plans_are_udf_free(spark):
    idx = _idx(spark)
    for df in (
        search_and(idx, ["the", "quick"]),
        search_phrase(idx, ["the", "quick"]),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["a", "b", "c", "dd"]
_hsettings = settings(max_examples=10, deadline=None)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    phrase=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3),
)
@_hsettings
def test_phrase_search_matches_bruteforce(spark, docs, phrase):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    idx = inverted_index(spark.createDataFrame(rows, "doc_id long, text string"))
    got = {r.doc_id: r.n_occurrences for r in search_phrase(idx, phrase).collect()}
    want = {}
    for i, toks in enumerate(docs):
        toks = toks or [""]  # empty doc tokenizes to one empty token
        n = sum(
            1
            for p in range(len(toks) - len(phrase) + 1)
            if toks[p : p + len(phrase)] == phrase
        )
        if n:
            want[i] = n
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    terms=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3, unique=True),
)
@_hsettings
def test_and_search_matches_bruteforce(spark, docs, terms):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    idx = inverted_index(spark.createDataFrame(rows, "doc_id long, text string"))
    got = {r.doc_id: r.total_tf for r in search_and(idx, terms).collect()}
    want = {}
    for i, toks in enumerate(docs):
        toks = toks or [""]
        if all(t in toks for t in terms):
            want[i] = sum(toks.count(t) for t in set(terms))
    assert got == want


def test_tfidf_cosine_matches_bruteforce_random(spark):
    """Hypothesis sweep: random tiny corpora vs the python reference
    (same int-scaling discipline), pair-set and value equality."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from taxi_data_pipeline_pset2_spark.operators.search import tfidf_cosine_pairs

    words = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
    doc = st.lists(words, min_size=1, max_size=6).map(" ".join)

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts=st.lists(doc, min_size=2, max_size=6))
    def run(texts):
        rows = list(enumerate(texts))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            (r.id_a, r.id_b): r.cosine
            for r in tfidf_cosine_pairs(docs, threshold=0.0, max_df=10).collect()
        }
        n = len(rows)
        tf: dict = {}
        for d, t in rows:
            for w in t.split():
                tf[(d, w)] = tf.get((d, w), 0) + 1
        dfreq: dict = {}
        for (_, w) in tf:
            dfreq[w] = dfreq.get(w, 0) + 1
        kept = {w for w, c in dfreq.items() if 2 <= c <= 10}
        vecs: dict = {}
        for (d, w), c in tf.items():
            if w in kept:
                w6 = round(c * round(math.log(n / dfreq[w]), 6) * 1e6)
                if w6 != 0:  # df == n_docs -> idf 0 -> dropped
                    vecs.setdefault(d, {})[w] = w6
        want = {}
        for a in vecs:
            for b in vecs:
                if a < b and set(vecs[a]) & set(vecs[b]):
                    na = math.sqrt(sum(x * x for x in vecs[a].values()))
                    nb = math.sqrt(sum(x * x for x in vecs[b].values()))
                    dot = sum(
                        round(1e6 * vecs[a][w] / na) * round(1e6 * vecs[b][w] / nb)
                        for w in set(vecs[a]) & set(vecs[b])
                    )
                    want[(a, b)] = round(dot / 1e12, 6)
        assert set(out) == set(want)
        for k in want:
            assert abs(out[k] - want[k]) <= 2e-6, (k, out[k], want[k])

    run()


# ---- BM25 -----------------------------------------------------------------


def _bm25_ref(docs, terms):
    """Float reference BM25 (k1=1.2, b=0.75, Lucene idf) for semantics
    checks -- the engine's exact-integer micro-scores should match this
    to ~1e-6."""
    import math
    import re

    # regex split, NOT str.split(): the engine's tokenize("") yields one
    # empty token (see test_index_positions_and_tf), so must the reference
    toks = {i: re.split(r"\s+", t.strip().lower()) for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in set(terms):
        df = sum(1 for v in toks.values() if term in v)
        if not df:
            continue
        idf = round(math.log(1 + (n - df + 0.5) / (df + 0.5)), 6)
        for i, v in toks.items():
            tf = v.count(term)
            if tf:
                dl = len(v)
                scores[i] = scores.get(i, 0.0) + idf * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * dl / avgdl)
                )
    return scores


def test_bm25_matches_float_reference_and_ranks(spark):
    from taxi_data_pipeline_pset2_spark.operators.search import bm25_topk

    got = {
        r.doc_id: (r.n_terms, r.bm25)
        for r in bm25_topk(
            spark.createDataFrame(DOCS, "doc_id long, text string"),
            ["quick", "fox"],
            top_k=10,
        ).collect()
    }
    ref = _bm25_ref(DOCS, ["quick", "fox"])
    assert set(got) == set(ref)
    for i, (nt, s) in got.items():
        assert abs(s - ref[i]) < 2e-6, (i, s, ref[i])
    # doc 3 matches only "fox"; docs 1 and 2 match "quick" (1 also "fox")
    assert got[1][0] == 2 and got[2][0] == 1 and got[3][0] == 1


def test_bm25_length_normalization_prefers_short_doc(spark):
    from taxi_data_pipeline_pset2_spark.operators.search import bm25_topk

    rows = [
        (1, "hit miss"),
        (2, "hit " + "pad " * 40),
    ]
    out = bm25_topk(
        spark.createDataFrame(rows, "doc_id long, text string"), ["hit"], top_k=2
    ).collect()
    # same tf=1 in both docs: the short one must score higher
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].score_micro > out[1].score_micro


def test_bm25_guards(spark):
    from taxi_data_pipeline_pset2_spark.operators.search import bm25_topk

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one term"):
        bm25_topk(df, [])
    with pytest.raises(ValueError, match="top_k"):
        bm25_topk(df, ["the"], top_k=0)


def test_bm25_topk_truncates_deterministically(spark):
    from taxi_data_pipeline_pset2_spark.operators.search import bm25_topk

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    full = bm25_topk(df, ["the", "quick"], top_k=10).collect()
    top1 = bm25_topk(df, ["the", "quick"], top_k=1).collect()
    assert [r.doc_id for r in top1] == [full[0].doc_id]
    # scores strictly ordered desc, ties broken by doc_id asc
    pairs = [(-r.score_micro, r.doc_id) for r in full]
    assert pairs == sorted(pairs)


def test_bm25_null_text_equals_empty_text(spark):
    """NULL text must fold to the empty doc BEFORE tokenize (size(NULL)
    is -1 under legacy sizeOfNull and would corrupt the corpus length L;
    the DuckDB twin coalesces identically)."""
    from taxi_data_pipeline_pset2_spark.operators.search import bm25_topk

    with_null = [(1, "hit miss"), (2, "hit hit pad"), (3, None)]
    with_empty = [(1, "hit miss"), (2, "hit hit pad"), (3, "")]
    a = bm25_topk(
        spark.createDataFrame(with_null, "doc_id long, text string"),
        ["hit"], top_k=5,
    ).collect()
    b = bm25_topk(
        spark.createDataFrame(with_empty, "doc_id long, text string"),
        ["hit"], top_k=5,
    ).collect()
    assert [(r.doc_id, r.score_micro) for r in a] == [
        (r.doc_id, r.score_micro) for r in b
    ]
    assert len(a) == 2  # the null doc matches nothing but counts in N/L


def test_bm25_matches_bruteforce_random(spark):
    """Hypothesis sweep: random tiny corpora and queries vs the float
    reference (the integer HALF_UP ratios sit within 1e-6 of the real
    scores, so ranking and values agree to tolerance)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from taxi_data_pipeline_pset2_spark.operators.search import bm25_topk

    @given(
        docs=st.lists(
            st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10),
            min_size=1,
            max_size=7,
        ),
        terms=st.lists(
            st.sampled_from(_WORDS), min_size=1, max_size=3, unique=True
        ),
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(docs, terms):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        got = {
            r.doc_id: r.bm25
            for r in bm25_topk(
                spark.createDataFrame(rows, "doc_id long, text string"),
                terms,
                top_k=20,
            ).collect()
        }
        ref = _bm25_ref(rows, terms)
        assert set(got) == set(ref)
        for i, s in got.items():
            assert abs(s - ref[i]) < 2e-6, (i, s, ref[i])

    run()


def test_bm25_partitioning_invariant(spark):
    """The integer-sum contract: identical scores at 1 and 32 input
    partitions (a float-sum BM25 would drift with aggregation order)."""
    from taxi_data_pipeline_pset2_spark.operators.search import bm25_topk

    rows = [(i, f"hit {'pad ' * (i % 7)}{'hit ' * (i % 3)}") for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = bm25_topk(df.coalesce(1), ["hit", "pad"], top_k=64).collect()
    b = bm25_topk(df.repartition(32), ["hit", "pad"], top_k=64).collect()
    assert [(r.doc_id, r.score_micro) for r in a] == [
        (r.doc_id, r.score_micro) for r in b
    ]
