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
