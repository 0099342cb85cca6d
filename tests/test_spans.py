"""Duplicated-span detection: DuckDB oracle equality, planted verbatim
spans with exact lengths/positions, maximality, and doc-level dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.spans import (
    duplicated_spans,
    span_dedup,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table

from .oracle_utils import compare_frames, duckdb_connection

K = 8

SPANS_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
    FROM documents),
g AS (
    SELECT doc_id, i - 1 AS pos,
           CAST(('0x' || substr(md5(array_to_string(list_slice(t, i, i + {K - 1}), ' ')), 1, 8)) AS BIGINT) AS h
    FROM toks, unnest(generate_series(1, len(t) - {K - 1})) AS u(i)
    WHERE len(t) >= {K}),
anchors AS (
    SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b,
           a.pos - b.pos AS diag
    FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
runs AS (
    SELECT doc_a, doc_b, diag, pos_a, pos_b,
           pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
    FROM anchors)
SELECT doc_a, doc_b, min(pos_a) AS a_start, min(pos_b) AS b_start,
       CAST(count(*) + {K - 1} AS BIGINT) AS span_tokens
FROM runs GROUP BY doc_a, doc_b, diag, grp
HAVING count(*) + {K - 1} >= 12
"""


def test_duplicated_spans_match_duckdb_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = duplicated_spans(docs, min_tokens=12, k=K).toPandas()
    con = duckdb_connection(sf_dir)
    want = con.execute(SPANS_ORACLE).df()
    assert compare_frames(got, want) == []


def test_planted_span_found_with_exact_geometry(spark):
    shared = " ".join(f"shared{i}" for i in range(30))
    pad_a = " ".join(f"aword{i}" for i in range(10))
    pad_b = " ".join(f"bword{i}" for i in range(17))
    docs = spark.createDataFrame(
        [
            (1, f"{pad_a} {shared} tail{0}"),
            (2, f"{pad_b} {shared} other tail here"),
            (3, "completely unrelated filler text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    spans = duplicated_spans(docs, min_tokens=20, k=K).collect()
    assert len(spans) == 1
    s = spans[0]
    assert (s.doc_a, s.doc_b) == (1, 2)
    assert s.span_tokens == 30  # maximal: exactly the planted span
    assert s.a_start == 10 and s.b_start == 17  # 0-based after the padding


def test_two_disjoint_spans_reported_separately(spark):
    span1 = " ".join(f"alpha{i}" for i in range(15))
    span2 = " ".join(f"beta{i}" for i in range(18))
    docs = spark.createDataFrame(
        [
            (1, f"{span1} middleone middletwo {span2}"),
            (2, f"{span2} unrelatedx unrelatedy {span1}"),
        ],
        "doc_id long, text string",
    )
    spans = {
        (r.span_tokens, r.a_start, r.b_start)
        for r in duplicated_spans(docs, min_tokens=12, k=K).collect()
    }
    # span1: doc1 pos 0, doc2 pos 20; span2: doc1 pos 17, doc2 pos 0
    assert spans == {(15, 0, 20), (18, 17, 0)}


def test_span_dedup_drops_higher_id_sharer(spark):
    shared = " ".join(f"common{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, f"{shared} plus original content"),
            (2, f"totally different framing here {shared}"),
            (3, "independent document with its own words entirely"),
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in span_dedup(docs, min_tokens=20, k=K).collect()}
    assert kept == {1, 3}


def test_spans_are_verbatim_and_maximal_property(spark):
    """Algorithm-independent check on random corpora: every reported
    span's token slices match verbatim, and no span can be extended a
    token in either direction (maximality)."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(5):
        shared = [rng.choice(vocab) for _ in range(rng.randint(12, 20))]
        docs_py = {}
        for did in range(1, 5):
            toks = [rng.choice(vocab) for _ in range(rng.randint(0, 15))]
            if did <= 2:  # two docs embed the shared run
                toks += shared
            toks += [rng.choice(vocab) for _ in range(rng.randint(0, 15))]
            docs_py[did] = toks
        df = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in docs_py.items()],
            "doc_id long, text string",
        )
        spans = duplicated_spans(df, min_tokens=10, k=5).collect()
        assert spans, f"trial {trial}: planted shared run must be found"
        for s in spans:
            a, b = docs_py[s.doc_a], docs_py[s.doc_b]
            sl_a = a[s.a_start : s.a_start + s.span_tokens]
            sl_b = b[s.b_start : s.b_start + s.span_tokens]
            assert sl_a == sl_b, (trial, s)
            # maximality: one more token on either side must mismatch or
            # run off a document boundary
            left_ok = s.a_start == 0 or s.b_start == 0 or (
                a[s.a_start - 1] != b[s.b_start - 1]
            )
            ae, be = s.a_start + s.span_tokens, s.b_start + s.span_tokens
            right_ok = ae >= len(a) or be >= len(b) or (a[ae] != b[be])
            assert left_ok and right_ok, (trial, s)
