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
