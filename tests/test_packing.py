"""Sequence packing: budget honored, nothing dropped, deterministic
across physical partitionings, efficiency sane."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.packing import pack_sequences
from taxi_data_pipeline_pset2_spark.operators.text import token_count_ws
from taxi_data_pipeline_pset2_spark.sources.readers import load_table

BUDGET = 256


def _docs_with_lengths(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", token_count_ws(F.col("text")).alias("n_tokens"))
    )


def test_packing_honors_budget_and_loses_nothing(spark, sf_dir):
    docs = _docs_with_lengths(spark, sf_dir)
    packed = pack_sequences(docs, BUDGET)
    rows = packed.collect()
    assert {r.doc_id for r in rows} == {r.doc_id for r in docs.collect()}
    assert len(rows) == docs.count()  # each doc exactly once
    sums = (
        packed.filter(~F.col("oversize"))
        .groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    )
    assert all(r.s <= BUDGET for r in sums)
    # oversize docs sit alone in their own flagged sequence
    for r in packed.filter(F.col("oversize")).collect():
        assert r.n_tokens > BUDGET and r.seq_pos == 0
    mates = (
        packed.groupBy("seq_id")
        .agg(F.count("*").alias("n"), F.max(F.col("oversize").cast("int")).alias("ov"))
        .filter("ov = 1")
        .collect()
    )
    assert all(r.n == 1 for r in mates)
    # seq_pos is a dense 0..n-1 ordering within each sequence
    pos = packed.groupBy("seq_id").agg(
        F.count("*").alias("n"), F.max("seq_pos").alias("mx"), F.min("seq_pos").alias("mn")
    )
    assert pos.filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0)).count() == 0


def test_packing_deterministic_and_efficient(spark, sf_dir):
    docs = _docs_with_lengths(spark, sf_dir)
    a = {(r.doc_id, r.seq_id, r.seq_pos) for r in pack_sequences(docs, BUDGET).collect()}
    b = {
        (r.doc_id, r.seq_id, r.seq_pos)
        for r in pack_sequences(docs.repartition(17), BUDGET).collect()
    }
    assert a == b  # partitioning-independent
    packed = pack_sequences(docs, BUDGET)
    n_seqs = packed.filter(~F.col("oversize")).select("seq_id").distinct().count()
    total = (
        packed.filter(~F.col("oversize")).agg(F.sum("n_tokens").alias("t")).collect()[0].t
    )
    lower_bound = -(-total // BUDGET)  # ceil: the unsharded optimum floor
    # FFD in 64 shards: within 3x of the global lower bound on this corpus
    assert n_seqs <= 3 * lower_bound, (n_seqs, lower_bound)
    assert n_seqs < docs.count()  # actually packs, not one-doc-per-seq


def test_packing_zero_token_docs_never_join_oversize_bins(spark):
    """Regression: a zero/low-token doc must not slip into an oversize
    doc's dedicated sequence (old first-fit accepted room >= 0)."""
    rows = [(1, BUDGET * 3), (2, 0), (3, 0), (4, 5)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, BUDGET, n_shards=1)
    by_seq: dict[int, list] = {}
    for r in packed.collect():
        by_seq.setdefault(r.seq_id, []).append(r)
    for rows_ in by_seq.values():
        if any(r.oversize for r in rows_):
            assert len(rows_) == 1  # oversize sits alone
    assert packed.count() == 4  # nothing dropped


def test_string_ids_pass_through(spark):
    """The repo-wide id convention includes string/UUID ids: packing
    must carry them through with their own type (a cast('long') would
    throw under ANSI)."""
    from taxi_data_pipeline_pset2_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(f"doc-{i}", 40 + i) for i in range(8)], "doc_id string, n_tokens int"
    )
    out = pack_sequences(docs, token_budget=100, n_shards=2).collect()
    assert {r.doc_id for r in out} == {f"doc-{i}" for i in range(8)}
    assert all(isinstance(r.doc_id, str) for r in out)


def test_null_length_fails_loud(spark):
    """A NULL length would silently destroy open-bin capacity and then
    die in the Arrow conversion; the kernel must reject it with a clear
    message instead ('never silently drops data' includes bad input)."""
    import pytest as _pytest

    from taxi_data_pipeline_pset2_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1, 40), (2, None), (3, 10)], "doc_id long, n_tokens int"
    )
    with _pytest.raises(Exception, match="non-null"):
        pack_sequences(docs, token_budget=100, n_shards=1).collect()
