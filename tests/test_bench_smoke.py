"""Bench-harness smoke tests: the driver runs bench.py unattended once
per round, and r3's only bench signal was a crash -- so the harness
pieces are pinned here at toy scale where pytest can afford them."""

from __future__ import annotations

from tests.conftest import SF_SMOKE_DIR


def test_clustering_demo_machinery(spark):
    """At toy scale the demo must still produce every reported field,
    a >1 bytes-pruned ratio (layout pruning works at any size), and
    positive timings; the RATIO claims are only meaningful at bench
    scale and are not asserted here."""
    from bench import clustering_demo

    out = clustering_demo(spark, SF_SMOKE_DIR, scale=4, n_flat_files=4)
    for k in (
        "flat_sec", "clustered_sec", "speedup", "warm_flat_sec",
        "warm_clustered_sec", "warm_speedup", "flat_write_sec",
        "clustered_write_sec", "flat_bytes_read", "clustered_bytes_read",
        "bytes_pruned_ratio", "scale", "note",
    ):
        assert k in out, k
    assert out["flat_sec"] > 0 and out["clustered_sec"] > 0
    assert out["flat_bytes_read"] > out["clustered_bytes_read"] > 0
    assert out["bytes_pruned_ratio"] > 1


def test_bench_entry_list_is_runnable(spark):
    """Every bench-tagged entry and pipeline extra must build its
    DataFrame against the smoke tables (execution is the oracle tests'
    job; this catches an entry that breaks only under the bench list)."""
    from bench import _pipeline_extras
    from taxi_data_pipeline_pset2_spark.queries import entries_tagged

    entries = entries_tagged("bench")
    assert len(entries) >= 20
    for e in entries:
        df = e.fn(spark, SF_SMOKE_DIR)
        assert df.columns, e.name
    for name, fn in _pipeline_extras().items():
        assert fn(spark, SF_SMOKE_DIR).columns, name
