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
        "flat_sec", "clustered_sec", "speedup", "speedup_is",
        "cold_wall_speedup", "cold_wall_is_io_bound", "warm_flat_sec",
        "warm_clustered_sec", "warm_speedup", "flat_write_sec",
        "clustered_write_sec", "flat_bytes_read", "clustered_bytes_read",
        "bytes_pruned_ratio", "flat_read_gbps", "scale", "note",
    ):
        assert k in out, k
    assert out["flat_sec"] > 0 and out["clustered_sec"] > 0
    assert out["flat_bytes_read"] > out["clustered_bytes_read"] > 0
    assert out["bytes_pruned_ratio"] > 1
    # the HEADLINE speedup is the cache-invariant layout claim
    assert out["speedup"] == out["bytes_pruned_ratio"]
    assert out["speedup_is"] == "bytes_pruned_ratio"


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


def test_merge_demo_rewrites_only_touched_partitions(spark):
    from bench import merge_demo

    out = merge_demo(spark, SF_SMOKE_DIR)
    assert out["partitions_total"] > 1
    assert out["partitions_rewritten"] == out["partitions_touched"] == 1
    assert out["sec"] > 0


def test_compact_summary_fits_driver_tail():
    """r5's bench record outgrew the driver's ~2 KB stdout tail and
    parsed as null; the compact line is hard-capped at 1 KB and must
    stay valid JSON with the headline fields."""
    import json

    from bench import compact_summary

    result = {
        "metric": "headline_queries_total",
        "value": 20.5,
        "unit": "sec",
        "sf": 0.1,
        "queries": {f"query_with_a_long_name_{i:02d}": i / 7.0 for i in range(60)},
        "first_run_sec": {},
        "clustering": {"speedup": 9.77, "warm_speedup": 4.69,
                       "bytes_pruned_ratio": 31.6, "note": "x" * 600},
        "merge": {"sec": 1.2, "partitions_rewritten": 1, "partitions_touched": 1},
        "errors": {"broken_query": "Boom"},
    }
    line = compact_summary(result)
    assert len(line.encode()) <= 1024
    parsed = json.loads(line)
    assert parsed["value"] == 20.5
    assert parsed["n_queries"] == 60 and parsed["n_errors"] == 1
    assert parsed["clustering"]["speedup"] == 9.77
    assert parsed["merge"]["partitions_rewritten"] == 1
    assert parsed["slowest"]  # some per-query figures still fit
    # clustering-demo failure path still summarizes
    result["clustering"] = {"error": "E" * 300}
    line2 = compact_summary(result)
    assert len(line2.encode()) <= 1024
    assert json.loads(line2)["clustering"]["error"].startswith("E")


def test_clustering_demo_cache_roundtrip(spark, tmp_path, monkeypatch):
    """Second run with identical parameters must reuse the written
    layouts (writes_cached=True, same reported write times) and still
    produce fresh read measurements; a missing marker forces a rebuild."""
    import os
    import shutil

    from bench import _cluster_cache_dir, clustering_demo

    cache_dir = _cluster_cache_dir(SF_SMOKE_DIR, 4, 4, 192)
    shutil.rmtree(cache_dir, ignore_errors=True)

    first = clustering_demo(spark, SF_SMOKE_DIR, scale=4, n_flat_files=4)
    assert first["writes_cached"] is False
    second = clustering_demo(spark, SF_SMOKE_DIR, scale=4, n_flat_files=4)
    assert second["writes_cached"] is True
    assert second["flat_write_sec"] == first["flat_write_sec"]
    assert second["clustered_write_sec"] == first["clustered_write_sec"]
    assert second["flat_bytes_read"] == first["flat_bytes_read"]
    assert second["flat_sec"] > 0  # reads re-measured, not replayed
    # the source fingerprint is part of the key: a different dataset at
    # the same basename must map to a different cache dir
    assert os.stat(
        os.path.join(SF_SMOKE_DIR, "orders.parquet")
    ).st_size != 0 and str(
        os.stat(os.path.join(SF_SMOKE_DIR, "orders.parquet")).st_size
    ) in os.path.basename(cache_dir)
    shutil.rmtree(cache_dir, ignore_errors=True)


def test_fingerprints_equivalent_rule():
    """The executable adjudication rule (VERDICT r11 #2): byte totals
    exact, count jitter inside the documented AQE band. The three r11
    driver-vs-idle examples must adjudicate as equivalent; byte moves
    and large count moves must not."""
    from bench import fingerprints_equivalent

    base = {
        "jobs": 4, "stages": 10, "tasks": 96,
        "shuffle_read_bytes": 12345, "shuffle_write_bytes": 12345,
        "input_bytes": 1_000_000, "output_bytes": 0,
    }
    # pagerank: +-1 stage at identical bytes
    assert fingerprints_equivalent(base, {**base, "stages": 11})
    # purchase_attribution: 10 vs 15 stages AND tasks (AQE reused-
    # exchange accounting; r12 observed the task side too)
    assert fingerprints_equivalent(base, {**base, "stages": 15, "tasks": 104})
    assert fingerprints_equivalent(
        {**base, "stages": 10, "tasks": 10},
        {**base, "stages": 15, "tasks": 15},
    )
    # incremental_dedup: +-1 job with a ~370-byte shuffle wobble; and
    # the r12 observation of +15% task jitter at identical bytes
    assert fingerprints_equivalent(
        base, {**base, "jobs": 5, "shuffle_write_bytes": 12345 + 370}
    )
    assert fingerprints_equivalent(
        {**base, "tasks": 119}, {**base, "tasks": 137}
    )
    # pmi_collocations_docs r12: fetch-retry double-counts shuffle READ
    # bytes (+1855 over written) -- read totals are excluded from the
    # equality core, so this adjudicates as the same plan
    assert fingerprints_equivalent(
        base, {**base, "shuffle_read_bytes": 12345 + 1855, "jobs": 5,
               "stages": 12, "tasks": 98}
    )
    # real plan changes: byte volume moved, or counts far outside band
    assert not fingerprints_equivalent(
        base, {**base, "input_bytes": 2_000_000}
    )
    assert not fingerprints_equivalent(
        base, {**base, "shuffle_write_bytes": 50_000}
    )
    assert not fingerprints_equivalent(base, {**base, "stages": 16})
    assert not fingerprints_equivalent(base, {**base, "jobs": 6})
    assert not fingerprints_equivalent(base, {**base, "tasks": 200})
    # None = fingerprinting failed that run: equivalent only to None
    assert fingerprints_equivalent(None, None)
    assert not fingerprints_equivalent(base, None)
