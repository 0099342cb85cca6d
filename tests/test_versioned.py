"""Versioned parquet tables: commit protocol, time travel, append as
metadata, vacuum retention, crash-orphan sweep."""

from __future__ import annotations

import json
import os

import pytest

from taxi_data_pipeline_pset2_spark.sources.versioned import (
    list_versions,
    read_version,
    vacuum,
    versioned_write,
)


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x int")


def test_versions_and_time_travel(spark, tmp_path):
    p = str(tmp_path / "tbl")
    assert list_versions(p) == []
    with pytest.raises(FileNotFoundError):
        read_version(spark, p)

    v0 = versioned_write(_df(spark, [1, 2]), p)
    v1 = versioned_write(_df(spark, [3]), p, mode="append")
    v2 = versioned_write(_df(spark, [9]), p)  # overwrite: fresh table
    assert (v0, v1, v2) == (0, 1, 2)
    assert list_versions(p) == [0, 1, 2]

    def vals(v=None):
        return sorted(r.x for r in read_version(spark, p, v).collect())

    assert vals(0) == [1, 2]
    assert vals(1) == [1, 2, 3]  # append extended v0's file set
    assert vals(2) == [9]
    assert vals() == [9]  # latest
    with pytest.raises(ValueError):
        read_version(spark, p, 7)


def test_append_is_metadata_only(spark, tmp_path):
    """Append must not rewrite existing segments: v0's files stay
    byte-identical (same set, sizes, mtimes) after the append commit."""
    p = str(tmp_path / "tbl")
    versioned_write(_df(spark, list(range(50))), p)
    data = os.path.join(p, "data")

    def snap():
        out = {}
        for seg in os.listdir(data):
            for f in os.listdir(os.path.join(data, seg)):
                if f.endswith(".parquet"):
                    fp = os.path.join(data, seg, f)
                    out[fp] = (os.path.getsize(fp), os.stat(fp).st_mtime_ns)
        return out

    before = snap()
    versioned_write(_df(spark, [99]), p, mode="append")
    after = snap()
    for fp, sig in before.items():
        assert after[fp] == sig


def test_vacuum_retention_and_orphan_sweep(spark, tmp_path):
    p = str(tmp_path / "tbl")
    versioned_write(_df(spark, [1]), p)
    versioned_write(_df(spark, [2]), p)
    versioned_write(_df(spark, [3]), p, mode="append")
    # orphan segment from a "crashed writer": data dir, no manifest
    orphan = os.path.join(p, "data", "deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-x.parquet"), "w") as f:
        f.write("junk")

    removed = vacuum(p, keep_last=2, grace_seconds=0)
    assert list_versions(p) == [1, 2]
    assert any("deadbeef" in r for r in removed)
    # kept versions still readable (v2 references v1's segment too)
    assert sorted(r.x for r in read_version(spark, p, 2).collect()) == [2, 3]
    assert sorted(r.x for r in read_version(spark, p, 1).collect()) == [2]
    with pytest.raises(ValueError):
        vacuum(p, keep_last=0)
    with pytest.raises(ValueError):
        vacuum(p, grace_seconds=-1)


def test_vacuum_grace_spares_in_flight_segment(spark, tmp_path):
    """A segment written but not yet manifest-committed (an in-flight
    versioned_write, indistinguishable from a crash orphan) survives a
    vacuum inside the grace window; once past it, it is swept."""
    p = str(tmp_path / "tbl")
    versioned_write(_df(spark, [1]), p)
    inflight = os.path.join(p, "data", "inflight0")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "w") as f:
        f.write("pending")

    removed = vacuum(p, keep_last=1)  # default 1h grace
    assert not any("inflight0" in r for r in removed)
    assert os.path.isdir(inflight)
    # the "commit" lands after the racing vacuum -- data intact
    assert os.path.exists(os.path.join(inflight, "part-0.parquet"))
    # age it past the grace window: now it really is a crash orphan
    old = os.path.getmtime(inflight) - 7200
    os.utime(inflight, (old, old))
    removed = vacuum(p, keep_last=1)
    assert any("inflight0" in r for r in removed)
    assert not os.path.isdir(inflight)


def test_torn_manifest_never_visible(spark, tmp_path):
    """A .tmp manifest (crash before rename) must be invisible to
    readers and version listing."""
    p = str(tmp_path / "tbl")
    versioned_write(_df(spark, [1]), p)
    tmp = os.path.join(p, "_manifests", ".tmp-crashed.json")
    with open(tmp, "w") as f:
        json.dump({"version": 99, "files": ["/nope"]}, f)
    assert list_versions(p) == [0]
    assert sorted(r.x for r in read_version(spark, p).collect()) == [1]


def test_versioned_diff_between_versions(spark, tmp_path):
    from taxi_data_pipeline_pset2_spark.sources.versioned import versioned_diff

    p = str(tmp_path / "tbl")
    df0 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    versioned_write(df0, p)
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string"
    )
    versioned_write(df1, p)  # overwrite: a new logical snapshot
    out = {
        r.k: r.change_type
        for r in versioned_diff(spark, p, 0, 1, ["k"]).collect()
    }
    assert out == {2: "update", 3: "delete", 4: "insert"}


def test_read_version_merge_schema_additive_evolution(spark, tmp_path):
    p = str(tmp_path / "tbl")
    versioned_write(
        spark.createDataFrame([(1, "a")], "k long, v string"), p
    )
    versioned_write(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"),
        p,
        mode="append",
    )
    wide = read_version(spark, p, merge_schema=True)
    assert set(wide.columns) == {"k", "v", "score"}
    rows = {r.k: r.score for r in wide.collect()}
    assert rows[1] is None and rows[2] == 9.5  # old segment reads NULL


def test_vacuum_path_spelling_does_not_destroy_live_segments(spark, tmp_path):
    """Segment identity must be the hex dir NAME, not a raw path string:
    a vacuum called with a different spelling of the table path
    ("<dir>/./tbl" vs "<dir>/tbl") would otherwise match nothing in the
    manifest's referenced set and rmtree every live segment past the
    grace window."""
    p = str(tmp_path / "tbl")
    dotted = str(tmp_path) + "/./tbl"  # same table, different spelling
    versioned_write(_df(spark, [1]), dotted)
    versioned_write(_df(spark, [2]), dotted)
    removed = vacuum(p, keep_last=2, grace_seconds=0)
    assert removed == []
    assert sorted(r.x for r in read_version(spark, p, 1).collect()) == [2]
    assert sorted(r.x for r in read_version(spark, p, 0).collect()) == [1]
