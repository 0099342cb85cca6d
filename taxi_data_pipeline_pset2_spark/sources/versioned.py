"""Versioned parquet tables: manifest-committed snapshots with time
travel and vacuum -- the transaction-log pattern (Delta/Iceberg's core
idea, re-expressed minimally over plain parquet + a JSON manifest per
version) for engines that need reproducible reads without a table
format dependency.

Layout::

    <path>/data/<uuid>/part-*.parquet   immutable data segments
    <path>/_manifests/v00000042.json    {"version", "files", "mode"}

Commit protocol: data files are fully written first, then the manifest
appears via an atomic ``os.rename`` -- a reader either sees a complete
version or doesn't see it at all; a writer crash leaves only an
unreferenced data directory (cleaned by vacuum), never a torn table.
Overwrite commits a manifest listing ONLY the new segment; append lists
the previous manifest's files plus the new segment (data files are
never rewritten or moved -- append is a metadata operation plus the new
segment, exactly why the pattern scales: a 100 TB table's append costs
the batch, and time travel costs nothing until vacuum).

Reproducibility: training-data pipelines pin ``read_version(path, v)``
in the run manifest, so a corpus rebuild reads byte-identical inputs
even while the table keeps ingesting.

Concurrency contract: single writer (the reference's Mage scheduler
semantics -- one pipeline owns a table); readers are lock-free at any
version. Multi-writer coordination needs a real table format's
conditional commit and is out of scope by design.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _manifest_dir(path: str) -> str:
    return os.path.join(path, _MANIFEST_DIR)


def list_versions(path: str) -> list[int]:
    """Committed versions, ascending; [] for a fresh/missing table."""
    d = _manifest_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(path), f"v{version:08d}.json")) as f:
        return json.load(f)


def committed_tags(path: str) -> dict[str, int]:
    """tag -> version for every tagged commit. One manifest read: each
    commit carries the CUMULATIVE tag map forward, so the check a
    streaming writer runs per batch is O(1) manifest I/O, not a scan of
    every historical manifest (which would make a long-lived stream's
    total manifest reads quadratic)."""
    versions = list_versions(path)
    if not versions:
        return {}
    return dict(_read_manifest(path, versions[-1]).get("tags", {}))


def versioned_write(
    df: DataFrame, path: str, mode: str = "overwrite", tag: str | None = None
) -> int:
    """Commit ``df`` as a new version; returns the version number.
    ``mode='overwrite'`` starts a fresh logical table; ``'append'``
    extends the latest version's file set.

    ``tag`` makes the commit IDEMPOTENT per tag (the transactional-
    writer guard): if a committed version already carries this tag, the
    write is skipped and that version returned. Tag choice defines the
    dedup identity -- streaming/ingest.py tags with batch id PLUS a
    content checksum, so only a byte-identical redelivery is a no-op."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    versions = list_versions(path)
    # one helper owns the tag-map read (committed_tags): duplicating it
    # here would let tag storage and the idempotency check drift apart
    tags = committed_tags(path) if versions else {}
    if tag is not None and tag in tags:
        return tags[tag]
    next_v = (versions[-1] + 1) if versions else 0

    seg = os.path.join(path, _DATA_DIR, uuid.uuid4().hex)
    df.write.mode("error").parquet(seg)
    seg_files = sorted(
        os.path.join(seg, f) for f in os.listdir(seg) if f.endswith(".parquet")
    )
    files = list(seg_files)
    if mode == "append" and versions:
        files = _read_manifest(path, versions[-1])["files"] + seg_files

    os.makedirs(_manifest_dir(path), exist_ok=True)
    if tag is not None:
        tags[tag] = next_v
    manifest = {"version": next_v, "mode": mode, "files": files, "tags": tags}
    tmp = os.path.join(_manifest_dir(path), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(_manifest_dir(path), f"v{next_v:08d}.json"))
    return next_v


def read_version(
    spark: SparkSession, path: str, version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """The table as of ``version`` (default: latest). Empty-file-set
    versions raise (a committed version always lists >= 1 file).

    ``merge_schema=True`` unions the schemas of a version whose
    appended segments added columns (additive evolution: old segments
    read the new columns as NULL). Off by default -- plain reads take
    one segment's schema, and a WIDER read should be an explicit
    choice, the same as parquet's own mergeSchema option."""
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no committed versions at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    files = _read_manifest(path, v)["files"]
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*files)


def versioned_diff(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Changelog between two committed versions of a versioned table:
    the time-travel reads composed with the CDC snapshot diff
    (operators/cdc.py), so "what changed between Monday's corpus and
    today's" is one call -- the audit every reproducible-training-data
    story needs next to the pinned version ids. One full-outer
    co-shuffle of the two versions, exactly snapshot_diff's cost."""
    from taxi_data_pipeline_pset2_spark.operators.cdc import snapshot_diff

    return snapshot_diff(
        read_version(spark, path, v_old),
        read_version(spark, path, v_new),
        key_cols,
        compare_cols,
    )


def vacuum(
    path: str, keep_last: int = 2, grace_seconds: float = 3600.0
) -> list[str]:
    """Drop manifests older than the last ``keep_last`` and delete data
    segments no kept manifest references. Returns removed segment dirs.
    Also sweeps orphan segments from crashed writers (data dirs no
    manifest ever referenced) -- but an orphan younger than
    ``grace_seconds`` is SPARED: a segment fully written whose manifest
    rename hasn't landed yet is indistinguishable from a crash orphan,
    so an age grace window (Delta vacuum's retention idea) keeps a
    vacuum racing a slow in-flight commit from destroying it. Segments
    referenced by a kept manifest are never age-checked."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if grace_seconds < 0:
        raise ValueError("grace_seconds must be >= 0")
    import time

    versions = list_versions(path)
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    # segment identity = the hex dir NAME under <path>/data, never the
    # raw path string: manifests record files with whatever spelling of
    # `path` the WRITER used, and a raw-string comparison against this
    # caller's spelling ("./tbl" vs "tbl" vs absolute) would match
    # nothing and rmtree every live segment past the grace window
    referenced: set[str] = set()
    for v in keep:
        for f in _read_manifest(path, v)["files"]:
            referenced.add(os.path.basename(os.path.dirname(f)))
    for v in drop:
        os.remove(os.path.join(_manifest_dir(path), f"v{v:08d}.json"))
    removed = []
    now = time.time()
    data_root = os.path.join(path, _DATA_DIR)
    if os.path.isdir(data_root):
        for seg in sorted(os.listdir(data_root)):
            seg_path = os.path.join(data_root, seg)
            if seg in referenced:
                continue
            try:
                age = now - os.path.getmtime(seg_path)
            except OSError:
                continue  # concurrently removed
            if age < grace_seconds:
                continue  # possibly an in-flight commit
            shutil.rmtree(seg_path, ignore_errors=True)
            removed.append(seg_path)
    return removed
