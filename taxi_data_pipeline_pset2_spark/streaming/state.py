"""Shared batch-keyed state plumbing for the streaming monitors.

Every foreachBatch monitor in this package (KMV distinct counts,
Misra-Gries top-k) carries its state as ``<base>/state_batch=<id>``
parquet directories, overwritten per batch so replay is idempotent. Two
failure modes must map to ERRORS, never to a silent empty-state reset
(the ADVICE r9 defect class: a swallowed read error permanently corrupts
every later estimate with no signal anywhere):

- a missing predecessor directory for a real batch id (lost state), and
- a directory without a commit marker (a crash mid-overwrite; a
  schema-pinned read over the partial dir silently yields a truncated
  frame).

Only ``batch_id < 0`` -- batch 0's no-predecessor sentinel -- may map to
the empty frame. Completeness is proven by the ENGINE-OWNED
``_KMV_COMMIT`` marker the writer drops after its parquet write returns
(correct regardless of how ``marksuccessfuljobs`` was set in the WRITING
session; Hadoop's ``_SUCCESS`` is accepted as a fallback for state
written by older versions), resolved through the path's OWN Hadoop
FileSystem -- never the driver's local os.path, since a schemeless path
belongs to fs.defaultFS, which need not be file:// on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Engine-owned commit marker (historical name: the KMV monitor grew it
# first). mode("overwrite") clears the directory before rewriting, so a
# stale marker cannot survive into a partial rewrite.
COMMIT_MARKER = "_KMV_COMMIT"


def state_dir(base: str, batch_id: int) -> str:
    return os.path.join(base, f"state_batch={batch_id}")


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved against ITS filesystem
    (fs.defaultFS for schemeless paths)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def path_exists(spark: SparkSession, path: str) -> bool:
    """Existence through the path's own Hadoop FileSystem."""
    fs, jpath = hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def write_commit_marker(spark: SparkSession, state_path: str) -> None:
    """Drop the engine-owned marker AFTER the state write returned."""
    fs, _ = hadoop_fs(spark, state_path)
    fs.create(
        spark._jvm.org.apache.hadoop.fs.Path(
            state_path + "/" + COMMIT_MARKER
        ),
        True,
    ).close()


def read_committed_state(
    spark: SparkSession,
    state_base: str,
    batch_id: int,
    schema: str,
    what: str = "state",
) -> DataFrame:
    """The committed state frame as of ``batch_id``; the empty frame
    ONLY for the ``batch_id < 0`` sentinel. A missing or uncommitted
    directory for a real batch raises FileNotFoundError, and read
    errors propagate -- see the module docstring for why neither may be
    swallowed."""
    if batch_id < 0:
        return spark.createDataFrame([], schema)
    path = state_dir(state_base, batch_id)
    fs, _ = hadoop_fs(spark, path)
    committed = fs.exists(
        spark._jvm.org.apache.hadoop.fs.Path(path + "/" + COMMIT_MARKER)
    ) or fs.exists(spark._jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS"))
    if not committed:
        raise FileNotFoundError(
            f"{what} for batch {batch_id} missing or uncommitted at "
            f"{path}: refusing to substitute an empty frame"
        )
    return spark.read.schema(schema).parquet(path)
