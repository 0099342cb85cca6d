"""Streaming distinct-count monitoring with BOUNDED state: a per-key
KMV sketch (the k smallest md5 hashes of the monitored column,
operators/kmv.py) carried across micro-batches and merged per batch by
the exact k-smallest-of-union rule.

Unlike the Misra-Gries heavy-hitter summary next door
(streaming/topk.py), whose state is an APPROXIMATION with an error
bound, the KMV merge is EXACT in the sketch sense: k-smallest of
(carried union batch) equals the k-smallest over all data seen so far,
so the streaming sketch is PATH-INDEPENDENT -- any batching of the same
rows (one batch, ten batches, a replay) lands on the byte-identical
state, and the per-key estimate equals what a from-scratch batch build
would report (pinned in tests/test_streaming_kmv.py). That is the
property a 100 TB ingest monitor needs: "distinct users/documents per
source so far" at k rows per key, with estimates that do not drift
with micro-batch boundaries.

State discipline (the streaming/topk.py contract): per batch, work is
O(batch + keys * k) -- one batch-sized distinct, one union with the
carried state, one per-key rank over the (key, distinct hash) frame.
State is persisted under a batch-id-keyed directory; a replayed batch
recomputes from its predecessor's directory and overwrites
byte-identical state, so at-least-once foreachBatch delivery keeps the
sketch exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.kmv import _h

_STATE_SCHEMA = "key string, h bigint"


def kmv_state_merge(
    state: DataFrame, batch_df: DataFrame, key_col: str, col: str, k: int
) -> DataFrame:
    """One merge step: carried (key, h) sketch rows + a raw batch ->
    new per-key sketch of <= k rows (the exact k-smallest-of-union
    rule). NULL keys and values are excluded, like the batch sketch."""
    from pyspark.sql.window import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    batch_h = (
        batch_df.filter(
            F.col(key_col).isNotNull() & F.col(col).isNotNull()
        )
        .select(
            F.col(key_col).cast("string").alias("key"),
            _h(F.col(col)).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("key").orderBy("h")
    return (
        state.unionByName(batch_h)
        .distinct()
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def _state_dir(base: str, batch_id: int) -> str:
    return os.path.join(base, f"state_batch={batch_id}")


# Engine-owned commit marker, written by on_batch AFTER its parquet
# write returns: completeness is then independent of the Hadoop
# committer's marksuccessfuljobs setting in whichever session wrote
# the state. A crashed overwrite leaves neither this nor _SUCCESS
# (mode("overwrite") clears the directory first, so a stale marker
# cannot survive into a partial rewrite).
_COMMIT_MARKER = "_KMV_COMMIT"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved against ITS filesystem
    (fs.defaultFS for schemeless paths)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _write_commit_marker(spark: SparkSession, state_dir: str) -> None:
    fs, _ = _hadoop_fs(spark, state_dir)
    fs.create(
        spark._jvm.org.apache.hadoop.fs.Path(state_dir + "/" + _COMMIT_MARKER),
        True,
    ).close()


def read_kmv_state(
    spark: SparkSession, state_base: str, batch_id: int
) -> DataFrame:
    """The (key, h) sketch as of ``batch_id``. Only ``batch_id < 0``
    (batch 0's no-predecessor sentinel) maps to the empty sketch; for a
    real batch id the state directory MUST exist and read errors
    propagate -- swallowing a transient IO error or a cleaned state dir
    here would silently reset the sketch and permanently undercount
    every later estimate, breaking the exact/replay-idempotent contract
    (ADVICE r9)."""
    if batch_id < 0:
        return spark.createDataFrame([], _STATE_SCHEMA)
    path = _state_dir(state_base, batch_id)
    # Completeness gate, not mere existence: a crash mid-overwrite
    # leaves a state directory WITHOUT a commit marker, and a
    # schema-pinned spark.read over the partial dir silently yields an
    # empty/truncated sketch -- the exact reset this guard refuses.
    # Resolved through the path's OWN Hadoop FileSystem, never the
    # driver's local os.path: a schemeless path belongs to
    # fs.defaultFS, which need not be file:// on a real cluster (a
    # local check there would raise for every healthy batch). The
    # primary marker is the ENGINE-OWNED _KMV_COMMIT the writer drops
    # after its parquet write returns -- correct regardless of how
    # mapreduce.fileoutputcommitter.marksuccessfuljobs was set in the
    # WRITING session (consulting the reader's config instead would
    # break on any writer/reader config skew); Hadoop's _SUCCESS is
    # accepted as a fallback for state written by older versions.
    fs, jpath = _hadoop_fs(spark, path)
    committed = fs.exists(
        spark._jvm.org.apache.hadoop.fs.Path(path + "/" + _COMMIT_MARKER)
    ) or fs.exists(spark._jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS"))
    if not committed:
        raise FileNotFoundError(
            f"KMV state for batch {batch_id} missing or uncommitted at "
            f"{path}: refusing to substitute an empty sketch"
        )
    return spark.read.schema(_STATE_SCHEMA).parquet(path)


def read_kmv_estimates(
    spark: SparkSession, state_base: str, batch_id: int, k: int
) -> DataFrame:
    """Per-key (n_kept, est_distinct) as of ``batch_id`` -- the same
    estimator as the batch rollup (operators/kmv.py
    kmv_grouped_estimate), so streaming and batch numbers agree
    bit-for-bit on the same data."""
    from taxi_data_pipeline_pset2_spark.operators.kmv import (
        kmv_grouped_estimate,
    )

    return kmv_grouped_estimate(
        read_kmv_state(spark, state_base, batch_id), ["key"], k
    )


def run_streaming_kmv(
    stream_df: DataFrame,
    key_col: str,
    col: str,
    state_base: str,
    checkpoint_dir: str,
    k: int = 64,
):
    """Start the monitor; returns the StreamingQuery. Each batch folds
    its distinct (key, hash) pairs into the carried sketch and writes
    the new sketch under state_batch=<id> (overwrite ->
    replay-idempotent)."""
    spark = stream_df.sparkSession

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        prev = read_kmv_state(spark, state_base, batch_id - 1)
        new_state = kmv_state_merge(prev, batch_df, key_col, col, k)
        out = _state_dir(state_base, batch_id)
        new_state.write.mode("overwrite").parquet(out)
        _write_commit_marker(spark, out)

    return (
        stream_df.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
