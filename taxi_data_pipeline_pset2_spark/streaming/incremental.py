"""Streaming incremental dedup: the foreachBatch composition of the
document stream with the persisted LSH signature index
(operators/incremental.py) -- the continuously-ingesting form of the
reference's monthly load loop (``loader_yellow_green.py:38``), run as a
Structured Streaming pipeline instead of a cron script.

Per micro-batch:
 1. screen the batch against the CURRENT index (one broadcast of the
    batch onto an index scan -- O(batch) + one scan, the incremental
    contract);
 2. write the batch's survivors into a batch-id-keyed directory
    (idempotent overwrite on replay, same discipline as
    ``events.run_batchwise_to_parquet``);
 3. APPEND only the survivors' signature rows the index does not
    already hold (batch-sized anti-join) -- the index grows by O(batch)
    files per batch and is NEVER rewritten, unlike an
    ``atomic_overwrite`` of the whole index, which would be O(corpus)
    per batch at 100 TB.

Replay idempotence (at-least-once foreachBatch delivery):
 - survivors of a replayed batch re-resolve identically: a survivor's
   own signatures are excluded by id inside ``match_against_index``,
   and two same-batch survivors never share >= min_shared_bands bands
   (they would have been one connected component);
 - the index append anti-joins on doc_id, so re-appending an already-
   indexed batch is a no-op;
 - the survivors directory is overwritten per batch id.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.incremental import (
    incremental_dedup,
)

def _index_schema(id_col: str = "doc_id") -> str:
    """MinHash band-signature index layout, keyed by the caller's id
    column (ADVICE r5: a hardcoded doc_id made id_col a trap -- a
    non-default id read the index as all-NULL and broke the
    anti-join)."""
    return f"{id_col} long, band int, band_sig long"


def read_docs_stream(
    spark: SparkSession,
    docs_dir: str,
    max_files_per_trigger: int = 1,
    schema: str | None = None,
) -> DataFrame:
    """File-arrival document stream: each parquet file dropped into
    ``docs_dir`` is one ingest unit; ``maxFilesPerTrigger`` bounds the
    batch size (and in tests splits a backfill into micro-batches).
    Pass ``schema`` to start the stream BEFORE the first file lands
    (the normal deployment order for a file-arrival source) -- without
    it the schema is probed from existing files, and an empty dir is
    reported as a clear error instead of the raw AnalysisException."""
    if schema is None:
        from pyspark.errors import AnalysisException

        try:
            schema = spark.read.parquet(docs_dir).schema
        except AnalysisException as exc:
            raise ValueError(
                f"cannot infer a stream schema from {docs_dir} (no parquet "
                "yet?): pass schema= to start the stream before the first "
                "file lands"
            ) from exc
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )


def load_index(
    spark: SparkSession, index_dir: str, id_col: str = "doc_id"
) -> DataFrame:
    """The persisted signature index; empty-typed frame before the
    first batch commits. Only AnalysisException (path not found / empty
    dir) falls back -- a genuine read error (permissions, corrupt
    footer) must propagate, not silently restart the index (cf. ADVICE
    r4 on the stream-schema probe). A local os.path probe would be
    wrong here: the index lives on whatever filesystem Spark sees
    (HDFS/S3), not necessarily the driver's local disk."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(_index_schema(id_col)).parquet(index_dir)
    except AnalysisException:
        return spark.createDataFrame([], _index_schema(id_col))


def run_streaming_incremental_dedup(
    docs_stream: DataFrame,
    index_dir: str,
    survivors_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Drain ``docs_stream`` (availableNow) through the incremental
    dedup screen, growing the index as batches commit."""
    spark = docs_stream.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        index = load_index(spark, index_dir, id_col=id_col)
        res = incremental_dedup(
            batch_df, index, text_col=text_col, id_col=id_col
        )
        survivors = res.survivors.localCheckpoint(eager=True)
        survivors.write.mode("overwrite").parquet(
            os.path.join(survivors_dir, f"batch_id={batch_id}")
        )
        # the signature delta incremental_dedup already computed -- NOT
        # a second shingle->hash->min pass over the survivors' text
        # (that pipeline is the dominant per-batch cost). The anti-join
        # keeps a replayed batch from double-appending its rows.
        new_rows = res.new_index_rows.join(
            index.select(id_col).distinct(), id_col, "left_anti"
        )
        new_rows.write.mode("append").parquet(index_dir)

    (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_streaming_survivors(spark: SparkSession, survivors_dir: str) -> DataFrame:
    """All surviving docs across batches (batch_id exposed via partition
    discovery)."""
    return spark.read.option("basePath", survivors_dir).parquet(survivors_dir)
