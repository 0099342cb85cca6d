"""Streaming ingest into the versioned table: each micro-batch commits
one APPEND version, exactly once per batch id.

The composition that turns the versioned store (sources/versioned.py)
into a continuously-fed, time-travelable corpus: readers pin a version
for reproducible training runs while the stream keeps appending, and
every batch boundary is a named, auditable commit.

Exactly-once under at-least-once foreachBatch delivery comes from the
TAGGED commit: the batch id is the commit tag, and ``versioned_write``
skips a tag it has already committed -- a replayed batch is a no-op at
the manifest level, so the table never double-appends (the same
appId/version guard Delta's transactional writers use). Single-writer
contract is inherited: one streaming query owns one table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from taxi_data_pipeline_pset2_spark.sources.versioned import versioned_write


def run_streaming_versioned_ingest(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
):
    """Start the ingest; returns the StreamingQuery. Batch ``n``
    commits as an append version tagged ``batch-n``."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        versioned_write(
            batch_df, table_path, mode="append", tag=f"batch-{batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_latest(spark: SparkSession, table_path: str) -> DataFrame:
    """Convenience: the table at its latest committed version."""
    from taxi_data_pipeline_pset2_spark.sources.versioned import read_version

    return read_version(spark, table_path)
