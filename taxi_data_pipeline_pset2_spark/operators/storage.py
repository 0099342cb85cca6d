"""Parquet storage audit from footers only: per-column compressed /
uncompressed bytes across a table's files -- "which column eats the
bytes" answered without scanning a single data page.

The physical-design feedback loop the layout machinery needs
(sinks.clustered_write / zorder_write optimize SKIPPING; this measures
SIZE): an embedding column at 4 KB/row or a text column compressing at
1.05x is a storage decision (quantize -- operators/quantize.py --
re-encode, or split the column out), and footers carry the answer for
free.

Scale shape: the file list distributes as rows and each task opens
ONLY the footers of its files (pyarrow metadata read, no data pages)
via mapInPandas -- at 10^6 files that is a million ~kilobyte reads
spread across the cluster, never a driver loop. The per-column
aggregate is column-count-sized. Exact integer byte sums; the DuckDB
oracle recomputes the identical numbers from parquet_metadata() -- two
independent footer parsers agreeing on every byte.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = (
    "column string, n_row_groups long, compressed_bytes long, "
    "uncompressed_bytes long"
)


def _footer_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import pyarrow.parquet as pq

    for pdf in batches:
        rows = []
        for path in pdf["path"]:
            md = pq.ParquetFile(path).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    rows.append(
                        (
                            c.path_in_schema,
                            1,
                            c.total_compressed_size,
                            c.total_uncompressed_size,
                        )
                    )
        yield pd.DataFrame(
            rows,
            columns=[
                "column",
                "n_row_groups",
                "compressed_bytes",
                "uncompressed_bytes",
            ],
        )


def column_storage_report(spark: SparkSession, path: str) -> DataFrame:
    """(column, n_row_groups, compressed_bytes, uncompressed_bytes,
    compression_ratio) per leaf column over the parquet file or
    directory at ``path``, ordered by column. Ratio = uncompressed /
    compressed, 6-dp (NULL for zero-byte columns)."""
    if os.path.isdir(path):
        # recursive walk (r11): partitioned tables keep their files in
        # key=value subdirectories -- a flat listdir reported "no
        # parquet files" for exactly the layouts clustered_write makes
        files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
    else:
        files = [path]
    if not files:
        raise ValueError(f"no parquet files under {path}")
    flist = spark.createDataFrame([(f,) for f in files], "path string")
    stats = flist.mapInPandas(_footer_stats, _SCHEMA)
    return (
        stats.groupBy("column")
        .agg(
            F.sum("n_row_groups").cast("bigint").alias("n_row_groups"),
            F.sum("compressed_bytes").cast("bigint").alias("compressed_bytes"),
            F.sum("uncompressed_bytes")
            .cast("bigint")
            .alias("uncompressed_bytes"),
        )
        .withColumn(
            "compression_ratio",
            F.round(
                F.when(
                    F.col("compressed_bytes") > 0,
                    F.col("uncompressed_bytes").cast("double")
                    / F.col("compressed_bytes").cast("double"),
                ),
                6,
            ),
        )
        .orderBy("column")
    )
