"""Small-file compaction for partitioned parquet tables (100 TB ops
surface).

Incremental ingest (``month_partitioned_ingest``), streaming sinks, and
threaded DAG writes all accrete small files; at scale the cost shows up
as scan-task scheduling overhead and footer I/O long before data volume
does. ``compact_partitions`` walks a table's partition directories,
selects the ones whose file count exceeds what their byte size justifies,
and rewrites each to ``ceil(bytes / target)`` files through
``atomic_overwrite`` -- readers never observe a partial partition, and
untouched partitions keep their exact files (byte-stable history, same
property the incremental rollup relies on).

Driver-side work is bounded by the partition COUNT (directory listing +
one compact job per selected partition), never by row count.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

from taxi_data_pipeline_pset2_spark.sources.sinks import atomic_overwrite


@dataclass(frozen=True)
class CompactionResult:
    partition: str
    files_before: int
    files_after: int
    bytes: int


def _dir_stats(d: str) -> tuple[int, int]:
    files = [
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    ]
    return len(files), sum(os.path.getsize(f) for f in files)


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
) -> list[CompactionResult]:
    """Compact every partition directory whose file count exceeds both
    ``min_files_to_compact`` and its size-justified file count. Returns
    one result per rewritten partition (empty list == nothing to do)."""
    results: list[CompactionResult] = []
    for entry in sorted(os.listdir(path)):
        pdir = os.path.join(path, entry)
        if not (os.path.isdir(pdir) and "=" in entry):
            continue
        n_files, n_bytes = _dir_stats(pdir)
        justified = max(1, math.ceil(n_bytes / target_bytes))
        if n_files < min_files_to_compact or n_files <= justified:
            continue
        df = spark.read.parquet(pdir)
        atomic_overwrite(df.repartition(justified), pdir)
        results.append(
            CompactionResult(entry, n_files, _dir_stats(pdir)[0], n_bytes)
        )
    return results
