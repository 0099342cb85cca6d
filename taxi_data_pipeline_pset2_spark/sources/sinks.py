"""Warehouse sinks (SURVEY.md S5-S8).

The reference writes via pandas ``to_sql``-style replace (S5) and a
hand-rolled transactional batched ``executemany`` append (S6). Spark:
``DataFrameWriter`` everywhere; atomicity for plain parquet comes from
staging-dir + rename (write-then-swap), and the gold layout applies the
clustering-equivalent partition+sort (X1)."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def overwrite_table(df: DataFrame, path: str) -> None:
    """S5/S7: table materialization (CTAS equivalent)."""
    df.write.mode("overwrite").parquet(path)


def append_table(df: DataFrame, path: str) -> None:
    """S6 append. Spark's parquet append is task-atomic via the commit
    protocol; use ``atomic_overwrite`` when replace semantics must never
    expose a partial table."""
    df.write.mode("append").parquet(path)


def atomic_overwrite(df: DataFrame, path: str) -> None:
    """S6's BEGIN/COMMIT + rollback equivalent for full-table replace:
    write to a staging dir, then swap directories. Readers see the old
    table until the rename; failures leave the old table intact.

    The backup dir (the only remaining copy of the old table once
    ``path`` has been moved aside) is deleted ONLY after the final swap
    succeeds; if the swap fails mid-way the backup is restored to
    ``path``, so every failure mode ends with the original table in
    place. Staging is always cleaned up."""
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    try:
        df.write.mode("overwrite").parquet(staging)
        moved_aside = False
        if os.path.exists(path):
            os.rename(path, backup)
            moved_aside = True
        try:
            os.rename(staging, path)
        except BaseException:
            if moved_aside:
                os.rename(backup, path)  # roll back: restore the old table
            raise
        if moved_aside:
            shutil.rmtree(backup, ignore_errors=True)  # commit point passed
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def clustered_write(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...],
    sort_by: tuple[str, ...],
    n_files: int | None = None,
) -> None:
    """X1: partition + in-partition sort so range predicates get partition
    pruning and parquet row-group min/max skipping -- the Spark rendering
    of the reference's 16.3x ``cluster_by`` win (BASELINE.md).

    ``repartitionByRange`` on (partition cols, sort cols) first: without
    it every input task writes one file into EVERY partition directory
    (tasks hold random rows), so a pruned read of one partition sees only
    as many files as there were input tasks -- potentially ONE giant file,
    serializing the scan the clustering was meant to speed up. Range
    partitioning gives each directory ~``n_files``/n_partitions disjoint
    sorted files: pruned AND parallel, the micro-partition layout."""
    n = int(
        n_files
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in (*partition_by, *sort_by)]
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*sort_by)
        .write.mode("overwrite")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def export_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """S8: golden-CSV style export. ``coalesce(1)`` only for result-sized
    frames -- never for table-scale data."""
    w = df.coalesce(1) if single_file else df
    w.write.mode("overwrite").option("header", True).csv(path)


def export_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """JSONL export -- the interchange format training corpora ship in.
    One .jsonl(.gz) file per partition (never coalesced: a corpus export
    is table-scale, and downstream loaders shard by file)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Bucketed managed table: pre-shuffles once at write so every future
    join/aggregate on ``bucket_by`` is exchange-free (Spark reads bucket
    files co-located by key). The 100 TB answer for repeated large-large
    joins the star schema can't broadcast -- pay the shuffle once, reuse
    it forever. Requires ``saveAsTable`` (bucket metadata lives in the
    catalog, not in plain parquet paths)."""
    w = df.write.mode("overwrite").format("parquet")
    w = w.bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def month_partitioned_ingest(
    spark: SparkSession, df: DataFrame, path: str, ts_col: str
) -> None:
    """Idempotent monthly backfill (SURVEY.md 2.11): dynamic partition
    overwrite replaces only the months present in this batch -- the
    skip-if-downloaded/resume loop becomes a storage property."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.withColumn("load_month", F.date_format(F.col(ts_col), "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("load_month")
        .parquet(path)
    )


def zorder_key(df: DataFrame, zcols: tuple[str, ...], bits: int = 6):
    """Morton (Z-order) sort key over numeric columns: per-column
    EQUAL-FREQUENCY grid cells (approxQuantile boundaries), then bit
    interleaving -- rows close in EVERY dimension get close keys, so
    sorting by the key makes parquet row-group min/max stats tight on
    ALL the z-columns at once (Delta's OPTIMIZE ZORDER BY; a linear sort
    only helps its leading column).

    Quantile cells rather than min/max scaling on purpose: real fact
    columns are skewed, and range-scaled cells collapse the data mass
    into a handful of low cells, destroying the interleave's
    discrimination exactly where the rows are. Equal-frequency cells put
    ~the same row count in every cell regardless of distribution.

    Cost: one approxQuantile sketch pass per call (driver gets
    2^bits-1 boundaries per column -- literals in the plan); the cell
    assignment is a chain of 2^bits-1 codegen comparisons per column and
    the interleave pure bit arithmetic -- no UDF, no extra shuffle."""
    from pyspark.sql import functions as F

    n_cells = 1 << bits
    probs = [i / n_cells for i in range(1, n_cells)]
    key = F.lit(0).cast("bigint")
    for ci, c in enumerate(zcols):
        bounds = sorted(set(df.stat.approxQuantile(c, probs, 0.001)))
        if not bounds:
            continue  # constant column contributes nothing to ordering
        cell = None
        for b in bounds:
            term = (F.col(c).cast("double") > F.lit(float(b))).cast("bigint")
            cell = term if cell is None else cell + term
        interleaved = None
        for b in range(bits):
            term = F.shiftleft(
                F.shiftright(cell, b).bitwiseAND(F.lit(1)),
                b * len(zcols) + ci,
            )
            interleaved = term if interleaved is None else interleaved + term
        key = key + interleaved
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    zcols: tuple[str, ...],
    bits: int = 6,
    n_files: int | None = None,
) -> None:
    """Multi-column clustering layout: range-partition + sort by the
    Morton key so a box predicate on ANY subset of ``zcols`` skips most
    row groups (``clustered_write`` serves the single-dimension case).
    The key is computed, used for layout, and not persisted."""
    from pyspark.sql import functions as F

    n = int(
        n_files
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    key = zorder_key(df, zcols, bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    delete_pred=None,
) -> None:
    """MERGE INTO for plain parquet: rows in ``updates`` replace
    same-key rows in the target (last-writer-wins on the full row),
    unmatched update rows are inserted, and rows matching
    ``delete_pred`` (evaluated on the merged frame) are dropped --
    the update/insert/delete triad of SQL MERGE, rendered as one
    anti-join + union + filter and committed through
    :func:`atomic_overwrite` so readers never see a partial table.

    Scale notes: the anti-join shuffles on the merge key exactly like a
    real MERGE's join; with an updates side that is batch-sized Spark's
    AQE broadcasts it and the target is scan-shaped. Unlike a
    transactional table format (Delta/Iceberg) this rewrites the whole
    table -- the honest contract for UNPARTITIONED plain parquet; for a
    directory-partitioned table use :func:`merge_upsert_partitioned`,
    which rewrites only the partitions the batch touches."""
    target = spark.read.parquet(path)
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"merge schema mismatch: target {sorted(target.columns)} vs "
            f"updates {sorted(updates.columns)}"
        )
    kept = target.join(updates.select(*key_cols).distinct(), list(key_cols), "left_anti")
    merged = kept.unionByName(updates)
    if delete_pred is not None:
        # SQL MERGE's DELETE removes only rows where the predicate is TRUE;
        # a bare ~pred would also drop NULL-predicate rows (3VL: ~NULL is
        # NULL, filtered out), so coalesce NULL to "not deleted".
        merged = merged.filter(~F.coalesce(delete_pred, F.lit(False)))
    atomic_overwrite(merged, path)


def _partition_dirnames(spark: SparkSession, partition_col: str, values: list) -> dict:
    """Map each partition value to the ``<col>=<escaped>`` directory name
    Spark writes for it. Resolved by letting Spark itself write a
    one-row-per-value frame into a scratch dir and listing the result --
    engine-authoritative escaping instead of a reimplementation of the
    partition-path encoder. One tiny (len(values)-row) local job."""
    import tempfile

    scratch = tempfile.mkdtemp(prefix="partnames_")
    out_dir = os.path.join(scratch, "names")
    try:
        (
            spark.createDataFrame([(v, 1) for v in values], [partition_col, "_x"])
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(out_dir)
        )
        dirs = sorted(
            d for d in os.listdir(out_dir) if d.startswith(f"{partition_col}=")
        )
        if len(dirs) != len(set(values)):
            raise ValueError(
                f"partition-name resolution mismatch: {len(set(values))} "
                f"values -> {len(dirs)} directories (NULL partition values "
                f"are not mergeable)"
            )
        from urllib.parse import unquote

        mapping = {}
        for d in dirs:
            decoded = unquote(d.split("=", 1)[1])
            # match the decoded dir value back to the original python
            # value (str() matches Spark's partition-path rendering for
            # the string/int partition types used here)
            for v in values:
                if str(v) == decoded:
                    mapping[v] = d
                    break
        if len(mapping) != len(set(values)):
            raise ValueError(
                f"could not map partition values to directory names: "
                f"{sorted(set(map(str, values)) - set(map(str, mapping)))}"
            )
        return mapping
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def merge_upsert_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    partition_col: str,
    delete_pred=None,
    max_partitions: int = 10_000,
) -> None:
    """Partition-scoped MERGE for a directory-partitioned parquet table
    (``path/<partition_col>=<value>/...`` as written by
    ``month_partitioned_ingest`` / ``clustered_write``).

    Only the partitions present in the updates batch are read, merged
    and atomically swapped; every other partition's files are untouched
    bytes on disk -- at 100 TB a merge into one month must not rewrite
    ten years. The merge itself is the same anti-join + union + DELETE
    triad as :func:`merge_upsert`, but the target side is a
    partition-pruned scan (the ``isin`` filter prunes at planning time,
    so unaffected partitions are never opened).

    Contract: a key's partition value must be stable across target and
    updates (the usual MERGE-on-partitioned-table invariant -- e.g. the
    partition is derived from an immutable attribute of the key). A key
    moved to a different partition by an update would leave its old row
    in an unaffected partition untouched.

    Swap protocol: merged partitions are staged, then swapped in
    directory-by-directory with the displaced originals kept as backups
    until every swap has succeeded; any failure rolls every completed
    swap back, so readers see either the old or the new state of each
    partition and never a half-written one. A partition whose rows are
    all deleted by ``delete_pred`` is removed. ``max_partitions`` bounds
    the driver-side partition list (the affected set is batch-sized by
    design; a batch spanning ten thousand partitions is a full-table
    rewrite and should use :func:`merge_upsert`)."""
    target = spark.read.parquet(path)
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"merge schema mismatch: target {sorted(target.columns)} vs "
            f"updates {sorted(updates.columns)}"
        )
    if partition_col not in updates.columns:
        raise ValueError(f"updates lack partition column {partition_col!r}")
    vals = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]  # batch-bounded by contract; guarded below
    if any(v is None for v in vals):
        raise ValueError("NULL partition values are not mergeable")
    if len(vals) > max_partitions:
        raise ValueError(
            f"updates span {len(vals)} partitions (> {max_partitions}); "
            "use merge_upsert for a full-table rewrite"
        )
    affected = target.filter(F.col(partition_col).isin(vals))
    kept = affected.join(
        updates.select(*key_cols).distinct(), list(key_cols), "left_anti"
    )
    merged = kept.unionByName(updates)
    if delete_pred is not None:
        merged = merged.filter(~F.coalesce(delete_pred, F.lit(False)))

    staging = f"{path}__mstage_{uuid.uuid4().hex[:8]}"
    backup = f"{path}__mold_{uuid.uuid4().hex[:8]}"
    names = _partition_dirnames(spark, partition_col, vals)
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
        os.makedirs(backup, exist_ok=True)
        moved_in: list[str] = []  # staged dirs renamed into the table
        moved_out: list[str] = []  # original dirs moved aside to backup
        try:
            for d in sorted(names.values()):
                tdir = os.path.join(path, d)
                sdir = os.path.join(staging, d)
                if os.path.exists(tdir):
                    os.rename(tdir, os.path.join(backup, d))
                    moved_out.append(d)
                if os.path.exists(sdir):
                    os.rename(sdir, tdir)
                    moved_in.append(d)
        except BaseException:
            # roll back in reverse: staged dirs return to staging, then
            # displaced originals return to the table
            for d in reversed(moved_in):
                os.rename(os.path.join(path, d), os.path.join(staging, d))
            for d in reversed(moved_out):
                os.rename(os.path.join(backup, d), os.path.join(path, d))
            raise
        shutil.rmtree(backup, ignore_errors=True)  # commit point passed
    finally:
        shutil.rmtree(staging, ignore_errors=True)
