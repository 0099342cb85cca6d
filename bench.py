"""Benchmark harness: times the headline catalog queries.

Run: ``python bench.py`` -- reads ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via the noop sink (no driver-side collect cost,
no result materialization skew). Best-of-3 per query to damp JIT/first-read
and ambient-load noise; the flagship comparison is BASELINE.md's
clustering-demo aggregate (catalog ``monthly_trend``), measured flat AND
clustered (``clustering_demo``).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def clustering_demo(spark, sf_dir: str, scale: int = 64, n_flat_files: int = 64) -> dict:
    """The reference's headline number (README.md:79-97 / BASELINE.md:
    826M-row aggregate 1,500 ms unclustered -> 92 ms clustered, 16.3x),
    reproduced as the same data in two layouts:

    - unclustered: rows round-robin shuffled across ``n_flat_files``
      files, so every file's o_orderdate min/max spans the whole range
      and no row group can be skipped (Snowflake's "no clustering");
    - clustered (X1): partitioned by order year, sorted by o_orderdate
      within partitions, so the year predicate prunes whole directories.

    The identical flagship aggregate body runs against both. The fact is
    replicated ``scale``x first (both layouts get the identical scaled
    frame) because at local SF the raw orders table is a single small
    file where fixed per-query overhead hides any layout effect; the
    reference's own demo runs on 826M rows.

    Besides wall-clock (which on a page-cached local disk understates
    the win: the shared aggregate + fixed multi-stage overhead dominate
    sub-second queries), the demo reports the BYTES each layout must
    read -- the filesystem fact that becomes the speedup on a real
    cluster, where the scan, not the 60-row aggregate, is the cost."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.queries.relational import monthly_trend_agg
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table
    from taxi_data_pipeline_pset2_spark.sources.sinks import clustered_write

    tmp = tempfile.mkdtemp(prefix="bench_clustered_")
    flat_path = os.path.join(tmp, "orders_unclustered")
    clus_path = os.path.join(tmp, "orders_clustered")
    try:
        orders = load_table(spark, sf_dir, "orders").withColumn(
            "o_year", F.year("o_orderdate")
        )
        # Replicas get distinct keys/prices (jitter) so the clustered
        # copy can't RLE-collapse 32 identical adjacent rows after the
        # sort -- that would overstate the byte win as a replication
        # artifact. Dates repeat across replicas, as real fact dates do.
        scaled = (
            orders.withColumn(
                "_rep", F.explode(F.array(*[F.lit(i) for i in range(scale)]))
            )
            .withColumn(
                "o_orderkey", F.col("o_orderkey") * scale + F.col("_rep")
            )
            .withColumn(
                "o_totalprice",
                F.col("o_totalprice") + F.col("_rep").cast("double") / 100.0,
            )
            .drop("_rep")
        )
        scaled.repartition(n_flat_files).write.mode("overwrite").parquet(flat_path)
        t0 = time.perf_counter()
        clustered_write(
            scaled, clus_path, partition_by=("o_year",), sort_by=("o_orderdate",)
        )
        write_sec = time.perf_counter() - t0

        # The reference's timed query targets a CONSTANT year
        # (``WHERE pickup_date IN 2020``); resolve min-year once outside
        # both timings so the comparison is scan-vs-scan, not probe cost.
        min_year = orders.agg(F.min("o_year")).collect()[0][0]

        def flagship(path: str):
            back = spark.read.parquet(path)
            return monthly_trend_agg(back.filter(F.col("o_year") == min_year))

        # interleaved best-of-3 so page-cache state and machine noise hit
        # both layouts symmetrically
        best = {"flat_sec": float("inf"), "clustered_sec": float("inf")}
        for _ in range(3):
            for name, path in (("flat_sec", flat_path), ("clustered_sec", clus_path)):
                t0 = time.perf_counter()
                flagship(path).write.format("noop").mode("overwrite").save()
                best[name] = min(best[name], time.perf_counter() - t0)
        out = {name: round(v, 4) for name, v in best.items()}
        out["clustered_write_sec"] = round(write_sec, 4)
        out["scale"] = scale
        out["speedup"] = (
            round(out["flat_sec"] / out["clustered_sec"], 2)
            if out["clustered_sec"] > 0
            else None
        )

        def _dir_bytes(d: str) -> int:
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(d)
                for f in fs
                if f.endswith(".parquet")
            )

        # the unclustered scan must read every file; the clustered scan
        # lists and reads only the predicate's partition directory
        out["flat_bytes_read"] = _dir_bytes(flat_path)
        out["clustered_bytes_read"] = _dir_bytes(
            os.path.join(clus_path, f"o_year={min_year}")
        )
        out["bytes_pruned_ratio"] = (
            round(out["flat_bytes_read"] / out["clustered_bytes_read"], 2)
            if out["clustered_bytes_read"]
            else None
        )
        out["note"] = (
            "wall-clock parity is expected on a page-cached local disk "
            "(fixed multi-stage overhead dominates sub-second queries); "
            "bytes_pruned_ratio is the signal that becomes the speedup "
            "on a real cluster where the scan is the cost"
        )
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from taxi_data_pipeline_pset2_spark.queries import entries_tagged
    from taxi_data_pipeline_pset2_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    entries = sorted(entries_tagged("bench"), key=lambda e: e.name)
    # Warm-up: JVM/codegen/file-listing costs land here, not in timings.
    try:
        entries[0].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    # Per-query fault isolation: one broken query must degrade to one
    # "errors" entry, never zero the whole benchmark (r3 lesson: a driver
    # testdata schema change took out the entire BENCH via one reader).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for e in entries:
        best = float("inf")
        try:
            for _ in range(3):  # best-of-3: ambient load added ~1.4x uniform
                t0 = time.perf_counter()  # noise to the r2 best-of-2 numbers
                e.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[e.name] = round(best, 4)
        except Exception as exc:  # noqa: BLE001 - report, keep benching
            errors[e.name] = f"{type(exc).__name__}: {exc}"[:300]

    try:
        cl = clustering_demo(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        cl = {"error": f"{type(exc).__name__}: {exc}"[:300]}

    m = re.search(r"sf([0-9.]+)", sf_dir)
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "clustering": cl,
        "sf": float(m.group(1)) if m else None,
    }
    if errors:
        out["errors"] = errors
    return out


if __name__ == "__main__":
    result = run()
    json.dump(result, sys.stdout)
    print()
