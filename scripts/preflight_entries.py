"""Fresh-process pre-flight of specific catalog entries against DuckDB.

Mirrors the external driver's run shape (default-memory DuckDB, one
statement per oracle) for entries about to enter the _WINDOW rotation.
Run twice -- default env and a hostile TZ (e.g. TZ=Pacific/Chatham) --
before committing a new window (the r10 giant-oracle precedent).

Usage: python scripts/preflight_entries.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

# anchor imports on the repo root, not the caller's cwd (same fix as
# sweep_catalog.py, ADVICE r11)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from taxi_data_pipeline_pset2_spark.queries import registry
from tests.oracle_utils import compare_frames, duckdb_connection


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = args
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("preflight")
        .getOrCreate()
    )
    reg = registry()
    con = duckdb_connection(sf_dir)
    failed = []
    for name in names:
        e = reg[name]
        t0 = time.time()
        spark_pdf = e.fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if e.oracle is None:
            ok = len(spark_pdf) > 0
            print(f"{name}: rows-only rows={len(spark_pdf)} ok={ok} spark={t1-t0:.2f}s")
            if not ok:
                failed.append(name)
            continue
        oracle_pdf = con.execute(e.oracle).df()
        t2 = time.time()
        problems = compare_frames(spark_pdf, oracle_pdf)
        print(
            f"{name}: rows={len(spark_pdf)}/{len(oracle_pdf)} "
            f"spark={t1-t0:.2f}s oracle={t2-t1:.2f}s "
            + ("OK" if not problems else "FAIL " + "; ".join(problems)[:500])
        )
        if problems:
            failed.append(name)
    spark.stop()
    con.close()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
