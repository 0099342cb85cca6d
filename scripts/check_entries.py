"""Oracle-check specific catalog entries the way the driver does
(row count + schema + order-insensitive value comparison vs DuckDB),
from a fresh process. Fast loop for verifying an optimization changed
nothing a query computes.

Usage: python scripts/check_entries.py NAME [NAME...] [--sf DIR ...]
       (default SFs: sf0.01 and sf0.001)
"""

from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf",
        action="append",
        default=None,
        help="testdata dir (repeatable); default sf0.01 + sf0.001",
    )
    args = ap.parse_args()
    sfs = args.sf or ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]

    from oracle_utils import compare_frames, duckdb_connection

    from taxi_data_pipeline_pset2_spark.queries import oracle_sqls, spark_queries
    from taxi_data_pipeline_pset2_spark.session import get_spark

    spark = get_spark(app_name="check-entries")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = spark_queries(), oracle_sqls()
    bad = 0
    for sf in sfs:
        con = duckdb_connection(sf)
        for name in args.names:
            spdf = qs[name](spark, sf).toPandas()
            if name not in oracles:
                print(f"{os.path.basename(sf)} {name}: rows-only, {len(spdf)} rows")
                continue
            probs = compare_frames(spdf, con.execute(oracles[name]).df())
            if probs:
                bad += 1
                print(f"{os.path.basename(sf)} {name}: MISMATCH {probs[:2]}")
            else:
                print(f"{os.path.basename(sf)} {name}: OK ({len(spdf)} rows)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
