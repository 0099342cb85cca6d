"""Full-catalog DuckDB replay under an arbitrary (hostile) Spark config.

The determinism contract says every catalog entry is bit-exact against
its DuckDB oracle regardless of session configuration the engine does
not pin (partition counts, AQE, Arrow batch size, ANSI mode, codegen,
timezone). The per-round sweeps that back that claim were previously
ad-hoc; this script makes the axis reproducible:

    python scripts/sweep_catalog.py                          # default confs
    python scripts/sweep_catalog.py --conf spark.sql.codegen.wholeStage=false
    python scripts/sweep_catalog.py --conf spark.sql.shuffle.partitions=5 \
        --conf spark.sql.adaptive.enabled=false
    TZ=Pacific/Chatham python scripts/sweep_catalog.py       # hostile TZ
    python scripts/sweep_catalog.py --sf /root/testdata/sf0.001

Mirrors tests/test_catalog_oracle.py's concurrent replay (threaded job
submission on local[32]; one DuckDB cursor per task) and prints one line
per failure plus a final ``full=<n>/<n> rows_only=<k> FAIL=<m>`` summary.
Exit 0 iff zero mismatches.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

# anchor imports on the repo root, not the caller's cwd (ADVICE r11)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from taxi_data_pipeline_pset2_spark.queries import registry
from taxi_data_pipeline_pset2_spark.session import get_spark
from tests.oracle_utils import duckdb_connection, replay_entry


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="K=V",
        help="extra Spark conf (repeatable)",
    )
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()

    for c in args.conf:
        if "=" not in c:
            ap.error(f"--conf expects K=V, got {c!r}")
    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_spark(app_name="catalog-sweep", extra_confs=extra)
    for k, v in extra.items():
        # getOrCreate() silently reuses a live session; make a stale
        # config impossible to miss.
        assert spark.conf.get(k) == v, f"conf {k} not applied (stale session?)"
    con = duckdb_connection(args.sf)
    entries = sorted(registry().values(), key=lambda e: e.name)
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=args.threads) as pool:
        futures = {
            e.name: (pool.submit(replay_entry, spark, args.sf, con, e), e)
            for e in entries
        }
        failures = 0
        full_pass = full_total = rows_only_pass = rows_only_total = 0
        for name, (fut, e) in futures.items():
            problems = fut.result()
            if e.oracle is None:
                rows_only_total += 1
                rows_only_pass += not problems
            else:
                full_total += 1
                full_pass += not problems
            if problems:
                failures += 1
                print(f"FAIL {name}: " + "; ".join(problems)[:800])
    con.close()
    spark.stop()
    print(
        f"sweep: full={full_pass}/{full_total} "
        f"rows_only={rows_only_pass}/{rows_only_total} FAIL={failures} "
        f"confs={extra or 'default'} sf={args.sf} {time.time() - t0:.0f}s"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
