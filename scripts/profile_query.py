"""Profile one or more catalog/bench queries: wall time (noop sink),
per-job wall breakdown from the AppStatusStore, and the formatted plan.

Usage: python scripts/profile_query.py NAME [NAME...] [--sf DIR] [--runs N]
       [--plans-out DIR]

The per-job table attributes wall time to jobs (submission->completion)
inside the timed run, which is how overhead-dominated queries are
diagnosed: many short jobs = eager materializations / broadcasts /
driver round-trips; one long single-task stage = serialized compute
(guide section 1/7). Writes plans to --plans-out/<name>.txt when given.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-out", default=None)
    args = ap.parse_args()

    from taxi_data_pipeline_pset2_spark.queries import spark_queries
    from taxi_data_pipeline_pset2_spark.session import get_spark

    try:
        import bench
    except ImportError:
        bench = None

    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    if bench is not None:
        qs.update(bench._pipeline_extras())

    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile: {name}")
        best = float("inf")
        times = []
        for i in range(args.runs):
            gid = f"profile-{name}-{i}"
            spark.sparkContext.setJobGroup(gid, gid)
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            took = time.perf_counter() - t0
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
            times.append(took)
            best = min(best, took)
        print(f"\n=== {name}: runs={['%.3f' % t for t in times]} best={best:.3f}s")
        # job breakdown of the LAST run
        tracker = spark.sparkContext.statusTracker()
        store = spark.sparkContext._jsc.sc().statusStore()
        jids = sorted(tracker.getJobIdsForGroup(gid))
        rows = []
        for jid in jids:
            try:
                jd = store.job(jid)
                sub = jd.submissionTime().get().getTime()
                comp = jd.completionTime().get().getTime()
                ntasks = jd.numTasks()
                nstages = jd.stageIds().size()
                rows.append((jid, (comp - sub) / 1000.0, nstages, ntasks))
            except Exception as exc:  # noqa: BLE001
                rows.append((jid, None, None, f"? {exc}"[:40]))
        tot = sum(r[1] for r in rows if isinstance(r[1], float))
        print(f"  jobs={len(rows)} sum(job wall)={tot:.3f}s")
        for jid, sec, nst, nt in sorted(
            rows, key=lambda r: -(r[1] or 0)
        )[:15]:
            sec_s = f"{sec:.3f}s" if isinstance(sec, float) else str(sec)
            print(f"    job {jid}: {sec_s} stages={nst} tasks={nt}")
        if args.plans_out:
            os.makedirs(args.plans_out, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.plans_out, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"  plan -> {args.plans_out}/{name}.txt")


if __name__ == "__main__":
    main()
