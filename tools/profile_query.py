"""Per-query profiler for the optimization rounds (guide §1: measure first).

For each named query, measures on a warm session:
  * ``build_s``   — time spent in ``fn(spark, sf_dir)`` (driver-side Python:
    fixture setup, delta log replay, plan construction; for queries that
    return ``local_df(...)`` this includes ALL execution);
  * ``collect_s`` — time of ``.collect()`` on the returned frame;
  * ``jobs``/``stages``/``tasks`` — Spark scheduler activity during the
    whole run (statusTracker delta), to spot job-count-bound queries;
  * two samples of each (min reported), matching bench.py's methodology.

Optionally writes ``.explain('formatted')`` to a file per query with
``--plans DIR`` (the round's plans/r20/<q>_{before,after}.txt artifacts).

Usage: python tools/profile_query.py [--plans DIR] [--suffix before]
           [--sf SF_DIR] name1 name2 ...
       python tools/profile_query.py --all            # whole registry
"""

from __future__ import annotations

import json
import os
import sys
import time

# repo-relative so a scratch worktree profiles ITS OWN code (capturing
# a "before" plan from an old commit must not import the live repo)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = list(sys.argv[1:])
    plans_dir = None
    suffix = "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i:i + 2]
        os.makedirs(plans_dir, exist_ok=True)
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i:i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    run_all = "--all" in args
    if run_all:
        args.remove("--all")

    from duckdb_delta_spark.queries import all_queries
    from duckdb_delta_spark.session import get_spark
    from duckdb_delta_spark.testing.fixtures import ensure_fixtures

    spark = get_spark("profile")
    queries = all_queries()
    names = sorted(queries) if run_all else args
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    ensure_fixtures(spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    st = spark.sparkContext.statusTracker()

    def snap():
        jobs = st.getJobIdsForGroup(None)
        return len(jobs)

    out: dict[str, dict] = {}
    for name in names:
        q = queries[name]
        samples = []
        for run in range(2):
            spark.sparkContext.setJobDescription(f"profile:{name}:{run}")
            j0 = snap()
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            t1 = time.time()
            df.collect()
            t2 = time.time()
            j1 = snap()
            samples.append({
                "build_s": round(t1 - t0, 3),
                "collect_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "jobs": j1 - j0,
            })
            if plans_dir and run == 0:
                try:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted")
                except Exception:
                    import contextlib
                    import io

                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
                    plan = buf.getvalue()
                with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"),
                          "w") as f:
                    f.write(plan)
        best = min(samples, key=lambda s: s["total_s"])
        out[name] = {"best": best, "runs": samples}
        print(f"[profile] {name}: total={best['total_s']:.2f}s "
              f"(build={best['build_s']:.2f} collect={best['collect_s']:.2f} "
              f"jobs={best['jobs']})", file=sys.stderr)

    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
