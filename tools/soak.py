"""Soak-runner for the REAL-thread concurrency tests (VERDICT r19 #1).

`test_threaded_ingest_optimize_retention_triad` flaked once in three
full-suite runs in round 19 and the traceback was lost to an output
pipe. The tests now dump their op schedule + traceback to
``.fixtures/thread_evidence/`` on any failure (tests/thread_evidence.py);
this script provides the soak: run the racing tests N times IN ONE
PROCESS against ONE long-lived Spark session — the same conditions a
full pytest suite creates (warm JVM, shared scheduler, accumulated
session state), which is where the flake appeared — and report the
failure count. A failing iteration records the pytest-free traceback
here AND the schedule artifact via the in-test capture.

Usage::

    python tools/soak.py                      # 50 runs of the triad
    python tools/soak.py --runs 20 --tests triad,replace-sink,renames
    python tools/soak.py --tests serialize    # all three variants/run

Exit code: number of failing iterations (0 = clean soak). Summary JSON
written to .fixtures/soak/soak_<timestamp>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _tests():
    import test_r18_fixes as r18
    import test_r19_threads as r19
    import test_r20_threads as r20

    def serialize(spark, tdir):
        # all three op-mix variants, fresh table dir each
        for variant in r18.THREAD_VARIANTS:
            sub = os.path.join(tdir, variant)
            r18.test_threaded_writers_serialize_in_commit_order(
                spark, sub, variant)

    return {
        "triad": r18.test_threaded_ingest_optimize_retention_triad,
        "replace-sink": r19.test_threaded_replace_sink_optimize_retention,
        "renames": r19.test_threaded_writers_with_renames_serialize_or_loud,
        "cdf-reader": r20.test_threaded_cdf_stream_reader_races_writers,
        "serialize": serialize,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=50)
    ap.add_argument("--tests", default="triad")
    args = ap.parse_args()

    from duckdb_delta_spark.session import get_spark

    spark = get_spark("soak", cpus=8)  # mirrors tests/conftest.py
    tests = _tests()
    names = [n.strip() for n in args.tests.split(",") if n.strip()]
    unknown = [n for n in names if n not in tests]
    if unknown:
        ap.error(f"unknown tests {unknown}; have {sorted(tests)}")

    out_dir = os.path.join(REPO, ".fixtures", "soak")
    os.makedirs(out_dir, exist_ok=True)
    results: list[dict] = []
    fails = 0
    t_start = time.time()
    for i in range(args.runs):
        for name in names:
            t0 = time.time()
            rec = {"run": i, "test": name}
            scratch = tempfile.mkdtemp(prefix=f"soak_{name}_{i}_",
                                       dir=out_dir)
            try:
                tests[name](spark, os.path.join(scratch, "table"))
                rec["ok"] = True
            except (KeyboardInterrupt, SystemExit):
                # an interrupt is NOT a flake: re-raise so Ctrl-C stops
                # the soak instead of polluting the evidence artifact
                # with a phantom failure and running the remaining
                # iterations anyway
                raise
            except BaseException as e:  # noqa: BLE001 - soak must count, not die
                fails += 1
                rec["ok"] = False
                rec["error"] = repr(e)
                rec["traceback"] = traceback.format_exc()
                print(f"[soak] FAIL run={i} test={name}: {e!r}",
                      file=sys.stderr, flush=True)
            finally:
                rec["sec"] = round(time.time() - t0, 2)
                if rec["ok"]:
                    import shutil

                    shutil.rmtree(scratch, ignore_errors=True)
                else:
                    rec["scratch"] = scratch  # keep the failing table+log
            results.append(rec)
            print(f"[soak] run={i} test={name} "
                  f"{'ok' if rec['ok'] else 'FAIL'} {rec['sec']}s",
                  flush=True)

    summary = {
        "runs": args.runs,
        "tests": names,
        "failures": fails,
        "total_sec": round(time.time() - t_start, 1),
        "results": results,
    }
    path = os.path.join(out_dir, f"soak_{int(t_start)}.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("runs", "tests", "failures", "total_sec")}))
    print(f"[soak] summary: {path}")
    return fails


if __name__ == "__main__":
    raise SystemExit(main())
