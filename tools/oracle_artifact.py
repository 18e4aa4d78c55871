"""Full-registry oracle run → committed artifact.

The grading driver's CORRECTNESS_r{N}.json samples only the first 50
registry names (alphabetical); the other ~240 queries never appear in any
driver artifact. This wrapper runs `tests/oracle_check.py`'s compare over
the ENTIRE registry and writes `ORACLE_r{N}.json` at the repo root, so
every round carries its own complete correctness proof.

Usage: python tools/oracle_artifact.py <round_n> [sf_dir]
           [--subset name1,name2,... | --subset @file] [--out path]
  writes /root/repo/ORACLE_r<round_n>.json (or --out) and exits nonzero
  on any red. --subset restricts the run — used for the per-round sf0.1
  spot-check (VERDICT r19 #5): the correctness gate runs only at sf0.01,
  so the 25 slowest + all delta_* DML queries are re-compared against
  DuckDB at sf0.1 once to catch scale-dependent divergence (stats
  skipping, DV routing thresholds, broadcast flips) the small gate
  can't see.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main() -> int:
    import duckdb

    from oracle_check import compare
    from duckdb_delta_spark.queries import TABLES, all_queries
    from duckdb_delta_spark.session import get_spark

    usage = ("usage: oracle_artifact.py <round> [sf_dir] "
             "[--subset name,... | @file] [--out path]")
    args = list(sys.argv[1:])
    subset: set[str] | None = None
    out_path: str | None = None
    if "--subset" in args:
        i = args.index("--subset")
        if i + 1 >= len(args):
            raise SystemExit(f"--subset needs a value\n{usage}")
        spec = args[i + 1]
        del args[i:i + 2]
        if spec.startswith("@"):
            spec = open(spec[1:]).read()
        subset = {n.strip() for n in spec.replace("\n", ",").split(",")
                  if n.strip()}
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            raise SystemExit(f"--out needs a value\n{usage}")
        out_path = args[i + 1]
        del args[i:i + 2]
    if not args:
        raise SystemExit(f"missing <round>\n{usage}")
    round_n = int(args[0])
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    spark = get_spark("oracle_artifact")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = all_queries()
    if subset is not None:
        unknown = subset - set(queries)
        if unknown:
            raise SystemExit(f"unknown subset names: {sorted(unknown)}")
        queries = {n: q for n, q in queries.items() if n in subset}
    per: dict[str, dict] = {}
    n_ok = n_fail = n_rows_only = 0
    t_start = time.time()
    for name in sorted(queries):
        q = queries[name]
        try:
            df = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = df.count()
                per[name] = {"status": "rows_only", "rows": n}
                n_rows_only += 1
                print(f"  {name:32s} rows-only ({n} rows)", flush=True)
                continue
            problems, n, ts, to = compare(name, df, con, q.oracle)
        except Exception as e:  # noqa: BLE001
            per[name] = {"status": "fail",
                         "error": f"{type(e).__name__}: {e}"[:500]}
            n_fail += 1
            print(f"✗ {name:32s} EXCEPTION: {type(e).__name__}", flush=True)
            continue
        if problems:
            per[name] = {"status": "fail", "rows": n,
                         "problems": "; ".join(problems)[:500]}
            n_fail += 1
            print(f"✗ {name:32s} {'; '.join(problems)[:120]}", flush=True)
        else:
            per[name] = {"status": "ok", "rows": n,
                         "spark_s": round(ts, 2), "duckdb_s": round(to, 2)}
            n_ok += 1
            print(f"✓ {name:32s} {n:>7} rows  spark={ts:5.1f}s", flush=True)

    artifact = {
        "round": round_n,
        "sf_dir": sf_dir,
        "suite_total": len(queries),
        "ok": n_ok,
        "fail": n_fail,
        "rows_only": n_rows_only,
        "failed_names": sorted(k for k, v in per.items()
                               if v["status"] == "fail"),
        "wall_s": round(time.time() - t_start, 1),
        "queries": per,
    }
    if subset is not None:
        artifact["subset"] = sorted(subset)
    out = out_path or f"/root/repo/ORACLE_r{round_n}.json"
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"\n{n_ok} ok / {n_fail} fail / {n_rows_only} rows-only "
          f"of {len(queries)} → {out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
