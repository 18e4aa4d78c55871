"""Local replica of the driver's t2 correctness gate.

Runs every registered query's Spark implementation and DuckDB oracle at the
given sf_dir, compares row count, column names, and an order-insensitive
multiset of stringified values (stricter than needed — exact string equality
after normalization, no float tolerance: the queries themselves round).

Usage: python tests/oracle_check.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import datetime as dt
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # canonical float formatting (both engines produce doubles)
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for row in rows:
        key = "\x1f".join(normalize_cell(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare(name, spark_df, con, oracle_sql):
    t0 = time.time()
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    t_spark = time.time() - t0

    t0 = time.time()
    rel = con.sql(oracle_sql)
    ocols = list(rel.columns)
    orows = rel.fetchall()
    t_oracle = time.time() - t0

    problems = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")
    if not problems:
        sm = frame_multiset(scols, srows)
        om = frame_multiset(ocols, orows)
        if sm != om:
            only_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
            only_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
            problems.append(f"values differ; spark-only≈{only_s} oracle-only≈{only_o}")
    return problems, len(srows), t_spark, t_oracle


def main():
    import duckdb

    from duckdb_delta_spark.queries import TABLES, all_queries
    from duckdb_delta_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = all_queries()
    names = [n for n in sorted(queries) if not filters or any(f in n for f in filters)]
    failed = []
    for name in names:
        q = queries[name]
        try:
            df = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = df.count()
                print(f"  {name:28s} rows-only ({n} rows)")
                continue
            problems, n, ts, to = compare(name, df, con, q.oracle)
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name:28s} EXCEPTION: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if problems:
            print(f"✗ {name:28s} {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"✓ {name:28s} {n:>7} rows  spark={ts:5.1f}s duckdb={to:5.1f}s")
    print(f"\n{len(names) - len(failed)}/{len(names)} OK" + (f"; FAILED: {failed}" if failed else ""))
    # artifact self-description: the driver's CORRECTNESS window caps at
    # the first 50 registry names (alphabetical) — this line records how
    # much of the suite that window covers
    import json as _json

    print(_json.dumps({"suite_total": len(queries),
                       "checked": len(names),
                       "driver_window": 50}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
