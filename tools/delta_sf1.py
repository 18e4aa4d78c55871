"""Delta-family SF1 scale checkpoint: run the heaviest `delta_*`
registry queries at sf0.1 and at the 10x-replicated `.benchdata/sf1`
(tools/make_sf1.py) and report the wall-clock ratio — the companion to
docs/streaming_sf1.md / docs/pipeline_sf1.md for the Delta machinery
itself (DV build + read, OPTIMIZE/Z-order, MERGE, CDF, checkpoint,
snapshot replay, conflict retry).

Fixture builds are one-time and cached by source fingerprint
(`testing/fixtures.ensure_fixtures`); the timed region measures only
the query — scan/DML cost over 10x rows, with `lineitem_multi` also
carrying 10x the commits (3 per 10M key band).

Usage: PYTHONPATH=/root/repo python tools/delta_sf1.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    # scan + skipping (should scale SUB-linearly: pruning works)
    "delta_scan_agg",
    "delta_stats_skip",
    "delta_partition_prune",
    # DV write (DELETE fixture) and read (multi-container big DV)
    "delta_delete_scan",
    "delta_big_dv_scan",
    # OPTIMIZE + Z-order clustering
    "delta_clustered_scan",
    # MERGE full clause surface
    "delta_merge_by_source_scan",
    # CDF over DML commits
    "delta_changes_scan",
    # log replay: 90-commit snapshot resolution + checkpoint read
    "delta_snapshot_90commits",
    "delta_checkpoint_scan",
    # committed two-writer race (conflict retry machinery)
    "delta_racing_update_scan",
    # remove-only retention DELETE (r17: no DV, no cdc)
    "delta_retention_delete_scan",
    # r18: log-tombstone VACUUM LITE + segmented CDF drain
    "delta_vacuum_lite_scan",
    "delta_cdf_segments_scan",
]


def main() -> int:
    from duckdb_delta_spark.queries import all_queries
    from duckdb_delta_spark.session import get_spark
    from duckdb_delta_spark.testing import fixtures as FX

    names = sys.argv[1:] or DEFAULT
    sf01 = "/root/testdata/sf0.1"
    sf1 = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".benchdata", "sf1")
    if not os.path.isdir(sf1):
        print(f"missing {sf1} — run tools/make_sf1.py first", file=sys.stderr)
        return 1

    spark = get_spark("delta_sf1")
    qs = all_queries()
    spark.read.parquet(f"{sf01}/region.parquet").count()  # JVM warm
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long").count()  # python-worker warm

    t0 = time.time()
    FX.ensure_fixtures(spark, sf01)
    t1 = time.time()
    FX.ensure_fixtures(spark, sf1)
    print(f"[fixtures] sf0.1 build {t1 - t0:.0f}s, sf1 build "
          f"{time.time() - t1:.0f}s (one-time, cached by fingerprint)",
          flush=True)

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        best, rows = 1e9, 0
        for _ in range(2):  # bench.py's min-of-two convention
            t = time.time()
            rows = len(qs[name].fn(spark, sf_dir).collect())
            best = min(best, time.time() - t)
        return best, rows

    print("\n| query | sf0.1 | sf1 | ratio (10x data) | sf1 rows |")
    print("|---|---|---|---|---|")
    tot01 = tot1 = 0.0
    for name in names:
        t01, _ = run(name, sf01)
        t1q, rows1 = run(name, sf1)
        tot01 += t01
        tot1 += t1q
        print(f"| {name} | {t01:.2f} | {t1q:.2f} | "
              f"{t1q / max(t01, 1e-9):.1f}x | {rows1} |", flush=True)
    print(f"\nSubset total: sf0.1 {tot01:.1f}s, sf1 {tot1:.1f}s — "
          f"{tot1 / tot01:.1f}x wall for 10x data")

    # --- vacuum-lite OP timing (r19): the registry row measures the
    # post-OPTIMIZE SCAN of the litevac fixture (sf1 compaction packs the
    # 10x rows into ~3 files, so the scan ratio reads as a regression
    # every round); this times the LITE VACUUM CALL alone — its cost is
    # O(log tombstones) unlinks + existence probes, independent of data
    # volume, and the ratio should be ~1.0x at any scale.
    import shutil

    from pyspark.sql import functions as F

    from duckdb_delta_spark.delta.writer import DeltaWriter

    def time_litevac(sf_dir: str) -> tuple[float, int]:
        path = os.path.join(os.path.dirname(sf1), f"_tmp_litevac_{os.path.basename(sf_dir)}")
        shutil.rmtree(path, ignore_errors=True)
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        w = DeltaWriter.create(spark, path, o.schema)
        for i in range(3):
            w.append(o.where(F.col("o_orderkey") % 3 == i).repartition(3))
        assert w.compact(target_file_bytes=256 << 20) is not None
        t = time.time()
        deleted = w.vacuum(retention_ms=0, lite=True)
        dt = time.time() - t
        shutil.rmtree(path, ignore_errors=True)
        return dt, len(deleted or [])

    t01, n01 = time_litevac(sf01)
    t1v, n1 = time_litevac(sf1)
    print(f"\n| delta_vacuum_lite_op | {t01:.2f} | {t1v:.2f} | "
          f"{t1v / max(t01, 1e-9):.1f}x | {n1} tombstones reaped |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
