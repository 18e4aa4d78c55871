"""Streaming SF1 scale checkpoint: run the heaviest `stream_*` registry
queries at sf0.1 and at the 10x-replicated `.benchdata/sf1`
(tools/make_sf1.py) and report the wall-clock ratio — the companion to
docs/pipeline_sf1.md / docs/tpch_sf1.md for the streaming family.

The scale-sensitive axis here is NOT bytes scanned but COMMIT COUNT:
per-batch log replay and sink snapshot refresh are O(new commits), and
`lineitem_multi` is built with 3 append commits per 10M key band
(testing/fixtures.py:_build_lineitem_multi), so the key-shifted sf1
replica set yields 30 commits / 120 files vs sf0.1's 3 / 12 — the
realistic stream-backlog shape where a checkpointed consumer wakes up
10x further behind.

Query-specific expectations:
  * stream_backfill_drain INTENTIONALLY drains with maxFilesPerTrigger=1
    through one-batch-per-lifecycle availableNow runs (the machinery
    under test), so its wall is ~linear in FILE count by construction —
    10x backlog ⇒ ~10x wall is the correct answer, not a scaling bug.
    The production drainAll path is measured separately below.
  * stream_delta_sink / stream_replace_sink commit once per micro-batch;
    their wall tracks commit count + data volume.
  * stream_sessionize / stream_join_outer are memory-sink stateful ops
    over the events stream: wall tracks rows (10x) with constant
    per-batch overhead amortizing.

Usage: PYTHONPATH=/root/repo python tools/streaming_sf1.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    # the 5 slowest stream_* in BENCH_r16 + the round-17 replace sink
    "stream_backfill_drain",
    "stream_join_outer",
    "stream_upsert",
    "stream_delta_sink",
    "stream_sessionize",
    "stream_replace_sink",
]


def _drain_all_seconds(spark, root: str) -> tuple[float, int]:
    """The production backfill path: one availableNow lifecycle with
    .option('drainAll','true') over the full lineitem_multi backlog into
    a parquet sink. Returns (seconds, #rows written)."""
    import shutil
    import tempfile
    import uuid

    from duckdb_delta_spark.streaming.delta_source import DeltaPySource

    try:
        spark.dataSource.register(DeltaPySource)
    except Exception:  # noqa: BLE001 - already registered on this session
        pass
    src = os.path.join(root, "lineitem_multi")
    base = os.path.join(tempfile.gettempdir(),
                        f"sf1drain_{uuid.uuid4().hex[:12]}")
    out, ck = os.path.join(base, "out"), os.path.join(base, "ck")
    t0 = time.time()
    q = (
        spark.readStream.format("delta_py")
        .option("path", src)
        .option("startingVersion", "0")
        .option("drainAll", "true").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(600)
    secs = time.time() - t0
    rows = spark.read.parquet(out).count()
    shutil.rmtree(base, ignore_errors=True)
    return secs, rows


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

    spark = get_spark("streaming_sf1")
    qs = all_queries()
    spark.read.parquet(f"{sf01}/region.parquet").count()  # JVM warm
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long").count()  # python-worker warm

    # fixture builds are one-time and cached — do them OUTSIDE the
    # timed region so the table measures steady-state streaming cost
    t0 = time.time()
    r01 = FX.ensure_fixtures(spark, sf01)
    t1 = time.time()
    r1 = FX.ensure_fixtures(spark, sf1)
    print(f"[fixtures] sf0.1 build {t1 - t0:.0f}s, sf1 build "
          f"{time.time() - t1:.0f}s (one-time, cached by fingerprint)",
          flush=True)

    from duckdb_delta_spark.delta.log import DeltaLog
    for tag, root in (("sf0.1", r01), ("sf1", r1)):
        v = DeltaLog(os.path.join(root, "lineitem_multi")).resolve_version(None)
        print(f"[fixtures] {tag} lineitem_multi commits: {v + 1}")

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        best, rows = 1e9, 0
        for _ in range(2):  # bench.py's min-of-two convention
            t0 = time.time()
            rows = len(qs[name].fn(spark, sf_dir).collect())
            best = min(best, time.time() - t0)
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
          f"{tot1 / tot01:.1f}x wall for 10x data / 10x commits")

    # the production one-lifecycle backfill over the same 10x backlog
    s01, n01 = _drain_all_seconds(spark, r01)
    s1, n1 = _drain_all_seconds(spark, r1)
    print(f"\ndrainAll backfill: sf0.1 {s01:.2f}s ({n01} rows), "
          f"sf1 {s1:.2f}s ({n1} rows) — {s1 / max(s01, 1e-9):.1f}x wall "
          "for 10x rows / 10x commits")
    return 0


if __name__ == "__main__":
    sys.exit(main())
