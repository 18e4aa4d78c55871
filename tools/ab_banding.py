"""Interleaved A/B for the LSH banding candidate join (round-20 verdict #1).

Variant NEW = the round-20 single self-join on (band#, band-hash)
(the fused form, defined inline below); variant OLD = the per-band
join + union chain (operators/dedup.py:minhash_candidate_pairs at HEAD
after the round-21 revert). Both produce the identical candidate set
(oracle-verified both rounds; asserted by tools in this round); the
committed plans/r21/banding_ab.json was produced at the pre-revert HEAD
where NEW was the live implementation — OLD won 1.26-1.29x on all six
consumers, which is why the revert happened.

Method: ONE session, per consumer query the two variants run in the
balanced interleave A B B A A B B A A B (5 samples each, both orders
adjacent), min-of-5 reported; the MT canary runs before/after the whole
block so the window is matched by construction. Output (committed as
plans/r21/banding_ab.json) carries every sample, not just the min.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from bench import cpu_canary_mt
from duckdb_delta_spark.operators import dedup as D
from duckdb_delta_spark.session import get_spark

old_minhash_candidate_pairs = D.minhash_candidate_pairs  # per-band form at HEAD


def NEW_IMPL(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = D.MINHASH_HASHES, band_size: int = D.MINHASH_BAND_SIZE,
) -> DataFrame:
    """The round-20 fused shape (verbatim from commit c18b9e2): one
    self-join on exploded (band#, band-hash) rows."""
    sig = D.minhash_signatures(df, text_col, id_col, num_hashes, band_size)
    n_bands = num_hashes // band_size
    bands = sig.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("b"), F.col(f"band_{b}").alias("h"))
            for b in range(n_bands)
        ])).alias("bh"),
    ).select("id", F.col("bh.b").alias("b"), F.col("bh.h").alias("h"))
    out = (
        bands.alias("a")
        .join(bands.alias("b2"), on=["b", "h"])
        .where(F.col("a.id") < F.col("b2.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b2.id").alias("id_b"))
    )
    return out.distinct()


QUERIES = [
    "dedup_minhash_pairs",
    "dedup_cluster",
    "dedup_cluster_sizes",
    "dedup_keep_canonical",
    "doc_leakage_safe_split",
    "dedup_funnel_report",
]

ORDER = ["new", "old", "old", "new", "new", "old", "old", "new", "new", "old"]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_banding")
    from duckdb_delta_spark.queries import all_queries

    queries = all_queries()
    canary_pre = cpu_canary_mt()
    # warm: one run of each query per variant (codegen compile, page
    # cache) so the timed samples compare steady-state plans
    results: dict[str, dict] = {}
    for name in QUERIES:
        fn = queries[name].fn
        samples: dict[str, list[float]] = {"new": [], "old": []}
        for variant in ("new", "old"):
            D.minhash_candidate_pairs = (
                NEW_IMPL if variant == "new" else old_minhash_candidate_pairs)
            fn(spark, sf_dir).collect()  # warm, untimed
        for variant in ORDER:
            D.minhash_candidate_pairs = (
                NEW_IMPL if variant == "new" else old_minhash_candidate_pairs)
            t0 = time.time()
            fn(spark, sf_dir).collect()
            samples[variant].append(round(time.time() - t0, 3))
        results[name] = {
            "new_samples": samples["new"],
            "old_samples": samples["old"],
            "new_min": min(samples["new"]),
            "old_min": min(samples["old"]),
            "new_over_old": round(min(samples["new"]) / min(samples["old"]), 3),
        }
        print(f"[ab] {name}: new {min(samples['new']):.2f}s "
              f"old {min(samples['old']):.2f}s "
              f"(ratio {results[name]['new_over_old']})", file=sys.stderr)
    D.minhash_candidate_pairs = old_minhash_candidate_pairs  # restore HEAD impl
    canary_post = cpu_canary_mt()
    out = {
        "method": "interleaved A B B A A B B A A B per query, min-of-5, "
                  "one session, warmed",
        "sf_dir": sf_dir,
        "canary_mt_pre": canary_pre,
        "canary_mt_post": canary_post,
        "queries": results,
    }
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r21", "banding_ab.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
