"""LLM-pipeline SF1 scale checkpoint: run the heaviest dedup / text /
doc / ann / ev registry queries at sf0.1 and at the 10x-replicated
`.benchdata/sf1` (tools/make_sf1.py) and report the wall-clock ratio —
the companion to docs/tpch_sf1.md and docs/tpcds_sf1.md for the
pipeline-operator families.

Note the corpus semantics: replication copies each document's TEXT
verbatim under 10 shifted doc_ids, i.e. sf1 is a crawl-REALISTIC
heavy-duplication corpus (every doc has 10 exact copies). For the
pair-generating dedup operators this is the adversarial shape: each
LSH/containment/ngram bucket holds ~10x the docs, so candidate pairs
grow ~45x while rows grow 10x. A ratio near 10x here is therefore NOT a
scaling failure — output itself grows super-linearly — but the banded /
prefix-filtered plans must stay far from the 45x pair blowup.

Usage: PYTHONPATH=/root/repo python tools/pipeline_sf1.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    # dedup: hash-agg, banded, pigeonhole, ppjoin, containment ladder
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash_neighbors",
    "dedup_ngram_jaccard",
    "dedup_keep_canonical",
    "dedup_prefix_containment",
    # text: map-heavy, corpus agg, index probe, two-stage rank
    "text_quality",
    "text_tfidf_terms",
    "text_zipf_terms",
    "text_bm25_topk",
    "text_bigram_score",
    # doc: packing, epoch shuffle, weighted sample
    "doc_pack_bins",
    "doc_epoch_shuffle",
    "doc_weighted_sample",
    # ann: broadcast-query scoring + IVF list confinement
    "ann_brute_topk",
    "ann_ivf_topk",
    # temporal
    "ev_asof_purchase",
    "ev_range_errors",
]


def main() -> int:
    from duckdb_delta_spark.queries import all_queries
    from duckdb_delta_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    sf01 = "/root/testdata/sf0.1"
    sf1 = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".benchdata", "sf1")
    if not os.path.isdir(sf1):
        print(f"missing {sf1} — run tools/make_sf1.py first", file=sys.stderr)
        return 1

    spark = get_spark("pipeline_sf1")
    qs = all_queries()
    spark.read.parquet(f"{sf01}/region.parquet").count()  # JVM warm
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long").count()  # python-worker warm

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        best, rows = 1e9, 0
        for _ in range(2):  # bench.py's min-of-two convention
            t0 = time.time()
            rows = len(qs[name].fn(spark, sf_dir).collect())
            best = min(best, time.time() - t0)
        return best, rows

    print("| query | sf0.1 | sf1 | ratio (10x data) | sf1 rows |")
    print("|---|---|---|---|---|")
    tot01 = tot1 = 0.0
    for name in names:
        t01, _ = run(name, sf01)
        t1, rows1 = run(name, sf1)
        tot01 += t01
        tot1 += t1
        print(f"| {name} | {t01:.2f} | {t1:.2f} | "
              f"{t1 / max(t01, 1e-9):.1f}x | {rows1} |", flush=True)
    print(f"\nSubset total: sf0.1 {tot01:.1f}s, sf1 {tot1:.1f}s — "
          f"{tot1 / tot01:.1f}x wall for 10x data")
    return 0


if __name__ == "__main__":
    sys.exit(main())
