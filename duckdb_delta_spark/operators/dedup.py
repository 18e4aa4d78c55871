"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the whole point of these operators):

* **exact**: one hash-aggregate on a fingerprint — one shuffle, map-side
  partial agg, no row explosion.
* **MinHash+LSH**: shingle→minhash→band→bucket-join. The candidate join is
  on band values (high-cardinality keys → well-spread shuffle); quadratic
  blow-up is confined to same-bucket groups instead of the full corpus.
* **SimHash**: per-doc 16-bit signature via one explode + one groupBy —
  near-dup candidates = equal signatures (or signatures at small Hamming
  distance via query-time banding).
* **n-gram Jaccard**: exact pair similarity, blocked to keep the pair space
  bounded; used to verify LSH candidates.

All hashing is md5-based so the DuckDB oracle computes bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from duckdb_delta_spark.localrel import local_df as _local_df
from duckdb_delta_spark.operators.text import tokens

MINHASH_HASHES = 8
MINHASH_BAND_SIZE = 4
SHINGLE_N = 3
SIMHASH_BITS = 16
_HEX = "0123456789abcdef"


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical (normalized) texts: (fingerprint, keep_id, n_dupes)."""
    from duckdb_delta_spark.operators.text import with_fingerprint

    return (
        with_fingerprint(df, text_col)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).cast("long").alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def word_shingles(toks: Column, n: int = SHINGLE_N) -> Column:
    """Distinct n-word shingles (space-joined) from a token array column.

    Built as ``zip_with`` over ``n`` aligned ``slice``s of the array, NOT
    as ``transform(sequence(...), i -> element_at(toks, i+k))``: lambda
    bodies re-evaluate captured expression trees per element, and
    Catalyst freely inlines the token derivation into consumers (e.g.
    ``InferFiltersFromGenerate`` clones the whole shingle expression into
    a pre-explode filter), turning the element_at form into O(tokens²)
    regexp splits per document (measured ~10× slowdown at sf0.1). The
    zip_with form only references ``toks`` once per slice — O(tokens)
    per row no matter how the optimizer inlines it."""
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    sh = F.slice(toks, 1, length)
    for k in range(1, n):
        part = F.slice(toks, 1 + k, length)
        sh = F.zip_with(sh, part, lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(sh)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = MINHASH_HASHES,
    band_size: int = MINHASH_BAND_SIZE,
) -> DataFrame:
    """(id, band_0..band_{b-1}): MinHash signature grouped into LSH bands.

    Hash family h_s(shingle) = md5('{s}:' || shingle); the per-seed minimum
    over a doc's shingle set is taken on the hex string (lexicographic =
    unsigned numeric order for fixed-length hex — identical in DuckDB).
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    exploded = toked.select(
        F.col(id_col), F.explode(word_shingles(F.col("_toks"))).alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("sh")))).alias(f"mh_{s}")
        for s in range(num_hashes)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    n_bands = num_hashes // band_size
    for b in range(n_bands):
        cols = [F.col(f"mh_{b * band_size + k}") for k in range(band_size)]
        sig = sig.withColumn(f"band_{b}", F.md5(F.concat_ws("|", *cols)))
    return sig.drop(*[f"mh_{s}" for s in range(num_hashes)])


def tune_lsh_banding(
    num_hashes: int = MINHASH_HASHES,
    threshold: float = 0.8,
    target_recall: float = 0.9,
) -> dict:
    """Closed-form S-curve inversion: pick the (bands, rows) split of a
    ``num_hashes``-component MinHash signature so that pairs with true
    Jaccard >= ``threshold`` become LSH candidates with probability >=
    ``target_recall``.

    P(candidate | jaccard=j) = 1 - (1 - j^rows)^bands; among the divisor
    splits of num_hashes, the LARGEST rows (sharpest S-curve → fewest
    false-positive candidates, i.e. least candidate-verify work at
    100 TB) that still clears the target at j=threshold wins; if none
    does, rows=1 (every component its own band) is the floor. This is
    the decision step the ``dedup_minhash_estimate`` calibration feeds:
    measure est-vs-exact agreement on a sample, then size the banding
    before a corpus run commits to a config.

    Returns {bands, rows, expected_recall, curve} where curve maps each
    candidate rows value to its expected recall at the threshold."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    curve = {}
    chosen = None
    for rows in range(num_hashes, 0, -1):
        if num_hashes % rows:
            continue
        bands = num_hashes // rows
        recall = 1.0 - (1.0 - threshold ** rows) ** bands
        curve[rows] = round(recall, 6)
        if chosen is None and recall >= target_recall:
            chosen = (bands, rows, recall)
    if chosen is None:
        bands, rows = num_hashes, 1
        chosen = (bands, rows, curve[1])
    return {
        "bands": chosen[0],
        "rows": chosen[1],
        "expected_recall": round(chosen[2], 6),
        "curve": curve,
    }


def minhash_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = MINHASH_HASHES, band_size: int = MINHASH_BAND_SIZE,
) -> DataFrame:
    """LSH candidate duplicate pairs: docs sharing any band bucket.

    The self-join is per-band on the band hash — the classic banding join;
    at 100 TB the band column is a well-distributed shuffle key and each
    bucket is tiny unless docs truly collide. ``num_hashes``/``band_size``
    default to the module constants; feed :func:`tune_lsh_banding` output
    (band_size = its ``rows``) to hit a target threshold/recall."""
    sig = minhash_signatures(df, text_col, id_col, num_hashes, band_size)
    n_bands = num_hashes // band_size
    # Per-band self-join + union, restored after the round-21 interleaved
    # A/B settled round 20's open question (plans/r21/banding_ab.json:
    # the round-20 single self-join on exploded (band#, band-hash) rows
    # — Exchange 24→12, Union 4→0 — measured 1.26-1.29× SLOWER on all
    # six consumer queries, min-of-5, matched healthy canary, both
    # orders; a third bucket-collect_list variant tied the single-join).
    # Mechanism: each per-band join is an independent broadcast-build
    # job, so the n_bands signature computations overlap across idle
    # cores, while the fused form serializes build→probe behind one
    # broadcast barrier. The fused form's plan IS smaller — one exchange
    # of narrow (id, band#, hash) rows instead of n_bands shuffled
    # signature copies — which is the right shape once the signature
    # frame outgrows the broadcast threshold (at 100 TB the per-band
    # joins become n_bands sort-merge shuffles of the full frame); a
    # cluster deployment should revisit with that A/B. At bench scale
    # the measured winner is this form.
    pair_frames = []
    for b in range(n_bands):
        s = sig.select(F.col(id_col).alias("id"), F.col(f"band_{b}").alias("band"))
        pairs = (
            s.alias("a")
            .join(s.alias("b"), on="band")
            .where(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").cast("long").alias("id_a"),
                F.col("b.id").cast("long").alias("id_b"),
            )
        )
        pair_frames.append(pairs)
    out = pair_frames[0]
    for p in pair_frames[1:]:
        out = out.union(p)
    return out.distinct()


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """16-bit SimHash over whitespace tokens (with multiplicity).

    Bit j comes from hex nibble j//4 of md5(token), bit (3 - j%4); each
    token votes ±1 per bit; signature bit = vote sum > 0. Pure built-in
    expressions → codegen; one explode + one groupBy."""
    toked = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.md5("tok"))
    # per-bit expressions rendered as SQL strings: one py4j round-trip per
    # bit instead of ~30 (the F.when/F.conv/F.shiftright chain cost ~1.3 s
    # of driver socket chatter per 48-bit build — guide §5, driver work).
    # The parsed trees are identical to the Column-API originals.
    votes = [
        F.expr(
            f"sum(CASE WHEN (shiftright(CAST(conv(substring(h, {1 + j // 4},"
            f" 1), 16, 10) AS INT), {3 - (j % 4)}) % 2) = 1"
            " THEN 1 ELSE -1 END)"
        ).alias(f"v_{j}")
        for j in range(bits)
    ]
    agg = toked.groupBy(id_col).agg(*votes)
    sig = F.expr(
        " + ".join(
            f"(CASE WHEN v_{j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(bits)
        )
    )
    return agg.select(
        F.col(id_col).cast("long"), sig.cast("long").alias("simhash")
    )


def char_ngrams(norm: Column, n: int = 3) -> Column:
    """Distinct character n-grams from a *materialized* normalized-text
    column (same HOF-re-evaluation hazard as :func:`word_shingles`)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(n))))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    n: int = 3,
    threshold: float = 0.8,
    collapse_exact: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via prefix filtering (ppjoin-style).

    All-pairs gram joins explode quadratically on templated corpora (a
    common 3-gram shared by every doc in a block yields |block|² join rows).
    Prefix filtering is the exact fix: order each doc's gram set globally by
    (document frequency asc, gram), keep only the first
    ``|x| − ⌈θ·|x|⌉ + 1`` grams as its *prefix*; two sets with
    J ≥ θ must share a prefix gram, so the candidate join runs on rare
    grams only. Candidates are then verified exactly on the full gram
    arrays. θ defaults to 0.8 (the usual near-dup bar) — at θ near 0 the
    prefix degenerates to the whole set and nothing is saved.

    ``collapse_exact`` (default on) is the crawl-scale lever on TOP of
    prefix filtering: real corpora are duplication-heavy (each page has
    many byte-identical copies), and identical gram SETS contribute
    identical Jaccards — so docs first collapse to one representative
    per distinct (block, gram-set) group, the ppjoin runs on
    representatives only, and member pairs are reconstructed afterwards
    by pure expansion (cross-group pairs inherit the representative
    Jaccard; within-group pairs are exact duplicates, J = 1.0). Output
    is bit-identical to the uncollapsed run, but a corpus with d copies
    per page does 1/d² of the candidate work (measured: the 10-copy sf1
    corpus in docs/pipeline_sf1.md).

    Prefix length uses integer arithmetic (⌈θn⌉ = (4n+4)//5 for θ=0.8) so
    the oracle can reproduce it without float-boundary surprises.
    """
    assert threshold == 0.8, "prefix length is specialized to θ=0.8"
    from pyspark.sql.window import Window

    # grams are carried as 60-bit ints h(g) = hex→int of md5(g)[:15]:
    # integer set ops are ~an order of magnitude cheaper than string ones,
    # and the mapping is reproducible in the DuckDB oracle. (A collision
    # would merge two grams identically on both sides — the operator is
    # defined over hashed gram sets.)
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    gh = lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")  # noqa: E731
    sets = (
        df.select(
            F.col(id_col).alias("id"),
            *[F.col(c) for c in block_cols],
            norm.alias("_n"),
        )
        .select("id", *block_cols, char_ngrams(F.col("_n"), n).alias("_gs"))
        .select(
            "id",
            *block_cols,
            F.array_sort(F.array_distinct(F.transform(F.col("_gs"), gh))).alias("hs"),
        )
        .withColumn("n_g", F.size("hs"))
    )

    groups = None
    if collapse_exact:
        # one representative (min id) per distinct gram set; members ride
        # along for the expansion step. groupBy on the array column is
        # exact (no hash-collision merge risk). Only the collapsed frame
        # caches — the raw per-doc sets are consumed exactly once here.
        groups = (
            sets.groupBy(*block_cols, "hs", "n_g")
            .agg(
                F.min("id").alias("id"),
                F.sort_array(F.collect_list("id")).alias("_members"),
            )
            .cache()
        )
        sets = groups.select("id", *block_cols, "hs", "n_g")
    else:
        # consumed twice (gram explode + verify broadcast): cache so the
        # ngram/md5 derivation runs once
        sets = sets.cache()

    grams = sets.select("id", *block_cols, "n_g", F.explode("hs").alias("h"))
    # global order: document frequency asc, hash asc — rarest first, per block
    dfreq = grams.groupBy(*block_cols, "h").agg(F.count(F.lit(1)).alias("dfreq"))
    w = Window.partitionBy("id").orderBy("dfreq", "h")
    ranked = grams.join(dfreq, [*block_cols, "h"]).withColumn(
        "rk", F.row_number().over(w)
    )
    prefix_len = F.col("n_g") - F.floor((4 * F.col("n_g") + 4) / 5) + 1
    prefix = ranked.where(F.col("rk") <= prefix_len).select(
        "id", *block_cols, "h", "n_g", "rk"
    )

    a, b = prefix.alias("a"), prefix.alias("b")
    cond = [F.col("a.h") == F.col("b.h")] + [
        F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols
    ]
    na, nb = F.col("a.n_g"), F.col("b.n_g")
    # length filter: θ ≤ |A|/|B| ≤ 1/θ. The prefix-match join then counts
    # |pref(A) ∩ pref(B)| per pair as a free aggregate of the join itself.
    matched = (
        a.join(b, on=cond)
        .where(
            (F.col("a.id") < F.col("b.id")) & (na * 4 <= nb * 5) & (nb * 4 <= na * 5)
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("pref_common"),
            F.first(na).alias("na"),
            F.first(nb).alias("nb"),
        )
    )
    # overlap bound: shared grams ≤ shared-prefix grams + min suffix size;
    # J ≥ θ needs overlap ≥ ⌈θ/(1+θ)·(|A|+|B|)⌉ = ⌈4(na+nb)/9⌉. Random
    # pairs share ~1 prefix gram and die here; only near-dup candidates
    # reach the exact verification below.
    plen = lambda nn: nn - F.floor((4 * nn + 4) / 5) + 1  # noqa: E731
    min_overlap = F.floor((4 * (F.col("na") + F.col("nb")) + 8) / 9)
    bound = F.col("pref_common") + F.least(
        F.col("na") - plen(F.col("na")), F.col("nb") - plen(F.col("nb"))
    )
    cand = matched.where(bound >= min_overlap).select("id_a", "id_b")

    # exact verify on full hashed sets; the per-doc array table is tiny
    # relative to the candidate stream → broadcast, arrays never shuffle
    sa = sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"),
                     F.col("n_g").alias("na"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"),
                     F.col("n_g").alias("nb"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    out = (
        cand.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn("_i", inter)
        .withColumn(
            "jaccard",
            F.round(F.col("_i") / (F.col("na") + F.col("nb") - F.col("_i")), 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            "jaccard",
        )
    )
    if groups is not None:
        # expansion: a representative pair (ra, rb, j) stands for every
        # cross-group member pair (same gram sets → same Jaccard); pairs
        # WITHIN a group are exact duplicates, J = 1.0 ≥ θ by definition
        mem_a = groups.select(
            F.col("id").alias("id_a"), F.col("_members").alias("_ma"))
        mem_b = groups.select(
            F.col("id").alias("id_b"), F.col("_members").alias("_mb"))
        cross = (
            out.join(mem_a, "id_a")
            .join(mem_b, "id_b")
            .select("jaccard", F.explode("_ma").alias("_x"), "_mb")
            .select("jaccard", "_x", F.explode("_mb").alias("_y"))
            .select(
                F.least("_x", "_y").cast("long").alias("id_a"),
                F.greatest("_x", "_y").cast("long").alias("id_b"),
                "jaccard",
            )
        )
        within = (
            groups.where(F.size("_members") >= 2)
            .select(F.explode("_members").alias("_x"),
                    F.col("_members").alias("_mb"))
            .select("_x", F.explode("_mb").alias("_y"))
            .where(F.col("_x") < F.col("_y"))
            .select(
                F.col("_x").cast("long").alias("id_a"),
                F.col("_y").cast("long").alias("id_b"),
                F.lit(1.0).alias("jaccard"),
            )
        )
        out = cross.unionByName(within)
    # expose the frame that was actually .cache()d — in collapse mode
    # that is `groups` (`sets` is a derived select over it, so a caller
    # unpersist() on `sets` would be a no-op and the cache would linger
    # until eviction)
    out._ngram_sets_cache = groups if groups is not None else sets
    return out


def embedding_cosine_pairs(
    docs: DataFrame,
    embeddings: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.95,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate document pairs.

    Semantic near-dup: LSH-bucket the document embeddings (random
    hyperplanes), compare only within buckets, keep pairs with cosine ≥
    threshold, and annotate from the documents table. The bucket join is
    the scale lever — the quadratic compare is confined to same-bucket
    groups, and bucket width is tunable via the plane count."""
    from duckdb_delta_spark.operators.similarity import cosine_sql, with_lsh_bucket

    b = with_lsh_bucket(embeddings, planes)
    left = b.select(
        F.col(vec_id_col).alias("id_a"), F.col("embedding").alias("va"), "bucket"
    )
    right = b.select(
        F.col(vec_id_col).alias("id_b"), F.col("embedding").alias("vb"), "bucket"
    )
    pairs = (
        left.join(right, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_sql("va", "vb"))
        .where(F.round("cos", 4) >= threshold)
    )
    da = docs.select(F.col(doc_id_col).alias("id_a"), F.col("lang").alias("lang_a"))
    db = docs.select(F.col(doc_id_col).alias("id_b"), F.col("lang").alias("lang_b"))
    return (
        pairs.join(F.broadcast(da), "id_a")
        .join(F.broadcast(db), "id_b")
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.round("cos", 4).alias("cos"),
            "lang_a",
            "lang_b",
        )
    )


def cross_contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SHINGLE_N,
    min_overlap: int = 3,
    max_eval_gram_df: int | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: train docs sharing ≥ ``min_overlap``
    distinct word n-grams with an eval/benchmark doc (the n-gram-overlap
    check training pipelines run before release — GPT-3 appendix C /
    PaLM-style 8-gram collision scans use exactly this shape).

    Scale shape: the EVAL side is small (benchmarks are thousands of
    docs, the corpus is billions), so its exploded gram table is
    broadcast — the 100-TB train side streams through a map-side hash
    join with NO shuffle of train grams, then one shuffle on
    (train_id, eval_id) for the overlap count. ``max_eval_gram_df``
    optionally drops grams appearing in more than that many eval docs
    (boilerplate/stop-grams): it removes exactly the join keys whose
    fan-out would skew the probe at scale, and tightens precision the
    way published decontamination filters do.

    Grams are carried as 60-bit md5-prefix ints (same encoding as
    :func:`ngram_jaccard_pairs`) so an independent SQL oracle reproduces
    them exactly. Returns
    ``train_id, eval_id, n_common, eval_overlap`` where ``eval_overlap``
    is the contaminated fraction of the eval doc's distinct grams.
    """
    gh = lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")  # noqa: E731

    def gram_hashes(df: DataFrame, out_id: str) -> DataFrame:
        return (
            df.select(F.col(id_col).alias(out_id), tokens(F.col(text_col)).alias("_t"))
            .select(out_id, word_shingles(F.col("_t"), n).alias("_sh"))
            .select(out_id, F.transform("_sh", gh).alias("hs"))
        )

    ev = gram_hashes(eval_df, "eval_id").select(
        "eval_id", F.size("hs").alias("n_eval"), F.explode("hs").alias("h")
    )
    if max_eval_gram_df is not None:
        keep = (
            ev.groupBy("h")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_eval_gram_df)
            .select("h")
        )
        ev = ev.join(keep, "h")
    if broadcast_eval:
        ev = F.broadcast(ev)

    tr = gram_hashes(train, "train_id").select(
        "train_id", F.explode("hs").alias("h")
    )
    # per-doc gram hash arrays are distinct (word_shingles dedups), so the
    # plain join-row count IS the distinct-gram overlap
    return (
        tr.join(ev, "h")
        .groupBy("train_id", "eval_id")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first("n_eval").alias("_n_eval"),
        )
        .where(F.col("n_common") >= min_overlap)
        .select(
            F.col("train_id").cast("long"),
            F.col("eval_id").cast("long"),
            F.col("n_common").cast("long"),
            F.round(
                F.col("n_common") / F.col("_n_eval").cast("double"), 4
            ).alias("eval_overlap"),
        )
    )


#: candidate graphs at or below this many edges collapse on the driver
#: (union-find); above it, distributed min-label propagation
CC_DRIVER_MAX_EDGES = 1_000_000


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    driver_max_edges: int = CC_DRIVER_MAX_EDGES,
) -> DataFrame:
    """Cluster candidate duplicate pairs into components:
    (id, cluster_id = min id reachable). The canonical dedup finishing
    step — MinHash/LSH emits PAIRS, but "keep one per duplicate GROUP"
    needs the transitive closure.

    The edge set is orders of magnitude smaller than the corpus (it's the
    near-dup graph), so ≤ ``driver_max_edges`` edges collapse with a
    driver-side union-find — exact, one collect, no iterative jobs. Above
    that, distributed min-label propagation: every node repeatedly adopts
    the smallest label among itself and its neighbors until a fixpoint —
    the simple variant of the large-star/small-star map-reduce algorithm.
    Each iteration is one join + one aggregation (shuffles on id); rounds
    needed = graph diameter in label-halving steps (log-ish for real dup
    clusters, which are near-cliques).
    """
    edges = (
        pairs.select(
            F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    if driver_max_edges and edges.limit(driver_max_edges + 1).count() <= driver_max_edges:
        rows = edges.collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            a, b = r["a"], r["b"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN root so cluster_id is the smallest member
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = [(x, find(x)) for x in parent]
        spark = pairs.sparkSession
        return _local_df(spark, out, "id long, cluster_id long")
    # undirected: both directions, plus self-loops to keep isolated ends
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).cache()
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .cache()
    )
    # iterative joins grow the logical plan exponentially round over round;
    # localCheckpoint truncates lineage so each round plans O(1) work
    labels = labels.localCheckpoint(eager=True)
    changed = 1
    for _ in range(max_iter):
        # every node: min(own label, neighbors' labels)
        neigh = (
            sym.join(labels, sym.b == labels.id)
            .select(sym.a.alias("id"), "label")
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping (label := label-of-label): halves the remaining
        # path length every round, guaranteeing log-diameter convergence —
        # min-neighbor alone needs diameter rounds on a chain graph
        jumped = (
            new_labels.alias("x")
            .join(
                new_labels.select(
                    F.col("id").alias("jid"), F.col("label").alias("jlabel")
                ),
                F.col("x.label") == F.col("jid"),
                "left",
            )
            .select(
                F.col("x.id").alias("id"),
                F.coalesce(F.col("jlabel"), F.col("x.label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        # returning partial labels would be silently WRONG clusters
        from duckdb_delta_spark.delta.logging import emit

        emit("dedup.cc_no_convergence", max_iter=max_iter)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(pathological graph diameter); raise max_iter"
        )
    return labels.select(
        F.col("id").cast("long"), F.col("label").cast("long").alias("cluster_id")
    )


def keep_canonical(
    docs: DataFrame,
    assignments: DataFrame,
    quality_col: str = "quality_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Representative selection — the step AFTER near-dup clustering in a
    training pipeline (C4/RefinedWeb style): per duplicate cluster keep
    exactly ONE document, the highest-``quality_col`` member (ties →
    lowest id, deterministic).

    100-TB shape: one shuffle join of assignments onto the quality frame
    (both keyed by doc id) and ONE hash aggregation by cluster —
    ``max_by(id, struct(quality, -id))`` does the argmax inside the
    partial/final agg, so there is no per-cluster window sort and no
    second shuffle."""
    joined = assignments.join(
        docs.select(
            F.col(id_col).alias("id"), F.col(quality_col).alias("__q")
        ),
        "id",
    )
    return joined.groupBy("cluster_id").agg(
        F.expr("max_by(id, struct(__q, -id))").cast("long").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.round(F.max("__q"), 4).alias("best_quality"),
    )


SPAN_TOKENS = 20


def word_windows(toks: Column, n: int = SPAN_TOKENS) -> Column:
    """ALL sliding n-token windows (space-joined), duplicates kept —
    :func:`word_shingles` without the distinct, for occurrence counting.
    Same zip_with-of-slices construction (see word_shingles for why the
    element_at form is O(tokens²) after optimizer inlining)."""
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    sh = F.slice(toks, 1, length)
    for k in range(1, n):
        part = F.slice(toks, 1 + k, length)
        sh = F.zip_with(sh, part, lambda a, b: F.concat_ws(" ", a, b))
    return sh


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = SPAN_TOKENS,
) -> DataFrame:
    """Per-document cross-document duplicated-span stats — the candidate
    stage of exact-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": repeated ≥N-token spans
    are memorization fuel and get cut, not whole documents).

    A span = one of the doc's sliding ``span``-token windows (md5-hashed);
    it is DUPLICATED when at least one OTHER document contains the same
    window. Returns doc_id, n_spans (all windows, occurrences counted),
    n_dup_spans (occurrences whose window appears in ≥2 distinct docs),
    dup_fraction — the "how much of this doc exists elsewhere" signal a
    pipeline thresholds on before the expensive span-cutting rewrite.

    100-TB shape: one (doc, span-hash) hash-agg (map-side combined), a
    small hash-keyed distinct-doc-count agg joined back on the same
    partitioning, one final per-doc agg. No window functions, no Python,
    no all-pairs anything; cost is O(total tokens) shuffled once."""
    from duckdb_delta_spark.operators.text import tokens

    # Complement counting (round-21; same equivalence family as the
    # doc_ngram_novelty rewrite): a window hash with n_docs == 1 has a
    # unique OWNER (min = its only doc_id), so
    #   n_dup_spans(doc) = n_spans(doc) − Σ n_in_doc over the doc's
    #                      unique-to-it window hashes
    # — which removes the join of the full per-doc-span stream back on
    # h AND the doc-keyed shuffle of that join's output. n_spans itself
    # is just the window count, computed in the scan projection
    # (word_windows keeps duplicates, so size() counts occurrences).
    # Remaining exchanges: (id,h) agg → h agg (map-side combined) →
    # tiny per-owner agg; the h-keyed stream crosses once.
    base = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    ).select(id_col, F.explode(word_windows(F.col("__t"), span)).alias("__w"))
    per_doc_span = base.groupBy(id_col, F.md5("__w").alias("h")).agg(
        F.count(F.lit(1)).alias("n_in_doc")
    )
    uniq = (
        per_doc_span.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias(id_col),
            F.sum("n_in_doc").alias("tot_in"),
        )
        .where(F.col("n_docs") == 1)
        .groupBy(id_col)
        .agg(F.sum("tot_in").cast("long").alias("n_uniq_spans"))
    )
    # n_spans needs NO window construction: the sliding-window count of
    # a doc is just max(len(tokens) − span + 1, 0) (word_windows keeps
    # duplicates, so occurrences == window positions)
    counts = df.select(
        F.col(id_col),
        F.greatest(
            F.size(tokens(F.col(text_col))) - (span - 1), F.lit(0)
        ).cast("long").alias("n_spans"),
    )
    # docs too short to have any window appear with zero counts (their
    # 0/0 dup_fraction is NULL before the coalesce, exactly like the
    # old left-join shape)
    return (
        counts.join(uniq, id_col, "left")
        .select(
            id_col,
            F.col("n_spans"),
            (F.col("n_spans") - F.coalesce("n_uniq_spans", F.lit(0)))
            .cast("long").alias("n_dup_spans"),
        )
        .select(
            id_col,
            "n_spans",
            "n_dup_spans",
            # n_spans = 0 rows now EXIST (the old shape dropped them
            # before the division and re-added them via left join), so
            # the 0/0 must be guarded explicitly under ANSI mode
            F.when(
                F.col("n_spans") > 0,
                F.round(F.col("n_dup_spans") / F.col("n_spans"), 4),
            ).otherwise(F.lit(0.0)).alias("dup_fraction"),
        )
    )


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup an incoming shard against an existing (huge) corpus — the
    daily-ingest shape: corpus is 100 TB and already deduped, the new
    batch is a few GB, and the question is "which batch docs are new?".

    The naive ``batch LEFT ANTI JOIN corpus`` shuffles BOTH sides on the
    fingerprint — i.e. re-shuffles the whole corpus for every daily batch.
    This operator never shuffles the corpus at all:

      1. distinct batch fingerprints (small — one agg over the batch),
      2. ``corpus ⋉ broadcast(batch_fps)`` — a broadcast-hash SEMI join
         executed as a single pass over the corpus scan; the result
         ("hits": corpus fingerprints that also appear in the batch) is
         at most batch-sized,
      3. ``batch ANTI broadcast(hits)`` — tiny.

    Catalyst additionally pushes a bloom/IN runtime filter from the
    broadcast side into the corpus parquet scan when
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` is on, so step 2
    reads even less. Output is EXACT (no false positives survive):
    batch rows whose fingerprint is absent from the corpus, plus
    ``is_new`` stats. A plan test asserts the corpus side is
    BroadcastHashJoin with no Exchange on the corpus branch."""
    from duckdb_delta_spark.operators.text import with_fingerprint

    fp_batch = with_fingerprint(batch, text_col)
    fp_corpus = with_fingerprint(corpus, text_col)
    batch_fps = fp_batch.select("fingerprint").distinct()
    hits = (
        fp_corpus.select("fingerprint")
        .join(F.broadcast(batch_fps), "fingerprint", "left_semi")
        .distinct()
    )
    return fp_batch.join(F.broadcast(hits), "fingerprint", "left_anti")


#: near-dup banding defaults: 48-bit signature, 3 bands of 16 bits —
#: pigeonhole guarantees every pair at Hamming distance < 3 shares a band
NEARDUP_BITS = 48
NEARDUP_BAND_BITS = 16
NEARDUP_MAX_HAMMING = 2


def simhash_near_dup_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = NEARDUP_BITS,
    band_bits: int = NEARDUP_BAND_BITS,
    max_hamming: int = NEARDUP_MAX_HAMMING,
) -> DataFrame:
    """Per-document near-duplicate count: how many OTHER docs sit within
    ``max_hamming`` bits of this doc's SimHash. Exact (the banding is a
    lossless candidate generator: with b bands, any pair with
    Hamming < b shares at least one full band — pigeonhole — so
    ``max_hamming`` must stay < bands, asserted).

    The 100-TB trick is that the quadratic stage runs on DISTINCT
    signatures, not documents: templated corpora concentrate millions of
    docs onto few signatures, so (1) identical-signature duplicates are
    counted with one hash-agg (no pairs materialized), and (2) the band
    self-join + Hamming verify touches each signature once per band.
    Document counts then re-attach via a signature-keyed join.
    """
    if max_hamming >= bits // band_bits:
        raise ValueError("max_hamming must be < number of bands")
    sig = simhash(df, text_col, id_col, bits=bits)
    # the distinct-signature table feeds 2 sides × (bits/band_bits) band
    # joins plus the final re-attach; persist it so the signature explode
    # + vote agg over the corpus runs ONCE, not once per reference
    counts = sig.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("cnt")
    ).persist()
    mask = (1 << band_bits) - 1
    pairs = None
    for b in range(bits // band_bits):
        bv = F.shiftright(F.col("simhash"), b * band_bits).bitwiseAND(
            F.lit(mask)
        )
        left = counts.select(F.col("simhash").alias("sig_a"), bv.alias("bv"))
        right = counts.select(F.col("simhash").alias("sig_b"), bv.alias("bv"))
        p = (
            left.join(right, "bv")
            .where(F.col("sig_a") < F.col("sig_b"))
            .select("sig_a", "sig_b")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    near = pairs.distinct().where(
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= max_hamming
    )
    sym = near.unionByName(
        near.select(
            F.col("sig_b").alias("sig_a"), F.col("sig_a").alias("sig_b")
        )
    )
    nb = (
        sym.join(counts.withColumnRenamed("simhash", "sig_b"), "sig_b")
        .groupBy("sig_a")
        .agg(F.sum("cnt").alias("n_nb"))
        .withColumnRenamed("sig_a", "simhash")
    )
    return (
        sig.join(counts, "simhash")
        .join(nb, "simhash", "left")
        .select(
            F.col(id_col),
            (F.col("cnt") - 1 + F.coalesce(F.col("n_nb"), F.lit(0)))
            .cast("long")
            .alias("n_near_dups"),
        )
    )


def minhash_estimate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = MINHASH_HASHES, band_size: int = MINHASH_BAND_SIZE,
) -> DataFrame:
    """Estimator-calibration view of the MinHash pipeline: for every LSH
    candidate pair, the MinHash Jaccard ESTIMATE (fraction of agreeing
    signature components — the quantity LSH actually thresholds on) next
    to the EXACT shingle Jaccard, with the absolute error. The query that
    answers "are 8 hashes enough for this corpus, or are we
    over/under-merging?" before a 100-TB dedup run commits to a config.

    Same banding join as :func:`minhash_candidate_pairs`; the exact
    verify joins each side's distinct-shingle array back in (candidate-
    confined quadratic work, the LSH contract)."""
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    grams = toked.select(
        F.col(id_col), word_shingles(F.col("_t")).alias("grams")
    )
    exploded = grams.select(
        F.col(id_col), F.explode("grams").alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("sh")))).alias(f"mh_{s}")
        for s in range(num_hashes)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    n_bands = num_hashes // band_size
    for b in range(n_bands):
        cols = [F.col(f"mh_{b * band_size + k}") for k in range(band_size)]
        sig = sig.withColumn(f"band_{b}", F.md5(F.concat_ws("|", *cols)))
    a = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh_{s}").alias(f"a_{s}") for s in range(num_hashes)],
        *[F.col(f"band_{b}").alias(f"ab_{b}") for b in range(n_bands)],
    )
    b_ = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh_{s}").alias(f"b_{s}") for s in range(num_hashes)],
        *[F.col(f"band_{b}").alias(f"bb_{b}") for b in range(n_bands)],
    )
    # the estimate is a pure function of the pair, so compute it INSIDE
    # each band join and dedup on the narrow (id_a, id_b, est) row —
    # the previous shape ran distinct() over all 2×num_hashes md5 strings
    # (~1.1 KB/row through the exchange vs ~24 B now; guide §2.3, shuffle
    # fewer bytes). Same pairs, same estimate, bit-identical output.
    agree = None
    for s in range(num_hashes):
        t = F.when(F.col(f"a_{s}") == F.col(f"b_{s}"), 1).otherwise(0)
        agree = t if agree is None else agree + t
    est_col = (agree / float(num_hashes)).alias("est_jaccard")
    pairs = None
    for b in range(n_bands):
        p = (
            a.join(b_, F.col(f"ab_{b}") == F.col(f"bb_{b}"))
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", est_col)
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    est = pairs.distinct()
    ga = grams.select(F.col(id_col).alias("id_a"), F.col("grams").alias("ga"))
    gb = grams.select(F.col(id_col).alias("id_b"), F.col("grams").alias("gb"))
    ex = (
        est.join(ga, "id_a").join(gb, "id_b")
        .withColumn("n_i", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.col("n_i")
            / (F.size("ga") + F.size("gb") - F.col("n_i")).cast("double"),
        )
    )
    return ex.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"),
        F.round("est_jaccard", 4).alias("est_jaccard"),
        F.round("jaccard", 4).alias("jaccard"),
        F.round(F.abs(F.col("est_jaccard") - F.col("jaccard")), 4)
        .alias("abs_err"),
    )


def prefix_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_chars: int = 16,
    side: str = "prefix",
) -> DataFrame:
    """Truncation-duplicate pairs: document A is a strict PREFIX of
    document B — the shape exact/MinHash dedup miss (a truncated scrape
    of the same page has low Jaccard once the longer tail dominates,
    and different hashes).

    Bucketing: any strict prefix pair with len(A) >= ``key_chars``
    shares its first ``key_chars`` characters, so the join key is that
    fixed prefix — an equi-join whose buckets are "documents opening
    with the same 16 chars", then the exact ``startswith`` verify runs
    only inside buckets. Docs shorter than ``key_chars`` are excluded
    (at 100 TB the sub-16-char stratum is noise; route it through exact
    dedup). Boilerplate openings ("<!DOCTYPE html>…") make hot buckets —
    raise ``key_chars`` or pre-strip boilerplate if one key dominates.

    ``side="suffix"`` mirrors the test to document ENDINGS — doc A is a
    strict suffix of doc B (a rescrape that gained a new header keeps
    the same tail): key = last ``key_chars`` characters, verify =
    ``substring(b, len_b - len_a + 1) = a``.

    The candidate join carries NO text (plan-asserted): each doc
    projects, map-side, (16-char key, length, md5 of its full text, a
    geometric LADDER of prefix/suffix hashes). Candidates join on the
    key over those fixed-width columns; a ladder-hash check at the
    largest ladder length ≤ len_a prunes hot-bucket false pairs (docs
    sharing boilerplate openings diverge early) before the confirm
    step, which joins the survivors back to the corpus on the B id —
    a small side AQE turns into a runtime broadcast, so text stays
    where it lives — and checks ``md5(substring(b, ..., len_a)) =
    md5(a)`` (128-bit; full-string compare would re-fetch A's text
    for a ~2^-128 collision bound).

    Returns (id_a, id_b, len_a, len_b, containment) with A the
    contained side, containment = len_a/len_b."""
    if side not in ("prefix", "suffix"):
        raise ValueError(f"side must be 'prefix' or 'suffix', got {side}")
    # geometric ladder (4x steps) from the join key up to 1 MiB: ~9
    # fixed-width hashes per doc replace the text in the shuffle
    ladder = []
    step = key_chars
    while step <= 1 << 20:
        ladder.append(step)
        step *= 4
    t = F.col("__t")
    if side == "prefix":
        key = F.substring("__t", 1, key_chars)
        piece = lambda n: F.substring("__t", 1, n)  # noqa: E731
    else:
        key = F.expr(f"substring(__t, -{key_chars}, {key_chars})")
        piece = lambda n: F.expr(f"substring(__t, -{n}, {n})")  # noqa: E731
    base = (
        df.select(
            F.col(id_col), F.col(text_col).alias("__t"),
            F.length(text_col).alias("__len"),
        )
        .where(F.col("__len") >= key_chars)
        .select(
            id_col, "__len",
            key.alias("__key"),
            F.md5(t).alias("__h_full"),
            F.array(*[
                F.when(F.col("__len") >= n, F.xxhash64(piece(n)))
                for n in ladder
            ]).alias("__hl"),
        )
    )
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("__len").alias("len_a"),
        "__key", F.col("__h_full").alias("h_a"), F.col("__hl").alias("hl_a"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("__len").alias("len_b"),
        "__key", F.col("__hl").alias("hl_b"),
    )
    # largest ladder index with ladder[i] <= len_a (1-based for element_at);
    # len_a >= key_chars = ladder[0], so idx >= 1 always
    idx = sum(
        (F.col("len_a") >= n).cast("int") for n in ladder
    ).alias("__idx")
    cand = (
        a.join(b, "__key")
        .where(F.col("len_a") < F.col("len_b"))
        .withColumn("__idx", idx)
        .where(
            F.element_at("hl_b", F.col("__idx"))
            == F.element_at("hl_a", F.col("__idx"))
        )
        .select("id_a", "id_b", "len_a", "len_b", "h_a")
    )
    # confirm on the exact length against the corpus text, fetched only
    # for the survivors' B side (AQE broadcasts cand when it is small)
    confirm = (
        F.md5(F.expr("substring(__t, 1, len_a)"))
        if side == "prefix"
        else F.md5(F.expr("substring(__t, len_b - len_a + 1, len_a)"))
    )
    corpus_b = df.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("__t"),
    )
    return (
        corpus_b.join(cand, "id_b")
        .where(confirm == F.col("h_a"))
        .select(
            F.col("id_a").cast("long"), F.col("id_b").cast("long"),
            F.col("len_a").cast("long"), F.col("len_b").cast("long"),
            F.round(F.col("len_a") / F.col("len_b"), 4).alias("containment"),
        )
    )
