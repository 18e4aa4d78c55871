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


def word_shingles(text: Column, n: int = SHINGLE_N) -> Column:
    """Distinct n-word shingles (space-joined) of lowercased text."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k) for k in range(n)]
        ),
    )
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
    exploded = (
        df.select(F.col(id_col), F.explode(word_shingles(F.col(text_col))).alias("sh"))
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


def minhash_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """LSH candidate duplicate pairs: docs sharing any band bucket.

    The self-join is per-band on the band hash — the classic banding join;
    at 100 TB the band column is a well-distributed shuffle key and each
    bucket is tiny unless docs truly collide."""
    sig = minhash_signatures(df, text_col, id_col)
    n_bands = MINHASH_HASHES // MINHASH_BAND_SIZE
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
    votes = []
    for j in range(bits):
        nib = F.conv(F.substring("h", 1 + j // 4, 1), 16, 10).cast("int")
        bit = F.shiftright(nib, 3 - (j % 4)) % 2
        votes.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"v_{j}"))
    agg = toked.groupBy(id_col).agg(*votes)
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"v_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select(
        F.col(id_col).cast("long"), sig.cast("long").alias("simhash")
    )


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams of lowercased whitespace-normalized text."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(n))))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within blocking buckets.

    Blocking bounds the pair space (at corpus scale you never do all-pairs);
    the gram-level join computes |A∩B| distributed, |A∪B| from per-doc
    counts."""
    grams = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        F.explode(char_ngrams(F.col(text_col), n)).alias("g"),
    )
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    cond = [F.col("a.g") == F.col("b.g")] + [
        F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols
    ]
    inter = (
        a.join(b, on=cond)
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_grams").alias("nb"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 4
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            "jaccard",
        )
    )
    return out
