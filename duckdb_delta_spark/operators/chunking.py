"""Chunking / sequence packing / stratified sampling — the steps between a
raw document corpus and a training batch.

Scale shape (designed for 100 TB corpora):

* ``chunk_documents`` and ``stratified_sample`` are embarrassingly
  parallel row transforms — built-in Spark expressions only (whole-stage
  codegen, zero shuffle, no Python).
* ``pack_greedy`` shuffles ONCE on a bounded shard key and runs one
  window per shard; shard count scales with the cluster, and per-shard
  state is a running sum — no global ordering, no driver involvement.

Every function is deterministic (md5-derived hashing, fixed tie-breaks)
so the DuckDB oracles compare exact values, not statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from duckdb_delta_spark.operators.text import TOKEN_SPLIT_RE


def ws_tokens(text: Column) -> Column:
    """Raw whitespace tokens, case preserved (chunk text must roundtrip)."""
    return F.filter(F.split(F.trim(text), TOKEN_SPLIT_RE), lambda t: t != "")


def hash_bucket(col: Column, buckets: int, salt: str = "") -> Column:
    """Deterministic uniform bucket from md5 — identical in Spark and the
    DuckDB oracle (both hash the same UTF-8 string)."""
    s = F.concat(col.cast("string"), F.lit(":" + salt)) if salt else col.cast("string")
    return (F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % buckets)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Fixed-budget overlapping token windows per document.

    ``stride = chunk_tokens - overlap``; chunk ``i`` covers tokens
    ``[i*stride, i*stride + chunk_tokens)``. A document with ``n`` tokens
    yields ``max(1, ceil((n - overlap) / stride))`` chunks, so every token
    lands in at least one chunk and consecutive chunks share ``overlap``
    tokens. Empty documents yield nothing.

    Output: (id, chunk_idx, chunk_tokens, chunk_hash) — the hash is md5 of
    the space-joined chunk so equality checks are exact without shipping
    chunk text. One explode, zero shuffle, all codegen.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    out = (
        df.withColumn("__toks", ws_tokens(F.col(text_col)))
        .withColumn("__n", F.size("__toks"))
        .where(F.col("__n") > 0)
        .withColumn(
            "__n_chunks",
            F.greatest(
                F.lit(1),
                F.ceil((F.col("__n") - F.lit(overlap)) / F.lit(float(stride))),
            ).cast("int"),
        )
        .withColumn(
            "chunk_idx", F.explode(F.sequence(F.lit(0), F.col("__n_chunks") - 1))
        )
        .withColumn(
            "__chunk",
            F.slice("__toks", F.col("chunk_idx") * stride + 1, chunk_tokens),
        )
    )
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("__chunk").cast("long").alias("chunk_tokens"),
        F.md5(F.array_join("__chunk", " ")).alias("chunk_hash"),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    tok_col: str = "n_tokens",
    budget: int = 2048,
    shards: int = 32,
) -> DataFrame:
    """Pack documents into fixed token-budget bins (training sequences).

    Documents are sharded by a deterministic hash, ordered by id within
    the shard, and assigned ``bin = floor(exclusive_cumsum / budget)`` —
    the streaming analogue of greedy first-fit packing that needs only a
    per-shard running sum. Bins may overflow by at most one document
    (documents are never split); callers chunk first if that matters.

    Output: one row per (shard, bin) with n_docs and token totals.
    """
    shard = hash_bucket(F.col(id_col), shards)
    w = Window.partitionBy("shard").orderBy(id_col)
    toks = F.col(tok_col).cast("long")
    return (
        df.withColumn("shard", shard)
        .withColumn("__cum", F.sum(toks).over(w))
        .withColumn(
            "bin", F.floor((F.col("__cum") - toks) / F.lit(budget)).cast("long")
        )
        .groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("bin_tokens"),
        )
    )


def stratified_sample(
    df: DataFrame,
    rates_pct: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_pct: int = 0,
    salt: str = "mix1",
) -> DataFrame:
    """Deterministic per-stratum sampling (dataset mixing weights).

    Keeps a row iff ``md5(id:salt) % 100 < rates_pct[stratum]`` — exactly
    reproducible across engines and runs, no RNG state, embarrassingly
    parallel. Changing the salt redraws the sample.
    """
    bucket = hash_bucket(F.col(id_col), 100, salt=salt)
    rate = F.lit(default_pct)
    for k, v in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    return df.where(bucket < rate)


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-epoch shuffle: every epoch induces a fresh
    pseudo-random permutation — ``key = md5(epoch:id)`` — with documents
    range-assigned to ``n_shards`` shards and ordered inside each shard.

    Scale shape: shard assignment is embarrassingly parallel; the
    within-shard position is a window over the SHARD (n_shards bounded
    partitions, each ~|df|/n_shards rows), never a global
    ``row_number()`` (which funnels 100 TB through one partition). A
    training loader reads shards in order (shard, pos) to replay the
    exact permutation; changing ``epoch`` redraws it with no RNG state.
    """
    key = F.md5(
        F.concat_ws(":", F.lit(str(int(epoch))), F.col(id_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(key, 1, 4), 16, 10).cast("long") % n_shards
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy("_ekey", id_col)
    return (
        df.withColumn("_ekey", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_ekey")
    )


def split_assign(
    df: DataFrame,
    weights: dict[str, int] | None = None,
    id_col: str = "doc_id",
    salt: str = "split1",
) -> DataFrame:
    """Deterministic train/val/test split assignment: each row lands in
    the split whose cumulative weight band contains
    ``md5(id:salt) % 100`` — stable across runs, engines, and cluster
    sizes (no RNG state, no sampling jobs), and changing the salt redraws
    the split. The holdout therefore SURVIVES pipeline re-runs — the
    property that matters, since a resampled holdout silently leaks
    training data into eval.

    ``weights``: split name → percent, summing to 100 (default
    train/val/test = 96/2/2). Adds a ``split`` column; pure codegen."""
    weights = weights or {"train": 96, "val": 2, "test": 2}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100: {weights}")
    bucket = hash_bucket(F.col(id_col), 100, salt=salt)
    expr = None
    lo = 0
    for name, w in sorted(weights.items()):
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn("split", expr)


def cap_per_group(
    df: DataFrame,
    max_per_group: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap1",
) -> DataFrame:
    """Per-group document cap (e.g. max N pages per DOMAIN — the
    anti-SEO-farm rule every web-scale corpus applies): keep the
    ``max_per_group`` rows of each group that rank first by
    ``md5(id:salt)`` — a deterministic uniform sample without RNG state.

    Two-stage top-k (same shape as brute_force_topk): stage 1 ranks
    within (group, physical partition) and keeps k rows per group-shard,
    so the global per-group window consumes ≤ k × #partitions rows even
    for a mega-domain holding 1% of the corpus — never the whole group
    in one task. Spark pushes WindowGroupLimit below both exchanges."""
    from pyspark.sql.window import Window

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    staged = df.withColumn("__key", key).withColumn(
        "__pid", F.spark_partition_id()
    )
    order = (F.col("__key").asc(), F.col(id_col).asc())
    w1 = Window.partitionBy(group_col, "__pid").orderBy(*order)
    cand = staged.withColumn("__r1", F.row_number().over(w1)).where(
        F.col("__r1") <= max_per_group
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        cand.withColumn("__r2", F.row_number().over(w2))
        .where(F.col("__r2") <= max_per_group)
        .drop("__key", "__pid", "__r1", "__r2")
    )


def temperature_mix(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "temp1",
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-sampling rule of
    mBERT/XLM-R/PaLM, T=2): per-source sampling mass ∝ size^(1/2), so
    small sources are up-weighted relative to their share and no source
    drowns the mixture. Rates are DERIVED FROM THE DATA (one per-source
    agg), unlike :func:`stratified_sample` where the caller fixes them.

    All arithmetic is integer (isqrt via floor∘sqrt on BIGINT-ranged
    values, integer division, ppm rates) so Spark and the oracle agree
    bit-for-bit — no float summation-order hazards. Selection is the
    md5-ppm draw: keep iff ``md5(id:salt) % 1e6 < rate_ppm``.

    Scale shape: one map-side-combined per-source agg (source cardinality
    is tiny), a single-row total joined back by broadcast, and a
    broadcast rates join into the corpus scan — the 100 TB pass is one
    embarrassingly parallel filter. Adds ``rate_ppm`` to kept rows.
    """
    rates = temperature_rates(df, budget_tokens, source_col, weight_col)
    draw = hash_bucket(F.col(id_col), 1_000_000, salt=salt)
    return (
        df.join(F.broadcast(rates.select(source_col, "rate_ppm")), source_col)
        .where(draw < F.col("rate_ppm"))
    )


def temperature_rates(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    weight_col: str = "n_chars",
) -> DataFrame:
    """The per-source rate table behind :func:`temperature_mix`:
    (source, tok_s, rate_ppm). Integer-exact end to end."""
    per = df.groupBy(source_col).agg(
        F.sum(weight_col).cast("long").alias("tok_s")
    )
    per = per.withColumn(
        "s_s", F.floor(F.sqrt(F.col("tok_s").cast("double"))).cast("long")
    )
    tot = per.agg(F.sum("s_s").alias("tot_s"))
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn(
            "target_s",
            F.expr(f"CAST({int(budget_tokens)} AS BIGINT) * s_s div tot_s"),
        )
        .withColumn(
            "rate_ppm",
            F.least(
                F.lit(1_000_000).cast("long"),
                F.expr("target_s * 1000000 div greatest(tok_s, 1)"),
            ),
        )
        .select(source_col, "tok_s", "rate_ppm")
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    salt: str = "shard1",
) -> DataFrame:
    """Deterministic export sharding + manifest (the last step before a
    training run: N output shards of roughly equal mass, plus a manifest
    row per shard a loader can checksum against).

    Shard = md5 hash bucket of the id (uniform, RNG-free, stable across
    runs/engines). The manifest is one hash-agg: per shard n_docs, total
    size, and a content fingerprint — md5 of the comma-joined SORTED id
    list, so any lost/duplicated/reordered document changes the
    fingerprint. Per-shard state is bounded by |corpus|/n_shards; the
    in-agg sort replaces any global window."""
    shard = hash_bucket(F.col(id_col), n_shards, salt=salt)
    return (
        df.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(size_col).cast("long").alias("total_chars"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.sort_array(
                        F.collect_list(F.col(id_col).cast("string"))
                    ),
                )
            ).alias("content_md5"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, int] | None = None,
    id_col: str = "doc_id",
    salt: str = "split1",
) -> DataFrame:
    """Split assignment that CANNOT leak near-duplicates across splits:
    documents are split by their near-dup CLUSTER id (connected
    components over the candidate-pair graph), not their own id — two
    near-identical documents always land in the same split, so the
    holdout never contains a paraphrase of a training document (the
    classic silent eval-inflation bug).

    ``pairs``: near-dup candidate pairs (id_a, id_b), e.g. from
    MinHash/LSH banding. Docs in no pair form singleton clusters (their
    own id). Adds ``cluster_id`` and ``split``."""
    from duckdb_delta_spark.operators.dedup import connected_components

    comp = connected_components(pairs)
    joined = (
        df.join(comp, df[id_col] == comp["id"], "left")
        .drop("id")
        .withColumn(
            "cluster_id",
            F.coalesce(F.col("cluster_id"), F.col(id_col)).cast("long"),
        )
    )
    return split_assign(joined, weights, id_col="cluster_id", salt=salt)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight: Column,
    id_col: str = "doc_id",
    salt: str = "ws1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis exponential keys): keep the ``n`` rows with the
    largest ``ln(u_i) / w_i`` where ``u_i`` is a uniform(0,1) draw
    derived from ``md5(salt:id)`` — inclusion probability proportional
    to weight, reproducible across engines and runs (no RNG state), and
    the selection is a single top-n, so the 100-TB cost is one scan plus
    a two-stage top-n (per-partition partial, then global) — never a
    full sort. The quality-weighted subsampling primitive: pass the
    quality score (or token count) as ``weight``; changing the salt
    redraws.

    Key values round to 9dp before ranking (both engines produce
    bit-identical md5-derived u; one rounding point keeps the ln/div
    float path tie-stable); ties rank by id."""
    from pyspark.sql.window import Window

    u = (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
            1, 15), 16, 10).cast("double")
        / F.lit(float(2 ** 60))
    )
    key = F.round(F.log(u) / weight, 9)
    scored = df.withColumn("__skey", key).withColumn(
        "__pid", F.spark_partition_id()
    )
    order = (F.col("__skey").desc(), F.col(id_col).asc())
    w_partial = Window.partitionBy("__pid").orderBy(*order)
    w = Window.orderBy(*order)
    return (
        scored.withColumn("__prank", F.row_number().over(w_partial))
        .where(F.col("__prank") <= n)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
        .drop("__skey", "__pid", "__prank")
        .withColumn("sample_rank", F.col("sample_rank").cast("long"))
    )
