"""Training-data pipeline queries: dedup / similarity / text / multimodal.

Each entry wraps an operator from ``duckdb_delta_spark.operators`` and
carries a DuckDB oracle that computes the *identical deterministic
function* in SQL (md5-based hashing, shared stopword lists, driver-side
LSH plane constants inlined into both sides), so the driver's hash compare
is exact — not merely statistical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_delta_spark.operators import dedup as D
from duckdb_delta_spark.operators import similarity as S
from duckdb_delta_spark.operators import text as X
from duckdb_delta_spark.queries import load, register

# ---------------------------------------------------------------- helpers

_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"


def _sw_list(words) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def _hits(lang: str) -> str:
    return (
        f"len(list_filter({_TOKS}, x -> x IN {_sw_list(X.STOPWORDS[lang])}))"
    )


# ---------------------------------------------------------------- text ops

@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
           round(list_sum(list_transform(t, x -> CAST(length(x) AS DOUBLE)))
                 / greatest(len(t), 1), 4) AS mean_token_len
    FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
    """,
    group="text",
)
def text_token_stats(spark, sf_dir):
    df = load(spark, sf_dir, "documents")
    return X.with_token_stats(df).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "mean_token_len"
    )


@register(
    "text_tfidf_terms",
    oracle=f"""
    WITH pairs AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
        GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM pairs GROUP BY term
    ), scored AS (
        SELECT p.doc_id, p.term, p.tf, d.df,
               round(p.tf * ln((SELECT count(*) FROM documents)
                               / CAST(d.df AS DOUBLE)), 4) AS score
        FROM pairs p JOIN dfreq d USING (term)
    )
    SELECT doc_id, term, tf, df, score, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term ASC
        ) AS BIGINT) AS rank FROM scored
    ) WHERE rank <= 5
    """,
    group="text",
)
def text_tfidf_terms(spark, sf_dir):
    """Per-document top-5 TF-IDF keywords: (doc,term) hash-agg + small
    df agg joined on the term partitioning + bounded per-doc window."""
    df = load(spark, sf_dir, "documents")
    return X.tfidf_top_terms(df, k=5)


def _langid_oracle() -> str:
    langs = sorted(X.STOPWORDS)  # alphabetical = the Spark tie-break order
    hit_cols = ", ".join(f"{_hits(lang)} AS hits_{lang}" for lang in langs)
    case = "CASE "
    for i, lang in enumerate(langs):
        others = [f"hits_{lang} >= hits_{o}" for o in langs[i + 1 :]]
        cond = " AND ".join(others) if others else "TRUE"
        case += f"WHEN {cond} THEN '{lang}' "
    case += "END"
    greatest = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    return f"""
    SELECT doc_id, {case} AS lang_detected,
           CAST({greatest} AS BIGINT) AS stopword_hits
    FROM (SELECT doc_id, {hit_cols} FROM documents)
    """


@register("text_language_id", oracle=_langid_oracle(), group="text")
def text_language_id(spark, sf_dir):
    df = load(spark, sf_dir, "documents")
    return X.with_language(df).select("doc_id", "lang_detected", "stopword_hits")


def _quality_oracle() -> str:
    all_sw = sorted({w for ws in X.STOPWORDS.values() for w in ws})
    return f"""
    SELECT doc_id, n_tokens, n_distinct_tokens, mean_token_len, n_punct,
           punct_ratio, stopword_ratio,
           round(CASE WHEN n_tokens < {X.QUALITY_MIN_TOKENS} THEN 0.0
                      ELSE least(1.0, n_distinct_tokens / CAST(n_tokens AS DOUBLE)
                                      + stopword_ratio) END, 4) AS quality_score
    FROM (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
             round(list_sum(list_transform(t, x -> CAST(length(x) AS DOUBLE)))
                   / greatest(len(t), 1), 4) AS mean_token_len,
             CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                  AS BIGINT) AS n_punct,
             round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                   / CAST(greatest(length(text), 1) AS DOUBLE), 4) AS punct_ratio,
             round(len(list_filter(t, x -> x IN {_sw_list(all_sw)}))
                   / CAST(greatest(len(t), 1) AS DOUBLE), 4) AS stopword_ratio
      FROM (SELECT doc_id, text, {_TOKS} AS t FROM documents))
    """


@register("text_quality", oracle=_quality_oracle(), group="text")
def text_quality(spark, sf_dir):
    df = load(spark, sf_dir, "documents")
    return X.with_quality(df).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "mean_token_len",
        "n_punct", "punct_ratio", "stopword_ratio", "quality_score",
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
    group="text",
)
def text_fingerprint(spark, sf_dir):
    df = load(spark, sf_dir, "documents")
    return X.with_fingerprint(df).select("doc_id", "fingerprint")


# ---------------------------------------------------------------- dedup

@register(
    "dedup_exact",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_dupes
    FROM documents GROUP BY 1
    """,
    group="dedup",
)
def dedup_exact(spark, sf_dir):
    return D.exact_dedup(load(spark, sf_dir, "documents"))


_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 0)), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)


def _minhash_sig_sql(num_hashes: int | None = None,
                     band_size: int | None = None) -> str:
    nh = num_hashes or D.MINHASH_HASHES
    bs = band_size or D.MINHASH_BAND_SIZE
    mins = ", ".join(
        f"min(md5('{s}:' || sh)) AS mh_{s}" for s in range(nh)
    )
    n_bands = nh // bs
    bands = ", ".join(
        "md5("
        + " || '|' || ".join(
            f"mh_{b * bs + k}" for k in range(bs)
        )
        + f") AS band_{b}"
        for b in range(n_bands)
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({_SHINGLES}) AS sh FROM toks),
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id)
    SELECT doc_id, {bands} FROM sig
    """


@register("dedup_minhash_signatures", oracle=_minhash_sig_sql(), group="dedup")
def dedup_minhash_signatures(spark, sf_dir):
    return D.minhash_signatures(load(spark, sf_dir, "documents"))


def _minhash_pairs_sql(num_hashes: int | None = None,
                       band_size: int | None = None) -> str:
    sig = _minhash_sig_sql(num_hashes, band_size)
    n_bands = (num_hashes or D.MINHASH_HASHES) // (
        band_size or D.MINHASH_BAND_SIZE)
    unions = "\nUNION\n".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sigs a JOIN sigs b "
        f"ON a.band_{b} = b.band_{b} AND a.doc_id < b.doc_id"
        for b in range(n_bands)
    )
    return f"WITH sigs AS ({sig})\n{unions}"


@register("dedup_minhash_pairs", oracle=_minhash_pairs_sql(), group="dedup")
def dedup_minhash_pairs(spark, sf_dir):
    return D.minhash_candidate_pairs(load(spark, sf_dir, "documents"))


def _simhash_sql() -> str:
    votes = ", ".join(
        "sum(CASE WHEN (CAST(strpos('0123456789abcdef', substr(h, %d, 1)) - 1 AS INTEGER)"
        " >> %d) %% 2 = 1 THEN 1 ELSE -1 END) AS v_%d" % (1 + j // 4, 3 - (j % 4), j)
        for j in range(D.SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN v_{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(D.SIMHASH_BITS)
    )
    return f"""
    WITH toked AS (
      SELECT doc_id, md5(unnest({_TOKS})) AS h FROM documents),
    agg AS (SELECT doc_id, {votes} FROM toked GROUP BY doc_id)
    SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM agg
    """


@register("dedup_simhash", oracle=_simhash_sql(), group="dedup")
def dedup_simhash(spark, sf_dir):
    return D.simhash(load(spark, sf_dir, "documents"))


_NORM = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
_NGRAMS_N = (
    "list_distinct(list_transform(generate_series(1, greatest(length(n) - 2, 0)), "
    "i -> substr(n, i, 3)))"
)


@register(
    "dedup_ngram_jaccard",
    # the oracle is deliberately the brute-force all-pairs formulation —
    # independent of the Spark side's prefix/positional/length filtering,
    # so a filter bug surfaces as a mismatch instead of being mirrored
    oracle=f"""
    WITH norm AS (SELECT doc_id, lang, {_NORM} AS n FROM documents),
    sets AS (SELECT doc_id AS id, lang,
                    list_sort(list_distinct(list_transform({_NGRAMS_N},
                      g -> ('0x' || substr(md5(g), 1, 15))::BIGINT))) AS hs
             FROM norm),
    sized AS (SELECT id, lang, hs, len(hs) AS n_g FROM sets),
    pairs AS (SELECT a.id AS id_a, b.id AS id_b,
                     len(list_intersect(a.hs, b.hs)) AS ni,
                     a.n_g AS na, b.n_g AS nb
              FROM sized a JOIN sized b ON a.lang = b.lang AND a.id < b.id)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(ni / CAST(na + nb - ni AS DOUBLE), 4) AS jaccard
    FROM pairs
    WHERE round(ni / CAST(na + nb - ni AS DOUBLE), 4) >= 0.8
    """,
    group="dedup",
)
def dedup_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(load(spark, sf_dir, "documents"))


# benchmark decontamination: every 50th doc stands in for the eval set;
# the oracle is the brute-force all-pairs list_intersect formulation,
# independent of the Spark side's broadcast + explode-join plan
@register(
    "doc_decontaminate",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sets AS (SELECT doc_id,
                    list_sort(list_distinct(list_transform({_SHINGLES},
                      g -> ('0x' || substr(md5(g), 1, 15))::BIGINT))) AS hs
             FROM toks),
    tr AS (SELECT doc_id, hs FROM sets WHERE doc_id % 50 <> 0),
    ev AS (SELECT doc_id, hs, len(hs) AS n_eval FROM sets
           WHERE doc_id % 50 = 0),
    pairs AS (SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
                     len(list_intersect(tr.hs, ev.hs)) AS n_common,
                     ev.n_eval AS n_eval
              FROM tr CROSS JOIN ev)
    SELECT CAST(train_id AS BIGINT) AS train_id,
           CAST(eval_id AS BIGINT) AS eval_id,
           CAST(n_common AS BIGINT) AS n_common,
           round(n_common / CAST(n_eval AS DOUBLE), 4) AS eval_overlap
    FROM pairs WHERE n_common >= 3
    """,
    group="text",
)
def doc_decontaminate(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return D.cross_contamination_pairs(
        docs.where(F.col("doc_id") % 50 != 0),
        docs.where(F.col("doc_id") % 50 == 0),
    )


# ---------------------------------------------------------------- similarity

_DVEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


@register(
    "ann_brute_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, {_DVEC} AS qv FROM embeddings
               WHERE vec_id < 20),
    c AS (SELECT vec_id AS neighbor_id, {_DVEC} AS cv FROM embeddings),
    s AS (SELECT query_id, neighbor_id,
                 list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                   AS cosv
          FROM c, q WHERE neighbor_id <> query_id),
    r AS (SELECT query_id, neighbor_id, cosv,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosv DESC, neighbor_id) AS rank
          FROM s)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           round(cosv, 4) AS cos, rank
    FROM r WHERE rank <= 5
    """,
    group="similarity",
)
def ann_brute_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return S.brute_force_topk(emb, queries, k=5)


def _planes(dim: int = 64):
    return S.plane_components(S.LSH_PLANES, dim)


def _bucket_expr(vec_expr: str = _DVEC) -> str:
    parts = []
    for row in _planes():
        arr = "[" + ", ".join(f"{x!r}::DOUBLE" for x in row) + "]"
        parts.append(
            f"CASE WHEN list_dot_product({vec_expr}, {arr}) >= 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(parts)


def _lsh_bucket_sql() -> str:
    return (
        f"SELECT CAST(vec_id AS BIGINT) AS vec_id, {_bucket_expr()} AS bucket "
        "FROM embeddings"
    )


@register("ann_lsh_buckets", oracle=_lsh_bucket_sql(), group="similarity")
def ann_lsh_buckets(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    return S.with_lsh_bucket(emb, _planes()).select(
        F.col("vec_id").cast("long").alias("vec_id"), "bucket"
    )


@register(
    "ann_lsh_bucket_stats",
    oracle=f"WITH b AS ({_lsh_bucket_sql()}) "
    "SELECT bucket, count(*) AS n_vectors FROM b GROUP BY bucket",
    group="similarity",
)
def ann_lsh_bucket_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    return (
        S.with_lsh_bucket(emb, _planes())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


# Near-dup seeding: the raw embeddings have no near-duplicates (max pairwise
# cosine ≈ 0.51), which made the near-pair proofs vacuous (0 rows = 0 rows).
# Both sides therefore union in scaled-by-2 copies of the first N_SEED
# vectors under shifted ids — "same item ingested twice". x*2 is exact in
# float on both engines, the scaled copy lands in the SAME hyperplane bucket
# by construction (signs are scale-invariant), and cos(v, 2v) == 1.0 exactly
# in IEEE double, so Spark and DuckDB agree bit-for-bit.
N_SEED = 8
SEED_OFFSET = 10_000_000

_AUG_EMB = f"""aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {SEED_OFFSET},
             CAST(list_transform(embedding, x -> x * 2) AS FLOAT[]) AS embedding
      FROM embeddings WHERE vec_id < {N_SEED})"""


def _aug_embeddings(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.where(F.col("vec_id") < N_SEED).select(
        (F.col("vec_id") + SEED_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(2.0)).cast("float")).alias(
            "embedding"
        ),
    )
    return emb.unionByName(dup)


@register(
    "ann_near_pairs",
    oracle=f"""
    WITH {_AUG_EMB},
    b AS (SELECT vec_id, {_DVEC} AS v, {_bucket_expr()} AS bucket
               FROM aug),
    p AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                 list_dot_product(a.v, b2.v)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v)))
                   AS cosv
          FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(cosv, 4) AS cos
    FROM p WHERE cosv >= 0.9
    """,
    group="similarity",
)
def ann_near_pairs(spark, sf_dir):
    emb = _aug_embeddings(spark, sf_dir)
    return S.lsh_near_pairs(emb, _planes(), threshold=0.9)


# ---------------------------------------------------------------- multimodal

@register(
    "mm_payload_stats",
    oracle="""
    SELECT source, count(*) AS n_payloads,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           count(DISTINCT md5(text)) AS distinct_payloads,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents GROUP BY source
    """,
    group="multimodal",
)
def mm_payload_stats(spark, sf_dir):
    from duckdb_delta_spark.operators import multimodal as M

    return M.payload_stats(load(spark, sf_dir, "documents"))


_IVF = f"""
    cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) AS list_id, {_DVEC} AS centroid
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {S.IVF_LISTS})),
    assigned AS (
      SELECT vec_id, cv, list_id FROM (
        SELECT e.vec_id, e.cv, c.list_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.cv, c.centroid)
                        / (sqrt(list_dot_product(e.cv, e.cv))
                           * sqrt(list_dot_product(c.centroid, c.centroid))) DESC,
                        c.list_id) AS rn
        FROM (SELECT vec_id, {_DVEC} AS cv FROM embeddings) e, cents c) t
      WHERE rn = 1),
    qlists AS (
      SELECT query_id, qv, list_id FROM (
        SELECT q.query_id, q.qv, c.list_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_dot_product(q.qv, c.centroid)
                        / (sqrt(list_dot_product(q.qv, q.qv))
                           * sqrt(list_dot_product(c.centroid, c.centroid))) DESC,
                        c.list_id) AS rn
        FROM (SELECT vec_id AS query_id, {_DVEC} AS qv FROM embeddings
              WHERE vec_id < 20) q, cents c) t
      WHERE rn <= {S.IVF_NPROBE})
"""


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH {_IVF},
    scored AS (
      SELECT ql.query_id, a.vec_id AS neighbor_id,
             list_dot_product(ql.qv, a.cv)
               / (sqrt(list_dot_product(ql.qv, ql.qv))
                  * sqrt(list_dot_product(a.cv, a.cv))) AS cosv
      FROM qlists ql JOIN assigned a ON ql.list_id = a.list_id
      WHERE a.vec_id <> ql.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cosv,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosv DESC, neighbor_id) AS rank
      FROM scored)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           round(cosv, 4) AS cos, rank
    FROM ranked WHERE rank <= 5
    """,
    group="similarity",
)
def ann_ivf_topk(spark, sf_dir):
    """IVF approximate nearest neighbors — the scale path: each query probes
    nprobe of num_lists inverted lists instead of the full corpus."""
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return S.ivf_topk(emb, queries, k=5)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH {_AUG_EMB},
    docs AS (SELECT doc_id, lang FROM documents
             UNION ALL
             SELECT doc_id + {SEED_OFFSET}, lang FROM documents
             WHERE doc_id < {N_SEED}),
    b AS (SELECT vec_id, {_DVEC} AS v, {_bucket_expr()} AS bucket
               FROM aug),
    p AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                 list_dot_product(a.v, b2.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b2.v, b2.v))) AS cosv
          FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(cosv, 4) AS cos, da.lang AS lang_a, db.lang AS lang_b
    FROM p JOIN docs da ON da.doc_id = id_a
           JOIN docs db ON db.doc_id = id_b
    WHERE round(cosv, 4) >= 0.95
    """,
    group="dedup",
)
def dedup_embedding_cosine(spark, sf_dir):
    """Semantic near-dup: LSH-bucketed embedding cosine ≥ 0.95, annotated
    from the documents table (doc_id aligns with vec_id in the testdata;
    seeded re-ingested copies — see _AUG_EMB — keep the proof non-vacuous)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    docs = docs.unionByName(
        docs.where(F.col("doc_id") < N_SEED).select(
            (F.col("doc_id") + SEED_OFFSET).alias("doc_id"), "lang"
        )
    )
    emb = _aug_embeddings(spark, sf_dir)
    return D.embedding_cosine_pairs(docs, emb, _planes(), threshold=0.95)


@register(
    "text_bpe_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{X.BPE_PATTERN}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens,
           round(len(regexp_extract_all(text, '{X.BPE_PATTERN}'))
                 / CAST(greatest(len({_TOKS}), 1) AS DOUBLE), 4) AS bpe_per_word
    FROM documents
    """,
    group="text",
)
def text_bpe_tokens(spark, sf_dir):
    """BPE-ish pre-tokenization counts — first-order LLM token cost."""
    return X.with_bpe_tokens(load(spark, sf_dir, "documents")).select(
        "doc_id", "n_bpe_tokens", "n_ws_tokens", "bpe_per_word"
    )


@register(
    "mm_frame_sample",
    # frame k of payload p (len L, F=64 frame bytes, N=4 frames):
    # bytes [k*(max(L-F,0))//(N-1), +F) — evenly spaced windows; value-exact
    # byte compare against DuckDB blob slicing. Emitted as hex so the
    # harness canonicalizer (pandas sort) never touches raw binary.
    oracle="""
    WITH p AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS L FROM documents),
    k AS (SELECT unnest(generate_series(0, 3)) AS frame_index)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(frame_index AS INTEGER) AS frame_index,
           substr(hx, (frame_index * greatest(L - 64, 0) // 3) * 2 + 1,
                  128) AS frame_hex
    FROM p, k
    """,
    group="multimodal",
)
def mm_frame_sample(spark, sf_dir):
    """Video-style frame sampling plumbing: 1 payload → N frame rows via
    mapInPandas (the fan-out batch shape of a real ffmpeg sampler)."""
    from duckdb_delta_spark.operators import multimodal as M

    docs = load(spark, sf_dir, "documents")
    frames = M.sample_frames(M.with_payload(docs), n_frames=4, frame_bytes=64)
    return frames.select(
        "doc_id", "frame_index", F.hex(F.col("frame")).alias("frame_hex")
    )


_RESIZE_N = 64  # 8×8 output "image"


@register(
    "mm_image_resize",
    # fake resize = box pooling: byte i of an L-byte payload → bucket
    # i*N//L; output byte j = floored mean of bucket j (0 if empty).
    # Integer-exact, so the oracle rebuilds the identical blob from the
    # hex of the payload — value-exact proof of the resize plumbing.
    oracle=f"""
    WITH p AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS L FROM documents),
    bytes AS (SELECT doc_id, L, unnest(range(0, L)) AS i FROM p),
    vals AS (
      SELECT b.doc_id, (b.i * {_RESIZE_N}) // b.L AS j,
             (strpos('0123456789ABCDEF',
                     substr(p.hx, CAST(b.i*2+1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF',
                      substr(p.hx, CAST(b.i*2+2 AS INT), 1)) - 1 AS v
      FROM bytes b JOIN p USING (doc_id)),
    pooled AS (
      SELECT doc_id, j, CAST(sum(v) // count(*) AS INT) AS pv
      FROM vals GROUP BY doc_id, j),
    k AS (SELECT unnest(range(0, {_RESIZE_N})) AS j),
    filled AS (
      SELECT p.doc_id, k.j, coalesce(pl.pv, 0) AS pv
      FROM p CROSS JOIN k
      LEFT JOIN pooled pl ON pl.doc_id = p.doc_id AND pl.j = k.j)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           string_agg(printf('%02X', pv), '' ORDER BY j) AS resized_hex
    FROM filled GROUP BY doc_id
    """,
    group="multimodal",
)
def mm_image_resize(spark, sf_dir):
    """Image-resize plumbing: payload → fixed 8×8 byte grid via the
    Arrow-batched mapInPandas box-pool stub (a real PIL/opencv resize
    swaps in at the documented strict-mode seam with the same schema,
    batch shape, and bounded output size)."""
    from duckdb_delta_spark.operators import multimodal as M

    docs = load(spark, sf_dir, "documents")
    out = M.resize_images(M.with_payload(docs), width=8, height=8)
    return out.select(
        "doc_id", "width", "height",
        F.hex(F.col("resized")).alias("resized_hex"),
    )


def _components_sql() -> str:
    sig = _minhash_sig_sql()
    n_bands = D.MINHASH_HASHES // D.MINHASH_BAND_SIZE
    unions = "\nUNION\n".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sigs a JOIN sigs b "
        f"ON a.band_{b} = b.band_{b} AND a.doc_id < b.doc_id"
        for b in range(n_bands)
    )
    # transitive closure by recursive CTE, then min reachable id per node —
    # tractable because the candidate graph is the SAME bounded pair set
    # the Spark side clusters (the 0-hop + k-hop closure of dup groups)
    return f"""
    WITH RECURSIVE sigs AS ({sig}),
    pairs AS ({unions}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (
      SELECT id AS id, id AS r FROM nodes
      UNION
      SELECT e.a AS id, reach.r FROM reach JOIN edges e ON e.b = reach.id)
    SELECT CAST(id AS BIGINT) AS id, CAST(min(r) AS BIGINT) AS cluster_id
    FROM reach GROUP BY id
    """


@register("dedup_cluster", oracle=_components_sql(), group="dedup")
def dedup_cluster(spark, sf_dir):
    """Duplicate GROUPS, not just pairs: connected components over the
    MinHash/LSH candidate graph (min-label propagation — the large-star
    family's simple variant). cluster_id = smallest doc_id reachable, the
    canonical "keep this one" choice."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_candidate_pairs(docs)
    return D.connected_components(pairs)


# ------------------------------------------------------- chunking / packing

# chunk geometry shared by Spark and oracle
CHUNK_TOKENS, CHUNK_OVERLAP = 64, 8
_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP
_RAW_TOKS = r"list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"


@register(
    "doc_chunk_windows",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_RAW_TOKS} AS toks FROM documents),
    c AS (
      SELECT doc_id, toks, len(toks) AS n,
             greatest(1, CAST(ceil((len(toks) - {CHUNK_OVERLAP})
                                   / {_STRIDE}.0) AS INT)) AS nc
      FROM t WHERE len(toks) > 0),
    e AS (
      SELECT doc_id, toks,
             CAST(unnest(range(0, nc)) AS INT) AS chunk_idx
      FROM c)
    SELECT doc_id, chunk_idx,
           CAST(len(toks[chunk_idx*{_STRIDE}+1 : chunk_idx*{_STRIDE}+{CHUNK_TOKENS}]) AS BIGINT)
             AS chunk_tokens,
           md5(array_to_string(
               toks[chunk_idx*{_STRIDE}+1 : chunk_idx*{_STRIDE}+{CHUNK_TOKENS}], ' '))
             AS chunk_hash
    FROM e
    """,
    group="chunking",
)
def doc_chunk_windows(spark, sf_dir):
    """Fixed-budget overlapping chunk windows: md5 chunk hashes prove the
    chunk CONTENT (not just counts) matches the oracle exactly."""
    from duckdb_delta_spark.operators import chunking as C

    docs = load(spark, sf_dir, "documents")
    return C.chunk_documents(
        docs, chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP
    )


PACK_BUDGET, PACK_SHARDS = 2048, 16


@register(
    "doc_pack_bins",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS STRING)),1,8))::BIGINT
               % {PACK_SHARDS} AS shard,
             CAST(len({_RAW_TOKS}) AS BIGINT) AS n_tokens
      FROM documents),
    b AS (
      SELECT shard, n_tokens,
             CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS bin
      FROM t)
    SELECT shard, bin, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM b GROUP BY shard, bin
    """,
    group="chunking",
)
def doc_pack_bins(spark, sf_dir):
    """Greedy sequence packing into fixed token budgets: one shuffle on a
    bounded shard key, per-shard running-sum window — first-fit packing
    that survives any corpus size."""
    from duckdb_delta_spark.operators import chunking as C

    docs = load(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(C.ws_tokens(F.col("text"))).cast("long")
    )
    return C.pack_greedy(
        docs, budget=PACK_BUDGET, shards=PACK_SHARDS
    )


MIX_RATES = {"en": 35, "de": 80, "es": 80, "fr": 80, "zh": 50}
MIX_SALT = "mix1"


@register(
    "doc_sample_stratified",
    oracle=f"""
    SELECT lang, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS STRING) || ':{MIX_SALT}'),1,8))::BIGINT
            % 100
          < CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in sorted(MIX_RATES.items()))} ELSE 0 END
    GROUP BY lang
    """,
    group="chunking",
)
def doc_sample_stratified(spark, sf_dir):
    """Deterministic dataset-mixing sample: per-language keep rates via
    md5 bucketing — reproducible across engines/runs, zero shuffle."""
    from duckdb_delta_spark.operators import chunking as C

    docs = load(spark, sf_dir, "documents")
    kept = C.stratified_sample(docs, MIX_RATES, salt=MIX_SALT)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )


# deterministic epoch shuffle: the training-loader permutation as data —
# (shard, pos) per doc for one epoch, reproduced independently in SQL
@register(
    "doc_epoch_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             md5('7:' || CAST(doc_id AS STRING)) AS k
      FROM documents),
    sharded AS (
      SELECT doc_id, k,
             ('0x' || substr(k, 1, 4))::BIGINT % 64 AS shard
      FROM keyed)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS BIGINT) AS pos
    FROM sharded
    """,
    group="text",
)
def doc_epoch_shuffle(spark, sf_dir):
    from duckdb_delta_spark.operators.chunking import epoch_shuffle

    docs = load(spark, sf_dir, "documents")
    return epoch_shuffle(docs, epoch=7).select("doc_id", "shard", "pos")


# PII redaction: deterministic synthetic PII is appended to every third
# doc (both engines construct the identical string), then the scrub's
# counts and the md5 of the redacted text must agree exactly
_PII_TEXT = (
    "text || CASE WHEN doc_id % 3 = 0 THEN ' reach me at user' || "
    "CAST(doc_id AS STRING) || '@mail.org or 10.0.0.' || "
    "CAST(doc_id % 256 AS STRING) || ' call +1 (415) 555-01' || "
    "CAST(doc_id % 10 AS STRING) || '2 now' ELSE '' END"
)


def _redact_oracle() -> str:
    e, i, p = (X.PII_PATTERNS["email"], X.PII_PATTERNS["ipv4"],
               X.PII_PATTERNS["phone"])
    # counts ride the SAME intermediate each pattern replaces in
    # (replacement order email -> ipv4 -> phone, sorted like the engine),
    # so n_<type> == placeholders present in `redacted`
    return f"""
    WITH t AS (SELECT doc_id, {_PII_TEXT} AS x FROM documents),
    s1 AS (SELECT doc_id,
                  len(regexp_extract_all(x, '{e}')) AS n_email,
                  regexp_replace(x, '{e}', '<EMAIL>', 'g') AS x1
           FROM t),
    s2 AS (SELECT doc_id, n_email,
                  len(regexp_extract_all(x1, '{i}')) AS n_ipv4,
                  regexp_replace(x1, '{i}', '<IPV4>', 'g') AS x2
           FROM s1),
    red AS (SELECT doc_id, n_email, n_ipv4,
                   len(regexp_extract_all(x2, '{p}')) AS n_phone,
                   regexp_replace(x2, '{p}', '<PHONE>', 'g') AS redacted
            FROM s2)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_email AS BIGINT) AS n_email,
           CAST(n_ipv4 AS BIGINT) AS n_ipv4,
           CAST(n_phone AS BIGINT) AS n_phone,
           CAST(n_email + n_ipv4 + n_phone AS BIGINT) AS n_pii,
           md5(redacted) AS redacted_md5
    FROM red
    """


@register("text_redact_pii", oracle=_redact_oracle(), group="text")
def text_redact_pii(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_TEXT).alias("text")
    )
    out = X.with_redaction(docs)
    return out.select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "n_pii",
        F.md5("redacted").alias("redacted_md5"),
    )


# Gopher-style in-document repetition signals: duplicate-line fraction and
# top-bigram coverage. The Spark side computes max-bigram-frequency as the
# longest equal-run of the SORTED per-row bigram array (O(L log L), zero
# shuffle); the oracle counts it relationally (unnest + GROUP BY) — two
# independent algorithms agreeing on the answer.
_REP_LINES = (
    "list_filter(list_transform(string_split(text, chr(10)), "
    "l -> trim(l)), l -> l <> '')"
)


@register(
    "text_repetition",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_REP_LINES} AS lines, {_TOKS} AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, lines,
             CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i + 1])
             END AS grams
      FROM t
    ), top AS (
      SELECT doc_id, max(cnt) AS top_cnt FROM (
        SELECT doc_id, g2, count(*) AS cnt
        FROM (SELECT doc_id, unnest(grams) AS g2 FROM g)
        GROUP BY doc_id, g2)
      GROUP BY doc_id
    )
    SELECT g.doc_id,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(lines) - len(list_distinct(lines)) AS BIGINT) AS n_dup_lines,
           round((len(lines) - len(list_distinct(lines)))
                 / CAST(greatest(len(lines), 1) AS DOUBLE), 4) AS dup_line_frac,
           round(CASE WHEN len(grams) = 0 THEN 0.0
                      ELSE coalesce(top_cnt, 0) / CAST(len(grams) AS DOUBLE)
                 END, 4) AS top_bigram_frac
    FROM g LEFT JOIN top ON g.doc_id = top.doc_id
    """,
    group="text",
)
def text_repetition(spark, sf_dir):
    df = load(spark, sf_dir, "documents")
    return X.with_repetition(df).select(
        "doc_id", "n_lines", "n_dup_lines", "dup_line_frac", "top_bigram_frac"
    )


def _keep_canonical_sql() -> str:
    comp = _components_sql()
    qual = _quality_oracle()
    return f"""
    WITH comp AS ({comp}),
    q AS ({qual}),
    j AS (
      SELECT comp.cluster_id, comp.id, q.quality_score
      FROM comp JOIN q ON q.doc_id = comp.id)
    SELECT cluster_id, keep_id, n_members, best_quality FROM (
      SELECT cluster_id, id AS keep_id,
             count(*) OVER (PARTITION BY cluster_id) AS n_members,
             round(max(quality_score) OVER (PARTITION BY cluster_id), 4)
               AS best_quality,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY quality_score DESC, id ASC) AS rn
      FROM j) WHERE rn = 1
    """


@register("dedup_keep_canonical", oracle=_keep_canonical_sql(), group="dedup")
def dedup_keep_canonical(spark, sf_dir):
    """Canonical-document selection: near-dup clusters (MinHash/LSH →
    connected components) reduced to one kept representative each by
    quality argmax — single hash-agg, no per-cluster window. The oracle
    recomputes the same clusters recursively and picks via row_number."""
    docs = load(spark, sf_dir, "documents")
    clusters = D.connected_components(D.minhash_candidate_pairs(docs))
    return D.keep_canonical(X.with_quality(docs), clusters)


# CCNet-style boilerplate-line removal: the query frames every document
# with a shared header/footer (the realistic "cookie banner" shape), the
# operator strikes lines appearing in >= 2 docs, and the md5 of the
# rebuilt text proves position-exact line survival.
@register(
    "text_boilerplate",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             'COOKIE NOTICE' || chr(10) || text || chr(10) || 'ALL RIGHTS RESERVED'
               AS text
      FROM documents),
    lines AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)),
                                        l -> trim(l)), l -> l <> '') AS ls
      FROM d),
    flat AS (
      SELECT doc_id, u.pos AS pos, u.line AS line FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ls) + 1),
                      i -> struct_pack(pos := i, line := ls[i]))) AS u
        FROM lines)),
    freq AS (
      SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS nd FROM flat GROUP BY line)
      WHERE nd >= 2),
    kept AS (
      SELECT f.doc_id, f.pos, f.line
      FROM flat f LEFT JOIN freq ON f.line = freq.line
      WHERE freq.line IS NULL),
    agg AS (
      SELECT doc_id, count(*) AS n_kept,
             md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY doc_id)
    SELECT l.doc_id,
           CAST(len(l.ls) AS BIGINT) AS n_lines,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(l.ls) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(a.clean_md5, md5('')) AS clean_md5
    FROM lines l LEFT JOIN agg a ON l.doc_id = a.doc_id
    """,
    group="text",
)
def text_boilerplate(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("COOKIE NOTICE\n"), F.col("text"),
            F.lit("\nALL RIGHTS RESERVED"),
        ).alias("text"),
    )
    return X.remove_boilerplate_lines(docs)


# per-doc URL census (domain blocklist / per-domain cap input): URLs are
# injected deterministically (the corpus has none), extracted by the same
# conservative regex in both engines
_URL_TEXT = (
    "text || CASE WHEN doc_id % 2 = 0 THEN ' see https://ex' || "
    "CAST(doc_id % 5 AS STRING) || '.org/p/' || CAST(doc_id AS STRING) || "
    "' and https://cdn.ex' || CAST(doc_id % 5 AS STRING) || '.org/a.js' "
    "ELSE '' END"
)


@register(
    "text_url_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_URL_TEXT.replace("AS STRING", "AS VARCHAR")} AS x
               FROM documents),
    u AS (SELECT doc_id,
                 regexp_extract_all(x, '{X.URL_PATTERN}') AS urls
          FROM t),
    d AS (SELECT doc_id, urls,
                 list_sort(list_distinct(list_transform(urls,
                     u2 -> regexp_extract(u2, '{X.DOMAIN_PATTERN}', 1)))) AS doms
          FROM u)
    SELECT doc_id,
           CAST(len(urls) AS BIGINT) AS n_urls,
           CAST(len(doms) AS BIGINT) AS n_domains,
           coalesce(array_to_string(doms, ','), '') AS domains_csv
    FROM d
    """,
    group="text",
)
def text_url_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_TEXT).alias("text"))
    return X.with_url_stats(docs).select(
        "doc_id", "n_urls", "n_domains", "domains_csv")


@register(
    "emb_quantize_int8",
    oracle="""
    SELECT vec_id, round(scale, 9) AS scale,
           CAST(list_sum(list_transform(q, c -> abs(c))) AS BIGINT) AS q_l1,
           round(list_max(err), 8) AS max_abs_err,
           round(list_sum(list_transform(err, e -> e * e)) / len(q), 10)
               AS mse
    FROM (
        SELECT vec_id, scale,
               list_transform(list_zip(v, q),
                              p -> abs(p[1] - p[2] * scale)) AS err,
               q
        FROM (
            SELECT vec_id, scale, v,
                   list_transform(v, x -> round(x / scale)) AS q
            FROM (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                       list_max(list_transform(embedding,
                                x -> abs(CAST(x AS DOUBLE)))) / 127.0
                           AS scale
                FROM embeddings
            )
        )
    )
    """,
    group="similarity",
)
def emb_quantize_int8(spark, sf_dir):
    """Per-vector symmetric int8 quantization quality stats — pure JVM
    higher-order functions, zero shuffle."""
    from duckdb_delta_spark.operators.similarity import quantize_int8

    return quantize_int8(load(spark, sf_dir, "embeddings"))


@register(
    "dedup_span_stats",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    wins AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(t) - 19, 0)),
                   i -> md5(array_to_string(t[i:i+19], ' ')))) AS h
        FROM toks
    ),
    per_doc AS (
        SELECT doc_id, h, CAST(count(*) AS BIGINT) AS n_in_doc
        FROM wins GROUP BY doc_id, h
    ),
    span_docs AS (
        SELECT h, CAST(count(*) AS BIGINT) AS n_docs FROM per_doc GROUP BY h
    ),
    stats AS (
        SELECT doc_id,
               CAST(sum(n_in_doc) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN n_docs >= 2 THEN n_in_doc ELSE 0 END)
                    AS BIGINT) AS n_dup_spans
        FROM per_doc JOIN span_docs USING (h) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_spans, 0) AS n_spans,
           coalesce(s.n_dup_spans, 0) AS n_dup_spans,
           coalesce(round(s.n_dup_spans / CAST(s.n_spans AS DOUBLE), 4),
                    0.0) AS dup_fraction
    FROM documents d LEFT JOIN stats s USING (doc_id)
    """,
    group="dedup",
)
def dedup_span_stats(spark, sf_dir):
    """Exact-substring dedup candidate stage: per-doc duplicated
    20-token-span stats (Lee et al. 2022 style)."""
    return D.duplicate_span_stats(load(spark, sf_dir, "documents"))


@register(
    "doc_split_assign",
    oracle="""
    SELECT split, CAST(count(*) AS BIGINT) AS n,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id
    FROM (
        SELECT doc_id,
               CASE WHEN b < 2 THEN 'test'
                    WHEN b < 98 THEN 'train'
                    ELSE 'val' END AS split
        FROM (SELECT doc_id,
                     ('0x' || substr(md5(CAST(doc_id AS STRING)
                          || ':split1'), 1, 8))::BIGINT % 100 AS b
              FROM documents)
    ) GROUP BY split
    """,
    group="chunking",
)
def doc_split_assign(spark, sf_dir):
    """Deterministic train/val/test split: md5-band assignment, stable
    across runs/engines (the holdout survives pipeline re-runs)."""
    from duckdb_delta_spark.operators.chunking import split_assign

    return split_assign(load(spark, sf_dir, "documents")).groupBy(
        "split"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "doc_cap_per_source",
    oracle="""
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap1'),
                            doc_id) AS r
        FROM documents
    ) WHERE r <= 50
    GROUP BY source
    """,
    group="chunking",
)
def doc_cap_per_source(spark, sf_dir):
    """Per-source document cap (max 50 per source, deterministic md5
    selection) — two-stage top-k, no whole-group-in-one-task funnel."""
    from duckdb_delta_spark.operators.chunking import cap_per_group

    return cap_per_group(
        load(spark, sf_dir, "documents"), 50, group_col="source"
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_ids"),
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, c FROM (
            SELECT doc_id, unnest(string_split_regex(text, '')) AS c
            FROM documents
        ) WHERE c <> ''
    ),
    counts AS (
        SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n
        FROM chars GROUP BY doc_id, c
    ),
    tots AS (
        SELECT doc_id, CAST(sum(n) AS BIGINT) AS tot
        FROM counts GROUP BY doc_id
    ),
    ent AS (
        SELECT c.doc_id, t.tot AS n_chars_nz,
               round(-sum((n / CAST(t.tot AS DOUBLE))
                          * log2(n / CAST(t.tot AS DOUBLE))), 4)
                   AS char_entropy
        FROM counts c JOIN tots t USING (doc_id) GROUP BY c.doc_id, t.tot
    )
    SELECT d.doc_id, coalesce(e.n_chars_nz, 0) AS n_chars_nz,
           coalesce(e.char_entropy, 0.0) AS char_entropy
    FROM documents d LEFT JOIN ent e USING (doc_id)
    """,
    group="text",
)
def text_char_entropy(spark, sf_dir):
    """Character-unigram entropy quality signal (perplexity proxy)."""
    return X.with_char_entropy(load(spark, sf_dir, "documents"))


# ------------------------------------------------------------------ r9:
# main-content extraction from HTML. The corpus has no markup, so the
# query wraps every document in a deterministic page skeleton (script +
# style blocks, attributes, entities) and both engines extract the text
# back out with the same regex/replace chain.
_HTML_PRE = (
    '<html><head><script>var hidden = "<p>not visible</p>";</script>'
    "<style>p { color: red; }</style></head>"
    '<body class="main"><h1>Doc '
)
_HTML_MID = "</h1><p>"
_HTML_POST = (
    " &amp; more &lt;math&gt; 5 &gt; 3 &quot;q&quot; &#39;s&#39;&nbsp;end"
    "</p><br/></body></html>"
)


def _html_oracle() -> str:
    # chained entity decode, &amp; last (mirrors X.HTML_ENTITIES order)
    decoded = "t1"
    for ent, ch in X.HTML_ENTITIES:
        decoded = f"replace({decoded}, '{ent}', {repr(ch)[0] + ch + repr(ch)[0]})" \
            if ch != "'" else f"replace({decoded}, '{ent}', chr(39))"
    return f"""
    WITH h AS (
      SELECT doc_id,
             '{_HTML_PRE}' || CAST(doc_id AS VARCHAR) || '{_HTML_MID}' || text
               || '{_HTML_POST.replace("'", "''")}' AS html
      FROM documents),
    nb AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(html,
               '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS nb
      FROM h),
    c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(nb, '<[^>]*>')) AS BIGINT) AS n_tags,
             regexp_replace(nb, '<[^>]*>', ' ', 'g') AS t1
      FROM nb),
    d AS (
      SELECT doc_id, n_tags,
             trim(regexp_replace({decoded}, '\\s+', ' ', 'g')) AS clean
      FROM c)
    SELECT doc_id, n_tags, md5(clean) AS clean_md5,
           CAST(length(clean) AS BIGINT) AS clean_len
    FROM d
    """


@register("text_html_strip", oracle=_html_oracle(), group="text")
def text_html_strip(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit(_HTML_PRE), F.col("doc_id").cast("string"),
            F.lit(_HTML_MID), F.col("text"), F.lit(_HTML_POST),
        ).alias("html"),
    )
    out = X.with_html_strip(docs)
    return out.select(
        "doc_id", "n_tags", F.md5("clean_text").alias("clean_md5"),
        "clean_len",
    )


# Unicode NFC canonicalization: the corpus is pure ASCII, so the query
# injects decomposed sequences (e + combining acute), pre-composed forms
# and a C0 control char deterministically; DuckDB's nfc_normalize is the
# independent oracle for the pandas-UDF NFC on the Spark side.
_NFC_DECOMPOSED = " café"   # e + U+0301 -> composes to é
_NFC_COMPOSED = " café"      # already NFC -> unchanged


def _normalize_oracle() -> str:
    return f"""
    WITH r AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 2 = 0 THEN '{_NFC_DECOMPOSED}'
                          ELSE '{_NFC_COMPOSED}' END
                  || CASE WHEN doc_id % 3 = 0 THEN chr(7) ELSE '' END AS raw
      FROM documents),
    s AS (
      SELECT doc_id, raw,
             nfc_normalize(regexp_replace(raw,
               '{X.CONTROL_CHARS_RE}', '', 'g')) AS norm
      FROM r)
    SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS n_chars_raw,
           CAST(length(norm) AS BIGINT) AS n_chars_norm,
           (norm <> raw) AS changed,
           md5(norm) AS norm_md5
    FROM s
    """


@register("text_normalize", oracle=_normalize_oracle(), group="text")
def text_normalize(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(_NFC_DECOMPOSED))
            .otherwise(F.lit(_NFC_COMPOSED)),
            F.when(F.col("doc_id") % 3 == 0, F.lit("\x07")).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = X.with_normalized_text(docs)
    return out.select(
        "doc_id", "n_chars_raw", "n_chars_norm", "changed",
        F.md5("norm_text").alias("norm_md5"),
    )


# C4-style quality filter: documents are framed with deterministic lines
# spanning every rule (clean sentence kept, unterminated line dropped,
# short line dropped, code-brace line kills the doc, question kept).
_C4_L1_PRE = "Doc "
_C4_L1_POST = " starts with a clean sentence."
_C4_SHORT = "Too short."
_C4_CODE = "function f() { return 1; }"
_C4_QUESTION = "Is this a kept question?"


def _c4_oracle() -> str:
    terms = ", ".join(f"'{t}'" if t != '"' else "chr(34)" for t in X.C4_TERMINALS)
    return f"""
    WITH r AS (
      SELECT doc_id,
             '{_C4_L1_PRE}' || CAST(doc_id AS VARCHAR) || '{_C4_L1_POST}'
               || chr(10) || text || chr(10) || '{_C4_SHORT}'
               || CASE WHEN doc_id % 5 = 0
                       THEN chr(10) || '{_C4_CODE}' ELSE '' END
               || CASE WHEN doc_id % 3 = 0
                       THEN chr(10) || '{_C4_QUESTION}' ELSE '' END AS text
      FROM documents),
    l AS (
      SELECT doc_id, text,
             list_filter(list_transform(string_split(text, chr(10)),
                                        x -> trim(x)), x -> x <> '') AS lines
      FROM r),
    k AS (
      SELECT doc_id, text, lines,
             list_filter(lines, x ->
               list_contains([{terms}], substr(x, length(x), 1))
               AND len(string_split_regex(x, '\\s+'))
                   >= {X.C4_MIN_LINE_WORDS}) AS kept_lines
      FROM l)
    SELECT doc_id,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept_lines) AS BIGINT) AS n_kept_lines,
           (text LIKE '%{{%' OR text LIKE '%}}%') AS has_brace,
           (NOT (text LIKE '%{{%' OR text LIKE '%}}%')
            AND len(kept_lines) >= {X.C4_MIN_KEPT_LINES}) AS kept,
           md5(array_to_string(kept_lines, chr(10))) AS clean_md5
    FROM k
    """


@register("doc_quality_c4", oracle=_c4_oracle(), group="doc")
def doc_quality_c4(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit(_C4_L1_PRE), F.col("doc_id").cast("string"),
            F.lit(_C4_L1_POST + "\n"), F.col("text"),
            F.lit("\n" + _C4_SHORT),
            F.when(F.col("doc_id") % 5 == 0, F.lit("\n" + _C4_CODE))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("\n" + _C4_QUESTION))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return X.c4_quality_filter(docs).select(
        "doc_id", "n_lines", "n_kept_lines", "has_brace", "kept", "clean_md5"
    )


# Incremental ingest dedup: docs with doc_id % 4 == 0 play the "incoming
# shard", the rest the already-ingested corpus. The operator's broadcast
# semi/anti plan never shuffles the corpus; the oracle is the plain
# NOT-IN formulation.
_FP = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


@register(
    "dedup_incremental",
    oracle=f"""
    WITH f AS (SELECT doc_id, {_FP} AS fingerprint FROM documents),
    batch AS (SELECT * FROM f WHERE doc_id % 4 = 0),
    corpus AS (SELECT * FROM f WHERE doc_id % 4 <> 0)
    SELECT doc_id, fingerprint FROM batch
    WHERE fingerprint NOT IN (SELECT fingerprint FROM corpus)
    """,
    group="dedup",
)
def dedup_incremental(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    return D.incremental_dedup(corpus, batch).select("doc_id", "fingerprint")


def _simhash_sql_bits(bits: int) -> str:
    """N-bit generalization of _simhash_sql (same md5-nibble vote rule)."""
    votes = ", ".join(
        "sum(CASE WHEN (CAST(strpos('0123456789abcdef', substr(h, %d, 1)) - 1 "
        "AS INTEGER) >> %d) %% 2 = 1 THEN 1 ELSE -1 END) AS v_%d"
        % (1 + j // 4, 3 - (j % 4), j)
        for j in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN v_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    return f"""
    WITH toked AS (
      SELECT doc_id, md5(unnest({_TOKS})) AS h FROM documents),
    agg AS (SELECT doc_id, {votes} FROM toked GROUP BY doc_id)
    SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM agg
    """


# near-dup neighbor counts: the oracle is the brute-force all-pairs
# Hamming join — deliberately independent of the Spark side's
# distinct-signature banding, so a banding bug (a missed candidate)
# surfaces as a value mismatch instead of being mirrored.
@register(
    "dedup_simhash_neighbors",
    oracle=f"""
    WITH sig AS ({_simhash_sql_bits(D.NEARDUP_BITS)})
    SELECT a.doc_id,
           CAST(sum(CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_near_dups
    FROM sig a LEFT JOIN sig b
      ON a.doc_id <> b.doc_id
     AND bit_count(xor(a.simhash, b.simhash)) <= {D.NEARDUP_MAX_HAMMING}
    GROUP BY a.doc_id
    """,
    group="dedup",
)
def dedup_simhash_neighbors(spark, sf_dir):
    return D.simhash_near_dup_counts(load(spark, sf_dir, "documents"))


# temperature-scaled mixing: rates derived from per-source mass with
# integer-exact arithmetic (isqrt + integer division + ppm draw), so the
# oracle reproduces the whole derivation, not just the draw
_TEMP_BUDGET = 20_000


@register(
    "doc_mix_temperature",
    oracle=f"""
    WITH per AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS tok_s
      FROM documents GROUP BY source),
    s AS (SELECT source, tok_s,
                 CAST(floor(sqrt(CAST(tok_s AS DOUBLE))) AS BIGINT) AS s_s
          FROM per),
    t AS (SELECT sum(s_s) AS tot_s FROM s),
    r AS (SELECT source, tok_s,
                 least(1000000,
                       (({_TEMP_BUDGET} * s_s) // tot_s) * 1000000
                         // greatest(tok_s, 1)) AS rate_ppm
          FROM s, t),
    k AS (
      SELECT d.source, d.doc_id, d.n_chars
      FROM documents d JOIN r USING (source)
      WHERE ('0x' || substr(md5(CAST(doc_id AS STRING) || ':temp1'), 1, 8))::BIGINT
              % 1000000 < r.rate_ppm)
    SELECT r.source, r.tok_s, CAST(r.rate_ppm AS BIGINT) AS rate_ppm,
           CAST(count(k.doc_id) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(k.n_chars), 0) AS BIGINT) AS kept_chars
    FROM r LEFT JOIN k ON r.source = k.source
    GROUP BY r.source, r.tok_s, r.rate_ppm
    """,
    group="chunking",
)
def doc_mix_temperature(spark, sf_dir):
    from duckdb_delta_spark.operators import chunking as C

    docs = load(spark, sf_dir, "documents")
    kept = C.temperature_mix(docs, _TEMP_BUDGET)
    rates = C.temperature_rates(docs, _TEMP_BUDGET)
    agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )
    return (
        rates.join(agg, "source", "left")
        .select(
            "source", "tok_s", F.col("rate_ppm").cast("long").alias("rate_ppm"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).cast("long").alias("kept_chars"),
        )
    )


# Product quantization / ADC: codebooks seeded from the first PQ_K
# vectors (the IVF oracle's seeding rule); every squared-distance term is
# cast to DECIMAL(38,18) in BOTH engines, so distance sums are exact and
# order-free and the argmin/rank stages cannot diverge on float ties.
_PQ_SUB = 64 // S.PQ_M
_PQ_SSD = (
    "list_sum(list_transform(range(1, %d + 1), "
    "i -> CAST(round((a.sv[i] - b.cw[i]) * (a.sv[i] - b.cw[i]) * %d) "
    "AS BIGINT)))" % (_PQ_SUB, S.PQ_SCALE)
)


@register(
    "ann_pq_topk",
    oracle=f"""
    WITH cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, {_DVEC} AS v
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {S.PQ_K})),
    subs AS (SELECT unnest(range(0, {S.PQ_M})) AS s),
    cb AS (SELECT c, s, list_slice(v, s*{_PQ_SUB}+1, (s+1)*{_PQ_SUB}) AS cw
           FROM cents, subs),
    sv AS (SELECT vec_id, s, list_slice(v, s*{_PQ_SUB}+1, (s+1)*{_PQ_SUB}) AS sv
           FROM (SELECT vec_id, {_DVEC} AS v FROM embeddings), subs),
    dists AS (
      SELECT a.vec_id, a.s, b.c, {_PQ_SSD} AS d
      FROM sv a JOIN cb b ON a.s = b.s),
    enc AS (
      SELECT vec_id, s, c AS code FROM (
        SELECT vec_id, s, c,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
        FROM dists) WHERE rn = 1),
    qd AS (SELECT vec_id AS query_id, s, c, d FROM dists WHERE vec_id < 10),
    scored AS (
      SELECT e.vec_id AS neighbor_id, q.query_id, sum(q.d) AS adist
      FROM enc e JOIN qd q ON q.s = e.s AND q.c = e.code
      WHERE e.vec_id <> q.query_id
      GROUP BY e.vec_id, q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, adist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adist, neighbor_id) AS rank
      FROM scored)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           round(adist / CAST(1000000000000000 AS DOUBLE), 6) AS approx_dist,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
    group="similarity",
)
def ann_pq_topk(spark, sf_dir):
    """PQ/ADC approximate top-k: corpus as m-byte codes, queries as
    broadcast LUTs, exact-decimal distance arithmetic."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return S.pq_topk(emb, queries, k=5)


# PQ shortlist + exact re-rank: the production ANN pipeline (codes-only
# ADC scan -> k'=50 shortlist -> exact distances on the shortlist only).
# Same fixed-point arithmetic throughout -> oracle-exact.
_PQ_XSSD = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST(round((q.v[i] - c.v[i]) * (q.v[i] - c.v[i]) * %d) "
    "AS BIGINT)))" % S.PQ_SCALE
)


@register(
    "ann_pq_rerank",
    oracle=f"""
    WITH cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, {_DVEC} AS v
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {S.PQ_K})),
    subs AS (SELECT unnest(range(0, {S.PQ_M})) AS s),
    cb AS (SELECT c, s, list_slice(v, s*{_PQ_SUB}+1, (s+1)*{_PQ_SUB}) AS cw
           FROM cents, subs),
    sv AS (SELECT vec_id, s, list_slice(v, s*{_PQ_SUB}+1, (s+1)*{_PQ_SUB}) AS sv
           FROM (SELECT vec_id, {_DVEC} AS v FROM embeddings), subs),
    dists AS (
      SELECT a.vec_id, a.s, b.c, {_PQ_SSD} AS d
      FROM sv a JOIN cb b ON a.s = b.s),
    enc AS (
      SELECT vec_id, s, c AS code FROM (
        SELECT vec_id, s, c,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
        FROM dists) WHERE rn = 1),
    qd AS (SELECT vec_id AS query_id, s, c, d FROM dists WHERE vec_id < 10),
    scored AS (
      SELECT e.vec_id AS neighbor_id, q.query_id, sum(q.d) AS adist
      FROM enc e JOIN qd q ON q.s = e.s AND q.c = e.code
      WHERE e.vec_id <> q.query_id
      GROUP BY e.vec_id, q.query_id),
    shortlist AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adist, neighbor_id) AS rank
        FROM scored) WHERE rank <= 50),
    vecs AS (SELECT vec_id, {_DVEC} AS v FROM embeddings),
    rescored AS (
      SELECT sl.query_id, sl.neighbor_id, {_PQ_XSSD} AS dist_fx
      FROM shortlist sl
      JOIN vecs q ON q.vec_id = sl.query_id
      JOIN vecs c ON c.vec_id = sl.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, dist_fx,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dist_fx, neighbor_id) AS rank
      FROM rescored)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           round(dist_fx / CAST({10**15} AS DOUBLE), 6) AS dist,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
    group="similarity",
)
def ann_pq_rerank(spark, sf_dir):
    """Two-phase PQ ANN: ADC shortlist then exact re-rank."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return S.pq_topk_rerank(emb, queries, k=5, shortlist=50)


# corpus-level Zipf head: top-20 terms, rank, cumulative coverage
@register(
    "text_zipf_terms",
    oracle=f"""
    WITH terms AS (SELECT unnest({_TOKS}) AS term FROM documents),
    counts AS (SELECT term, count(*) AS n FROM terms GROUP BY term),
    tot AS (SELECT sum(n) AS tot FROM counts),
    head AS (
      SELECT term, n, rank FROM (
        SELECT term, n,
               row_number() OVER (ORDER BY n DESC, term) AS rank
        FROM counts) WHERE rank <= 20)
    SELECT term, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank,
           round(sum(n) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
                 / CAST(tot AS DOUBLE), 6) AS cum_frac
    FROM head, tot
    """,
    group="text",
)
def text_zipf_terms(spark, sf_dir):
    """Corpus term-frequency head (stopword derivation / vocab sizing)."""
    return X.zipf_top_terms(load(spark, sf_dir, "documents"))


# paragraph-level dedup: every doc is framed with a corpus-wide shared
# intro (always struck), its own body (struck when another doc shares the
# byte-identical text), and a per-doc unique tail (never struck)
_PARA_SEP = "chr(10) || chr(10)"


@register(
    "dedup_paragraphs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             'Shared intro paragraph.' || {_PARA_SEP} || text || {_PARA_SEP}
               || 'Unique tail ' || CAST(doc_id AS VARCHAR) AS text
      FROM documents),
    pl AS (
      SELECT doc_id,
             list_filter(list_transform(
               string_split_regex(text, '\\n\\s*\\n'), p -> trim(p)),
               p -> p <> '') AS ps
      FROM d),
    flat AS (
      SELECT doc_id, u.pos AS pos, u.para AS para FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ps) + 1),
                      i -> struct_pack(pos := i, para := ps[i]))) AS u
        FROM pl)),
    freq AS (
      SELECT md5(para) AS ph FROM flat
      GROUP BY md5(para) HAVING count(DISTINCT doc_id) >= 2),
    kept AS (
      SELECT f.doc_id, f.pos, f.para
      FROM flat f LEFT JOIN freq ON md5(f.para) = freq.ph
      WHERE freq.ph IS NULL),
    agg AS (
      SELECT doc_id, count(*) AS n_kept,
             md5(string_agg(para, chr(10) || chr(10) ORDER BY pos))
               AS clean_md5
      FROM kept GROUP BY doc_id)
    SELECT p.doc_id,
           CAST(len(p.ps) AS BIGINT) AS n_paras,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept_paras,
           CAST(len(p.ps) - coalesce(a.n_kept, 0) AS BIGINT) AS n_dup_paras,
           coalesce(a.clean_md5, md5('')) AS clean_md5
    FROM pl p LEFT JOIN agg a ON p.doc_id = a.doc_id
    """,
    group="dedup",
)
def dedup_paragraphs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("Shared intro paragraph.\n\n"), F.col("text"),
            F.lit("\n\nUnique tail "), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return X.with_paragraph_dedup(docs)


# domain-blocklist filter: same injected URLs as text_url_stats; docs
# whose doc_id % 5 lands on a blocked ex-domain are dropped
_BLOCKED_DOMAINS = ("ex1.org", "ex3.org", "cdn.ex1.org", "cdn.ex3.org")


@register(
    "doc_domain_filter",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_URL_TEXT.replace("AS STRING", "AS VARCHAR")} AS x
               FROM documents),
    d AS (SELECT doc_id,
                 list_distinct(list_transform(
                     regexp_extract_all(x, '{X.URL_PATTERN}'),
                     u2 -> regexp_extract(u2, '{X.DOMAIN_PATTERN}', 1))) AS doms
          FROM t)
    SELECT doc_id,
           len(list_intersect(doms,
               {list(_BLOCKED_DOMAINS)!r})) > 0 AS blocked
    FROM d
    """,
    group="doc",
)
def doc_domain_filter(spark, sf_dir):
    from duckdb_delta_spark.queries import local_df

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_TEXT).alias("text"))
    bl = local_df(
        spark, [(d,) for d in _BLOCKED_DOMAINS],
        "domain string")
    return X.filter_blocked_domains(docs, bl).select("doc_id", "blocked")


# export shard manifest: shard assignment + checksummable per-shard rows
@register(
    "doc_shard_manifest",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard1'),
                             1, 8))::BIGINT % 16 AS shard
      FROM documents)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           md5(string_agg(CAST(doc_id AS VARCHAR), ','
                          ORDER BY CAST(doc_id AS VARCHAR))) AS content_md5
    FROM s GROUP BY shard
    """,
    group="doc",
)
def doc_shard_manifest(spark, sf_dir):
    from duckdb_delta_spark.operators import chunking as C

    return C.shard_manifest(load(spark, sf_dir, "documents"))


# FineWeb-style composite keep/drop: lexical quality + in-document
# repetition + character entropy combined into one decision — the oracle
# recomposes all three signal pipelines (each independently oracled
# above) and must agree on every threshold comparison
_FW_MIN_QUALITY = 0.5
_FW_MAX_DUP_LINES = 0.2
_FW_ENTROPY_LO = 2.5
_FW_ENTROPY_HI = 6.0


def _fineweb_oracle() -> str:
    from duckdb_delta_spark.queries import all_queries

    q = all_queries()
    return f"""
    WITH q AS ({_quality_oracle()}),
    r AS ({q["text_repetition"].oracle}),
    e AS ({q["text_char_entropy"].oracle})
    SELECT q.doc_id, q.quality_score, r.dup_line_frac, e.char_entropy,
           (q.quality_score >= {_FW_MIN_QUALITY}
            AND r.dup_line_frac <= {_FW_MAX_DUP_LINES}
            AND e.char_entropy >= {_FW_ENTROPY_LO}
            AND e.char_entropy <= {_FW_ENTROPY_HI}) AS keep
    FROM q JOIN r USING (doc_id) JOIN e USING (doc_id)
    """


@register("doc_quality_fineweb", oracle=_fineweb_oracle(), group="doc")
def doc_quality_fineweb(spark, sf_dir):
    """Composite corpus filter (FineWeb recipe shape): three independent
    signal pipelines — lexical quality, Gopher repetition, char entropy —
    joined on doc_id into one keep decision. Each signal is zero-shuffle
    or one bounded agg; the composition is two doc_id-keyed joins."""
    docs = load(spark, sf_dir, "documents")
    q = X.with_quality(docs).select("doc_id", "quality_score")
    r = X.with_repetition(docs).select("doc_id", "dup_line_frac")
    e = X.with_char_entropy(docs).select("doc_id", "char_entropy")
    out = q.join(r, "doc_id").join(e, "doc_id")
    keep = (
        (F.col("quality_score") >= _FW_MIN_QUALITY)
        & (F.col("dup_line_frac") <= _FW_MAX_DUP_LINES)
        & (F.col("char_entropy") >= _FW_ENTROPY_LO)
        & (F.col("char_entropy") <= _FW_ENTROPY_HI)
    )
    return out.select(
        "doc_id", "quality_score", "dup_line_frac", "char_entropy",
        keep.alias("keep"),
    )


# Matryoshka-truncation diagnostic: what fraction of each vector's
# squared norm lives in the first 16/32/48 dims — the measurement that
# decides how far MRL-style embedding truncation can go corpus-wide.
# Exact decimal accumulation (same discipline as the PQ distances).
def _dim_energy_sql() -> str:
    def ssq(hi):
        return (f"list_sum(list_transform(range(1, {hi} + 1), "
                f"i -> CAST(round(v[i] * v[i] * {10**15}) AS BIGINT)))")
    return f"""
    WITH t AS (SELECT vec_id, {_DVEC} AS v FROM embeddings),
    e AS (SELECT vec_id, {ssq(16)} AS e16, {ssq(32)} AS e32,
                 {ssq(48)} AS e48, {ssq(64)} AS e64 FROM t)
    SELECT vec_id,
           round(e16 / CAST(greatest(e64, 1) AS DOUBLE), 6) AS frac16,
           round(e32 / CAST(greatest(e64, 1) AS DOUBLE), 6) AS frac32,
           round(e48 / CAST(greatest(e64, 1) AS DOUBLE), 6) AS frac48
    FROM e
    """


@register("emb_dim_energy", oracle=_dim_energy_sql(), group="similarity")
def emb_dim_energy(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")

    def ssq(hi):
        return F.aggregate(
            F.transform(
                F.slice(v, 1, hi),
                lambda x: F.round(x * x * 1_000_000_000_000_000).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        )

    e64 = F.greatest(ssq(64), F.lit(1)).cast("double")
    return emb.select(
        "vec_id",
        F.round(ssq(16) / e64, 6).alias("frac16"),
        F.round(ssq(32) / e64, 6).alias("frac32"),
        F.round(ssq(48) / e64, 6).alias("frac48"),
    )


# leakage-safe splits: split by near-dup CLUSTER so no paraphrase of a
# training doc reaches the holdout; default bands sorted by name —
# test [0,2), train [2,98), val [98,100)
@register(
    "doc_leakage_safe_split",
    oracle=f"""
    WITH comp AS ({{comp}}),
    a AS (
      SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
    s AS (
      SELECT doc_id, cluster_id,
             CASE WHEN b < 2 THEN 'test'
                  WHEN b < 98 THEN 'train'
                  ELSE 'val' END AS split
      FROM (SELECT doc_id, cluster_id,
                   ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)
                                       || ':split1'), 1, 8))::BIGINT
                     % 100 AS b
            FROM a))
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
    FROM s GROUP BY split
    """.replace("{comp}", _components_sql()),
    group="doc",
)
def doc_leakage_safe_split(spark, sf_dir):
    from duckdb_delta_spark.operators import chunking as C

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_candidate_pairs(docs)
    out = C.leakage_safe_split(docs, pairs)
    return out.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("cluster_id").cast("long").alias("n_clusters"),
    )


# corpus-trained unigram surprisal (KenLM-perplexity proxy): per-term
# -log2 p rounded to 4dp then summed as exact DECIMAL on both engines
@register(
    "text_lm_score",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    counts AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    tot AS (SELECT sum(c) AS T, count(*) AS V FROM counts),
    probs AS (
      SELECT term,
             CAST(round(-log2((c + 1) / CAST(T + V AS DOUBLE)), 4)
                  AS DECIMAL(38,18)) AS nll
      FROM counts, tot),
    per AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_scored,
             sum(p.nll) AS s
      FROM toks t JOIN probs p USING (term) GROUP BY t.doc_id)
    SELECT d.doc_id,
           coalesce(per.n_scored, 0) AS n_scored,
           coalesce(CAST(per.s AS DOUBLE), 0.0) AS sum_bits
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """,
    group="text",
)
def text_lm_score(spark, sf_dir):
    return X.with_lm_score(load(spark, sf_dir, "documents"))


# canonical-URL dedup: scheme-case/www/query/fragment/trailing-slash
# variants of the same page collapse to one canonical key
_URL_VARIANTS = (
    "'https://WWW.Ex' || CAST(doc_id % 3 AS VARCHAR) || '.org/page/' "
    "|| CAST(doc_id % 20 AS VARCHAR) "
    "|| CASE WHEN doc_id % 2 = 0 THEN '/?utm=x#frag' ELSE '' END"
)


@register(
    "dedup_url_canonical",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_URL_VARIANTS} AS url FROM documents),
    c AS (
      SELECT doc_id,
             regexp_replace(
               lower(regexp_extract(
                 regexp_replace(regexp_replace(url, '[?#].*$', ''),
                                '/+$', ''),
                 '^(https?://[^/]*)', 1)),
               '^(https?://)www\\.', '\\1')
             || regexp_replace(
                  regexp_replace(regexp_replace(url, '[?#].*$', ''),
                                 '/+$', ''),
                  '^https?://[^/]*', '') AS canon
      FROM u)
    SELECT canon, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keep_id
    FROM c GROUP BY canon
    """,
    group="dedup",
)
def dedup_url_canonical(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_VARIANTS.replace("AS VARCHAR", "AS STRING"))
        .alias("url"))
    out = docs.withColumn("canon", X.canonical_url(F.col("url")))
    return out.groupBy("canon").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("keep_id"),
    )


# exact binary-payload dedup (checksum-keyed, blob never shuffles)
@register(
    "mm_payload_dedup",
    oracle="""
    SELECT md5(text) AS ck,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(octet_length(encode(text))) AS BIGINT) AS n_bytes
    FROM documents GROUP BY md5(text)
    """,
    group="mm",
)
def mm_payload_dedup(spark, sf_dir):
    from duckdb_delta_spark.operators import multimodal as M

    docs = M.with_payload(load(spark, sf_dir, "documents"))
    return M.dedup_payloads(docs)


# metadata-only audio segmentation: offsets/lengths over the byte stream
# (tiny fake rate so the 128-byte fixture payloads produce real overlap)
_SEG_BPS, _SEG_WIN_S, _SEG_HOP_S = 16, 4, 2


@register(
    "mm_audio_segments",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents),
    n AS (
      SELECT doc_id, n_bytes,
             greatest(1, CAST(ceil((n_bytes - {_SEG_BPS * _SEG_WIN_S})
                                   / {float(_SEG_BPS * _SEG_HOP_S)}) AS BIGINT)
                         + 1) AS n_seg
      FROM p),
    s AS (
      SELECT doc_id, n_bytes, unnest(range(0, n_seg)) AS seg_idx FROM n)
    SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
           CAST(seg_idx * {_SEG_BPS * _SEG_HOP_S} AS BIGINT) AS byte_offset,
           CAST(least({_SEG_BPS * _SEG_WIN_S},
                      n_bytes - seg_idx * {_SEG_BPS * _SEG_HOP_S}) AS BIGINT)
             AS byte_len
    FROM s
    WHERE least({_SEG_BPS * _SEG_WIN_S},
                n_bytes - seg_idx * {_SEG_BPS * _SEG_HOP_S}) > 0
    """,
    group="mm",
)
def mm_audio_segments(spark, sf_dir):
    from duckdb_delta_spark.operators import multimodal as M

    docs = M.with_payload(load(spark, sf_dir, "documents"))
    return M.segment_audio(
        docs, bytes_per_second=_SEG_BPS,
        window_seconds=_SEG_WIN_S, hop_seconds=_SEG_HOP_S,
    )


# MinHash estimator calibration: per candidate pair, the 8-component
# signature agreement fraction vs the exact shingle Jaccard — both
# engines compute both quantities independently end to end
def _minhash_estimate_sql() -> str:
    mins = ", ".join(
        f"min(md5('{s}:' || sh)) AS mh_{s}" for s in range(D.MINHASH_HASHES)
    )
    n_bands = D.MINHASH_HASHES // D.MINHASH_BAND_SIZE
    bands = ", ".join(
        "md5("
        + " || '|' || ".join(
            f"mh_{b * D.MINHASH_BAND_SIZE + k}"
            for k in range(D.MINHASH_BAND_SIZE)
        )
        + f") AS band_{b}"
        for b in range(n_bands)
    )
    unions = "\nUNION\n".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b "
        f"ON a.band_{b} = b.band_{b} AND a.doc_id < b.doc_id"
        for b in range(n_bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.mh_{s} = sb.mh_{s} THEN 1 ELSE 0 END)"
        for s in range(D.MINHASH_HASHES)
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    grams AS (SELECT doc_id, {_SHINGLES} AS g FROM toks),
    sh AS (SELECT doc_id, unnest(g) AS sh FROM grams),
    sig AS (SELECT doc_id, {mins}, NULL AS _pad FROM sh GROUP BY doc_id),
    sigb AS (SELECT doc_id, {bands.replace('mh_', 'sig.mh_')}
             FROM sig),
    pairs AS (SELECT DISTINCT id_a, id_b FROM ({unions.replace('FROM sig ', 'FROM sigb ').replace('JOIN sig ', 'JOIN sigb ')})),
    est AS (
      SELECT p.id_a, p.id_b,
             ({agree}) / CAST({D.MINHASH_HASHES} AS DOUBLE) AS est_jaccard
      FROM pairs p JOIN sig sa ON sa.doc_id = p.id_a
                   JOIN sig sb ON sb.doc_id = p.id_b),
    ex AS (
      SELECT e.id_a, e.id_b, e.est_jaccard,
             len(list_intersect(ga.g, gb.g)) AS n_i,
             len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)) AS n_u
      FROM est e JOIN grams ga ON ga.doc_id = e.id_a
                 JOIN grams gb ON gb.doc_id = e.id_b)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(est_jaccard, 4) AS est_jaccard,
           round(n_i / CAST(n_u AS DOUBLE), 4) AS jaccard,
           round(abs(est_jaccard - n_i / CAST(n_u AS DOUBLE)), 4) AS abs_err
    FROM ex
    """


@register(
    "dedup_minhash_estimate", oracle=_minhash_estimate_sql(), group="dedup"
)
def dedup_minhash_estimate(spark, sf_dir):
    return D.minhash_estimate_pairs(load(spark, sf_dir, "documents"))


# corpus length histogram (decade buckets) — the length-distribution
# sanity check every new crawl snapshot gets
@register(
    "text_length_histogram",
    oracle="""
    SELECT CAST((n_chars // 10) * 10 AS BIGINT) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
    group="text",
)
def text_length_histogram(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / 10) * 10).cast("long")
    return docs.groupBy(bucket.alias("bucket_lo")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# post-dedup corpus summary: what exact dedup would save, by language
@register(
    "dedup_savings_by_lang",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, lang, n_chars, {_FP} AS fp FROM documents),
    g AS (
      SELECT fp, min(lang) AS lang, count(*) AS n_copies,
             min(doc_id) AS keep_id, sum(n_chars) AS chars_all,
             min(n_chars) AS chars_keep
      FROM f GROUP BY fp)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n_copies) AS BIGINT) AS n_docs,
           CAST(sum(n_copies) - count(*) AS BIGINT) AS n_removable,
           CAST(sum(chars_all) - sum(chars_keep) AS BIGINT) AS chars_saved
    FROM g GROUP BY lang
    """,
    group="dedup",
)
def dedup_savings_by_lang(spark, sf_dir):
    docs = X.with_fingerprint(load(spark, sf_dir, "documents"))
    g = docs.groupBy("fingerprint").agg(
        F.min("lang").alias("lang"),
        F.count(F.lit(1)).alias("n_copies"),
        F.sum("n_chars").alias("chars_all"),
        F.min("n_chars").alias("chars_keep"),
    )
    return g.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n_copies").cast("long").alias("n_docs"),
        (F.sum("n_copies") - F.count(F.lit(1))).cast("long")
        .alias("n_removable"),
        (F.sum("chars_all") - F.sum("chars_keep")).cast("long")
        .alias("chars_saved"),
    )


# cross-doc n-gram novelty: fraction of a doc's distinct shingles that
# appear in NO other document — the diversity/novelty signal data
# curation uses to prefer non-templated content
@register(
    "doc_ngram_novelty",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    grams AS (SELECT doc_id, unnest({_SHINGLES}) AS g FROM toks),
    df AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g),
    per AS (
      SELECT gr.doc_id,
             count(*) AS n_grams,
             sum(CASE WHEN df.nd = 1 THEN 1 ELSE 0 END) AS n_unique
      FROM grams gr JOIN df USING (g) GROUP BY gr.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(per.n_unique, 0) AS BIGINT) AS n_unique,
           round(coalesce(per.n_unique / CAST(per.n_grams AS DOUBLE), 0.0), 4)
             AS novelty
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """,
    group="doc",
)
def doc_ngram_novelty(spark, sf_dir):
    # Single-pass shape (guide §2.3, aggregate before you shuffle; r20
    # verdict item 4). The old form shuffled the FULL gram stream three
    # times (groupBy g for document frequency, join grams⋈dfreq on g,
    # then groupBy doc_id on the join output) and recomputed the
    # tokenize+shingle+explode subtree twice. Equivalences used instead:
    #   * n_grams(doc) = size(word_shingles(...)) — the shingle array is
    #     already distinct per doc, so its size IS the exploded per-doc
    #     gram count; computed in the scan projection, no explode, no
    #     shuffle.
    #   * a gram with document-frequency 1 belongs to exactly ONE doc,
    #     so min(doc_id) per gram identifies it — n_unique(doc) is a
    #     count over the nd=1 grams grouped by that doc. Both groupBys
    #     run map-side partial aggregation; the old join shipped every
    #     gram row un-reduced.
    # Result bit-identical (same counts, same coalesce/round finish);
    # oracle unchanged.
    docs = load(spark, sf_dir, "documents")
    shingles = D.word_shingles(X.tokens(F.col("text")))
    # greatest(·, 0): explode DROPPED a null/empty array row (→ 0 via the
    # left-join coalesce); size() must yield the same 0, not NULL/-1
    counts = docs.select(
        "doc_id",
        F.greatest(F.size(shingles), F.lit(0)).cast("long").alias("n_grams"),
    )
    grams = docs.select(
        "doc_id", F.explode(shingles).alias("g")
    )
    uniq = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"), F.min("doc_id").alias("doc_id"))
        .where(F.col("nd") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_unique"))
    )
    return (
        counts.join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams"),
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            F.round(
                F.coalesce(
                    F.col("n_unique") / F.col("n_grams").cast("double"),
                    F.lit(0.0),
                ),
                4,
            ).alias("novelty"),
        )
    )


# epoch-repetition plan: how many times each source must repeat to fill
# its temperature-weighted share of the token budget (the "epochs per
# source" table a training run is configured from) — all integer math
_EPOCH_BUDGET = 2_000_000


@register(
    "doc_mix_epoch_plan",
    oracle=f"""
    WITH per AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS tok_s
      FROM documents GROUP BY source),
    s AS (SELECT source, tok_s,
                 CAST(floor(sqrt(CAST(tok_s AS DOUBLE))) AS BIGINT) AS s_s
          FROM per),
    t AS (SELECT sum(s_s) AS tot_s FROM s)
    SELECT source, tok_s,
           CAST(({_EPOCH_BUDGET} * s_s) // tot_s AS BIGINT) AS target_tok,
           CAST(ceil((({_EPOCH_BUDGET} * s_s) // tot_s)
                     / CAST(greatest(tok_s, 1) AS DOUBLE)) AS BIGINT)
             AS n_epochs
    FROM s, t
    """,
    group="doc",
)
def doc_mix_epoch_plan(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("tok_s")
    )
    s = per.withColumn(
        "s_s", F.floor(F.sqrt(F.col("tok_s").cast("double"))).cast("long")
    )
    t = s.agg(F.sum("s_s").alias("tot_s"))
    out = s.crossJoin(F.broadcast(t)).withColumn(
        "target_tok",
        F.expr(f"CAST({_EPOCH_BUDGET} AS BIGINT) * s_s div tot_s"),
    )
    return out.select(
        "source", "tok_s", "target_tok",
        F.ceil(
            F.col("target_tok") / F.greatest(F.col("tok_s"), F.lit(1)).cast("double")
        ).cast("long").alias("n_epochs"),
    )


# LSH bucket recall report: for each query, what fraction of its EXACT
# cosine top-5 lands in the same LSH bucket — both the truth set and the
# candidate set are deterministic, so the quality report itself is
# oracle-checked (the self-measurement an ANN config review needs)
@register(
    "ann_lsh_recall",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, {_DVEC} AS qv FROM embeddings
               WHERE vec_id < 20),
    c AS (SELECT vec_id AS neighbor_id, {_DVEC} AS cv FROM embeddings),
    s AS (SELECT query_id, neighbor_id,
                 list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(cv, cv))) AS cosv
          FROM c, q WHERE neighbor_id <> query_id),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosv DESC, neighbor_id) AS rank
        FROM s) WHERE rank <= 5),
    b AS (SELECT vec_id, {_bucket_expr()} AS bucket FROM embeddings),
    hits AS (
      SELECT t.query_id,
             sum(CASE WHEN bq.bucket = bn.bucket THEN 1 ELSE 0 END) AS n_hit
      FROM truth t
      JOIN b bq ON bq.vec_id = t.query_id
      JOIN b bn ON bn.vec_id = t.neighbor_id
      GROUP BY t.query_id)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(n_hit AS BIGINT) AS n_hit,
           round(n_hit / 5.0, 4) AS recall_at_5
    FROM hits
    """,
    group="similarity",
)
def ann_lsh_recall(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    truth = S.brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    b = S.with_lsh_bucket(emb, _planes()).select("vec_id", "bucket")
    bq = b.select(F.col("vec_id").alias("query_id"),
                  F.col("bucket").alias("q_bucket"))
    bn = b.select(F.col("vec_id").alias("neighbor_id"),
                  F.col("bucket").alias("n_bucket"))
    return (
        truth.join(F.broadcast(bq), "query_id")
        .join(F.broadcast(bn), "neighbor_id")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("q_bucket") == F.col("n_bucket"), 1).otherwise(0)
            ).cast("long").alias("n_hit")
        )
        .select(
            F.col("query_id").cast("long"), "n_hit",
            F.round(F.col("n_hit") / 5.0, 4).alias("recall_at_5"),
        )
    )


# sentence segmentation stats: terminal-punctuation splitting, pure codegen
@register(
    "text_sentence_stats",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(
               string_split_regex(text, '[.!?]+(\\s+|$)'), x -> trim(x)),
               x -> x <> '') AS sents,
             {_TOKS} AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(sents) AS BIGINT) AS n_sentences,
           round(len(t) / CAST(greatest(len(sents), 1) AS DOUBLE), 4)
             AS words_per_sentence
    FROM s
    """,
    group="text",
)
def text_sentence_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(
            F.split(F.col("text"), r"[.!?]+(\s+|$)"), lambda x: F.trim(x)
        ),
        lambda x: x != "",
    )
    toks = X.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(sents).cast("long").alias("n_sentences"),
        F.round(
            F.size(toks) / F.greatest(F.size(sents), F.lit(1)).cast("double"),
            4,
        ).alias("words_per_sentence"),
    )


# near-dup cluster-size histogram: how much of the corpus sits in
# how-big duplicate groups — the one-line summary a dedup review reads
@register(
    "dedup_cluster_sizes",
    oracle=f"""
    WITH comp AS ({_components_sql()}),
    sizes AS (SELECT cluster_id, count(*) AS sz FROM comp GROUP BY cluster_id)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """,
    group="dedup",
)
def dedup_cluster_sizes(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    comp = D.connected_components(D.minhash_candidate_pairs(docs))
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    return sizes.groupBy("sz").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
    ).select(
        F.col("sz").cast("long").alias("cluster_size"), "n_clusters",
        "n_docs",
    )


# BM25 top-k retrieval: inverted-index probe (postings of the query's
# terms only), per-term contributions rounded to 4dp and summed as
# exact DECIMAL (order-free, engine-identical), two-stage top-k.
# Queries are the first 6 distinct tokens of docs 0..4.
@register(
    "text_bm25_topk",
    oracle=f"""
    WITH dtok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    toks AS (SELECT doc_id, unnest(t) AS term FROM dtok),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM dtok),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS N,
                     avg(dl) AS avgdl FROM dl),
    pairs AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM pairs GROUP BY term),
    q AS (SELECT doc_id AS query_id,
                 unnest(list_distinct(list_slice(t, 1, 6))) AS term
          FROM dtok WHERE doc_id < 5),
    contrib AS (
      SELECT q.query_id, p.doc_id,
             CAST(round(
               ln(1 + (s.N - d.df + 0.5) / (d.df + 0.5))
               * (p.tf * (1.2 + 1))
               / (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)),
               4) AS DECIMAL(38,18)) AS c
      FROM q JOIN pairs p USING (term) JOIN dfreq d USING (term)
           JOIN dl ON dl.doc_id = p.doc_id, stats s),
    scored AS (SELECT query_id, doc_id,
                      CAST(count(*) AS BIGINT) AS n_terms,
                      CAST(sum(c) AS DOUBLE) AS score
               FROM contrib GROUP BY query_id, doc_id)
    SELECT query_id, doc_id, n_terms, score, rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id ASC
      ) AS BIGINT) AS rank FROM scored)
    WHERE rank <= 10
    """,
    group="text",
)
def text_bm25_topk(spark, sf_dir):
    """BM25 retrieval over the documents corpus; queries derived from
    the corpus itself (first 6 distinct tokens of docs 0..4)."""
    docs = load(spark, sf_dir, "documents")
    queries = docs.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.array_distinct(F.slice(X.tokens(F.col("text")), 1, 6)), " "
        ).alias("qtext"),
    )
    return X.bm25_topk(docs, queries, k=10)


# hybrid retrieval: reciprocal-rank fusion of BM25 (lexical, documents)
# and brute-force cosine (dense, embeddings) top-10 lists. doc_id and
# vec_id share the id space, so the fusion joins on it directly; the
# rrf score is a two-term expression (no accumulation-order hazard).
@register(
    "ann_hybrid_rrf",
    oracle=f"""
    WITH dtok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    toks AS (SELECT doc_id, unnest(t) AS term FROM dtok),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM dtok),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS N,
                     avg(dl) AS avgdl FROM dl),
    pairs AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM pairs GROUP BY term),
    q AS (SELECT doc_id AS query_id,
                 unnest(list_distinct(list_slice(t, 1, 6))) AS term
          FROM dtok WHERE doc_id < 5),
    contrib AS (
      SELECT q.query_id, p.doc_id,
             CAST(round(
               ln(1 + (s.N - d.df + 0.5) / (d.df + 0.5))
               * (p.tf * (1.2 + 1))
               / (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)),
               4) AS DECIMAL(38,18)) AS c
      FROM q JOIN pairs p USING (term) JOIN dfreq d USING (term)
           JOIN dl ON dl.doc_id = p.doc_id, stats s),
    lex_scored AS (SELECT query_id, doc_id,
                          CAST(sum(c) AS DOUBLE) AS score
                   FROM contrib GROUP BY query_id, doc_id),
    lex AS (SELECT query_id, doc_id, rank_lex FROM (
      SELECT query_id, doc_id, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id ASC
      ) AS BIGINT) AS rank_lex FROM lex_scored) WHERE rank_lex <= 10),
    qv AS (SELECT vec_id AS query_id, {_DVEC} AS v FROM embeddings
           WHERE vec_id < 5),
    cv AS (SELECT vec_id AS doc_id, {_DVEC} AS v FROM embeddings),
    dsim AS (SELECT q.query_id, c.doc_id,
                    list_dot_product(q.v, c.v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.v, c.v))) AS cosv
             FROM cv c, qv q WHERE c.doc_id <> q.query_id),
    dense AS (SELECT query_id, doc_id, rank_dense FROM (
      SELECT query_id, doc_id, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosv DESC, doc_id ASC
      ) AS BIGINT) AS rank_dense FROM dsim) WHERE rank_dense <= 10),
    fused AS (
      SELECT coalesce(l.query_id, d.query_id) AS query_id,
             coalesce(l.doc_id, d.doc_id) AS doc_id,
             l.rank_lex, d.rank_dense,
             round(coalesce(1.0 / (60 + l.rank_lex), 0)
                   + coalesce(1.0 / (60 + d.rank_dense), 0), 6) AS rrf_score
      FROM lex l FULL OUTER JOIN dense d
        ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
    SELECT query_id, doc_id, rank_lex, rank_dense, rrf_score, rrf_rank
    FROM (SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
          ) AS BIGINT) AS rrf_rank FROM fused)
    WHERE rrf_rank <= 10
    """,
    group="similarity",
)
def ann_hybrid_rrf(spark, sf_dir):
    """RRF hybrid search: BM25 lexical top-10 + exact cosine dense
    top-10, fused with 1/(60+rank) — the RAG retrieval-stack merge."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    queries = docs.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.array_distinct(F.slice(X.tokens(F.col("text")), 1, 6)), " "
        ).alias("qtext"),
    )
    lex = X.bm25_topk(docs, queries, k=10).select(
        "query_id", "doc_id", "rank")
    dense = S.brute_force_topk(
        emb, emb.where(F.col("vec_id") < 5), k=10
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    return S.rrf_fuse(lex, dense, k=10)


# MinHash banding at the AUTO-TUNED config: tune_lsh_banding(8, t=0.8,
# target 0.9) resolves to bands=4/rows=2 (the sharpest divisor split of
# the signature clearing the target recall at the threshold); this entry
# runs the candidate join at that banding so the tuner's decision is
# oracle-verified end-to-end, not just unit-tested.
_TUNED = D.tune_lsh_banding(num_hashes=8, threshold=0.8, target_recall=0.9)
assert (_TUNED["bands"], _TUNED["rows"]) == (4, 2)


@register(
    "dedup_minhash_tuned",
    oracle=_minhash_pairs_sql(num_hashes=8, band_size=_TUNED["rows"]),
    group="dedup",
)
def dedup_minhash_tuned(spark, sf_dir):
    return D.minhash_candidate_pairs(
        load(spark, sf_dir, "documents"),
        num_hashes=8, band_size=_TUNED["rows"],
    )


# truncation-duplicate pairs: doc A a strict prefix of doc B. The corpus
# is augmented with deterministic 60%-length truncations of every 7th
# doc (ids +1,000,000) so the operator has planted positives; the join
# key is the first 16 chars (any strict prefix pair >= 16 chars shares
# it), exact startswith verified inside buckets only.
_TRUNC_CORPUS = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id,
           substr(text, 1, CAST(floor(length(text) * 0.6) AS INT)) AS text
    FROM documents WHERE doc_id % 7 = 0
"""


@register(
    "dedup_prefix_containment",
    oracle=f"""
    WITH corpus AS ({_TRUNC_CORPUS}),
    base AS (
      SELECT doc_id, text, length(text) AS len,
             substr(text, 1, 16) AS key
      FROM corpus WHERE length(text) >= 16)
    SELECT CAST(a.doc_id AS BIGINT) AS id_a,
           CAST(b.doc_id AS BIGINT) AS id_b,
           CAST(a.len AS BIGINT) AS len_a,
           CAST(b.len AS BIGINT) AS len_b,
           round(a.len / CAST(b.len AS DOUBLE), 4) AS containment
    FROM base a JOIN base b ON a.key = b.key
    WHERE a.len < b.len AND substr(b.text, 1, a.len) = a.text
    """,
    group="dedup",
)
def dedup_prefix_containment(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    trunc = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(
            "substring(text, 1, CAST(floor(length(text) * 0.6) AS INT))"
        ).alias("text"),
    )
    return D.prefix_containment_pairs(docs.unionByName(trunc))


# burst / bot-rate flags: per-user minute-grain event-rate profile —
# the abuse-filtering pass of an events pipeline. One keyed hash-agg
# (user, minute) then a per-user rollup; no windows, no state.
@register(
    "ev_burst_flags",
    oracle="""
    WITH per_min AS (
      SELECT user_id, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS m,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(max(n) AS BIGINT) AS max_per_min,
           CAST(sum(CASE WHEN n >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_burst_minutes,
           max(n) >= 3 AS is_bursty
    FROM per_min GROUP BY user_id
    """,
    group="events",
)
def ev_burst_flags(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_min.groupBy("user_id").agg(
        F.max("n").cast("long").alias("max_per_min"),
        F.sum(F.when(F.col("n") >= 3, 1).otherwise(0)).cast("long")
        .alias("n_burst_minutes"),
        (F.max("n") >= 3).alias("is_bursty"),
    ).select(
        F.col("user_id").cast("long"), "max_per_min",
        "n_burst_minutes", "is_bursty",
    )


# quality-weighted sampling without replacement (Efraimidis–Spirakis
# exponential keys, md5-derived uniforms): inclusion ∝ token count,
# bit-reproducible across engines, one scan + two-stage top-n.
@register(
    "doc_weighted_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             CAST(greatest(len({_TOKS}), 1) AS BIGINT) AS weight
      FROM documents),
    keyed AS (
      SELECT doc_id, weight,
             round(ln((('0x' || substr(md5('ws1:' || CAST(doc_id AS VARCHAR)),
                                       1, 15))::BIGINT)
                      / POW(2, 60)) / weight, 9) AS skey
      FROM w)
    SELECT doc_id, weight, sample_rank FROM (
      SELECT doc_id, weight, CAST(row_number() OVER (
        ORDER BY skey DESC, doc_id ASC
      ) AS BIGINT) AS sample_rank FROM keyed)
    WHERE sample_rank <= 100
    """,
    group="pipeline",
)
def doc_weighted_sample(spark, sf_dir):
    from duckdb_delta_spark.operators import chunking as C

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.greatest(F.size(X.tokens(F.col("text"))), F.lit(1))
        .cast("long").alias("weight"),
    )
    return C.weighted_sample(
        docs, n=100, weight=F.col("weight"), salt="ws1"
    ).select("doc_id", "weight", "sample_rank")


# suffix-containment twin: planted 40%-tail variants (a rescrape that
# gained a header keeps the same tail); key = last 16 chars.
_TAIL_CORPUS = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id,
           substr(text, length(text)
                        - CAST(floor(length(text) * 0.4) AS INT) + 1,
                  CAST(floor(length(text) * 0.4) AS INT)) AS text
    FROM documents WHERE doc_id % 9 = 0
"""


@register(
    "dedup_suffix_containment",
    oracle=f"""
    WITH corpus AS ({_TAIL_CORPUS}),
    base AS (
      SELECT doc_id, text, length(text) AS len,
             substr(text, length(text) - 15, 16) AS key
      FROM corpus WHERE length(text) >= 16)
    SELECT CAST(a.doc_id AS BIGINT) AS id_a,
           CAST(b.doc_id AS BIGINT) AS id_b,
           CAST(a.len AS BIGINT) AS len_a,
           CAST(b.len AS BIGINT) AS len_b,
           round(a.len / CAST(b.len AS DOUBLE), 4) AS containment
    FROM base a JOIN base b ON a.key = b.key
    WHERE a.len < b.len
      AND substr(b.text, b.len - a.len + 1, a.len) = a.text
    """,
    group="dedup",
)
def dedup_suffix_containment(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tail = docs.where(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.expr(
            "substring(text, length(text)"
            " - CAST(floor(length(text) * 0.4) AS INT) + 1,"
            " CAST(floor(length(text) * 0.4) AS INT))"
        ).alias("text"),
    )
    return D.prefix_containment_pairs(
        docs.unionByName(tail), side="suffix"
    )


# end-to-end dedup FUNNEL: the per-stage survival report (docs/tokens
# kept after raw -> exact -> near-dup-canonical) every corpus run emits
# before committing to a config. Composes the exact-hash agg and the
# MinHash cluster canonicalization into one three-row summary.
def _dedup_funnel_sql() -> str:
    sig = _minhash_sig_sql()
    n_bands = D.MINHASH_HASHES // D.MINHASH_BAND_SIZE
    unions = "\nUNION\n".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sigs a JOIN sigs b "
        f"ON a.band_{b} = b.band_{b} AND a.doc_id < b.doc_id"
        for b in range(n_bands)
    )
    return f"""
    WITH RECURSIVE sigs AS ({sig}),
    pairs AS ({unions}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (
      SELECT id AS id, id AS r FROM nodes
      UNION
      SELECT e.a AS id, reach.r FROM reach JOIN edges e ON e.b = reach.id),
    comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
    tok AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS nt,
                   md5(text) AS fp
            FROM documents),
    exact AS (
      SELECT t.* FROM tok t
      JOIN (SELECT fp, min(doc_id) AS k FROM tok GROUP BY fp) g
        ON t.fp = g.fp AND t.doc_id = g.k),
    near AS (
      SELECT e.* FROM exact e LEFT JOIN comp c ON c.id = e.doc_id
      WHERE c.id IS NULL OR c.cluster_id = e.doc_id),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
    SELECT stage, n_docs, n_tokens,
           round(n_docs / CAST(tot.n AS DOUBLE), 4) AS keep_rate
    FROM (
      SELECT 'a_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens FROM tok
      UNION ALL
      SELECT 'b_exact', CAST(count(*) AS BIGINT),
             CAST(sum(nt) AS BIGINT) FROM exact
      UNION ALL
      SELECT 'c_neardup', CAST(count(*) AS BIGINT),
             CAST(sum(nt) AS BIGINT) FROM near), tot
    """


@register("dedup_funnel_report", oracle=_dedup_funnel_sql(), group="dedup")
def dedup_funnel_report(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.size(X.tokens(F.col("text"))).cast("long").alias("nt"),
        F.md5("text").alias("fp"),
    )
    keepers = tok.groupBy("fp").agg(F.min("doc_id").alias("k"))
    exact = tok.join(keepers, "fp").where(F.col("doc_id") == F.col("k"))
    comp = D.connected_components(D.minhash_candidate_pairs(docs))
    near = exact.join(
        comp, exact["doc_id"] == comp["id"], "left"
    ).where(F.col("id").isNull() | (F.col("cluster_id") == F.col("doc_id")))

    def stage(df, name):
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("nt"), F.lit(0)).cast("long").alias("n_tokens"),
        )

    # corpus total as a broadcast single-row frame instead of a driver
    # .count() action: one scheduler job fewer, no blocking collect in
    # the build path (guide §5 — the driver should do almost no data
    # work); the oracle's CROSS JOIN tot shape, mirrored
    tot = tok.agg(F.count(F.lit(1)).cast("double").alias("_tot"))
    out = (
        stage(tok, "a_raw")
        .unionByName(stage(exact, "b_exact"))
        .unionByName(stage(near, "c_neardup"))
    )
    return out.crossJoin(F.broadcast(tot)).select(
        "stage", "n_docs", "n_tokens",
        F.round(F.col("n_docs") / F.col("_tot"), 4).alias("keep_rate"),
    )


# per-language quality calibration: raw quality scores are not
# comparable across languages (stopword lists bias them), so the
# thresholding pass ranks WITHIN language — percent_rank per lang, the
# window partition bounded by the language stratum.
@register(
    "text_quality_calibrated",
    oracle=f"""
    WITH q AS (
      SELECT d.lang, s.doc_id, s.quality_score
      FROM ({_quality_oracle()}) s JOIN documents d USING (doc_id))
    SELECT doc_id, lang, quality_score,
           round(percent_rank() OVER (
             PARTITION BY lang ORDER BY quality_score
           ), 4) AS lang_pct_rank
    FROM q
    """,
    group="text",
)
def text_quality_calibrated(spark, sf_dir):
    from pyspark.sql.window import Window

    df = load(spark, sf_dir, "documents")
    q = X.with_quality(df).select("doc_id", "lang", "quality_score")
    w = Window.partitionBy("lang").orderBy("quality_score")
    return q.select(
        "doc_id", "lang", "quality_score",
        F.round(F.percent_rank().over(w), 4).alias("lang_pct_rank"),
    )


# corpus-trained BIGRAM surprisal (context-aware perplexity proxy, one
# step past text_lm_score's unigram): add-one-smoothed p(cur|prev) with
# prev mass derived from the bigram table itself; per-pair nll rounds
# to 4dp then sums as exact DECIMAL (order-free on both engines).
@register(
    "text_bigram_score",
    oracle=f"""
    WITH dtok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    bg AS (
      -- t[:len(t)-1], NOT t[:-1]: this DuckDB's [:-1] returns the FULL
      -- list, so list_zip would pad a phantom (last, NULL) pair that
      -- inflates the smoothing denominators cp
      SELECT doc_id, unnest(list_zip(t[:len(t)-1], t[2:])) AS p
      FROM dtok WHERE len(t) >= 2),
    pairs AS (SELECT doc_id, p[1] AS prev, p[2] AS cur FROM bg),
    counts AS (SELECT prev, cur, count(*) AS c FROM pairs
               GROUP BY prev, cur),
    prevs AS (SELECT prev, sum(c) AS cp FROM counts GROUP BY prev),
    vocab AS (SELECT count(DISTINCT term) AS V
              FROM (SELECT unnest(t) AS term FROM dtok)),
    nll AS (
      SELECT c.prev, c.cur,
             CAST(round(-log2((c.c + 1)
                              / CAST(p.cp + v.V AS DOUBLE)), 4)
                  AS DECIMAL(38,18)) AS bits
      FROM counts c JOIN prevs p USING (prev), vocab v),
    per AS (
      SELECT pr.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             sum(n.bits) AS s
      FROM pairs pr JOIN nll n
        ON n.prev = pr.prev AND n.cur = pr.cur
      GROUP BY pr.doc_id)
    SELECT d.doc_id,
           coalesce(per.n_bigrams, 0) AS n_bigrams,
           coalesce(CAST(per.s AS DOUBLE), 0.0) AS sum_bits
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """,
    group="text",
)
def text_bigram_score(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    dtok = docs.select("doc_id", X.tokens(F.col("text")).alias("t"))
    n = F.size("t")
    pairs = (
        dtok.where(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, n - 1).alias("prev"),
                    F.slice("t", 2, n - 1).alias("cur"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.prev").alias("prev"),
                F.col("p.cur").alias("cur"))
    )
    counts = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c"))
    prevs = counts.groupBy("prev").agg(F.sum("c").alias("cp"))
    V = (
        dtok.select(F.explode("t").alias("term"))
        .agg(F.countDistinct("term")).first()[0]
    )
    nll = counts.join(prevs, "prev").select(
        "prev", "cur",
        F.round(
            -F.log2((F.col("c") + 1) / (F.col("cp") + F.lit(V)).cast("double")),
            4,
        ).cast("decimal(38,18)").alias("bits"),
    )
    per = (
        pairs.join(nll, ["prev", "cur"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
             F.sum("bits").alias("s"))
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(F.col("s").cast("double"), F.lit(0.0)).alias("sum_bits"),
    )
