"""Similarity search over embedding columns (array<float>).

Two paths, as a real 100 TB pipeline needs:

* **brute-force cosine top-k** — exact baseline. The query set is broadcast
  (it's small by construction); the corpus side streams through one
  narrow-dependency map + a per-query top-k (window over rank), so the only
  shuffle is the final k·|queries| rows.
* **LSH bucketing (random hyperplanes)** — the scale path: each vector maps
  to a sign-pattern bucket; candidate search joins only within buckets.
  Plane components are deterministic (md5-derived on the driver) so the
  DuckDB oracle gets the *same* constants inlined.

Dot products run as built-in higher-order functions (``zip_with`` +
``aggregate``) in DOUBLE — JVM codegen, no Python. A vectorized pandas-UDF
variant is provided for very wide vectors where Arrow batching wins.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd

from duckdb_delta_spark.localrel import local_df as _local_df
from duckdb_delta_spark.operators.exprlit import lit_double_matrix, lit_doubles

from pyspark.sql import Column, DataFrame, functions as F

LSH_PLANES = 8


def plane_components(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1).

    Component (p, i) = first 4 bytes of md5(f"plane:{p}:{i}") as uint32,
    scaled. Driver-side Python → identical constants for Spark and DuckDB.
    """
    planes = []
    for p in range(num_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"plane:{p}:{i}".encode()).digest()
            (x,) = struct.unpack(">I", h[:4])
            row.append(round(x / 2**31 - 1.0, 9))
        planes.append(row)
    return planes


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double-precision dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _dot_sql(a_sql: str, b_sql: str) -> str:
    """SQL twin of :func:`dot` — parses to the same zip_with/aggregate
    tree (modulo lambda-variable names)."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def cosine_sql(a_sql: str, b_sql: str) -> Column:
    """SQL-rendered :func:`cosine` over two column/expression strings.

    The Column form creates three zip_with/aggregate lambda chains
    through the py4j gateway (~75 round-trips per call site — guide §5,
    plan construction is driver work); this renders the identical tree
    in ONE ``F.expr``. Value-identity pinned in
    tests/test_r21_renderings.py; plans identical modulo lambda names."""
    return F.expr(
        f"({_dot_sql(a_sql, b_sql)} / "
        f"(sqrt({_dot_sql(a_sql, a_sql)}) * sqrt({_dot_sql(b_sql, b_sql)})))"
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos) — ties break on
    neighbor id so the selected set is deterministic.

    Two-stage top-k: a window partitioned only by ``query_id`` over the
    full corpus×queries product funnels ALL corpus rows for one query
    into one task (per-query skew that gets worse as the corpus grows).
    Instead stage 1 ranks within (query_id, corpus-partition) — the group
    count is |queries| × |corpus partitions|, evenly sized — and keeps
    k rows per group; the global per-query window then consumes only
    k × |corpus partitions| candidate rows per query. The global top-k is
    always a subset of the union of per-partition top-ks, so the result
    is identical."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_sql("__qv", "__cv"))
        .withColumn("__pid", F.spark_partition_id())
    )
    order = (F.col("cos").desc(), F.col("neighbor_id").asc())
    w_partial = Window.partitionBy("query_id", "__pid").orderBy(*order)
    candidates = (
        scored.withColumn("__prank", F.row_number().over(w_partial))
        .where(F.col("__prank") <= k)
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col("neighbor_id").cast("long"),
            F.round("cos", 4).alias("cos"),
            F.col("rank").cast("long"),
        )
    )


def lsh_bucket(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket string, one char per hyperplane.

    Pass ``vec`` as a column NAME to get the one-round-trip rendering:
    the whole concat-of-CASE expression (plane literals AND the
    zip_with/aggregate dot products) becomes a single ``F.expr`` string —
    the Column path still paid ~25 py4j round-trips per plane for the
    three lambda creations (guide §5). A Column argument keeps the
    expression-API path for composed callers; both parse to the same
    tree."""
    if isinstance(vec, str):
        from duckdb_delta_spark.operators.exprlit import sql_double

        parts = []
        for row in planes:
            arr = "array(" + ",".join(sql_double(v) for v in row) + ")"
            d = (
                f"aggregate(zip_with(`{vec}`, {arr}, "
                "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                "0.0D, (acc, v) -> acc + v)"
            )
            parts.append(f"(CASE WHEN {d} >= 0 THEN '1' ELSE '0' END)")
        return F.expr("concat(" + ",".join(parts) + ")")
    parts = []
    for row in planes:
        plane = lit_doubles(row)
        parts.append(F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*parts)


def with_lsh_bucket(
    df: DataFrame, planes: list[list[float]] | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    if planes is None:
        dim = len(df.select(vec_col).first()[0])
        planes = plane_components(LSH_PLANES, dim)
    return df.withColumn("bucket", lsh_bucket(vec_col, planes))


def lsh_near_pairs(
    df: DataFrame,
    planes: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """ANN candidate pairs: same LSH bucket, verified by exact cosine ≥
    threshold. The join key is the bucket — quadratic cost only within
    buckets (the LSH contract)."""
    b = with_lsh_bucket(df, planes, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "bucket"
    )
    pairs = (
        b.alias("a")
        .join(b.alias("b"), "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .withColumn("cos", cosine_sql("a.v", "b.v"))
        .where(F.col("cos") >= threshold)
        .select(
            F.col("a.id").cast("long").alias("id_a"),
            F.col("b.id").cast("long").alias("id_b"),
            F.round("cos", 4).alias("cos"),
        )
    )
    return pairs


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries_rows: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched variant: queries as a broadcast numpy matrix, corpus
    streamed through ``mapInPandas`` computing a blocked matmul. Wins over
    the fold-expression path when dim is large (BLAS beats codegen loops);
    returns per-partition partial top-k, then a global window finalizes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    spark = corpus.sparkSession
    qids = np.array([q[0] for q in queries_rows], dtype="int64")
    qmat = np.array([q[1] for q in queries_rows], dtype="float64")
    qnorm = np.linalg.norm(qmat, axis=1)
    bc = spark.sparkContext.broadcast((qids, qmat, qnorm))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def score(batches):
        qids_, qmat_, qnorm_ = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype="int64")
            mat = np.asarray(pdf[vec_col].to_list(), dtype="float64")
            sims = (mat @ qmat_.T) / (
                np.linalg.norm(mat, axis=1)[:, None] * qnorm_[None, :]
            )
            n_keep = min(k + 1, len(ids))
            for qi in range(len(qids_)):
                col = sims[:, qi]
                top = np.argpartition(-col, n_keep - 1)[:n_keep]
                yield pd.DataFrame(
                    {
                        "query_id": qids_[qi],
                        "neighbor_id": ids[top],
                        "cos": col[top],
                    }
                )

    partial = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"),
                F.col("rank").cast("long"))
    )


# --------------------------------------------------------------------- IVF

IVF_LISTS = 16
IVF_NPROBE = 2
IVF_CENTROID_STRIDE = 1000  # vec_id % stride == 0 → seed centroid


def ivf_centroids(df: DataFrame, num_lists: int = IVF_LISTS,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic IVF seed centroids: the ``num_lists`` lowest-id vectors.

    A production IVF trains centroids with k-means; the *search plumbing*
    (assignment, inverted lists, nprobe probing) is identical, and seeding
    deterministically keeps the DuckDB oracle bit-exact. Swap this function
    for a k-means fit without touching the search path."""
    return (
        df.orderBy(id_col)
        .limit(num_lists)
        .select(
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.orderBy(id_col)
            ).alias("list_id"),
            F.col(vec_col).alias("centroid"),
        )
    )


def ivf_assign(df: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, ties → lowest
    list_id) via a broadcast cross join — the inverted-list build."""
    from pyspark.sql.window import Window

    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "_cos", cosine_sql(f"`{vec_col}`", "centroid")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("list_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(df["*"], "list_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_lists: int = IVF_LISTS,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: score queries only against vectors whose
    inverted list is among the query's ``nprobe`` nearest centroids.

    ``centroids``: a (list_id, centroid) frame — e.g. k-means output via
    :func:`centroids_df` — else the deterministic seed centroids. At scale
    the corpus assignment is precomputed/bucketed (a write-time partition
    key) and each query touches nprobe/num_lists of the data — that
    fraction is the whole point of IVF."""
    from pyspark.sql.window import Window

    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, num_lists, id_col, vec_col)
    )
    assigned = ivf_assign(corpus, cents, id_col, vec_col)

    qprobe = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cents))
        .withColumn("_cos", cosine_sql("qv", "centroid"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("list_id"))
    qlists = (
        qprobe.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "list_id")
    )

    scored = (
        qlists.join(
            assigned.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"),
                "list_id",
            ),
            "list_id",
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosv", cosine_sql("qv", "cv"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosv").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col("neighbor_id").cast("long"),
            F.round("cosv", 4).alias("cos"),
            F.col("rank").cast("long"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = IVF_LISTS,
    max_iter: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd's k-means over an embedding column — the real IVF
    centroid trainer (``ivf_centroids`` keeps the deterministic seed
    variant for the bit-exact oracle path).

    Scale shape per iteration: centroids broadcast (k x dim floats), the
    assignment is one Arrow-batched ``mapInPandas`` doing a blocked numpy
    matmul (BLAS) emitting only (cluster, dim-sums, count) PARTIALS per
    batch — so the shuffle is O(batches x k), never O(rows) — and the
    k x dim re-average lands on the driver. Deterministic: seeds are the
    k lowest-id vectors, ties break to the lowest cluster id.
    """
    import numpy as np
    from pyspark.sql import types as T

    spark = df.sparkSession
    # deterministic farthest-point seeding on a hash-ordered sample — the
    # k lowest ids can all sit in one cluster, which strands centroids in
    # local optima; greedy max-min spread on a 4096-vector sample is the
    # scale-safe k-means++ stand-in (one pass, driver does k x sample)
    sample = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(max(4096, 4 * k))
        .collect()
    )
    pts = np.array([r[1] for r in sample], dtype="float64")
    pn = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-12)
    chosen = [0]
    min_sim = pn @ pn[0]
    while len(chosen) < min(k, len(pts)):
        nxt = int(np.argmin(min_sim))  # farthest (lowest cosine) point
        chosen.append(nxt)
        min_sim = np.maximum(min_sim, pn @ pn[nxt])
    cents = pts[chosen]
    dim = cents.shape[1]
    vec_df = df.select(F.col(vec_col).alias("v"))

    out_schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("sums", T.ArrayType(T.DoubleType())),
            T.StructField("n", T.LongType()),
        ]
    )

    for _ in range(max_iter):
        bc = spark.sparkContext.broadcast(cents)

        def _partials(batches):
            import numpy as np
            import pandas as pd

            c = bc.value
            cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
            for pdf in batches:
                m = np.array(pdf["v"].tolist(), dtype="float64")
                if m.size == 0:
                    continue
                mn = m / np.maximum(
                    np.linalg.norm(m, axis=1, keepdims=True), 1e-12
                )
                # cosine assignment; argmax takes the LOWEST index on ties
                a = np.argmax(mn @ cn.T, axis=1)
                rows = []
                for cl in np.unique(a):
                    sel = m[a == cl]
                    rows.append(
                        (int(cl), sel.sum(axis=0).tolist(), int(len(sel)))
                    )
                yield pd.DataFrame(rows, columns=["cluster", "sums", "n"])

        agg = (
            vec_df.mapInPandas(_partials, out_schema)
            .groupBy("cluster")
            .agg(
                F.array(
                    *[
                        F.sum(F.element_at("sums", i + 1)).alias(f"s{i}")
                        for i in range(dim)
                    ]
                ).alias("sums"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        for r in agg:
            if r["n"]:
                new[r["cluster"]] = np.array(r["sums"]) / r["n"]
        shift = float(np.abs(new - cents).max())
        cents = new
        bc.unpersist()
        if shift <= tol:
            break
    return [c.tolist() for c in cents]


def centroids_df(spark, centroids: list[list[float]]) -> DataFrame:
    """Trained centroids as the (list_id, centroid) frame ivf_assign/
    ivf_topk consume (list_id is 1-based like ivf_centroids)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("list_id", T.IntegerType()),
            T.StructField("centroid", T.ArrayType(T.FloatType())),
        ]
    )
    return _local_df(spark, 
        [(i + 1, [float(x) for x in c]) for i, c in enumerate(centroids)], schema
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/bandwidth step
    of an embedding pipeline (4x smaller vectors for ANN candidate
    generation, with exact re-rank on the fp32 originals).

    scale = max|v| / 127; q_i = round(v_i / scale) ∈ [-127, 127]. Pure
    JVM higher-order functions (transform/aggregate): embarrassingly
    parallel, zero shuffle, no Python. Returns per-vector quantization
    quality stats (the columns a pipeline monitors): scale, l1 norm of
    the codes, max absolute reconstruction error, mean squared error."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    q = F.when(amax == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.round(x / scale).cast("int"))
    )
    df = df.select(
        F.col(id_col), v.alias("__v"), F.round(scale, 9).alias("scale"),
        q.alias("__q"), scale.alias("__s"),
    )
    err = F.zip_with(
        F.col("__v"), F.col("__q"),
        lambda x, c: F.abs(x - c.cast("double") * F.col("__s")),
    )
    return df.select(
        id_col,
        "scale",
        F.aggregate(
            "__q", F.lit(0).cast("long"),
            lambda acc, c: acc + F.abs(c).cast("long"),
        ).alias("q_l1"),
        F.round(F.array_max(err), 8).alias("max_abs_err"),
        F.round(
            F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e * e)
            / F.size("__q"), 10,
        ).alias("mse"),
    )


# ---------------------------------------------------------------- PQ/ADC

PQ_M = 4        #: subspaces
PQ_K = 16       #: codewords per subspace

#: squared-distance terms are fixed-point BIGINTs (scale 1e15): integer
#: addition is exact and order-free, so Spark partial aggregation and the
#: oracle's arbitrary summation order produce BIT-IDENTICAL distances —
#: no float tie hazards in the argmin/rank stages. (Sub-distance < 4 →
#: term < 4e15; sums stay far below 2^63.)
PQ_SCALE = 1_000_000_000_000_000


def _ssd_fixed(a: Column, b: Column) -> Column:
    """Fixed-point squared L2 distance of two double-array columns."""
    terms = F.zip_with(
        a, b,
        lambda x, y: F.round((x - y) * (x - y) * PQ_SCALE).cast("long"),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc + v)


def pq_codebooks(
    corpus: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train: bool = False,
    train_iters: int = 5,
) -> list[list[list[float]]]:
    """Per-subspace codebooks seeded from the k lowest-id corpus vectors
    (one bounded O(k) driver collect — the same deterministic seeding rule
    the IVF oracle uses). ``train=True`` refines the seeds with
    per-subspace Lloyd's k-means (L2 on the subvectors — the metric ADC
    scans actually use), all m subspaces in ONE distributed pass per
    iteration; the default stays iteration-0 seeding so the DuckDB oracle
    path is bit-exact and parameter-free. Returns books[s][c] = the
    sub-dim codeword."""
    rows = (
        corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    dim = len(rows[0][0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = [
        [[float(rows[c][0][s * sub + i]) for i in range(sub)] for c in range(k)]
        for s in range(m)
    ]
    if train:
        books = _pq_lloyd_refine(corpus, books, train_iters, vec_col)
    return books


def _pq_lloyd_refine(
    corpus: DataFrame,
    books: list[list[list[float]]],
    iters: int,
    vec_col: str,
) -> list[list[list[float]]]:
    """Lloyd's refinement of PQ codebooks: per subspace, assign every
    subvector to its nearest codeword (exact L2, ties to the lower code)
    and re-average. All m subspaces train in the SAME ``mapInPandas``
    pass — per batch a blocked numpy distance matrix per subspace emits
    only (subspace, code, dim-sums, count) partials, so each iteration's
    shuffle is O(batches x m x k) and the driver handles m x k rows.
    Empty cells keep their previous codeword (standard Lloyd's
    degenerate-cell rule), so determinism is preserved end-to-end."""
    import numpy as np
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    B = np.array(books, dtype="float64")  # (m, k, sub)
    m, k, sub = B.shape
    vec_df = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))

    out_schema = T.StructType(
        [
            T.StructField("s", T.IntegerType()),
            T.StructField("code", T.IntegerType()),
            T.StructField("sums", T.ArrayType(T.DoubleType())),
            T.StructField("n", T.LongType()),
        ]
    )

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(B)

        def _partials(batches):
            import numpy as np
            import pandas as pd

            books_arr = bc.value
            mm, kk, ss = books_arr.shape
            for pdf in batches:
                mat = np.array(pdf["v"].tolist(), dtype="float64")
                if mat.size == 0:
                    continue
                rows = []
                for s in range(mm):
                    sv = mat[:, s * ss:(s + 1) * ss]          # (n, sub)
                    # ||x-c||^2 expanded; argmin keeps the LOWEST code on
                    # exact ties, matching the encode path's rule
                    d2 = (
                        (sv * sv).sum(axis=1, keepdims=True)
                        - 2.0 * sv @ books_arr[s].T
                        + (books_arr[s] * books_arr[s]).sum(axis=1)[None, :]
                    )
                    a = np.argmin(d2, axis=1)
                    for code in np.unique(a):
                        sel = sv[a == code]
                        rows.append(
                            (int(s), int(code),
                             sel.sum(axis=0).tolist(), int(len(sel)))
                        )
                yield pd.DataFrame(rows, columns=["s", "code", "sums", "n"])

        agg = (
            vec_df.mapInPandas(_partials, out_schema)
            .groupBy("s", "code")
            .agg(
                F.array(
                    *[
                        F.sum(F.element_at("sums", i + 1)).alias(f"c{i}")
                        for i in range(sub)
                    ]
                ).alias("sums"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        new = B.copy()
        for r in agg:
            if r["n"]:
                new[r["s"], r["code"]] = np.array(r["sums"]) / r["n"]
        shift = float(np.abs(new - B).max())
        B = new
        bc.unpersist()
        if shift <= 1e-9:
            break
    return [[list(map(float, cw)) for cw in book] for book in B]


def pq_encode(
    df: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to m code bytes: code_s = argmin over the
    subspace codebook of the exact-decimal squared distance (ties to the
    lower code). Pure codegen expressions — the 100-TB encode is one
    embarrassingly parallel scan producing m small ints per vector
    (a 256× compression of a float32 corpus at the usual m=8/k=256)."""
    sub = len(books[0][0])
    v_sql = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    cols = [F.col(id_col)]
    for s, book in enumerate(books):
        # ONE higher-order transform over the literal codebook array per
        # subspace (instead of k separate aggregates): 16× smaller
        # expression tree, ~2× faster end-to-end (codegen compile time is
        # the constant that dominates at bench scale). argmin =
        # array_position of the min — first occurrence, so ties go to the
        # lower code exactly like the struct-min formulation. The whole
        # per-subspace expression is rendered as ONE SQL string (see
        # _subdist_sql — the lambda-API form paid ~350 py4j round-trips
        # per subspace in plan construction alone).
        sv_sql = f"slice({v_sql}, {s * sub + 1}, {sub})"
        d = _subdist_sql(sv_sql, book)
        cols.append(F.expr(
            f"CAST((array_position({d}, array_min({d})) - 1) AS INT)"
        ).alias(f"code_{s}"))
    return df.select(*cols)


def _subdist_array(sv, book) -> Column:
    """array<long> of fixed-point distances from subvector ``sv`` to every
    codeword in ``book`` — one transform over a literal array-of-arrays.
    The codebook literal is rendered as ONE parsed expression (see
    exprlit): the per-element ``F.lit`` path cost ~280 py4j round-trips
    per call site × 8 sites ≈ 1.7 s of driver chatter per pq build."""
    return F.transform(lit_double_matrix(book), lambda cw: _ssd_fixed(sv, cw))


def _ssd_fixed_sql(a_sql: str, b_sql: str) -> str:
    """SQL twin of :func:`_ssd_fixed` over two array-expression strings —
    parses to the same zip_with/aggregate tree (modulo lambda-variable
    ids). ``0.5`` pitfalls avoided: the accumulator zero is written
    ``CAST(0 AS BIGINT)`` (a bare 0 would type INT and change the
    aggregate's declared type)."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, "
        f"(x, y) -> CAST(round(((x - y) * (x - y)) * {PQ_SCALE}) AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def _subdist_sql(sv_sql: str, book) -> str:
    """SQL twin of :func:`_subdist_array`, rendered ENTIRELY as one
    expression string (codebook literal + the nested lambda chain).

    The Column form still cost ~350 py4j round-trips per call site AFTER
    exprlit fixed the literals: every ``F.transform``/``zip_with``/
    ``aggregate`` lambda is created through the gateway (guide §5 —
    driver-side plan construction is driver work too). cProfile on the
    ann_pq_rerank build: 2,817 round-trips ≈ 1.3 s of socket wait, gone
    with this rendering. Catalyst parses the string to the same tree."""
    from duckdb_delta_spark.operators.exprlit import sql_double

    arr = "array(" + ",".join(
        "array(" + ",".join(sql_double(v) for v in cw) + ")" for cw in book
    ) + ")"
    return f"transform({arr}, cw -> {_ssd_fixed_sql(sv_sql, 'cw')})"


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = PQ_M,
    kcent: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation:
    corpus vectors live as m-byte codes, each query carries an m×kcent
    lookup table of exact-decimal subdistances, and the approximate
    distance is m LUT probes + an exact decimal add — no vector math in
    the scan. Broadcast of queries+LUTs, then the same two-stage
    (per-partition partial, then global) top-k window as
    :func:`brute_force_topk`, ranking by (adist asc, neighbor_id).

    100-TB shape: the corpus never moves (codes are ~1% of vector bytes),
    queries broadcast, and per-row work is O(m) element_at probes.
    ``books``: pre-built codebooks (e.g. ``pq_codebooks(train=True)``);
    default rebuilds the deterministic seeded books for the oracle path."""
    from pyspark.sql.window import Window

    if books is None:
        books = pq_codebooks(corpus, m, kcent, id_col, vec_col)
    sub = len(books[0][0])
    codes = pq_encode(corpus, books, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    qv_sql = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    qcols = [F.col(id_col).alias("query_id")]
    for s, book in enumerate(books):
        # the ADC lookup table IS the per-subspace distance array
        qcols.append(F.expr(_subdist_sql(
            f"slice({qv_sql}, {s * sub + 1}, {sub})", book
        )).alias(f"lut_{s}"))
    q = queries.select(*qcols)

    joined = codes.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    adist = None
    for s in range(m):
        probe = F.element_at(F.col(f"lut_{s}"), F.col(f"code_{s}") + 1)
        adist = probe if adist is None else adist + probe
    scored = joined.withColumn("adist", adist).withColumn(
        "__pid", F.spark_partition_id()
    )
    order = (F.col("adist").asc(), F.col("neighbor_id").asc())
    w_partial = Window.partitionBy("query_id", "__pid").orderBy(*order)
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("__prank", F.row_number().over(w_partial))
        .where(F.col("__prank") <= k)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col("neighbor_id").cast("long"),
            F.round(F.col("adist") / F.lit(float(PQ_SCALE)), 6).alias("approx_dist"),
            F.col("rank").cast("long"),
        )
    )


def pq_topk_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    m: int = PQ_M,
    kcent: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Two-phase ANN, the production PQ shape: the ADC scan over codes
    produces a per-query shortlist (k' ≫ k candidates, still never
    touching the float vectors), then ONLY the shortlist rows are
    re-scored with the exact squared distance and re-ranked. Recall is
    set by k'/k, cost by "code scan + |Q|·k' exact distances".

    The shortlist (|Q|·k' ids) is broadcast back onto the corpus scan —
    a semi-join, no corpus shuffle — so the 100-TB cost profile is two
    embarrassingly parallel passes. Exact distances use the same
    fixed-point arithmetic as ADC: deterministic, oracle-exact."""
    from pyspark.sql.window import Window

    cand = pq_topk(
        corpus, queries, k=shortlist, m=m, kcent=kcent,
        id_col=id_col, vec_col=vec_col, books=books,
    ).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    cv = corpus.join(
        F.broadcast(cand.select("neighbor_id").distinct()),
        corpus[id_col] == F.col("neighbor_id"),
        "left_semi",
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    scored = (
        cand.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("dist_fx", F.expr(_ssd_fixed_sql("__qv", "__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_fx").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col("neighbor_id").cast("long"),
            F.round(F.col("dist_fx") / F.lit(float(PQ_SCALE)), 6).alias("dist"),
            F.col("rank").cast("long"),
        )
    )


# ----------------------------------------------------------- hybrid fusion

def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked retrieval lists — the
    standard hybrid-search merge (lexical BM25 + dense ANN) of a RAG
    retrieval stack: rrf(q, d) = Σ_lists 1/(c + rank_list(d)), summed
    over the lists where d appears.

    Inputs are (query, id, rank) frames (e.g. :func:`~duckdb_delta_spark.
    operators.text.bm25_topk` and :func:`brute_force_topk` output, each
    already top-k' bounded). The join is a full outer on (query, id) —
    both sides are |Q|·k' rows, so this is dim-sized work no matter the
    corpus size; the per-pair score is one two-term expression (no
    accumulation-order hazard) and the final top-k window's groups are
    ≤ 2k' rows. Ties rank by id ascending."""
    from pyspark.sql.window import Window

    a = ranked_a.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(rank_col).alias("rank_lex"),
    )
    b = ranked_b.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(rank_col).alias("rank_dense"),
    )
    fused = a.join(b, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_score",
        F.round(
            F.coalesce(1.0 / (F.lit(c) + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(c) + F.col("rank_dense")), F.lit(0.0)),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rrf_rank", F.row_number().over(w))
        .where(F.col("rrf_rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col("doc_id").cast("long"),
            F.col("rank_lex").cast("long"),
            F.col("rank_dense").cast("long"),
            "rrf_score",
            F.col("rrf_rank").cast("long"),
        )
    )


# ------------------------------------------------- IVF write-time layout

def ivf_write_partitioned(
    corpus: DataFrame,
    dest: str,
    centroids: DataFrame | None = None,
    num_lists: int = IVF_LISTS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Materialize the IVF layout: assign every vector to its inverted
    list and write parquet PARTITIONED BY list_id — the write-time half
    of the 100-TB IVF story. A probe then reads ``nprobe/num_lists`` of
    the data via ordinary partition pruning (no custom index format,
    no shuffle at query time); on a real lake this directory layout is
    exactly the "assignment is the partition key" pattern.

    Returns the assignment frame for reuse."""
    assigned = ivf_assign(
        corpus,
        centroids if centroids is not None
        else ivf_centroids(corpus, num_lists, id_col, vec_col),
        id_col, vec_col,
    )
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(dest)
    return assigned


#: above this many query vectors, probe planning stops collecting the
#: query set on the driver and runs as a broadcast-centroid pandas UDF
IVF_PROBE_COLLECT_BUDGET = 10_000


def _probe_pairs_driver(
    queries: DataFrame, Cn, lids: list[int], nprobe: int, id_col: str,
    vec_col: str,
) -> DataFrame:
    """Interactive-|Q| route: collect the query vectors and rank the
    nprobe nearest centroids in one driver matmul."""
    import numpy as np

    from duckdb_delta_spark.localrel import local_df
    from pyspark.sql import types as T

    probe_pairs = []
    for r in queries.select(id_col, vec_col).collect():
        qv = np.array(r[1], dtype="float64")
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        sims = Cn @ qn
        # ties to the lowest list_id, matching ivf_topk's window order
        order = sorted(range(len(lids)), key=lambda i: (-sims[i], lids[i]))
        probe_pairs.extend((int(r[0]), lids[i]) for i in order[:nprobe])
    return local_df(queries.sparkSession, sorted(probe_pairs), T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("list_id", T.IntegerType()),
    ]))


def _probe_pairs_distributed(
    queries: DataFrame, Cn, lids: list[int], nprobe: int, id_col: str,
    vec_col: str,
) -> DataFrame:
    """Batch-|Q| route: the centroid matrix (num_lists × dim — metadata
    scale) broadcasts to executors; each Arrow batch ranks its queries'
    centroids in one matmul. The query set never touches the driver."""
    import numpy as np
    import pandas as pd

    bc = queries.sparkSession.sparkContext.broadcast(
        (Cn, np.array(lids, dtype="int64")))

    @F.pandas_udf("array<int>")
    def _top_lists(vecs: pd.Series) -> pd.Series:
        Cn_, lids_ = bc.value
        out = []
        for v in vecs:
            qv = np.asarray(v, dtype="float64")
            qn = qv / max(np.linalg.norm(qv), 1e-12)
            sims = Cn_ @ qn
            # ties to the lowest list_id (lexsort: last key primary)
            order = np.lexsort((lids_, -sims))[:len(lids_)]
            out.append([int(lids_[i]) for i in order[: int(nprobe)]])
        return pd.Series(out)

    return queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.explode(_top_lists(F.col(vec_col))).alias("list_id"),
    ).withColumn("list_id", F.col("list_id").cast("int"))


def ivf_probe_partitioned(
    index_path: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    collect_budget: int = IVF_PROBE_COLLECT_BUDGET,
) -> DataFrame:
    """Search the materialized IVF layout: rank each query's nprobe
    nearest centroids (driver matmul at interactive |Q| ≤
    ``collect_budget``; above it, a broadcast-centroid pandas UDF — the
    query set never collects), then scan ONLY the probed list_id
    partitions with an IN filter Spark turns into partition pruning
    (assert `PartitionFilters` in the plan). The probed-list set itself
    IS collected — it is bounded by num_lists, metadata scale, and the
    partition filter needs driver-side literals. Scoring/top-k matches
    :func:`ivf_topk` exactly."""
    from pyspark.sql.window import Window

    spark = queries.sparkSession
    cent_rows = centroids.collect()  # k rows — bounded by num_lists
    import numpy as np

    C = np.array([r["centroid"] for r in cent_rows], dtype="float64")
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    lids = [int(r["list_id"]) for r in cent_rows]

    n_q = queries.count()
    route = _probe_pairs_driver if n_q <= collect_budget \
        else _probe_pairs_distributed
    pp = route(queries, Cn, lids, nprobe, id_col, vec_col)
    small_q = n_q <= collect_budget
    if not small_q:
        # reused twice below (partition-prune literals + both joins):
        # plan the UDF once instead of re-running it per consumer
        pp = pp.localCheckpoint(eager=False)

    probed_lists = sorted(
        r["list_id"] for r in pp.select("list_id").distinct().collect()
    )  # bounded by num_lists
    index = spark.read.parquet(index_path).where(
        F.col("list_id").isin(probed_lists)  # -> PartitionFilters
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    maybe_bc = F.broadcast if small_q else (lambda d: d)
    scored = (
        index.join(maybe_bc(pp), "list_id")
        .join(maybe_bc(qv), "query_id")
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("cosv", cosine_sql("qv", f"`{vec_col}`"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosv").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col(id_col).cast("long").alias("neighbor_id"),
            F.round("cosv", 4).alias("cos"),
            F.col("rank").cast("long"),
        )
    )
