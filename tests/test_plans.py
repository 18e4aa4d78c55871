"""Physical-plan assertions: the plans we designed for are the plans we get.

The reference proves its pushdown with EXPLAIN regexes ("Scanning Files:
N/M", reference: test/sql/generated/file_skipping_all_types.test:14-24);
here the equivalents are Spark explain() checks: parquet PushedFilters,
pruned ReadSchema, broadcast joins where a side is dim-sized, and
whole-stage codegen present in the hot path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_delta_spark import DeltaTable, DeltaWriter

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_reaches_parquet_scan(spark):
    from duckdb_delta_spark.queries import load

    li = load(spark, SF, "lineitem").where(F.col("l_orderkey") < 100).select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(li)
    assert "PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]" in plan
    # column pruning: only the two projected columns are read
    assert "l_extendedprice" not in plan


def test_delta_scan_pushes_filters_and_prunes_columns(spark, tdir):
    schema = T.StructType(
        [T.StructField("i", T.LongType()), T.StructField("x", T.DoubleType()),
         T.StructField("s", T.StringType())]
    )
    w = DeltaWriter.create(spark, tdir, schema)
    w.append(
        spark.range(100).select(
            F.col("id").alias("i"), (F.col("id") * 1.0).alias("x"),
            F.lit("abc").alias("s"),
        )
    )
    sb = DeltaTable(tdir).scan(spark).filter("i", ">=", 50).select("i", "x")
    plan = _plan(sb.to_df())
    assert "GreaterThanOrEqual(i,50)" in plan  # row-group pushdown survives
    assert "codegen id" in plan  # hot path stays inside whole-stage codegen


def test_small_dimension_joins_broadcast(spark):
    from duckdb_delta_spark.queries import all_queries

    q03 = all_queries()["tpch_q03"].fn(spark, SF)
    plan = _plan(q03)
    assert "BroadcastHashJoin" in plan


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_dynamic_filter_reaches_parquet_scan(spark, tdir):
    """The build-side-derived IN-set is pushed to parquet row groups."""
    schema = T.StructType(
        [T.StructField("i", T.LongType()), T.StructField("x", T.DoubleType())]
    )
    w = DeltaWriter.create(spark, tdir, schema)
    w.append(spark.range(100).select(F.col("id").alias("i"),
                                     (F.col("id") * 1.0).alias("x")))
    dim = spark.range(5, 8).select(F.col("id").alias("k"))
    sb = DeltaTable(tdir).scan(spark).dynamic_filter("i", dim, "k")
    plan = _plan(sb.to_df())
    assert "In(i, [5,6,7])" in plan or "i IN (5,6,7)" in plan.replace('"', "")


def test_nested_filter_reaches_parquet_scan(spark, tdir):
    """A dotted-path predicate must survive to the parquet reader as a
    nested pushed filter AND prune unread struct branches."""
    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("s", T.StructType([
            T.StructField("a", T.LongType()),
            T.StructField("b", T.DoubleType()),
        ])),
    ])
    w = DeltaWriter.create(spark, tdir, schema)
    w.append(
        spark.range(100).select(
            F.col("id").alias("i"),
            F.struct(F.col("id").alias("a"), (F.col("id") * 2.0).alias("b")).alias("s"),
        )
    )
    sb = DeltaTable(tdir).scan(spark).filter("s.a", ">=", 50).select("i", "s")
    plan = _plan(sb.to_df())
    assert "s.a" in plan and "GreaterThanOrEqual" in plan


def test_tpcds_shape_joins_broadcast(spark):
    """The stacked rollup+window query broadcasts its dim joins and keeps
    one shuffle for the aggregate."""
    from duckdb_delta_spark.queries import all_queries

    q = all_queries()["ds_rollup_window"].fn(spark, SF)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "Expand" in plan  # ROLLUP lowered to Expand, not repeated scans
    assert "Window" in plan


def test_merge_matched_scan_reuses_broadcast(spark, tdir):
    """MERGE's matched-row discovery joins the source BROADCAST against
    the target scan (source is dim-sized by construction)."""
    schema = T.StructType(
        [T.StructField("i", T.LongType()), T.StructField("x", T.DoubleType())]
    )
    w = DeltaWriter.create(spark, tdir, schema)
    w.append(spark.range(1000).select(F.col("id").alias("i"),
                                      (F.col("id") * 1.0).alias("x")))
    src = spark.range(10).select(F.col("id").alias("i"), F.lit(0.0).alias("x"))
    sb = DeltaTable(tdir).scan(spark).with_virtual_columns()
    matched = sb.to_df().alias("t").join(
        F.broadcast(src.alias("s")), F.expr("t.i = s.i"), "left_semi"
    )
    plan = _plan(matched)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_virtual_file_number_no_global_window(spark, tdir):
    """delta_file_number comes from a broadcast file→index map, never a
    global unpartitioned Window (which would funnel the scan through one
    partition at scale)."""
    schema = T.StructType([T.StructField("i", T.LongType())])
    w = DeltaWriter.create(spark, tdir, schema)
    for lo in (0, 100, 200):
        w.append(spark.range(lo, lo + 100).select(F.col("id").alias("i")).coalesce(1))
    df = DeltaTable(tdir).scan(spark).with_virtual_columns().to_df()
    out = df.select("i", "delta_file_number", "filename")
    plan = _plan(out)
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    rows = out.collect()
    nums = {r.delta_file_number for r in rows}
    assert nums == {1, 2, 3}
    # numbering follows filename sort order, matching dense_rank semantics
    by_file = {}
    for r in rows:
        by_file.setdefault(r.filename, set()).add(r.delta_file_number)
    assert all(len(v) == 1 for v in by_file.values())
    ordered = [n for _, (n,) in sorted((f, tuple(v)) for f, v in by_file.items())]
    assert ordered == [1, 2, 3]


def test_chunking_zero_shuffle(spark):
    """chunk_documents and stratified_sample are row transforms: no
    Exchange in the plan, no Python (BatchEvalPython/ArrowEvalPython)."""
    from duckdb_delta_spark.operators import chunking as C
    from duckdb_delta_spark.queries import load

    docs = load(spark, SF, "documents")
    for df in (
        C.chunk_documents(docs),
        C.stratified_sample(docs, {"en": 50}, salt="t"),
    ):
        plan = _plan(df)
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan


def test_pack_greedy_single_shuffle(spark):
    """pack_greedy: exactly one data Exchange (the shard repartition for
    the window); the groupBy rides the same partitioning."""
    from duckdb_delta_spark.operators import chunking as C
    from duckdb_delta_spark.queries import load

    docs = load(spark, SF, "documents").withColumn(
        "n_tokens", F.size(C.ws_tokens(F.col("text"))).cast("long")
    )
    import re

    plan = _plan(C.pack_greedy(docs, budget=512, shards=8))
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan
    assert "EvalPython" not in plan, plan


def test_decontaminate_broadcasts_eval_grams(spark):
    """cross_contamination_pairs: the eval-gram side broadcasts (map-side
    hash join — the 100-TB train side never shuffles its grams) and the
    only Exchange is the overlap aggregation; all codegen, no Python."""
    import re

    from duckdb_delta_spark.operators import dedup as D
    from duckdb_delta_spark.queries import load

    docs = load(spark, SF, "documents")
    df = D.cross_contamination_pairs(
        docs.where(F.col("doc_id") % 50 != 0),
        docs.where(F.col("doc_id") % 50 == 0),
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_epoch_shuffle_sharded_window(spark):
    """epoch_shuffle: one Exchange on the bounded shard key feeding the
    per-shard window — never a global single-partition sort."""
    from duckdb_delta_spark.operators import chunking as C
    from duckdb_delta_spark.queries import load

    docs = load(spark, SF, "documents")
    plan = _plan(C.epoch_shuffle(docs, epoch=3))
    # a global window would show 'Window' over 'Exchange SinglePartition'
    assert "SinglePartition" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_containment_candidate_join_no_text_shuffle(spark):
    """prefix/suffix containment: the candidate key-join shuffles only
    (id, len, key, ladder hashes) — document TEXT never rides a __key
    exchange (broadcast disabled so every join plans as SMJ and all
    exchanges are visible). Text appears only in the confirm join's
    id_b-keyed side, which AQE broadcast-converts at runtime when the
    survivor set is small."""
    import re

    from duckdb_delta_spark.operators import dedup as D
    from duckdb_delta_spark.queries import load

    docs = load(spark, SF, "documents")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for side in ("prefix", "suffix"):
            plan = _plan(D.prefix_containment_pairs(docs, side=side))
            blocks = re.split(r"\n\(\d+\) ", plan)
            key_exchanges = [
                b for b in blocks
                if b.startswith("Exchange")
                and "hashpartitioning(__key" in b
            ]
            assert key_exchanges, plan  # the candidate join shuffles
            for b in key_exchanges:
                assert "__t#" not in b, b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_zipf_top_terms_two_stage_rank(spark):
    """zipf_top_terms: the vocabulary rank is TWO-STAGE — Catalyst turns
    the per-partition partial row_number into WindowGroupLimit
    (Partial/Final, streaming top-k, constant memory) and the global rank
    into a k-row TakeOrderedAndProject; the full vocabulary never funnels
    through a single-partition window. The total-token branch reuses the
    term-count exchange at runtime (ReusedExchange), so the corpus is
    scanned once for counts."""
    from duckdb_delta_spark.operators import text as X
    from duckdb_delta_spark.queries import load

    docs = load(spark, SF, "documents")
    df = X.zipf_top_terms(docs)
    plan = _plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # the only Windows allowed are the bounded ones: partial rank (gated
    # by WindowGroupLimit), global rank on <= k*partitions survivors
    # (gated by TakeOrderedAndProject), and the k-row cumulative sum —
    # never a Window directly above the full-vocab HashAggregate
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, executed


def test_row_id_scan_no_global_window(spark, tdir):
    """with_row_ids joins the per-file base via broadcast — no global
    window, no SinglePartition exchange."""
    from pyspark.sql import types as T

    from duckdb_delta_spark.delta.table import DeltaTable
    from duckdb_delta_spark.delta.writer import DeltaWriter

    schema = T.StructType([T.StructField("i", T.LongType())])
    w = DeltaWriter.create(
        spark, tdir, schema,
        configuration={"delta.enableRowTracking": "true"})
    w.append(spark.range(100).select(F.col("id").alias("i")).coalesce(2))
    df = DeltaTable(tdir).scan(spark).with_row_ids().to_df()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SinglePartition" not in plan, plan
    assert df.count() == 100


def test_repetition_zero_shuffle_no_python(spark):
    """with_repetition is a pure map stage: the bigram argmax is the
    sorted-run fold (no per-row quadratic scan, no window, no Exchange,
    no Python)."""
    from duckdb_delta_spark.operators import text as X
    from duckdb_delta_spark.queries import load

    df = X.with_repetition(load(spark, SF, "documents")).select(
        "doc_id", "dup_line_frac", "top_bigram_frac")
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Window" not in plan, plan


def test_keep_canonical_argmax_is_single_agg_no_window(spark):
    """keep_canonical: the per-cluster representative comes from
    max_by inside the hash aggregate — no Window operator, no extra
    Exchange beyond the join/agg shuffles, no Python."""
    from duckdb_delta_spark.operators import dedup as D
    from duckdb_delta_spark.operators import text as X
    from duckdb_delta_spark.queries import load

    docs = load(spark, SF, "documents")
    clusters = D.connected_components(D.minhash_candidate_pairs(docs))
    df = D.keep_canonical(X.with_quality(docs), clusters)
    plan = _plan(df)
    assert "Window" not in plan, plan
    assert "max_by" in plan, plan


def test_boilerplate_removal_broadcasts_frequent_lines(spark):
    """remove_boilerplate_lines: the frequent-line set anti-joins as a
    BROADCAST (the 100-TB corpus side never shuffles its lines twice) and
    the per-doc rebuild is an in-agg sort — no Window, no Python."""
    from duckdb_delta_spark.operators import text as X
    from duckdb_delta_spark.queries import load

    df = X.remove_boilerplate_lines(load(spark, SF, "documents"))
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_boilerplate_removal_shuffle_fallback_same_answer(spark):
    """When the frequent-line set exceeds the broadcast budget the
    anti-join degrades to a shuffle join (no broadcast of the big set)
    and the output is byte-identical to the broadcast route."""
    from duckdb_delta_spark.operators import text as X
    from duckdb_delta_spark.queries import load

    # synthetic corpus with genuine boilerplate — at sf0.001 no line
    # repeats across documents, so the frequent set would be empty and
    # n_freq=0 would always satisfy the budget
    boiler = "accept all cookies"
    docs = spark.createDataFrame(
        [(i, f"unique line {i}\n{boiler}\nbody {i}") for i in range(20)],
        "doc_id long, text string",
    )
    bcast = X.remove_boilerplate_lines(docs)
    # at test scale the planner would auto-broadcast any small side, which
    # is exactly right in production — disable it here so the over-budget
    # route's plan shape (shuffle anti-join) is observable
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuf = X.remove_boilerplate_lines(docs, broadcast_budget=0)
        plan = _plan(shuf)
        anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti, plan
        assert all("Broadcast" not in ln for ln in anti), plan
        shuf_rows = sorted(map(tuple, shuf.collect()), key=lambda t: t[0])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    try:
        bplan = _plan(bcast)
        banti = [ln for ln in bplan.splitlines() if "LeftAnti" in ln]
        assert any("Broadcast" in ln for ln in banti), bplan
        assert sorted(map(tuple, bcast.collect()),
                      key=lambda t: t[0]) == shuf_rows
    finally:
        bcast._boilerplate_freq.unpersist()
        shuf._boilerplate_freq.unpersist()


def test_brute_force_topk_two_stage_window(spark):
    """Expression-path brute_force_topk: a partial top-k window keyed by
    (query_id, corpus-partition) runs before the global per-query window,
    so the final window consumes ≤ k rows per (query, partition) group
    instead of the whole corpus — no one-task-per-query funnel."""
    from duckdb_delta_spark.operators import similarity as S
    from duckdb_delta_spark.queries import load

    emb = load(spark, SF, "embeddings")
    q = emb.limit(3)
    df = S.brute_force_topk(emb, q, k=5)
    plan = _plan(df)
    import re

    # two window stages: partial (query_id, __pid) then global (query_id)
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2, plan
    assert "__pid" in plan, plan  # stage 1 keyed by corpus partition
    # the partial rank filter feeds the global window
    assert re.search(r"__prank#\d+ <= 5", plan), plan
    # Spark 4 pushes the rank limit below each exchange: top-k is taken
    # map-side, so the shuffle carries ≤ k rows per (query, partition)
    assert len(re.findall(r"WindowGroupLimit", plan)) >= 2, plan


def test_incremental_dedup_never_shuffles_corpus(spark):
    """The corpus branch of incremental_dedup must reach its join through a
    BroadcastHashJoin with no shuffle Exchange — the whole point of the
    operator (a daily batch must not re-shuffle a 100 TB corpus)."""
    from duckdb_delta_spark.operators.dedup import incremental_dedup
    from duckdb_delta_spark.queries import load

    docs = load(spark, SF, "documents")
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    plan = _plan(incremental_dedup(corpus, batch))
    import re

    # formatted explain lists each operator once as "(n) OpName"
    joins = re.findall(r"\(\d+\) BroadcastHashJoin", plan)
    assert len(joins) == 2, plan  # semi (corpus) + anti (batch)
    assert "SortMergeJoin" not in plan
    # the only shuffles allowed are the distincts over BATCH-derived
    # (small) branches; the corpus branch itself must go
    # scan -> project -> broadcast-join with no Exchange.
    shuffles = re.findall(r"\(\d+\) Exchange", plan)
    assert len(shuffles) <= 2, plan


def test_range_join_is_equi_join_not_nested_loop(spark):
    """range_join must plan as a hash equi-join on (key, bucket) — a
    BroadcastNestedLoopJoin here is the 100-TB cartesian trap the
    operator exists to avoid."""
    from duckdb_delta_spark.operators.joins import range_join
    from duckdb_delta_spark.queries import load

    ev = load(spark, SF, "events")
    points = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts")
    iv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("iv_id"), "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"))
    plan = _plan(range_join(points, iv))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_bm25_is_index_probe_not_corpus_broadcast(spark):
    """BM25's joins must broadcast the QUERY side (tiny) into the
    postings/vocabulary — never the corpus-sized side — and contain no
    nested-loop/cartesian fallback; the per-(query,doc) score then
    hash-aggregates. This is the inverted-index probe shape that keeps
    the 100-TB cost at 'postings of the query terms', not a corpus scan."""
    from pyspark.sql import functions as F

    from duckdb_delta_spark.operators.text import bm25_topk, tokens
    from duckdb_delta_spark.queries import load

    docs = load(spark, SF, "documents")
    queries = docs.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens(F.col("text")), 1, 6), " ")
        .alias("qtext"),
    )
    plan = _plan(bm25_topk(docs, queries, k=10))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # qterms->dfreq, qd->pairs
    assert "HashAggregate" in plan


def test_ivf_partitioned_probe_prunes_partitions(spark, tmp_path):
    """The materialized IVF layout: probing must (a) return exactly what
    in-memory ivf_topk returns, and (b) read ONLY the nprobe probed
    list_id partitions — visible as PartitionFilters on the parquet
    scan with the non-probed directories absent from the plan's
    partition count."""
    from pyspark.sql import functions as F

    from duckdb_delta_spark.operators.similarity import (
        ivf_centroids, ivf_probe_partitioned, ivf_topk,
        ivf_write_partitioned,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dest = str(tmp_path / "ivf_idx")
    cents = ivf_centroids(emb)
    ivf_write_partitioned(emb, dest, centroids=cents)

    q = emb.where(F.col("vec_id").isin([100, 200, 300]))
    got = ivf_probe_partitioned(dest, q, cents, k=5, nprobe=2)
    want = ivf_topk(emb, q, k=5, nprobe=2, centroids=cents)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))

    plan = _plan(got)
    assert "PartitionFilters" in plan and "list_id" in plan
    # the scan must not touch all 16 list directories: spark reports the
    # partition-pruned file count; assert the filter made it a subset
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "list_id" in m.group(1), plan


def test_ivf_probe_distributed_route_no_query_collect(spark, tmp_path,
                                                      monkeypatch):
    """|Q| above the collect budget: probe planning runs as the
    broadcast-centroid pandas UDF — the driver route must never fire
    (monkeypatched to raise), results match the driver route exactly,
    and the partition-pruned scan survives."""
    from pyspark.sql import functions as F

    from duckdb_delta_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dest = str(tmp_path / "ivf_idx2")
    cents = S.ivf_centroids(emb)
    S.ivf_write_partitioned(emb, dest, centroids=cents)

    q = emb.where(F.col("vec_id") < 40)  # 40 queries
    want = sorted(map(tuple, S.ivf_probe_partitioned(
        dest, q, cents, k=5, nprobe=2).collect()))

    def _boom(*a, **k):
        raise AssertionError("driver probe route above the collect budget")

    monkeypatch.setattr(S, "_probe_pairs_driver", _boom)
    got = S.ivf_probe_partitioned(
        dest, q, cents, k=5, nprobe=2, collect_budget=10)
    assert sorted(map(tuple, got.collect())) == want
    plan = _plan(got)
    assert "PartitionFilters" in plan and "list_id" in plan


def test_merge_multimatch_probe_rides_dv_mask_single_join(spark, tmp_path,
                                                          monkeypatch):
    """MERGE with a CONDITIONAL modifying clause: the multi-match probe
    must ride the DV-mask job as a `_live` marker over the raw ON join —
    ONE join in the mask plan, no second target×source probe job."""
    from duckdb_delta_spark import errors
    from duckdb_delta_spark.delta.writer import DeltaWriter as W

    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType())])
    path = str(tmp_path / "m")
    w = W.create(spark, path, schema)
    w.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], schema).coalesce(1))

    captured = []
    real = W._dv_results

    def spy(self, snap, matched):
        captured.append(matched._jdf.queryExecution().optimizedPlan()
                        .toString())
        return real(self, snap, matched)

    monkeypatch.setattr(W, "_dv_results", spy)

    # conditional matched-only update, key-unique source → commits
    src = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    w.merge(src, "t.k = s.k", when_matched_update={"v": "s.v"},
            when_matched_condition="s.v = 'a'",
            when_not_matched_insert=False)
    assert len(captured) == 1
    assert captured[0].count("Join Inner") == 1, captured[0]
    # the mask carries the condition marker, not a pre-filtered join
    assert "_live" in captured[0]

    # and the folded probe still raises on fan-out (no second join job)
    captured.clear()
    dup = spark.createDataFrame([(1, "a"), (1, "b")], schema)
    with pytest.raises(errors.TransactionError, match="more than one"):
        w.merge(dup, "t.k = s.k", when_matched_update={"v": "s.v"},
                when_matched_condition="s.v = 'a'",
                when_not_matched_insert=False)
    assert len(captured) == 1
    assert captured[0].count("Join Inner") == 1, captured[0]


def test_dv_build_scan_prunes_payload_columns(spark, tmp_path):
    """The DELETE/replaceWhere DV build consumes only (filename, row#):
    with the cdc payload persist removed (r17), Catalyst must prune
    every data column out of that scan — deleting from a 100-column
    table reads the predicate column plus file metadata, nothing else."""
    path = str(tmp_path / "t")
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("payload_a", T.StringType()),
        T.StructField("payload_b", T.DoubleType()),
    ])
    w = DeltaWriter.create(spark, path, schema)
    w.append(spark.createDataFrame(
        [(i, f"p{i}", float(i)) for i in range(20)], schema).coalesce(1))

    from duckdb_delta_spark.delta.scan import DeltaScanBuilder

    snap = DeltaTable(path).snapshot
    scan = DeltaScanBuilder(snap, spark).with_virtual_columns()
    matched = (scan.to_df().where(F.col("k") < 5)
               .select(F.col("filename").alias("f"),
                       F.col("file_row_number").alias("r")))
    plan = _plan(matched)
    # predicate + virtual columns survive; payloads are pruned
    assert "payload_a" not in plan and "payload_b" not in plan
    assert "PushedFilters" in plan


def test_cdc_preimage_plan_no_predicate_single_broadcast_join(
        spark, tmp_path, monkeypatch):
    """The DELETE cdc pre-image job (r18: DV-diff derivation) must not
    contain the user predicate AT ALL — the predicate is evaluated once
    into the DV build, and the pre-image plan is a restricted scan
    filtered by a broadcast semi-join on (filename, row#) (small route).
    A predicate re-evaluation in this plan is exactly the wall-clock /
    sampling divergence bug the derivation exists to prevent."""
    from duckdb_delta_spark.delta.writer import DeltaWriter as W

    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("sentinel_col", T.StringType())])
    path = str(tmp_path / "t")
    w = W.create(spark, path, schema, configuration={
        "delta.enableChangeDataFeed": "true"})
    w.append(spark.createDataFrame(
        [(i, f"s{i}") for i in range(20)], schema).coalesce(1))

    captured = []
    real = W._write_cdc

    def spy(self, df, parts):
        captured.append(df._jdf.queryExecution().optimizedPlan().toString())
        return real(self, df, parts)

    monkeypatch.setattr(W, "_write_cdc", spy)
    w.delete("k >= 17")          # partial file → cdc path
    assert len(captured) == 1
    # Catalyst expression IDs (#82017L) can legitimately contain the
    # digits of the predicate literal late in a long session — strip
    # them before asserting the LITERAL is absent (r19: this tripped
    # once in a full-suite run after ~80k expression IDs)
    import re as _re

    plan = _re.sub(r"#\d+", "", captured[0])
    # no re-evaluation of the predicate in the pre-image plan
    assert "17" not in plan, plan
    # one broadcast-able semi join on the virtual (filename, row#) pair
    assert plan.count("Join LeftSemi") == 1, plan
    assert "file_row_number" in plan
