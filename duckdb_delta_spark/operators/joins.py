"""Temporal join operators Spark lacks natively: as-of join.

The reference engine inherits its host's join surface (DuckDB ships a
native ASOF JOIN); Spark has no such operator, so this module re-expresses
it Spark-first — NOT as a per-key loop or a pandas UDF, but as the
union + running-window formulation that Catalyst executes as ONE shuffle
on the join key plus an in-partition sort:

  1. tag left rows 1, right rows 0, union them;
  2. window per key ordered by (ts, tag): a running ``last(..., ignore
     nulls)`` over right-tagged payloads gives every left row the most
     recent right row at-or-before its timestamp;
  3. keep the left rows.

This is the classic scalable as-of shape (the same plan a sort-merge
as-of join would produce): linear work after one sort, no row explosion,
no per-key state. Skewed keys degrade exactly like any keyed window —
``asof_join(salt=(col, n))`` splits a hot key across n tasks by salting
the left side and replicating the (small) right side, with provably
identical output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    right_cols: tuple[str, ...] = ("value",),
    tolerance_seconds: int | None = None,
    salt: tuple[str, int] | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gains the most recent right row
    with ``right.on <= left.on`` in the same ``by`` group (equal
    timestamps match, like DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).

    Adds ``asof_<on>`` (the matched right timestamp, null when no match)
    and ``asof_<c>`` for every requested right column.
    ``tolerance_seconds`` voids matches older than the window (pandas
    ``merge_asof`` tolerance semantics).

    Determinism: with several right rows at the SAME (key, ts) the one
    latest in (ts, input order) wins; feed de-duplicated right frames
    when that matters (the oracle corpus has no such ties).

    ``salt=(col, n)``: hot-key splitter for skewed ``by`` keys (one
    user/entity holding a large share of left rows makes the keyed
    window a single straggler task). Left rows are deterministically
    salted into n sub-partitions by hashing left column ``col``; right
    rows REPLICATE to all n salts, so every sub-partition sees the full
    right stream and the per-salt running ``last`` is already the
    global answer — no cross-salt merge, and the output is provably
    identical to the unsalted plan. Cost: right side ×n (the small,
    dimension-change side — choose n ≈ hot-key rows / target partition
    rows). The window then partitions on (*by, salt), so the hottest
    key spreads over n tasks."""
    tag = F.lit(1)
    lcols = left.columns
    l = left.withColumn("__tag", tag)
    r = right.select(
        *by, F.col(on),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    ).withColumn("__tag", F.lit(0))
    part: tuple[str, ...] = by
    if salt is not None:
        scol, n = salt
        if n < 1:
            raise ValueError(f"salt fan-out must be >= 1, got {n}")
        l = l.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(scol)), F.lit(n)).cast("int")
        )
        r = r.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(n)]))
        )
        part = (*by, "__salt")
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_right = F.col("__tag") == 0
    matched_ts = F.last(F.when(is_right, F.col(on)), ignorenulls=True).over(w)
    out = u.withColumn(f"asof_{on}", matched_ts)
    for c in right_cols:
        out = out.withColumn(
            f"asof_{c}",
            F.last(
                F.when(is_right, F.col(f"__r_{c}")), ignorenulls=True
            ).over(w),
        )
    out = out.where(F.col("__tag") == 1)
    if tolerance_seconds is not None:
        # evaluate staleness ONCE against the original matched timestamp
        # (voiding asof_<on> first would null the predicate for the rest)
        out = out.withColumn(
            "__stale",
            (F.col(on).cast("double") - F.col(f"asof_{on}").cast("double"))
            > float(tolerance_seconds),
        )
        for c in (f"asof_{on}", *[f"asof_{c}" for c in right_cols]):
            out = out.withColumn(
                c,
                F.when(F.col("__stale"), F.lit(None)).otherwise(F.col(c)),
            )
    return out.select(
        *lcols, f"asof_{on}", *[f"asof_{c}" for c in right_cols]
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    by: tuple[str, ...] = ("user_id",),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join (``start <= point_ts < end``) without the
    inequality-join cartesian trap.

    Spark executes a pure inequality join as BroadcastNestedLoopJoin —
    O(|points|·|intervals|) and a guaranteed 100-TB killer. The scalable
    reformulation bucketizes time: every interval explodes into the
    ``bucket_seconds`` buckets it spans (bounded by span/bucket — pick a
    bucket near the typical span so the blow-up is a small constant),
    each point maps to exactly one bucket, and the join becomes an
    EQUI-join on (by..., bucket) — hash-partitioned, AQE-skew-splittable
    — followed by the exact range filter. Each qualifying pair meets in
    exactly one bucket (the point's), so no dedup is needed.

    Columns of both inputs are preserved; name collisions beyond ``by``
    must be resolved by the caller (the usual Spark join contract)."""
    bs = int(bucket_seconds)
    p_bucket = F.floor(F.col(point_ts).cast("double") / bs).cast("long")
    i_lo = F.floor(F.col(start).cast("double") / bs).cast("long")
    # end is exclusive: a point at exactly `end` never matches, so the
    # last bucket an interval can meet a point in is floor((end-ulp)/bs);
    # floor(end/bs) is a safe (at most one bucket larger) cover
    i_hi = F.floor(F.col(end).cast("double") / bs).cast("long")
    i = intervals.withColumn(
        "__bucket", F.explode(F.sequence(i_lo, i_hi))
    )
    p = points.withColumn("__bucket", p_bucket)
    cond = (
        (F.col(point_ts) >= F.col(start))
        & (F.col(point_ts) < F.col(end))
    )
    return (
        p.join(i, [*by, "__bucket"])
        .where(cond)
        .drop("__bucket")
    )


def scd2_history(
    changes: DataFrame,
    key: tuple[str, ...] = ("user_id",),
    ts: str = "ts",
    attrs: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change stream (one row per
    key per change) into versioned history rows — ``valid_from`` /
    ``valid_to`` (null = open), ``is_current``, ``version_n`` — the shape
    every warehouse dimension load and point-in-time training-feature
    join needs (an as-of join against this table reconstructs any
    historical state).

    One window per key ordered by the change timestamp (lead() closes
    each interval); per-key state is the key's change count — never
    corpus-wide, so skew follows the hottest key, same as any keyed
    window."""
    w = Window.partitionBy(*key).orderBy(F.col(ts).asc())
    return changes.select(
        *key, *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.lead(ts).over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version_n"),
    )
