"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride through the engine as opaque ``binary`` columns with
a typed metadata struct. The Spark-side machinery — schema, Arrow batch
shape, ``mapInPandas`` signatures, partition sizing — is real and tested;
the actual decode is STUBBED (``decode=fake`` deterministic bytes-derived
features, or ``decode=strict`` raising NotImplementedError) because codec
libraries aren't in this container. Swapping a real decoder in changes one
function body, not the pipeline.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

#: metadata carried beside every payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a binary payload column + metadata struct (fixture path: the
    testdata has no real media, so payload = utf-8 bytes of the text —
    the *plumbing* is what's under test)."""
    payload = F.encode(F.col(text_col), "utf-8")
    # checksum over the source string (not the blob): DuckDB's md5 is
    # VARCHAR-only, and the oracle must compute the identical value
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(F.col(text_col)).alias("checksum"),
        ),
    )


def decode_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    mode: str = "fake",
) -> DataFrame:
    """Arrow-batched decode → fixed-width feature vector via mapInPandas.

    ``mode='fake'``: deterministic per-byte histogram features (stands in
    for image decode + embed). ``mode='strict'``: NotImplementedError —
    the marked seam where a real codec (PIL/ffmpeg) plugs in.
    """
    import numpy as np
    import pandas as pd

    if mode not in ("fake", "strict"):
        raise ValueError(mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(
                    "media decode requires a codec library (PIL/ffmpeg); "
                    "install one and replace decode_features(mode='strict')"
                )
            feats = []
            sizes = []
            for raw in pdf[payload_col]:
                b = np.frombuffer(raw, dtype=np.uint8)
                hist = np.bincount(b % FEATURE_DIM, minlength=FEATURE_DIM)
                total = max(len(b), 1)
                feats.append(np.round(hist / total, 6).tolist())
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": "text/plain",
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "feature": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, DECODED_SCHEMA)


def payload_stats(df: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-group payload accounting (the dashboard-side of a media lake)."""
    return (
        with_payload(df)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum(F.col("media_meta.n_bytes")).cast("long").alias("total_bytes"),
            F.countDistinct(F.col("media_meta.checksum")).alias("distinct_payloads"),
            F.max(F.col("media_meta.n_bytes")).cast("long").alias("max_bytes"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int,
    id_col: str = "doc_id", payload_col: str = "payload", mode: str = "fake",
) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas stage.

    ``mode='fake'``: deterministic box-filter pooling — byte ``i`` of an
    ``L``-byte payload lands in bucket ``i*n_out//L`` and each of the
    ``n_out = width*height`` output bytes is the floored mean of its
    bucket (integer-exact, so the SQL oracle reproduces it bit-for-bit;
    a real resize is the same shape with pixel windows). ``mode='strict'``:
    NotImplementedError — the seam where PIL/opencv plugs in. Output
    payload size is bounded by width*height, so downstream partition
    sizing is predictable."""
    import numpy as np
    import pandas as pd

    if mode not in ("fake", "strict"):
        raise ValueError(mode)
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(
                    "image resize requires PIL/opencv; replace mode='strict'"
                )
            out = []
            for raw in pdf[payload_col]:
                b = np.frombuffer(raw, dtype=np.uint8)
                if len(b) == 0:
                    out.append(bytes(n_out))
                    continue
                idx = (np.arange(len(b)) * n_out) // len(b)
                sums = np.bincount(
                    idx, weights=b.astype(np.float64), minlength=n_out
                )
                cnts = np.bincount(idx, minlength=n_out)
                out.append(
                    (sums // np.maximum(cnts, 1)).astype(np.uint8).tobytes()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "resized": out,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, n_frames: int = 4, frame_bytes: int = 64,
    id_col: str = "doc_id", payload_col: str = "payload", mode: str = "fake",
) -> DataFrame:
    """Video frame sampling: one input payload fans out to ``n_frames``
    rows (1:N mapInPandas — the batch shape a real ffmpeg sampler has).
    ``fake`` mode slices evenly-spaced windows from the raw bytes."""
    import numpy as np
    import pandas as pd

    if mode not in ("fake", "strict"):
        raise ValueError(mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(
                    "frame sampling requires ffmpeg; replace mode='strict'"
                )
            ids, idxs, frames = [], [], []
            for doc_id, raw in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(raw)
                for k in range(n_frames):
                    start = (k * max(len(b) - frame_bytes, 0)) // max(n_frames - 1, 1)
                    ids.append(int(doc_id))
                    idxs.append(k)
                    frames.append(b[start:start + frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAMES_SCHEMA)


def dedup_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact binary dedup: group identical payload bytes (the first
    dedup every image/audio corpus runs — byte-identical re-crawls are
    the bulk of media duplication). One hash-agg on the payload checksum;
    at 100 TB the groupBy key is the CHECKSUM (fixed width), never the
    blob itself, so shuffle volume is rows × 32 bytes, not the corpus."""
    return (
        df.select(F.col(id_col), F.col("media_meta")["checksum"].alias("ck"),
                  F.col("media_meta")["n_bytes"].alias("n_bytes"))
        .groupBy("ck")
        .agg(
            F.min(id_col).cast("long").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.first("n_bytes").cast("long").alias("n_bytes"),
        )
    )


def segment_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    bytes_per_second: int = 32_000,   # 16 kHz × 16-bit mono
    window_seconds: int = 2,
    hop_seconds: int = 1,
) -> DataFrame:
    """Fixed-duration overlapping audio windowing — the frame-sampling
    analogue for audio (ASR/audio-LM pipelines chunk long recordings
    into model-window segments). PURE METADATA math: each segment is
    (byte_offset, byte_len) over the payload — the decode/resample step
    stays behind the documented codec seam, and the planner never copies
    blob bytes to compute the segmentation. One explode, zero shuffle.
    """
    win = bytes_per_second * window_seconds
    hop = bytes_per_second * hop_seconds
    n_bytes = F.octet_length(F.col(payload_col)).cast("long")
    n_seg = F.greatest(
        F.lit(1),
        (F.ceil((n_bytes - win) / F.lit(hop)) + 1).cast("long"),
    )
    seg = F.explode(F.sequence(F.lit(0), n_seg - 1)).alias("seg_idx")
    out = df.select(F.col(id_col), n_bytes.alias("n_bytes"), seg)
    off = F.col("seg_idx") * hop
    return out.select(
        id_col, "seg_idx",
        off.cast("long").alias("byte_offset"),
        F.least(F.lit(win).cast("long"), F.col("n_bytes") - off)
        .alias("byte_len"),
    ).where(F.col("byte_len") > 0)
