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
