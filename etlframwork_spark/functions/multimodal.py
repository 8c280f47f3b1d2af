"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio libraries, so the DECODE step is stubbed
(deterministic fake features; a real decoder raises NotImplementedError
behind the ``real_decode`` flag) — but the Spark-side plumbing is real
and tested: binary column schema, typed metadata struct, mapInPandas
batch shapes, and partition-preserving feature extraction. Swapping the
fake for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.registry import query
from ..sources.io import load_table

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("kind", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def as_blob_table(docs: DataFrame) -> DataFrame:
    """Model documents as a multimodal table: payload as opaque binary +
    typed metadata (the schema pattern for image/audio/video columns)."""
    kind = (
        F.when(F.col("lang").isin("en", "de"), "image/png")
        .when(F.col("lang") == "zh", "audio/wav")
        .otherwise("video/mp4")
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, kind: str, real_decode: bool = False) -> np.ndarray:
    """Stub decoder. With ``real_decode`` this is where PIL/librosa/ffmpeg
    would decode the payload; the sandbox has none of them, so a
    deterministic fake derives FEATURE_DIM doubles from the payload bytes
    (sha256-seeded) — stable across runs and engines."""
    if real_decode:
        raise NotImplementedError("no media codecs in this environment; use the deterministic stub")
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4").astype(np.float64)
    return raw / np.float64(2**32)


def extract_features(blobs: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` keeps partitioning intact (map-only, no shuffle) and
    moves payload bytes JVM->Python once per Arrow batch. The per-element
    decode is the pluggable stub above."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dim_bytes = FEATURE_DIM * 4
        for pdf in batches:
            # batch-assembled stub features (round 7, guide §4.2): one
            # sha256 per payload stays (that IS the stub's decode), but the
            # per-row numpy frombuffer/astype/divide calls collapse into a
            # single vectorized pass over the concatenated digests —
            # bit-identical values (same bytes, same single IEEE ops)
            if len(pdf):
                digests = b"".join(
                    hashlib.sha256(p).digest()[:dim_bytes] for p in pdf["payload"]
                )
                feats = (
                    np.frombuffer(digests, dtype="<u4")
                    .reshape(-1, FEATURE_DIM)
                    .astype(np.float64)
                    / np.float64(2**32)
                ).tolist()
            else:
                feats = []
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"].astype("int64"),
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    flat = blobs.select(
        "doc_id",
        "payload",
        F.col("meta.kind").alias("kind"),
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
    )
    return flat.mapInPandas(run, schema=FEATURES_SCHEMA)


@query(
    "multimodal_blob_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CASE WHEN lang IN ('en', 'de') THEN 'image/png'
                WHEN lang = 'zh' THEN 'audio/wav'
                ELSE 'video/mp4' END AS kind,
           source AS origin
    FROM documents
    """,
)
def multimodal_blob_metadata(spark, sf_dir):
    """Binary payload + typed metadata projection (the multimodal schema
    contract); byte lengths verified against DuckDB."""
    blobs = as_blob_table(load_table(spark, sf_dir, "documents"))
    return blobs.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.kind").alias("kind"),
        F.col("meta.origin").alias("origin"),
    )


@query("multimodal_feature_extract")  # rows-only: stub features are Spark-side
def multimodal_feature_extract(spark, sf_dir):
    """mapInPandas decode/feature-extract over binary payloads
    (deterministic stub features; see decode_payload)."""
    blobs = as_blob_table(load_table(spark, sf_dir, "documents"))
    feats = extract_features(blobs)
    return feats.select(
        "doc_id", "n_bytes", "kind", F.round(F.element_at("features", 1), 9).alias("f0")
    ).orderBy("doc_id")
