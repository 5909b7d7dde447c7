"""Multimodal columns (north star [NS]): opaque binary payloads with
typed metadata, processed via Arrow-batched mapInPandas.

Real multimodal corpora carry image/audio/video as `binary` columns
next to typed metadata. The container has no media codecs, so the
*decode* step is stubbed (`decode_image` raises NotImplementedError;
`fake_decode` is the deterministic stand-in) — but everything Spark-
side is real and tested: the binary column, the schema, the
mapInPandas batch iteration, the partition-preserving shape.

100 TB notes: media bytes NEVER go through a shuffle here — mapInPandas
is a narrow transformation; only extracted features (tiny) flow on.
Batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch;
for multi-MB payloads set it low (e.g. 64) to bound worker memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import scan

FEATURE_SCHEMA = (
    "doc_id long, byte_len long, first_byte long, last_byte long, md5_hex string"
)


def decode_image(payload: bytes):  # pragma: no cover - codec not installed
    """Real decoder stub: plug Pillow/libav here on a cluster with
    codecs. Deliberately unimplemented in this container."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake_decode for deterministic tests"
    )


def fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for decode/feature-extract: byte length,
    first/last byte, md5 — stable across runs and engines."""
    return (
        len(payload),
        payload[0] if payload else -1,
        payload[-1] if payload else -1,
        hashlib.md5(payload).hexdigest(),
    )


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary column in, feature rows out (1:1)."""
    for pdf in batches:
        feats = [fake_decode(b) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "byte_len": [f[0] for f in feats],
                "first_byte": [f[1] for f in feats],
                "last_byte": [f[2] for f in feats],
                "md5_hex": [f[3] for f in feats],
            }
        )


@query(
    "m1_binary_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
           CAST(ascii(substring(text, length(text), 1)) AS BIGINT) AS last_byte,
           md5(text) AS md5_hex
    FROM documents
    """,
)
def m1_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline (m1): text → binary payload column →
    mapInPandas feature extraction. The payload column is genuine
    `binary`; the oracle recomputes the deterministic features from the
    source text (ASCII corpus ⇒ first/last byte = first/last char)."""
    d = scan(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(extract_features, FEATURE_SCHEMA)


@query(
    "m2_binary_meta_join",
    oracle="""
    SELECT d.doc_id, d.lang,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS byte_len,
           CAST(len(e.embedding) AS BIGINT) AS dim
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE octet_length(encode(d.text)) > 200
    """,
)
def m2_binary_meta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal record assembly (m2): binary payload + typed metadata
    + embedding joined into one row; filter on a payload property
    (byte length) without ever shuffling the payload — the filter and
    the projection both happen before the join moves any data."""
    d = scan(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.encode("text", "utf-8").alias("payload")
    )
    e = scan(spark, sf_dir, "embeddings")
    return (
        d.withColumn("byte_len", F.octet_length("payload").cast("bigint"))
        .filter(F.col("byte_len") > 200)
        .drop("payload")  # features extracted; payload never shuffles
        .join(e, F.col("doc_id") == e.vec_id)
        .select("doc_id", "lang", "byte_len", F.size("embedding").cast("bigint").alias("dim"))
    )


FRAME_BYTES = 32
FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = (
    "doc_id long, n_frames long, n_sampled long, first_frame_md5 string"
)


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for m3: treat the payload as consecutive
    FRAME_BYTES-sized frames (the fixed-fps video model), keep every
    FRAME_STRIDE-th frame. Decode stays fake/deterministic; the
    Spark-side batch iteration, 1:1 row mapping and schema are real."""
    for pdf in batches:
        n_frames, n_sampled, first_md5 = [], [], []
        for b in pdf["payload"]:
            frames = [
                b[i : i + FRAME_BYTES] for i in range(0, len(b), FRAME_BYTES)
            ]
            kept = frames[::FRAME_STRIDE]
            n_frames.append(len(frames))
            n_sampled.append(len(kept))
            first_md5.append(
                hashlib.md5(kept[0]).hexdigest() if kept else ""
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_frames": n_frames,
                "n_sampled": n_sampled,
                "first_frame_md5": first_md5,
            }
        )


@query(
    "m3_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
           CAST(ceil(ceil(length(text) / {FRAME_BYTES}.0)
                     / {FRAME_STRIDE}.0) AS BIGINT) AS n_sampled,
           md5(substr(text, 1, {FRAME_BYTES})) AS first_frame_md5
    FROM documents
    """,
)
def m3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling (m3): binary payload → fixed-size
    frame split → stride sampling, via Arrow-batched mapInPandas (the
    video frame-sample plumbing; the oracle recomputes counts/hash from
    the ASCII source arithmetically). Payload bytes never shuffle —
    only the tiny per-doc feature row flows downstream."""
    d = scan(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(sample_frames, FRAME_SCHEMA)
