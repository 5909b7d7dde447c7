"""Multimodal columns (north star [NS]): opaque binary payloads with
typed metadata, processed via Arrow-batched mapInPandas.

Real multimodal corpora carry image/audio/video as `binary` columns
next to typed metadata. `decode_image` REALLY decodes the two
codec-less container formats (uncompressed 24-bit BMP including row
padding / bottom-up rows / BGR order, and binary PPM "P6") with a
pure-Python header+pixel parse; compressed formats (JPEG/PNG/video)
still raise NotImplementedError — plug Pillow/libav on a cluster that
has them. `fake_decode` remains the format-agnostic deterministic
stand-in for plumbing tests.

100 TB notes: media bytes NEVER go through a shuffle here — mapInPandas
is a narrow transformation; only extracted features (tiny) flow on.
Batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch;
for multi-MB payloads set it low (e.g. 64) to bound worker memory.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import scan

FEATURE_SCHEMA = (
    "doc_id long, byte_len long, first_byte long, last_byte long, md5_hex string"
)


def encode_bmp(width: int, height: int, bgr: tuple[int, int, int]) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (solid color): 14-byte
    file header + 40-byte BITMAPINFOHEADER + bottom-up, 4-byte-padded
    BGR rows — the real on-disk layout, so the decoder is exercised
    against genuine format quirks."""
    row = bytes(bgr) * width
    row += b"\x00" * ((-len(row)) % 4)  # rows pad to 4-byte boundary
    pixels = row * height
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    return header + dib + pixels


def encode_ppm(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Binary PPM (P6) writer (solid color)."""
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(rgb) * (width * height)


def decode_image(payload: bytes) -> tuple[str, int, int, float, float, float]:
    """Decode an image payload to (fmt, width, height, mean_r, mean_g,
    mean_b). Real parse for BMP (24-bit uncompressed: honors the pixel
    data offset, 4-byte row stride, bottom-up row order, BGR channel
    order) and PPM P6. Anything else needs a codec library this
    container does not ship."""
    if payload[:2] == b"BM":
        off = struct.unpack_from("<I", payload, 10)[0]
        width, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or comp != 0:
            raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
        height = abs(height)  # negative height = top-down; means agree
        stride = (3 * width + 3) // 4 * 4
        # Vectorized: view the pixel block as (height, stride) and slice
        # off the per-row 4-byte padding — ~100× over a per-pixel Python
        # loop; int64 accumulators are exact (255·w·h ≪ 2^63).
        px = (
            np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=off)
            .reshape(height, stride)[:, : 3 * width]
            .reshape(-1, 3)
        )
        sums = px.sum(axis=0, dtype=np.int64)  # B, G, R
        n = width * height
        return (
            "bmp", width, height,
            float(sums[2] / n), float(sums[1] / n), float(sums[0] / n),
        )
    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws>
        parts = payload.split(maxsplit=4)
        width, height, maxval = int(parts[1]), int(parts[2]), int(parts[3])
        if maxval != 255:
            raise NotImplementedError(f"PPM maxval={maxval}")
        body_off = len(payload) - 3 * width * height
        n = width * height
        px = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=body_off
        ).reshape(-1, 3)
        sums = px.sum(axis=0, dtype=np.int64)  # R, G, B
        return (
            "ppm", width, height,
            float(sums[0] / n), float(sums[1] / n), float(sums[2] / n),
        )
    raise NotImplementedError(
        "only BMP/PPM decode ships in this container; plug Pillow/libav "
        "for compressed formats"
    )


def fake_decode(payload: bytes | None) -> tuple:
    """Deterministic stand-in for decode/feature-extract: byte length,
    first/last byte, md5 — stable across runs and engines. A NULL
    payload (failed fetch / deleted source — a daily state in a real
    corpus) yields all-NULL features, matching SQL NULL propagation
    (encode(NULL) → NULL); it must never kill the task."""
    if payload is None:
        return (None, None, None, None)
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
           CASE WHEN octet_length(encode(text)) = 0 THEN -1
                ELSE CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS BIGINT)
           END AS first_byte,
           CASE WHEN octet_length(encode(text)) = 0 THEN -1
                ELSE CAST(('0x' || substr(hex(encode(text)),
                                          octet_length(encode(text)) * 2 - 1, 2)) AS BIGINT)
           END AS last_byte,
           md5(text) AS md5_hex
    FROM documents
    """,
)
def m1_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline (m1): text → binary payload column →
    mapInPandas feature extraction. The payload column is genuine
    `binary`; the oracle recomputes the deterministic features from the
    source text BYTE-exactly for any unicode content: first/last byte
    via hex(encode(text)) string arithmetic (DuckDB has no blob
    slicing; ascii(substring(...)) would return the CODEPOINT of the
    first/last char, which diverges from the payload byte on any
    multibyte text — caught by the r8 unicode-amplifier sweep)."""
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
            if b is None:  # NULL payload → NULL features (SQL propagation)
                n_frames.append(None)
                n_sampled.append(None)
                first_md5.append(None)
                continue
            frames = [
                b[i : i + FRAME_BYTES] for i in range(0, len(b), FRAME_BYTES)
            ]
            kept = frames[::FRAME_STRIDE]
            n_frames.append(len(frames))
            n_sampled.append(len(kept))
            # Fingerprint the frame via md5 of its UPPERCASE HEX (not the
            # raw bytes): a frame boundary can split a multibyte UTF-8
            # char, and DuckDB SQL cannot md5 an arbitrary byte slice
            # (no blob slicing, md5(BLOB) unsupported) — hashing the hex
            # keeps the oracle byte-exact on any unicode payload.
            first_md5.append(
                hashlib.md5(kept[0].hex().upper().encode()).hexdigest()
                if kept
                else ""
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
           CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT)
               AS n_frames,
           CAST(ceil(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0)
                     / {FRAME_STRIDE}.0) AS BIGINT) AS n_sampled,
           CASE WHEN octet_length(encode(text)) = 0 THEN ''
                ELSE md5(substr(hex(encode(text)), 1, {FRAME_BYTES * 2}))
           END AS first_frame_md5
    FROM documents
    """,
)
def m3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling (m3): binary payload → fixed-size
    frame split → stride sampling, via Arrow-batched mapInPandas (the
    video frame-sample plumbing). BYTE-exact for any unicode source:
    frame counts come from octet_length (length(text) counts
    CODEPOINTS and undercounts frames on multibyte text), and the
    first-frame fingerprint hashes the frame's uppercase hex on both
    sides because a 32-byte frame boundary can split a UTF-8 char —
    the invalid-UTF-8 slice is un-hashable in DuckDB SQL directly.
    Payload bytes never shuffle — only the tiny per-doc feature row
    flows downstream."""
    d = scan(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(sample_frames, FRAME_SCHEMA)


DECODE_SCHEMA = (
    "doc_id long, fmt string, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def _roundtrip_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for m4: synthesize a real BMP (even doc_id)
    or PPM (odd) payload per row, then run the REAL decoder on the
    bytes. The decoder sees only the payload — width/height/means come
    back out of the header+pixel parse, not the generation formula."""
    for pdf in batches:
        rows = {k: [] for k in
                ("doc_id", "fmt", "width", "height", "mean_r", "mean_g", "mean_b")}
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            w, h = doc_id % 8 + 1, doc_id % 5 + 1
            r, g, b = doc_id % 256, (doc_id + 31) % 256, (doc_id + 62) % 256
            payload = (
                encode_bmp(w, h, (b, g, r))
                if doc_id % 2 == 0
                else encode_ppm(w, h, (r, g, b))
            )
            fmt, dw, dh, mr, mg, mb = decode_image(payload)
            rows["doc_id"].append(doc_id)
            rows["fmt"].append(fmt)
            rows["width"].append(dw)
            rows["height"].append(dh)
            rows["mean_r"].append(mr)
            rows["mean_g"].append(mg)
            rows["mean_b"].append(mb)
        yield pd.DataFrame(rows)


@query(
    "m4_image_decode",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS fmt,
           CAST(doc_id % 8 + 1 AS INT) AS width,
           CAST(doc_id % 5 + 1 AS INT) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id + 31) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id + 62) % 256 AS DOUBLE) AS mean_b
    FROM documents
    """,
)
def m4_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode (m4): binary image payloads (genuine BMP and
    PPM byte layouts, incl. BMP row padding / bottom-up rows / BGR
    order) parsed by the pure-Python decoder inside Arrow-batched
    mapInPandas. Solid-color fills make the expected means closed-form
    for the oracle; the decoder itself works purely off the bytes —
    tests/test_operators.py additionally pins non-uniform-pixel decode
    (padding bytes must not leak into the means)."""
    d = scan(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(_roundtrip_decode, DECODE_SCHEMA)


def encode_wav(
    sample_rate: int, samples: list[int], pad_chunk: bool = True
) -> bytes:
    """Minimal PCM WAV writer (mono, 16-bit LE) with the real RIFF
    chunk layout; optionally inserts a LIST chunk between fmt and data
    so decoders must WALK chunks, not assume fixed offsets."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if pad_chunk:
        info = b"INFOISFT" + struct.pack("<I", 4) + b"eng\x00"
        chunks += b"LIST" + struct.pack("<I", len(info)) + info
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_audio(payload: bytes) -> tuple[int, int, int, int, float]:
    """Decode a PCM WAV payload to (sample_rate, n_channels, n_samples,
    peak_abs, mean). Real RIFF chunk walk: chunks appear in any order
    with arbitrary extras between fmt and data (word-aligned sizes);
    only uncompressed 16-bit PCM is supported — compressed audio needs
    a codec library this container does not ship."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    rate = channels = bits = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format={audio_fmt} bits={bits}: PCM-16 only"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise NotImplementedError("WAV missing fmt or data chunk")
    n = len(data) // 2
    # Vectorized sample stats; widen to int64 BEFORE abs (|int16 min|
    # overflows int16) and before the exact integer sum.
    samples = np.frombuffer(data, dtype="<i2", count=n).astype(np.int64)
    peak = int(np.abs(samples).max()) if n else 0
    mean = float(samples.sum() / n) if n else 0.0
    return (rate, channels, n // channels, peak, mean)


AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_samples long, "
    "peak int, mean double"
)


def _audio_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for m5: synthesize a real WAV payload per
    row (constant amplitude, varying rate/length, plus a LIST chunk so
    the walk is exercised), then run the REAL chunk-walking decoder."""
    for pdf in batches:
        rows = {k: [] for k in
                ("doc_id", "sample_rate", "n_channels", "n_samples",
                 "peak", "mean")}
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            rate = 8000 + (doc_id % 4) * 4000
            n = doc_id % 100 + 1
            amp = doc_id % 1001 - 500  # [-500, 500]
            payload = encode_wav(rate, [amp] * n)
            r, ch, ns, peak, mean = decode_audio(payload)
            rows["doc_id"].append(doc_id)
            rows["sample_rate"].append(r)
            rows["n_channels"].append(ch)
            rows["n_samples"].append(ns)
            rows["peak"].append(peak)
            rows["mean"].append(mean)
        yield pd.DataFrame(rows)


@query(
    "m5_audio_decode",
    oracle="""
    SELECT doc_id,
           CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(doc_id % 100 + 1 AS BIGINT) AS n_samples,
           CAST(abs(doc_id % 1001 - 500) AS INT) AS peak,
           CAST(doc_id % 1001 - 500 AS DOUBLE) AS mean
    FROM documents
    """,
)
def m5_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode (m5): PCM WAV payloads with genuine RIFF
    layout (fmt/LIST/data chunk walk, word alignment, 16-bit LE
    samples) parsed by the pure-Python decoder inside Arrow-batched
    mapInPandas — the audio member of the multimodal family (m4 =
    image). Constant-amplitude fills make rate/length/peak/mean
    closed-form for the oracle; the decoder works purely off the
    bytes."""
    d = scan(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(_audio_roundtrip, AUDIO_SCHEMA)


@query(
    "m6_binary_dedup",
    oracle="""
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY md5(lower(trim(text))))
             AS canonical_id,
           (doc_id <> min(doc_id) OVER (
               PARTITION BY md5(lower(trim(text)))))
             AS is_dup,
           CAST(octet_length(encode(lower(trim(text)))) AS BIGINT)
             AS byte_len
    FROM documents
    """,
)
def m6_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload dedup (m6): content-digest dedup of the BINARY
    column itself — the blob-store dedup stage of a multimodal
    pipeline (same image uploaded twice, one stored copy). Payload
    here = normalized-text bytes (the synthetic stand-in the whole
    m-series uses); canonical = min doc_id per md5(payload), exactly
    j1/j15's policy lifted to binary.

    100 TB notes: the digest is computed SCAN-SIDE, so the one
    exchange carries (doc_id, 16-byte digest, length) — the payload
    bytes (the petabytes in this pipeline) never move; the window
    over the digest is j15's shape. This ordering — hash where the
    data lives, shuffle only fingerprints — is the entire economics
    of blob dedup at scale."""
    d = scan(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.lower(F.trim("text")), "utf-8").alias("payload")
    )
    fp = d.select(
        "doc_id",
        F.md5("payload").alias("digest"),
        F.octet_length("payload").cast("bigint").alias("byte_len"),
    )
    w = Window.partitionBy("digest")
    return fp.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
        "byte_len",
    )


def _mixed_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for m7: synthesize a MIXED-modality feed —
    BMP / PPM / WAV / raw-text bytes by doc_id — emitting only
    (doc_id, payload); the routing happens OUTSIDE, natively."""
    for pdf in batches:
        ids, payloads = [], []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            m = doc_id % 4
            if m == 0:
                p = encode_bmp(2, 2, (doc_id % 256,) * 3)
            elif m == 1:
                p = encode_ppm(2, 2, (doc_id % 256,) * 3)
            elif m == 2:
                p = encode_wav(8000, [doc_id % 100, -(doc_id % 100)])
            else:
                p = f"plain text payload {doc_id}".encode()
            ids.append(doc_id)
            payloads.append(p)
        yield pd.DataFrame({"doc_id": ids, "payload": payloads})


@query(
    "m7_modality_router",
    oracle="""
    SELECT CASE doc_id % 4 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                           WHEN 2 THEN 'wav' ELSE 'unknown' END
             AS modality,
           COUNT(*) AS n,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents GROUP BY 1
    """,
)
def m7_modality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality routing (m7): a mixed binary feed (images, audio,
    junk — the reality of a crawled blob bucket) classified by MAGIC
    BYTES into per-modality streams that feed m4/m5's decoders or the
    quarantine. The routing predicate is NATIVE — `left(payload, n)`
    prefix compares in codegen over the binary column — so the
    petabyte never crosses into Python just to be sorted into lanes;
    only rows already routed to a decoder pay the UDF boundary.

    Parity: payload synthesis is doc_id-deterministic (m4's policy);
    the oracle derives the expected routing from the same arithmetic
    — if the router misclassified a single real header, counts would
    split and the hash would catch it.

    100 TB notes: routing is a map-side CASE + |modalities|-key
    partial agg; the downstream per-modality pipelines each read
    their lane via the same pushed predicate — one classification
    pass, no re-sniffing per consumer."""
    d = scan(spark, sf_dir, "documents").select("doc_id")
    feed = d.mapInPandas(_mixed_payloads, "doc_id long, payload binary")
    modality = (
        F.when(F.expr("left(payload, 2)") == F.lit(b"BM"), "bmp")
        .when(F.expr("left(payload, 2)") == F.lit(b"P6"), "ppm")
        .when(F.expr("left(payload, 4)") == F.lit(b"RIFF"), "wav")
        .otherwise("unknown")
    )
    return feed.groupBy(modality.alias("modality")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )
