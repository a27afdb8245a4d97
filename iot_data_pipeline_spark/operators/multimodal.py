"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata (north star).

The decode step itself (JPEG/WAV/MP4 parsing) needs codec libraries that are
not in this environment, so it is STUBBED behind ``decode_media`` — but all
Spark-side plumbing is real and tested: the binary column type, the typed
metadata struct, Arrow batch shape through ``mapInPandas``, partition-size
control for large blobs, and deterministic fake feature extraction standing
in for a real model forward pass.

At 100 TB of media: blobs ride in parquet binary columns (or references to
object storage resolved inside mapInPandas), ``spark.sql.files.
maxPartitionBytes`` bounds executor memory per task, and feature extraction
is an Arrow-batched mapInPandas so the codec/model amortizes per batch, not
per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_data_pipeline_spark.operators._util import table


def decode_media(blob: bytes, media_type: str):
    """Decode a media blob into frames/samples. STUB: real decode requires
    codec libraries (PIL/ffmpeg/soundfile) not present in this container;
    the engine's contract is the surrounding plumbing, which is real."""
    raise NotImplementedError(
        "media decode requires codec libraries not available in this build; "
        "plug a decoder in here (signature: bytes, media_type -> np.ndarray)"
    )


def _media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-cast as a media table: binary payload + typed metadata
    struct. Stands in for (image_bytes, {width, height, format}) rows."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("lang").alias("container"),
            F.col("source").alias("origin"),
            F.col("n_chars").cast("long").alias("declared_size"),
        ).alias("meta"),
    )


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata scan: byte length, magic-prefix hex, declared
    vs actual size check — all JVM-side expressions on the binary type."""
    m = _media_frame(spark, sf_dir)
    return m.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes"),
        F.hex(F.substring("payload", 1, 8)).alias("magic_hex"),
        F.col("meta.container").alias("container"),
        F.col("meta.origin").alias("origin"),
        (F.octet_length("payload") == F.col("meta.declared_size")).alias(
            "size_matches"
        ),
    )


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched mapInPandas.

    The "model" is a deterministic fake (byte-histogram moments → 4-dim
    vector) so the full path — binary column → Arrow batch → per-batch
    numpy → array<double> feature column — is exercised and verifiable
    without codec libs. Swap ``fake_features`` for a real decode+forward
    (via ``decode_media``) in production."""
    m = _media_frame(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for blob in pdf["payload"]:
                b = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.float64)
                feats.append(
                    [
                        float(len(b)),
                        float(b.mean()) if len(b) else 0.0,
                        float(b.min()) if len(b) else 0.0,
                        float(b.max()) if len(b) else 0.0,
                    ]
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    out = m.mapInPandas(extract, "media_id LONG, feature ARRAY<DOUBLE>")
    return out.select(
        "media_id",
        F.size("feature").alias("feat_dim"),
        F.round(F.element_at("feature", 1), 4).alias("f_len"),
        F.round(F.element_at("feature", 2), 4).alias("f_mean"),
        F.round(F.element_at("feature", 3), 4).alias("f_min"),
        F.round(F.element_at("feature", 4), 4).alias("f_max"),
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: treat each payload as a fake "video" and cut
    fixed-stride byte windows ("frames") — 1→N expansion of binary columns
    with JVM expressions (the real variant swaps the byte slice for a
    decoded frame tensor)."""
    m = _media_frame(spark, sf_dir)
    stride, frame_len, max_frames = 64, 16, 4
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.floor((F.octet_length("payload") - frame_len) / stride).cast("int"),
            F.lit(max_frames - 1),
        ),
    )
    return (
        m.where(F.octet_length("payload") >= frame_len)
        .select("media_id", F.explode(idx).alias("frame_no"), "payload")
        .select(
            "media_id",
            "frame_no",
            F.hex(
                F.substring(
                    F.col("payload"), F.col("frame_no") * stride + 1, frame_len
                )
            ).alias("frame_hex"),
        )
    )


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_feature_extract": mm_feature_extract,
    "mm_frame_sample": mm_frame_sample,
}

# Oracle note: document text is pure ASCII (verified), so byte semantics on
# the Spark binary side equal char semantics on the DuckDB varchar side —
# DuckDB lacks blob substring/byte accessors, varchar is the portable route.
ORACLES = {
    "mm_binary_meta": (
        "SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,"
        " hex(encode(substring(text, 1, 8))) AS magic_hex,"
        " lang AS container, source AS origin,"
        " octet_length(encode(text)) = n_chars AS size_matches"
        " FROM documents"
    ),
    "mm_feature_extract": (
        "WITH u AS (SELECT doc_id AS media_id, length(text) AS n,"
        "        unnest(list_transform(generate_series(1, length(text)),"
        "               i -> unicode(text[i]))) AS byte_val"
        "       FROM documents)"
        " SELECT media_id, 4 AS feat_dim,"
        " ROUND(CAST(MAX(n) AS DOUBLE), 4) AS f_len,"
        " ROUND(SUM(CAST(byte_val AS DOUBLE)) / MAX(n), 4) AS f_mean,"
        " ROUND(CAST(MIN(byte_val) AS DOUBLE), 4) AS f_min,"
        " ROUND(CAST(MAX(byte_val) AS DOUBLE), 4) AS f_max"
        " FROM u GROUP BY media_id"
    ),
    "mm_frame_sample": (
        "WITH f AS (SELECT doc_id AS media_id, text,"
        "        unnest(range(0, LEAST(CAST(FLOOR((length(text) - 16)"
        "          / 64.0) AS BIGINT), 3) + 1)) AS frame_no"
        "       FROM documents WHERE length(text) >= 16)"
        " SELECT media_id, frame_no,"
        " hex(encode(substring(text, CAST(frame_no * 64 + 1 AS INTEGER), 16)))"
        "   AS frame_hex FROM f"
    ),
}
