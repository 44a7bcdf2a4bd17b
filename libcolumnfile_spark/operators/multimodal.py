"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no PIL/ffmpeg in this container — see
fake_decode_image): it produces a deterministic fake so the Spark-side
plumbing — schema, batch iteration, partitioning, UDF signatures — is
real and tested. Swap `_decode_image_bytes` for a real decoder in
production; nothing else changes.

Scale notes: binary payloads never cross a shuffle here — all transforms
are mapInPandas (map-only). At 100 TB of media, partition sizing is
driven by `spark.sql.files.maxPartitionBytes`; metadata-only queries
prune the binary column entirely (columnar formats read just the
metadata struct).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),  # typed metadata
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("sha256", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feat_mean", LongType(), True),  # stubbed "feature"
    ]
)


def _decode_image_bytes(payload: bytes) -> dict:
    """STUB decode: deterministic fake feature extraction.

    A real implementation would PIL-decode / resize / embed here. The
    container has no image libs, so we hash the payload — deterministic,
    cheap, and exercises the same byte-in/features-out shape.
    """
    if payload is None:
        raise NotImplementedError("real decoder not available in this environment")
    digest = hashlib.sha256(payload).hexdigest()
    return {
        "sha256": digest,
        "n_bytes": len(payload),
        "feat_mean": sum(payload[:64]) if payload else 0,
    }


def synthesize_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4  # 128 bytes
        kind = kinds[i % 3]
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind != "audio" else None,
                64 if kind != "audio" else None,
                1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each partition arrives as an iterator of pandas
    batches; payload bytes stay inside the Python worker (no shuffle).
    """

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_image_bytes(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "sha256": [f["sha256"] for f in feats],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "feat_mean": [f["feat_mean"] for f in feats],
                }
            )
            yield out

    return df.mapInPandas(_map, schema=DECODED_SCHEMA)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table DERIVED from the documents fixture: the
    payload is the UTF-8 text bytes (opaque to everything downstream),
    kind/dimensions/duration are pure functions of doc_id / n_chars.
    This keeps the multimodal declared queries oracle-checkable — DuckDB
    can recompute every derivation from the same parquet.

    Scale note: in production this table IS the 100 TB side (payload =
    real encoded media); everything below treats payload as opaque bytes
    and never shuffles it, so the derivation swap is free.
    """
    from libcolumnfile_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    is_visual = F.col("kind").isin("image", "video")
    return (
        docs.select(
            F.col("doc_id").alias("media_id"),
            kind.alias("kind"),
            F.col("text").cast("binary").alias("payload"),
            F.col("n_chars"),
        )
        .select(
            "media_id",
            "kind",
            "payload",
            F.element_at(
                F.create_map(
                    F.lit("image"), F.lit("image/png"),
                    F.lit("audio"), F.lit("audio/wav"),
                    F.lit("video"), F.lit("video/mp4"),
                ),
                F.col("kind"),
            ).alias("mime"),
            F.when(is_visual, (F.col("n_chars") % 64 + 16).cast("int")).alias("width"),
            F.when(is_visual, (F.col("n_chars") % 64 + 16).cast("int")).alias("height"),
            F.when(
                F.col("kind").isin("audio", "video"),
                ((F.col("n_chars") % 5 + 1) * 1000).cast("int"),
            ).alias("duration_ms"),
        )
    )


def frame_sample(df: DataFrame, every_ms: int = 200) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into frame
    timestamps (the decode of actual frames is the stubbed step). Shows
    the explode-on-metadata pattern that never touches payload bytes.
    """
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
        )
    )


# ---------------------------------------------------------------------------
# Declared queries (driver contract). The decode step itself is the stub;
# the Spark-side plumbing (binary column, mapInPandas batch shape, schema,
# metadata-only pruning) is what these queries pin down.
# ---------------------------------------------------------------------------

from libcolumnfile_spark.queries import query  # noqa: E402


@query(
    "q_media_features",
    oracle=(
        "SELECT doc_id AS media_id, "
        "(['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind, "
        "sha256(text) AS sha256, "
        "CAST(length(text) AS BIGINT) AS n_bytes "
        "FROM documents"
    ),
    doc=(
        "Multimodal feature extraction: opaque binary payloads through "
        "Arrow-batched mapInPandas (decode stubbed as sha256+byte stats; "
        "the documents text is ASCII so DuckDB's sha256(varchar) hashes "
        "the identical bytes). Map-only — payloads never shuffle."
    ),
    tags=("multimodal", "udf"),
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = decode_features(media_table(spark, sf_dir))
    return feats.select("media_id", "kind", "sha256", "n_bytes")


@query(
    "q_media_frames",
    oracle=(
        "SELECT doc_id AS media_id, "
        "CAST(unnest(generate_series(0, ((n_chars % 5) + 1) * 1000, 250)) AS INT) "
        "AS frame_ts_ms "
        "FROM documents WHERE doc_id % 3 = 2"
    ),
    doc=(
        "Video frame sampling: explode-on-metadata generates frame "
        "timestamps without touching payload bytes (columnar scan prunes "
        "the binary column entirely — the plan reads only media_id/kind/"
        "duration_ms)."
    ),
    tags=("multimodal",),
)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(media_table(spark, sf_dir), every_ms=250)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("out_w", IntegerType(), True),
        StructField("out_h", IntegerType(), True),
        StructField("sha256", StringType(), True),
    ]
)


def resize_plumbing(df: DataFrame, max_side: int = 32) -> DataFrame:
    """Image-resize plumbing over mapInPandas: computes the aspect-
    preserving output box (the deterministic part) and passes the
    payload through the stubbed decoder (the real resample would happen
    where sha256 is computed — PIL isn't in this container). Visual
    rows only; payload bytes never shuffle.
    """

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].astype("float64")
            h = pdf["height"].astype("float64")
            scale = (max_side / w.combine(h, max)).clip(upper=1.0)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": pdf["width"].values,
                    "height": pdf["height"].values,
                    # floor(dim * scale) with scale capped at 1 (never
                    # upscale) — the standard thumbnail-box arithmetic
                    "out_w": (w * scale).astype("int32").values,
                    "out_h": (h * scale).astype("int32").values,
                    "sha256": [
                        _decode_image_bytes(p)["sha256"] for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return df.filter(F.col("kind").isin("image", "video")).mapInPandas(
        _map, schema=RESIZED_SCHEMA
    )


@query(
    "q_media_resize",
    # width == height == (n_chars % 64 + 16) in the derived media table;
    # scale = min(1, 32/side), output = floor(side * scale) — exact
    # integer/double arithmetic both engines
    oracle=(
        "SELECT doc_id AS media_id, "
        "CAST(n_chars % 64 + 16 AS INT) AS width, "
        "CAST(n_chars % 64 + 16 AS INT) AS height, "
        "CAST(floor((n_chars % 64 + 16) * least(1.0, 32.0 / (n_chars % 64 + 16))) AS INT) AS out_w, "
        "CAST(floor((n_chars % 64 + 16) * least(1.0, 32.0 / (n_chars % 64 + 16))) AS INT) AS out_h, "
        "sha256(text) AS sha256 "
        "FROM documents WHERE doc_id % 3 <> 1"
    ),
    doc=(
        "Image/video resize plumbing: aspect-preserving thumbnail-box "
        "dims + stubbed resample through mapInPandas (payload stays in "
        "the Python worker, map-only). The deterministic box arithmetic "
        "is what the oracle pins; the pixel resample is the swappable "
        "stub."
    ),
    tags=("multimodal", "udf"),
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_plumbing(media_table(spark, sf_dir))
