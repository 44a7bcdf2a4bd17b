"""Multimodal columns: image/audio/video as binary columns with typed
metadata, processed via Arrow-batched mapInPandas.

The decode step is REAL for PNG, binary netpbm (PPM/PGM), and WAV —
dependency-free codecs in operators/media_codec.py (stdlib zlib/wave +
numpy). q_media_decode encodes genuine PNG/PPM/WAV payloads from the
documents fixture, decodes them back, and value-oracles the recovered
dimensions / channel counts / pixel means / sample rates / RMS against
DuckDB recomputing the same derivations. Only formats that need a
native codec (JPEG, MP4/H.264) remain stubbed behind the same
interface (decode_image raises NotImplementedError for JPEG).

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
    DoubleType,
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


# ---------------------------------------------------------------------------
# REAL encode/decode (media_codec.py): PNG / PPM / WAV end-to-end
# ---------------------------------------------------------------------------

ENCODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

REAL_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("fmt", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("pixel_mean", DoubleType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def encode_media(df: DataFrame) -> DataFrame:
    """Build REAL encoded payloads from the metadata columns of
    media_table: constant-color PNG (even media_id) / PPM (odd) images at
    the metadata dimensions, constant-amplitude PCM16 WAV at the metadata
    duration. Video keeps the opaque fake payload (no stdlib MP4 codec).
    Deterministic per media_id, so every decoded property is a pure
    function of (doc_id, n_chars) — SQL-recomputable by the oracle.
    """
    import numpy as np

    from libcolumnfile_spark.operators import media_codec as mc

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, kind, w, h, dur, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["width"], pdf["height"],
                pdf["duration_ms"], pdf["payload"],
            ):
                if kind == "image":
                    px = np.full((int(h), int(w), 3), int(mid) % 256, dtype=np.uint8)
                    payloads.append(
                        mc.encode_png(px) if mid % 2 == 0 else mc.encode_ppm(px)
                    )
                elif kind == "audio":
                    amp = int(mid) % 1000 + 1
                    frames = int(dur) * 8  # 8000 Hz
                    payloads.append(
                        mc.encode_wav(np.full(frames, amp, dtype=np.int16), 8000)
                    )
                else:  # video: opaque fake bytes (decode stays stubbed)
                    payloads.append(bytes(payload) if payload is not None else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload": payloads,
                }
            )

    return df.mapInPandas(_map, schema=ENCODED_SCHEMA)


def encoded_media_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached encoded-media table (parquet under the shared cache root),
    keyed by sf_dir — the same one-time-conversion pattern as the
    csv/json/orc fixtures (sources/stock.py:_converted). The operators
    under benchmark are DECODE/RESIZE; building the encoded payloads is
    fixture prep (in production the encoded media IS the input), so it
    runs once and every query invocation reads the parquet."""
    from libcolumnfile_spark.cache import cache_has, cache_path
    from libcolumnfile_spark.session import default_parallelism
    from libcolumnfile_spark.tables import spread

    # The fixture is byte-small (5k compressed payloads plan ~2 scan
    # splits under the bytes/openCost formula) but decode/resize cost is
    # per-ROW CPU — served as a 2-split table the codec kernels ran on
    # 2 tasks (measured 0.29 s -> 0.77 s when the cached fixture
    # landed). Write it pre-partitioned at core width so every read
    # plans a natively parallel scan with NO runtime exchange; the
    # layout is part of the fixture identity (dir name), so a coarse
    # fixture from an older build regenerates rather than being reused.
    # At real scale encoded media is the INPUT (many files >= cores) and
    # the spread() guard below is a no-op either way.
    n = default_parallelism()
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    leaf = f"media_encoded-p{n}"
    path = cache_path("stockcache", key, leaf)
    if not cache_has("stockcache", key, leaf, "_SUCCESS"):
        encode_media(media_table(spark, sf_dir)).repartition(n).write.mode(
            "overwrite"
        ).parquet(path)
    return spread(spark.read.parquet(path))


def decode_media(df: DataFrame) -> DataFrame:
    """REAL decode over encoded payloads: sniffs PNG/PPM/WAV and parses
    pixels/samples with media_codec; rows whose format needs a native
    codec surface fmt='unsupported' with NULL properties (honest stub
    boundary instead of fake numbers)."""
    from libcolumnfile_spark.operators import media_codec as mc

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                rec = {"media_id": mid, "kind": kind, "fmt": None,
                       "width": None, "height": None, "channels": None,
                       "pixel_mean": None, "sample_rate": None,
                       "duration_ms": None, "rms": None}
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    b = bytes(payload)
                    if b[:4] == b"RIFF":
                        d = mc.decode_wav(b)
                        rec.update(fmt=d["fmt"], channels=d["channels"],
                                   sample_rate=d["sample_rate"],
                                   duration_ms=d["duration_ms"], rms=d["rms"])
                    else:
                        d = mc.decode_image(b)
                        rec.update(fmt=d["fmt"], width=d["width"], height=d["height"],
                                   channels=d["channels"], pixel_mean=d["pixel_mean"])
                except Exception:
                    rec["fmt"] = "unsupported"
                rows.append(rec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(_map, schema=REAL_DECODED_SCHEMA)


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
        "CAST(floor((n_chars % 64 + 16) * least(CAST(1.0 AS DOUBLE), CAST(32.0 AS DOUBLE) / (n_chars % 64 + 16))) AS INT) AS out_w, "
        "CAST(floor((n_chars % 64 + 16) * least(CAST(1.0 AS DOUBLE), CAST(32.0 AS DOUBLE) / (n_chars % 64 + 16))) AS INT) AS out_h, "
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


@query(
    "q_media_decode",
    # Every decoded property is a pure function of (doc_id, n_chars):
    # the Spark side ENCODES real PNG/PPM/WAV bytes then DECODES them
    # with media_codec; the oracle recomputes what a correct decode must
    # recover. BIGINT for the nullable integer properties so both
    # engines' pandas fetch paths materialize identically.
    oracle=(
        "SELECT doc_id AS media_id, "
        "(['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind, "
        "CASE WHEN doc_id % 3 = 0 THEN (CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'ppm' END) "
        "     WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'unsupported' END AS fmt, "
        "CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars % 64 + 16 AS BIGINT) END AS width, "
        "CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars % 64 + 16 AS BIGINT) END AS height, "
        "CASE WHEN doc_id % 3 = 0 THEN CAST(3 AS BIGINT) "
        "     WHEN doc_id % 3 = 1 THEN CAST(1 AS BIGINT) END AS channels, "
        "CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 256 AS DOUBLE) END AS pixel_mean, "
        "CASE WHEN doc_id % 3 = 1 THEN CAST(8000 AS BIGINT) END AS sample_rate, "
        "CASE WHEN doc_id % 3 = 1 THEN CAST((n_chars % 5 + 1) * 1000 AS BIGINT) END AS duration_ms, "
        "CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 1000 + 1 AS DOUBLE) END AS rms "
        "FROM documents"
    ),
    doc=(
        "REAL multimodal decode round-trip: encode genuine PNG/PPM "
        "images and PCM16 WAV audio from fixture-derived metadata, "
        "decode them back with the dependency-free codecs "
        "(media_codec.py: zlib+numpy PNG incl. all 5 row filters, "
        "netpbm, RIFF/WAVE), and verify the recovered dimensions, "
        "channel counts, exact pixel means, sample rates and RMS. "
        "Video (no stdlib MP4 codec) honestly surfaces "
        "fmt='unsupported' with NULL properties. Map-only end to end; "
        "payload bytes never shuffle."
    ),
    tags=("multimodal", "udf"),
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media(encoded_media_fixture(spark, sf_dir))


RESIZE_REAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("out_w", LongType(), True),
        StructField("out_h", LongType(), True),
        StructField("resized_mean", DoubleType(), True),
    ]
)


def resize_media(df: DataFrame, max_side: int = 32) -> DataFrame:
    """REAL image resize: decode pixels, nearest-neighbor resample to the
    aspect-preserving box, emit the ACTUAL resized array's shape and
    pixel mean (not metadata arithmetic)."""
    import numpy as np

    from libcolumnfile_spark.operators import media_codec as mc

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    d = mc.decode_image(bytes(payload))
                    w, h = d["width"], d["height"]
                    # decode_image returns stats; the resample needs the
                    # full pixel array — parse via the low-level path
                    px = _pixels_of(bytes(payload))
                    scale = min(1.0, max_side / max(w, h))
                    ow, oh = int(w * scale), int(h * scale)
                    r = mc.resize_nearest(px, ow, oh)
                    rows.append(
                        {"media_id": mid, "width": w, "height": h,
                         "out_w": r.shape[1], "out_h": r.shape[0],
                         "resized_mean": float(np.asarray(r, dtype=np.float64).mean())}
                    )
                except Exception:
                    rows.append({"media_id": mid, "width": None, "height": None,
                                 "out_w": None, "out_h": None, "resized_mean": None})
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "image").mapInPandas(_map, schema=RESIZE_REAL_SCHEMA)


def _pixels_of(b: bytes):
    """Decode the full pixel array (h, w, ch) from PNG or netpbm bytes."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from libcolumnfile_spark.operators import media_codec as mc

    if b[:8] == mc.PNG_MAGIC:
        pos = 8
        idat = b""
        while pos + 8 <= len(b):
            (length,) = _struct.unpack(">I", b[pos : pos + 4])
            tag = b[pos + 4 : pos + 8]
            body = b[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                w, h, depth, ctype, _, _, _ = _struct.unpack(">IIBBBBB", body)
            elif tag == b"IDAT":
                idat += body
        ch = 1 if ctype == 0 else 3
        flat = mc._unfilter(_zlib.decompress(idat), h, w, ch)
        return flat.reshape(h, w, ch) if ch == 3 else flat.reshape(h, w)
    d = mc.decode_ppm(b)
    w, h, ch = d["width"], d["height"], d["channels"]
    header_len = len(b) - w * h * ch
    px = np.frombuffer(b, dtype=np.uint8, offset=header_len)
    return px.reshape(h, w, ch) if ch == 3 else px.reshape(h, w)


@query(
    "q_media_resize_real",
    # constant-color source image => the REAL resample must preserve the
    # mean exactly; box arithmetic mirrors resize_media's int(w*scale)
    oracle=(
        "SELECT doc_id AS media_id, "
        "CAST(n_chars % 64 + 16 AS BIGINT) AS width, "
        "CAST(n_chars % 64 + 16 AS BIGINT) AS height, "
        "CAST(floor((n_chars % 64 + 16) * least(CAST(1.0 AS DOUBLE), CAST(32.0 AS DOUBLE) / (n_chars % 64 + 16))) AS BIGINT) AS out_w, "
        "CAST(floor((n_chars % 64 + 16) * least(CAST(1.0 AS DOUBLE), CAST(32.0 AS DOUBLE) / (n_chars % 64 + 16))) AS BIGINT) AS out_h, "
        "CAST(doc_id % 256 AS DOUBLE) AS resized_mean "
        "FROM documents WHERE doc_id % 3 = 0"
    ),
    doc=(
        "REAL image resize: decode PNG/PPM pixel arrays, nearest-"
        "neighbor resample to the <=32px aspect box (numpy index "
        "gather), report the resized array's actual shape and pixel "
        "mean. The oracle pins both the box arithmetic and that the "
        "resample preserved the (constant) pixel distribution."
    ),
    tags=("multimodal", "udf"),
)
def q_media_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_media(encoded_media_fixture(spark, sf_dir))
