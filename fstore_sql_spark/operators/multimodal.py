"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed through Arrow-batched ``mapInPandas`` pipelines.

The container has no image/audio codecs, so the decode step is STUBBED
(`decode_image` raises NotImplementedError unless given the deterministic
fake decoder) — but the Spark-side plumbing is real and tested: schema,
partition sizing, UDF signatures, and Arrow batch shapes are exactly what a
production decode/resize/feature pipeline uses.

Scale design: media bytes never pass through the driver; ``mapInPandas``
streams Arrow record batches executor-side.  ``spark.sql.files.
maxPartitionBytes`` (and per-file row-group sizing at write time) bound the
per-task memory for large blobs; feature extraction emits fixed-width
vectors so downstream shuffles are narrow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fstore_sql_spark.queries import load, query

# Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("kind", StringType(), nullable=False),  # image|audio|video
        StructField("payload", BinaryType(), nullable=False),
        StructField("mime", StringType(), nullable=True),
        StructField("width", LongType(), nullable=True),
        StructField("height", LongType(), nullable=True),
        StructField("duration_ms", LongType(), nullable=True),
    ]
)

FEATURE_DIM = 4

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("n_bytes", LongType(), nullable=False),
        StructField("feature", ArrayType(DoubleType()), nullable=False),
    ]
)


def fake_decode(payload: bytes) -> bytes:
    """Deterministic stand-in for a real codec (none in this container):
    identity.  A real deployment swaps in PIL/libav here."""
    return payload


def _feature_vector(payload: bytes) -> list[float]:
    """Deterministic FEATURE_DIM-dim embedding of a blob: md5(payload‖i)
    scaled to [0,1).  Stands in for a CNN/CLIP feature extractor; exactly
    reproducible in SQL, which gives the Pandas-UDF path a true oracle."""
    out = []
    for i in range(FEATURE_DIM):
        h = hashlib.md5(payload + str(i).encode()).hexdigest()
        out.append(int(h[:8], 16) / 4294967296.0)
    return out


def extract_features(media: DataFrame, decoder=fake_decode) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, fixed-width
    feature vectors out.  The real-codec variant only changes ``decoder``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len),
                    "feature": payloads.map(lambda p: _feature_vector(decoder(bytes(p)))),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode is unavailable in this container."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; use "
        "extract_features(media, decoder=...) with a real decoder on a "
        "cluster with PIL/libav available"
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp.
    The decode itself is stubbed; the plumbing (posexplode of the sample
    grid, partition-preserving) is real."""
    n_frames = F.floor(F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast(
        "long"
    )
    grid = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.posexplode(grid).alias("frame_idx", "ts_offset"))
        .select("media_id", "frame_idx", (F.col("ts_offset") * every_ms).alias("ts_ms"))
    )


@query(
    "multimodal_features",
    """
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(('0x' || substr(md5(text || '0'), 1, 8)) AS BIGINT) / 4294967296.0 AS f0,
           CAST(('0x' || substr(md5(text || '1'), 1, 8)) AS BIGINT) / 4294967296.0 AS f1,
           CAST(('0x' || substr(md5(text || '2'), 1, 8)) AS BIGINT) / 4294967296.0 AS f2,
           CAST(('0x' || substr(md5(text || '3'), 1, 8)) AS BIGINT) / 4294967296.0 AS f3
    FROM documents WHERE doc_id < 100
    """,
)
def multimodal_features(spark, sf_dir):
    """The mapInPandas feature-extraction path verified against a SQL
    oracle: document text bytes stand in for media payloads (the container
    has no codecs), the md5-derived feature is bit-reproducible in SQL."""
    media = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            F.col("doc_id").alias("media_id"),
            F.lit("image").alias("kind"),
            F.col("text").cast("binary").alias("payload"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        )
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        *[F.col("feature")[i].alias(f"f{i}") for i in range(FEATURE_DIM)],
    )


@query(
    "multimodal_frame_grid",
    """
    SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(MAX(ts_ms) AS BIGINT) AS last_ts_ms
    FROM (
      SELECT doc_id AS media_id,
             unnest(generate_series(0,
                 greatest((n_chars * 10) // 1000 - 1, 0))) * 1000 AS ts_ms
      FROM documents WHERE doc_id < 50)
    GROUP BY 1
    """,
)
def multimodal_frame_grid(spark, sf_dir):
    """The video frame-sampling plan verified end-to-end: documents stand
    in as media (duration_ms = n_chars×10), ``frame_sample`` expands the
    per-row sample grid with posexplode (partition-preserving, no
    shuffle), and the per-media frame counts have an exact
    generate_series oracle."""
    media = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            F.col("doc_id").alias("media_id"),
            F.lit("video").alias("kind"),
            F.col("text").cast("binary").alias("payload"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        )
    )
    frames = frame_sample(media, every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("ts_ms").cast("long").alias("last_ts_ms"),
    )


AUDIO_WINDOWS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("window_idx", LongType(), nullable=False),
        StructField("start_ms", LongType(), nullable=False),
        StructField("n_window_bytes", LongType(), nullable=False),
        StructField("window_hash", StringType(), nullable=False),
    ]
)


def audio_windows(media: DataFrame, window_ms: int = 100) -> DataFrame:
    """Audio windowing: slice each payload into fixed-duration windows
    (the spectrogram / feature-frame prep step).  The byte mapping assumes
    1 byte/ms (the synthetic fixture's rate); a real deployment computes
    bytes-per-ms from the sample rate in the metadata and swaps the hash
    for an FFT.  Unlike the frame GRID (pure plan expansion), this slices
    real payload bytes Python-side — it exercises the Arrow binary-column
    round trip through mapInPandas."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in AUDIO_WINDOWS_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(math.ceil(len(b) / window_ms)):
                    chunk = b[i * window_ms : (i + 1) * window_ms]
                    out["media_id"].append(mid)
                    out["window_idx"].append(i)
                    out["start_ms"].append(i * window_ms)
                    out["n_window_bytes"].append(len(chunk))
                    out["window_hash"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_WINDOWS_SCHEMA
    )


@query(
    "multimodal_audio_windows",
    """
    SELECT doc_id AS media_id,
           CAST(i AS BIGINT) AS window_idx,
           CAST(i * 100 AS BIGINT) AS start_ms,
           CAST(least(100, n_chars - i * 100) AS BIGINT) AS n_window_bytes,
           md5(substr(text, CAST(i * 100 + 1 AS INT), 100)) AS window_hash
    FROM (
        SELECT doc_id, n_chars, text,
               unnest(range(0, CAST(ceil(n_chars / 100.0) AS BIGINT))) AS i
        FROM documents WHERE doc_id < 50
    )
    """,
)
def multimodal_audio_windows(spark, sf_dir):
    """The audio-windowing path verified end-to-end: document text bytes
    stand in for PCM payloads (ASCII ⇒ byte offsets == char offsets, so
    substr is an exact oracle for the byte slices the Pandas UDF hashes)."""
    media = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            F.col("doc_id").alias("media_id"),
            F.lit("audio").alias("kind"),
            F.col("text").cast("binary").alias("payload"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.col("n_chars").cast("long").alias("duration_ms"),
        )
    )
    return audio_windows(media, window_ms=100)
