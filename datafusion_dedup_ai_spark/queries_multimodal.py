"""Multimodal query pack: binary payload stats and frame sampling are
oracle-gated (deterministic derivations); the mapInPandas feature extractor is
rows-only (its correctness is pinned in tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.operators import multimodal as M
from datafusion_dedup_ai_spark.registry import register
from datafusion_dedup_ai_spark.sources.readers import load_table

_SQL_MEDIA_TYPE = (
    "(CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END)"
)


@register(
    "media_payload_stats",
    f"""
    SELECT doc_id,
           {_SQL_MEDIA_TYPE} AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(n_chars % 7 + 1 AS BIGINT) AS n_frames
    FROM documents
    """,
)
def q_media_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary handling: payload byte length + content hash + typed
    metadata, computed on the binary column itself (md5 over utf8 bytes ==
    DuckDB md5 of the text)."""
    media = M.media_table(load_table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        "n_frames",
    )


@register(
    "media_frame_samples",
    f"""
    WITH video AS (
        SELECT doc_id,
               CAST(n_chars % 7 + 1 AS BIGINT) AS n_frames,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents
        WHERE {_SQL_MEDIA_TYPE} = 'video'
    ), frames AS (
        SELECT doc_id, n_frames, n_bytes,
               unnest(range(0, n_frames)) AS frame_idx
        FROM video
    )
    SELECT doc_id, n_frames, frame_idx,
           CAST(frame_idx * CAST(floor(n_bytes / n_frames) AS BIGINT) AS BIGINT) AS byte_offset
    FROM frames
    """,
)
def q_media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evenly-spaced frame sampling over video payloads (sequence + explode);
    the per-frame decode is the pluggable stub."""
    media = M.media_table(load_table(spark, sf_dir, "documents"))
    return M.sample_frames(media)


@register("media_feature_histograms", None)
def q_media_feature_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas featurization of binary payloads (16-bin
    byte histogram + entropy) — the plumbing a real image/audio featurizer
    drops into."""
    media = M.media_table(load_table(spark, sf_dir, "documents"))
    feats = M.extract_features(media)
    # Serialize the histogram for the contract surface: the driver's rows-only
    # canonicalizer sorts every column and array cells are unhashable in
    # pandas. extract_features keeps the array form for library callers.
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "byte_entropy",
        F.to_json("byte_histogram").alias("byte_histogram_json"),
    )
