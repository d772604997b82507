"""Multimodal column plumbing (extension scope): image/audio/video as opaque
``binary`` payloads with typed metadata, decode/feature/frame-sample operators.

The real decode step needs codec libraries that are not in this environment,
so it is STUBBED behind NotImplementedError — but everything Spark-side is
real and tested: the binary schema, deterministic metadata derivation, the
Arrow batch shape of the mapInPandas feature extractor, and the frame-sample
explode. Swapping the stub for a real decoder changes one function body, not
the plumbing.

The testdata has no binary column, so media rows derive deterministically
from `documents`: payload = utf8 bytes of text, media_type cycles by doc_id,
duration/width/height derive from n_chars.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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

MEDIA_TYPES = ("image", "audio", "video")


def media_table(documents: DataFrame) -> DataFrame:
    """Derive a (doc_id, media_type, payload, meta...) table from documents.
    Deterministic: both the engine and any oracle can rebuild it."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.col("n_chars") % 7 + 1).cast("bigint").alias("n_frames"),
        ((F.col("n_chars") % 1920) + 16).cast("bigint").alias("width"),
        ((F.col("n_chars") % 1080) + 16).cast("bigint").alias("height"),
        (F.col("n_chars").cast("double") / 10.0).alias("duration_s"),
    )


def decode_media(payload_bytes: bytes, media_type: str):
    """Real decoders (PIL/libav/opencv) are unavailable in this container."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment; "
        "plug a decoder in here — the surrounding Spark plumbing is complete"
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_entropy", DoubleType()),
        StructField("byte_histogram", ArrayType(LongType())),
    ]
)


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas —
    the exact shape a real image/audio featurizer plugs into. The stand-in
    features (16-bin byte histogram + Shannon entropy) are deterministic and
    cheap, so tests can pin the plumbing end-to-end."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype(np.int64)
                p = hist[hist > 0] / len(arr) if len(arr) else np.array([1.0])
                entropy = float(-(p * np.log2(p)).sum())
                out.append((int(doc_id), mt, len(arr), entropy, hist.tolist()))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "byte_entropy",
                    "byte_histogram",
                ],
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        featurize, schema=_FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame sampling for video rows: explode n_frames evenly-spaced frame
    indices with byte offsets — pure Column ops (sequence + explode), the
    decode of each frame being the pluggable stub."""
    video = media.where(F.col("media_type") == "video")
    # floor(), not cast-truncate: DuckDB's double->int cast rounds half-to-even
    # while Spark's truncates, so oracles mirror floor explicitly.
    stride = F.floor(F.octet_length("payload") / F.col("n_frames")).cast("bigint")
    return (
        video.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)))
        .withColumn("byte_offset", (F.col("frame_idx") * stride).cast("bigint"))
        .select("doc_id", "n_frames", "frame_idx", "byte_offset")
    )
