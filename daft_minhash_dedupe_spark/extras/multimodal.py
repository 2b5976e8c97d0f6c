"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the actual media DECODING is
stubbed — the sandbox has no image/audio libraries — behind
``decode_image_stub`` (deterministic fake features) and
``decode_image_real`` (raises NotImplementedError until Pillow/ffmpeg are
provisioned). Swapping the stub for a real decoder changes ONE function, not
the dataflow.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable without decoding: byte length + magic-number
    sniffing (pure Catalyst on the binary column)."""
    p = F.col(payload_col)
    head = F.hex(F.substring(p, 1, 4))
    return df.withColumn("n_bytes", F.length(p)).withColumn(
        "sniffed_mime",
        F.when(head.startswith("FFD8"), "image/jpeg")
        .when(head.startswith("89504E47"), "image/png")
        .when(head.startswith("47494638"), "image/gif")
        .when(head.startswith("52494646"), "audio/wav")
        .otherwise("application/octet-stream"),
    )


def decode_image_real(payload: bytes) -> np.ndarray:
    """Real decode path — requires an image library not present in this
    environment. The mapInPandas plumbing below is agnostic to which decoder
    is plugged in."""
    raise NotImplementedError(
        "image decoding requires Pillow/opencv; not available in this sandbox"
    )


def decode_image_stub(payload: bytes, n_features: int = 8) -> np.ndarray:
    """Deterministic fake 'decoder': derives a feature vector from the bytes
    (length + hashed byte histogram). Stands in for decode→resize→embed so
    the distributed plumbing is fully testable."""
    if payload is None:
        return np.zeros(n_features, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % n_features, minlength=n_features).astype(np.float32)
    denom = float(len(arr)) if len(arr) else 1.0
    return hist / denom


def extract_media_features(
    df: DataFrame, n_features: int = 8, use_real_decoder: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of binary payloads.

    Batch shape: the iterator yields pandas DataFrames whose ``payload``
    column holds raw bytes; output conforms to FEATURE_SCHEMA. Partitioning
    is preserved (narrow op — no shuffle)."""
    decoder = decode_image_real if use_real_decoder else decode_image_stub

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, n_features) if decoder is decode_image_stub else decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) without
    decoding — the downstream decode stage consumes this exploded plan.
    Demonstrates the explode-then-mapInPandas pattern for heavy media."""
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts"),
    )
