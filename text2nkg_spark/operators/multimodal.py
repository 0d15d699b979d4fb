"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side machinery (schemas, batch shapes, partition sizing, UDF
signatures) is real and tested; the actual media DECODE is stubbed behind
``_decode_image`` because no image/audio libraries ship in this container —
swap in PIL/torchaudio there and nothing else changes.

Scale notes: media rows are wide (MBs) — keep
``spark.sql.files.maxPartitionBytes`` low for media tables, process with
``mapInPandas`` (Arrow moves the bytes once), and always project metadata
columns separately from payloads so Parquet column pruning skips the blobs
when only metadata is needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, "
    "mime:string>"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, feat_dim int"


def synth_media_df(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table for plumbing tests (seeded bytes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng((1234, int(i)))
                kind = ["image", "audio", "video"][int(i) % 3]
                payload = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": 64 if kind == "image" else None,
                            "height": 64 if kind == "image" else None,
                            "sample_rate": 16000 if kind == "audio" else None,
                            "duration_ms": 1000 if kind != "image" else None,
                            "mime": f"{kind}/fake",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB — deterministic fake decode (replace with PIL.Image.open).

    Raises NotImplementedError for real media; test payloads (256 bytes)
    decode to a fake 8x8x4 'pixel' array derived from the bytes.
    """
    if len(payload) != 256:
        raise NotImplementedError(
            "real media decoding requires PIL/torchaudio — not shipped here")
    return np.frombuffer(payload, dtype=np.uint8).reshape(8, 8, 4)


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Batched feature extraction over binary payloads (mapInPandas).

    The 'model' is a deterministic projection of decoded bytes — the point
    under test is the Arrow round-trip of binary columns, batch shapes, and
    a stable output schema.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                arr = _decode_image(bytes(row["payload"])).astype(np.float32)
                flat = arr.reshape(-1)
                # deterministic pooled 'embedding'
                pooled = flat.reshape(feat_dim, -1).mean(axis=1) / 255.0
                feats.append(
                    (int(row["media_id"]), row["kind"],
                     pooled.astype(np.float32).tolist(), feat_dim))
            yield pd.DataFrame(
                feats, columns=["media_id", "kind", "feature", "feat_dim"])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — must prune the payload column at scan."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("meta.width")).alias("avg_width"),
            F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
        )
    )
