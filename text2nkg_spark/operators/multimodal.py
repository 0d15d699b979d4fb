"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side machinery (schemas, batch shapes, partition sizing, UDF
signatures) is real and tested; the actual media DECODE is stubbed behind
``_decode_batch`` because no image/audio libraries ship in this container —
swap in PIL/torchaudio there and nothing else changes.

The synthetic payload bytes follow a closed-form formula
(``byte[j] = (id*37 + j*11 + j*j % 29) % 256``) so the whole
decode→pool pipeline has an exact ANSI-SQL oracle: the pooled feature is
``sum(bytes in group)/16/255`` computed in float64, bit-identical between
numpy and DuckDB (integer sums are exact; the two divisions are the same
IEEE ops in the same order).

Scale notes: media rows are wide (MBs) — keep
``spark.sql.files.maxPartitionBytes`` low for media tables, process with
``mapInPandas`` (Arrow moves the bytes once, and the UDF body is fully
vectorized numpy — no per-row Python), and always project metadata columns
separately from payloads so Parquet column pruning skips the blobs when only
metadata is needed.
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

FEATURE_SCHEMA = (
    "media_id long, kind string, feature array<double>, feat_dim int"
)

_KINDS = ("image", "audio", "video")
_PAYLOAD_LEN = 256


def synth_payload_bytes(ids: np.ndarray) -> np.ndarray:
    """(B, 256) uint8 payloads from the closed-form byte formula."""
    j = np.arange(_PAYLOAD_LEN, dtype=np.int64)
    b = (ids[:, None] * 37 + j[None, :] * 11 + (j * j) % 29) % 256
    return b.astype(np.uint8)


def synth_media_df(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table for plumbing tests (formula bytes,
    reproducible in ANSI SQL — see module docstring)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            payloads = synth_payload_bytes(ids)
            kinds = [_KINDS[int(i) % 3] for i in ids]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "payload": [p.tobytes() for p in payloads],
                    "meta": [
                        {
                            "width": 64 if k == "image" else None,
                            "height": 64 if k == "image" else None,
                            "sample_rate": 16000 if k == "audio" else None,
                            "duration_ms": 1000 if k != "image" else None,
                            "mime": f"{k}/fake",
                        }
                        for k in kinds
                    ],
                }
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_batch(payloads: list[bytes]) -> np.ndarray:
    """STUB — deterministic fake decode (replace with PIL.Image.open etc.).

    Raises NotImplementedError for real media; test payloads (256 bytes)
    decode to (B, 256) uint8 'pixel' matrices in one ``frombuffer`` over the
    stacked batch (no per-row Python).
    """
    if any(len(p) != _PAYLOAD_LEN for p in payloads):
        raise NotImplementedError(
            "real media decoding requires PIL/torchaudio — not shipped here")
    if not payloads:
        return np.empty((0, _PAYLOAD_LEN), dtype=np.uint8)
    return np.frombuffer(b"".join(payloads), dtype=np.uint8).reshape(
        len(payloads), _PAYLOAD_LEN)


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Batched feature extraction over binary payloads (mapInPandas).

    The 'model' is a deterministic float64 pooling of decoded bytes — the
    point under test is the Arrow round-trip of binary columns, batch
    shapes, and a stable output schema.  Pooling runs in float64 so the
    values are bit-identical to the SQL oracle (exact integer sums, then
    two IEEE divisions).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:  # reshape(0, d, -1) cannot infer -1
                yield pd.DataFrame(
                    columns=["media_id", "kind", "feature", "feat_dim"])
                continue
            raw = _decode_batch([bytes(p) for p in pdf["payload"]])
            # (B, feat_dim): mean over contiguous byte groups, scaled
            pooled = raw.astype(np.float64).reshape(
                len(pdf), feat_dim, -1).mean(axis=2) / 255.0
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(dtype=np.int64),
                    "kind": pdf["kind"].to_numpy(),
                    "feature": list(pooled),
                    "feat_dim": feat_dim,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def feature_scalars(feats: DataFrame) -> DataFrame:
    """Long-format scalar projection of the feature vectors — every column
    sortable/hashable, for engines (and drivers) that cannot canonicalize
    array cells."""
    return feats.select(
        F.col("media_id").cast("long").alias("media_id"),
        "kind",
        F.col("feat_dim").cast("int").alias("feat_dim"),
        F.posexplode("feature").alias("dim", "value"),
    ).select("media_id", "kind", "feat_dim",
             F.col("dim").cast("int").alias("dim"), "value")


RESIZED_SCHEMA = (
    "media_id long, kind string, width int, height int, payload binary"
)

FRAME_SCHEMA = (
    "media_id long, frame_idx int, ts_ms double, frame binary"
)

_FRAMES_PER_PAYLOAD = 16  # fake container layout: 16 frames x 16 bytes


def resize_images(media: DataFrame, out_w: int = 8,
                  out_h: int = 8) -> DataFrame:
    """Nearest-neighbor image resize as batched ``mapInPandas``.

    Image rows only (other kinds are filtered inside the UDF — the batch
    never leaves Arrow).  The decode stub yields a square uint8 matrix per
    payload (side = sqrt(byte length)); a real decoder would take the
    source dims from ``meta`` instead.  The index map
    ``src = (dst * side) // out`` is pure integer arithmetic, so resized
    bytes have a closed-form oracle against the payload formula.  The whole
    batch resizes in TWO numpy fancy-index ops — no per-row Python.
    """
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"output dims must be positive, got {out_w}x{out_h}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "kind", "width", "height", "payload"]
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            raw = _decode_batch([bytes(p) for p in pdf["payload"]])
            side = int(np.sqrt(raw.shape[1]))
            img = raw.reshape(len(pdf), side, side)
            ys = (np.arange(out_h, dtype=np.int64) * side) // out_h
            xs = (np.arange(out_w, dtype=np.int64) * side) // out_w
            resized = img[:, ys][:, :, xs]  # (B, out_h, out_w)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(dtype=np.int64),
                    "kind": pdf["kind"].to_numpy(),
                    "width": out_w,
                    "height": out_h,
                    "payload": [r.tobytes() for r in resized],
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform video frame sampling as batched ``mapInPandas`` — one output
    row per sampled frame (the explode happens INSIDE the UDF via a
    numpy repeat/tile, so Arrow ships each kept frame's bytes exactly once
    and dropped frames never cross the boundary).

    Video rows only.  The fake container is ``_FRAMES_PER_PAYLOAD`` equal
    byte slices per payload (a real decoder would parse the container
    here); sampled indices are ``(k * F) // n`` and each frame's timestamp
    is ``idx * duration_ms / F`` from the metadata, so both the selection
    and the timestamps have exact oracles.
    """
    total = _FRAMES_PER_PAYLOAD
    if not 0 < n_frames <= total:
        raise ValueError(f"n_frames must be in [1, {total}], got {n_frames}")
    idx = (np.arange(n_frames, dtype=np.int64) * total) // n_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "frame_idx", "ts_ms", "frame"]
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            raw = _decode_batch([bytes(p) for p in pdf["payload"]])
            frames = raw.reshape(len(pdf), total, -1)[:, idx]  # (B, n, L)
            dur = np.array(
                [m["duration_ms"] for m in pdf["meta"]], dtype=np.float64)
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(
                        pdf["media_id"].to_numpy(dtype=np.int64), n_frames),
                    "frame_idx": np.tile(idx, len(pdf)).astype(np.int32),
                    "ts_ms": (np.repeat(dur, n_frames)
                              * np.tile(idx, len(pdf)) / total),
                    "frame": [f.tobytes()
                              for row in frames for f in row],
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


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
