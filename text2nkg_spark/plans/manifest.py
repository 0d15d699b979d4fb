"""Checkpoint / lineage manifests — per-stage, per-partition, resumable.

The reference checkpoints model weights (run_re.py:862-888); our analogue is
pipeline-stage checkpointing: every materialized stage writes

* its data as partitioned parquet (Iceberg on clusters that ship the
  runtime jar — the writer is format-parameterized), and
* a manifest row per output partition: (stage, part_id, rows, content_hash)
  plus a stage-level row with input fingerprint + wall time.

``run_stage`` consults the manifest before recomputing: if a stage directory
exists with a COMPLETE marker and the same input fingerprint, the stage is
skipped and its parquet is reused — exact resume after a crash, kill -9
included, because the marker is written only after the data commit.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def partition_stats(df: DataFrame) -> DataFrame:
    """Per-partition lineage: row counts + order-insensitive content hash."""
    return (
        df.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                F.conv(
                    F.substring(F.sha2(F.to_json(F.struct("*")), 256), 1, 15),
                    16, 10,
                ).cast("decimal(38,0)")
            ).cast("string").alias("content_hash"),
        )
    )


def lineage_manifest(
    df: DataFrame, stage: str, part_col: str, hash_cols: list[str]
) -> DataFrame:
    """Engine-portable per-partition lineage: (stage, part_id, rows,
    content_hash) keyed by an EXPLICIT partition column.

    Unlike :func:`partition_stats` (spark_partition_id — fast but
    placement-dependent), this manifest is reproducible by any engine that
    can group by ``part_col``: content_hash = bit_xor of the 52-bit md5 of
    a canonical "\\x01"-joined row string — order-insensitive (xor
    commutes), overflow-free (52-bit values under ANSI mode), and exactly
    float64-representable so a DuckDB/downstream auditor recomputes it
    bit-for-bit.  This is the hash a resume/audit step compares across a
    write→read round trip.
    """
    from text2nkg_spark.operators.similarity import md5_hash52

    canonical = F.concat_ws(
        "\x01", *[F.col(c).cast("string") for c in hash_cols])
    return (
        df.groupBy(F.col(part_col).cast("int").alias("part_id"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(md5_hash52(canonical)).alias("content_hash"))
        .select(F.lit(stage).alias("stage"), "part_id", "rows",
                "content_hash")
    )


class StageManifest:
    """Filesystem-backed manifest for a pipeline run."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _meta_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}.manifest.json")

    def is_complete(self, stage: str, input_fingerprint: str) -> bool:
        p = self._meta_path(stage)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            meta = json.load(f)
        return meta.get("complete") and meta.get("input_fingerprint") == input_fingerprint

    def run_stage(
        self,
        spark: SparkSession,
        stage: str,
        input_fingerprint: str,
        build: "callable[[], DataFrame]",
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Build-or-resume one stage; returns the stage DataFrame (from disk)."""
        out_dir = self._stage_dir(stage)
        if self.is_complete(stage, input_fingerprint):
            return spark.read.parquet(out_dir)

        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out_dir)

        written = spark.read.parquet(out_dir)
        parts = [r.asDict() for r in partition_stats(written).collect()]
        meta = {
            "stage": stage,
            "complete": True,
            "input_fingerprint": input_fingerprint,
            "rows_out": int(sum(p["rows"] for p in parts)),
            "partitions": parts,
            "wall_s": time.time() - t0,
        }
        tmp = self._meta_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path(stage))  # atomic commit marker
        return written

    def read_meta(self, stage: str) -> dict | None:
        p = self._meta_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)


def input_fingerprint(df: DataFrame, sample: int = 1000) -> str:
    """Cheap deterministic fingerprint of an input: schema + bounded sample
    hash + count.  Used as the resume key for downstream stages."""
    cnt = df.count()
    h = (
        df.limit(sample)
        .select(F.sha2(F.to_json(F.struct("*")), 256).alias("h"))
        .agg(F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256))
        .collect()[0][0]
    )
    return f"{df.schema.simpleString()}|{cnt}|{h}"
