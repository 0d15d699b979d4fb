"""Upsert / latest-wins merge over keyed fact tables — the warehouse
MERGE INTO, expressed for format-parameterized parquet sinks (sources/io
targets Iceberg unchanged when the runtime jar exists, where MERGE
becomes native; this operator is the engine-side equivalent that works on
any snapshot).

Shape: one union + one keyed window — a single hash shuffle on the merge
keys, no driver collection, no broadcast (both sides may be huge).  AQE
handles skewed keys; ties inside a version are broken deterministically
so re-running a merge is idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Latest-wins merge: rows from ``updates`` replace same-key rows in
    ``base``; new keys append.  Columns must match (unionByName).

    Winner per key = highest ``_version`` (updates get 1, base 0), then
    the ``tiebreak`` columns DESCENDING.  Duplicate keys WITHIN a side
    are resolved by tiebreak alone — PASS ONE whenever a side can carry
    duplicates (a CDC batch with several updates per key), or the winner
    among same-version duplicates depends on partition order.  With
    unique keys per side (the usual upsert contract) no tiebreak is
    needed and the result is fully data-determined.  One shuffle on
    ``keys``.
    """
    tiebreak = tiebreak or []
    tagged = (
        base.withColumn("_version", F.lit(0))
        .unionByName(updates.withColumn("_version", F.lit(1)))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.desc("_version"), *[F.desc(c) for c in tiebreak])
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_version")
    )
