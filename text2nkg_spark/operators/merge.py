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


def snapshot_diff(
    base: DataFrame,
    new: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Change-data capture between two snapshots of a keyed table: one
    row per CHANGED key with ``change_type`` 'I' (key only in ``new``),
    'D' (key only in ``base``), or 'U' (key in both, any non-key column
    differs — NULL-safe).  Unchanged keys emit nothing.  Payload columns
    come from the surviving side (``new`` for I/U, ``base`` for D).

    Shape: ONE full outer join on the keys (one shuffle, both sides may
    be huge — never a broadcast), then a null-safe struct comparison; no
    per-column join conditions, so adding columns never changes the plan
    shape.  The inverse of ``merge_upsert``: diff(base,
    merge_upsert(base, u, k), k) recovers exactly u's effective changes
    (property-tested in tests/test_merge_joins.py).
    """
    val_cols = [c for c in base.columns if c not in keys]
    if new.columns != base.columns:
        raise ValueError(
            f"snapshot_diff: column mismatch {base.columns} vs "
            f"{new.columns}")
    if not val_cols:
        raise ValueError(
            "snapshot_diff needs at least one non-key column: a "
            "keys-only table has no 'U' semantics (and struct() of zero "
            "fields fails analysis) — diff key existence directly "
            "instead (ADVICE r6)")
    b = base.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        F.struct(*val_cols).alias("_bv"))
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        F.struct(*val_cols).alias("_nv"))
    j = b.join(
        n, on=[b[f"_bk_{k}"].eqNullSafe(n[f"_nk_{k}"]) for k in keys],
        how="full_outer")
    in_base = F.col(f"_bk_{keys[0]}").isNotNull() | F.col(
        "_bv").isNotNull()
    in_new = F.col(f"_nk_{keys[0]}").isNotNull() | F.col(
        "_nv").isNotNull()
    ct = (
        F.when(~in_base, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(~F.col("_bv").eqNullSafe(F.col("_nv")), F.lit("U"))
    )
    side = F.when(F.col("_nv").isNotNull(), F.col("_nv")).otherwise(
        F.col("_bv"))
    out_keys = [
        F.coalesce(F.col(f"_nk_{k}"), F.col(f"_bk_{k}")).alias(k)
        for k in keys]
    return (
        j.withColumn("change_type", ct)
        .where(F.col("change_type").isNotNull())
        .select(*out_keys, "change_type",
                *[side.getField(c).alias(c) for c in val_cols])
    )
