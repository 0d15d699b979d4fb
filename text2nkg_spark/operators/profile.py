"""One-pass table profiling — the data-quality / schema-drift scan every
large-scale ingest runs before training-data jobs touch a new drop
(Deequ-style; no reference analogue — the reference is a batch NKG
script, see SURVEY.md §2.9).

Shape matters at 100 TB, and the obvious formulation is a trap measured
here twice over:

* One ``agg`` with N ``count_distinct`` columns plans an **Expand xN**
  (every input row duplicated once per distinct aggregate) and — because
  string min/max keep var-length aggregation buffers — **SortAggregate**
  instead of hash aggregation, i.e. a full sort of the expanded table.
  Measured 3.5-4 s warm on 150k rows; at 100 TB it's a sort of N x the
  dataset.  ``approx_count_distinct`` avoids the Expand but gives up
  exactness; ``collect_set`` keeps exactness but buffers every distinct
  value per partition (OOM on a high-cardinality key column).

* The scale-correct exact shape is **melt + two-level aggregation**:
  explode each row into one narrow ``(column, value)`` record per
  profiled column, hash-aggregate by ``(column, value)`` (map-side
  combine collapses to per-partition distincts before the shuffle), then
  hash-aggregate by ``column``.  Two keyed shuffles whose volume is the
  per-partition DISTINCT set, never a sort of the full table; the only
  SortAggregate left (string min/max) runs over |distinct values| rows.
  Measured ~4x faster warm at bench scale and strictly better asymptotics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType, StringType


def profile_table(
    df: DataFrame,
    columns: Sequence[str],
) -> DataFrame:
    """Profile ``columns`` in one scan: long-format
    ``(column, n_rows, n_nulls, n_distinct, min_d, max_d, min_s, max_s)``
    — one row per profiled column.

    Numeric columns report ``min_d``/``max_d`` (cast to double BEFORE
    aggregation, exact for int64 magnitudes < 2^53 and a no-op for
    doubles — the same bound also makes the double-valued distinct
    count exact); string columns report ``min_s``/``max_s`` (binary
    collation both engines share); the other pair is NULL.  Numbers are
    never string-formatted — float-to-string rendering is
    engine-specific and would break exact parity.

    Plan (see module docstring for why NOT ``count_distinct``): one
    Project + Generate melts the row into ``len(columns)`` narrow
    records, then two hash aggregations — by ``(column, value)`` and by
    ``column``.  NULL values melt to a (vnum, vstr) = (NULL, NULL)
    record so null counts ride the same pass without a flag column.
    """
    columns = list(columns)
    if not columns:
        raise ValueError("profile_table: columns must be non-empty")
    if len(set(columns)) != len(columns):
        dupes = sorted({c for c in columns if columns.count(c) > 1})
        raise ValueError(
            f"profile_table: duplicate column(s) {dupes} — a repeated "
            "name would silently double its melt records and row counts")
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in columns if c not in fields]
    if missing:
        raise ValueError(
            f"profile_table: column(s) {missing} not in DataFrame schema "
            f"(have: {sorted(fields)})")
    recs = []
    for c in columns:
        dt = fields[c]
        if isinstance(dt, NumericType):
            vnum = F.col(c).cast("double")
            vstr = F.lit(None).cast("string")
        elif isinstance(dt, StringType):
            vnum = F.lit(None).cast("double")
            vstr = F.col(c)
        else:
            raise ValueError(
                f"profile_table: unsupported type {dt} for column {c!r} "
                "(cast timestamps to unix_micros / strings first)")
        recs.append(F.struct(
            F.lit(c).alias("column"),
            vnum.alias("vnum"), vstr.alias("vstr")))
    melted = df.select(F.explode(F.array(*recs)).alias("_m")).select("_m.*")
    per_value = melted.groupBy("column", "vnum", "vstr").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"))
    nonnull = F.col("vnum").isNotNull() | F.col("vstr").isNotNull()
    stats = per_value.groupBy("column").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(F.when(~nonnull, F.col("cnt")).otherwise(F.lit(0)))
        .cast("long").alias("n_nulls"),
        F.sum(F.when(nonnull, 1).otherwise(0)).cast("long")
        .alias("n_distinct"),
        F.min("vnum").alias("min_d"),
        F.max("vnum").alias("max_d"),
        F.min("vstr").alias("min_s"),
        F.max("vstr").alias("max_s"),
    )
    # an EMPTY (or fully filtered) input melts to zero rows, but the
    # profile contract — like any per-column SQL aggregate — is one row
    # per column with zero counts; left-join the stats onto a tiny
    # broadcast skeleton of the requested column names
    skeleton = df.sparkSession.createDataFrame(
        [(c,) for c in columns], "column string")
    # the aggregated stats side is <= len(columns) rows — broadcast it
    # (the preserved side of a left join cannot be the build side)
    return skeleton.join(F.broadcast(stats), "column", "left").select(
        "column",
        F.coalesce("n_rows", F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce("n_nulls", F.lit(0)).cast("long").alias("n_nulls"),
        F.coalesce("n_distinct", F.lit(0)).cast("long")
        .alias("n_distinct"),
        "min_d", "max_d", "min_s", "max_s",
    )
