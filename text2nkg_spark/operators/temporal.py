"""Temporal joins Spark has no built-in operator for, re-expressed
scale-first (training-data-pipeline ops; no reference analogue — the
reference is a batch NKG script, see SURVEY.md §2.9).

* ``asof_join`` — for every left row, the latest right row with the same
  key and ``right.ts <= left.ts`` (classic time-series as-of join).
  Implemented as union-tag + ONE window ``last(ignorenulls)`` pass:
  a single shuffle on the join key, no range explosion, no per-row
  Python, and no O(|L|x|R|) intermediate — the plan a 1000-executor
  cluster wants.  DuckDB's native ASOF JOIN is the driver oracle.
* ``range_pair_counts`` — interval self-join ``|ts_a - ts_b| <= delta``
  via the bucket + neighbor-bucket equi-join pattern: each row lands in
  bucket ``floor(us / delta)`` and additionally probes ``bucket + 1``,
  so every qualifying pair is examined exactly once (same-bucket pairs
  are ordered by id; cross-bucket pairs only ever meet in the probe-up
  direction).  Work is bounded by per-bucket width x 2, not |T|^2.

All arithmetic runs on integer epoch-MICROSECONDS (``unix_micros`` /
DuckDB ``epoch_us``): the test events carry sub-second precision, and
second-truncating functions (``unix_timestamp``) would silently disagree
with any engine that keeps the fraction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    payload_cols: Sequence[str] = ("event_id",),
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row joined to the single latest
    ``right`` row with equal ``key_cols`` and ``right.ts <= left.ts``
    (NULL payload when no such row exists).

    Semantics pinned for determinism: when several right rows share
    ``(key, ts)``, the one with the greatest ``tiebreak_col`` (default:
    the first payload column) wins — callers get last-write-wins, and
    the DuckDB ASOF oracle reproduces it by pre-deduplicating the right
    side the same way.

    Plan shape: union-tag both sides, one window sorted by
    ``(ts, side, tiebreak)`` per key (right rows sort BEFORE left rows at
    equal ts, so ties match), ``last(payload, ignorenulls=True)`` over
    the unbounded-preceding frame, keep left rows.  Exactly one Exchange
    on ``key_cols`` (plan-asserted in tests/test_temporal.py); skewed
    keys split like any window — salting applies upstream if one key
    dominates.
    """
    key_cols = list(key_cols)
    payload_cols = list(payload_cols)
    tb = tiebreak_col or payload_cols[0]

    # a NULL right ts can never satisfy right.ts <= left.ts — drop it
    # BEFORE the window, or Spark's NULLS-FIRST ascending sort would hand
    # its payload to every otherwise-unmatched left row (DuckDB's ASOF
    # returns no match for NULL ts; NULL LEFT ts needs no guard: it sorts
    # first, sees an empty prefix, and yields NULL like the oracle)
    right = right.where(F.col(ts_col).isNotNull())
    payload = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        *key_cols,
        F.col(ts_col).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.col(tb).alias("_asof_tb"),
        payload.alias("_asof_payload"),
    )
    l_cols = left.columns
    lt = left.select(
        *l_cols,
        F.col(ts_col).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(r.schema["_asof_tb"].dataType).alias("_asof_tb"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType)
        .alias("_asof_payload"),
    )
    u = lt.unionByName(r.select(
        *key_cols, "_asof_ts", "_asof_side", "_asof_tb", "_asof_payload",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in l_cols if c not in key_cols and c != ts_col],
        *([F.lit(None).cast(left.schema[ts_col].dataType).alias(ts_col)]
          if ts_col not in key_cols else []),
    ))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.asc("_asof_ts"), F.asc("_asof_side"), F.asc("_asof_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w))
    out = matched.where(F.col("_asof_side") == 1).select(
        *l_cols,
        *[F.col("_asof_match").getField(c).alias(f"asof_{c}")
          for c in payload_cols],
    )
    return out


def range_pair_counts(
    df: DataFrame,
    delta_us: int,
    ts_col: str = "ts",
    id_col: str = "event_id",
    group_cols: Sequence[str] = ("event_type",),
    distinct_col: str | None = "user_id",
) -> DataFrame:
    """Count pairs of rows within ``delta_us`` microseconds of each other,
    per ``group_cols`` (pairs must agree on the group), optionally
    requiring the pair to DIFFER on ``distinct_col``.

    Bucket + neighbor-bucket shape: with bucket = ``us DIV delta_us``, any
    qualifying pair's buckets differ by at most 1.  One side explodes to
    ``[bucket, bucket + 1]`` probes; the equi-join on (group, bucket) then
    sees every pair exactly once — same-bucket meetings keep only
    ``probe.id < base.id``, cross-bucket meetings only ever occur with the
    earlier bucket probing up.  The |dt| filter runs on exact integer
    microseconds.  Join width is bounded by 2x the widest (group, bucket)
    population — at 100 TB pick ``delta_us``-proportional bucketing keys
    or pre-aggregate hot groups; never the |T|^2 theta-join a naive
    inequality join plans.
    """
    group_cols = list(group_cols)
    # NTZ-tolerant epoch micros: the cast shifts both sides of every
    # difference identically, so gaps and bucket adjacency are
    # timezone-invariant (no absolute epoch ever leaves this operator)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(
        *group_cols,
        F.col(id_col).alias("_id"),
        us.alias("_us"),
        F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV {delta_us}")
        .alias("_bucket"),
        *([F.col(distinct_col).alias("_dv")] if distinct_col else []),
    )
    probe = base.select(
        *[F.col(c).alias(f"_pg_{c}") for c in group_cols],
        F.col("_id").alias("_pid"),
        F.col("_us").alias("_pus"),
        F.col("_bucket").alias("_pbucket"),
        *([F.col("_dv").alias("_pdv")] if distinct_col else []),
        F.explode(F.array(F.col("_bucket"), F.col("_bucket") + 1))
        .alias("_probe"),
    )
    # the bucket is part of the EQUI-join key (with the group columns) —
    # the whole point: Catalyst plans a hash join on (group, bucket), and
    # the quadratic never materializes
    joined = probe.join(
        base,
        on=[probe[f"_pg_{c}"] == base[c] for c in group_cols]
        + [probe["_probe"] == base["_bucket"]],
        how="inner",
    ).where(
        (
            # same bucket: order by id; probe-up: direction already unique
            ((F.col("_pbucket") == F.col("_bucket"))
             & (F.col("_pid") < F.col("_id")))
            | (F.col("_pbucket") == F.col("_bucket") - 1)
        )
        & (F.abs(F.col("_pus") - F.col("_us")) <= F.lit(delta_us))
    )
    if distinct_col:
        joined = joined.where(F.col("_pdv") != F.col("_dv"))
    return joined.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"))


def resample_ffill(
    df: DataFrame,
    step_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Regularize an irregular event stream onto a fixed grid with
    forward fill — the time-series "resample + pad" every metrics
    pipeline needs and Spark has no built-in for: one row per
    ``(key, bucket)`` for every ``step_us`` bucket between the key's
    first and last event, carrying the latest observed value at or
    before that bucket.

    Columns: ``(key, bucket_us, value, is_gap)`` — ``bucket_us`` the
    grid point (integer epoch-micros, so the grid is engine-exact),
    ``is_gap`` 1 where no event landed in the bucket and the value was
    carried forward.

    Deterministic bucket representative: ``max(struct(us, id, value))``
    picks the LAST event in the bucket, ties on the unique id — never an
    unordered ``first()``.  Shape: one per-(key,bucket) agg, one per-key
    min/max agg, a ``sequence``-explode for the grid, one left join, one
    ``last(ignorenulls)`` window — everything keyed and co-partitioned
    by ``key``; grid width is bounded by (key's own span / step), so a
    key contributes rows proportional to ITS activity span, never the
    global range.  At 100 TB the step is the knob: the explode is the
    only row-amplifying stage and its fan-out is span/step per key.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    obs = (
        df.select(
            F.col(key_col).alias("key"),
            (us - (us % F.lit(step_us))).alias("bucket_us"),
            F.struct(us.alias("us"),
                     F.col(id_col).alias("id"),
                     F.col(value_col).alias("v")).alias("_o"))
        .groupBy("key", "bucket_us")
        .agg(F.max("_o").alias("_last"))
        .select("key", "bucket_us", F.col("_last.v").alias("_v"))
    )
    grid = (
        obs.groupBy("key")
        .agg(F.min("bucket_us").alias("_mn"), F.max("bucket_us").alias("_mx"))
        .select(
            "key",
            F.explode(F.sequence(
                F.col("_mn"), F.col("_mx"),
                F.lit(step_us).cast("long"))).alias("bucket_us"))
    )
    w = (
        Window.partitionBy("key").orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(obs, ["key", "bucket_us"], "left")
    return joined.select(
        "key", "bucket_us",
        F.last("_v", ignorenulls=True).over(w).alias("value"),
        F.when(F.col("_v").isNull(), F.lit(1))
        .otherwise(F.lit(0)).cast("int").alias("is_gap"),
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order transition counts over per-key event sequences —
    ``(prev_type, next_type, n)`` — the Markov-chain / session-bigram
    view behind "what do users do after X" analytics and sequence-mining
    feature prep.

    Sequence order is total (timestamp, then the unique id — concurrent
    events never give the engines different orders).  NULL-timestamp
    rows are dropped BEFORE the window: Spark sorts NULLS FIRST
    ascending, DuckDB NULLS LAST, so an unfiltered dirty row would give
    the engines different sequences (the same guard every rank/asof
    operator here carries).  ONE shuffle: the lag window partitions by
    key, the final count aggregates map-side first.  No per-key
    collection, no explode — linear in |events| at any scale.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(us, F.col(id_col))
    seq = df.where(us.isNotNull()).select(
        F.col(type_col).alias("next_type"),
        F.lag(type_col).over(w).alias("prev_type"))
    return (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    open_end_us: int = -1,
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse a per-key change
    stream into validity intervals — one row per run of equal
    ``attr_col`` values, ``(key, attr, eff_from_us, eff_to_us, version)``
    with half-open ``[from, to)`` ranges and ``open_end_us`` (a sentinel,
    never NULL — NULL sorts differently across engines) on the current
    version.  The dimension-history op every warehouse load needs and
    Spark has no MERGE-history built-in for.

    Change detection and interval assembly are two windows over the SAME
    partitioning (key, ordered by exact integer epoch-micros then the
    unique id): ``lag(attr)`` marks run starts, a filter keeps them,
    ``lead(from)`` closes each run with the next run's start.  Catalyst
    plans ONE Exchange for both windows (plan-asserted in
    tests/test_temporal.py); linear in |events| at any scale, per-key
    history length bounds window width exactly like sessionize.
    NULL-timestamp rows are dropped before ordering (NULLS FIRST vs
    LAST cross-engine trap); NULL attr values participate as a real
    run value via a null-safe comparison (``eqNullSafe``).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    marked = (
        df.where(us.isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(attr_col).alias("attr"),
            us.alias("_us"),
            F.col(id_col).alias("_id"),
        )
        .withColumn("_prev", F.lag("attr").over(
            Window.partitionBy("key").orderBy("_us", "_id")))
        .withColumn("_prev_seen", F.lag(F.lit(1)).over(
            Window.partitionBy("key").orderBy("_us", "_id")))
    )
    # run start = first row of the key, or attr changed (null-safe:
    # a NULL attr following a NULL attr is NOT a new version)
    starts = marked.where(
        F.col("_prev_seen").isNull()
        | ~F.col("attr").eqNullSafe(F.col("_prev")))
    w2 = Window.partitionBy("key").orderBy("_us", "_id")
    return starts.select(
        "key", "attr",
        F.col("_us").alias("eff_from_us"),
        F.coalesce(F.lead("_us").over(w2),
                   F.lit(open_end_us).cast("long")).alias("eff_to_us"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


def interval_overlap_pairs(
    df: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    start_us_col: str = "s_us",
    end_us_col: str = "e_us",
    bucket_us: int = 6 * 3600 * 1_000_000,
    max_span_buckets: int = 64,
    truncate_ok: bool = False,
) -> DataFrame:
    """Interval self-overlap join: all pairs of rows with the same key
    whose ``[start, end]`` intervals intersect, with the exact integer
    overlap length — scheduling-conflict / concurrent-session analytics
    Spark would otherwise plan as an O(n^2) theta-join.

    Each unordered pair is generated EXACTLY ONCE, no dedup pass: the
    later-STARTING interval of a pair sits as the "home" side in its own
    start bucket; the earlier one explodes over every bucket its span
    touches, which includes that bucket precisely when the two overlap
    (later start <= earlier end).  Ties on equal starts order by the
    unique id.  The join is a hash EQUI-join on (key, bucket) — the
    quadratic never materializes; per-bucket population bounds the
    width, and the explode fan-out is span/bucket_us per row, bounded by
    ``max_span_buckets`` (must be >= 1).  A span longer than
    cap*bucket_us would silently MISS pairs whose partner starts past
    the cap, so by default such a row FAILS LOUDLY at execution time
    (``raise_error`` — the fail-fast convention every guard here
    follows); pass ``truncate_ok=True`` to accept the cap as a skew
    fuse instead (documented truncation: the row only meets partners
    starting within its first cap buckets).  Callers size ``bucket_us``
    >= the expected max span so neither path engages.

    Output: ``(key, ev_a, ev_b, overlap_us)`` with ``ev_a < ev_b`` by id
    and ``overlap_us = min(ends) - max(starts)`` (>= 0; touching
    endpoints count with overlap 0, matching a closed-interval oracle
    predicate ``a.s <= b.e AND b.s <= a.e``).
    """
    if max_span_buckets < 1:
        raise ValueError(
            f"interval_overlap_pairs: max_span_buckets must be >= 1, got "
            f"{max_span_buckets} (0 would make the span sequence descend "
            "and silently drop every multi-bucket meeting)")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.col(start_us_col).cast("long").alias("s"),
        F.col(end_us_col).cast("long").alias("e"),
    ).where(F.col("key").isNotNull() & F.col("s").isNotNull()
            & F.col("e").isNotNull() & (F.col("s") <= F.col("e")))
    # integer DIV, never double-divide-and-cast: epoch micros sit near
    # 2^50 and a float quotient can truncate across a bucket boundary
    sdiv = F.expr(f"s DIV {int(bucket_us)}")
    ediv = F.expr(f"e DIV {int(bucket_us)}")
    cap_hi = sdiv + F.lit(int(max_span_buckets) - 1)
    if truncate_ok:
        hi = F.least(ediv, cap_hi)
    else:
        # a span past the cap would silently miss pairs — fail loudly
        hi = F.when(ediv > cap_hi, F.raise_error(F.concat(
            F.lit("interval_overlap_pairs: span of id "),
            F.col("id").cast("string"),
            F.lit(f" exceeds max_span_buckets={int(max_span_buckets)} x "
                  f"bucket_us={int(bucket_us)}; raise bucket_us/"
                  "max_span_buckets or pass truncate_ok=True"),
        )).cast("long")).otherwise(ediv)
    home = base.select(
        "key", F.col("id").alias("h_id"), F.col("s").alias("h_s"),
        F.col("e").alias("h_e"), sdiv.alias("bucket"))
    spans = base.select(
        "key", "id", "s", "e",
        F.explode(F.sequence(sdiv, hi)).alias("bucket"))
    pairs = spans.join(home, ["key", "bucket"]).where(
        # home starts strictly later, or same start with larger id —
        # the canonical single meeting point for the pair
        ((F.col("h_s") > F.col("s"))
         | ((F.col("h_s") == F.col("s")) & (F.col("h_id") > F.col("id"))))
        # overlap: the later start is at or before the earlier end
        & (F.col("h_s") <= F.col("e")))
    return pairs.select(
        "key",
        F.least("id", "h_id").alias("ev_a"),
        F.greatest("id", "h_id").alias("ev_b"),
        (F.least("e", "h_e") - F.col("h_s")).alias("overlap_us"),
    )
