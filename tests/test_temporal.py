"""As-of join + bucketed range join: semantics vs brute force, tie rules,
and the plan shapes that make them scale (single shuffle / equi-join)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from text2nkg_spark.operators.temporal import asof_join, range_pair_counts

_EPOCH = dt.datetime(2026, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5.0)),   # matches r@5.0 (tie at-or-before)
         (2, 10, _ts(9.5)),   # matches r@8.0
         (3, 10, _ts(2.0)),   # before any right row -> NULL
         (4, 20, _ts(100.0)),  # key with no right rows -> NULL
         (5, 10, _ts(8.0))],  # exact tie with r@8.0
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(101, 10, _ts(5.0)),
         (102, 10, _ts(5.0)),   # same (key, ts): max event_id wins
         (103, 10, _ts(8.0)),
         (104, 10, _ts(50.0))],  # after every left row
        "event_id long, user_id long, ts timestamp")
    return left, right


def test_asof_semantics(asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, ["user_id"], "ts",
                    payload_cols=["event_id"], tiebreak_col="event_id")
    got = {r["event_id"]: r["asof_event_id"] for r in out.collect()}
    assert got == {1: 102,   # tie at 5.0; 102 beats 101 (last-write-wins)
                   2: 103,
                   3: None,
                   4: None,
                   5: 103}   # exact-ts right row matches
    assert out.count() == left.count()  # left-join row preservation


def test_asof_payload_struct(asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, ["user_id"], "ts",
                    payload_cols=["event_id", "ts"],
                    tiebreak_col="event_id")
    row = {r["event_id"]: r for r in out.collect()}
    assert row[2]["asof_ts"] == _ts(8.0)
    assert row[3]["asof_ts"] is None


def test_asof_single_shuffle(asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, ["user_id"], "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def _brute_pairs(rows, delta_us):
    n = 0
    per_type = {}
    for a in rows:
        for b in rows:
            if (a.event_id < b.event_id
                    and a.event_type == b.event_type
                    and a.user_id != b.user_id
                    and abs((a.ts - b.ts).total_seconds() * 1e6) <= delta_us):
                per_type[a.event_type] = per_type.get(a.event_type, 0) + 1
                n += 1
    return per_type


@pytest.fixture(scope="module")
def range_frame(spark):
    # deterministic spread crossing bucket boundaries; includes the
    # adversarial case: the EARLIER-ts row has the LARGER id (pair must
    # still be found exactly once via the probe-up direction)
    rows = []
    for i in range(60):
        rows.append((
            1000 - i,                      # ids DESCEND as ts ascends
            i % 7,                         # user
            "t%d" % (i % 2),               # two types
            _ts(i * 13.0 + (i % 5) * 0.25),
        ))
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")


@pytest.mark.parametrize("delta_us", [10_000_000, 30_000_000, 90_000_000])
def test_range_pairs_match_brute_force(range_frame, delta_us):
    out = range_pair_counts(
        range_frame, delta_us=delta_us, group_cols=("event_type",),
        distinct_col="user_id")
    got = {r["event_type"]: r["n_pairs"] for r in out.collect()}
    want = _brute_pairs(range_frame.collect(), delta_us)
    assert got == want


def test_range_join_is_equijoin_on_bucket(range_frame):
    out = range_pair_counts(range_frame, delta_us=30_000_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the join key must include the bucket — no nested-loop / cartesian
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_null_right_ts_never_matches(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(2.0))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(9, 10, None), (103, 10, _ts(8.0))],
        "event_id long, user_id long, ts timestamp")
    out = asof_join(left, right, ["user_id"], "ts",
                    payload_cols=["event_id"]).collect()
    # NULL-ts right rows can't satisfy right.ts <= left.ts (matches the
    # DuckDB ASOF oracle); r@8.0 is after the left row
    assert out[0]["asof_event_id"] is None


def test_asof_null_left_ts_yields_null(spark):
    left = spark.createDataFrame(
        [(1, 10, None)], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(103, 10, _ts(8.0))], "event_id long, user_id long, ts timestamp")
    out = asof_join(left, right, ["user_id"], "ts",
                    payload_cols=["event_id"]).collect()
    assert len(out) == 1 and out[0]["asof_event_id"] is None


def test_asof_matches_pandas_merge_asof(spark):
    """Property check against an INDEPENDENT reference: pandas.merge_asof
    (direction='backward', allow_exact_matches=True) implements exactly
    this operator's semantics.  Deterministic pseudo-random frames with
    multi-key, duplicate-ts, and no-match structure."""
    import random

    import pandas as pd

    rng = random.Random(123)
    left_rows = [
        (i, rng.randint(0, 4), _ts(rng.randint(0, 400) / 4.0))
        for i in range(120)
    ]
    right_rows = [
        (1000 + i, rng.randint(0, 4), _ts(rng.randint(0, 400) / 4.0))
        for i in range(80)
    ]
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        right_rows, "event_id long, user_id long, ts timestamp")

    got = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(left, right, ["user_id"], "ts",
                           payload_cols=["event_id"],
                           tiebreak_col="event_id").collect()
    }

    lp = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts"])
    rp = pd.DataFrame(right_rows, columns=["event_id", "user_id", "ts"])
    # pin the same last-write-wins tie rule: one right row per (key, ts),
    # keeping the max event_id (merge_asof itself takes the LAST row on
    # ties, so pre-sorting by event_id makes the rules identical)
    rp = (rp.sort_values(["user_id", "ts", "event_id"])
            .drop_duplicates(["user_id", "ts"], keep="last"))
    merged = pd.merge_asof(
        lp.sort_values("ts"), rp.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
        allow_exact_matches=True, suffixes=("", "_r"))
    want = {
        int(r.event_id): (None if pd.isna(r.event_id_r)
                          else int(r.event_id_r))
        for r in merged.itertuples()
    }
    assert got == want


# ---------------------------------------------------------- resample_ffill

def test_resample_ffill_hand_case(spark):
    from text2nkg_spark.operators.temporal import resample_ffill

    # user u1: events at t=0s (v=1.0) and t=25s (v=9.0); 10s grid ->
    # buckets 0,10,20 with 10 and 20 forward-filled from t=0's value
    rows = [
        (1, "2024-01-01 00:00:00", "u1", 1.0),
        (2, "2024-01-01 00:00:25", "u1", 9.0),
        (3, "2024-01-01 00:00:05", "u2", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id string, value double")
    got = sorted(
        (r.key, r.bucket_us, r.value, r.is_gap)
        for r in resample_ffill(df, step_us=10_000_000).collect())
    base = 1_704_067_200_000_000  # 2024-01-01 UTC epoch micros
    assert got == [
        ("u1", base, 1.0, 0),
        ("u1", base + 10_000_000, 1.0, 1),
        ("u1", base + 20_000_000, 9.0, 0),
        ("u2", base, 5.0, 0),
    ]


def test_resample_bucket_representative_is_last(spark):
    from text2nkg_spark.operators.temporal import resample_ffill

    # two events in one bucket: the LATER timestamp wins; equal
    # timestamps tie-break on the higher event_id — both deterministic
    rows = [
        (1, "2024-01-01 00:00:01", "u", 1.0),
        (2, "2024-01-01 00:00:09", "u", 2.0),
        (3, "2024-01-01 00:00:09", "u", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id string, value double")
    [r] = resample_ffill(df, step_us=10_000_000).collect()
    assert (r.value, r.is_gap) == (7.0, 0)


def test_event_transitions_hand_case(spark):
    from text2nkg_spark.operators.temporal import event_transitions

    # u1: view -> click -> view; u2: view -> view.  Equal timestamps
    # order by event_id (u2's rows share a second).
    rows = [
        (1, "2024-01-01 00:00:00", "u1", "view"),
        (2, "2024-01-01 00:00:10", "u1", "click"),
        (3, "2024-01-01 00:00:20", "u1", "view"),
        (4, "2024-01-01 00:00:00", "u2", "view"),
        (5, "2024-01-01 00:00:00", "u2", "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id string, event_type string")
    got = {(r.prev_type, r.next_type): r.n
           for r in event_transitions(df).collect()}
    assert got == {("view", "click"): 1, ("click", "view"): 1,
                   ("view", "view"): 1}


def test_event_transitions_null_ts_dropped(spark):
    # NULL timestamps must be filtered BEFORE the window: Spark sorts
    # NULLS FIRST ascending, DuckDB NULLS LAST — an unfiltered dirty row
    # would give the engines different sequences (review r6 finding)
    from text2nkg_spark.operators.temporal import event_transitions

    rows = [
        (1, "2024-01-01 00:00:00", "u1", "view"),
        (2, None, "u1", "poison"),
        (3, "2024-01-01 00:00:10", "u1", "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id string, event_type string")
    got = {(r.prev_type, r.next_type): r.n
           for r in event_transitions(df).collect()}
    assert got == {("view", "click"): 1}


# ---------------------------------------------------------------------------
# scd2_intervals
# ---------------------------------------------------------------------------

def test_scd2_hand_case(spark):
    from text2nkg_spark.operators.temporal import scd2_intervals

    ev = spark.createDataFrame(
        [(1, 10, _ts(0.0), "A"),
         (2, 10, _ts(1.0), "A"),      # same run
         (3, 10, _ts(2.0), "B"),      # change -> new version
         (4, 10, _ts(3.0), "B"),
         (5, 10, _ts(4.0), "A"),      # back to A = a THIRD version
         (6, 10, None, "Z"),          # NULL ts: dropped, never a run
         (7, 20, _ts(0.0), None),     # NULL attr is a real run value
         (8, 20, _ts(1.0), None),     # ... and does NOT restart it
         (9, 20, _ts(2.0), "C")],
        "event_id long, user_id long, ts timestamp, event_type string")
    out = scd2_intervals(ev).orderBy("key", "version").collect()
    got = [(r.key, r.attr, r.version, r.eff_to_us == -1) for r in out]
    assert got == [
        (10, "A", 1, False), (10, "B", 2, False), (10, "A", 3, True),
        (20, None, 1, False), (20, "C", 2, True)]
    # intervals tile: each version's end == next version's start
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    for rows in by_key.values():
        for a, b in zip(rows, rows[1:]):
            assert a.eff_to_us == b.eff_from_us


def test_scd2_single_shuffle(spark):
    from text2nkg_spark.operators.temporal import scd2_intervals

    ev = spark.createDataFrame(
        [(1, 10, _ts(0.0), "A")],
        "event_id long, user_id long, ts timestamp, event_type string")
    plan = (scd2_intervals(ev)._jdf.queryExecution().executedPlan()
            .toString())
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# interval_overlap_pairs
# ---------------------------------------------------------------------------

def _brute_overlaps(rows):
    out = set()
    for a in rows:
        for b in rows:
            if (a[0] == b[0] and a[1] < b[1]
                    and a[2] <= b[3] and b[2] <= a[3]):
                out.add((a[0], a[1], b[1],
                         min(a[3], b[3]) - max(a[2], b[2])))
    return out


@pytest.mark.parametrize("bucket_us", [7, 1000])
def test_interval_overlap_matches_brute_force(spark, bucket_us):
    """Exact vs brute force with a bucket much SMALLER than the spans
    (multi-bucket explode path) and much larger (single-bucket path);
    includes equal starts, touching endpoints, zero-length intervals."""
    import random

    from text2nkg_spark.operators.temporal import interval_overlap_pairs

    rng = random.Random(7)
    rows = []
    for i in range(120):
        key = rng.randrange(4)
        s = rng.randrange(200)
        rows.append((key, i, s, s + rng.randrange(0, 40)))
    rows.append((0, 500, 10, 10))     # zero-length
    rows.append((0, 501, 10, 25))     # equal start with 500
    df = spark.createDataFrame(rows, "key long, id long, s long, e long")
    out = interval_overlap_pairs(
        df, key_col="key", id_col="id", start_us_col="s", end_us_col="e",
        bucket_us=bucket_us)
    got = {(r.key, r.ev_a, r.ev_b, r.overlap_us) for r in out.collect()}
    assert got == _brute_overlaps(rows)
    # exactly-once generation: no dedup pass hides double meetings
    assert out.count() == len(got)


def test_interval_overlap_is_equijoin(spark):
    from text2nkg_spark.operators.temporal import interval_overlap_pairs

    df = spark.createDataFrame(
        [(1, 1, 0, 10)], "key long, id long, s long, e long")
    plan = (interval_overlap_pairs(df, key_col="key", id_col="id",
                                   start_us_col="s", end_us_col="e")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


# ---------------------------------------------------------------------------
# kcore_nodes
# ---------------------------------------------------------------------------

def test_kcore_peels_pendant_chain(spark):
    from text2nkg_spark.operators.graph import kcore_nodes

    # triangle {a,b,c} + pendant chain c-d-e: e peels in round 1
    # (degree 1), which drops d to degree 1 for round 2; the triangle
    # is the 2-core
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e")],
        "surface_a string, surface_b string")
    out = kcore_nodes(edges, k=2, iterations=3).collect()
    assert {(r.node, r.core_degree) for r in out} == {
        ("a", 2), ("b", 2), ("c", 2)}


def test_kcore_fixed_rounds_not_fixpoint(spark):
    from text2nkg_spark.operators.graph import kcore_nodes

    # a 5-chain needs 2 peeling rounds to empty at k=2; with
    # iterations=1 the middle survives at degree 2 — the FIXED-round
    # contract the oracle mirrors
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "surface_a string, surface_b string")
    one = kcore_nodes(edges, k=2, iterations=1).collect()
    assert {(r.node, r.core_degree) for r in one} == {("c", 2)} | {
        ("b", 1), ("d", 1)}
    two = kcore_nodes(edges, k=2, iterations=2).collect()
    assert two == []


def test_interval_overlap_span_overflow_fails_loudly(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from text2nkg_spark.operators.temporal import interval_overlap_pairs

    df = spark.createDataFrame(
        [(1, 1, 0, 1000), (1, 2, 990, 995)],
        "key long, id long, s long, e long")
    # span 1000 us over 100 us buckets = 11 buckets > cap 4
    out = interval_overlap_pairs(
        df, key_col="key", id_col="id", start_us_col="s", end_us_col="e",
        bucket_us=100, max_span_buckets=4)
    with pytest.raises(SparkRuntimeException, match="max_span_buckets"):
        out.collect()
    # truncate_ok accepts the cap: id 1 only meets partners starting in
    # its first 4 buckets, so the (1, 2) pair starting at 990 is MISSED
    got = interval_overlap_pairs(
        df, key_col="key", id_col="id", start_us_col="s", end_us_col="e",
        bucket_us=100, max_span_buckets=4, truncate_ok=True).collect()
    assert got == []


def test_interval_overlap_rejects_nonpositive_cap(spark):
    from text2nkg_spark.operators.temporal import interval_overlap_pairs

    df = spark.createDataFrame(
        [(1, 1, 0, 10)], "key long, id long, s long, e long")
    with pytest.raises(ValueError, match="max_span_buckets"):
        interval_overlap_pairs(
            df, key_col="key", id_col="id", start_us_col="s",
            end_us_col="e", max_span_buckets=0)
