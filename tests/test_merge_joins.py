"""merge_upsert latest-wins semantics + salted_equi_join result parity."""

import pytest
from pyspark.sql import functions as F

from text2nkg_spark.operators.joins import salted_equi_join
from text2nkg_spark.operators.merge import merge_upsert


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double")
    upd = spark.createDataFrame(
        [(2, "B", 21.0), (4, "d", 40.0)], "k long, s string, v double")
    got = {r.k: (r.s, r.v) for r in merge_upsert(base, upd, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 21.0),
                   3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_tiebreak_deterministic(spark):
    """Duplicate keys WITHIN the updates side resolve by the tiebreak
    column, independent of partitioning."""
    base = spark.createDataFrame([(1, 0, "base")], "k long, seq long, s string")
    upd = spark.createDataFrame(
        [(1, 1, "first"), (1, 2, "second")], "k long, seq long, s string")
    for parts in (1, 7):
        got = merge_upsert(
            base.repartition(parts), upd.repartition(parts),
            ["k"], tiebreak=["seq"]).collect()
        assert [(r.k, r.seq, r.s) for r in got] == [(1, 2, "second")]


def test_salted_join_equals_plain_join(spark):
    li = spark.createDataFrame(
        [(k, ln, float(k * 10 + ln)) for k in range(1, 30)
         for ln in range(1, 1 + k % 5)],
        "k long, ln int, price double")
    dim = spark.createDataFrame(
        [(k, f"p{k % 3}") for k in range(1, 40)], "k long, prio string")
    plain = sorted(map(tuple, li.join(dim, "k").collect()))
    for n_salts in (1, 8):
        salted = sorted(map(tuple, salted_equi_join(
            li, dim, "k", n_salts=n_salts, salt_src="ln").collect()))
        assert salted == plain


def test_salted_join_requires_salt_src(spark):
    df = spark.createDataFrame([(1, 1)], "k long, ln int")
    with pytest.raises(ValueError, match="salt_src"):
        salted_equi_join(df, df, "k")


def test_salted_join_replicates_other_side(spark):
    """The dimension side carries one copy per salt in the plan (the
    explode), and the fact side's salt spreads rows across sub-keys."""
    li = spark.createDataFrame(
        [(1, ln) for ln in range(64)], "k long, ln int")
    dim = spark.createDataFrame([(1, "x")], "k long, s string")
    j = salted_equi_join(li, dim, "k", n_salts=8, salt_src="ln")
    assert j.count() == 64
    salts = (li.withColumn(
        "_salt", (F.crc32(F.col("ln").cast("string")) % 8).cast("int"))
        .select("_salt").distinct().count())
    assert salts > 1  # the hot key genuinely fans out


def test_snapshot_diff_semantics(spark):
    from text2nkg_spark.operators.merge import snapshot_diff

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 10.0),         # unchanged -> no row
         (2, "B", 20.0),         # value change -> U
         (3, "c", 30.0),         # NULL -> value transition -> U
         (5, "e", 50.0)],        # new key -> I; key 4 deleted -> D
        "k long, s string, v double")
    got = {r.k: (r.change_type, r.s, r.v)
           for r in snapshot_diff(base, new, ["k"]).collect()}
    assert got == {2: ("U", "B", 20.0), 3: ("U", "c", 30.0),
                   5: ("I", "e", 50.0), 4: ("D", "d", 40.0)}


def test_snapshot_diff_inverts_merge(spark):
    # diff(base, merge_upsert(base, u)) recovers exactly u's effective
    # changes — the docstring property
    from text2nkg_spark.operators.merge import merge_upsert, snapshot_diff

    base = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(20)],
        "k long, s string, v double")
    upd = spark.createDataFrame(
        [(3, "s3", 3.0),      # no-op update: merge keeps it, diff drops it
         (7, "S7", 7.0),      # real update
         (25, "s25", 25.0)],  # insert
        "k long, s string, v double")
    merged = merge_upsert(base, upd, keys=["k"])
    got = {r.k: r.change_type
           for r in snapshot_diff(base, merged, ["k"]).collect()}
    assert got == {7: "U", 25: "I"}


def test_snapshot_diff_column_mismatch_raises(spark):
    from text2nkg_spark.operators.merge import snapshot_diff

    a = spark.createDataFrame([(1, "x")], "k long, s string")
    b = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="column mismatch"):
        snapshot_diff(a, b, ["k"])


def test_salted_join_plan_joins_on_salt(spark):
    """The physical join keys must include the salt column (that IS the
    skew mitigation — without it the operator silently degenerates to a
    plain hot-key join), and no cartesian/BNLJ may appear."""
    li = spark.createDataFrame(
        [(1, i) for i in range(20)], "k long, ln long")
    dim = spark.createDataFrame([(1, "x")], "k long, name string")
    j = salted_equi_join(li, dim, "k", n_salts=4, salt_src="ln")
    p = j._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_merge_upsert_single_shuffle(spark):
    """Latest-wins merge is ONE keyed shuffle: union is shuffle-free and
    the row_number window rides a single hash-partition Exchange."""
    from text2nkg_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    upd = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    out = merge_upsert(base, upd, keys=["k"])
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1, p
