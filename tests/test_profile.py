"""profile_table: metric correctness, one-scan plan shape, typed
min/max routing, unsupported-type fail-fast."""

import pytest
from pyspark.sql import functions as F

from text2nkg_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(1, 10.5, "b"),
         (2, None, "a"),
         (3, 10.5, None),
         (None, -2.0, "a")],
        "k long, v double, s string")


def test_profile_metrics(frame):
    rows = {r["column"]: r for r in
            profile_table(frame, ["k", "v", "s"]).collect()}
    assert set(rows) == {"k", "v", "s"}
    k = rows["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (4, 1, 3)
    assert (k.min_d, k.max_d, k.min_s, k.max_s) == (1.0, 3.0, None, None)
    v = rows["v"]
    assert (v.n_nulls, v.n_distinct, v.min_d, v.max_d) == (1, 2, -2.0, 10.5)
    s = rows["s"]
    assert (s.n_nulls, s.n_distinct) == (1, 2)
    assert (s.min_d, s.max_d, s.min_s, s.max_s) == (None, None, "a", "b")


def test_profile_single_scan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    ).write.parquet(p)
    out = profile_table(spark.read.parquet(p), ["id", "v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole profile rides ONE scan of the table — a per-column-job
    # profiler would show one scan per metric family
    assert plan.count("Scan parquet") == 1, plan
    assert out.count() == 2


def test_profile_rejects_unsupported_type(spark):
    df = spark.createDataFrame([(1,)], "k long").select(
        F.current_timestamp().alias("ts"))
    with pytest.raises(ValueError, match="unsupported type"):
        profile_table(df, ["ts"])


def test_profile_empty_input(spark):
    # the per-column SQL-aggregate contract: one row per column with
    # zero counts even when the input has no rows
    df = spark.createDataFrame([], "k long, s string").where("k > 0")
    rows = {r["column"]: r for r in profile_table(df, ["k", "s"]).collect()}
    assert set(rows) == {"k", "s"}
    for r in rows.values():
        assert (r.n_rows, r.n_nulls, r.n_distinct) == (0, 0, 0)
        assert (r.min_d, r.max_d, r.min_s, r.max_s) == (
            None, None, None, None)


def test_profile_rejects_missing_column(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="not in DataFrame schema"):
        profile_table(df, ["nope"])


def test_profile_rejects_duplicate_and_empty_columns(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="duplicate column"):
        profile_table(df, ["k", "k"])
    with pytest.raises(ValueError, match="non-empty"):
        profile_table(df, [])
