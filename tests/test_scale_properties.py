"""Physical-plan scale properties: pushdown, pruning, partition pruning,
shuffle-freeness — asserted on actual explain output, not hand-waved."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_column_pruning(spark):
    p = _plan(em.queries()["pricing_summary"](spark, SF))
    assert "LessThanOrEqual(l_shipdate" in p, "filter not pushed to scan"
    # projection pruned: unused columns absent from ReadSchema
    assert "l_partkey" not in p and "l_suppkey" not in p


def test_broadcast_join_for_dimensions(spark):
    p = _plan(em.queries()["revenue_by_nation"](spark, SF))
    assert "BroadcastHashJoin" in p


def test_extraction_is_shuffle_free(spark):
    """The 100 TB property: scan -> mapInPandas -> facts, zero Exchange."""
    p = _plan(em.queries()["nkg_extract_facts"](spark, SF))
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_partition_pruning_on_bucketed_facts(spark, tmp_path):
    """Facts written partitionBy(conv_bucket) prune to one partition dir."""
    from text2nkg_spark.config import DataGenConfig, PipelineConfig
    from text2nkg_spark.datagen import gen_transcripts_pdf
    from text2nkg_spark.plans.pipeline import run_pipeline

    tr = spark.createDataFrame(
        gen_transcripts_pdf(DataGenConfig(n_convs=12, turns_per_conv=4, seed=9)))
    out = run_pipeline(spark, tr, str(tmp_path / "pipe"),
                       PipelineConfig(scorer="hash"))
    preds = spark.read.parquet(str(tmp_path / "pipe" / "predictions"))
    pruned = preds.where(F.col("conv_bucket") == 3)
    p = _plan(pruned)
    assert "PartitionFilters" in p
    assert "conv_bucket" in p.split("PartitionFilters", 1)[1][:200]


def test_embedding_pairs_join_is_bucket_blocked(spark):
    """No unblocked self-join: the default embedding near-dup plan joins on
    the hyperplane bucket (equi-join), never a nested-loop cartesian."""
    from text2nkg_spark.operators.dedup import embedding_cosine_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = _plan(embedding_cosine_pairs(emb, threshold=0.5))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "_bkt" in p, "hyperplane bucket missing from join plan"


def test_lsh_bucket_width_cap(spark):
    """Degenerate LSH buckets are truncated: with W identical docs and a
    cap of C, the banded self-join sees at most C rows per bucket, so pair
    counts are C*(C-1)/2 instead of W*(W-1)/2."""
    from text2nkg_spark.operators.dedup import minhash_lsh_pairs

    w = 12
    docs = spark.range(w).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate text repeated across the corpus")
        .alias("text"))
    capped = minhash_lsh_pairs(docs, max_bucket=5).count()
    full = minhash_lsh_pairs(docs, max_bucket=0).count()
    assert full == w * (w - 1) // 2
    assert capped == 5 * 4 // 2
    # the kept prefix still pairs the duplicate-cluster members together
    kept = minhash_lsh_pairs(docs, max_bucket=5).collect()
    assert all(r.jaccard == 1.0 for r in kept)


def test_rollup_oracle(spark):
    """orders_rollup matches DuckDB GROUP BY ROLLUP (subtotal NULLs incl.)."""
    import tests.test_entry_contract as tc

    df = em.queries()["orders_rollup"](spark, SF)
    sr = [tuple(r) for r in df.collect()]
    con = tc._duck(SF)
    res = con.execute(em.oracle_sql()["orders_rollup"])
    a = tc._rows_multiset(list(df.columns), sr)
    b = tc._rows_multiset([d[0] for d in res.description], res.fetchall())
    assert a == b


def test_simhash_cap_mirrored_by_oracle(spark):
    """When the bucket cap BINDS (30 identical docs, cap 10), Spark and the
    DuckDB oracle truncate identically: C(10,2) pairs, same ids."""
    import duckdb

    import __spark_entry__ as em
    from text2nkg_spark.operators.dedup import simhash_pairs

    df = spark.range(30).selectExpr(
        "id AS doc_id", "'identical text for the cap probe here' AS text")
    got = sorted((r.a, r.b, r.hamming)
                 for r in simhash_pairs(df, max_hamming=6,
                                        max_bucket=10).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT range AS doc_id, "
        "'identical text for the cap probe here' AS text FROM range(30)")
    want = sorted(con.execute(
        em._simhash_oracle_sql(max_hamming=6, max_bucket=10)).fetchall())
    assert got == want and len(got) == 10 * 9 // 2
