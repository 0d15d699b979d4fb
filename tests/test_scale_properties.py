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
    # projection pruned: unused columns absent from the ReadSchema lines
    # (whole-plan substring checks are brittle — see the tfidf test)
    schemas = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert schemas, p
    for ln in schemas:
        assert "l_partkey" not in ln and "l_suppkey" not in ln, ln


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


def test_brute_force_topk_guard(spark):
    """The exact-baseline cartesian is guarded: oversized query sides fail
    fast; within the bound the plan is a broadcast nested-loop (corpus
    streams once, query side never shuffles)."""
    import pytest as _pytest

    from text2nkg_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.limit(30).select(F.col("vec_id").alias("query_id"), "embedding")
    with _pytest.raises(ValueError, match="max_queries"):
        brute_force_topk(emb, q, k=3, max_queries=10)
    ok = brute_force_topk(emb, q, k=3, max_queries=100)
    p = _plan(ok)
    assert "BroadcastNestedLoopJoin" in p
    assert ok.where(F.col("rank") == 1).count() == 30


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


def test_ngram_jaccard_block_cap(spark):
    """The (block_cols, lb) blocks are width-capped before the quadratic
    self-join: W near-identical docs with cap C -> C*(C-1)/2 pairs (the
    kept doc_id prefix), not W*(W-1)/2 — and the capped plan carries the
    row_number window on the block key."""
    from text2nkg_spark.operators.dedup import ngram_jaccard_pairs

    w = 14
    docs = spark.range(w).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"),
        F.lit("the same bigram text block for every doc in the corpus")
        .alias("text"))
    capped = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=6)
    full = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket=0)
    assert full.count() == w * (w - 1) // 2
    rows = capped.collect()
    assert len(rows) == 6 * 5 // 2
    assert {r.a for r in rows} | {r.b for r in rows} == set(range(6))
    assert all(r.jaccard == 1.0 for r in rows)


def test_ngram_cap_mirrored_by_oracle(spark):
    """When the block cap BINDS at the entry's settings (sf0.01 has blocks
    wider than 32), Spark and the DuckDB oracle truncate identically."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    df = em.queries()["dedup_ngram_jaccard"](spark, sf)
    got = sorted((r.a, r.b, round(r.jaccard, 9)) for r in df.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = sorted((a, b, round(j, 9)) for a, b, j in con.execute(
        em.oracle_sql()["dedup_ngram_jaccard"]).fetchall())
    assert got == want


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


def test_bloom_probe_is_pure_filter(spark):
    """The bloom folds into the big-side scan: no Join, no Exchange —
    membership is a literal-array filter expression."""
    from text2nkg_spark.operators.sketches import bloom_filter_expr

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    words = [0] * 32
    probe = li.where(bloom_filter_expr(words, F.col("l_orderkey")))
    p = _plan(probe)
    assert "Join" not in p and "Exchange" not in p


def test_ivf_centroid_side_is_broadcast(spark):
    """Centroid assignment must never shuffle the corpus against the
    cells — the n_cells rows broadcast."""
    from text2nkg_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    p = _plan(ivf_topk(emb, q, k=5, n_cells=4, n_probe=2))
    assert "Broadcast" in p
    assert "CartesianProduct" not in p


def test_range_join_plans_hash_join(spark):
    """The bucketed range join must plan an equi-join on (group, bucket),
    never a nested-loop over the inequality."""
    from text2nkg_spark.operators.temporal import range_pair_counts

    e = spark.read.parquet(f"{SF}/events.parquet")
    p = _plan(range_pair_counts(e, delta_us=120_000_000))
    assert "HashJoin" in p or "SortMergeJoin" in p
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p


def test_tfidf_reads_only_needed_columns(spark):
    p = _plan(em.queries()["text_tfidf_topk"](spark, SF))
    # scan prunes to the two consumed columns: assert on the ReadSchema
    # line itself (raw substring checks over the whole plan are brittle —
    # column names can appear in unrelated plan text)
    schemas = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert schemas, p
    for ln in schemas:
        assert "doc_id" in ln and "text" in ln, ln
        assert ("lang" not in ln and "source" not in ln
                and "n_chars" not in ln), ln


def test_corpus_prep_pipeline_plan_shape(spark):
    """The composed prep pipeline prunes the documents scan to its three
    consumed columns and never plans a cartesian/BNLJ — its only wide ops
    are the dedup window, the shard window, and the final aggregate."""
    p = _plan(em.queries()["corpus_prep_pipeline"](spark, SF))
    schemas = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert schemas, p
    for ln in schemas:
        assert "source" not in ln and "n_chars" not in ln, ln
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_triangles_all_joins_are_hash_joins(spark):
    # compact-forward enumeration: three equi-join legs, never a
    # cartesian / nested-loop (the wedge condition rides the src key)
    p = _plan(em.queries()["nkg_triangles"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_fuzzy_pairs_join_is_equijoin(spark):
    # deletion-neighborhood blocking: the candidate join keys on the
    # variant string — an all-pairs levenshtein would plan a BNLJ
    p = _plan(em.queries()["nkg_fuzzy_surfaces"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pii_scrub_reads_only_needed_columns(spark):
    p = _plan(em.queries()["text_pii_scrub"](spark, SF))
    schemas = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert schemas, p
    for ln in schemas:
        assert "lang" not in ln and "n_chars" not in ln, ln


def test_resample_grid_join_is_keyed(spark):
    # the grid joins observations on (key, bucket) — a hash join; the
    # sequence explode is the only row-amplifying stage
    p = _plan(em.queries()["events_resample_ffill"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Generate" in p  # the sequence-explode grid stage is present
