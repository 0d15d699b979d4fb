"""Structured Streaming ingestion == batch results (availableNow parity)."""

import os

import pytest
from pyspark.sql import functions as F

from text2nkg_spark.config import DataGenConfig, PipelineConfig
from text2nkg_spark.datagen import gen_transcripts_pdf
from text2nkg_spark.operators.extraction import extract_facts_fused
from text2nkg_spark.operators.mentions import detect_mentions
from text2nkg_spark.plans.pipeline import (
    default_label_space, prepare_sentences)
from text2nkg_spark.streaming.ingest import (
    run_to_parquet, running_conv_stats, stream_extract_facts,
    stream_transcripts, windowed_turn_counts)

GEN = DataGenConfig(n_convs=30, turns_per_conv=6, seed=3)


@pytest.fixture(scope="module")
def tr_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    pdf = gen_transcripts_pdf(GEN)
    spark.createDataFrame(pdf).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).repartition(6).write.mode("overwrite").parquet(str(d / "tr"))
    return str(d / "tr")


def test_stream_extraction_equals_batch(spark, tr_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("stream_out")
    cfg = PipelineConfig(scorer="hash")
    space = default_label_space()

    stream = stream_transcripts(spark, tr_dir)
    assert stream.isStreaming
    q = run_to_parquet(
        stream_extract_facts(stream, cfg, space),
        str(out / "facts"), str(out / "ckpt"))
    q.awaitTermination(120)

    got = spark.read.parquet(str(out / "facts"))
    batch_in = spark.read.parquet(tr_dir)
    want = extract_facts_fused(
        prepare_sentences(batch_in), cfg, space)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_stream_restart_processes_only_new_files(spark, tr_dir,
                                                 tmp_path_factory):
    """Checkpointed restart = incremental exactly-once: after the first
    availableNow drain finishes, new input files land and the SAME query
    (same checkpoint + sink) restarts — the old files must not be
    reprocessed (no duplicate facts) and the new ones must be picked up,
    so the final sink equals one batch extraction over the union."""
    d = tmp_path_factory.mktemp("stream_restart")
    in_dir, out_dir, ckpt = str(d / "in"), str(d / "out"), str(d / "ckpt")
    first = spark.read.parquet(tr_dir)
    first.write.mode("overwrite").parquet(in_dir)

    cfg = PipelineConfig(scorer="hash")
    space = default_label_space()

    def drain():
        q = run_to_parquet(
            stream_extract_facts(stream_transcripts(spark, in_dir),
                                 cfg, space), out_dir, ckpt)
        # fail LOUD on timeout: proceeding with the first query still
        # active would hand the second drain a checkpoint-in-use error
        assert q.awaitTermination(120), "drain did not finish in 120 s"

    drain()
    n_first = spark.read.parquet(out_dir).count()
    assert n_first > 0

    # second wave: brand-new conversations arrive as new files
    second = first.withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("_wave2")))
    second.write.mode("append").parquet(in_dir)
    drain()

    got = spark.read.parquet(out_dir)
    want = extract_facts_fused(
        prepare_sentences(spark.read.parquet(in_dir)), cfg, space)
    # multiset equality: any reprocessing of wave-1 files would duplicate
    # their facts and fail exceptAll in the got->want direction (NOT
    # 2*n_first — sentence merge dedups wave-2's identical texts across
    # conversations, exactly as one batch over the union would)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > n_first
    assert got.where(F.col("conv_id").endswith("_wave2")).count() > 0


def test_windowed_counts_match_batch(spark, tr_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("win_out")
    stream = stream_transcripts(spark, tr_dir)
    q = run_to_parquet(
        windowed_turn_counts(stream), str(out / "win"), str(out / "ckpt"))
    q.awaitTermination(120)
    got = spark.read.parquet(str(out / "win"))

    batch = spark.read.parquet(tr_dir)
    want = (
        batch.groupBy(F.window("ts", "10 minutes").alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.sum(F.length("text")).alias("n_chars"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "role", "n_turns", "n_chars")
    )
    # append mode emits a window only once the watermark passes it; windows
    # still open when the availableNow drain finishes are held in state and
    # never emitted — so: no spurious rows, and anything missing lies inside
    # the final watermark horizon (max_ts - 30 minutes).
    assert got.exceptAll(want).count() == 0
    missing = want.exceptAll(got)
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    late_horizon = F.lit(max_ts) - F.expr("INTERVAL 30 MINUTES")
    assert missing.where(F.col("window_end") <= late_horizon).count() == 0


def test_running_conv_stats_final_state(spark, tr_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("state_out")
    stream = stream_transcripts(spark, tr_dir)
    q = run_to_parquet(
        running_conv_stats(stream), str(out / "stats"), str(out / "ckpt"),
        output_mode="update")
    q.awaitTermination(120)
    got = spark.read.parquet(str(out / "stats"))
    # last update per conv must equal the batch totals
    final = (
        got.groupBy("conv_id")
        .agg(F.max("n_turns").alias("n_turns"), F.max("n_chars").alias("n_chars"))
    )
    batch = spark.read.parquet(tr_dir)
    want = batch.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.length("text")).alias("n_chars"))
    assert final.exceptAll(want).count() == 0
    assert want.exceptAll(final).count() == 0


def test_stream_dedup_within_watermark(spark, tr_dir, tmp_path_factory):
    """Duplicated input files collapse to the distinct turn set — with
    state BOUNDED by the watermark horizon, not a forever-growing store."""
    from text2nkg_spark.streaming.ingest import dedup_turns_within_watermark

    d = tmp_path_factory.mktemp("stream_dedup")
    dup_dir = str(d / "in")
    batch = spark.read.parquet(tr_dir)
    # write the same turns twice -> every row is a duplicate
    batch.write.mode("overwrite").parquet(dup_dir)
    batch.write.mode("append").parquet(dup_dir)

    stream = stream_transcripts(spark, dup_dir)
    deduped = dedup_turns_within_watermark(stream)
    out_dir = str(d / "out")
    q = run_to_parquet(deduped, out_dir, str(d / "ckpt"))
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    n_distinct = batch.select("conv_id", "turn_idx", "text").distinct().count()
    assert got.count() == n_distinct
    assert got.select("conv_id", "turn_idx").distinct().count() == n_distinct
