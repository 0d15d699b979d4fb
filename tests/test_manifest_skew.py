"""Checkpoint manifests (exact resume) + skew-splitting equivalence."""

import pytest
from pyspark.sql import functions as F

from text2nkg_spark.config import DataGenConfig, PipelineConfig
from text2nkg_spark.datagen import gen_transcripts_pdf
from text2nkg_spark.operators.extraction import (
    decode_scores, extract_facts_fused, score_candidates,
    split_dense_sentences)
from text2nkg_spark.plans.manifest import (
    StageManifest, input_fingerprint, partition_stats)
from text2nkg_spark.plans.pipeline import default_label_space, prepare_sentences

GEN = DataGenConfig(n_convs=25, turns_per_conv=6, seed=21,
                    mention_density_skew=0.3)  # plenty of dense turns


@pytest.fixture(scope="module")
def tr(spark):
    return spark.createDataFrame(gen_transcripts_pdf(GEN)).cache()


def test_run_stage_builds_then_resumes(spark, tr, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("manifest"))
    man = StageManifest(root)
    fp = input_fingerprint(tr)

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return tr.select("conv_id", "turn_idx", "text")

    df1 = man.run_stage(spark, "proj", fp, build)
    assert calls["n"] == 1
    n1 = df1.count()

    # resume: same fingerprint -> no rebuild, identical data
    df2 = man.run_stage(spark, "proj", fp, build)
    assert calls["n"] == 1
    assert df2.count() == n1

    # changed input -> rebuild
    df3 = man.run_stage(spark, "proj", fp + "x", build)
    assert calls["n"] == 2
    assert df3.count() == n1

    meta = man.read_meta("proj")
    assert meta["complete"] and meta["rows_out"] == n1
    assert len(meta["partitions"]) >= 1
    assert sum(p["rows"] for p in meta["partitions"]) == n1


def test_partition_stats_cover_all_rows(spark, tr):
    st = partition_stats(tr.repartition(7)).collect()
    assert sum(r.rows for r in st) == tr.count()


def test_split_dense_two_stage_equals_fused(spark, tr):
    """Skew-split two-stage extraction == fused extraction, exactly."""
    cfg = PipelineConfig(scorer="hash")
    space = default_label_space()
    sents = prepare_sentences(tr)

    fused = extract_facts_fused(sents, cfg, space).select(
        "conv_id", "turn_idx", "pred_idx", "m1s", "m1e", "m2s", "m2e",
        "rel", "m3s", "m3e", "qual")

    split = split_dense_sentences(sents, max_cost=200)
    # dense turns (12 mentions -> E^3 = 1728) must actually split
    n_rows = split.count()
    n_sents = sents.where(F.size("m_starts") > 0).count()
    assert n_rows > n_sents

    cand = score_candidates(split, cfg, space)
    two = decode_scores(cand, cfg, space).select(
        "conv_id", "turn_idx", "pred_idx", "m1s", "m1e", "m2s", "m2e",
        "rel", "m3s", "m3e", "qual")

    assert fused.exceptAll(two).count() == 0
    assert two.exceptAll(fused).count() == 0


def test_run_pipeline_end_to_end_and_resume(spark, tr, tmp_path_factory):
    from text2nkg_spark.plans.pipeline import run_pipeline

    root = str(tmp_path_factory.mktemp("pipe"))
    cfg = PipelineConfig(scorer="hash")
    out = run_pipeline(spark, tr, root, cfg)
    n_facts = out["facts"].count()
    assert n_facts > 0
    assert out["main_triples"].count() > 0
    assert out["entities"].count() > 0

    man = StageManifest(root)
    walls = {s: man.read_meta(s)["wall_s"]
             for s in ("sentences", "predictions", "facts", "compacted")}

    # full rerun: every stage resumes from its manifest (wall_s unchanged)
    out2 = run_pipeline(spark, tr, root, cfg)
    for s, w in walls.items():
        assert man.read_meta(s)["wall_s"] == w
    assert out2["facts"].count() == n_facts

    # simulate a crash that lost one stage: only that stage rebuilds
    import os
    os.remove(os.path.join(root, "facts.manifest.json"))
    out3 = run_pipeline(spark, tr, root, cfg)
    assert man.read_meta("facts")["wall_s"] != walls["facts"]
    assert man.read_meta("predictions")["wall_s"] == walls["predictions"]
    assert out3["facts"].count() == n_facts


def test_metrics_sink_table(spark, tr, tmp_path_factory):
    """S6: run_pipeline writes a queryable long-format metrics table whose
    rows_out values match the actual stage outputs."""
    import os

    from text2nkg_spark.plans.pipeline import run_pipeline

    root = str(tmp_path_factory.mktemp("pipe_metrics"))
    out = run_pipeline(spark, tr, root, PipelineConfig(scorer="hash"))
    m = spark.read.parquet(os.path.join(root, "metrics"))
    assert set(m.columns) == {"stage", "metric", "value"}
    got = {(r.stage, r.metric): r.value for r in m.collect()}
    assert got[("facts", "rows_out")] == out["facts"].count()
    assert got[("entities", "rows_out")] == out["entities"].count()
    assert got[("predictions", "n_partitions")] >= 1
    assert all(got[(s, "wall_s")] >= 0 for s in ("sentences", "facts"))


def test_resume_key_covers_semantic_config(spark, tr, tmp_path_factory):
    """Changing a prediction-shaping config field (tokenizer) on the same
    out_root must REBUILD the predictions stage, not serve stale parquet."""
    from text2nkg_spark.plans.pipeline import run_pipeline

    root = str(tmp_path_factory.mktemp("pipe_fp"))
    run_pipeline(spark, tr, root, PipelineConfig(scorer="hash"))
    man = StageManifest(root)
    fp_before = man.read_meta("predictions")["input_fingerprint"]
    run_pipeline(spark, tr, root,
                 PipelineConfig(scorer="hash", tokenizer="wordpiece",
                                max_seq_length=64))
    fp_after = man.read_meta("predictions")["input_fingerprint"]
    assert fp_before != fp_after
    # the unidirect ablation also shapes predictions (review-found gap:
    # the key originally omitted it and served stale ensembled parquet)
    run_pipeline(spark, tr, root,
                 PipelineConfig(scorer="hash", eval_unidirect=True))
    fp_uni = man.read_meta("predictions")["input_fingerprint"]
    assert fp_uni not in (fp_before, fp_after)
