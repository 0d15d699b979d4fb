"""ACE05 hyper-event corpora (hyperace05_data_process.ipynb output): the
same normalized doc format as HyperRED with a second NER class (Trigger),
consumed by the existing pipeline unchanged.  The hyperrelation parity
assertion mirrors tests/test_reference_corpus_hyperrelation.py with the
recall ceiling COMPUTED from the corpus (one fact per distinct
non-degenerate unordered span triple — the reference decode's visited-set
semantics)."""

import os

import pytest
from pyspark.sql import functions as F

from text2nkg_spark.config import PipelineConfig
from text2nkg_spark.operators.extraction import extract_facts_fused
from text2nkg_spark.operators.metrics import relation_qualifier_prf
from text2nkg_spark.sources.io import (
    load_label_space_json, read_reference_jsonl)

ACE = "/root/reference/datasets/hyperace05_processed_data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{ACE}/hyperace05_hyperrelation/dev.json"),
    reason="hyperace05 data missing")


def _corpus(spark, schema):
    from text2nkg_spark.operators.normalize import (
        normalize_reference_docs, with_line_numbers)

    docs = with_line_numbers(read_reference_jsonl(
        spark, f"{ACE}/hyperace05_{schema}/dev.json"))
    return normalize_reference_docs(docs, schema)


def test_hyperace05_normalizes_all_schemas(spark):
    for schema in ("hyperrelation", "event", "role", "hypergraph"):
        norm = _corpus(spark, schema)
        n = norm.count()
        n_rel = norm.agg(F.sum(F.size("relations"))).collect()[0][0]
        assert n > 0 and n_rel > 50, (schema, n, n_rel)
        # two NER classes survive normalization (Entity + Trigger)
        labs = {
            r[0]
            for r in norm.select(F.explode("ner").alias("m"))
            .select("m.label").distinct().collect()
        }
        assert "Entity" in labs, (schema, labs)


def test_hyperace05_hyperrelation_parity(spark):
    norm = _corpus(spark, "hyperrelation")
    sents = norm.select(
        F.concat(F.lit("conv"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.col("sent_idx").cast("int").alias("turn_idx"),
        F.array_join("tokens", " ").alias("text"),
        F.transform("ner", lambda m: m["start"]).alias("m_starts"),
        F.transform("ner", lambda m: m["end"]).alias("m_ends"),
        F.transform(
            "relations",
            lambda r: F.struct(
                r["h_s"].alias("h_s"), r["h_e"].alias("h_e"),
                r["t_s"].alias("t_s"), r["t_e"].alias("t_e"),
                r["rel"].alias("rel"), r["quals"].alias("quals"))
        ).alias("gold_relations"),
    ).cache()
    gold = sents.select(
        "conv_id", "turn_idx",
        F.col("gold_relations").alias("relations")).cache()

    space, _raw = load_label_space_json(
        f"{ACE}/hyperace05_hyperrelation/label.json")
    preds = extract_facts_fused(
        sents, PipelineConfig(scorer="gold"), space).cache()
    m = relation_qualifier_prf(preds, gold)

    # ceiling = # distinct non-degenerate unordered (h, t, q) span triples
    # across gold qualifiers (visited-set semantics: one fact per triple)
    ceiling = (
        gold.select("conv_id", "turn_idx", F.explode("relations").alias("x"))
        .select("conv_id", "turn_idx", "x.*")
        .select("conv_id", "turn_idx", "h_s", "h_e", "t_s", "t_e",
                F.explode("quals").alias("q"))
        .where(
            ~((F.col("h_s") == F.col("q.q_s")) & (F.col("h_e") == F.col("q.q_e")))
            & ~((F.col("t_s") == F.col("q.q_s")) & (F.col("t_e") == F.col("q.q_e")))
            & ~((F.col("h_s") == F.col("t_s")) & (F.col("h_e") == F.col("t_e"))))
        .select(
            "conv_id", "turn_idx",
            F.array_sort(F.array(
                F.struct(F.col("h_s").alias("s"), F.col("h_e").alias("e")),
                F.struct(F.col("t_s").alias("s"), F.col("t_e").alias("e")),
                F.struct(F.col("q.q_s").alias("s"), F.col("q.q_e").alias("e")),
            )).alias("triple"))
        .distinct().count()
    )
    assert m["num_q_ans"] > 100
    assert m["q_p"] == 1.0 and m["p"] == 1.0, m
    assert m["correct_q"] == ceiling, (m, ceiling)
