"""The headline parity claim on the PRIMARY schema: gold-scored
hyperrelation extraction over the reference's own dev corpus (1000 docs),
scored with the reference's own golden-set metrics (A2/A3)."""

import os

import pytest
from pyspark.sql import functions as F

from text2nkg_spark.config import PipelineConfig
from text2nkg_spark.operators.extraction import extract_facts_fused
from text2nkg_spark.operators.metrics import relation_qualifier_prf
from text2nkg_spark.sources.io import load_label_space_json, read_reference_jsonl

REF = "/root/reference/datasets/hyperred_processed_data/hyperred_hyperrelation"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/dev.json"), reason="reference data missing")


@pytest.fixture(scope="module")
def corpus(spark):
    from text2nkg_spark.operators.normalize import (
        normalize_reference_docs, with_line_numbers)

    docs = with_line_numbers(read_reference_jsonl(spark, f"{REF}/dev.json"))
    norm = normalize_reference_docs(docs, "hyperrelation")
    # adapt to the transcript-pipeline contract: one turn per sentence
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
    )
    gold = sents.select(
        "conv_id", "turn_idx", F.col("gold_relations").alias("relations"))
    return sents.cache(), gold.cache()


def test_unidirect_parity_on_reference_dev(spark, corpus):
    """--eval_unidirect ablation parity on the reference's own dev corpus:
    per-sentence engine decode == oracle transcription, bit-for-bit, over
    real mention geometries (hash logits exercise every decode branch)."""
    import numpy as np

    from text2nkg_spark.candidates import enumerate_triples
    from text2nkg_spark.decode_core import decode_sentence_unidirect
    from text2nkg_spark.reference_oracle import decode_sentence
    from text2nkg_spark.scoring_core import hash_logits, log_softmax

    sents, _gold = corpus
    space, _raw = load_label_space_json(f"{REF}/label.json")
    rows = (sents.select("conv_id", "turn_idx", "m_starts", "m_ends")
            .limit(200).collect())
    n_nonempty = 0
    for row in rows:
        if not row.m_starts or len(row.m_starts) < 2:
            continue
        ents = np.column_stack([
            np.asarray(row.m_starts, dtype=np.int64),
            np.asarray(row.m_ends, dtype=np.int64)])
        # the fused path dedups identical spans before enumeration
        _, first = np.unique(
            ents[:, 0] * 1_000_003 + ents[:, 1], return_index=True)
        ents = ents[np.sort(first)]
        cand = enumerate_triples(ents, 256)
        if cand.shape[0] == 0:
            continue
        doc_id = int(row.conv_id[4:])
        rel_lg = log_softmax(hash_logits(
            doc_id, int(row.turn_idx), cand[:, 4:10], space.num_classes,
            3, 0))
        q_lg = log_softmax(hash_logits(
            doc_id, int(row.turn_idx), cand[:, 4:10], space.num_classes,
            3, 1))
        got = decode_sentence_unidirect(ents, cand, rel_lg, q_lg, space)
        spans = [tuple(int(x) for x in r) for r in ents]
        pd_ = {}
        for n, crow in enumerate(cand):
            key = (spans[int(crow[1])], spans[int(crow[2])],
                   spans[int(crow[3])])
            pd_[key] = (rel_lg[n].tolist(), "Entity", q_lg[n].tolist(),
                        "Entity")
        want = decode_sentence(pd_, space, unidirect=True)
        assert len(got) == len(want), (row.conv_id, row.turn_idx)
        for g, w in zip(got, want):
            assert ((g[0], g[1]), (g[2], g[3]), g[4], (g[5], g[6]),
                    g[7]) == w, (row.conv_id, row.turn_idx)
        n_nonempty += 1
    assert n_nonempty > 100  # the comparison actually exercised dev


def test_hyperrelation_parity_on_reference_dev(spark, corpus):
    sents, gold = corpus
    space, _raw = load_label_space_json(f"{REF}/label.json")
    cfg = PipelineConfig(scorer="gold")
    preds = extract_facts_fused(sents, cfg, space).cache()

    m = relation_qualifier_prf(preds, gold)
    assert m["num_q_ans"] == 1342  # survey-counted dev qualifiers
    assert m["num_r_ans"] == 1201

    # Precision is perfect, and recall hits EXACTLY the reference
    # algorithm's theoretical ceiling: the decode emits one fact per
    # unordered non-degenerate span triple (visited-set semantics), and dev
    # has exactly 1253 such distinct triples for its 1342 gold qualifiers —
    # measured q_cor == 1253 == the ceiling, i.e. the engine realizes the
    # reference's exact attainable performance on its own corpus.
    assert m["q_p"] == 1.0, m
    assert m["p"] == 1.0, m
    assert m["correct_q"] == 1253, m
    assert m["q_r"] >= 1253 / 1342 - 1e-9, m
