"""M5 — NER-argmax mode: the model NER head, the mode dispatch, the
*_with_ner counters, and the reference's load-bearing quirks (pos2ner
rebuild makes emitted facts mode-invariant; shipped refine is identity)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from text2nkg_spark.candidates import enumerate_triples
from text2nkg_spark.config import PipelineConfig
from text2nkg_spark.operators.model_scorer import ModelScorer
from text2nkg_spark.operators.ner import (
    input_ner_table, mention_ner_table, predicted_ner_table)


def test_predict_mention_ner_deterministic_and_wiring_sensitive():
    sc = ModelScorer("mini", max_seq_length=64, max_pair_length=8,
                     num_classes=7)
    tokens = "the ent1 saw ent2 near ent3 now".split()
    ents = np.array([[1, 1], [3, 3], [5, 5]])
    a = sc.predict_mention_ner(tokens, ents, 4)
    b = sc.predict_mention_ner(tokens, ents, 4)
    assert a.shape == (3,) and np.array_equal(a, b)
    assert ((a >= 0) & (a < 4)).all()
    # moving a span changes its marker positions -> its prediction stream
    ents2 = np.array([[1, 1], [3, 3], [6, 6]])
    c = sc.predict_mention_ner(tokens, ents2, 4)
    assert not np.array_equal(a, c)
    # E > max_pair_length chunks at P rows and stays deterministic
    big = np.column_stack([np.arange(11) * 2, np.arange(11) * 2])
    d = sc.predict_mention_ner(["t"] * 32, big, 4)
    assert d.shape == (11,) and np.array_equal(
        d, sc.predict_mention_ner(["t"] * 32, big, 4))


def test_ner_table_modes(spark):
    from text2nkg_spark.config import DataGenConfig
    from text2nkg_spark.datagen import gen_transcripts_pdf
    from text2nkg_spark.plans.pipeline import prepare_sentences

    tr = spark.createDataFrame(gen_transcripts_pdf(
        DataGenConfig(n_convs=6, turns_per_conv=3, seed=4)))
    sents = prepare_sentences(tr)
    cfg = PipelineConfig(scorer="model", max_seq_length=64,
                         max_pair_length=16, use_ner_results=False)
    labels = ["NIL", "PER", "ORG", "LOC"]
    pred = predicted_ner_table(sents, cfg, labels)
    rows = pred.collect()
    n_mentions = sents.select(
        F.sum(F.size("m_starts"))).collect()[0][0] or 0
    assert len(rows) == n_mentions  # one canonical label per mention
    assert all(r.ner_label in labels for r in rows)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, pred.collect()))
    # dispatch: use_ner_results routes to the input annotations
    norm_like = spark.createDataFrame(
        [("c0", 0, [{"start": 1, "end": 2, "label": "PER"}])],
        "conv_id string, turn_idx int, "
        "ner array<struct<start:int,end:int,label:string>>")
    got = mention_ner_table(
        norm_like, PipelineConfig(use_ner_results=True), labels).collect()
    assert [tuple(r) for r in got] == [("c0", 0, 1, 2, "PER")]


def test_extraction_is_ner_mode_invariant(spark):
    """The reference rebuilds pos2ner from the input NER for every emitted
    item (run_re.py:1482-1485; per-item updates commented out 1486-1491),
    so predicted-NER mode CANNOT change output_preds — our extraction
    matches that contract exactly."""
    from text2nkg_spark.config import DataGenConfig
    from text2nkg_spark.datagen import gen_transcripts_pdf
    from text2nkg_spark.operators.extraction import extract_facts_fused
    from text2nkg_spark.plans.pipeline import (
        default_label_space, prepare_sentences)

    tr = spark.createDataFrame(gen_transcripts_pdf(
        DataGenConfig(n_convs=6, turns_per_conv=3, seed=4)))
    sents = prepare_sentences(tr)
    space = default_label_space()
    a = extract_facts_fused(
        sents, PipelineConfig(scorer="hash", use_ner_results=True),
        space).collect()
    b = extract_facts_fused(
        sents, PipelineConfig(scorer="hash", use_ner_results=False),
        space).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.fixture()
def withner_fixture(spark):
    gold = spark.createDataFrame(
        [("conv0", 0,
          [{"h_s": 1, "h_e": 1, "t_s": 3, "t_e": 3, "rel": "[r]r0",
            "quals": [{"q_s": 5, "q_e": 5, "label": "[k]q0"}],
            "role_h": None, "role_t": None}])],
        "conv_id string, turn_idx int, relations array<struct<"
        "h_s:int,h_e:int,t_s:int,t_e:int,rel:string,"
        "quals:array<struct<q_s:int,q_e:int,label:string>>,"
        "role_h:string,role_t:string>>")
    ner_rows = [("conv0", 0, 1, 1, "PER"), ("conv0", 0, 3, 3, "ORG"),
                ("conv0", 0, 5, 5, "LOC")]
    ner_schema = ("conv_id string, turn_idx int, start int, end int, "
                  "ner_label string")
    gold_ner = spark.createDataFrame(ner_rows, ner_schema)
    preds = spark.createDataFrame(
        [("conv0", 0, 1, 1, 3, 3, "[r]r0", 5, 5, "[k]q0")],
        "conv_id string, turn_idx int, m1s int, m1e int, m2s int, m2e int,"
        " rel string, m3s int, m3e int, qual string")
    return gold, gold_ner, ner_rows, ner_schema, preds


def test_withner_counters(spark, withner_fixture):
    from text2nkg_spark.operators.metrics import relation_prf_withner

    gold, gold_ner, ner_rows, ner_schema, preds = withner_fixture
    # input NER == gold NER: with-ner counters equal the plain counters
    got = relation_prf_withner(preds, gold, gold_ner, gold_ner)
    assert got == {"cor_with_ner": 1, "q_cor_with_ner": 1}
    # one wrong input label on the object span kills both with-ner counts
    bad = spark.createDataFrame(
        [r if r[2] != 3 else (r[0], r[1], 3, 3, "WRONG")
         for r in ner_rows], ner_schema)
    got_bad = relation_prf_withner(preds, gold, gold_ner, bad)
    assert got_bad == {"cor_with_ner": 0, "q_cor_with_ner": 0}
    # a wrong label on a span the prediction never touches changes nothing
    elsewhere = spark.createDataFrame(
        ner_rows + [("conv0", 0, 7, 7, "WRONG")], ner_schema)
    assert relation_prf_withner(preds, gold, gold_ner, elsewhere) == got


def test_withner_missing_span_fails_loudly(spark, withner_fixture):
    """A predicted span ABSENT from the input NER must raise (the
    reference's pos2ner dict would KeyError) — not silently drop the
    prediction and deflate the counters."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from text2nkg_spark.operators.metrics import relation_prf_withner

    gold, gold_ner, ner_rows, ner_schema, preds = withner_fixture
    missing = spark.createDataFrame(
        [r for r in ner_rows if r[2] != 3], ner_schema)
    with pytest.raises((Py4JJavaError, PySparkException),
                       match="missing from input NER"):
        relation_prf_withner(preds, gold, gold_ner, missing)


def test_refine_is_identity_quirk(spark, withner_fixture):
    from text2nkg_spark.operators.metrics import ner_refine_metrics

    _, gold_ner, ner_rows, ner_schema, _ = withner_fixture
    got = ner_refine_metrics(gold_ner, gold_ner)
    assert got == {"ner_ori_cor": 3, "ner_cor": 3, "ner_tot_pred": 3}
    bad = spark.createDataFrame(
        [r if r[2] != 3 else (r[0], r[1], 3, 3, "WRONG")
         for r in ner_rows], ner_schema)
    got_bad = ner_refine_metrics(bad, gold_ner)
    # the shipped refine never changes a label (pos2ner rebuild), so the
    # 'refined' count equals the original count — quirk preserved
    assert got_bad == {"ner_ori_cor": 2, "ner_cor": 2, "ner_tot_pred": 3}


# ------------------------------------------------- M6: model variants

def test_variant_registry_validation():
    import pytest as _pytest

    from text2nkg_spark.operators.model_scorer import ModelScorer

    with _pytest.raises(ValueError, match="unknown model variant"):
        ModelScorer(variant="bertbase")
    with _pytest.raises(ValueError, match="unknown model_variant"):
        PipelineConfig(model_variant="nope")


def test_variants_score_identically(spark):
    """Relation/qualifier heads are shared across all three registry
    variants (run_re.py:68-72) — facts must be byte-identical."""
    from text2nkg_spark.config import DataGenConfig
    from text2nkg_spark.datagen import gen_transcripts_pdf
    from text2nkg_spark.operators.extraction import extract_facts_fused
    from text2nkg_spark.plans.pipeline import (
        default_label_space, prepare_sentences)

    tr = spark.createDataFrame(gen_transcripts_pdf(
        DataGenConfig(n_convs=4, turns_per_conv=3, seed=9)))
    sents = prepare_sentences(tr)
    space = default_label_space()
    outs = []
    for variant in ("bertsub", "bertnonersub", "albertsub"):
        cfg = PipelineConfig(scorer="model", max_seq_length=64,
                             max_pair_length=16, model_variant=variant,
                             use_ner_results=True)
        outs.append(sorted(
            map(tuple, extract_facts_fused(sents, cfg, space).collect())))
    assert outs[0] == outs[1] == outs[2]


def test_noner_variant_rejects_predicted_ner():
    from text2nkg_spark.operators.model_scorer import ModelScorer

    # scorer-level: the NoNer model has no outputs[1]
    sc = ModelScorer(max_seq_length=64, max_pair_length=16,
                     variant="bertnonersub")
    with pytest.raises(NotImplementedError, match="no NER head"):
        sc.predict_mention_ner(["a", "b"], np.array([[0, 0]]), 4)

    # config-level: the pairing is unconstructible — covers the CLI,
    # run_pipeline, and every direct caller at plan time
    with pytest.raises(ValueError, match="bertnonersub"):
        PipelineConfig(scorer="model", model_variant="bertnonersub",
                       use_ner_results=False)
