"""Event / role / hypergraph decode: engine == oracle on random logits,
and gold recovery on the actual reference dev corpora."""

import os

import numpy as np
import pytest

from text2nkg_spark.candidates import enumerate_triples
from text2nkg_spark.config import PipelineConfig
from text2nkg_spark.decode_multi import decode_sentence_multi
from text2nkg_spark.operators.extraction_multi import (
    SchemaLabels, extract_facts_multi, labels_from_normalized, score_heads)
from text2nkg_spark import reference_oracle as oracle
from text2nkg_spark.scoring_core import hash_logits_batch, log_softmax

REF = "/root/reference/datasets/hyperred_processed_data"

LABELS = SchemaLabels(
    ("[r]rel_0", "[r]rel_1", "[r]rel_2"),
    ("[k]role_0", "[k]role_1", "[k]role_2", "[k]role_3"))

_N_HEADS = {"event": 4, "role": 3, "hypergraph": 2}


def _random_entities(rng, e):
    spans, pos = [], 0
    for _ in range(e):
        pos += int(rng.integers(1, 3))
        ln = int(rng.integers(1, 3))
        spans.append((pos, pos + ln - 1))
        pos += ln
    return np.asarray(spans, dtype=np.int64)


def _heads(schema, doc, sent, cand, seed):
    from text2nkg_spark.operators.extraction_multi import head_width

    n = cand.shape[0]
    docs = np.full(n, doc, dtype=np.int64)
    sents = np.full(n, sent, dtype=np.int64)
    out = {}
    for hi, name in enumerate(("v", "q", "qb", "qc")[: _N_HEADS[schema]]):
        c = head_width(schema, hi, LABELS)
        out[name] = log_softmax(
            hash_logits_batch(docs, sents, cand[:, 4:10], c, seed, hi)
        ).astype(np.float64)
    return out


def _pair_dict(schema, ents, cand, heads):
    spans = [tuple(int(x) for x in r) for r in ents]
    pd_ = {}
    for n, row in enumerate(cand):
        key = (spans[int(row[1])], spans[int(row[2])], spans[int(row[3])])
        base = [heads["v"][n].tolist(), "Entity", heads["q"][n].tolist(), "Entity"]
        if schema in ("event", "role"):
            base.append(heads["qb"][n].tolist())
        if schema == "event":
            base.append(heads["qc"][n].tolist())
        pd_[key] = tuple(base)
    return pd_


@pytest.mark.parametrize("schema", ["event", "role", "hypergraph"])
@pytest.mark.parametrize("e", [3, 4, 5, 7])
@pytest.mark.parametrize("seed", [0, 1, 5])
def test_multi_decode_matches_oracle(schema, e, seed):
    rng = np.random.default_rng(seed * 100 + e)
    ents = _random_entities(rng, e)
    cand = enumerate_triples(ents, 256)
    heads = _heads(schema, 9, 2, cand, seed)
    got = decode_sentence_multi(
        schema, ents, cand, heads, LABELS.label_list, LABELS.q_label_list)
    pd_ = _pair_dict(schema, ents, cand, heads)
    if schema == "event":
        want = oracle.decode_sentence_event(
            pd_, LABELS.label_list, LABELS.q_label_list)
    elif schema == "role":
        want = oracle.decode_sentence_role(pd_, LABELS.q_label_list)
    else:
        want = oracle.decode_sentence_hypergraph(pd_, LABELS.label_list)
    assert got == want


ACE = "/root/reference/datasets/hyperace05_processed_data"


@pytest.mark.parametrize("corpus_root,prefix", [
    (REF, "hyperred"), (ACE, "hyperace05")])
@pytest.mark.parametrize("schema", ["event", "role", "hypergraph"])
def test_multi_gold_recovery_on_reference_corpus(
        spark, corpus_root, prefix, schema):
    """Gold-scored extraction over the reference's own dev corpora
    (HyperRED AND the ACE05 hyper-event conversion) recovers the annotated
    n-ary facts (relation + all argument spans) at P/R>=0.95."""
    path = f"{corpus_root}/{prefix}_{schema}/dev.json"
    if not os.path.exists(path):
        pytest.skip("missing reference corpus")
    from text2nkg_spark.operators.normalize import (
        normalize_reference_docs, with_line_numbers)
    from text2nkg_spark.sources.io import read_reference_jsonl

    docs = with_line_numbers(read_reference_jsonl(spark, path))  # full dev split
    norm = normalize_reference_docs(docs, schema).cache()
    labels = labels_from_normalized(norm, schema)
    cfg = PipelineConfig(scorer="gold")
    preds = extract_facts_multi(norm, schema, cfg, labels).collect()

    # The reference decode emits at most ONE fact per unordered span triple
    # (visited-set semantics) and its gold index overwrites colliding
    # orderings — sentences where several gold relations share an unordered
    # mention triple are unrecoverable BY THE REFERENCE'S OWN ALGORITHM.
    # Restrict the recovery check to collision-free sentences; there the
    # gold-backed scorer must reproduce gold near-exactly.
    gold_rows = norm.collect()
    per_sent: dict = {}
    for row in gold_rows:
        items = per_sent.setdefault((row.doc_id, row.sent_idx), [])
        for x in row.relations:
            for q in x.quals:
                items.append(
                    ((x.h_s, x.h_e, x.t_s, x.t_e, x.rel, q.q_s, q.q_e),
                     frozenset([(x.h_s, x.h_e), (x.t_s, x.t_e),
                                (q.q_s, q.q_e)])))
    # event/role emit facts in ANCHOR orientation (no direction
    # normalization) and the reference's own metric matches any of the 6
    # gold-expanded orderings (run_re.py:374-397) — compare on the
    # unordered span triple (+ relation where the schema has one).
    clean_keys = set()
    gold = set()
    for key, items in per_sent.items():
        triples = [t for _f, t in items]
        degenerate = any(len(t) < 3 for t in triples)
        if len(set(triples)) == len(triples) and not degenerate:
            clean_keys.add(key)
            for f, t in items:
                rel = f[4] if schema != "role" else None
                gold.add(key + (rel, t))

    got = set()
    for p in preds:
        if (p.doc_id, p.sent_idx) in clean_keys:
            spans = frozenset(
                [(p.m1s, p.m1e), (p.m2s, p.m2e), (p.m3s, p.m3e)])
            got.add((p.doc_id, p.sent_idx, p.rel, spans))

    assert len(gold) > 50, "collision-free subset unexpectedly small"
    inter = len(got & gold)
    assert inter / max(len(gold), 1) >= 0.95, (len(got), len(gold), inter)
    assert inter / max(len(got), 1) >= 0.95, (len(got), len(gold), inter)


@pytest.mark.parametrize("schema", ["event", "role", "hypergraph"])
def test_multi_schema_prf_metrics(spark, schema):
    """A2/A3 for the non-hyperrelation schemas: gold-scored extraction over
    the reference dev corpus scores high q_p/q_r through the golden-set
    membership joins (6-ordering expansion with per-slot labels)."""
    path = f"{REF}/hyperred_{schema}/dev.json"
    if not os.path.exists(path):
        pytest.skip("missing reference corpus")
    from text2nkg_spark.operators.metrics import multi_schema_prf
    from text2nkg_spark.operators.normalize import (
        normalize_reference_docs, with_line_numbers)
    from text2nkg_spark.sources.io import read_reference_jsonl

    docs = with_line_numbers(read_reference_jsonl(spark, path))  # full dev split
    norm = normalize_reference_docs(docs, schema).cache()
    labels = labels_from_normalized(norm, schema)
    preds = extract_facts_multi(
        norm, schema, PipelineConfig(scorer="gold"), labels)
    m = multi_schema_prf(preds, norm, schema)
    assert m["num_q_ans"] > 50
    # collisions between gold relations over shared unordered triples bound
    # recall below 1 on real data (reference-algorithm property)
    assert m["q_p"] >= 0.85, m
    assert m["q_r"] >= 0.80, m


def _model_heads(schema, tokens, ents, cand, cfg):
    """Model-scored heads exactly as score_heads builds them for
    scorer='model' (f64 cast + log_softmax), via the same worker cache."""
    from text2nkg_spark.operators.extraction_multi import (
        head_width, score_heads)

    return score_heads(schema, cfg, LABELS, 0, 0, cand, None,
                       ents=ents, tokens=tokens)


@pytest.mark.parametrize("schema", ["event", "role", "hypergraph"])
@pytest.mark.parametrize("e", [3, 4, 5])
def test_multi_model_decode_matches_oracle(schema, e):
    """Model-scored heads (packed-marker MiniEncoder, per-head q2/q3
    classifiers) through the engine decode == the reference-transcription
    oracle, bit-for-bit — the same parity bar as the hash/gold scorers."""
    from text2nkg_spark.config import PipelineConfig

    rng = np.random.default_rng(e)
    ents = _random_entities(rng, e)
    cand = enumerate_triples(ents, 64)
    tokens = [f"w{z}" for z in range(int(ents[-1, 1]) + 2)]
    cfg = PipelineConfig(nary_schema=schema, scorer="model",
                         max_seq_length=64, max_pair_length=8)
    heads = _model_heads(schema, tokens, ents, cand, cfg)
    got = decode_sentence_multi(
        schema, ents, cand, heads, LABELS.label_list, LABELS.q_label_list)
    pd_ = _pair_dict(schema, ents, cand, heads)
    if schema == "event":
        want = oracle.decode_sentence_event(
            pd_, LABELS.label_list, LABELS.q_label_list)
    elif schema == "role":
        want = oracle.decode_sentence_role(pd_, LABELS.q_label_list)
    else:
        want = oracle.decode_sentence_hypergraph(pd_, LABELS.label_list)
    assert got == want
    assert len(got) > 0  # model noise must decode to something non-vacuous


def test_multi_model_head_logits_distinct_and_wired():
    """The q2/q3 heads are genuinely distinct classifiers (head_idx changes
    the logits) and consume the qualifier marker state (moving the
    qualifier span changes q/qb/qc)."""
    from text2nkg_spark.operators.model_scorer import ModelScorer

    ents = np.array([[1, 1], [3, 3], [5, 5]])
    cand = enumerate_triples(ents, 64)
    sc = ModelScorer("mini", max_seq_length=64, max_pair_length=8)
    outs = sc.score_sentence_multi(["w"] * 8, ents, cand, (4, 5, 5, 5))
    assert [o.shape for o in outs] == [(27, 4), (27, 5), (27, 5), (27, 5)]
    # same width, different head index -> different logits
    assert not np.array_equal(outs[1], outs[2])
    assert not np.array_equal(outs[2], outs[3])
    # deterministic
    outs2 = sc.score_sentence_multi(["w"] * 8, ents, cand, (4, 5, 5, 5))
    for a, b in zip(outs, outs2):
        assert np.array_equal(a, b)
    # moving an entity span changes every head (qualifier wiring is live)
    ents3 = np.array([[1, 1], [3, 3], [6, 6]])
    outs3 = sc.score_sentence_multi(
        ["w"] * 8, ents3, enumerate_triples(ents3, 64), (4, 5, 5, 5))
    for a, b in zip(outs, outs3):
        assert not np.array_equal(a, b)


def test_multi_model_group_pair_batching_bit_parity():
    """E > max_pair_length: multi-schema scoring falls back to group-pair
    batching (every packed example bounded at P marker rows) and stays
    bit-identical to a small-batch chunking of the same examples."""
    from text2nkg_spark.operators.model_scorer import ModelScorer

    big = np.column_stack([np.arange(9) * 2 + 1, np.arange(9) * 2 + 1])
    cand = enumerate_triples(big, 64)
    a = ModelScorer("mini", max_seq_length=64, max_pair_length=8)
    outs_a = a.score_sentence_multi(["t"] * 24, big, cand, (4, 6, 6, 6))
    b = ModelScorer("mini", max_seq_length=64, max_pair_length=8)
    b.batch_examples = 2  # force many encoder chunks
    outs_b = b.score_sentence_multi(["t"] * 24, big, cand, (4, 6, 6, 6))
    assert outs_a[0].shape == (9 ** 3, 4)
    for x, y in zip(outs_a, outs_b):
        assert np.array_equal(x, y)


@pytest.mark.parametrize("schema", ["event", "role"])
def test_multi_model_spark_end_to_end_parity(spark, schema):
    """scorer='model' through the full fused Spark extraction == a local
    per-document loop (score_heads + decode_sentence_multi), bit-for-bit,
    and deterministic across runs — the event/role model path the
    reference runs with its q2/q3 heads (run_re.py:1519-1628, 1764-1862)."""
    from pyspark.sql import functions as F

    from text2nkg_spark.config import PipelineConfig

    cfg = PipelineConfig(nary_schema=schema, scorer="model",
                         max_seq_length=64, max_pair_length=8)
    n_docs = 10
    rows = []
    for d in range(n_docs):
        two = d % 2
        tokens = [f"t{d}_{z}" for z in range(10)]
        ner = [{"start": 1, "end": 1 + two, "label": "Entity"},
               {"start": 3 + two, "end": 3 + two, "label": "Entity"},
               {"start": 5 + two, "end": 5 + two, "label": "Entity"}]
        rows.append((d, 0, tokens, ner))
    norm = spark.createDataFrame(
        rows, "doc_id long, sent_idx int, tokens array<string>, "
        "ner array<struct<start:int,end:int,label:string>>")
    got = extract_facts_multi(norm, schema, cfg, LABELS)
    key = ["doc_id", "sent_idx", "pred_idx", "rel", "m1s", "m1e", "m1_label",
           "m2s", "m2e", "m2_label", "m3s", "m3e", "m3_label"]
    got_rows = sorted(tuple(r[c] for c in key) for r in got.collect())
    again = sorted(tuple(r[c] for c in key)
                   for r in extract_facts_multi(
                       norm, schema, cfg, LABELS).collect())
    assert got_rows == again and len(got_rows) > 0

    from text2nkg_spark.operators.extraction_multi import score_heads
    want = []
    for d, sent_idx, tokens, ner in rows:
        ents = np.asarray([(m["start"], m["end"]) for m in ner],
                          dtype=np.int64)
        cand = enumerate_triples(ents, cfg.max_seq_length)
        heads = score_heads(schema, cfg, LABELS, d, sent_idx, cand, None,
                            ents=ents, tokens=tokens)
        preds = decode_sentence_multi(
            schema, ents, cand, heads, LABELS.label_list,
            LABELS.q_label_list, cfg.same_entity)
        for pi, p in enumerate(preds):
            if schema == "event":
                rel, (m1, l1), (m2, l2), (m3, l3) = p
            else:
                (m1, l1), (m2, l2), (m3, l3) = p
                rel = None
            want.append((d, sent_idx, pi, rel, m1[0], m1[1], l1,
                         m2[0], m2[1], l2, m3[0], m3[1], l3))
    assert got_rows == sorted(want)


def test_event_argument_view(spark):
    from text2nkg_spark.operators.extraction_multi import event_argument_view

    preds = spark.createDataFrame(
        [(1, 0, 0, "[r]e1", 0, 1, "[k]a", 2, 3, "[k]b", 4, 5, "[k]c"),
         (1, 0, 1, "[r]e1", 0, 1, "[k]a", 6, 7, "[k]d", 4, 5, "[k]c")],
        "doc_id long, sent_idx int, pred_idx int, rel string, "
        "m1s int, m1e int, m1_label string, m2s int, m2e int, m2_label string, "
        "m3s int, m3e int, m3_label string")
    rows = event_argument_view(preds).collect()
    keys = {(r.rel, r.arg_s, r.arg_e, r.arg_label) for r in rows}
    # 6 emitted arguments, 2 duplicates collapsed -> 4 distinct
    assert len(rows) == 4 and len(keys) == 4
    first = {(r.arg_s, r.arg_e): (r.pred_idx, r.slot) for r in rows}
    assert first[(0, 1)] == (0, 0)   # kept first occurrence
    assert first[(4, 5)] == (0, 2)
