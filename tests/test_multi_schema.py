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
