"""ACE05 hyper-event conversion — the cross-schema corpus transforms
behind the reference's shipped hyperace05_{event,role,hypergraph,
hyperrelation} datasets (hyperace05_data_process.ipynb is the public
entry point for this step).

The notebook checked into the reference is STALE relative to its own
artifacts: it emits '[q]'-prefixed qualifiers (the corpora ship '[k]'),
keeps only the LAST ner entity (``ners.append`` outside the loop; the
corpora keep every entity plus the trigger span labeled 'Trigger'), and
writes one single-relation document per event (the corpora keep all of a
sentence's events on one aligned line, including no-event sentences).
Raw ACE05 is licensed and not shipped, so the conversion is implemented
and verified from the artifacts themselves: the EVENT schema is the
information-complete canonical form, and the other three schemas are pure
functions of it — asserted line-for-line over the full shipped dev+test
corpora (923 + 832 lines, tests/test_ace05_convert.py):

  event        ['[r]T', [trig_s, trig_e, '[k]Trigger'],
                [a1_s, a1_e, '[k]Role1'], [a2, ...], ...]   (canonical)
  role         drop the event type: [[trigger], [arg1], [arg2], ...]
  hypergraph   keep the type, strip labels: ['[r]T', [spans...]]
  hyperrelation requires >= 2 arguments: h = arg1, t = arg2,
                qualifiers = args 3+ (in order) THEN the trigger last;
                trigger-only / 1-arg events are dropped

NER is schema-invariant (all entities 'Entity' + the trigger span as
'Trigger').
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def event_to_hyperrelation(rels: list) -> list:
    """Event items -> hyperrelation rows: h/t = the first two arguments,
    qualifiers = remaining arguments in order, trigger LAST.  Events with
    fewer than two arguments have no (h, t) pair and are dropped — their
    sentence line stays (possibly with an empty relation list)."""
    out = []
    for r in rels:
        trig, args = r[1], r[2:]
        if len(args) >= 2:
            quals = [list(a) for a in args[2:]] + [list(trig)]
            out.append([args[0][0], args[0][1], args[1][0], args[1][1],
                        r[0], quals])
    return out


def event_to_role(rels: list) -> list:
    """Event items -> role rows: the event type is dropped; every mention
    keeps its '[k]' role (trigger first — it becomes the role-schema
    head, run_re.py:186-196)."""
    return [[list(s) for s in r[1:]] for r in rels]


def event_to_hypergraph(rels: list) -> list:
    """Event items -> hypergraph rows: the type survives, per-mention
    labels are stripped to bare spans (run_re.py:199-212 re-attaches the
    relation label to each span at normalize time)."""
    return [[r[0]] + [[s[0], s[1]] for s in r[1:]] for r in rels]


_CONVERTERS = {
    "event": lambda rels: [
        [r[0]] + [list(s) for s in r[1:]] for r in rels],  # identity copy
    "role": event_to_role,
    "hypergraph": event_to_hypergraph,
    "hyperrelation": event_to_hyperrelation,
}


def convert_hyperace05_doc(doc: dict, schema: str) -> dict:
    """One event-schema document line -> the target schema's line.
    Sentence text, ner (incl. the 'Trigger' span), clusters and doc_key
    are schema-invariant; line alignment is preserved (no-event sentences
    emit empty relation lists)."""
    conv = _CONVERTERS[schema]
    return {
        "sentences": doc["sentences"],
        "ner": doc["ner"],
        "relations": [conv(sen_rels) for sen_rels in doc["relations"]],
        "clusters": doc.get("clusters", []),
        "doc_key": doc.get("doc_key", ""),
    }


def convert_hyperace05_docs(raw_df: DataFrame, schema: str) -> DataFrame:
    """Spark shape: (line_json string) event-schema lines -> (doc_json
    string) target-schema lines, alignment preserved.  Ingest-time
    mapInPandas — one pass, no shuffle; output feeds read_reference_jsonl
    -> normalize_reference_docs unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                json.dumps(convert_hyperace05_doc(json.loads(line), schema),
                           ensure_ascii=False)
                for line in pdf["line_json"]
            ]
            yield pd.DataFrame({"doc_json": rows})

    return raw_df.mapInPandas(run, "doc_json string")


def ace05_label_vocab(
    entities: set[str], relations: set[str], qualifiers: set[str]
) -> dict:
    """label.json layout (notebook cell 4) with DETERMINISTIC ids: the
    notebook iterates python sets (its shipped ids are one historical hash
    order); we sort within each class, keeping the layout — None=0, then
    entities, relations, qualifiers; q_num_logit = last id + 1."""
    label: dict = {
        "id": {"None": 0}, "symmetric": [], "asymmetric": [],
        "entity": [], "relation": [], "qualifier": [], "q_num_logit": 0,
    }
    number = 0
    for cls, values in (("entity", entities), ("relation", relations),
                        ("qualifier", qualifiers)):
        for v in sorted(values):
            number += 1
            label["id"][v] = number
            label[cls].append(number)
    label["q_num_logit"] = number + 1
    return label
