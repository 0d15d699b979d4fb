"""P1/P2 — n-ary schema normalization of reference-shaped JSONL documents.

The reference stores relations as heterogeneous positional lists whose
meaning depends on ``--nary_schema`` (run_re.py:136-212):

  hyperrelation  [h_s,h_e,t_s,t_e,'[r]X',[[q_s,q_e,'[k]Y'],...]]
  event          ['[r]T',[h_s,h_e,'[k]T_h'],[t_s,t_e,'[k]T_t'],[q...],...]
  role           [[h_s,h_e,role_h],[t_s,t_e,role_t],[q...],...]
  hypergraph     ['[r]T',[h_s,h_e],[t_s,t_e],[q_s,q_e],...]

All four are normalized to ONE explicit struct row shape:
  (doc_id, sent_idx, tokens, ner[], relations[]) with
  relations: struct<h_s,h_e,t_s,t_e,rel,quals[struct<q_s,q_e,label>],
                    role_h,role_t>

matching the reference's internal 8/7/6-slot lists.  Faithful details:
* hyperrelation keeps only relations with >=1 qualifier and DROPS sentences
  left empty, REINDEXING the surviving sentences (run_re.py:145-155) — the
  (l_idx, n) eval keys refer to the filtered positions.
* event/role rows shorter than their arity are dropped (len guards at
  run_re.py:167/186/205).
* hypergraph duplicates the relation label onto each bare qualifier span
  (run_re.py:206).

Parsing heterogeneous JSON lists is ingest-time work, done once per corpus —
a ``mapInPandas`` JSON parse, not a hot-path UDF.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

NORMALIZED_SCHEMA = (
    "doc_id long, sent_idx int, tokens array<string>, "
    "ner array<struct<start:int,end:int,label:string>>, "
    "relations array<struct<h_s:int,h_e:int,t_s:int,t_e:int,rel:string,"
    "quals:array<struct<q_s:int,q_e:int,label:string>>,"
    "role_h:string,role_t:string>>"
)


def _norm_qual(q) -> dict:
    if len(q) >= 3:
        return {"q_s": int(q[0]), "q_e": int(q[1]), "label": q[2]}
    return {"q_s": int(q[0]), "q_e": int(q[1]), "label": None}


def normalize_document(
    sentences: list, ner: list, relations: list, nary_schema: str
) -> list[dict]:
    """One raw document -> normalized per-sentence rows (python-side core,
    shared by the Spark UDF and tests)."""
    out = []
    kept_idx = 0
    for i, sen_rels in enumerate(relations):
        rows = []
        for rel in sen_rels:
            if nary_schema == "hyperrelation":
                if len(rel[5]) >= 1:
                    rows.append(
                        {"h_s": rel[0], "h_e": rel[1], "t_s": rel[2],
                         "t_e": rel[3], "rel": rel[4],
                         "quals": [_norm_qual(q) for q in rel[5]],
                         "role_h": None, "role_t": None})
            elif nary_schema == "event":
                if len(rel) >= 4:
                    rows.append(
                        {"h_s": rel[1][0], "h_e": rel[1][1],
                         "t_s": rel[2][0], "t_e": rel[2][1], "rel": rel[0],
                         "quals": [_norm_qual(q) for q in rel[3:]],
                         "role_h": rel[1][2], "role_t": rel[2][2]})
            elif nary_schema == "role":
                if len(rel) >= 3:
                    rows.append(
                        {"h_s": rel[0][0], "h_e": rel[0][1],
                         "t_s": rel[1][0], "t_e": rel[1][1],
                         "rel": rel[1][2],
                         "quals": [_norm_qual(q) for q in rel[2:]],
                         "role_h": rel[0][2], "role_t": None})
            elif nary_schema == "hypergraph":
                if len(rel) >= 4:
                    quals = [
                        {"q_s": int(q[0]), "q_e": int(q[1]), "label": rel[0]}
                        for q in rel[3:]
                    ]
                    rows.append(
                        {"h_s": rel[1][0], "h_e": rel[1][1],
                         "t_s": rel[2][0], "t_e": rel[2][1], "rel": rel[0],
                         "quals": quals, "role_h": rel[0], "role_t": None})
            else:
                raise ValueError(nary_schema)
        if rows:
            out.append(
                {
                    "sent_idx": kept_idx,
                    "tokens": list(sentences[i]),
                    "ner": [
                        {"start": int(m[0]), "end": int(m[1]), "label": m[2]}
                        for m in ner[i]
                    ],
                    "relations": rows,
                }
            )
            kept_idx += 1
    return out


def normalize_reference_docs(
    docs: DataFrame, nary_schema: str = "hyperrelation"
) -> DataFrame:
    """(doc_id, sentences, ner_json, relations_json) -> normalized rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in range(len(pdf)):
                sentences = list(pdf["sentences"].iat[r])
                ner = json.loads(pdf["ner_json"].iat[r])
                relations = json.loads(pdf["relations_json"].iat[r])
                for s in normalize_document(
                        sentences, ner, relations, nary_schema):
                    rows.append({"doc_id": int(pdf["doc_id"].iat[r]), **s})
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sent_idx", "tokens", "ner", "relations"])

    return docs.mapInPandas(run, NORMALIZED_SCHEMA)


def with_line_numbers(df: DataFrame) -> DataFrame:
    """Stable line-number doc ids for a text read (the reference keys docs by
    line index, run_re.py:251).  ``zipWithIndex`` follows scan order — byte
    order within a file — one of the rare justified RDD drops."""
    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields + [T.StructField("doc_id", T.LongType())])
    return df.rdd.zipWithIndex().map(
        lambda x: (*x[0], x[1])).toDF(schema)
