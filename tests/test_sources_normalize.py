"""Sources + P1 normalization against the actual reference datasets
(read-only data fixtures at /root/reference/datasets)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from text2nkg_spark.operators.normalize import (
    normalize_document, normalize_reference_docs, with_line_numbers)
from text2nkg_spark.sources.io import (
    load_label_space_json, read_reference_jsonl)

REF = "/root/reference/datasets/hyperred_processed_data"
DEV = f"{REF}/hyperred_hyperrelation/dev.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEV), reason="reference datasets not present")


def test_label_space_from_reference_label_json():
    space, raw = load_label_space_json(
        f"{REF}/hyperred_hyperrelation/label.json")
    # 62 [r] + 44 [k] names; bidirectional space = 2*|set|+1
    # ([r]/[k] prefixes make rel and qual names disjoint)
    assert space.d == 106
    assert space.num_classes == 213
    assert space.num_label == 107
    assert space.label_list[0] == "NIL"
    assert all(x.endswith("-1") for x in space.label_list[107:])


def test_read_and_normalize_reference_dev(spark):
    docs = with_line_numbers(read_reference_jsonl(spark, DEV))
    assert docs.count() == 1000
    norm = normalize_reference_docs(docs, "hyperrelation").cache()

    # survey-counted corpus stats: 1201 relations / 1342 qualifiers (all
    # relations in the processed file already carry >=1 qualifier)
    stats = norm.agg(
        F.sum(F.size("relations")).alias("rels"),
        F.sum(F.aggregate(
            "relations", F.lit(0), lambda a, x: a + F.size(x["quals"]))
        ).alias("quals"),
    ).collect()[0]
    assert stats["rels"] == 1201
    assert stats["quals"] == 1342

    # spans are sane token offsets into the (single) sentence
    bad = norm.where(
        F.exists(
            "relations",
            lambda x: (x["h_s"] < 0) | (x["h_e"] >= F.size("tokens"))
            | (x["t_e"] >= F.size("tokens")))
    ).count()
    assert bad == 0


@pytest.mark.parametrize("schema,path", [
    ("event", f"{REF}/hyperred_event/dev.json"),
    ("role", f"{REF}/hyperred_role/dev.json"),
    ("hypergraph", f"{REF}/hyperred_hypergraph/dev.json"),
])
def test_normalize_other_schemas_python(schema, path):
    if not os.path.exists(path):
        pytest.skip("missing")
    n_docs = 0
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            rows = normalize_document(
                d["sentences"], d["ner"], d["relations"], schema)
            for s in rows:
                for r in s["relations"]:
                    assert isinstance(r["h_s"], int)
                    assert isinstance(r["rel"], str)
                    for q in r["quals"]:
                        assert q["label"] is None or isinstance(q["label"], str)
                    if schema == "event":
                        assert r["role_h"] and r["role_t"]
                    if schema == "role":
                        assert r["role_h"]
                    if schema == "hypergraph":
                        assert all(q["label"] == r["rel"] for q in r["quals"])
            n_docs += 1
            if n_docs >= 200:
                break
    assert n_docs > 0
