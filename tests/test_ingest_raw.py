"""P3-P8 raw-ingest operators: merge/explode round trip, label vocab vs the
shipped reference label.json, BIO codec round trip."""

import json
import os

import pytest
from pyspark.sql import functions as F

from text2nkg_spark.operators.ingest_raw import (
    bio_decode, bio_encode, build_label_vocab, corpus_stats,
    quintuplets_to_sentences, sentences_to_quintuplets)

REF_LABEL = ("/root/reference/datasets/hyperred_processed_data/"
             "hyperred_hyperrelation/label.json")


@pytest.fixture(scope="module")
def quintuplets(spark):
    rows = [
        # two quintuplets of the same relation (different qualifiers)
        ("a b c d e", 0, 1, 2, 3, 3, 4, "r1", "q1"),
        ("a b c d e", 0, 1, 2, 3, 4, 5, "r1", "q2"),
        # duplicate quintuplet — must collapse
        ("a b c d e", 0, 1, 2, 3, 4, 5, "r1", "q2"),
        # second relation in the same sentence
        ("a b c d e", 2, 3, 0, 1, 3, 4, "r2", "q1"),
        # another sentence
        ("x y z", 0, 1, 1, 2, 2, 3, "r1", "q3"),
    ]
    return spark.createDataFrame(
        rows,
        "text string, h_s int, h_e int, t_s int, t_e int, "
        "v_s int, v_e int, relation string, qualifier string").cache()


def test_merge_explode_roundtrip(spark, quintuplets):
    sents = quintuplets_to_sentences(quintuplets)
    assert sents.count() == 2
    back = sentences_to_quintuplets(sents)
    src = quintuplets.distinct()
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0

    # entity union is distinct spans across head/tail/value
    e = {r.text: r.entities for r in sents.collect()}
    assert len(e["a b c d e"]) == 4  # (0,1),(2,3),(3,4),(4,5)


def test_label_vocab_layout(spark, quintuplets):
    sents = quintuplets_to_sentences(quintuplets)
    vocab = build_label_vocab(sents)
    ids = vocab["id"]
    assert ids["None"] == 0 and ids["Entity"] == 1
    # qualifiers first (sorted), then relations not in qualifiers
    assert [k for k, v in sorted(ids.items(), key=lambda kv: kv[1])][2:] == [
        "[k]q1", "[k]q2", "[k]q3", "[r]r1", "[r]r2"]
    assert vocab["q_num_logits"] == 5
    assert vocab["entity"] == [1]


@pytest.mark.skipif(not os.path.exists(REF_LABEL), reason="no reference data")
def test_label_vocab_matches_reference_label_json(spark):
    """Rebuild label.json from the shipped processed dev+test corpora and
    compare to the shipped file (train.json is stripped from the snapshot;
    dev+test cover the full label set, so ids must match exactly)."""
    from text2nkg_spark.operators.normalize import (
        normalize_reference_docs, with_line_numbers)
    from text2nkg_spark.sources.io import read_reference_jsonl

    base = os.path.dirname(REF_LABEL)
    docs = None
    for split in ("dev.json", "test.json"):
        d = with_line_numbers(read_reference_jsonl(spark, f"{base}/{split}"))
        docs = d if docs is None else docs.union(d)
    norm = normalize_reference_docs(docs, "hyperrelation")
    # adapt to the quintuplet sentence shape (labels already prefixed)
    sents = norm.select(F.col("relations"))
    vocab = build_label_vocab(sents, rel_prefix="", qual_prefix="")

    with open(REF_LABEL) as f:
        ref = json.load(f)
    missing = set(ref["id"]) - set(vocab["id"])
    # allow labels that appear only in the (stripped) train split
    assert not (set(vocab["id"]) - set(ref["id"]))
    if not missing:
        assert vocab["id"] == ref["id"]
        assert vocab["relation"] == sorted(ref["relation"])
        assert vocab["qualifier"] == sorted(ref["qualifier"])
        assert vocab["q_num_logits"] == ref["q_num_logits"]


def test_corpus_stats(spark, quintuplets):
    st = corpus_stats(quintuplets_to_sentences(quintuplets))
    assert st["sents"] == 2
    assert st["relations"] == 3
    assert st["qualifiers"] == 4
    assert st["relation_labels"] == 2 and st["qualifier_labels"] == 3


def test_bio_roundtrip(spark):
    # the reference's own test vector (hyperred_data_process.py:567-575)
    spans = [(0, 3, "one"), (3, 4, "one"), (7, 8, "three")]
    df = spark.createDataFrame(
        [(spans, 8)],
        "spans array<struct<start:int,end:int,label:string>>, length int")
    out = df.select(
        bio_encode(F.col("spans"), F.col("length")).alias("tags")
    ).select(
        F.col("tags"), bio_decode(F.col("tags")).alias("decoded"))
    row = out.collect()[0]
    assert row.tags == ["B-one", "I-one", "I-one", "B-one",
                        "O", "O", "O", "B-three"]
    assert [(d.start, d.end, d.label) for d in row.decoded] == spans
