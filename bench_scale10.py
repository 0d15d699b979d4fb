#!/usr/bin/env python
"""Scale-tier demonstration (VERDICT r6 #2) — NOT the frozen bench.

Runs the flagship extraction at 1x and 10x bench turns, and the dedup
operator family at 1x and 10x documents (synthesized by unioning the
sf0.1 table at disjoint doc_id offsets), recording wall seconds and the
physical plan's Exchange count at both sizes.  Linear-ish wall ratios
with IDENTICAL Exchange counts are the evidence that the r7
optimizations are scale-shape-preserving, not small-input tunes.

Usage: python bench_scale10.py            (~6-10 min, run alone)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _exchanges(df) -> int:
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.count("Exchange ")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from text2nkg_spark.session import get_spark

    spark = get_spark(
        "scale10", master=f"local[{CPUS}]", shuffle_partitions=max(8, CPUS))
    out: dict = {}

    # ---- flagship at 1x / 10x turns --------------------------------
    from text2nkg_spark.config import DataGenConfig, PipelineConfig
    from text2nkg_spark.datagen import gen_transcripts_df
    from text2nkg_spark.operators.extraction import extract_facts_fused
    from text2nkg_spark.plans.pipeline import (
        default_label_space, prepare_sentences)

    tmp = tempfile.mkdtemp(prefix="scale10_")
    for tag, n_turns in (("1x", 40_000), ("10x", 400_000)):
        path = os.path.join(tmp, f"tr_{tag}")
        gen = DataGenConfig(n_convs=n_turns // 8, turns_per_conv=8, seed=42)
        gen_transcripts_df(spark, gen, partitions=128).write.mode(
            "overwrite").parquet(path)
        best, n_facts = float("inf"), 0
        ex = None
        for _ in range(2):
            tr = spark.read.parquet(path)
            sents = prepare_sentences(tr)
            df = extract_facts_fused(
                sents, PipelineConfig(scorer="hash"), default_label_space())
            t0 = time.time()
            n_facts = df.count()
            best = min(best, time.time() - t0)
            ex = _exchanges(df)
        out[f"flagship_{tag}"] = {
            "turns": n_turns, "wall_s": round(best, 2),
            "turns_per_sec": round(n_turns / best, 0),
            "n_facts": n_facts, "exchanges": ex}

    # ---- dedup family at 1x / 10x documents ------------------------
    from text2nkg_spark.operators.dedup import (
        exact_duplicates, md5_minhash_signatures_exploded,
        ngram_jaccard_pairs, simhash_pairs)

    d1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    max_id = d1.agg(F.max("doc_id")).first()[0] + 1
    d10_path = os.path.join(tmp, "docs10")
    d10 = d1
    for i in range(1, 10):
        d10 = d10.unionByName(
            d1.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_id)))
    d10.write.mode("overwrite").parquet(d10_path)

    fams = {
        "dedup_exact": lambda df: exact_duplicates(df),
        "dedup_minhash": lambda df: md5_minhash_signatures_exploded(
            df, num_hashes=2),
        "dedup_simhash": lambda df: simhash_pairs(df, max_hamming=6),
        "dedup_ngram": lambda df: ngram_jaccard_pairs(
            df, threshold=0.4, max_bucket=32),
    }
    for tag, src in (("1x", d1), ("10x", spark.read.parquet(d10_path))):
        for name, fn in fams.items():
            best = float("inf")
            ex = None
            for _ in range(2):
                df = fn(src)
                t0 = time.time()
                _noop(df)
                best = min(best, time.time() - t0)
                ex = _exchanges(df)
            out[f"{name}_{tag}"] = {
                "wall_s": round(best, 2), "exchanges": ex}

    for name in fams:
        a, b = out[f"{name}_1x"], out[f"{name}_10x"]
        b["wall_ratio_vs_1x"] = round(b["wall_s"] / max(a["wall_s"], 1e-9), 2)
        b["exchanges_match"] = a["exchanges"] == b["exchanges"]
    out["flagship_10x"]["wall_ratio_vs_1x"] = round(
        out["flagship_10x"]["wall_s"] / out["flagship_1x"]["wall_s"], 2)
    out["flagship_10x"]["exchanges_match"] = (
        out["flagship_1x"]["exchanges"] == out["flagship_10x"]["exchanges"])

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
