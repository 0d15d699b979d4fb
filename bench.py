#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus the north-rule scaling evidence: the flagship
extraction job at local[8] vs local[32] on identical input, reporting
throughput at both and the N->4N scaling efficiency.

Prints ONE JSON line:
  {"metric": "...", "value": <total headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "turns_per_sec": ..., "scaling": {"local8_turns_per_sec": ...,
   "local32_turns_per_sec": ..., "efficiency_n_to_4n": ...}}
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
BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "40000"))
SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") == "1"


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _make_session(cores: int):
    from text2nkg_spark.session import get_spark

    return get_spark(
        f"bench-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(8, cores))


def _gen_transcripts(spark, out_dir: str, n_turns: int):
    from text2nkg_spark.config import DataGenConfig
    from text2nkg_spark.datagen import gen_transcripts_df

    gen = DataGenConfig(n_convs=max(1, n_turns // 8), turns_per_conv=8, seed=42)
    gen_transcripts_df(spark, gen, partitions=128).write.mode(
        "overwrite").parquet(out_dir)
    return gen.n_convs * gen.turns_per_conv


def _extraction_job(spark, tr_path: str) -> int:
    from text2nkg_spark.config import PipelineConfig
    from text2nkg_spark.operators.extraction import extract_facts_fused
    from text2nkg_spark.operators.mentions import detect_mentions
    from text2nkg_spark.plans.pipeline import default_label_space

    tr = spark.read.parquet(tr_path)
    sents = detect_mentions(tr).select(
        "conv_id", "turn_idx", "tokens", "mentions")
    return extract_facts_fused(
        sents, PipelineConfig(scorer="hash"), default_label_space()).count()


def _warmup(spark) -> None:
    """Spawn python workers + JIT the UDF path before any timed run."""
    from pyspark.sql import functions as F

    df = spark.range(0, 4096, 1, 64).select(
        F.concat(F.lit("conv"), F.col("id").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("ent1a x ent2a y ent3a").alias("text"))
    from text2nkg_spark.config import PipelineConfig
    from text2nkg_spark.operators.extraction import extract_facts_fused
    from text2nkg_spark.operators.mentions import detect_mentions
    from text2nkg_spark.plans.pipeline import default_label_space

    sents = detect_mentions(df).select(
        "conv_id", "turn_idx", "tokens", "mentions")
    extract_facts_fused(
        sents, PipelineConfig(scorer="hash"), default_label_space()).count()


def main() -> None:
    import __spark_entry__ as em

    tmp = tempfile.mkdtemp(prefix="text2nkg_bench_")
    tr_path = os.path.join(tmp, "transcripts")

    spark = _make_session(CPUS)
    n_turns = _gen_transcripts(spark, tr_path, BENCH_TURNS)
    _warmup(spark)

    timings: dict[str, float] = {}

    # flagship extraction (turns/sec)
    t0 = time.time()
    n_facts = _extraction_job(spark, tr_path)
    timings["nkg_extract"] = round(time.time() - t0, 3)
    turns_per_sec = round(n_turns / timings["nkg_extract"], 1)

    # headline operator queries on the provided sf tables
    headline = [
        "nkg_doc_assembly", "nkg_mentions", "nkg_entities",
        "pricing_summary", "revenue_by_nation", "top_orders_per_customer",
        "events_sessionize", "events_hourly",
        "dedup_exact", "dedup_minhash_signature", "text_quality",
        "text_langid", "text_token_counts", "text_fingerprint",
        "emb_topk", "emb_neardup",
    ]
    qs = em.queries()
    for name in headline:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()

    scaling = {}
    if SCALING:
        rates = {}
        for cores in (8, 32):
            s = _make_session(cores)
            _warmup(s)
            best = float("inf")
            for _rep in range(2):
                t0 = time.time()
                _extraction_job(s, tr_path)
                best = min(best, time.time() - t0)
            rates[cores] = n_turns / best
            s.stop()
        eff = (rates[32] / rates[8]) / 4.0
        scaling = {
            "local8_turns_per_sec": round(rates[8], 1),
            "local32_turns_per_sec": round(rates[32], 1),
            "efficiency_n_to_4n": round(eff, 3),
        }

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "n_bench_turns": n_turns,
        "n_facts": n_facts,
        "turns_per_sec": turns_per_sec,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
