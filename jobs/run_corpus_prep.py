#!/usr/bin/env python
"""spark-submit entrypoint: raw documents -> training-ready corpus.

The 100 TB corpus-prep job shape, composed from the library operators the
driver contract verifies individually (corpus_prep_pipeline proves the
chain; this job makes it deployable):

    profile -> PII scrub -> quality gate -> exact dedup (keeper election
    among gate survivors) -> stratified language rebalance -> token-quota
    sharding -> partitioned write + shard manifest

Cluster usage:

    zip -r text2nkg_spark.zip text2nkg_spark
    spark-submit --py-files text2nkg_spark.zip \
        jobs/run_corpus_prep.py \
        --input  s3://bucket/documents/ \
        --output s3://bucket/corpus/    \
        --budget 2048 --min-tokens 8

Local smoke:

    python jobs/run_corpus_prep.py \
        --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/corpus_out

Outputs under --output:
    profile/    one row per input column (nulls, exact distincts, min/max)
    documents/  cleaned corpus, partitioned by shard (co-located reads for
                downstream tokenization — each shard is one token budget)
    manifest/   per-shard doc counts + token totals (the packing manifest)
    stats line  printed as ONE JSON line on stdout
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents table path (parquet)")
    ap.add_argument("--output", required=True, help="output root directory")
    ap.add_argument("--budget", type=int, default=2048,
                    help="token budget per shard")
    ap.add_argument("--min-tokens", type=int, default=8,
                    help="quality gate: minimum whitespace tokens")
    ap.add_argument("--no-scrub", action="store_true",
                    help="skip PII redaction")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import Window, functions as F

    from text2nkg_spark.operators.dedup import normalize_text
    from text2nkg_spark.operators.profile import profile_table
    from text2nkg_spark.operators.sampling import (
        shard_stats, stratified_sample, token_quota_shards)
    from text2nkg_spark.operators.textstats import pii_scrub
    from text2nkg_spark.session import get_spark

    spark = get_spark("text2nkg-corpus-prep", master=args.master)
    t0 = time.time()
    d = spark.read.parquet(args.input)

    # 1) profile the drop BEFORE touching it — schema-drift / null-rate
    # regressions surface here, not three stages deep (one scan)
    prof_cols = [c for c, t in d.dtypes
                 if t in ("bigint", "int", "double", "string")]
    profile_table(d, prof_cols).write.mode("overwrite").parquet(
        os.path.join(args.output, "profile"))

    # 2) PII scrub (counts on the original text, stable placeholders)
    if not args.no_scrub:
        d = pii_scrub(d).withColumn("text", F.col("redacted")).drop(
            "redacted")

    # 3) quality gate, then exact dedup AMONG SURVIVORS (window-min
    # keeper: one shuffle, no join; gating first means a low-quality
    # earliest copy can't drag its duplicate group out of the corpus)
    norm = normalize_text(F.col("text"))
    toks = F.split(norm, " ")
    docs = d.withColumn("content_hash", F.md5(norm)).withColumn(
        "n_toks", F.size(toks)).withColumn(
        "n_uniq", F.size(F.array_distinct(toks)))
    gated = docs.where(
        (F.col("n_toks") >= args.min_tokens)
        & (F.col("n_uniq") * 10 >= F.col("n_toks") * 3))
    keeper = F.min("doc_id").over(Window.partitionBy("content_hash"))
    deduped = gated.withColumn("_keeper", keeper).where(
        F.col("doc_id") == F.col("_keeper")).drop("_keeper")

    # 4) stratified language rebalance (md5-bucket deterministic) with
    # rates derived from observed languages: keep every language, halve
    # the most frequent one (the usual head-language downweighting)
    lang_counts = {r["lang"]: r["n"] for r in
                   deduped.groupBy("lang")
                   .agg(F.count(F.lit(1)).alias("n")).collect()}
    top = max(lang_counts, key=lang_counts.get) if lang_counts else None
    rates = {k: (0.5 if k == top else 1.0) for k in lang_counts}
    sampled = stratified_sample(deduped, rates, seed=42)

    # 5) token-quota sharding + partitioned write (shard = read unit for
    # downstream tokenization; each carries ~budget tokens)
    sharded = token_quota_shards(
        sampled.select("doc_id", "text"), budget=args.budget)
    out_docs = sampled.join(sharded.select("doc_id", "shard"), "doc_id")
    out_docs.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(args.output, "documents"))
    manifest = shard_stats(sharded)
    manifest.write.mode("overwrite").parquet(
        os.path.join(args.output, "manifest"))

    stats = {
        "n_input": d.count() if args.no_scrub else docs.count(),
        "n_gated": gated.count(),
        "n_deduped": deduped.count(),
        "n_sampled": sampled.count(),
        "n_shards": manifest.count(),
        "wall_s": round(time.time() - t0, 2),
        # deploy-shape witness: under spark-submit this must be the
        # launcher's --master, not a factory-forced local[N]
        "master": spark.sparkContext.master,
    }
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
