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
    documents/  cleaned corpus, INPUT SCHEMA ONLY + shard keys, partitioned
                by shard (and shard_part when --shard-part is given) —
                co-located reads for downstream tokenization
    manifest/   per-shard doc counts + token totals (the packing manifest)
    stats line  printed as ONE JSON line on stdout

At real scale pass --shard-part (a date/lang/bucket column): the global
quota is a single-reducer prefix sum by construction.
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
    ap.add_argument("--shard-part", default=None,
                    help="column scoping the token quota per partition "
                         "(e.g. lang, or a date bucket) — the REQUIRED "
                         "shape at real scale: the global default is a "
                         "single-reducer prefix sum (see "
                         "token_quota_shards' scale note)")
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
    out_cols = list(d.columns)  # the PUBLISHED corpus schema (+ shard keys);
    # working columns (hashes, token counts, PII counters, sample buckets)
    # must not leak into the written table
    n_input = d.count()  # one cheap scan; every stage below is row-preserving

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

    # docs with no language ID form their own stratum ('und') so the
    # rebalance keeps them — a NULL key would crash the rate sort and a
    # null-unsafe == would silently drop them at default_rate=0.  A
    # corpus with no lang column at all gets the constant stratum
    # (ADVICE r6: this used to raise an opaque AnalysisException).
    d = d.withColumn(
        "lang",
        F.coalesce(F.col("lang"), F.lit("und")) if "lang" in d.columns
        else F.lit("und"))

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
    # cut the regex-heavy scrub+gate lineage ONCE: everything below
    # (funnel agg, dedup window, language counts, sampling, sharding,
    # the published join) derives from this checkpoint — downstream
    # re-executions cost keyed shuffles, never a second scrub pass
    gated = gated.localCheckpoint()
    keeper = F.min("doc_id").over(Window.partitionBy("content_hash"))
    deduped = gated.withColumn("_keeper", keeper).where(
        F.col("doc_id") == F.col("_keeper")).drop("_keeper")

    # funnel stats in ONE extra pass: the keeper count equals the number
    # of distinct content hashes among gate survivors (re-running the
    # whole lineage once per stat would scan the corpus ~5x at size)
    funnel = gated.agg(
        F.count(F.lit(1)).alias("n_gated"),
        F.count_distinct("content_hash").alias("n_deduped")).collect()[0]

    # 4) stratified language rebalance (md5-bucket deterministic) with
    # rates derived from observed languages: keep every language, halve
    # the most frequent one (the usual head-language downweighting);
    # count ties break lexicographically so reruns pick the same language
    lang_counts = {r["lang"]: r["n"] for r in
                   deduped.groupBy("lang")
                   .agg(F.count(F.lit(1)).alias("n")).collect()}
    top = (max(sorted(lang_counts), key=lang_counts.get)
           if lang_counts else None)
    rates = {k: (0.5 if k == top else 1.0) for k in lang_counts}
    sampled = stratified_sample(deduped, rates, seed=42)

    # 5) token-quota sharding + partitioned write (shard = read unit for
    # downstream tokenization; each carries ~budget tokens).  --shard-part
    # scopes the quota per partition (shard ids restart per value); the
    # global default is fine at job-test scale but is a single-reducer
    # sort at 10^12 docs — pass it for real runs.
    shard_cols = ["shard_part", "shard"] if args.shard_part else ["shard"]
    quota_in = ["doc_id", "text"] + (
        [args.shard_part] if args.shard_part else [])
    sharded = token_quota_shards(
        sampled.select(*quota_in), budget=args.budget,
        part_col=args.shard_part)
    # publish ONLY the input schema + shard keys: working columns
    # (content_hash, n_toks, PII counters, sample_bucket) stay internal
    out_docs = sampled.join(
        sharded.select("doc_id", *shard_cols), "doc_id").select(
        *out_cols, *shard_cols)
    docs_dir = os.path.join(args.output, "documents")
    out_docs.write.mode("overwrite").partitionBy(*shard_cols).parquet(
        docs_dir)
    manifest_dir = os.path.join(args.output, "manifest")
    shard_stats(sharded).write.mode("overwrite").parquet(manifest_dir)

    stats = {
        "n_input": n_input,
        "n_gated": funnel["n_gated"],
        "n_deduped": funnel["n_deduped"],
        # read the WRITTEN tables back for the output-side counts — free
        # vs re-executing the sampling/sharding lineage
        "n_sampled": spark.read.parquet(docs_dir).count(),
        "n_shards": spark.read.parquet(manifest_dir).count(),
        "wall_s": round(time.time() - t0, 2),
        # deploy-shape witness: under spark-submit this must be the
        # launcher's --master, not a factory-forced local[N]
        "master": spark.sparkContext.master,
    }
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
