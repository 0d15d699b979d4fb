#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4) — NOT the frozen driver bench.

For each headline query: N repeats of construct+noop-write in one session,
reporting every sample, the min, and the number of Spark jobs the query
ran (collects/checkpoints/iterations show up here — the fixed-overhead
multiplier at small scale).  Optionally dumps .explain("formatted") to
plans/r07/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--reps 3] [--tag before] [--plans] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "nkg_doc_assembly", "nkg_mentions", "nkg_entities", "nkg_gold_extract",
    "pricing_summary", "revenue_by_nation", "top_orders_per_customer",
    "events_sessionize", "events_hourly",
    "dedup_exact", "dedup_minhash_signature", "dedup_simhash_pairs",
    "dedup_ngram_jaccard", "text_quality", "text_langid", "text_token_counts",
    "text_fingerprint", "emb_topk", "emb_neardup", "similarity_lsh_topk",
    "multimodal_features", "events_asof", "events_range_join",
    "events_percentiles", "text_tfidf_topk", "similarity_ivf_topk",
    "nkg_cooccurrence", "nkg_entity_degree", "bloom_semijoin",
    "text_repetition", "text_contamination", "orders_pivot", "orders_cube",
    "events_json_stats", "events_funnel", "orders_cohort_retention",
    "nkg_pagerank", "similarity_tfidf_cosine", "orders_merge_upsert",
    "events_sliding_window", "lineitem_salted_join", "text_pii_scrub",
    "nkg_triangles", "events_resample_ffill", "events_transitions",
    "nkg_fuzzy_surfaces", "orders_snapshot_diff", "events_scd2",
    "events_interval_overlap", "nkg_kcore", "complex_type_functions",
    "orders_profile", "events_value_histogram", "events_window_frames",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default=None)
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import __spark_entry__ as em
    from text2nkg_spark.session import get_spark

    spark = get_spark(
        "bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=max(8, CPUS))
    sc = spark.sparkContext
    qs = em.queries()
    names = args.queries or HEADLINE

    plans_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans", "r07")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        samples = []
        n_jobs = 0
        for rep in range(args.reps):
            group = f"{name}-{rep}"
            sc.setJobGroup(group, name)
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup("", "")
        if args.plans and args.tag:
            df = qs[name](spark, SF_DIR)
            with open(os.path.join(
                    plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        results[name] = {
            "min": min(samples), "samples": samples, "jobs_last_rep": n_jobs}
        print(json.dumps({name: results[name]}), flush=True)

    total_min = round(sum(v["min"] for v in results.values()), 2)
    print(json.dumps({"_total_min": total_min, "sf_dir": SF_DIR}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
