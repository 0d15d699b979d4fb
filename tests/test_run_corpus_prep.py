"""End-to-end smoke of the corpus-prep CLI job: stats line, all three
output tables, shard partitioning, monotone stage counts."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_CONTRACT_SF", "/root/testdata/sf0.001")


def test_corpus_prep_job(tmp_path):
    out = str(tmp_path / "corpus")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_corpus_prep.py"),
         "--input", f"{SF}/documents.parquet", "--output", out],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    # the funnel only narrows: gate -> dedup -> sample
    assert (stats["n_input"] >= stats["n_gated"] >= stats["n_deduped"]
            >= stats["n_sampled"] > 0)
    assert stats["n_shards"] > 0

    import duckdb

    prof = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/profile/*.parquet')"
    ).fetchone()[0]
    assert prof >= 4  # doc_id, text, lang, source, n_chars
    shards = duckdb.sql(
        f"""SELECT count(DISTINCT shard) FROM read_parquet(
            '{out}/documents/*/*.parquet', hive_partitioning=1)"""
    ).fetchone()[0]
    manifest = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/manifest/*.parquet')"
    ).fetchone()[0]
    assert shards == manifest == stats["n_shards"]


def test_corpus_prep_null_lang_and_shard_part(spark, tmp_path):
    """Regression: (a) NULL lang must form its own 'und' stratum and
    survive rebalance (previously crashed the rate sort / silently
    dropped); (b) --shard-part plumbs the scalable per-partition quota
    (shard ids restart per value, documents partitioned by both keys)."""
    import duckdb
    from pyspark.sql import functions as F

    src = str(tmp_path / "docs_in")
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    base.withColumn(
        "lang",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise("en")
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "corpus")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_corpus_prep.py"),
         "--input", src, "--output", out, "--budget", "256",
         "--min-tokens", "1", "--shard-part", "lang"],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["n_sampled"] > 0

    docs = duckdb.sql(
        f"""SELECT lang, count(*) AS n FROM read_parquet(
            '{out}/documents/*/*/*.parquet', hive_partitioning=1)
            GROUP BY lang"""
    ).fetchall()
    langs = dict(docs)
    assert "und" in langs and langs["und"] > 0  # null-lang docs survived
    # published schema = input columns + shard keys, no working columns
    cols = [r[0] for r in duckdb.sql(
        f"""DESCRIBE SELECT * FROM read_parquet(
            '{out}/documents/*/*/*.parquet', hive_partitioning=1)"""
    ).fetchall()]
    assert "content_hash" not in cols and "sample_bucket" not in cols
    assert {"shard_part", "shard"} <= set(cols)
    # quota restarts per partition: every (shard_part) group starts at 0
    starts = duckdb.sql(
        f"""SELECT shard_part, min(shard) FROM read_parquet(
            '{out}/manifest/*.parquet') GROUP BY shard_part"""
    ).fetchall()
    assert starts and all(s == 0 for _p, s in starts)
