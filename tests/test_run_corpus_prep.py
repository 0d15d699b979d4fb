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
