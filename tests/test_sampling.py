"""Deterministic sampling + token-quota sharding + greedy packing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from text2nkg_spark.operators.sampling import (
    deterministic_sample, pack_greedy_bins, shard_stats, stratified_sample,
    token_quota_shards)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    # unpersist on teardown: a lingering cache of the raw parquet would
    # substitute a full-schema InMemoryRelation into every later plan
    # over the same file, silently defeating the session's plan tests
    # (column pruning disappears from explain output)
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    yield df
    df.unpersist()


def test_deterministic_sample_stable_and_nested(spark, docs):
    kept10 = {r.doc_id for r in
              deterministic_sample(docs, 0.1).select("doc_id").collect()}
    kept30 = {r.doc_id for r in
              deterministic_sample(docs, 0.3).select("doc_id").collect()}
    # nesting: the 10% sample is a subset of the 30% sample (same seed)
    assert kept10 <= kept30
    assert 0 < len(kept10) < len(kept30) < docs.count()
    # repartition invariance: physical layout cannot change the kept set
    shuffled = docs.repartition(7, "lang")
    again = {r.doc_id for r in
             deterministic_sample(shuffled, 0.1).select("doc_id").collect()}
    assert again == kept10
    # different seed -> different (but same-sized-ish) sample
    other = {r.doc_id for r in
             deterministic_sample(docs, 0.1, seed=7)
             .select("doc_id").collect()}
    assert other != kept10


def test_stratified_sample_rates(spark, docs):
    rates = {"en": 0.0, "de": 1.0}
    got = stratified_sample(docs, rates).select("doc_id", "lang").collect()
    langs = {r.lang for r in got}
    assert "en" not in langs
    n_de = docs.where(F.col("lang") == "de").count()
    assert sum(1 for r in got if r.lang == "de") == n_de  # rate 1.0 = all
    assert all(r.lang == "de" for r in got)  # default_rate 0 drops the rest


def test_token_quota_shards_prefix_property(spark, docs):
    budget = 1024
    rows = token_quota_shards(docs, budget).select(
        "doc_id", "n_tokens", "shard").collect()
    rows.sort(key=lambda r: r.doc_id)
    # python oracle: shard = exclusive prefix sum // budget
    acc = 0
    for r in rows:
        assert r.shard == acc // budget, (r.doc_id, r.shard, acc)
        acc += r.n_tokens
    # shards are contiguous in doc order and overrun by at most one doc
    st = {r.shard: r for r in shard_stats(
        token_quota_shards(docs, budget)).collect()}
    for sh, row in st.items():
        if sh + 1 in st:
            assert st[sh + 1].doc_min > row.doc_max
        assert row.tok_total < budget + max(
            r.n_tokens for r in rows if r.shard == sh) + 1


def test_token_quota_shards_partitioned(spark, docs):
    """part_col scopes the quota: shard ids restart per partition, so the
    manifest and greedy packer key on (shard_part, shard) — shard 0 of one
    lang must never merge with shard 0 of another."""
    budget = 1024
    sharded = token_quota_shards(docs, budget, part_col="lang")
    rows = sharded.select("doc_id", "lang", "shard_part", "shard",
                          "n_tokens").collect()
    assert all(r.shard_part == r.lang for r in rows)
    # per-lang python oracle
    by_lang: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: r.doc_id):
        by_lang.setdefault(r.lang, []).append(r)
    for lang, lr in by_lang.items():
        acc = 0
        for r in lr:
            assert r.shard == acc // budget, (lang, r.doc_id)
            acc += r.n_tokens
    # stats keyed (shard_part, shard): one row per lang-shard, not merged
    st = shard_stats(sharded).collect()
    assert len(st) == len({(r.lang, r.shard) for r in rows})
    assert len({s.shard for s in st}) < len(st)  # ids DO repeat across langs
    # greedy packer groups per (shard_part, shard): every bin is single-lang
    lang_of = {r.doc_id: r.lang for r in rows}
    packed = pack_greedy_bins(sharded, 256).collect()
    bins: dict[tuple, set] = {}
    for r in packed:
        bins.setdefault((r.shard_part, r.shard, r.bin), set()).add(
            lang_of[r.doc_id])
    assert all(len(v) == 1 for v in bins.values())


def test_shard_family_custom_id_col(spark, docs):
    """id_col/text_col thread all the way through shard_stats and
    pack_greedy_bins (regression: downstream hardcoded doc_id and crashed
    on any non-default id column)."""
    from pyspark.sql import functions as F

    from text2nkg_spark.operators.sampling import (
        pack_greedy_bins, shard_stats)

    renamed = docs.limit(60).select(
        F.col("doc_id").cast("string").alias("uid"),
        F.col("text").alias("body"))
    sharded = token_quota_shards(
        renamed, budget=2048, id_col="uid", text_col="body")
    stats = shard_stats(sharded, id_col="uid").collect()
    assert len(stats) > 0 and all(r.n_docs > 0 for r in stats)
    packed = pack_greedy_bins(sharded, 512, id_col="uid")
    rows = packed.collect()
    assert len(rows) == 60
    assert packed.schema["uid"].dataType.simpleString() == "string"
    # same assignment as the doc_id-keyed run (uid sorts like doc_id here
    # only within equal string lengths — so compare against its own oracle)
    by_shard: dict[tuple, list] = {}
    for r in sorted(rows, key=lambda r: (r.shard_part, r.shard, r.uid)):
        by_shard.setdefault((r.shard_part, r.shard), []).append(r)
    for _sh, srows in by_shard.items():
        b, acc, pos = 0, 0, 0
        for r in srows:
            t = int(r.n_tokens)
            if acc > 0 and acc + t > 512:
                b, acc, pos = b + 1, 0, 0
            assert (r.bin, r.bin_pos) == (b, pos)
            acc += t
            pos += 1


def test_pack_greedy_bins_python_oracle(spark, docs):
    budget = 512
    sharded = token_quota_shards(docs.limit(120), budget=4096)
    got = pack_greedy_bins(sharded, budget).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for sh, rows in by_shard.items():
        # python greedy oracle within the shard
        b, acc, pos = 0, 0, 0
        for r in rows:
            t = int(r.n_tokens)
            if acc > 0 and acc + t > budget:
                b, acc, pos = b + 1, 0, 0
            assert (r.bin, r.bin_pos) == (b, pos), (sh, r.doc_id)
            acc += t
            pos += 1
        # no bin exceeds the budget unless it holds a single oversized doc
        tot: dict[int, int] = {}
        cnt: dict[int, int] = {}
        for r in rows:
            tot[r.bin] = tot.get(r.bin, 0) + int(r.n_tokens)
            cnt[r.bin] = cnt.get(r.bin, 0) + 1
        for bn, s in tot.items():
            assert s <= budget or cnt[bn] == 1
