"""KMV distinct-count + bottom-k coordinated sampling sketches."""

import pytest
from pyspark.sql import functions as F

from text2nkg_spark.operators.sketches import bottomk_sample, kmv_distinct

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def toks(spark):
    # the exact token stream the driver entries sketch — one definition
    import __spark_entry__ as em

    df = em._doc_tokens(spark, SF).cache()
    yield df
    df.unpersist()  # lingering caches substitute into later plans


def test_kmv_exact_below_k_and_estimates_above(spark, toks):
    exact = {r.lang: r.n for r in toks.groupBy("lang").agg(
        F.countDistinct("tok").alias("n")).collect()}
    got = {r.lang: r for r in kmv_distinct(
        toks, ["lang"], "tok", k=64).collect()}
    assert set(got) == set(exact)
    for lang, r in got.items():
        if exact[lang] < 64:
            assert r.n_kept == exact[lang] == r.est_distinct
        else:
            assert r.n_kept == 64
            # KMV relative error ~ 1/sqrt(k) = 12.5%; allow 4 sigma
            assert abs(r.est_distinct - exact[lang]) / exact[lang] < 0.5, (
                lang, r.est_distinct, exact[lang])
    # the ESTIMATOR branch, forced: k=8 over >=30-distinct groups
    small = {r.lang: r for r in kmv_distinct(
        toks, ["lang"], "tok", k=8).collect()}
    assert any(exact[lang] >= 8 for lang in small)
    for lang, r in small.items():
        if exact[lang] >= 8:
            assert r.n_kept == 8
            assert abs(r.est_distinct - exact[lang]) / exact[lang] < 1.5, (
                lang, r.est_distinct, exact[lang])


def test_kmv_stable_across_layouts(spark, toks):
    a = sorted(map(tuple, kmv_distinct(
        toks, ["lang"], "tok", k=32).collect()))
    b = sorted(map(tuple, kmv_distinct(
        toks.repartition(13, "tok"), ["lang"], "tok", k=32).collect()))
    assert a == b


def test_bottomk_merge_property(spark, toks):
    """Sketch union semantics: the bottom-k of a UNION equals the bottom-k
    of the concatenated per-part bottom-k sets — partitions sketch
    independently and merge without revisiting the data."""
    half1 = toks.where(F.length("tok") % 2 == 0)
    half2 = toks.where(F.length("tok") % 2 == 1)
    k = 8
    merged_parts = bottomk_sample(half1, ["lang"], "tok", k).select(
        "lang", "tok").unionByName(
        bottomk_sample(half2, ["lang"], "tok", k).select("lang", "tok"))
    resketch = {(r.lang, r.tok) for r in bottomk_sample(
        merged_parts, ["lang"], "tok", k).collect()}
    direct = {(r.lang, r.tok) for r in bottomk_sample(
        toks, ["lang"], "tok", k).collect()}
    assert resketch == direct


def test_bottomk_coordinated_across_tables(spark, toks):
    """Coordinated sampling: two tables sharing a key space keep the SAME
    sampled members wherever the key exists in both."""
    sub = toks.where(F.length("tok") >= 3)  # a 'second table' over the keys
    a = {(r.lang, r.tok) for r in bottomk_sample(
        toks, ["lang"], "tok", k=16).collect() if len(r.tok) >= 3}
    b = {(r.lang, r.tok) for r in bottomk_sample(
        sub, ["lang"], "tok", k=16).collect()}
    # dropping rows only PROMOTES survivors in hash order: every full-table
    # bottom-16 member that satisfies the subset predicate must appear in
    # the subset's bottom-16 too
    assert a <= b and len(a) > 0


# --------------------------------------------------------------- bloom

def test_bloom_no_false_negatives(spark):
    from pyspark.sql import functions as F

    from text2nkg_spark.operators.sketches import (
        bloom_filter_expr, bloom_words)

    keys = spark.range(0, 50).select((F.col("id") * 7 + 3).alias("key"))
    words = bloom_words(keys, "key", bits=256, k=3)
    # every inserted key must pass
    n = keys.where(
        bloom_filter_expr(words, F.col("key"), bits=256, k=3)).count()
    assert n == 50


def test_bloom_bitmap_matches_python_reference(spark):
    import hashlib

    from pyspark.sql import functions as F

    from text2nkg_spark.operators.sketches import bloom_bitmap

    vals = [11, 42, 1000]
    df = spark.createDataFrame([(v,) for v in vals], "key long")
    got = {r.word_idx: r.bits
           for r in bloom_bitmap(df, "key", bits=128, k=2).collect()}
    want: dict[int, int] = {}
    for v in vals:
        for i in range(2):
            h = int(hashlib.md5(f"{v}|{i}|42".encode())
                    .hexdigest()[:13], 16) % 128
            want[h // 32] = want.get(h // 32, 0) | (1 << (h % 32))
    assert got == want


def test_bloom_words_local_twin_matches_distributed(spark):
    """The r7 driver-side bloom build (bounded key collect + hashlib)
    must be word-identical to the distributed explode + bit_or aggregate
    for integer AND string keys, nulls excluded on both paths."""
    from pyspark.sql import functions as F

    from text2nkg_spark.operators.sketches import bloom_words

    ints = spark.range(0, 300).select((F.col("id") * 13 + 7).alias("key"))
    assert bloom_words(ints, "key", bits=512, k=3) == \
        bloom_words(ints, "key", bits=512, k=3, local_threshold=0)

    strs = spark.createDataFrame(
        [(f"k{i:03d}",) for i in range(97)] + [(None,)], "key string")
    assert bloom_words(strs, "key", bits=256, k=2) == \
        bloom_words(strs, "key", bits=256, k=2, local_threshold=0)


def test_bloom_filters_most_nonmembers(spark):
    from pyspark.sql import functions as F

    from text2nkg_spark.operators.sketches import (
        bloom_filter_expr, bloom_words)

    members = spark.range(0, 40).select(F.col("id").alias("key"))
    words = bloom_words(members, "key", bits=1024, k=3)
    probes = spark.range(10_000, 11_000).select(F.col("id").alias("key"))
    fp = probes.where(
        bloom_filter_expr(words, F.col("key"), bits=1024, k=3)).count()
    # 40 keys in 1024 bits, k=3: theoretical fp ~ (1-e^(-120/1024))^3 ~ 0.1%
    assert fp < 50


def test_bloom_probe_is_single_literal_array(spark):
    from pyspark.sql import functions as F

    from text2nkg_spark.operators.sketches import bloom_filter_expr

    # Regression guard for the r3 scale-killer: the word list must fold into
    # ONE ArrayType Literal.  The old F.array(*[F.lit(w) for w in words])
    # shape built an 8192-child CreateArray that Catalyst does NOT constant-
    # fold — re-evaluated per row per probe (measured 9x slower at sf0.1).
    # CreateArray anywhere in this plan means the regression is back.
    words = [(i * 2654435761) % (1 << 32) for i in range(1024)]
    df = spark.range(100).select(F.col("id").alias("key"))
    cond = bloom_filter_expr(words, F.col("key"), bits=1 << 15, k=3)
    plan = df.where(cond)._jdf.queryExecution().analyzed().toString()
    assert "CreateArray" not in plan
    # and the fold didn't change semantics: membership still type-checks
    assert df.where(cond).count() >= 0


def test_bloom_expr_rejects_oversized_literal(spark):
    """An 8k-word bloom can NEVER reach the literal path: even a single
    folded 8192-element ArrayType Literal costs ~6 s of driver-side
    Catalyst planning per fresh query (the r3 47 s headline regression).
    The public API refuses and points at bloom_filter_join instead."""
    import pytest
    from pyspark.sql import functions as F

    from text2nkg_spark.operators.sketches import bloom_filter_expr

    words = [(i * 2654435761) % (1 << 32) for i in range(8192)]
    with pytest.raises(ValueError, match="bloom_filter_join"):
        bloom_filter_expr(words, F.col("key"), bits=1 << 18, k=3)


def test_bloom_join_matches_expr(spark):
    """bloom_filter_join (broadcast-data shape) flags exactly the rows
    bloom_filter_expr (literal shape) passes — same bits, same positions;
    and the plan carries a BroadcastNestedLoopJoin of ONE row, not a giant
    literal."""
    from pyspark.sql import functions as F

    from text2nkg_spark.operators.sketches import (
        bloom_filter_expr, bloom_filter_join, bloom_words)

    members = spark.range(0, 60).select((F.col("id") * 3).alias("key"))
    words = bloom_words(members, "key", bits=1024, k=3)
    probes = spark.range(0, 500).select(F.col("id").alias("key"))
    via_expr = {
        r.key for r in probes.where(
            bloom_filter_expr(words, F.col("key"), bits=1024)).collect()}
    flagged = bloom_filter_join(probes, words, "key", bits=1024)
    via_join = {r.key for r in flagged.where("bloom_ok").collect()}
    assert via_expr == via_join and len(via_join) >= 60
    # helper arrays dropped; flag column present
    assert set(flagged.columns) == {"key", "bloom_ok"}


def test_bloom_bitmap_drops_null_keys(spark):
    from pyspark.sql import functions as F

    from text2nkg_spark.operators.sketches import bloom_bitmap, bloom_words

    df = spark.createDataFrame([(None,), (7,), (9,)], "key long")
    rows = bloom_bitmap(df, "key", bits=128, k=2).collect()
    # no spurious (NULL, NULL) row from NULL-key hashes
    assert all(r.word_idx is not None and r.bits is not None for r in rows)
    # and the words list equals the bloom over just the non-NULL keys
    clean = spark.createDataFrame([(7,), (9,)], "key long")
    assert bloom_words(df, "key", bits=128, k=2) == \
           bloom_words(clean, "key", bits=128, k=2)
