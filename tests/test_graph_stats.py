"""Graph analytics, TF-IDF keywords, nearest-rank quantiles, IVF ANN."""

import math

import pytest
from pyspark.sql import functions as F

from text2nkg_spark.operators.graph import (
    cooccurrence_degree, entity_degree, mention_cooccurrence)
from text2nkg_spark.operators.similarity import (
    brute_force_topk, ivf_centroids, ivf_topk)
from text2nkg_spark.operators.sketches import nearest_rank_quantiles
from text2nkg_spark.operators.textstats import tfidf_top_terms


# ---------------------------------------------------------------- graph

@pytest.fixture(scope="module")
def mentions(spark):
    rows = [
        ("c1", "alice"), ("c1", "bob"), ("c1", "carol"),
        ("c1", "alice"),              # duplicate mention, same conv
        ("c2", "alice"), ("c2", "bob"),
        ("c3", "dave"),
    ]
    return spark.createDataFrame(rows, "conv_id string, surface string")


def test_mention_cooccurrence(mentions):
    got = {(r.surface_a, r.surface_b): r.n_groups
           for r in mention_cooccurrence(mentions).collect()}
    assert got == {("alice", "bob"): 2, ("alice", "carol"): 1,
                   ("bob", "carol"): 1}


def test_cooccurrence_cap(mentions):
    # width 2 keeps the two lexicographically-first surfaces per conv
    got = {(r.surface_a, r.surface_b): r.n_groups
           for r in mention_cooccurrence(
               mentions, max_group_width=2).collect()}
    assert got == {("alice", "bob"): 2}


def test_cooccurrence_degree(mentions):
    got = {r.surface: (r.degree, r.n_cooccurrences)
           for r in cooccurrence_degree(
               mention_cooccurrence(mentions)).collect()}
    assert got == {"alice": (2, 3), "bob": (2, 3), "carol": (2, 2)}


def test_entity_degree(spark):
    facts = spark.createDataFrame(
        [("a", "r1", "x"), ("a", "r1", "y"), ("a", "r2", "x"),
         ("b", "r1", "x")],
        "subj string, rel string, obj string")
    got = {r.subj: (r.n_facts, r.n_rels, r.n_objs)
           for r in entity_degree(facts).collect()}
    assert got == {"a": (3, 2, 2), "b": (1, 1, 1)}


# ---------------------------------------------------------------- tfidf

def test_tfidf_ranking(spark):
    docs = spark.createDataFrame(
        [(1, "common rare1 common other"),
         (2, "common other thing"),
         (3, "common other unique3")],
        "doc_id long, text string")
    out = tfidf_top_terms(docs, k=2)
    top = {r.doc_id: r.term for r in out.where("rank = 1").collect()}
    # df(common)=3, df(other)=3, df(rare1)=df(thing)=df(unique3)=1
    assert top == {1: "rare1", 2: "thing", 3: "unique3"}
    # tf=2/df=3 ("common" in doc 1) beats tf=1/df=3 ("other")
    r2 = {r.doc_id: r.term for r in out.where("rank = 2").collect()}
    assert r2[1] == "common"


def test_tfidf_min_len_filter(spark):
    docs = spark.createDataFrame([(1, "ab abc abcd")],
                                 "doc_id long, text string")
    terms = {r.term for r in tfidf_top_terms(docs, k=10).collect()}
    assert terms == {"abc", "abcd"}


# ------------------------------------------------------------ quantiles

def _nearest_rank(vals, p):
    s = sorted(vals)
    return s[math.ceil(p * len(s)) - 1]


def test_nearest_rank_quantiles(spark):
    import random

    rng = random.Random(7)
    rows = [("g%d" % (i % 3), float(rng.randint(0, 50)))
            for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in nearest_rank_quantiles(
        df, ["g"], "v", ps=(0.5, 0.9, 0.99)).collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        assert out[g]["n"] == len(vals)
        assert out[g]["p50"] == _nearest_rank(vals, 0.5)
        assert out[g]["p90"] == _nearest_rank(vals, 0.9)
        assert out[g]["p99"] == _nearest_rank(vals, 0.99)


def test_quantiles_singleton_group(spark):
    df = spark.createDataFrame([("g", 3.5)], "g string, v double")
    row = nearest_rank_quantiles(df, ["g"], "v").collect()[0]
    assert (row.p50, row.p90, row.p99) == (3.5, 3.5, 3.5)


# ------------------------------------------------------------------ ivf

@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(64, 8)).astype("float32")
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(64)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_centroids_deterministic(emb):
    c1 = ivf_centroids(emb, n_cells=4).collect()
    c2 = ivf_centroids(emb, n_cells=4).collect()
    assert sorted(r.cell_id for r in c1) == [0, 1, 2, 3]
    assert [r.cell_vec for r in sorted(c1, key=lambda r: r.cell_id)] == \
           [r.cell_vec for r in sorted(c2, key=lambda r: r.cell_id)]


def test_ivf_self_query_rank1(emb):
    queries = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_topk(emb, queries, k=5, n_cells=4, n_probe=1)
    top1 = {r.query_id: r.vec_id for r in out.where("rank = 1").collect()}
    # a corpus vector querying itself lands in its own home cell
    assert top1 == {0: 0, 1: 1, 2: 2}
    # ranks are dense and unique per query
    for qid in (0, 1, 2):
        ranks = sorted(r.rank for r in out.collect() if r.query_id == qid)
        assert ranks == list(range(1, len(ranks) + 1))


def test_ivf_probe_recall_monotone(emb):
    """More probes can only add candidates — recall vs brute force is
    monotone in n_probe, and full-probe IVF == brute force exactly."""
    queries = emb.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding")
    brute = {(r.query_id, r.vec_id)
             for r in brute_force_topk(emb, queries, k=5).collect()}

    def recall(n_probe):
        got = {(r.query_id, r.vec_id)
               for r in ivf_topk(emb, queries, k=5, n_cells=4,
                                 n_probe=n_probe).collect()}
        return len(got & brute) / len(brute)

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4
    assert r4 == 1.0  # probing every cell IS the exact search


def test_quantiles_ignore_nulls(spark):
    df = spark.createDataFrame(
        [("g", None), ("g", 1.0), ("g", 2.0), ("g", 3.0)],
        "g string, v double")
    row = nearest_rank_quantiles(df, ["g"], "v", ps=(0.5,)).collect()[0]
    # NULL excluded before ranking: n=3, p50 = 2.0 (the NULLS-LAST-engine
    # answer), never the NULL itself
    assert row.n == 3 and row.p50 == 2.0


def test_quantiles_duplicate_name_guard(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    # distinct p values whose 6-dp names collide must fail loudly
    with pytest.raises(ValueError, match="duplicate quantile"):
        nearest_rank_quantiles(df, ["g"], "v", ps=(0.5, 0.5000000001))
    # near-misses that USED to collide under integer rounding stay distinct
    out = nearest_rank_quantiles(df, ["g"], "v", ps=(0.995, 1.0))
    assert {"p99_5", "p100"} <= set(out.columns)


def test_ivf_centroids_skip_null_ids(spark):
    rows = [(None, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0]),
            (3, [0.5, 0.5])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_centroids(emb, n_cells=3).collect()
    assert len(cents) == 3
    # the NULL-id vector ([1, 0]) must not be a centroid
    assert all(r.cell_vec != [1.0, 0.0] for r in cents)


# ------------------------------------------------------------- pagerank

def test_pagerank_hand_computed(spark):
    """3-node path graph a-b, b-c (weights 1): ranks checked against the
    integer recurrence worked BY HAND, so the operator's arithmetic can't
    silently drift from the documented contract (which the DuckDB oracle
    transcribes independently)."""
    from text2nkg_spark.operators.graph import pagerank_iterations

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)],
        "surface_a string, surface_b string, n_groups long")
    S = 10**12
    base = (15 * S) // 100
    # out: a=1, b=2, c=1
    # r1: a,c get (b: S//2) -> base + 85*(S//2)//100
    #     b gets (a: S) + (c: S) -> base + 85*(2S)//100
    r1a = base + (85 * (S // 2)) // 100
    r1b = base + (85 * (2 * S)) // 100
    # r2: a,c <- b/2; b <- r1a + r1c
    r2a = base + (85 * (r1b // 2)) // 100
    r2b = base + (85 * (2 * r1a)) // 100
    # r3
    r3a = base + (85 * (r2b // 2)) // 100
    r3b = base + (85 * (2 * r2a)) // 100
    got = {r.node: r.rank for r in pagerank_iterations(edges).collect()}
    assert got == {"a": r3a, "b": r3b, "c": r3a}


def test_pagerank_isolated_weight_safety(spark):
    """contrib = (rank DIV strength) * w: a huge edge weight cannot
    overflow a contribution past the sender's rank."""
    from text2nkg_spark.operators.graph import pagerank_iterations

    w = 10**15  # would overflow rank * w long before rank DIV s * w
    edges = spark.createDataFrame(
        [("a", "b", w)], "surface_a string, surface_b string, n_groups long")
    got = {r.node: r.rank for r in pagerank_iterations(edges, iters=1)
           .collect()}
    S = 10**12
    exp = (15 * S) // 100 + (85 * ((S // w) * w)) // 100
    assert got == {"a": exp, "b": exp}


# --------------------------------------------------------------- funnel

def test_events_funnel_strict_ordering(spark, tmp_path):
    """A click BEFORE the user's first view must not advance the funnel;
    a click at the SAME microsecond must not either (strict >)."""
    import datetime as dt

    import __spark_entry__ as em

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    us = dt.timedelta(microseconds=1)
    rows = [
        # u1: full ordered funnel
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + us, 1, "click", 0.0, "{}"),
        (3, t0 + 2 * us, 1, "purchase", 0.0, "{}"),
        # u2: click strictly BEFORE first view -> stops at view
        (4, t0, 2, "click", 0.0, "{}"),
        (5, t0 + us, 2, "view", 0.0, "{}"),
        # u3: click at the SAME microsecond as the view -> strict > fails
        (6, t0, 3, "view", 0.0, "{}"),
        (7, t0, 3, "click", 0.0, "{}"),
        # u4: purchase with no view at all -> not in any stage
        (8, t0, 4, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r.stage: r.n_users
           for r in em.q_events_funnel(spark, str(tmp_path)).collect()}
    assert got == {"1_view": 3, "2_click": 1, "3_purchase": 1}


def test_events_props_uniform_json():
    """The events_json_stats ORACLE extracts k by regex instead of JSON
    (portability: no DuckDB json-extension dependency); that is only
    value-equivalent while every props row is exactly {"k": <int>} — pin
    the assumption against the driver-scale table."""
    import duckdb

    bad = duckdb.connect().execute(
        "SELECT count(*) FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet') "
        "WHERE NOT regexp_matches(props, '^\\{\"k\": -?[0-9]+\\}$')"
    ).fetchone()[0]
    assert bad == 0


# ----------------------------------------------------- tfidf cosine pairs

def test_tfidf_cosine_identical_docs(spark):
    """Identical docs over a df-pruned vocabulary must reach cosine 1.0
    exactly (integer dot == integer norm product); a common term in every
    doc is pruned at max_df and never creates pairs on its own."""
    from text2nkg_spark.operators.textstats import tfidf_cosine_pairs

    rows = [
        (1, "alpha beta gamma common"),
        (2, "alpha beta gamma common"),
        (3, "delta epsilon common"),
        (4, "common zeta common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = tfidf_cosine_pairs(df, max_df=3, top_k=5).collect()
    by_pair = {(r.doc_id, r.partner): r.cosine for r in got}
    assert by_pair[(1, 2)] == 1.0 and by_pair[(2, 1)] == 1.0
    # docs 3 and 4 share only "common" (df=4 > max_df=3): no pair at all
    assert all(d not in (3, 4) and p not in (3, 4) for d, p in by_pair)


def test_tfidf_cosine_rank_determinism(spark):
    """Ranking ties break on partner id; repeated runs are identical."""
    from text2nkg_spark.operators.textstats import tfidf_cosine_pairs

    rows = [(i, f"shared tok{i % 2} word{i}") for i in range(1, 7)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, tfidf_cosine_pairs(df, max_df=6).collect()))
    b = sorted(map(tuple, tfidf_cosine_pairs(
        df.repartition(7), max_df=6).collect()))
    assert a == b and len(a) > 0


# ------------------------------------------------------------- triangles

def test_triangles_k4(spark):
    # K4: 4 triangles, every node participates in C(3,2) = 3 of them
    from itertools import combinations

    from text2nkg_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(a, b) for a, b in combinations("abcd", 2)],
        "surface_a string, surface_b string")
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangles_path_graph_none(spark):
    from text2nkg_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "surface_a string, surface_b string")
    assert triangle_counts(edges).count() == 0


def test_triangles_match_brute_force(spark):
    # pseudo-random graph (deterministic arithmetic, no RNG) vs a brute
    # n^3 enumeration — exercises degree ties, hubs, and orientation
    from itertools import combinations

    from text2nkg_spark.operators.graph import triangle_counts

    nodes = [f"n{i:02d}" for i in range(12)]
    edges = [(a, b) for i, a in enumerate(nodes)
             for j, b in enumerate(nodes)
             if i < j and (i * 7 + j * 13) % 3 != 0]
    adj = set(edges)
    expect: dict[str, int] = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in adj and (b, c) in adj and (a, c) in adj:
            for v in (a, b, c):
                expect[v] = expect.get(v, 0) + 1
    df = spark.createDataFrame(
        edges, "surface_a string, surface_b string")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == expect


def test_pagerank_and_kcore_plans_are_keyed_joins(spark):
    """Scale shape: every iteration of both iterative graph operators is
    an equi-join / hash aggregation — a cartesian or broadcast-nested-
    loop stage anywhere in the chained plan would be quadratic at 100x."""
    from text2nkg_spark.operators.graph import (
        kcore_nodes, pagerank_iterations)

    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1)],
        "surface_a string, surface_b string, n_groups long")
    for df in (pagerank_iterations(edges, iters=3, local_threshold=0),
               kcore_nodes(edges, k=2, iterations=3, local_threshold=0)):
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p, p
        assert "BroadcastNestedLoopJoin" not in p, p


def test_graph_local_twins_match_distributed(spark):
    """The size-adaptive driver-side twins (r7: pagerank / triangles /
    kcore below _LOCAL_EDGE_THRESHOLD edges) must be row-identical to
    the distributed plans on the same pseudo-random graph — including
    degree ties, hubs, self-free a<b edges and duplicate-free input."""
    from text2nkg_spark.operators.graph import (
        kcore_nodes, pagerank_iterations, triangle_counts)

    nodes = [f"n{i:02d}" for i in range(14)]
    rows = [(a, b, 1 + (i * 5 + j * 11) % 4)
            for i, a in enumerate(nodes)
            for j, b in enumerate(nodes)
            if i < j and (i * 7 + j * 13) % 3 != 0]
    edges = spark.createDataFrame(
        rows, "surface_a string, surface_b string, n_groups long")

    def rowset(df):
        return sorted(tuple(r) for r in df.collect())

    assert rowset(pagerank_iterations(edges)) == \
        rowset(pagerank_iterations(edges, local_threshold=0))
    assert rowset(triangle_counts(edges)) == \
        rowset(triangle_counts(edges, local_threshold=0))
    assert rowset(kcore_nodes(edges, k=3, iterations=3)) == \
        rowset(kcore_nodes(edges, k=3, iterations=3, local_threshold=0))


def test_mention_cooccurrence_local_twin_matches(spark):
    """The size-adaptive driver-side twin of mention_cooccurrence must be
    row-identical to the distributed sort/cap/pair/count — including the
    max_group_width truncation on an over-wide group."""
    from text2nkg_spark.operators.graph import mention_cooccurrence

    rows = [(f"c{i % 5}", f"s{(i * 7) % 23:02d}") for i in range(200)]
    rows += [("wide", f"s{i:03d}") for i in range(40)]
    df = spark.createDataFrame(rows, "conv_id string, surface string")

    def rowset(out):
        return sorted(tuple(r) for r in out.collect())

    for cap in (4, 256):
        assert rowset(mention_cooccurrence(df, max_group_width=cap)) == \
            rowset(mention_cooccurrence(
                df, max_group_width=cap, local_threshold=0))
