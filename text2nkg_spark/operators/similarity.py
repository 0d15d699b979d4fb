"""Similarity search over embedding columns (array<float>).

* ``brute_force_topk`` — exact cosine top-k per query; the correctness
  baseline.  Dot products are ``zip_with``/``aggregate`` HOFs (JVM,
  whole-stage codegen) — no Python in the hot path; ranking is a window
  ``row_number`` per query.
* ``hyperplane_bucket`` / ``lsh_topk`` — the scale path: sign-random-
  projection LSH.  Hyperplane directions are derived from ``xxhash64`` of
  (plane, dim) — deterministic, computed inline, no side data to broadcast.
  Queries probe only their own bucket; at 10^9+ vectors add multi-probe
  (flip one bit) which unions a handful of bucket keys per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x))


def _dot(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda a, x: a + x)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, vec_id, cosine, rank).

    The corpus side streams; the query side should be small enough to
    broadcast (typical batched-ANN usage) — Catalyst picks the broadcast
    automatically below the threshold, or wrap queries in
    ``F.broadcast(...)`` upstream.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("cv"), _norm(F.col(vec_col)).alias("cn"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"), _norm(F.col(vec_col)).alias("qn"))
    scored = q.join(c, F.lit(True)).select(
        "query_id", "vec_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k)


def hyperplane_bucket(vec_col, planes: int = 8, seed: int = 42):
    """Sign-random-projection bucket id (0..2^planes-1), fully inline.

    Plane p's weight for dimension d = centered xxhash64(seed, p, d) —
    a deterministic pseudo-gaussian surrogate adequate for bucketing.
    """
    def projection(p: int):
        return F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(vec_col, lambda _x, i: i),
                lambda x, i: x.cast("double")
                * (
                    F.xxhash64(F.lit(str(p)), i.cast("string"),
                               F.lit(seed)).cast("double")
                    / F.lit(float(2**63))
                ),
            ),
            F.lit(0.0), lambda a, x: a + x,
        )

    out = F.lit(0).cast("long")
    for p in range(planes):
        out = out + F.when(
            projection(p) > 0, F.lit(1 << p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: rank only within the query's hyperplane bucket."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
        hyperplane_bucket(F.col(vec_col), planes, seed).alias("bucket"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
        hyperplane_bucket(F.col(vec_col), planes, seed).alias("bucket"))
    scored = q.join(c, "bucket").select(
        "query_id", "vec_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k)
